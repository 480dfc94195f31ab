"""applyInPandasWithState sessionization: summaries emitted on
conversation quiescence must equal the batch group-by oracle."""

import time

from pyspark.sql import functions as F

from lucene_solr_spark.streaming.sessions import (
    sessionize_stream, summarize_batch,
)


def test_stateful_sessionization(spark, xs_transcripts, tmp_path):
    wave1 = xs_transcripts.drop("docid").filter(
        F.col("conv_id") < "conv00000010").persist()
    n_convs = wave1.select("conv_id").distinct().count()
    assert n_convs > 0

    src = str(tmp_path / "src")
    wave1.coalesce(1).write.mode("overwrite").parquet(src)

    schema = wave1.schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (sessionize_stream(stream)
         .writeStream.outputMode("append")
         .format("memory").queryName("sessions")
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(processingTime="500 milliseconds").start())
    try:
        # wait past the 2 s session gap, then land a second wave so the
        # timeout machinery runs and flushes wave-1 sessions
        time.sleep(4)
        (wave1.limit(1)
         .withColumn("conv_id", F.lit("zzz_dummy"))
         .coalesce(1).write.mode("append").parquet(src))
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table("sessions").count() >= n_convs:
                break
            time.sleep(1)
    finally:
        q.stop()

    got = {r.conv_id: (r.n_turns, r.n_tokens, r.n_roles)
           for r in spark.table("sessions").collect()
           if r.conv_id != "zzz_dummy"}
    want = {r.conv_id: (r.n_turns, r.n_tokens, r.n_roles)
            for r in summarize_batch(wave1).collect()}
    assert got == want
