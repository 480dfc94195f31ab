"""docid assignment: dense rank over (conv_id, turn_idx), partition-pure."""

from pyspark.sql import functions as F

from lucene_solr_spark.datagen.transcripts import gen_transcripts
from lucene_solr_spark.index.docids import assign_docids


def test_docids_dense_rank(spark):
    df = gen_transcripts(spark, 20)
    out = assign_docids(df, ["conv_id", "turn_idx"], num_partitions=5)
    rows = out.select("conv_id", "turn_idx", "docid").collect()
    by_key = sorted((r["conv_id"], r["turn_idx"]) for r in rows)
    want = {key: i for i, key in enumerate(by_key)}
    for r in rows:
        assert r["docid"] == want[(r["conv_id"], r["turn_idx"])]


def test_docids_independent_of_partitioning(spark):
    df = gen_transcripts(spark, 20)
    a = {(r["conv_id"], r["turn_idx"]): r["docid"]
         for r in assign_docids(df, ["conv_id", "turn_idx"],
                                num_partitions=2).collect()}
    b = {(r["conv_id"], r["turn_idx"]): r["docid"]
         for r in assign_docids(df.repartition(13),
                                ["conv_id", "turn_idx"],
                                num_partitions=7).collect()}
    assert a == b


def test_datagen_deterministic(spark):
    h1 = (gen_transcripts(spark, 10)
          .agg(F.expr("bit_xor(xxhash64(conv_id, turn_idx, text))"))
          .first()[0])
    h2 = (gen_transcripts(spark, 10).repartition(3)
          .agg(F.expr("bit_xor(xxhash64(conv_id, turn_idx, text))"))
          .first()[0])
    assert h1 == h2
