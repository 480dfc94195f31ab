"""Event-time windowed aggregation with watermarks over the stream
table.

The reference has no stream-analytics surface (its incremental path is
append-only NRT indexing — SURVEY.md §2.9); this module provides the
Structured-Streaming operators a transcript/event pipeline needs next
to the index: tumbling/sliding event-time windows with late-data
bounds, runnable identically on a batch frame (for oracle checks) and
a readStream frame (with checkpointed state)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(events: DataFrame, window: str = "1 hour",
                         slide: str | None = None,
                         watermark: str = "2 hours",
                         ts_col: str = "ts") -> DataFrame:
    """Tumbling (or sliding) event-time window counts + value sums.

    On a streaming frame the watermark bounds state: events later than
    ``watermark`` behind the max seen event time are dropped and their
    windows finalized. On a batch frame withWatermark is a no-op, so
    the same plan doubles as the exactness oracle.
    """
    # watermarks need TIMESTAMP (with zone); parquet often carries NTZ
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = F.window(ts_col, window, slide) if slide else \
        F.window(ts_col, window)
    base = events.withWatermark(ts_col, watermark) if events.isStreaming \
        else events
    return (base.groupBy(w.alias("win"), "event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "event_type", "n", "sum_value"))


def run_stream_to_memory(spark, src_dir: str, checkpoint: str,
                         name: str = "winagg", **kwargs):
    """availableNow file-stream -> windowed agg -> memory sink (tests /
    demos); returns the finished query's in-memory table name."""
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = windowed_event_stats(stream, **kwargs)
    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName(name)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    return name
