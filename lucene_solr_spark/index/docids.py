"""Stable, scalable docID assignment.

Lucene docIDs are insertion-ordered ints (IndexWriter.addDocument,
lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:1212).
Our global docID = dense rank over the stable document order
(conv_id ASC, turn_idx ASC per the input hint), so both engines agree
on doc identity and top-k tie-breaking (SURVEY.md §1.4.5).

Implementation is the 2-pass offset pattern, never a single global
sort/window:
 1. range-repartition by the order key (globally ordered partitions),
 2. count rows per partition (tiny job), prefix-sum offsets on the
    driver,
 3. partition-local row_number + broadcast offset join.
All JVM-side; the rank is a pure function of the data (unique keys), so
re-partitioning or resume cannot change an assigned docid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assign_docids(df: DataFrame, order_cols: list[str],
                  num_partitions: int | None = None) -> DataFrame:
    """Add a dense 0-based ``docid`` = rank over order_cols (unique keys)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = (df.repartitionByRange(n, *[F.col(c) for c in order_cols])
         .withColumn("_pid", F.spark_partition_id()))
    # Materialize once: the offsets job and the ranking job MUST see the
    # same partition ids. Without this, AQE / shuffle re-planning can give
    # the two jobs different partitionings, silently corrupting docids.
    # (At 10^12-doc scale this persist is a checkpoint of the build's
    # staging table — the segment writer consumes the same partitioning.)
    d = d.persist()
    counts = sorted(
        (r["_pid"], r["cnt"]) for r in
        d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect())
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid INT, _off LONG")
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    out = (d.withColumn("_rn", F.row_number().over(w) - 1)
           .join(F.broadcast(off_df), "_pid")
           .withColumn("docid", (F.col("_off") + F.col("_rn")).cast("long"))
           .drop("_pid", "_rn", "_off"))
    # the persisted staging table must outlive downstream consumption;
    # callers that loop over appends can release it via this handle
    out._docids_staging = d
    return out
