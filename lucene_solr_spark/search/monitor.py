"""Reverse search (percolator): match registered queries against a
document batch.

The reference's monitor module (lucene/monitor/src/java/org/apache/
lucene/monitor/Monitor.java:69, TermFilteredPresearcher.java) stores
queries in an index and, for each incoming document batch, first
selects CANDIDATE queries by the terms they share with the batch (the
presearcher pass), then runs only those candidates against the batch
for exact matching. That is the only shape that scales when both the
query set and the document stream are large — most queries never meet
most documents.

Spark-first mapping:
- the registered query set becomes a small (query_id, term, kind)
  DataFrame (broadcast — query sets are ~10^4-10^6 rows, documents are
  the 10^12 side),
- the presearcher pass is an equi-join between the batch's distinct
  (doc, term) pairs and the queries' required terms,
- exact verification is an aggregation: a conjunction matches when the
  doc supplied ALL of the query's MUST terms (count == n_must), then
  MUST_NOT hits are anti-joined away — one shuffle on (doc, query),
  no per-query scans, no Python in the loop.

Supported query shape: conjunction of terms with optional exclusions
(`MonitorQuery(id, must, must_not)`). Richer ASTs would follow the
reference's two-phase pattern: presearch on any indexed term, verify
with the full engine on the candidate (query, doc) pairs only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from ..analysis.analyzers import simple_tokens_col


@dataclass(frozen=True)
class MonitorQuery:
    """A registered query: all of ``must``, none of ``must_not``."""
    query_id: str
    must: tuple
    must_not: tuple = field(default=())


def match_batch(docs: DataFrame, queries: list,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """All (query_id, doc_id) pairs where the registered query matches
    the document. One distinct-(doc,term) explode of the batch, one
    broadcast join per clause kind, one (doc, query) aggregation."""
    if not queries:
        raise ValueError("no queries registered")
    spark = docs.sparkSession
    must_rows = [(q.query_id, t) for q in queries for t in q.must]
    not_rows = [(q.query_id, t) for q in queries for t in q.must_not]
    n_must = spark.createDataFrame(
        [(q.query_id, len(q.must)) for q in queries],
        "query_id string, n_must int")
    mq = spark.createDataFrame(must_rows, "query_id string, term string")

    dt = (docs.select(F.col(id_col),
                      F.explode(simple_tokens_col(text_col)).alias("term"))
          .distinct())
    hits = (dt.join(F.broadcast(mq), "term")
            .groupBy(id_col, "query_id")
            .agg(F.count("*").cast("int").alias("n_hit"))
            .join(F.broadcast(n_must), "query_id")
            .filter(F.col("n_hit") == F.col("n_must"))
            .select("query_id", id_col))
    if not_rows:
        nq = spark.createDataFrame(not_rows, "query_id string, term string")
        bad = (dt.join(F.broadcast(nq), "term")
               .select("query_id", id_col).distinct())
        hits = hits.join(bad, ["query_id", id_col], "left_anti")
    return hits
