"""BM25 scoring kernels.

Two kernels over the same statistics:

``lucene32`` — bit-exact reproduction of the reference's float32 math
(lucene/core/src/java/org/apache/lucene/search/similarities/
BM25Similarity.java:70-82,184-235):

    idf       = (float) log(1 + (N - df + 0.5) / (df + 0.5))   # double -> f32
    avgdl     = (float) (sumTotalTermFreq / (double) docCount)
    cache[b]  = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[b] / avgdl))  # f32 ops
    weight    = boost * idf                                    # f32
    score     = weight - weight / (1f + freq * cache[norm])    # f32 ops

Multi-clause combination (ConjunctionScorer / DisjunctionSumScorer):
per-clause float scores summed in double, cast back to float.

``double_sql`` — the same formula evaluated entirely in float64 with the
quantized document length, emitted as a portable SQL string that parses
identically in Spark SQL and DuckDB. This is the oracle-checkable mode:
engine (JVM, whole-stage codegen) and DuckDB evaluate the same double
expression, so values agree to ~1 ulp and round(score, 6) hashes equal.
"""

from __future__ import annotations

import math

import numpy as np

from .. import B, K1
from ..codecs.smallfloat import LENGTH_TABLE


def idf32(df: int, doc_count: int) -> np.float32:
    """float32 idf, computed in double then narrowed (BM25Similarity.java:70-72)."""
    return np.float32(math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5)))


def avgdl32(sum_ttf: int, doc_count: int) -> np.float32:
    return np.float32(sum_ttf / float(doc_count))


def norm_inverse_cache(avgdl: np.float32, k1: float = K1, b: float = B) -> np.ndarray:
    """256-entry float32 cache of 1 / (k1 * ((1-b) + b * dl / avgdl))."""
    k1f = np.float32(k1)
    bf = np.float32(b)
    one = np.float32(1.0)
    # evaluate with float32 intermediates in the reference's order
    inner = (one - bf) + (bf * LENGTH_TABLE) / np.float32(avgdl)
    return (one / (k1f * inner)).astype(np.float32)


def score32(freq, norm_bytes, weight: np.float32, cache: np.ndarray) -> np.ndarray:
    """Vectorized float32 BM25: weight - weight / (1 + freq * cache[norm])."""
    f = np.asarray(freq, dtype=np.float32)
    nb = np.asarray(norm_bytes, dtype=np.int64) & 0xFF
    inv = cache[nb]
    one = np.float32(1.0)
    return (weight - weight / (one + f * inv)).astype(np.float32)


def sum_clauses32(*clause_scores: np.ndarray) -> np.ndarray:
    """Sum per-clause float32 scores in double, cast to float32
    (ConjunctionScorer / DisjunctionSumScorer semantics)."""
    acc = np.zeros_like(np.asarray(clause_scores[0], dtype=np.float64))
    for s in clause_scores:
        acc = acc + np.asarray(s, dtype=np.float64)
    return acc.astype(np.float32)


# ---------------------------------------------------------------------------
# double / SQL mode
# ---------------------------------------------------------------------------

def idf_sql(df_expr: str, n_expr: str) -> str:
    """Portable SQL: ln(1 + (N - df + 0.5) / (df + 0.5)) in float64."""
    return f"ln(1e0 + (({n_expr}) - ({df_expr}) + 0.5) / (({df_expr}) + 0.5))"


def score_sql(tf_expr: str, qdl_expr: str, idf_expr: str, avgdl_expr: str,
              k1: float = K1, b: float = B, boost: float = 1.0) -> str:
    """Portable SQL for one term's double-precision BM25 score.

    Uses the plain saturation form idf * tf / (tf + k1*((1-b) + b*qdl/avgdl));
    identical expression text is fed to Spark (F.expr) and DuckDB, so both
    evaluate the same IEEE754 double graph.
    """
    w = f"({boost!r} * ({idf_expr}))" if boost != 1.0 else f"({idf_expr})"
    denom = f"(CAST({tf_expr} AS DOUBLE) + {k1!r} * ((1e0 - {b!r}) + {b!r} * CAST({qdl_expr} AS DOUBLE) / ({avgdl_expr})))"
    return f"({w} * CAST({tf_expr} AS DOUBLE) / {denom})"
