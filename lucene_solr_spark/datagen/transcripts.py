"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Input shape from BASELINE.json input_hint: Iceberg-style table of
multi-turn conversation / agent transcripts
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp). One row = one turn = one document.

Generation is pure Spark built-ins seeded by xxhash64 — no Python in
the row path, no RNG state — so any executor count produces the same
rows (resumable, scale-invariant). Vocabulary is Zipf-ish via a
log-uniform index map; a configurable fraction of turns injects 5 hot
terms (df > 30%) to exercise skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 10_000
HOT_TERMS = ["ok", "the", "retry", "error", "done"]


def gen_transcripts(spark: SparkSession, n_convs: int, seed: int = 42,
                    hot_fraction: float = 0.3,
                    max_turns: int = 40, max_tokens: int = 200) -> DataFrame:
    """~n_convs * ~(max_turns/2) turns; deterministic in (n_convs, seed)."""
    convs = spark.range(n_convs).select(
        F.format_string("conv%08d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv"))
    h = f"xxhash64(conv, {seed})"
    convs = convs.withColumn(
        "n_turns", F.expr(f"2 + pmod({h}, {max_turns - 1})").cast("int"))
    turns = convs.select(
        "conv_id", "conv",
        F.explode(F.expr("sequence(0, n_turns - 1)")).alias("turn_idx"))

    ht = f"xxhash64(conv, turn_idx, {seed})"
    # tokens: log-uniform (Zipf-ish) vocabulary indexes, JVM-side
    word = (
        f"concat('w', CAST(floor(exp( (pmod(xxhash64(conv, turn_idx, i, "
        f"{seed}), 1000000) / 1000000.0d) * ln({VOCAB_SIZE}) )) AS BIGINT))")
    hot = ", ".join(f"'{w}'" for w in HOT_TERMS)
    text_expr = (
        f"concat_ws(' ', transform(sequence(1, 1 + pmod({ht}, {max_tokens})),"
        f" i -> CASE WHEN pmod(xxhash64(conv, turn_idx, i, 7, {seed}), 100)"
        f" < {int(hot_fraction * 100)} AND pmod(i, 7) = 0"
        f" THEN element_at(array({hot}), 1 + CAST(pmod(xxhash64(i, {seed}), "
        f"{len(HOT_TERMS)}) AS INT))"
        f" ELSE {word} END))")

    out = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        F.expr("element_at(array('user','assistant','tool'), "
               "1 + CAST(pmod(turn_idx, 3) AS INT))").alias("role"),
        F.expr(text_expr).alias("text"),
        F.expr(f"CASE WHEN pmod({ht}, 10) < 2 THEN "
               f"concat('tool', CAST(pmod({ht}, 20) AS STRING)) "
               f"ELSE NULL END").alias("tool"),
        F.expr("timestamp_seconds(1700000000 + conv * 3600 + turn_idx * 30)")
        .alias("ts"),
    )
    return out
