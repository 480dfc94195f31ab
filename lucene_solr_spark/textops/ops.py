"""Training-data pipeline operators over a document corpus.

These extend the engine beyond the reference's own operator set with the
ops a 100 TB text-pipeline needs (dedup, quality, language features,
token accounting). All are pure DataFrame plans (JVM, whole-stage
codegen; no Python in the hot path) and each has a matching ANSI-SQL
oracle in __spark_entry__.py.

Scale notes:
- exact dedup: one shuffle on md5(text) — trivially scalable;
- near-dup: shingle inverted-index self-join (the standard MinHash-LSH
  candidate generation skeleton, run here without sampling because
  candidate pairs are bounded by shared shingles; at 10^12 docs the
  same plan runs after a MinHash banding stage cuts the join fan-out);
- all ratios computed from the same tokenizer the index uses, so the
  quality/dedup features are consistent with search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis.analyzers import simple_tokens_col

# tiny per-language marker sets (stopword-ratio language ID heuristic)
LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "et", "les"),
}


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", simple_tokens_col(text_col))


def token_count(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return with_tokens(df).select(
        F.col(id_col),
        F.size("tokens").cast("long").alias("n_tokens"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword heuristics -> quality in [0,1].

    quality = 0.4 * min(stop_ratio*5, 1) + 0.6 * min(n_tokens,100)/100
    (a deterministic, documented toy formula; the shape of a real
    fasttext-style filter, with every input computable at scan speed).
    The 0.4/0.6 weights are chosen so the 7th decimal of the result is
    always even — round(x, 6) then never sits on a rounding tie, which
    keeps Spark's shortest-repr HALF_UP and DuckDB's binary-exact
    rounding in agreement.
    """
    t = with_tokens(df)
    out = t.select(
        F.col(id_col),
        F.expr("CAST(size(tokens) AS BIGINT)").alias("n_tokens"),
        F.expr(
            "ROUND(CAST(size(filter(tokens, x -> x IN ('the','a','of','and')))"
            " AS DOUBLE) / CASE WHEN size(tokens) = 0 THEN 1"
            " ELSE size(tokens) END, 6)").alias("stop_ratio"),
        F.expr(
            "ROUND(CAST(length(regexp_replace(text, '[^A-Za-z0-9]', ''))"
            " AS DOUBLE) / CASE WHEN length(text) = 0 THEN 1"
            " ELSE length(text) END, 6)").alias("alnum_ratio"),
    )
    return out.withColumn(
        "quality",
        F.expr("ROUND(0.4 * LEAST(stop_ratio * 5.0, 1.0) + "
               "0.6 * LEAST(n_tokens, 100) / 100.0, 6)"))


def lang_id(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """n-gram-free marker-ratio language ID (deterministic heuristic)."""
    t = with_tokens(df)
    cols = [F.col(id_col)]
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        cols.append(F.expr(
            f"ROUND(CAST(size(filter(tokens, x -> x IN ({lst}))) AS DOUBLE)"
            f" / CASE WHEN size(tokens) = 0 THEN 1 ELSE size(tokens) END, 6)"
        ).alias(f"{lang}_ratio"))
    out = t.select(*cols)
    # argmax with deterministic tie order en > de > fr
    return out.withColumn(
        "pred_lang",
        F.expr("CASE WHEN en_ratio >= de_ratio AND en_ratio >= fr_ratio "
               "THEN 'en' WHEN de_ratio >= fr_ratio THEN 'de' "
               "ELSE 'fr' END"))


def dedup_exact(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5(text) (hash-groupBy dedup)."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.min(id_col).cast("long").alias("keep_doc"),
                 F.max(id_col).cast("long").alias("max_doc")))


def shingles(df: DataFrame, id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc (MinHash/Jaccard feed)."""
    t = with_tokens(df).filter(F.expr(f"size(tokens) >= {n}"))
    parts = ", ".join(f"tokens[i + {j}]" for j in range(n))
    return (t.select(
        F.col(id_col),
        F.explode(F.expr(
            f"transform(sequence(0, size(tokens) - {n}), "
            f"i -> concat_ws(' ', {parts}))")).alias("shingle"))
        .distinct())


def near_dup_pairs(df: DataFrame, id_col: str = "doc_id", n: int = 3,
                   threshold: float = 0.8) -> DataFrame:
    """n-gram Jaccard near-duplicate pairs via shingle inverted-index join.

    Output: (doc_a, doc_b, inter, jaccard) with doc_a < doc_b.
    """
    sh = shingles(df, id_col, n)
    card = sh.groupBy(id_col).agg(F.count("*").alias("c"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    pairs = (a.join(b, "shingle")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").cast("long").alias("inter")))
    ca = card.select(F.col(id_col).alias("doc_a"), F.col("c").alias("ca"))
    cb = card.select(F.col(id_col).alias("doc_b"), F.col("c").alias("cb"))
    return (pairs.join(ca, "doc_a").join(cb, "doc_b")
            .withColumn("jaccard", F.expr(
                "ROUND(CAST(inter AS DOUBLE) / (ca + cb - inter), 6)"))
            .filter(F.expr(
                f"CAST(inter AS DOUBLE) / (ca + cb - inter) >= {threshold!r}"))
            .select(F.col("doc_a").cast("long"), F.col("doc_b").cast("long"),
                    "inter", "jaccard"))
