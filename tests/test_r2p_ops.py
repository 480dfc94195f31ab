"""Round-2p: strdist function query, corpus-order n-gram novelty,
JSON-facet per-bucket stddev/variance/percentile — law tests vs
hand/numpy recomputation (driver parity in tools/verify_contract.py)."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# t_ngram_novelty
# ---------------------------------------------------------------------------

def test_ngram_novelty_tiny_law(spark):
    """First corpus occurrence (MIN doc_id) owns the shingle; novelty =
    novel/distinct; <n-token docs emit no row."""
    from lucene_solr_spark.textops.ops import ngram_novelty
    df = _docs(spark, [
        (0, "a b c d"),        # shingles {a b c, b c d} both first -> 1.0
        (1, "a b c x"),        # {a b c (seen), b c x (novel)} -> 0.5
        (2, "a b"),            # < 3 tokens -> no row
        (3, "a b c d"),        # both seen -> 0.0
    ])
    got = {r.doc_id: (r.n_shingles, r.n_novel, r.novelty)
           for r in ngram_novelty(df).collect()}
    assert got == {0: (2, 2, 1.0), 1: (2, 1, 0.5), 3: (2, 0, 0.0)}


def test_ngram_novelty_repeated_shingle_counts_once(spark):
    """Shingles are per-doc DISTINCT: 'a b c a b c a b c' has 3 distinct
    shingles, not 7 occurrences."""
    from lucene_solr_spark.textops.ops import ngram_novelty
    df = _docs(spark, [(0, "a b c a b c a b c")])
    [r] = ngram_novelty(df).collect()
    # distinct shingles: 'a b c', 'b c a', 'c a b'
    assert (r.n_shingles, r.n_novel, r.novelty) == (3, 3, 1.0)


# ---------------------------------------------------------------------------
# q_func_strdist
# ---------------------------------------------------------------------------

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_strdist_formula_matches_lucene(spark):
    """strdist(term, target, edit) = 1 - lev/max(len) — Lucene
    LevenshteinDistance.java:106 — verified against a pure-python
    recomputation over the whole sf0.001 term dictionary ranking."""
    import __spark_entry__ as e
    rows = e.queries()["q_func_strdist"](spark, SF).collect()
    assert len(rows) == 10
    target = "window"
    for r in rows:
        exp = 1.0 - _lev(r.term, target) / max(len(r.term), len(target))
        assert abs(r.strdist - exp) < 1e-6, (r.term, r.strdist, exp)
    # descending similarity, term-ASC tie-break
    keys = [(-r.strdist, r.term) for r in rows]
    assert keys == sorted(keys)
    # the target itself is in the dictionary -> exact match ranks first
    assert rows[0].term == target and rows[0].strdist == 1.0


# ---------------------------------------------------------------------------
# q_facet_json_stats
# ---------------------------------------------------------------------------

def test_facet_json_stats_vs_numpy(spark):
    """Per-bucket uncorrected stddev/variance (AggUtil.java:38/:54) and
    exact median recomputed with numpy over the same matching set."""
    import __spark_entry__ as e
    out = {r.lang: r for r in
           e.queries()["q_facet_json_stats"](spark, SF).collect()}
    assert out, "facet term matches no docs at sf0.001?"
    # rebuild the matching set independently: docs containing the token
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import re
    by_lang = {}
    for d in docs:
        toks = [t.lower() for t in re.findall(r"[A-Za-z0-9]+", d.text)]
        if e._FACET_TERM in toks:
            by_lang.setdefault(d.lang, []).append(d.n_chars)
    assert set(out) == set(by_lang)
    for lang, vals in by_lang.items():
        a = np.asarray(vals, dtype=np.float64)
        r = out[lang]
        assert r.n == len(vals)
        assert r.sum_chars == int(a.sum())
        assert abs(r.variance - a.var()) < 1e-5
        assert abs(r.stddev - a.std()) < 1e-5
        assert abs(r.median - float(np.median(a))) < 1e-6


def test_facet_json_stats_constant_bucket_is_zero(spark):
    """All-equal bucket: variance/stddev exactly 0 (the GREATEST(.,0)
    guard keeps float cancellation from going negative)."""
    from pyspark.sql import functions as F
    import __spark_entry__ as e
    # direct formula check on a constant column
    df = spark.createDataFrame([(7,), (7,), (7,)], "n_chars int")
    g = df.agg(F.count("*").cast("long").alias("n"),
               F.sum("n_chars").cast("long").alias("s"),
               F.sum(F.col("n_chars") * F.col("n_chars"))
               .cast("long").alias("sq"))
    var = g.select(
        F.greatest(F.col("sq") / F.col("n")
                   - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")),
                   F.lit(0.0)).alias("v")).collect()[0].v
    assert var == 0.0
