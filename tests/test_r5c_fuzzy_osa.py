"""Exact FuzzyQuery maxEdits=2 semantics (round-3 VERDICT item 3).

Lucene's transposition automata accept the OSA / restricted
Damerau-Levenshtein neighborhood (LevenshteinAutomata.java:36;
LuceneLevenshteinDistance.java documents distance("ab","bca") = 3 —
edits apply in parallel, transpositions consume original pairs).
These tests sweep the closed-form predicate in BOTH compilers against
the reference OSA DP, including every corner the round-2 verdict
called out: transposition+substitution combos, the "ab"->"bca"
superset trap, and disjoint vs overlapping double transpositions.
"""
import itertools
import random

import duckdb
import pytest

from lucene_solr_spark.search.oracle import OracleBuilder
from lucene_solr_spark.search.query import (
    Fuzzy, double_swap_variants, osa_distance, swap_positions)


def test_osa_reference_corners():
    # LuceneLevenshteinDistance.java's own example
    assert osa_distance("ab", "bca") == 3
    assert osa_distance("tabel", "table") == 1     # transposition
    assert osa_distance("tabel", "label") == 1     # substitution
    assert osa_distance("abcd", "badc") == 2       # two disjoint swaps
    assert osa_distance("abc", "bca") == 2         # rotation = del+ins
    assert osa_distance("abc", "cab") == 2
    assert osa_distance("ca", "abc") == 3          # true-Damerau would be 2
    assert osa_distance("ab", "ba") == 1
    assert osa_distance("x", "x") == 0


def test_double_swap_variants_disjoint_only():
    assert set(double_swap_variants("abcd")) == {"badc"}
    # overlapping swap pairs (i, i+1) are excluded
    assert double_swap_variants("abc") == ()
    assert set(double_swap_variants("abcde")) == \
        {"badce", "baced", "acbed"}


def _duck_matches(q: Fuzzy, vocab):
    ob = OracleBuilder(table="documents", id_col="doc_id",
                       text_col="text")
    pred = ob._term_pred(q)
    con = duckdb.connect()
    vals = ", ".join("('" + v.replace("'", "''") + "')" for v in vocab)
    rows = con.execute(
        f"SELECT term FROM (VALUES {vals}) t(term) WHERE {pred}"
    ).fetchall()
    return {r[0] for r in rows}


def _spark_matches(spark, q: Fuzzy, vocab):
    from lucene_solr_spark.search.engine import term_predicate
    df = spark.createDataFrame([(v,) for v in vocab], "term string")
    return {r["term"] for r in df.filter(term_predicate(q)).collect()}


def _vocab_around(term, alphabet="abt le", rng=None):
    """Dense neighborhood: all strings within a few systematic edits
    plus random strings — enough to cross every OSA<=2 boundary."""
    rng = rng or random.Random(7)
    out = {term}
    # all single edits
    def single_edits(s):
        res = set()
        for i in range(len(s) + 1):
            for c in "abtle":
                res.add(s[:i] + c + s[i:])
        for i in range(len(s)):
            res.add(s[:i] + s[i + 1:])
            for c in "abtle":
                res.add(s[:i] + c + s[i + 1:])
        for i in range(len(s) - 1):
            res.add(s[:i] + s[i + 1] + s[i] + s[i + 2:])
        return res
    ones = single_edits(term)
    out |= ones
    for v in rng.sample(sorted(ones), min(60, len(ones))):
        out |= single_edits(v)
    for _ in range(200):
        n = rng.randint(1, len(term) + 2)
        out.add("".join(rng.choice("abtle") for _ in range(n)))
    return sorted(x for x in out if x)


@pytest.mark.parametrize("term", ["tabel", "ab", "merge", "aab"])
@pytest.mark.parametrize("max_edits", [1, 2])
def test_duckdb_predicate_is_exact_osa(term, max_edits):
    vocab = _vocab_around(term)
    got = _duck_matches(Fuzzy(term, max_edits), vocab)
    want = {v for v in vocab if osa_distance(term, v) <= max_edits}
    assert got == want


@pytest.mark.parametrize("term", ["tabel", "ab"])
def test_spark_predicate_is_exact_osa(spark, term):
    vocab = _vocab_around(term)
    got = _spark_matches(spark, Fuzzy(term, 2), vocab)
    want = {v for v in vocab if osa_distance(term, v) <= 2}
    assert got == want


def test_spark_and_duckdb_agree_random(spark):
    rng = random.Random(42)
    vocab = sorted({"".join(rng.choice("abc")
                            for _ in range(rng.randint(1, 6)))
                    for _ in range(300)})
    for term in ["abca", "cba", "aabb"]:
        q = Fuzzy(term, 2)
        assert _spark_matches(spark, q, vocab) == \
            _duck_matches(q, vocab) == \
            {v for v in vocab if osa_distance(term, v) <= 2}


def test_transpositions_false_is_classic_lev(spark):
    vocab = _vocab_around("tabel")
    got = _spark_matches(spark, Fuzzy("tabel", 2, transpositions=False),
                         vocab)
    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return d[len(b)]
    assert got == {v for v in vocab if lev("tabel", v) <= 2}


def test_max_edits_guard():
    with pytest.raises(ValueError):
        Fuzzy("x", 3)
    with pytest.raises(ValueError):
        Fuzzy("x", -1)


def test_osa_capped_dist_sql_matches_dp():
    """The spell-surface distance SQL (query.osa_capped_dist_sql) is
    the exact capped OSA metric — including the triangle-inequality
    corner the old min(lev, 1+lev(variant)) form got wrong."""
    import duckdb

    from lucene_solr_spark.search.query import osa_capped_dist_sql
    rng = random.Random(9)
    vocab = sorted({"".join(rng.choice("abcst")
                            for _ in range(rng.randint(1, 6)))
                    for _ in range(350)})
    for src in ["tabel", "ca", "stream", "aab"]:
        sql = osa_capped_dist_sql("t", src)
        vals = ", ".join(f"('{v}')" for v in vocab)
        rows = duckdb.sql(
            f"SELECT t, {sql} FROM (VALUES {vals}) x(t)").fetchall()
        for t, d in rows:
            assert d == min(osa_distance(src, t), 3), (src, t)
    # the documented counterexample
    assert duckdb.sql(
        "SELECT " + osa_capped_dist_sql("t", "ca")
        + " FROM (VALUES ('abc')) x(t)").fetchone()[0] == 3
