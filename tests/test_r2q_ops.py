"""Round-2q: token entropy/TTR, cross-source dup matrix, HavingStream
over LeftOuterJoinStream, pivot facet with attached stats — law tests
vs hand/numpy recomputation (driver parity in tools/verify_contract.py)."""

import math

import numpy as np

SF = "/root/testdata/sf0.001"


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# t_entropy
# ---------------------------------------------------------------------------

def test_token_entropy_tiny_law(spark):
    from lucene_solr_spark.textops.ops import token_entropy
    df = _docs(spark, [
        (0, "a a b b"),      # H = ln 2, ttr = 0.5
        (1, "a a a a"),      # H = 0,    ttr = 0.25
        (2, "x"),            # H = 0,    ttr = 1.0
        (3, ""),             # empty -> no row
        (4, "a b c d"),      # H = ln 4, ttr = 1.0
    ])
    got = {r.doc_id: r for r in token_entropy(df).collect()}
    assert set(got) == {0, 1, 2, 4}
    assert abs(got[0].entropy - math.log(2)) < 1e-6
    assert got[0].ttr == 0.5 and got[0].n_types == 2 and got[0].n_tokens == 4
    assert got[1].entropy == 0.0 and got[1].ttr == 0.25
    assert got[2].entropy == 0.0 and got[2].ttr == 1.0
    assert abs(got[4].entropy - math.log(4)) < 1e-6 and got[4].ttr == 1.0


def test_token_entropy_matches_numpy_at_sf(spark):
    """Engine entropy == numpy -sum(p ln p) for every sf0.001 doc."""
    import re
    from collections import Counter
    from lucene_solr_spark.textops.ops import token_entropy
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r.doc_id: r.entropy for r in token_entropy(docs).collect()}
    for d in docs.collect():
        toks = [t.lower() for t in re.findall(r"[A-Za-z0-9]+", d.text)]
        if not toks:
            assert d.doc_id not in got
            continue
        p = np.array(list(Counter(toks).values()), dtype=np.float64)
        p /= p.sum()
        exp = float(-(p * np.log(p)).sum())
        assert abs(got[d.doc_id] - exp) < 1e-5, (d.doc_id, got[d.doc_id], exp)


# ---------------------------------------------------------------------------
# t_cross_dedup
# ---------------------------------------------------------------------------

def test_cross_dup_matrix_tiny_law(spark):
    """Near-dup pairs grouped by normalized (group_a <= group_b)."""
    from lucene_solr_spark.textops.ops import cross_dup_matrix
    rows = [
        (0, "a b c d e", "s2"),
        (1, "a b c d e", "s1"),   # dup of 0: pair (s1, s2)
        (2, "a b c d e f", "s1"),  # jac(0,2)=jac(1,2)=3/4 < 0.8: no pair
        (3, "q r s t u", "s1"),
        (4, "q r s t u", "s1"),   # dup of 3: pair (s1, s1)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    got = {(r.group_a, r.group_b): (r.n_pairs, r.avg_jaccard)
           for r in cross_dup_matrix(df).collect()}
    assert got == {("s1", "s2"): (1, 1.0), ("s1", "s1"): (1, 1.0)}


# ---------------------------------------------------------------------------
# s_stream_having
# ---------------------------------------------------------------------------

def test_stream_having_left_outer_law(spark):
    """LeftOuterJoinStream keeps unmatched left tuples (null right
    fields, skipped by avg); HavingStream gates buckets."""
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "en"), (4, "de")],
        "doc_id long, lang string")
    ev = spark.createDataFrame(
        [(1, 10.0), (1, 30.0), (4, 7.0)], "user_id long, value double")
    e = StreamEvaluator({"documents": docs, "events": ev})
    out = e.eval(
        'having(rollup(leftOuterJoin('
        'search(documents, fl="doc_id,lang", sort="doc_id asc"),'
        'search(events, fl="user_id,value", sort="user_id asc"),'
        'on="doc_id=user_id"), over="lang", count(*), avg(value)),'
        ' gt(count, 1))').collect()
    # en: doc1 matches twice (10,30) + doc2,doc3 unmatched -> count 4,
    # avg over non-null = 20; de: count 1 -> dropped by having
    assert len(out) == 1
    r = out[0]
    assert r.lang == "en" and r["count"] == 4 and r.avg_value == 20.0


# ---------------------------------------------------------------------------
# q_facet_pivot_stats
# ---------------------------------------------------------------------------

def test_facet_pivot_stats_subtotals(spark):
    """ROLLUP subtotal rows carry whole-subtree stats: the ('(all)',
    '(all)') row equals the stats over every matching doc, and each
    (lang, '(all)') row equals the sum/min/max of its leaves."""
    import __spark_entry__ as e
    rows = e.queries()["q_facet_pivot_stats"](spark, SF).collect()
    by = {(r.lang, r.source): r for r in rows}
    grand = by[("(all)", "(all)")]
    leaves = [r for r in rows if r.lang != "(all)" and r.source != "(all)"]
    assert grand.n == sum(r.n for r in leaves)
    assert grand.sum_chars == sum(r.sum_chars for r in leaves)
    assert grand.min_chars == min(r.min_chars for r in leaves)
    assert grand.max_chars == max(r.max_chars for r in leaves)
    for lang in {r.lang for r in leaves}:
        sub = by[(lang, "(all)")]
        mine = [r for r in leaves if r.lang == lang]
        assert sub.n == sum(r.n for r in mine)
        assert sub.sum_chars == sum(r.sum_chars for r in mine)
        assert abs(sub.mean_chars - round(sub.sum_chars / sub.n, 6)) < 1e-9
