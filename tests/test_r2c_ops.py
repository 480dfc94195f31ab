"""Round-2c surfaces: payload scoring, query-time synonym graph,
canonical near-dup removal."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.synonyms import SynonymGraph
from lucene_solr_spark.search.engine import Searcher
from lucene_solr_spark.search.query import (
    Bool, PayloadScore, Phrase, Term,
)
from lucene_solr_spark.textops.ops import dedup_keep


# ---------------------------------------------------------------------------
# PayloadScoreQuery
# ---------------------------------------------------------------------------

def _payload(pos: int) -> float:
    # the shared position-keyed encoder (search/payloads.py)
    return 1.0 + (pos % 7)


def _positions(text: str, term: str) -> list[int]:
    import re
    toks = [t.lower() for t in re.findall(r"[A-Za-z0-9]+", text)]
    return [i for i, t in enumerate(toks) if t == term]


@pytest.fixture(scope="module")
def pay_corpus(spark):
    rows = [
        (0, "merge sort merge hash merge join scan"),
        (1, "hash merge table"),
        (2, "scan filter batch window"),
        (3, "merge merge merge merge merge merge merge merge merge"),
        (4, "a b c d e f g h i j k l m n o p q r merge"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from lucene_solr_spark.index.builder import build_index
    return rows, Searcher(build_index(df))


@pytest.mark.parametrize("func", ["min", "max", "avg", "sum"])
def test_payload_factor_vs_python(pay_corpus, func):
    """PayloadScore == Term BM25 score * python-computed payload fold,
    exactly (PayloadScoreQuery.java:52 includeSpanScore composition)."""
    rows, se = pay_corpus
    term_scores = {r["docid"]: r["score"]
                   for r in se.scored(Term("merge")).collect()}
    got = {r["docid"]: r["score"]
           for r in se.scored(PayloadScore("merge", func, True)).collect()}
    assert set(got) == set(term_scores)
    for doc_id, text in rows:
        pos = _positions(text, "merge")
        if not pos:
            assert doc_id not in got
            continue
        vals = [_payload(p) for p in pos]
        fold = {"min": min(vals), "max": max(vals),
                "avg": sum(vals) / len(vals), "sum": sum(vals)}[func]
        assert got[doc_id] == pytest.approx(
            fold * term_scores[doc_id], abs=0.0), (doc_id, func)


def test_payload_without_span_score(pay_corpus):
    """includeSpanScore=false: the payload fold IS the score."""
    rows, se = pay_corpus
    got = {r["docid"]: r["score"]
           for r in se.scored(PayloadScore("merge", "sum", False)).collect()}
    for doc_id, text in rows:
        pos = _positions(text, "merge")
        if pos:
            assert got[doc_id] == sum(_payload(p) for p in pos)


def test_payload_absent_term(pay_corpus):
    _, se = pay_corpus
    assert se.scored(PayloadScore("zzzabsent", "avg", True)).count() == 0


def test_payload_bad_func():
    from lucene_solr_spark.search.payloads import payload_factor_sql
    with pytest.raises(ValueError):
        payload_factor_sql("positions", "tf", "median", "spark")


def test_payload_oracle_duckdb_parity(pay_corpus):
    """Engine vs a standalone DuckDB evaluation of the oracle SQL."""
    import duckdb

    from lucene_solr_spark.search.oracle import OracleBuilder
    rows, se = pay_corpus
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    ob = OracleBuilder()
    q = PayloadScore("merge", "avg", True)
    ora = dict(con.execute(ob.topk_sql(q, 10)).fetchall())
    eng = {r["doc_id"]: r["score"] for r in se.topk(q, 10).collect()}
    assert {int(k): float(v) for k, v in ora.items()} == eng


# ---------------------------------------------------------------------------
# SynonymGraph (query-time multi-word synonyms)
# ---------------------------------------------------------------------------

_RULES = {
    ("table", "hash"): (("agg",),),
    ("agg",): (("table", "hash"),),
    ("table", "hash", "join"): (("fastpath",),),
}


def test_syn_graph_longest_match_first():
    g = SynonymGraph(_RULES)
    q = g.expand(["table", "hash", "join", "scan"])
    # the 3-token rule wins over the 2-token prefix rule
    assert q == Bool(should=(
        Bool(should=(Phrase(("table", "hash", "join")), Term("fastpath"))),
        Term("scan")))


def test_syn_graph_single_to_multiword():
    g = SynonymGraph(_RULES)
    q = g.expand(["agg", "scan"], occur="must")
    assert q == Bool(must=(
        Bool(should=(Term("agg"), Phrase(("table", "hash")))),
        Term("scan")))


def test_syn_graph_no_match_and_single_slot():
    g = SynonymGraph(_RULES)
    assert g.expand(["scan"]) == Term("scan")
    assert g.expand(["scan", "sort"]) == Bool(
        should=(Term("scan"), Term("sort")))


def test_syn_graph_errors():
    with pytest.raises(ValueError):
        SynonymGraph({(): (("x",),)})
    with pytest.raises(ValueError):
        SynonymGraph({("a",): ((),)})
    g = SynonymGraph(_RULES)
    with pytest.raises(ValueError):
        g.expand(["a"], occur="filter")
    with pytest.raises(ValueError):
        g.expand([])


def test_syn_graph_end_to_end_matches_manual_ast(pay_corpus):
    """Expanded query scores == the hand-built equivalent AST."""
    _, se = pay_corpus
    g = SynonymGraph({("merge", "sort"): (("scan",),)})
    q = g.expand(["merge", "sort"])
    manual = Bool(should=(Phrase(("merge", "sort")), Term("scan")))
    got = sorted(map(tuple, se.topk(q, 10).collect()))
    exp = sorted(map(tuple, se.topk(manual, 10).collect()))
    assert got == exp and got


# ---------------------------------------------------------------------------
# canonical near-dup removal
# ---------------------------------------------------------------------------

def test_dedup_keep_clusters_and_singletons(spark):
    dup_a = "alpha beta gamma delta epsilon zeta eta theta"
    dup_b = "one two three four five six seven eight nine"
    rows = [
        (1, dup_a), (2, dup_a), (3, dup_a),
        (10, dup_b), (11, dup_b),
        (20, "unique text that matches nothing else at all today"),
        (21, "another completely different singleton document body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["canonical"], r["kept"])
           for r in dedup_keep(df, threshold=0.8).collect()}
    assert set(out) == {1, 2, 3, 10, 11, 20, 21}
    assert out[1] == (1, True)
    assert out[2] == (1, False) and out[3] == (1, False)
    assert out[10] == (10, True) and out[11] == (10, False)
    assert out[20] == (20, True) and out[21] == (21, True)
    kept_rate = sum(1 for c, k in out.values() if k) / len(out)
    assert kept_rate == pytest.approx(4 / 7)


# ---------------------------------------------------------------------------
# ASCII folding
# ---------------------------------------------------------------------------

def test_fold_ascii_three_way_parity(spark):
    """translate-table (spark), strip_accents (duckdb), and the python
    reference agree over the covered repertoire."""
    import duckdb

    from lucene_solr_spark.analysis.filters import (
        FOLD_FROM, fold_ascii_py, fold_ascii_sql,
    )
    s = "Café MÜNSTER naïve résumé Ÿ çÑåý plain " + FOLD_FROM
    py = fold_ascii_py(s)
    dk = duckdb.sql(
        "SELECT " + fold_ascii_sql("'" + s + "'", "duckdb")).fetchone()[0]
    sp = spark.createDataFrame([(s,)], "t string").selectExpr(
        fold_ascii_sql("t", "spark")).first()[0]
    assert py == dk == sp
    assert py.isascii()


def test_fold_bad_dialect():
    from lucene_solr_spark.analysis.filters import fold_ascii_sql
    with pytest.raises(ValueError):
        fold_ascii_sql("t", "mysql")


# ---------------------------------------------------------------------------
# FuzzySuggester
# ---------------------------------------------------------------------------

def test_fuzzy_suggest_damerau_prefix(spark):
    """Typed prefix 'sacn' (transposition of 'scan') completes to the
    scan-family terms, ttf-weighted — and a substitution typo also
    matches (FuzzySuggester.java:86 semantics at maxEdits=1)."""
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.query import transposition_variants
    rows = [
        (0, "scan scan scan scanner scanning scam"),
        (1, "scan scanner sort merge"),
        (2, "completely unrelated words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ix = build_index(df)
    q, n = "sacn", 4
    vs = ", ".join(f"'{v}'" for v in transposition_variants(q))
    pred = (f"levenshtein(substring(term, 1, {n}), '{q}') <= 1 "
            f"OR substring(term, 1, {n}) IN ({vs})")
    got = [(r["term"], r["ttf"]) for r in
           ix.term_stats.filter(F.expr(pred))
           .orderBy(F.desc("ttf"), F.asc("term")).collect()]
    # scan-prefixed terms match via the 'scan' transposition variant;
    # 'scam' is Damerau-2 from 'sacn' (transpose + substitute) -> out
    assert got == [("scan", 4), ("scanner", 2), ("scanning", 1)]


# ---------------------------------------------------------------------------
# unigram log-prob quality score
# ---------------------------------------------------------------------------

def test_unigram_logprob_hand_computed(spark):
    import math

    from lucene_solr_spark.textops.ops import unigram_logprob
    rows = [(0, "a a b"), (1, "b c"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["logprob"], r["n_tokens"])
           for r in unigram_logprob(df).collect()}
    # counts: a=2, b=2, c=1, total=5
    lp0 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    lp1 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert set(out) == {0, 1}          # empty doc has no tokens -> absent
    assert out[0] == (pytest.approx(round(lp0, 6), abs=1e-9), 3)
    assert out[1] == (pytest.approx(round(lp1, 6), abs=1e-9), 2)
    # rare-token doc scores lower (more negative) than common-token doc
    assert out[1][0] < out[0][0]


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def test_contamination_shared_shingles(spark):
    from lucene_solr_spark.textops.ops import contamination
    bench_text = "the quick brown fox jumps over the lazy dog"
    rows = [
        (0, bench_text),                                   # benchmark
        (5, "intro words then the quick brown fox jumps away"),  # 1 hit
        (6, bench_text),                                   # exact dup
        (7, "no overlap with anything else whatsoever truly"),
        (8, "quick brown fox jumps over distinct tail words"),  # 1 hit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_shared"]
           for r in contamination(df, bench_ids=(0,), n=5).collect()}
    assert out[6] == 5                 # all 5 shingles of the dup match
    assert out[5] == 1 and out[8] == 1
    assert 7 not in out and 0 not in out


# ---------------------------------------------------------------------------
# Lucene intervals module
# ---------------------------------------------------------------------------

def test_intervals_hand_cases():
    from lucene_solr_spark.search.intervals import (
        IContainedBy, IContaining, IMaxGaps, INotContaining, IOrdered,
        ITerm, IUnordered, interval_freq, intervals_of, saturation_score,
    )
    pos = {"a": [0, 3], "b": [2, 4], "c": [5]}
    o = IOrdered((ITerm("a"), ITerm("b")))
    assert intervals_of(o, pos) == [(0, 2), (3, 4)]
    # freq: minExtent 2 -> 1/2 + 1/1
    assert interval_freq(o, pos) == 1.5
    assert saturation_score(1.5) == 1.0 - 1.0 / 2.5
    assert intervals_of(IUnordered((ITerm("a"), ITerm("c"))), pos) \
        == [(3, 5)]
    assert intervals_of(IMaxGaps(0, o), pos) == [(3, 4)]
    big = IMaxGaps(3, o)
    assert intervals_of(IContaining(big, ITerm("c")), pos) == []
    assert intervals_of(IContainedBy(ITerm("b"), big), pos) == [(2, 2),
                                                                (4, 4)]
    pos2 = dict(pos, x=[1])
    assert intervals_of(INotContaining(o, ITerm("x")), pos2) == [(3, 4)]
    # absent term kills ordered; saturation of no match is 0
    assert intervals_of(o, {"a": [1]}) == []
    assert saturation_score(0.0) == 0.0


def _brute_ordered(subs):
    """Enumerate every order-respecting chain, then minimize."""
    import itertools
    cands = []
    for combo in itertools.product(*subs):
        ok = all(combo[i][0] > combo[i - 1][1]
                 for i in range(1, len(combo)))
        if ok:
            cands.append((combo[0][0], combo[-1][1]))
    return sorted({c for c in cands
                   if not any(d != c and c[0] <= d[0] and d[1] <= c[1]
                              for d in cands)})


def test_intervals_ordered_matches_bruteforce_randomized():
    import random

    from lucene_solr_spark.search.intervals import (
        IOrdered, ITerm, intervals_of,
    )
    rng = random.Random(7)
    for _ in range(300):
        nterms = rng.randint(2, 3)
        pos = {t: sorted(rng.sample(range(0, 30), rng.randint(0, 6)))
               for t in "abc"[:nterms]}
        src = IOrdered(tuple(ITerm(t) for t in "abc"[:nterms]))
        got = intervals_of(src, pos)
        exp = _brute_ordered([[(p, p) for p in pos[t]]
                              for t in "abc"[:nterms]])
        assert sorted(got) == exp, (pos, got, exp)


def test_interval_query_end_to_end(pay_corpus):
    """Engine Interval node == per-doc python recomputation."""
    from lucene_solr_spark.search.intervals import (
        IMaxGaps, IOrdered, ITerm, interval_freq, saturation_score,
    )
    from lucene_solr_spark.search.query import Interval
    rows, se = pay_corpus
    src = IMaxGaps(4, IOrdered((ITerm("merge"), ITerm("hash"))))
    got = {r["doc_id"]: r["score"]
           for r in se.topk(Interval(src), 10).collect()}
    exp = {}
    for doc_id, text in rows:
        pos = {}
        for t in ("merge", "hash"):
            pos[t] = _positions(text, t)
        s = saturation_score(interval_freq(src, pos))
        if s > 0:
            exp[doc_id] = round(s, 6)
    assert got == exp and got


# ---------------------------------------------------------------------------
# Solr Text Tagger
# ---------------------------------------------------------------------------

_TAG_DICT = {"A": "table hash", "B": "hash", "C": "table hash join"}


def test_tagger_all_mode(spark):
    from lucene_solr_spark.search.tagger import tag_text
    rows = [
        (0, "table hash join scan table hash"),
        (1, "hash only here"),
        (2, "nothing relevant"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r["doc_id"], r["tag_id"], r["start_pos"], r["end_pos"])
                 for r in tag_text(df, _TAG_DICT).collect())
    assert got == [
        (0, "A", 0, 1), (0, "A", 4, 5),          # table hash x2
        (0, "B", 1, 1), (0, "B", 5, 5),          # hash x2
        (0, "C", 0, 2),                          # table hash join
        (1, "B", 0, 0),
    ]


def test_tagger_ldr_reducer_reference_cases():
    from lucene_solr_spark.search.tagger import reduce_ldr_py
    # overlapping: longest wins, overlapped dropped, disjoint kept
    tags = [(0, 1, "A"), (0, 2, "C"), (1, 1, "B"), (4, 5, "A"), (5, 5, "B")]
    assert reduce_ldr_py(tags) == [(0, 2, "C"), (4, 5, "A")]
    # tie on length: rightmost wins (the reference's >= walk)
    assert reduce_ldr_py([(0, 1, "X"), (1, 2, "Y")]) == [(1, 2, "Y")]
    # non-overlapping equal lengths: both survive
    assert reduce_ldr_py([(0, 1, "X"), (3, 4, "Y")]) == [(0, 1, "X"),
                                                         (3, 4, "Y")]
    assert reduce_ldr_py([]) == []


def test_tagger_ldr_end_to_end(spark):
    from lucene_solr_spark.search.tagger import tag_text
    df = spark.createDataFrame(
        [(0, "table hash join scan table hash")], "doc_id long, text string")
    got = sorted((r["tag_id"], r["start_pos"], r["end_pos"])
                 for r in tag_text(df, _TAG_DICT,
                                   overlaps="LONGEST_DOMINANT_RIGHT")
                 .collect())
    # C (0-2) dominates A(0-1)/B(1,1); then A(4-5) dominates B(5,5)
    assert got == [("A", 4, 5), ("C", 0, 2)]


def test_tagger_errors(spark):
    from lucene_solr_spark.search.tagger import tag_text
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        tag_text(df, {"E": ""})
    with pytest.raises(ValueError):
        tag_text(df, {"A": "x"}, overlaps="SMALLEST")
