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
