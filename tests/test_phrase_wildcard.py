"""PhraseWildcardQuery (lucene/sandbox/src/java/org/apache/lucene/
search/PhraseWildcardQuery.java:63): pattern slots expand against the
term dictionary (term order, capped at max_expansions), then the query
matches and scores exactly as the expanded MultiPhraseQuery.  Plus the
gap-parametrized Solr facet.range law."""

import duckdb
import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import Searcher
from lucene_solr_spark.search.oracle import OracleBuilder
from lucene_solr_spark.search.query import (
    MultiPhrase, PhraseWildcard, Term,
)

DOCS = [
    (0, "the hash join beats the hand join", "en", "s0"),
    (1, "hand hash the halt join", "en", "s1"),
    (2, "the halt was not a hash", "en", "s2"),
    (3, "join the hash hand halt hash", "en", None),
    (4, "nothing matches here at all", "en", "s4"),
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pw") / "documents.parquet")
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    se = Searcher(build_index(spark.read.parquet(p)))
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{p}/*.parquet'")
    return se, con


def _cmp(se, con, q, k=10):
    ob = OracleBuilder()
    eng = [(r.doc_id, round(r.score, 6))
           for r in se.topk(q, k).collect()]
    ora = [(int(a), round(float(b), 6))
           for a, b in con.execute(ob.topk_sql(q, k)).fetchall()]
    assert eng == ora, (eng, ora)
    return eng


def test_expansion_is_term_sorted_and_capped(corpus):
    se, _ = corpus
    mp = se._expand_phrase_wildcard(PhraseWildcard(("the", "ha*")))
    # dictionary terms matching ha*: halt, hand, hash — term order
    assert mp.slots == (("the",), ("halt", "hand", "hash"))
    mp2 = se._expand_phrase_wildcard(
        PhraseWildcard(("the", "ha*"), max_expansions=2))
    assert mp2.slots == (("the",), ("halt", "hand"))


def test_scores_equal_expanded_multiphrase(corpus):
    se, con = corpus
    q = PhraseWildcard(("the", "ha*"))
    expanded = MultiPhrase((("the",), ("halt", "hand", "hash")))
    pw = {r.doc_id: round(r.score, 6) for r in se.topk(q, 10).collect()}
    mp = {r.doc_id: round(r.score, 6)
          for r in se.topk(expanded, 10).collect()}
    assert pw == mp and pw
    # docs 0 ('the hash'), 1 ('the halt'), 2 ('the halt'), 3 ('the hash')
    assert set(pw) == {0, 1, 2, 3}


def test_oracle_parity(corpus):
    se, con = corpus
    _cmp(se, con, PhraseWildcard(("the", "ha*")))
    _cmp(se, con, PhraseWildcard(("ha??", "join")))
    _cmp(se, con, PhraseWildcard(("the", "ha*"), max_expansions=1))


def test_zero_expansion_slot_matches_nothing(corpus):
    se, con = corpus
    assert _cmp(se, con, PhraseWildcard(("the", "zz*"))) == []


def test_filter_context_via_matching(corpus):
    se, _ = corpus
    m = {r.docid for r in
         se.matching(PhraseWildcard(("the", "ha*"))).collect()}
    assert m == {0, 1, 2, 3}


def test_facet_range_gap_buckets(spark):
    """Solr facet.range law: every matching doc lands in exactly one of
    before / after / start+gap*i, and the counts sum to the hit count."""
    from __spark_entry__ import (
        _RGAP_END, _RGAP_GAP, _RGAP_START, _q_facet_range_gap, _searcher,
    )
    sf = "/root/testdata/sf0.001"
    rows = _q_facet_range_gap(spark, sf).collect()
    labels = {r.bucket for r in rows}
    valid = {"before", "after"} | {
        str(s) for s in range(_RGAP_START, _RGAP_END, _RGAP_GAP)}
    assert labels <= valid
    se = _searcher(spark, sf)
    n_match = se.matching(Term("the")).count()
    assert sum(r.n for r in rows) == n_match
