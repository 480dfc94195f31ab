"""Round-3o ops: {!terms}/{!bool} qparsers, tuple() stream."""

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# {!terms} qparser (TermsQParserPlugin.java:62)
# ---------------------------------------------------------------------------

def test_terms_qparser_raw_no_analysis():
    from lucene_solr_spark.search.localparams import local_query
    from lucene_solr_spark.search.query import TermInSet
    q = local_query("{!terms f=text}skill, spark, window")
    assert isinstance(q, TermInSet)
    assert q.terms == ("skill", "spark", "window")
    # RAW terms: no lowercasing / analysis (Solr passes them straight
    # to the filter) — an uppercase term survives verbatim
    q2 = local_query("{!terms f=text}Skill,UPPER")
    assert q2.terms == ("Skill", "UPPER")


def test_terms_qparser_separator_param():
    from lucene_solr_spark.search.localparams import local_query
    q = local_query('{!terms f=text separator="|"}a|b|c')
    assert q.terms == ("a", "b", "c")


def test_terms_qparser_empty_raises():
    from lucene_solr_spark.search.localparams import (LocalParamsError,
                                                      local_query)
    with pytest.raises(LocalParamsError):
        local_query("{!terms f=text}, ,")


# ---------------------------------------------------------------------------
# {!bool} qparser (BoolQParserPlugin.java:43)
# ---------------------------------------------------------------------------

def test_bool_qparser_composes_clauses():
    from lucene_solr_spark.search.localparams import local_query
    from lucene_solr_spark.search.query import Bool, Term, TermInSet
    q = local_query(
        "{!bool must=$m should=$s must_not=$n filter=$f mm=1}",
        {"m": "join", "s": "{!terms f=text}dup,vector",
         "n": "slow", "f": "{!term}batch"})
    assert isinstance(q, Bool)
    assert q.must == (Term("join"),)
    assert q.should == (TermInSet(("dup", "vector")),)
    assert q.must_not == (Term("slow"),)
    assert q.filter == (Term("batch"),)
    assert q.minimum_should_match == 1


def test_bool_qparser_inline_subquery():
    """Clause values may be inline strings, not only $refs — each is
    parsed by its own qparser (recursion through local_query)."""
    from lucene_solr_spark.search.localparams import local_query
    from lucene_solr_spark.search.query import Bool, Prefix
    q = local_query('{!bool must="{!prefix f=text}sp"}')
    assert isinstance(q, Bool)
    assert q.must == (Prefix("sp"),)


def test_bool_qparser_needs_positive_clause():
    from lucene_solr_spark.search.localparams import (LocalParamsError,
                                                      local_query)
    with pytest.raises(LocalParamsError):
        local_query("{!bool must_not=$n}", {"n": "slow"})


def test_bool_qparser_rejects_rerank_clause():
    from lucene_solr_spark.search.localparams import (LocalParamsError,
                                                      local_query)
    with pytest.raises(LocalParamsError):
        local_query("{!bool must=$m}",
                    {"m": "{!rerank reRankQuery=$rq reRankDocs=5 "
                          "reRankWeight=2}join",
                     "rq": "spark"})


def test_bool_qparser_engine_twin(spark):
    """{!bool} executes exactly like the hand-built Bool AST — the
    parser adds no scoring of its own."""
    from lucene_solr_spark.search.localparams import local_query
    from lucene_solr_spark.search.query import Bool, Term, TermInSet
    from __spark_entry__ import _searcher

    s = _searcher(spark, SF)
    parsed = local_query(
        "{!bool must=$m should=$s must_not=$n filter=$f}",
        {"m": "join", "s": "{!terms f=text}dup,vector",
         "n": "slow", "f": "{!term}batch"})
    built = Bool(must=(Term("join"),),
                 should=(TermInSet(("dup", "vector")),),
                 must_not=(Term("slow"),),
                 filter=(Term("batch"),))
    got = [(r["doc_id"], r["score"]) for r in s.topk(parsed, 10).collect()]
    want = [(r["doc_id"], r["score"]) for r in s.topk(built, 10).collect()]
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# tuple() stream (TupStream.java:52)
# ---------------------------------------------------------------------------

def test_stream_tuple_values(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = StreamEvaluator({"documents": docs})
    rows = ev.eval('tuple(total=add(7, 8), ratio=div(22, 7), '
                   'flag=if(gt(22, 7), 1, 0), root=sqrt(256))').collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["total"] == 15
    assert abs(r["ratio"] - 22.0 / 7.0) < 1e-9
    assert r["flag"] == 1
    assert r["root"] == 16.0


def test_stream_tuple_empty_raises(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = StreamEvaluator({"documents": docs})
    with pytest.raises(ValueError):
        ev.eval("tuple()")
