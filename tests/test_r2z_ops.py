"""Round-2ac: JSON Query DSL compilation, ColBERT MaxSim late
interaction — law tests (driver parity in tools/verify_contract.py)."""

import math

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# JSON Query DSL
# ---------------------------------------------------------------------------

def test_json_dsl_compiles_shapes():
    from lucene_solr_spark.search.json_dsl import json_query
    from lucene_solr_spark.search.query import Bool, Boost, Prefix, Term
    q = json_query({"bool": {
        "must": {"term": {"f": "text", "v": "a"}},
        "should": [{"prefix": {"v": "pre"}},
                   {"boost": {"b": 3.0, "query": {"term": {"v": "b"}}}}],
        "must_not": {"term": {"v": "c"}},
        "filter": {"term": {"v": "d"}}}})
    assert isinstance(q, Bool)
    assert q.must == (Term("a"),)
    assert q.should == (Prefix("pre"), Boost(Term("b"), 3.0))
    assert q.must_not == (Term("c"),)
    assert q.filter == (Term("d"),)


def test_json_dsl_bare_string_is_classic_parser():
    from lucene_solr_spark.search.json_dsl import json_query
    from lucene_solr_spark.search.parser import parse
    assert json_query("a AND b") == parse("a AND b")
    assert json_query({"lucene": {"query": "a AND b"}}) == parse("a AND b")
    assert json_query({"lucene": {"v": "a"}}) == parse("a")


def test_json_dsl_errors():
    from lucene_solr_spark.search.json_dsl import JsonQueryError, json_query
    with pytest.raises(JsonQueryError):
        json_query({"bool": {}, "term": {}})  # two parsers at one level
    with pytest.raises(JsonQueryError):
        json_query({"unknownparser": {}})
    with pytest.raises(JsonQueryError):
        json_query(42)


def test_json_dsl_matches_equivalent_classic_query(spark):
    """The same logical query written in JSON and in classic syntax
    must return identical hits+scores."""
    import __spark_entry__ as e
    from lucene_solr_spark.search.json_dsl import json_query
    se = e._searcher(spark, SF)
    jq = json_query({"bool": {"must": [{"term": {"v": "merge"}},
                                       {"term": {"v": "dup"}}]}})
    cq = e.parse_query("+merge +dup")
    a = [(r.doc_id, r.score) for r in se.topk(jq, 10).collect()]
    b = [(r.doc_id, r.score) for r in se.topk(cq, 10).collect()]
    assert a == b and a


# ---------------------------------------------------------------------------
# MaxSim
# ---------------------------------------------------------------------------

def test_maxsim_matches_numpy(spark):
    import numpy as np
    from lucene_solr_spark.vector.ann import maxsim_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    group, qdoc = 5, 0
    docs = {}
    for vid, v in rows.items():
        docs.setdefault(vid // group, []).append(v / np.linalg.norm(v))
    qs = docs[qdoc]
    want = {}
    for d, toks in docs.items():
        if d == qdoc:
            continue
        M = np.asarray(toks)
        want[d] = round(float(sum(max(M @ q) for q in qs)), 6)
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [(r.doc, r.maxsim) for r in
           maxsim_topk(emb, query_doc=qdoc, k=5, group=group).collect()]
    assert [d for d, _ in got] == [d for d, _ in top]
    for (gd, gv), (wd, wv) in zip(got, top):
        assert gv == pytest.approx(wv, abs=2e-6)


def test_maxsim_exceeds_any_single_token_cos(spark):
    """MaxSim over q query tokens is >= q * (min over query tokens of
    its best doc-token cos) and <= q (cosines <= 1) — cheap sanity
    bounds on the two-level aggregation."""
    from lucene_solr_spark.vector.ann import maxsim_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = maxsim_topk(emb, query_doc=0, k=5, group=5).collect()
    assert out
    for r in out:
        assert r.maxsim <= 5.0 + 1e-9
