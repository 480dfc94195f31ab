"""Round-3j ops: ICT retriever pairs, knn stream, uniqueBlock facets."""

import hashlib
import re

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ict_pairs (arXiv:1906.00300 §3.2)
# ---------------------------------------------------------------------------

def test_ict_pairs_python_twin(spark):
    from lucene_solr_spark.search.randomsort import wang_hash32
    from lucene_solr_spark.textops.ops import ict_pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = {r["doc_id"]: [w.lower() for w in
                          re.findall(r"[A-Za-z0-9]+", r["text"])]
            for r in docs.select("doc_id", "text").collect()}

    got = {r["doc_id"]: r for r in ict_pairs(docs, span=8).collect()}
    want_ids = {d for d, t in toks.items() if len(t) >= 12}
    assert set(got) == want_ids and want_ids
    for d in want_ids:
        t = toks[d]
        n = len(t)
        qs = wang_hash32(d + 7) % (n - 8 + 1)
        query = t[qs:qs + 8]
        ctx = t[:qs] + t[qs + 8:]
        r = got[d]
        assert r["q_start"] == qs
        assert r["query_text"] == " ".join(query)
        assert r["ctx_n"] == n - 8
        assert r["ctx_md5"] == hashlib.md5(
            " ".join(ctx).encode()).hexdigest()


def test_ict_pairs_window_is_removed_from_context(spark):
    """The pseudo-query never leaks into the context (the ICT 90%
    sentence-removed regime): ctx token count + span == doc count,
    and for a boundary window (qs=0) the context md5 equals the
    md5 of the tail."""
    from pyspark.sql import Row
    from lucene_solr_spark.textops.ops import ict_pairs
    # craft a doc whose hash puts the window at a known offset
    from lucene_solr_spark.search.randomsort import wang_hash32
    words = [f"w{i}" for i in range(20)]
    df = spark.createDataFrame([Row(doc_id=3, text=" ".join(words))])
    qs = wang_hash32(3 + 7) % (20 - 8 + 1)
    r = ict_pairs(df, span=8).collect()[0]
    expect_ctx = words[:qs] + words[qs + 8:]
    assert r["query_text"].split() == words[qs:qs + 8]
    assert r["ctx_md5"] == hashlib.md5(
        " ".join(expect_ctx).encode()).hexdigest()


# ---------------------------------------------------------------------------
# knn stream (KnnStream.java)
# ---------------------------------------------------------------------------

def test_knn_stream_equals_mlt_plan(spark):
    import __spark_entry__ as entry
    got = [tuple(r) for r in entry._q_stream_knn(spark, SF).collect()]
    se = entry._searcher(spark, SF)
    want = [tuple(r) for r in entry._mlt_plan(se, 42, 10).collect()]
    assert got == want and len(got) == 10
    assert all(d != 42 for d, _ in got)   # self excluded


def test_knn_stream_requires_text_qf(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    ev = StreamEvaluator(
        {"documents": spark.read.parquet(f"{SF}/documents.parquet")},
        mlt=lambda c, d, k: None)
    with pytest.raises(ValueError, match="only the analyzed"):
        ev.eval('knn(documents, id="1", qf="title", k=5)')
    ev2 = StreamEvaluator({"documents": None})
    with pytest.raises(ValueError, match="mlt callable"):
        ev2.eval('knn(documents, id="1", k=5)')


# ---------------------------------------------------------------------------
# uniqueBlock facets (UniqueBlockAgg.java)
# ---------------------------------------------------------------------------

def test_uniqueblock_counts_parents_once(spark):
    import __spark_entry__ as entry
    from lucene_solr_spark.search.query import Term
    se = entry._searcher(spark, SF)
    hits = [r["docid"] for r in se.matching(Term("dup")).collect()]
    lang = {r["docid"]: r["lang"]
            for r in se.ix.source.select("docid", "lang").collect()}
    want = {}
    for d in hits:
        want.setdefault(lang[d], set()).add(d // 8)
    got = {r["lang"]: r["unique_convs"]
           for r in entry._q_facet_uniqueblock(spark, SF).collect()}
    assert got == {l: len(s) for l, s in want.items()}
    # the rollup actually deduplicates: at least one conversation has
    # two matching turns, so per-doc counts would differ
    total_docs = len(hits)
    total_convs = sum(got.values())
    assert total_convs <= total_docs
