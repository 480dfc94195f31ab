"""Round-3e ops: Solr local-params parser + {!rerank}, soft dedup
weights, padding/truncation waste, ANN recall report."""

import math

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Local-params parser (QueryParsing.java StrParser semantics)
# ---------------------------------------------------------------------------

def test_localparams_scanner():
    from lucene_solr_spark.search.localparams import parse_local_params
    t, kv, body = parse_local_params(
        "{!func key='a b' n=3 d=$ref}tail text", {"ref": "xyz"})
    assert t == "func"
    assert kv == {"key": "a b", "n": "3", "d": "xyz"}
    assert body == "tail text"


def test_localparams_v_overrides_body_and_type_kv():
    from lucene_solr_spark.search.localparams import parse_local_params
    t, kv, body = parse_local_params("{!type=term v='hello'}ignored")
    assert t == "term" and body == "hello" and kv == {}


def test_localparams_default_type_is_lucene():
    from lucene_solr_spark.search.localparams import (local_query,
                                                      parse_local_params)
    from lucene_solr_spark.search.query import Term
    t, _, _ = parse_local_params("{!}merge")
    assert t == "lucene"
    q = local_query("{!term}Join-Merge")   # raw term, NO analysis
    assert isinstance(q, Term) and q.term == "Join-Merge"


def test_localparams_errors():
    from lucene_solr_spark.search.localparams import (LocalParamsError,
                                                      parse_local_params,
                                                      local_query)
    with pytest.raises(LocalParamsError):
        parse_local_params("{!term v='unterminated}x")
    with pytest.raises(LocalParamsError):
        parse_local_params("{!term a=$nope}x", {})
    with pytest.raises(LocalParamsError):
        parse_local_params("{!term no closing brace")
    with pytest.raises(LocalParamsError):
        local_query("{!rerank}q")          # reRankQuery required
    with pytest.raises(LocalParamsError):
        local_query("{!bogus}q")


def test_rerank_spec_defaults():
    """ReRankQParserPlugin.java:60-62 defaults: reRankDocs=200,
    reRankWeight=2.0."""
    from lucene_solr_spark.search.localparams import ReRank, local_query
    rr = local_query('{!rerank reRankQuery=$rqq}join merge',
                     {"rqq": '"table hash"'})
    assert isinstance(rr, ReRank)
    assert rr.docs == 200 and rr.weight == 2.0


# ---------------------------------------------------------------------------
# {!rerank} execution semantics (_p_rerank)
# ---------------------------------------------------------------------------

def test_rerank_python_twin(spark):
    """Top-10 equals a from-scratch combine: top-20 first-pass hits get
    score + 2.0*rerank_score, the rest keep their first-pass score
    (AbstractReRankQuery additive combine)."""
    import __spark_entry__ as entry
    got = [(r["doc_id"], r["score"])
           for r in entry._p_rerank(spark, SF).collect()]

    se = entry._searcher(spark, SF)
    from lucene_solr_spark.search.localparams import local_query
    rr = local_query(entry._RERANK_Q, entry._RERANK_PARAMS)
    main = {r["docid"]: round(r["score"], 6)
            for r in se.scored(rr.main).collect()}
    rsc = {r["docid"]: r["score"]
           for r in se.scored(rr.rerank).collect()}
    top = sorted(main, key=lambda d: (-main[d], d))[:rr.docs]
    comb = dict(main)
    for d in top:
        comb[d] = round(main[d] + rr.weight * rsc.get(d, 0.0), 6)
    want = sorted(((d, s) for d, s in comb.items()),
                  key=lambda x: (-x[1], x[0]))[:10]
    assert got == want
    # the rerank query actually moved something into/up the top-10
    base = sorted(((d, s) for d, s in main.items()),
                  key=lambda x: (-x[1], x[0]))[:10]
    assert [d for d, _ in got] != [d for d, _ in base]


# ---------------------------------------------------------------------------
# soft_dedup_weights
# ---------------------------------------------------------------------------

def test_soft_dedup_weights_total_mass(spark):
    """Every doc appears once; each cluster's weights sum to ~1; the
    corpus' total mass equals the number of distinct clusters."""
    from lucene_solr_spark.textops.ops import (dup_clusters,
                                               soft_dedup_weights)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = soft_dedup_weights(docs).collect()
    n_docs = docs.count()
    assert len(w) == n_docs
    assert {r["doc_id"] for r in w} == {
        r["doc_id"] for r in docs.select("doc_id").collect()}

    by_cluster = {}
    for r in w:
        by_cluster.setdefault(r["cluster"], []).append(r["weight"])
    for c, ws in by_cluster.items():
        assert math.isclose(sum(ws), 1.0, abs_tol=len(ws) * 1e-6)

    labels = {r["doc_id"]: r["cluster"]
              for r in dup_clusters(docs).collect()}
    n_clusters = (len(set(labels.values()))
                  + (n_docs - len(labels)))  # singletons
    assert len(by_cluster) == n_clusters


def test_soft_dedup_singleton_weight_is_one(spark):
    from lucene_solr_spark.textops.ops import soft_dedup_weights
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = soft_dedup_weights(docs).collect()
    singles = [r for r in w if r["weight"] == 1.0]
    assert singles and all(r["cluster"] == r["doc_id"] for r in singles)


# ---------------------------------------------------------------------------
# padding_waste
# ---------------------------------------------------------------------------

def test_padding_waste_python_twin(spark):
    import re
    from lucene_solr_spark.textops.ops import padding_waste
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ns = [len(re.findall(r"[A-Za-z0-9]+", r["text"]))
          for r in docs.select("text").collect()]
    got = {r["L"]: r for r in padding_waste(docs,
                                            lengths=(64, 256)).collect()}
    assert set(got) == {64, 256}
    for L in (64, 256):
        lost = sum(max(n - L, 0) for n in ns)
        pad = sum(L - min(n, L) for n in ns)
        r = got[L]
        assert r["docs"] == len(ns)
        assert r["total_tokens"] == sum(ns)
        assert r["trunc_docs"] == sum(1 for n in ns if n > L)
        assert r["lost_frac"] == math.floor(
            lost / sum(ns) * 1e6 + 0.5) / 1e6
        assert r["pad_frac"] == math.floor(
            pad / (len(ns) * L) * 1e6 + 0.5) / 1e6


def test_padding_waste_monotone(spark):
    """Longer windows truncate less and pad more — lost_frac is
    non-increasing in L and pad_frac non-decreasing (given fixed docs)."""
    from lucene_solr_spark.textops.ops import padding_waste
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = {r["L"]: r for r in padding_waste(
        docs, lengths=(32, 128, 512)).collect()}
    assert rows[32]["lost_frac"] >= rows[128]["lost_frac"] >= \
        rows[512]["lost_frac"]
    assert rows[32]["pad_frac"] <= rows[128]["pad_frac"] <= \
        rows[512]["pad_frac"]


# ---------------------------------------------------------------------------
# v_ann_recall
# ---------------------------------------------------------------------------

def test_ann_recall_report(spark):
    """One row, k=10, n_hits = |lsh top-10 ∩ exact top-10|, recall in
    [0,1] and consistent with the two underlying plans."""
    import __spark_entry__ as entry
    row = entry._v_ann_recall(spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    from lucene_solr_spark.vector.ann import cosine_topk, lsh_bucket_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {x["vec_id"] for x in cosine_topk(
        emb, query_vec_id=0, k=10).collect()}
    approx = {x["vec_id"] for x in lsh_bucket_topk(
        emb, query_vec_id=0, k=10, n_planes=entry._LSH_PLANES,
        dim=entry._EMB_DIM).collect()}
    assert r["k"] == 10
    assert r["n_hits"] == len(exact & approx)
    assert r["recall"] == round(r["n_hits"] / 10.0, 6)
