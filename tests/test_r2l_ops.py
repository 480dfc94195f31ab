"""Round-2l operators: DSIR importance weights, search-result
clustering, polygon containment — algorithmic laws vs independent
Python recomputation (driver parity in tools/verify_contract.py)."""

import math

import pytest

SF = "/root/testdata/sf0.001"


# -- DSIR ---------------------------------------------------------------------

def test_dsir_tiny_corpus(spark):
    """Exact hand computation: log w = sum over bigram instances of
    ln p_tgt - ln p_raw, add-one smoothed over the joint vocab."""
    from lucene_solr_spark.textops.ops import dsir_weights
    docs = [(0, "a b a", "en"), (1, "a b c", "en"), (2, "c a b", "fr"),
            (3, "b c", "fr")]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    got = {r.doc_id: (r.log_weight, r.n_feats)
           for r in dsir_weights(df).collect()}
    from collections import Counter
    toks = {d: t.split() for d, t, _ in docs}
    tgt = {d for d, _, g in docs if g == "en"}
    raw = Counter((t[i], t[i + 1]) for t in toks.values()
                  for i in range(len(t) - 1))
    tc = Counter((t[i], t[i + 1]) for d, t in toks.items() if d in tgt
                 for i in range(len(t) - 1))
    v = float(len(raw))
    n_raw, n_tgt = float(sum(raw.values())), float(sum(tc.values()))
    for d, t in toks.items():
        lw = sum(math.log((tc[(t[i], t[i + 1])] + 1.0) / (n_tgt + v))
                 - math.log((raw[(t[i], t[i + 1])] + 1.0) / (n_raw + v))
                 for i in range(len(t) - 1))
        assert got[d][0] == pytest.approx(round(lw, 6), abs=1e-6), d
        assert got[d][1] == len(t) - 1


def test_dsir_feature_counts_on_corpus(spark):
    """Every doc emits exactly len(tokens)-1 features; docs are all
    classified (full corpus coverage, no silent drops)."""
    from lucene_solr_spark.textops.ops import dsir_weights, with_tokens
    from __spark_entry__ import _documents
    import pyspark.sql.functions as F
    df = _documents(spark, SF)
    got = {r.doc_id: r.n_feats for r in dsir_weights(df).collect()}
    exp = {r.doc_id: r.n for r in with_tokens(df).select(
        "doc_id", (F.size("tokens") - 1).alias("n")).collect()}
    assert got == {d: n for d, n in exp.items() if n >= 1}


# -- result clustering --------------------------------------------------------

def test_cluster_results_argmax(spark):
    """Each result's cluster is the argmax-cosine seed (ties to lowest
    seed id) under tf-idf weights — recomputed with numpy."""
    import numpy as np
    import pyspark.sql.functions as F
    from __spark_entry__ import (_q_cluster_results, _searcher,
                                 _CLU_TERM, _CLU_N, _CLU_K)
    from lucene_solr_spark.search.query import Term
    se = _searcher(spark, SF)
    res = [r.doc_id for r in se.topk(Term(_CLU_TERM), _CLU_N).collect()]
    n = se.ix.doc_count
    dfs = {r.term: r.df for r in se.ix.term_stats.collect()}
    vecs = {}
    for r in (se.ix.postings.filter(F.col("docid").isin(res))
              .select("docid", "term", "tf").collect()):
        vecs.setdefault(r.docid, {})[r.term] = (
            float(r.tf) * math.log((n + 1.0) / (dfs[r.term] + 1.0)))
    seeds = sorted(res)[:_CLU_K]

    def cos(a, b):
        dot = sum(va * b.get(t, 0.0) for t, va in a.items())
        na = math.sqrt(sum(v * v for v in a.values()))
        nb = math.sqrt(sum(v * v for v in b.values()))
        return round(dot / (na * nb), 6)

    got = {r.doc_id: (r.cluster_id, r.cos)
           for r in _q_cluster_results(spark, SF).collect()}
    assert set(got) == set(res)
    for d in res:
        best = min(((-cos(vecs[d], vecs[s]), s) for s in seeds))
        assert got[d] == (best[1], -best[0]), d
    # seeds self-assign with cosine exactly 1
    for s in seeds:
        assert got[s] == (s, 1.0)


# -- polygon containment ------------------------------------------------------

def test_geo_polygon_bruteforce(spark):
    from __spark_entry__ import _q_geo_polygon, _POLY, _documents
    got = [(r.doc_id, r.lat, r.lon)
           for r in _q_geo_polygon(spark, SF).collect()]
    assert got, "polygon must contain fixture points"

    def inside(lon, lat):
        c = 0
        m = len(_POLY)
        for i in range(m):
            x1, y1 = _POLY[i]
            x2, y2 = _POLY[(i + 1) % m]
            if (y1 > lat) != (y2 > lat) and \
               lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
                c += 1
        return c % 2 == 1

    ids = [r.doc_id for r in _documents(spark, SF)
           .select("doc_id").collect()]
    exp = []
    for d in sorted(ids):
        lat = ((d * 7919) % 18000) / 100.0 - 90.0
        lon = ((d * 104729) % 36000) / 100.0 - 180.0
        if inside(lon, lat):
            exp.append((d, round(lat, 6), round(lon, 6)))
    assert got == exp[:20]
