"""Round-3f ops: {!knn} qparser, sampled facets, DPO preference
pairs, cartesianProduct stream."""

import math

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# {!knn} qparser (KnnQParserPlugin.java)
# ---------------------------------------------------------------------------

def test_knn_localparams_spec():
    from lucene_solr_spark.search.localparams import Knn, local_query
    kn = local_query("{!knn f=embedding topK=7}[0.5, -1.0, 0.25]")
    assert isinstance(kn, Knn)
    assert kn.field == "embedding" and kn.top_k == 7
    assert kn.vector == (0.5, -1.0, 0.25)
    # topK default 10
    assert local_query("{!knn f=v}[1.0]").top_k == 10


def test_knn_localparams_errors():
    from lucene_solr_spark.search.localparams import (LocalParamsError,
                                                      local_query)
    with pytest.raises(LocalParamsError):
        local_query("{!knn topK=3}[1.0]")        # f required
    with pytest.raises(LocalParamsError):
        local_query("{!knn f=v}not a vector")
    with pytest.raises(LocalParamsError):
        local_query("{!knn f=v}[1.0, oops]")


def test_knn_scores_numpy_twin(spark):
    """cosine_topk_vec top-k equals numpy (1+cos)/2 over the corpus —
    VectorSimilarityFunction.COSINE's normalization."""
    import numpy as np
    import __spark_entry__ as entry
    from lucene_solr_spark.vector.ann import cosine_topk_vec

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = np.array(entry._KNN_VEC, dtype=np.float64)
    got = [(r["vec_id"], r["score"])
           for r in cosine_topk_vec(emb, entry._KNN_VEC, k=10).collect()]

    rows = emb.select("vec_id", "embedding").collect()
    want = []
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        cos = float(v @ q) / (math.sqrt(float(v @ v))
                              * math.sqrt(float(q @ q)))
        want.append((r["vec_id"], round((1.0 + cos) / 2.0, 6)))
    want.sort(key=lambda x: (-x[1], x[0]))
    assert got == want[:10]
    assert all(0.0 <= s <= 1.0 for _, s in got)


# ---------------------------------------------------------------------------
# Sampled facets (RandomSamplingFacetsCollector.java)
# ---------------------------------------------------------------------------

def test_facet_sampled_is_quarter_of_matchset(spark):
    """The sample is exactly the Wang-hash quarter of the match set,
    per-facet estimates are 4x the sampled counts, and the estimate
    tracks the exact facet counts."""
    import __spark_entry__ as entry
    from lucene_solr_spark.search.query import Term
    from lucene_solr_spark.search.randomsort import wang_hash32

    se = entry._searcher(spark, SF)
    hits = [r["docid"] for r in
            se.matching(Term(entry._SAMPLE_TERM)).collect()]
    kept = {d for d in hits
            if wang_hash32(d + entry._SAMPLE_SEED) % 4 == 0}
    src = {r["docid"]: r["source"]
           for r in se.ix.source.select("docid", "source").collect()}

    got = {r["source"]: (r["n_sampled"], r["n_est"])
           for r in entry._q_facet_sampled(spark, SF).collect()}
    want = {}
    for d in kept:
        want[src[d]] = want.get(src[d], 0) + 1
    assert got == {s: (n, 4 * n) for s, n in want.items()}

    # estimate quality: total estimate within 50% of the true hit
    # count at this tiny scale (sanity that the sample isn't empty)
    assert hits and kept
    est_total = sum(e for _, e in got.values())
    assert 0.5 * len(hits) <= est_total <= 1.5 * len(hits)


# ---------------------------------------------------------------------------
# pref_pairs (DPO / InstructGPT comparison data)
# ---------------------------------------------------------------------------

def test_pref_pairs_python_twin(spark):
    from lucene_solr_spark.textops.ops import fasttext_score, pref_pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    probs = {r["doc_id"]: r["prob"]
             for r in fasttext_score(docs).collect()}

    convs = {}
    for d, p in probs.items():
        if (d % 8) % 2 == 1:
            convs.setdefault(d // 8, []).append((d, p))

    got = {r["conv_id"]: r for r in pref_pairs(docs).collect()}
    want_ids = {c for c, turns in convs.items() if len(turns) >= 2}
    assert set(got) == want_ids
    for c in want_ids:
        turns = convs[c]
        chosen = min(turns, key=lambda t: (-t[1], t[0]))
        rejected = min(turns, key=lambda t: (t[1], -t[0]))
        r = got[c]
        assert (r["chosen_id"], r["chosen_prob"]) == (chosen[0], chosen[1])
        assert (r["rejected_id"], r["rejected_prob"]) == \
            (rejected[0], rejected[1])
        assert r["n_asst"] == len(turns)
        assert r["margin"] == round(chosen[1] - rejected[1], 6)
        assert r["chosen_id"] != r["rejected_id"]
        assert r["chosen_prob"] >= r["rejected_prob"]


def test_pref_pairs_full_tie_yields_distinct_docs(spark):
    """A conversation whose assistant turns all share one reward must
    still emit chosen != rejected (lowest vs highest doc id)."""
    from pyspark.sql import Row
    from lucene_solr_spark.textops.ops import pref_pairs
    # doc ids 0..7 = one conversation; identical text => identical prob
    df = spark.createDataFrame(
        [Row(doc_id=i, text="same same same") for i in range(8)])
    rows = pref_pairs(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["conv_id"] == 0 and r["n_asst"] == 4
    assert r["chosen_id"] == 1 and r["rejected_id"] == 7
    assert r["margin"] == 0.0


# ---------------------------------------------------------------------------
# cartesianProduct stream (CartesianProductStream.java)
# ---------------------------------------------------------------------------

def _mk_eval(spark, extra=None):
    from lucene_solr_spark.search.streams import StreamEvaluator
    colls = {"documents": spark.read.parquet(f"{SF}/documents.parquet")}
    colls.update(extra or {})
    return StreamEvaluator(colls)


def test_cartesian_product_explodes_per_value(spark):
    from pyspark.sql import Row
    ev = _mk_eval(spark, {"m": None})
    ev.collections["m"] = spark.createDataFrame(
        [Row(id=1, vals=["b", "a"]), Row(id=2, vals=["z"]),
         Row(id=3, vals=[])])
    out = ev.eval('cartesianProduct(search(m, q="*:*", fl="id,vals"), '
                  'vals as v)').collect()
    assert sorted((r["id"], r["v"]) for r in out) == \
        [(1, "a"), (1, "b"), (2, "z")]   # empty array emits nothing


def test_cartesian_product_product_sort_is_per_tuple(spark):
    """productSort orders the emission WITHIN each incoming tuple
    (CartesianProductStream.java:151) — no global re-sort."""
    from pyspark.sql import Row
    ev = _mk_eval(spark, {})
    ev.collections["m"] = spark.createDataFrame(
        [Row(id=2, vals=["d", "c"]), Row(id=1, vals=["b", "a"])])
    out = ev.eval('cartesianProduct(search(m, q="*:*", fl="id,vals", '
                  'sort="id desc"), vals as v, productSort="v asc")')
    rows = [(r["id"], r["v"]) for r in out.collect()]
    assert rows == [(2, "c"), (2, "d"), (1, "a"), (1, "b")]
    with pytest.raises(ValueError):
        ev.eval('cartesianProduct(search(m, q="*:*", fl="id,vals"), '
                'vals as v, productSort="other asc")').collect()


def test_cartesian_registry_counts_match_flat_tokens(spark):
    """The registry pipeline's term counts equal counting the analyzed
    tokens directly."""
    import __spark_entry__ as entry
    from lucene_solr_spark.analysis.analyzers import simple_tokenize
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    counts = {}
    for r in docs.select("text").collect():
        for t in simple_tokenize(r["text"]):
            counts[t] = counts.get(t, 0) + 1
    want = sorted(counts.items(), key=lambda x: (-x[1], x[0]))[:15]
    got = [(r["term"], r["count"])
           for r in entry._q_stream_cartesian(spark, SF).collect()]
    assert got == want
