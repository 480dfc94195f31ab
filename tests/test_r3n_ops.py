"""Round-3n ops: D4 prototype pruning, facet2D stream, context
suggester."""

import math

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ssl_prune (D4 / SSL prototypes)
# ---------------------------------------------------------------------------

def test_ssl_prune_python_twin(spark):
    import numpy as np
    from lucene_solr_spark.vector.ann import ssl_prune
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    cents = {i: v for i, v in vecs.items() if i % 37 == 0}

    def cos(a, b):
        return round(float(a @ b) / (math.sqrt(float(a @ a))
                                     * math.sqrt(float(b @ b))), 6)

    assign = {}
    for i, v in vecs.items():
        best = max(((cos(v, c), -ci) for ci, c in cents.items()))
        assign[i] = (-best[1], best[0])   # cent_id, proto

    clusters = {}
    for i, (c, p) in assign.items():
        clusters.setdefault(c, []).append((p, i))

    got = {r["vec_id"]: r for r in ssl_prune(emb).collect()}
    assert set(got) == set(vecs)
    for c, members in clusters.items():
        members.sort()                    # proto ASC, id ASC
        keep = math.ceil(len(members) * 0.5)
        for rank, (p, i) in enumerate(members, 1):
            r = got[i]
            assert r["cent_id"] == c
            assert r["proto"] == p
            assert r["kept"] == (rank <= keep)
    # pruning actually drops the prototypical half
    n_kept = sum(1 for r in got.values() if r["kept"])
    assert 0.4 <= n_kept / len(got) <= 0.75


def test_ssl_prune_prunes_most_prototypical(spark):
    """Within every cluster, the max-proto member is dropped whenever
    the cluster has >= 2 members (the D4 'easy example' removal)."""
    from lucene_solr_spark.vector.ann import ssl_prune
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = ssl_prune(emb).collect()
    by_c = {}
    for r in rows:
        by_c.setdefault(r["cent_id"], []).append(r)
    multi = 0
    for c, ms in by_c.items():
        if len(ms) < 2:
            continue
        multi += 1
        top = max(ms, key=lambda r: (r["proto"], -r["vec_id"]))
        assert not top["kept"]
    assert multi > 0


# ---------------------------------------------------------------------------
# facet2D stream
# ---------------------------------------------------------------------------

def test_facet2d_python_twin(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = StreamEvaluator({"documents": docs})
    out = ev.eval('facet2D(documents, q="*:*", x="lang", y="source", '
                  'dimensions="3,4", count(*))').collect()

    agg = {}
    for r in docs.select("lang", "source").collect():
        agg[(r["lang"], r["source"])] = \
            agg.get((r["lang"], r["source"]), 0) + 1
    tot = {}
    for (l, s), c in agg.items():
        tot[l] = tot.get(l, 0) + c
    top_l = sorted(tot, key=lambda l: (-tot[l], l))[:3]
    want = set()
    for l in top_l:
        ys = sorted(((s, c) for (l2, s), c in agg.items() if l2 == l),
                    key=lambda x: (-x[1], x[0]))[:4]
        want |= {(l, s, c) for s, c in ys}
    got = {(r["lang"], r["source"], r["count"]) for r in out}
    assert got == want and len(got) == 12


def test_facet2d_respects_metric(spark):
    """A sum metric ranks by the summed value, not the row count."""
    from pyspark.sql import Row
    from lucene_solr_spark.search.streams import StreamEvaluator
    rows = [Row(g="a", h="x", v=1), Row(g="a", h="y", v=100),
            Row(g="b", h="x", v=10), Row(g="b", h="x", v=10)]
    ev = StreamEvaluator({"m": None})
    ev.collections["m"] = spark.createDataFrame(rows)
    out = ev.eval('facet2D(m, q="*:*", x="g", y="h", '
                  'dimensions="1,1", sum(v))').collect()
    assert len(out) == 1
    r = out[0]
    assert (r["g"], r["h"], r["sum_v"]) == ("a", "y", 100)


# ---------------------------------------------------------------------------
# context suggester
# ---------------------------------------------------------------------------

def test_suggest_context_weights_are_context_scoped(spark):
    import __spark_entry__ as entry
    se = entry._searcher(spark, SF)
    post = se.ix.postings.select("docid", "term", "tf").collect()
    lang = {r["docid"]: r["lang"]
            for r in se.ix.source.select("docid", "lang").collect()}
    w = {}
    for r in post:
        if r["term"].startswith("s") and lang[r["docid"]] == "en":
            w[r["term"]] = w.get(r["term"], 0) + r["tf"]
    want = sorted(w.items(), key=lambda x: (-x[1], x[0]))[:10]
    got = [(r["term"], r["weight"])
           for r in entry._q_suggest_context(spark, SF).collect()]
    assert got == want and got
    # context scoping matters: global weights differ
    gw = {}
    for r in post:
        if r["term"].startswith("s"):
            gw[r["term"]] = gw.get(r["term"], 0) + r["tf"]
    assert any(gw[t] != c for t, c in w.items())
