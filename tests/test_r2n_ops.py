"""Round-2n: English minimal stemmer (S-stemmer), exact kNN graph,
and NSW greedy graph search — laws vs python/numpy recomputation
(driver parity lives in tools/verify_contract.py)."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

# Every branch of EnglishMinimalStemmer.stem:
#   short / non-s / -us / -ss / -ies (y-rewrite) / -aies / -eies
#   (pass) / -ies at n==3 plus -es after {i,a,o,e} (pass) / -es after
#   consonant (drop s) / plain -s (drop s).
STEM_CASES = {
    "as": "as", "cat": "cat", "dogs": "dog", "focus": "focus",
    "class": "class", "queries": "query", "ponies": "pony",
    "plays": "play", "dies": "dy", "ties": "ty",
    "aliases": "aliase", "heroes": "heroes", "bases": "base",
    "skies": "sky", "merges": "merge", "boxes": "boxe",
    "joins": "join", "ss": "ss", "ies": "ies", "us": "us",
}


def test_minimal_stem_py_branches():
    from lucene_solr_spark.analysis.filters import minimal_stem_py
    for w, want in STEM_CASES.items():
        assert minimal_stem_py(w) == want, w


def test_minimal_stem_three_way_parity(spark):
    """The shared SQL text computes the python reference in BOTH
    engines (it must — the oracle and the Spark query run the same
    string)."""
    import duckdb
    from lucene_solr_spark.analysis.filters import (
        minimal_stem_py, minimal_stem_sql)
    con = duckdb.connect()
    for w in STEM_CASES:
        want = minimal_stem_py(w)
        got_d = con.execute(
            "SELECT " + minimal_stem_sql(f"'{w}'")).fetchone()[0]
        got_s = spark.sql(
            "SELECT " + minimal_stem_sql(f"'{w}'")).first()[0]
        assert got_d == want == got_s, w


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def vecs(emb):
    return {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}


def _cos(a, b):
    return round(float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b))), 6)


def _sample(vecs):
    return sorted(v for v in vecs if v % 10 == 0 and v != 0)


def test_knn_graph_law(spark, emb, vecs):
    """Each sampled node has exactly M out-edges, and they are the
    brute-force top-M by (cosine DESC round-6, dst ASC)."""
    from lucene_solr_spark.vector.ann import knn_graph
    nodes = _sample(vecs)
    sub = emb.filter(emb.vec_id.isin(nodes))
    got = {}
    for r in knn_graph(sub, m=4).collect():
        got.setdefault(r.src, []).append((r.dst, r.cos_sd))
    assert set(got) == set(nodes)
    for src in nodes:
        exp = sorted(((_cos(vecs[src], vecs[d]), d)
                      for d in nodes if d != src),
                     key=lambda t: (-t[0], t[1]))[:4]
        assert sorted(got[src], key=lambda t: (-t[1], t[0])) == [
            (d, c) for c, d in exp], src


def test_nsw_greedy_chain_law(spark, emb, vecs):
    """The hop chain equals a python greedy walk over the same graph:
    at each hop move to the unvisited out-neighbor with max
    (cos-to-query round-6), id ASC tie-break."""
    from lucene_solr_spark.vector.ann import knn_graph, nsw_greedy_search
    nodes = _sample(vecs)
    sub = emb.filter(emb.vec_id.isin(nodes))
    g = knn_graph(sub, m=4)
    adj = {}
    for r in g.collect():
        adj.setdefault(r.src, []).append(r.dst)
    q = vecs[0]
    got = [(r.hop, r.vec_id, r.cos)
           for r in nsw_greedy_search(emb, g, query_vec_id=0,
                                      entry_id=nodes[0],
                                      hops=3).collect()]
    cur, visited = nodes[0], {nodes[0]}
    exp = [(0, cur, _cos(q, vecs[cur]))]
    for h in range(1, 4):
        cand = [d for d in adj[cur] if d not in visited]
        if not cand:
            break
        cur = min(cand, key=lambda d: (-_cos(q, vecs[d]), d))
        visited.add(cur)
        exp.append((h, cur, _cos(q, vecs[cur])))
    assert sorted(got) == exp


def test_ltr_tree_sql_matches_python(spark):
    """The shared tree-ensemble CASE text scores like an explicit
    python walk of the two trees (<= threshold+SLACK goes left)."""
    from __spark_entry__ import _LTRT_SLACK, _ltr_trees_sql

    def trees_py(bm25, flen, fen):
        t1 = ((0.3 if flen <= 6.5 + _LTRT_SLACK else 1.7)
              if bm25 <= 2.0 + _LTRT_SLACK else 2.4)
        t2 = ((-0.5 if bm25 <= 2.5 + _LTRT_SLACK else 0.8)
              if fen <= 0.5 + _LTRT_SLACK else 1.9)
        return round(1.0 * t1 + 2.0 * t2, 6)

    pts = [(0.0, 5.0, 0.0), (2.0, 7.0, 1.0), (2.0 + _LTRT_SLACK, 6.5, 0.5),
           (2.2, 6.0, 0.0), (3.0, 8.0, 1.0), (2.5, 6.5, 0.5),
           (2.500002, 9.9, 1.0)]
    sql = _ltr_trees_sql("b", "l", "e")
    df = spark.createDataFrame(pts, "b double, l double, e double")
    got = [r[0] for r in
           df.selectExpr(f"round({sql}, 6)").collect()]
    assert got == [trees_py(*p) for p in pts]
