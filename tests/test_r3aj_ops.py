"""Round-3aj ops: the clustering family — Kmeans/MultiKmeans/
FuzzyKmeans/DbscanEvaluator.java, Get{Centroids,Cluster,
MembershipMatrix}Evaluator.java, ZplotStream.java:219 clusters mode.
dbscan is deterministic in both engines (visit order = row order) and
checked against a line-for-line python twin; the kmeans family draws
from an UNSEEDED RNG in the reference, so the engine pins
RandomState(42) and these tests pin clustering LAWS (partition
validity, centroid=member-mean, WCSS dominance, determinism)."""

import math

import pytest

SF = "/root/testdata/sf0.001"

# two tight blobs + one far noise point
PTS = [(0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (0.4, 0.4),
       (10.0, 10.0), (10.5, 10.0), (10.0, 10.5),
       (5.0, 5.0)]


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs})


def _one(spark, expr):
    return _ev(spark).eval(expr).collect()[0]


def _mat_expr(pts=PTS, labeled=True):
    rows = ", ".join(f"array({x}, {y})" for x, y in pts)
    if not labeled:
        return f"matrix({rows})"
    labs = ", ".join(f"p{i}" for i in range(len(pts)))
    return f"setRowLabels(matrix({rows}), array({labs}))"


# ---------------------------------------------------------------------------
# dbscan — deterministic, twin-checked
# ---------------------------------------------------------------------------

def _dbscan_twin(pts, eps, min_pts):
    n = len(pts)

    def d(i, j):
        return math.dist(pts[i], pts[j])

    neigh = [[j for j in range(n) if j != i and d(i, j) <= eps]
             for i in range(n)]
    assign = [-1] * n
    visited = [False] * n
    cid = -1
    for i in range(n):
        if visited[i]:
            continue
        visited[i] = True
        if len(neigh[i]) < min_pts:
            continue
        cid += 1
        assign[i] = cid
        queue = list(neigh[i])
        qi = 0
        while qi < len(queue):
            j = queue[qi]
            qi += 1
            if assign[j] == -1:
                assign[j] = cid
            if not visited[j]:
                visited[j] = True
                if len(neigh[j]) >= min_pts:
                    queue.extend(neigh[j])
    return assign


def test_dbscan_matches_twin(spark):
    want = _dbscan_twin(PTS, 1.0, 2)
    assert sorted(set(want)) == [-1, 0, 1]   # 2 clusters + noise
    r = _one(spark, f'let(m={_mat_expr()}, cl=dbscan(m, 1.0, 2), '
                    'tuple(c0=getRowLabels(getCluster(cl, 0)), '
                    'c1=getRowLabels(getCluster(cl, 1)), '
                    'k=rowCount(getCentroids(cl))))')
    assert r["c0"] == [f"p{i}" for i, a in enumerate(want) if a == 0]
    assert r["c1"] == [f"p{i}" for i, a in enumerate(want) if a == 1]
    assert r["k"] == 2


def test_dbscan_rejects_noneuclidean_marker(spark):
    with pytest.raises(ValueError, match="euclidean"):
        _one(spark, f'let(m={_mat_expr()}, '
                    'cl=dbscan(m, 1.0, 2, manhattan()), '
                    'tuple(k=rowCount(getCentroids(cl))))')


# ---------------------------------------------------------------------------
# kmeans family — law tests (reference RNG is unseeded)
# ---------------------------------------------------------------------------

BLOBS = PTS[:7]     # without the noise point


def test_kmeans_partitions_and_centroids_are_member_means(spark):
    r = _one(spark, f'let(m={_mat_expr(BLOBS)}, cl=kmeans(m, 2), '
                    'tuple(cents=getCentroids(cl), '
                    'r0=getRowLabels(getCluster(cl, 0)), '
                    'r1=getRowLabels(getCluster(cl, 1)), '
                    'm0=getCluster(cl, 0), m1=getCluster(cl, 1)))')
    got = {tuple(sorted(r["r0"])), tuple(sorted(r["r1"]))}
    # the two tight blobs are unambiguous for k=2
    assert got == {("p0", "p1", "p2", "p3"), ("p4", "p5", "p6")}
    assert len(r["cents"]) == 2
    # each centroid equals the mean of its members
    for members, rl in ((r["m0"], r["r0"]), (r["m1"], r["r1"])):
        mean = [sum(p[d] for p in members) / len(members)
                for d in range(2)]
        assert any(all(abs(c[d] - mean[d]) < 1e-9 for d in range(2))
                   for c in r["cents"])


def test_kmeans_is_deterministic_across_runs(spark):
    expr = (f'let(m={_mat_expr(BLOBS)}, cl=kmeans(m, 2), '
            'tuple(cents=getCentroids(cl)))')
    a = _one(spark, expr)["cents"]
    b = _one(spark, expr)["cents"]
    assert a == b


def test_multi_kmeans_returns_valid_two_centroid_result(spark):
    r = _one(spark, f'let(m={_mat_expr(BLOBS)}, '
                    'a=kmeans(m, 2), b=multiKmeans(m, 2, 5), '
                    'tuple(ca=getCentroids(a), cb=getCentroids(b)))')
    # both find the unambiguous 2-blob optimum; multiKmeans repeats
    # trials and keeps the best-WCSS run
    assert len(r["cb"]) == 2
    assert sorted(map(tuple, r["ca"])) == sorted(map(tuple, r["cb"]))


def test_clustering_result_is_not_a_value(spark):
    with pytest.raises(ValueError, match="clustering result"):
        _one(spark, f'let(m={_mat_expr(BLOBS)}, a=kmeans(m, 2), '
                    'tuple(v=a))')


def test_fuzzy_kmeans_memberships(spark):
    r = _one(spark, f'let(m={_mat_expr(BLOBS)}, '
                    'cl=fuzzyKmeans(m, 2, fuzziness=1.5), '
                    'tuple(u=getMembershipMatrix(cl), '
                    'k=rowCount(getCentroids(cl))))')
    assert r["k"] == 2
    assert len(r["u"]) == len(BLOBS)
    for row in r["u"]:
        assert len(row) == 2
        assert abs(sum(row) - 1.0) < 1e-9
    # blob membership is decisive at these separations
    assert all(max(row) > 0.9 for row in r["u"])


def test_membership_matrix_requires_fuzzy(spark):
    with pytest.raises(ValueError, match="fuzzyKmeans"):
        _one(spark, f'let(m={_mat_expr(BLOBS)}, cl=kmeans(m, 2), '
                    'tuple(u=getMembershipMatrix(cl)))')


# ---------------------------------------------------------------------------
# zplot clusters mode (ZplotStream.java:219)
# ---------------------------------------------------------------------------

def test_zplot_clusters_excludes_noise(spark):
    ev = _ev(spark)
    rows = ev.eval(f'let(m={_mat_expr()}, cl=dbscan(m, 1.0, 2), '
                   'zplot(clusters=cl))').collect()
    want = _dbscan_twin(PTS, 1.0, 2)
    got = sorted((r["x"], r["y"], r["cluster"]) for r in rows)
    exp = sorted((x, y, f"cluster{a + 1}")
                 for (x, y), a in zip(PTS, want) if a >= 0)
    assert got == exp
