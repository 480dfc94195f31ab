"""Round-3ak ops: the 2-D computational-geometry family —
ConvexHullEvaluator.java:40 (commons-math MonotoneChain) with
GetVertices/GetBaryCenter/GetArea/GetBoundarySize/ProjectToBorder,
EnclosingDiskEvaluator.java:40 (WelzlEncloser; the minimal disk is
unique, engine enumerates candidates deterministically) with
GetCenter/GetRadius/GetSupportPoints, and LatLonVectorsEvaluator
.java:60."""

import math

import pytest

SF = "/root/testdata/sf0.001"

# a square plus interior points — hull is the 4 corners
SQ = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0),
      (2.0, 1.0), (1.0, 2.0), (3.0, 3.0)]


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs})


def _one(spark, expr):
    return _ev(spark).eval(expr).collect()[0]


def _mat(pts):
    return "matrix(" + ", ".join(f"array({x}, {y})"
                                 for x, y in pts) + ")"


def test_convex_hull_square(spark):
    r = _one(spark, f'let(h=convexHull({_mat(SQ)}), '
                    'tuple(v=getVertices(h), b=getBaryCenter(h), '
                    'a=getArea(h), p=getBoundarySize(h)))')
    # monotone chain: CCW from the leftmost-lowest vertex
    assert r["v"] == [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]
    assert r["b"] == [2.0, 2.0]
    assert r["a"] == 16.0 and r["p"] == 16.0


def test_convex_hull_triangle_area_perimeter(spark):
    tri = [(0.0, 0.0), (3.0, 0.0), (0.0, 4.0), (1.0, 1.0)]
    r = _one(spark, f'let(h=convexHull({_mat(tri)}), '
                    'tuple(a=getArea(h), p=getBoundarySize(h), '
                    'v=getVertices(h)))')
    assert r["a"] == 6.0
    assert r["p"] == 12.0            # 3 + 4 + 5
    assert len(r["v"]) == 3


def test_project_to_border(spark):
    r = _one(spark, f'let(h=convexHull({_mat(SQ)}), '
                    'tuple(p=projectToBorder(h, '
                    'matrix(array(2.0, 1.0), array(5.0, 2.0), '
                    'array(-1.0, 2.0)))))')
    # interior (2,1) -> bottom edge (2,0); outside (5,2) -> right
    # edge (4,2); outside (-1,2) -> left edge (0,2)
    assert r["p"] == [[2.0, 0.0], [4.0, 2.0], [0.0, 2.0]]


def test_enclosing_disk_square(spark):
    r = _one(spark, f'let(d=enclosingDisk({_mat(SQ)}), '
                    'tuple(c=getCenter(d), r=getRadius(d), '
                    's=getSupportPoints(d)))')
    assert r["c"] == [2.0, 2.0]
    assert abs(r["r"] - 2.0 * math.sqrt(2.0)) < 1e-9
    # the square's diagonal corners determine the disk
    assert all(s in [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]
               for s in r["s"])


def test_enclosing_disk_obtuse_triangle_uses_diameter(spark):
    # obtuse triangle: the min disk is the long side's diameter
    tri = [(0.0, 0.0), (10.0, 0.0), (2.0, 1.0)]
    r = _one(spark, f'let(d=enclosingDisk({_mat(tri)}), '
                    'tuple(c=getCenter(d), r=getRadius(d), '
                    's=getSupportPoints(d)))')
    assert r["c"] == [5.0, 0.0] and r["r"] == 5.0
    assert sorted(r["s"]) == [[0.0, 0.0], [10.0, 0.0]]


def test_latlon_vectors(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    t = spark.createDataFrame(
        [("a", "37.7749,-122.4194"), ("b", "40.7128 -74.0060")],
        "id string, loc string")
    ev = StreamEvaluator({"t": t})
    r = ev.eval(
        'let(c=cell(c, search(t, q="*:*", fl="id,loc", '
        'sort="id asc")), m=latlonVectors(c, field=loc), '
        'tuple(rows=m, rl=getRowLabels(m), '
        'cl=getColumnLabels(m)))').collect()[0]
    assert r["rl"] == ["a", "b"]
    assert r["cl"] == ["lat", "lon"]
    assert r["rows"] == [[37.7749, -122.4194], [40.7128, -74.006]]


def test_geometry_accessor_guards(spark):
    with pytest.raises(ValueError, match="convexHull result"):
        _one(spark, 'tuple(v=getVertices(array(1.0)))')
    with pytest.raises(ValueError, match="enclosingDisk result"):
        _one(spark, 'tuple(v=getRadius(array(1.0)))')
