"""Round-3t ops: matrix / normalization evaluators (solrj/io/eval/:
MatrixEvaluator, TransposeEvaluator, RowAt/ColumnAt,
SumRows/SumColumns/GrandSum, RowCount/ColumnCount, ScaleEvaluator,
MinMaxScaleEvaluator, UnitEvaluator, NormalizeSumEvaluator,
Log10Evaluator, DistanceEvaluator — commons-math
Euclidean/Manhattan/CanberraDistance)."""

import math

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs}), docs


def _series(docs):
    rows = docs.select("doc_id", "n_chars").collect()
    rows.sort(key=lambda r: r["doc_id"])
    return [float(r["n_chars"]) for r in rows]


def _tuple_over_series(ev, exprs):
    body = ", ".join(f"{k}={v}" for k, v in exprs.items())
    return ev.eval('let(a=search(documents, q="*:*", '
                   'fl="doc_id,n_chars", sort="doc_id asc"), '
                   f'x=col(a, n_chars), tuple({body}))').collect()[0]


# ---------------------------------------------------------------------------
# matrix construction + shape + access
# ---------------------------------------------------------------------------

def test_matrix_shape_and_access(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "rc": "rowCount(matrix(x, rev(x)))",
        "cc": "columnCount(matrix(x, rev(x)))",
        "r1last": "valueAt(rowAt(matrix(x, rev(x)), 1), 0)",
        "c2": "valueAt(columnAt(matrix(x, rev(x)), 2), 1)"})
    assert r["rc"] == 2 and r["cc"] == len(v)
    assert r["r1last"] == v[-1]       # rev(x)[0]
    assert r["c2"] == v[-3]           # rev(x)[2]


def test_transpose_is_involution_on_access(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "t01": "valueAt(rowAt(transpose(matrix(x, rev(x))), 0), 1)",
        "t50": "valueAt(rowAt(transpose(matrix(x, rev(x))), 5), 0)",
        "trc": "rowCount(transpose(matrix(x, rev(x))))",
        "tcc": "columnCount(transpose(matrix(x, rev(x))))"})
    assert r["t01"] == v[-1]          # m[1][0]
    assert r["t50"] == v[5]           # m[0][5]
    assert r["trc"] == len(v) and r["tcc"] == 2


# ---------------------------------------------------------------------------
# matrix sums
# ---------------------------------------------------------------------------

def test_matrix_sums(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    s = sum(v)
    r = _tuple_over_series(ev, {
        "gs": "grandSum(matrix(x, rev(x)))",
        "sr0": "valueAt(sumRows(matrix(x, rev(x))), 0)",
        "sr1": "valueAt(sumRows(matrix(x, rev(x))), 1)",
        "sc0": "valueAt(sumColumns(matrix(x, rev(x))), 0)"})
    assert r["gs"] == 2 * s
    assert r["sr0"] == s and r["sr1"] == s
    assert r["sc0"] == v[0] + v[-1]


# ---------------------------------------------------------------------------
# normalizations
# ---------------------------------------------------------------------------

def test_minmax_scale_default_and_custom_range(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    mn, mx = min(v), max(v)
    r = _tuple_over_series(ev, {
        "d3": "valueAt(minMaxScale(x), 3)",
        "c3": "valueAt(minMaxScale(x, 10, 20), 3)",
        "lo": "valueAt(minMaxScale(x), 0)"})
    assert r["d3"] == pytest.approx((v[3] - mn) / (mx - mn), rel=1e-12)
    assert r["c3"] == pytest.approx(
        10 + (v[3] - mn) * 10.0 / (mx - mn), rel=1e-12)
    assert 0.0 <= r["lo"] <= 1.0


def test_unitize_and_normalize_sum(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    nrm = math.sqrt(sum(a * a for a in v))
    r = _tuple_over_series(ev, {
        "u3": "valueAt(unitize(x), 3)",
        "ulen": "dotProduct(unitize(x), unitize(x))",
        "n3": "valueAt(normalizeSum(x), 3)",
        "nsum": "valueAt(sumRows(matrix(normalizeSum(x))), 0)"})
    assert r["u3"] == pytest.approx(v[3] / nrm, rel=1e-12)
    assert r["ulen"] == pytest.approx(1.0, rel=1e-10)
    assert r["n3"] == pytest.approx(v[3] / sum(v), rel=1e-12)
    assert r["nsum"] == pytest.approx(1.0, rel=1e-10)


def test_scale_and_log10(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "s3": "valueAt(scale(2.5, x), 3)",
        "l3": "valueAt(log10(x), 3)",
        "lscalar": "log10(1000)"})
    assert r["s3"] == 2.5 * v[3]
    assert r["l3"] == pytest.approx(math.log10(v[3]), rel=1e-14)
    assert r["lscalar"] == pytest.approx(3.0, abs=1e-12)


# ---------------------------------------------------------------------------
# distances
# ---------------------------------------------------------------------------

def test_distances_match_python_twins(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    w = v[::-1]
    r = _tuple_over_series(ev, {
        "eu": "distance(x, rev(x))",
        "ma": "distance(x, rev(x), type=manhattan)",
        "ca": "distance(x, rev(x), type=canberra)",
        "self": "distance(x, x)"})
    assert r["eu"] == pytest.approx(
        math.sqrt(sum((a - b) ** 2 for a, b in zip(v, w))), rel=1e-12)
    assert r["ma"] == sum(abs(a - b) for a, b in zip(v, w))
    assert r["ca"] == pytest.approx(
        sum(0.0 if a == b == 0 else abs(a - b) / (abs(a) + abs(b))
            for a, b in zip(v, w)), rel=1e-10)
    assert r["self"] == 0.0


def test_distance_unknown_type_raises(spark):
    ev, _ = _ev(spark)
    # (chebyshev graduated to a supported type= alias in the 3ac
    # distance-marker wave — use a genuinely unknown measure)
    with pytest.raises(ValueError):
        _tuple_over_series(ev, {"d": "distance(x, x, type=mahalanobis)"})
