"""Round-3w ops: interpolation / combinatorics / distance markers
(solrj/io/eval/: LerpEvaluator — LinearInterpolator,
KnnRegressionEvaluator, DistanceEvaluator.java:65 marker pattern with
Manhattan/Chebyshev/EarthMovers measures, LeftShift/RightShift
(ltrim/rtrim), Factorial/BinomialCoefficient/Primes/Oscillate)."""

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
# lerp — piecewise linear interpolation
# ---------------------------------------------------------------------------

def test_lerp_y_only_form_interpolates(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "mid": "predict(lerp(copyOfRange(x, 0, 50)), 7.25)",
        "knot": "predict(lerp(copyOfRange(x, 0, 50)), 12)",
        "arr0": "valueAt(predict(lerp(copyOfRange(x, 0, 10)), "
                "array(2.5, 6)), 0)"})
    y = v[:50]
    assert r["mid"] == y[7] + 0.25 * (y[8] - y[7])
    assert r["knot"] == y[12]  # exact knot hit
    assert r["arr0"] == y[2] + 0.5 * (y[3] - y[2])


def test_lerp_explicit_knots(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "p": "predict(lerp(array(0, 10, 20), array(100, 200, 400)), "
             "15)"})
    assert r["p"] == 300.0


# ---------------------------------------------------------------------------
# knnRegress — mean of the k nearest knots
# ---------------------------------------------------------------------------

def test_knn_regress_mean_of_k_nearest(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    pairs = sorted((abs(a - 300.0), b) for a, b in zip(v, v[::-1]))
    expect = sum(y for _, y in pairs[:5]) / 5.0
    r = _tuple_over_series(ev, {
        "kr": "predict(knnRegress(x, rev(x), 5), 300)"})
    assert r["kr"] == pytest.approx(expect, rel=1e-12)


# ---------------------------------------------------------------------------
# distance markers
# ---------------------------------------------------------------------------

def test_distance_markers_match_type_alias(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "m1": "distance(x, rev(x), manhattan())",
        "m2": "distance(x, rev(x), type=manhattan)",
        "e1": "distance(x, rev(x), euclidean())",
        "e2": "distance(x, rev(x))"})
    assert r["m1"] == r["m2"]
    assert r["e1"] == r["e2"]


def test_chebyshev_and_earthmovers(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    w = v[::-1]
    r = _tuple_over_series(ev, {
        "dc": "distance(x, rev(x), chebyshev())",
        "de": "distance(x, rev(x), earthMovers())"})
    assert r["dc"] == max(abs(a - b) for a, b in zip(v, w))
    last = total = 0.0
    for a, b in zip(v, w):
        last = last + (a - b)
        total += abs(last)
    assert r["de"] == total


def test_distance_marker_rejects_args(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError):
        _tuple_over_series(ev, {"d": "distance(x, x, manhattan(x))"})


# ---------------------------------------------------------------------------
# ltrim / rtrim — array shifts
# ---------------------------------------------------------------------------

def test_ltrim_rtrim(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "l0": "valueAt(ltrim(x, 5), 0)",
        "ll": "length(ltrim(x, 5))",
        "r0": "valueAt(rtrim(x, 5), 0)",
        "rl": "length(rtrim(x, 5))",
        "rlast": "valueAt(rtrim(x, 5), sub(length(rtrim(x, 5)), 1))"})
    assert r["l0"] == v[5] and r["ll"] == len(v) - 5
    assert r["r0"] == v[0] and r["rl"] == len(v) - 5
    assert r["rlast"] == v[-6]


# ---------------------------------------------------------------------------
# combinatorics + oscillate
# ---------------------------------------------------------------------------

def test_factorial_binomial_primes(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "f0": "factorial(0)", "f1": "factorial(1)",
        "f12": "factorial(12)",
        "b": "binomialCoefficient(20, 7)",
        "bk0": "binomialCoefficient(9, 0)",
        "bsym": "binomialCoefficient(20, 13)",
        "p0": "valueAt(primes(10, 2), 0)",
        "p9": "valueAt(primes(10, 2), 9)",
        "pn": "length(primes(25, 100))"})
    assert r["f0"] == 1.0 and r["f1"] == 1.0
    assert r["f12"] == float(math.factorial(12))
    assert r["b"] == float(math.comb(20, 7))
    assert r["bk0"] == 1.0
    assert r["bsym"] == float(math.comb(20, 13))
    assert r["p0"] == 2.0 and r["p9"] == 29.0
    assert r["pn"] == 25


def test_oscillate_sine_wave(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "n": "length(oscillate(2, 0.1, 0.5))",
        "v7": "valueAt(oscillate(2, 0.1, 0.5), 7)"})
    assert r["n"] == 128
    assert r["v7"] == pytest.approx(2.0 * math.sin(0.1 * 7 + 0.5),
                                    rel=1e-12)
