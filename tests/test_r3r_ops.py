"""Round-3r ops: statistical evaluators (solrj/io/eval:
CovarianceEvaluator, CorrelationEvaluator, RegressionEvaluator,
PredictEvaluator, GetValueEvaluator,
ExponentialMovingAverageEvaluator, FrequencyTableEvaluator,
DescribeEvaluator — commons-math Covariance/PearsonsCorrelation/
SimpleRegression/Frequency/DescriptiveStatistics semantics)."""

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
# cov / corr — python twins with the same formula shape
# ---------------------------------------------------------------------------

def _cov(x, y):
    n = float(len(x))
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    return (sxy - sx * sy / n) / (n - 1.0)


def test_cov_matches_python_twin(spark):
    ev, docs = _ev(spark)
    r = _tuple_over_series(ev, {"cv": "cov(x, rev(x))"})
    v = _series(docs)
    assert r["cv"] == pytest.approx(_cov(v, v[::-1]), rel=1e-12)


def test_cov_of_series_with_itself_is_variance(spark):
    ev, docs = _ev(spark)
    r = _tuple_over_series(ev, {"cv": "cov(x, x)",
                                "vr": "variance(x)"})
    assert r["cv"] == pytest.approx(r["vr"], rel=1e-12)


def test_corr_of_series_with_itself_is_one(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {"r": "corr(x, x)"})
    assert r["r"] == pytest.approx(1.0, abs=1e-12)


def test_corr_is_cov_over_sds(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {"r": "corr(x, rev(x))"})
    n = float(len(v))
    sd2 = (sum(a * a for a in v) - sum(v) ** 2 / n) / (n - 1.0)
    expect = _cov(v, v[::-1]) / sd2  # sd(x) == sd(rev(x))
    assert r["r"] == pytest.approx(expect, rel=1e-10)


# ---------------------------------------------------------------------------
# regress / predict / getValue — SimpleRegression OLS laws
# ---------------------------------------------------------------------------

def test_regress_fields_match_ols_twin(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    y = v[::-1]
    r = _tuple_over_series(ev, {
        "slope": "getValue(regress(x, rev(x)), slope)",
        "icept": "getValue(regress(x, rev(x)), intercept)",
        "r2": "getValue(regress(x, rev(x)), RSquared)",
        "n": "getValue(regress(x, rev(x)), N)"})
    n = float(len(v))
    sx, sy = sum(v), sum(y)
    sxx = sum(a * a for a in v)
    sxy = sum(a * b for a, b in zip(v, y))
    cxx = sxx - sx * sx / n
    cxy = sxy - sx * sy / n
    slope = cxy / cxx
    assert r["n"] == len(v)
    assert r["slope"] == pytest.approx(slope, rel=1e-12)
    assert r["icept"] == pytest.approx(sy / n - slope * (sx / n),
                                       rel=1e-12)
    # y = rev(x) -> cyy == cxx, R^2 = slope * cxy / cyy
    assert r["r2"] == pytest.approx(slope * cxy / cxx, rel=1e-10)


def test_predict_at_literal_is_line_evaluation(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "slope": "getValue(regress(x, rev(x)), slope)",
        "icept": "getValue(regress(x, rev(x)), intercept)",
        "pred": "predict(regress(x, rev(x)), 250)"})
    assert r["pred"] == pytest.approx(
        r["icept"] + r["slope"] * 250.0, rel=1e-12)


def test_predict_over_array_is_elementwise(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "slope": "getValue(regress(x, rev(x)), slope)",
        "icept": "getValue(regress(x, rev(x)), intercept)",
        "p0": "valueAt(predict(regress(x, rev(x)), x), 0)",
        "x0": "valueAt(x, 0)"})
    assert r["p0"] == pytest.approx(
        r["icept"] + r["slope"] * r["x0"], rel=1e-12)


def test_perfect_line_regresses_exactly(spark):
    # x regressed on itself: slope 1, intercept 0, R^2 1, MSE 0
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "slope": "getValue(regress(x, x), slope)",
        "icept": "getValue(regress(x, x), intercept)",
        "r2": "getValue(regress(x, x), RSquared)",
        "mse": "getValue(regress(x, x), meanSquareError)"})
    assert r["slope"] == pytest.approx(1.0, abs=1e-12)
    assert r["icept"] == pytest.approx(0.0, abs=1e-9)
    assert r["r2"] == pytest.approx(1.0, abs=1e-12)
    assert r["mse"] == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# expMovingAvg — the EMA recurrence (seed = mean of first w)
# ---------------------------------------------------------------------------

def _ema(v, w, alpha=None):
    if alpha is None:
        alpha = 2.0 / (w + 1.0)
    out = [sum(v[:w]) / w]
    for x in v[w:]:
        out.append(alpha * (x - out[-1]) + out[-1])
    return out


def test_ema_matches_python_recurrence(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "n": "length(expMovingAvg(x, 4))",
        "first": "valueAt(expMovingAvg(x, 4), 0)",
        "last": "valueAt(expMovingAvg(x, 4), "
                "sub(length(expMovingAvg(x, 4)), 1))"})
    tw = _ema(v, 4)
    assert r["n"] == len(tw) == len(v) - 3
    assert r["first"] == tw[0]
    assert r["last"] == tw[-1]  # bit-exact: same fold order


def test_ema_explicit_alpha_one_tracks_series(spark):
    # alpha=1: ema_i = x_i after the seed
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "last": "valueAt(expMovingAvg(x, 3, 1.0), "
                "sub(length(expMovingAvg(x, 3, 1.0)), 1))"})
    assert r["last"] == v[-1]


# ---------------------------------------------------------------------------
# freqTable — commons-math Frequency over longValue()s
# ---------------------------------------------------------------------------

def test_freqtable_counts_and_cumulative_laws(spark):
    ev, docs = _ev(spark)
    out = ev.eval('let(a=search(documents, q="*:*", '
                  'fl="doc_id,n_chars", sort="doc_id asc"), '
                  'x=col(a, n_chars), tuple(ft=freqTable(x)))')
    ft = out.collect()[0]["ft"]
    v = [int(x) for x in _series(docs)]
    n = len(v)
    # ascending distinct values, counts sum to n
    vals = [row["value"] for row in ft]
    assert vals == sorted(set(v))
    assert sum(row["count"] for row in ft) == n
    # cumFreq is the running count; final row covers everything
    running = 0
    for row in ft:
        running += row["count"]
        assert row["cumFreq"] == running
        assert row["pct"] == pytest.approx(row["count"] / n)
        assert row["cumPct"] == pytest.approx(running / n)
    assert ft[-1]["cumFreq"] == n
    assert ft[-1]["cumPct"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# describe — DescriptiveStatistics moments (bias-corrected)
# ---------------------------------------------------------------------------

def test_describe_matches_python_moment_twin(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {"d": "describe(x)"})["d"]
    n = float(len(v))
    s = sum(v)
    ssq = sum(a * a for a in v)
    scb = sum(a * a * a for a in v)
    sq4 = sum(a * a * a * a for a in v)
    m = s / n
    var = (ssq - s * s / n) / (n - 1.0)
    sd = math.sqrt(var)
    m3 = scb - 3.0 * m * ssq + 2.0 * n * m * m * m
    m4 = (sq4 - 4.0 * m * scb + 6.0 * m * m * ssq
          - 3.0 * n * m * m * m * m)
    skew = n / ((n - 1.0) * (n - 2.0)) * m3 / (sd * sd * sd)
    kurt = ((n * (n + 1.0) / ((n - 1.0) * (n - 2.0) * (n - 3.0)))
            * m4 / (var * var)
            - (3.0 * (n - 1.0) * (n - 1.0))
            / ((n - 2.0) * (n - 3.0)))
    assert r["N"] == len(v)
    assert r["max"] == max(v) and r["min"] == min(v)
    assert r["sum"] == s and r["sumsq"] == ssq
    assert r["mean"] == pytest.approx(m, rel=1e-14)
    assert r["var"] == pytest.approx(var, rel=1e-12)
    assert r["stdev"] == pytest.approx(sd, rel=1e-12)
    assert r["popVar"] == pytest.approx((ssq - s * s / n) / n,
                                        rel=1e-12)
    assert r["skewness"] == pytest.approx(skew, rel=1e-10)
    assert r["kurtosis"] == pytest.approx(kurt, rel=1e-10)
    gmean = math.exp(sum(math.log(a) for a in v) / n)
    assert r["geometricMean"] == pytest.approx(gmean, rel=1e-10)


def test_corr_rejects_unknown_type_param(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError):
        _tuple_over_series(ev, {"r": "corr(x, x, type=spearmans)"})
