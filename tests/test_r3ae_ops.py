"""Round-3ae ops: interpolation / curve-fitting VectorFunctions
(solrj/io/eval/{Lerp,Spline,Akima,PolyFit,Derivative,Integrate,
Predict}Evaluator.java over commons-math LinearInterpolator /
SplineInterpolator / AkimaSplineInterpolator /
PolynomialCurveFitter / RombergIntegrator).

Laws: a line-for-line python twin of the natural-cubic tridiagonal
sweep pins the spline; mathematical ground truths (interpolants pass
through knots; linear data reproduces the line; Akima reproduces
quadratics — central-difference slopes are exact for parabolas;
least squares recovers exact polynomials) pin the rest without
circular reimplementation; numpy lstsq twins polyfit; exact
antiderivatives twin integrate."""

import math

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs}), docs


def _tup(ev, exprs, lets=""):
    body = ", ".join(f"{k}={v}" for k, v in exprs.items())
    return ev.eval('let(a=search(documents, q="*:*", '
                   'fl="doc_id,n_chars", sort="doc_id asc"), '
                   f'x=col(a, n_chars), {lets}tuple({body})'
                   ')').collect()[0]


def _series(docs, n=30):
    rows = docs.select("doc_id", "n_chars").collect()
    rows.sort(key=lambda r: r["doc_id"])
    return [float(r["n_chars"]) for r in rows][:n]


def _nat_spline(y):
    """Line-for-line commons-math SplineInterpolator twin (x=0..n-1)."""
    n = len(y)
    h = [1.0] * (n - 1)
    mu = [0.0] * (n - 1)
    z = [0.0] * n
    for i in range(1, n - 1):
        g = 2.0 * 2.0 - h[i - 1] * mu[i - 1]
        mu[i] = h[i] / g
        z[i] = (3.0 * (y[i + 1] * h[i - 1] - y[i] * 2.0
                       + y[i - 1] * h[i]) / (h[i - 1] * h[i])
                - h[i - 1] * z[i - 1]) / g
    c = [0.0] * n
    b = [0.0] * (n - 1)
    d = [0.0] * (n - 1)
    for j in range(n - 2, -1, -1):
        c[j] = z[j] - mu[j] * c[j + 1]
        b[j] = (y[j + 1] - y[j]) / h[j] \
            - h[j] * (c[j + 1] + 2.0 * c[j]) / 3.0
        d[j] = (c[j + 1] - c[j]) / (3.0 * h[j])
    return b, c, d


def _spl_val(y, b, c, d, t):
    i = min(max(int(math.floor(t)), 0), len(y) - 2)
    dx = t - i
    return ((d[i] * dx + c[i]) * dx + b[i]) * dx + y[i]


# ---------------------------------------------------------------------------
# spline
# ---------------------------------------------------------------------------

def test_spline_matches_tridiagonal_twin(spark):
    ev, docs = _ev(spark)
    y = _series(docs, 20)
    b, c, d = _nat_spline(y)
    r = _tup(ev, {
        "p1": "predict(s, 7.25)",
        "p2": "predict(s, 0.5)",
        "p3": "predict(s, 18.75)",
        "k": "predict(s, 11)",
        "fit": "s"}, lets="s=spline(copyOfRange(x, 0, 20)), ")
    for key, t in (("p1", 7.25), ("p2", 0.5), ("p3", 18.75)):
        assert r[key] == pytest.approx(_spl_val(y, b, c, d, t),
                                       rel=1e-12)
    assert r["k"] == y[11]                       # knot interpolation
    # the rendered VectorFunction list = fitted values at the knots
    assert len(r["fit"]) == 20
    assert max(abs(fv - yv) for fv, yv in zip(r["fit"], y)) < 1e-9


def test_spline_linear_data_is_exact_line(spark):
    ev, _ = _ev(spark)
    ys = ", ".join(str(10 + 3 * i) for i in range(8))
    r = _tup(ev, {"p": f"predict(spline(array({ys})), 3.7)"})
    assert r["p"] == pytest.approx(10 + 3 * 3.7, rel=1e-13)


def test_spline_explicit_knots(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {"p": "predict(spline(array(0, 2, 5, 9), "
                       "array(1, 4, 2, 8)), 3.5)"})
    # twin with non-uniform h
    x = [0.0, 2.0, 5.0, 9.0]
    y = [1.0, 4.0, 2.0, 8.0]
    n = 4
    h = [x[i + 1] - x[i] for i in range(3)]
    mu = [0.0] * 3
    z = [0.0] * 4
    for i in range(1, 3):
        g = 2.0 * (x[i + 1] - x[i - 1]) - h[i - 1] * mu[i - 1]
        mu[i] = h[i] / g
        z[i] = (3.0 * (y[i + 1] * h[i - 1]
                       - y[i] * (x[i + 1] - x[i - 1])
                       + y[i - 1] * h[i]) / (h[i - 1] * h[i])
                - h[i - 1] * z[i - 1]) / g
    c = [0.0] * 4
    b = [0.0] * 3
    d = [0.0] * 3
    for j in range(2, -1, -1):
        c[j] = z[j] - mu[j] * c[j + 1]
        b[j] = (y[j + 1] - y[j]) / h[j] \
            - h[j] * (c[j + 1] + 2.0 * c[j]) / 3.0
        d[j] = (c[j + 1] - c[j]) / (3.0 * h[j])
    dx = 3.5 - 2.0
    twin = ((d[1] * dx + c[1]) * dx + b[1]) * dx + y[1]
    assert r["p"] == pytest.approx(twin, rel=1e-13)


# ---------------------------------------------------------------------------
# akima
# ---------------------------------------------------------------------------

def test_akima_interpolates_knots_and_lines(spark):
    ev, docs = _ev(spark)
    y = _series(docs, 12)
    r = _tup(ev, {
        "k": "predict(k, 6)",
        "fit": "k",
        "lin": "predict(akima(array(5, 8, 11, 14, 17, 20)), 2.3)"},
        lets="k=akima(copyOfRange(x, 0, 12)), ")
    assert r["k"] == y[6]
    assert max(abs(fv - yv) for fv, yv in zip(r["fit"], y)) < 1e-9
    assert r["lin"] == pytest.approx(5 + 3 * 2.3, rel=1e-13)


def test_akima_reproduces_quadratics(spark):
    # central-difference slopes are exact for parabolas, so the
    # Hermite segments reproduce the quadratic exactly — a ground
    # truth independent of any reimplementation (interior segments;
    # endpoint slopes come from the exact 3-point quadratic too)
    ev, _ = _ev(spark)
    ys = ", ".join(str(2 * i * i - 3 * i + 7) for i in range(9))
    r = _tup(ev, {"p": f"predict(akima(array({ys})), 4.6)",
                  "q": f"predict(akima(array({ys})), 1.2)"})
    f = lambda t: 2 * t * t - 3 * t + 7
    assert r["p"] == pytest.approx(f(4.6), rel=1e-12)
    assert r["q"] == pytest.approx(f(1.2), rel=1e-12)


# ---------------------------------------------------------------------------
# polyfit
# ---------------------------------------------------------------------------

def test_polyfit_recovers_exact_polynomials(spark):
    ev, _ = _ev(spark)
    cub = ", ".join(str(i ** 3 - 2 * i * i + 5) for i in range(8))
    r = _tup(ev, {
        "lin": "predict(polyfit(array(1, 2, 3), array(3, 5, 7), 1), "
               "10)",
        "cub": f"predict(polyfit(array({cub})), 9.5)",
        "fit": f"polyfit(array({cub}))"})
    assert r["lin"] == pytest.approx(21.0, abs=1e-9)
    f = lambda t: t ** 3 - 2 * t * t + 5
    assert r["cub"] == pytest.approx(f(9.5), rel=1e-9)
    assert max(abs(fv - f(i)) for i, fv in enumerate(r["fit"])) < 1e-6


def test_polyfit_least_squares_matches_numpy(spark):
    import numpy as np
    ev, docs = _ev(spark)
    y = _series(docs, 15)
    r = _tup(ev, {"p": "predict(polyfit(copyOfRange(x, 0, 15), 2), "
                       "20.5)"})
    X = np.vander(np.arange(15), 3, increasing=True)
    coef, *_ = np.linalg.lstsq(X, np.array(y), rcond=None)
    assert r["p"] == pytest.approx(
        coef[0] + coef[1] * 20.5 + coef[2] * 20.5 ** 2, rel=1e-9)


def test_polyfit_degree_out_of_range_raises(spark):
    ev, _ = _ev(spark)
    with pytest.raises(Exception, match="degree"):
        _tup(ev, {"p": "predict(polyfit(array(1, 2, 3), "
                       "array(1, 2, 3), 5), 1)"})


# ---------------------------------------------------------------------------
# derivative / integrate
# ---------------------------------------------------------------------------

def test_derivative_of_lerp_is_segment_slope(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "d": "predict(derivative(lerp(array(0, 10, 20), "
             "array(100, 200, 400))), 12)",
        "dk": "predict(derivative(lerp(array(0, 10, 20), "
              "array(100, 200, 400))), 3)"})
    assert r["d"] == pytest.approx(20.0, abs=1e-12)
    assert r["dk"] == pytest.approx(10.0, abs=1e-12)


def test_derivative_of_spline_matches_twin(spark):
    ev, docs = _ev(spark)
    y = _series(docs, 20)
    b, c, d = _nat_spline(y)
    r = _tup(ev, {"d": "predict(derivative(s), 7.25)",
                  "dfit": "derivative(s)"},
             lets="s=spline(copyOfRange(x, 0, 20)), ")
    dx = 0.25
    assert r["d"] == pytest.approx(
        (3 * d[7] * dx + 2 * c[7]) * dx + b[7], rel=1e-10)
    # derivative fitted values at the knots: b_i, last knot in the
    # last segment
    for i in range(19):
        assert r["dfit"][i] == pytest.approx(b[i], rel=1e-9, abs=1e-9)
    assert r["dfit"][19] == pytest.approx(
        3 * d[18] + 2 * c[18] + b[18], rel=1e-9)


def test_derivative_of_polyfit_exact(spark):
    ev, _ = _ev(spark)
    quad = ", ".join(str(3 * i * i + 2 * i + 1) for i in range(6))
    r = _tup(ev, {"d": f"predict(derivative(polyfit(array({quad}), "
                       f"2)), 4)"})
    assert r["d"] == pytest.approx(3 * 2 * 4 + 2, rel=1e-9)


def test_integrate_spline_exact_antiderivative(spark):
    ev, docs = _ev(spark)
    y = _series(docs, 20)
    b, c, d = _nat_spline(y)

    def spl_I(t):
        i = min(max(int(math.floor(t)), 0), 18)
        tot = sum(y[j] + b[j] / 2 + c[j] / 3 + d[j] / 4
                  for j in range(i))
        dx = t - i
        return tot + y[i] * dx + b[i] * dx ** 2 / 2 \
            + c[i] * dx ** 3 / 3 + d[i] * dx ** 4 / 4

    r = _tup(ev, {"i": "integrate(s, 2, 17)",
                  "cum": "integrate(s)",
                  "iv": "valueAt(integrate(s), 10)"},
             lets="s=spline(copyOfRange(x, 0, 20)), ")
    assert r["i"] == pytest.approx(spl_I(17) - spl_I(2), rel=1e-10)
    assert r["iv"] == pytest.approx(spl_I(10), rel=1e-10)
    assert r["cum"][0] == 0.0
    assert r["cum"][5] == pytest.approx(spl_I(5), rel=1e-10)
    # cumulative is monotone for positive y
    assert all(r["cum"][i] <= r["cum"][i + 1] for i in range(19))


def test_integrate_line_exact(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {"i": "integrate(polyfit(array(1, 2, 3), "
                       "array(3, 5, 7), 1), 0, 2)"})
    # integral of 2t + 1 over [0, 2] = 6
    assert r["i"] == pytest.approx(6.0, abs=1e-9)


# ---------------------------------------------------------------------------
# let-bound model cells
# ---------------------------------------------------------------------------

def test_let_model_cell_equals_inline(spark):
    ev, docs = _ev(spark)
    r = _tup(ev, {
        "a": "predict(s, 7.25)",
        "b": "predict(spline(copyOfRange(x, 0, 20)), 7.25)"},
        lets="s=spline(copyOfRange(x, 0, 20)), ")
    assert r["a"] == r["b"]


def test_let_plain_evaluator_cell(spark):
    # a non-stream, non-model evaluator bound via let acts as a
    # value cell (the reference's let binds any evaluator result)
    ev, _ = _ev(spark)
    r = _tup(ev, {"s": "l1norm(w)"},
             lets="w=natural(5), ")
    assert r["s"] == 10.0
