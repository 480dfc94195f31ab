"""Round-3ap ops: bicubicSpline (BicubicSplineEvaluator.java:40 —
BivariateFunction via successive natural cubic splines) and the
bivariate predict(f, x, y) branch."""

import math

import pytest

SF = "/root/testdata/sf0.001"

XS = [0.0, 1.0, 2.0, 4.0, 6.0]
YS = [0.0, 2.0, 3.0, 5.0, 8.0]


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs})


def _one(spark, expr):
    return _ev(spark).eval(expr).collect()[0]


def _mat(grid):
    return ("matrix(" + ", ".join(
        "array(" + ", ".join(repr(v) for v in row) + ")"
        for row in grid) + ")")


def _arr(vals):
    return "array(" + ", ".join(repr(float(v)) for v in vals) + ")"


def _bic_expr(grid, probes):
    body = ", ".join(f"p{i}=predict(b, {x!r}, {y!r})"
                     for i, (x, y) in enumerate(probes))
    return (f"let(b=bicubicSpline({_arr(XS)}, {_arr(YS)}, "
            f"{_mat(grid)}), tuple({body}))")


def _nat_spline_val(xs, ys, z):
    """Independent natural-cubic-spline twin (textbook tridiagonal
    solve, no shared code with the engine's fold)."""
    n = len(xs)
    h = [xs[i + 1] - xs[i] for i in range(n - 1)]
    al = [0.0] * n
    for i in range(1, n - 1):
        al[i] = (3.0 * (ys[i + 1] - ys[i]) / h[i]
                 - 3.0 * (ys[i] - ys[i - 1]) / h[i - 1])
    l, mu, zz = [1.0] + [0.0] * (n - 1), [0.0] * n, [0.0] * n
    for i in range(1, n - 1):
        l[i] = 2.0 * (xs[i + 1] - xs[i - 1]) - h[i - 1] * mu[i - 1]
        mu[i] = h[i] / l[i]
        zz[i] = (al[i] - h[i - 1] * zz[i - 1]) / l[i]
    c, b, d = [0.0] * n, [0.0] * (n - 1), [0.0] * (n - 1)
    for j in range(n - 2, -1, -1):
        c[j] = zz[j] - mu[j] * c[j + 1]
        b[j] = ((ys[j + 1] - ys[j]) / h[j]
                - h[j] * (c[j + 1] + 2.0 * c[j]) / 3.0)
        d[j] = (c[j + 1] - c[j]) / (3.0 * h[j])
    i = max(0, min(n - 2, sum(1 for x in xs if x <= z) - 1))
    dx = z - xs[i]
    return ys[i] + b[i] * dx + c[i] * dx * dx + d[i] * dx ** 3


def _twin(grid, x, y):
    col = [_nat_spline_val(YS, row, y) for row in grid]
    return _nat_spline_val(XS, col, x)


def test_bilinear_grid_is_exact(spark):
    def f(x, y):
        return 1.0 + 2.0 * x + 0.5 * y + 0.25 * x * y

    grid = [[f(x, y) for y in YS] for x in XS]
    row = _one(spark, _bic_expr(grid, [(2.5, 3.5), (0.7, 6.2),
                                       (5.1, 0.4)]))
    assert row["p0"] == pytest.approx(f(2.5, 3.5), abs=1e-9)
    assert row["p1"] == pytest.approx(f(0.7, 6.2), abs=1e-9)
    assert row["p2"] == pytest.approx(f(5.1, 0.4), abs=1e-9)


def test_knot_exactness_on_curved_grid(spark):
    grid = [[math.sin(x) * (1.0 + 0.1 * y * y) for y in YS]
            for x in XS]
    row = _one(spark, _bic_expr(grid, [(4.0, 5.0), (1.0, 2.0)]))
    assert row["p0"] == pytest.approx(grid[3][3], abs=1e-9)
    assert row["p1"] == pytest.approx(grid[1][1], abs=1e-9)


def test_offknot_curved_matches_python_twin(spark):
    grid = [[math.sin(x) * (1.0 + 0.1 * y * y) for y in YS]
            for x in XS]
    row = _one(spark, _bic_expr(grid, [(3.1, 4.2), (0.4, 7.3)]))
    assert row["p0"] == pytest.approx(_twin(grid, 3.1, 4.2),
                                      abs=1e-9)
    assert row["p1"] == pytest.approx(_twin(grid, 0.4, 7.3),
                                      abs=1e-9)


def test_inline_construction_without_let(spark):
    def f(x, y):
        return 2.0 - x + 0.3 * y

    grid = [[f(x, y) for y in YS] for x in XS]
    row = _one(spark, f"tuple(p=predict(bicubicSpline({_arr(XS)}, "
               f"{_arr(YS)}, {_mat(grid)}), 1.5, 2.5))")
    assert row["p"] == pytest.approx(f(1.5, 2.5), abs=1e-9)


def test_wrong_arity_raises(spark):
    grid = [[0.0] * len(YS) for _ in XS]
    with pytest.raises(Exception, match="three parameters"):
        _one(spark, f"tuple(p=predict(bicubicSpline({_arr(XS)}, "
             f"{_mat(grid)}), 1.0, 1.0))")
    with pytest.raises(Exception, match="takes \\(x, y\\)"):
        _one(spark, f"let(b=bicubicSpline({_arr(XS)}, {_arr(YS)}, "
             f"{_mat(grid)}), tuple(p=predict(b, 1.0)))")


def test_bifunc_is_not_a_value(spark):
    grid = [[0.0] * len(YS) for _ in XS]
    with pytest.raises(Exception, match="not a value"):
        _one(spark, f"tuple(b=bicubicSpline({_arr(XS)}, {_arr(YS)},"
             f" {_mat(grid)}))")
