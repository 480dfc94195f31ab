"""Lucene expressions module (search/expressions.py): parser laws,
reference double-only semantics, and the portable-SQL contract — the
SAME compiled text must evaluate identically in Spark whole-stage
codegen and DuckDB (the oracle side).  Mirrors JavascriptCompiler.java
semantics: comparisons/logicals yield 1.0/0.0, ternary tests != 0."""

import math

import duckdb
import pytest

from lucene_solr_spark.search.expressions import (
    FUNCTIONS, JsParseError, compile_expression,
)


def _duck(src, **vars):
    sql = compile_expression(src).sql(
        {k: f"{float(v):.17e}" for k, v in vars.items()})
    return float(duckdb.sql(
        f"SELECT CAST(({sql}) AS DOUBLE)").fetchone()[0])


CASES = [
    ("1 + 2 * 3", {}, 7.0),
    ("(1 + 2) * 3", {}, 9.0),
    ("2 - 3 - 4", {}, -5.0),          # left associativity
    ("2 < 3", {}, 1.0),
    ("2 > 3", {}, 0.0),
    ("x > 1 ? 10 : 20", {"x": 2.0}, 10.0),
    ("x > 1 ? 10 : 20", {"x": 0.0}, 20.0),
    ("!(x)", {"x": 0.0}, 1.0),
    ("!(x)", {"x": 7.0}, 0.0),
    ("x && y", {"x": 2.0, "y": 0.0}, 0.0),
    ("x || y", {"x": 0.0, "y": 3.0}, 1.0),
    ("-x + 5", {"x": 2.0}, 3.0),
    ("ln(exp(1))", {}, 1.0),
    ("log2(8)", {}, 3.0),
    ("logn(3, 27)", {}, 3.0),
    ("max(2, 3) + min(2, 3)", {}, 5.0),
    ("pow(2, 10)", {}, 1024.0),
    ("cosh(0) + sinh(0) + tanh(0)", {}, 1.0),
    ("7 % 3", {}, 1.0),
    ("x == 2", {"x": 2.0}, 1.0),
    ("x != 2", {"x": 2.0}, 0.0),
    ("1 < 2 == 1", {}, 1.0),           # (1<2) == 1 by precedence
    ("x > 0 ? x < 5 ? 1 : 2 : 3", {"x": 3.0}, 1.0),
    ("abs(0 - 4) + floor(2.7) + ceil(2.1)", {}, 9.0),
    ("sqrt(x) * sqrt(x)", {"x": 9.0}, 9.0),
]


@pytest.mark.parametrize("src,vars,want", CASES)
def test_duckdb_semantics(src, vars, want):
    assert _duck(src, **vars) == pytest.approx(want, abs=1e-9)


def test_spark_duckdb_same_text_parity(spark):
    """One compiled text, two engines, identical float64 results over
    a value grid — the property every oracle row relies on."""
    grid = [-2.5, -1.0, 0.0, 0.5, 1.0, 3.7, 42.0]
    exprs = [
        "_score + 0.5 * ln(1 + x)",
        "x > 1 ? tanh(x) : cosh(x) - 1",
        "logn(2, 1 + abs(x)) + max(x, _score) % 7",
        "(x < 0 || _score > 2) && x != 0",
    ]
    for src in exprs:
        e = compile_expression(src)
        for x in grid:
            for s in (0.0, 1.5, 3.0):
                if "ln(1 + x)" in src and x <= -1:
                    continue
                b = {"x": f"{x:.17e}", "_score": f"{s:.17e}"}
                sql = e.sql(b)
                sp = spark.sql(
                    f"SELECT CAST(({sql}) AS DOUBLE) AS v").collect()[0].v
                du = float(duckdb.sql(
                    f"SELECT CAST(({sql}) AS DOUBLE)").fetchone()[0])
                assert sp == pytest.approx(du, abs=0, rel=1e-15), (src, x, s)


def test_hyperbolic_expansions_match_libm():
    for x in (-2.0, -0.5, 0.3, 1.7):
        assert _duck("tanh(x)", x=x) == pytest.approx(math.tanh(x),
                                                      abs=1e-12)
        assert _duck("cosh(x)", x=x) == pytest.approx(math.cosh(x),
                                                      abs=1e-12)
        assert _duck("sinh(x)", x=x) == pytest.approx(math.sinh(x),
                                                      abs=1e-12)


def test_parse_errors():
    for bad in ["1 +", "foo(1)", "max(1)", "max(1, 2, 3)", "1 2",
                "x ? 1", "@", "", "(1"]:
        with pytest.raises(JsParseError):
            compile_expression(bad)


def test_unbound_variable_raises_at_sql_time():
    e = compile_expression("x + y")
    assert e.variables == frozenset({"x", "y"})
    with pytest.raises(JsParseError):
        e.sql({"x": "1.0e0"})


def test_function_table_is_reference_shape():
    # JavascriptCompiler.DEFAULT_FUNCTIONS arities
    assert FUNCTIONS["atan2"] == 2 and FUNCTIONS["haversin"] == 4
    assert all(v in (1, 2, 4) for v in FUNCTIONS.values())


def test_haversin_meters():
    # equator quarter-circumference sanity: ~10,007.5 km
    d = _duck("haversin(0, 0, 0, 90)")
    assert d == pytest.approx(10007543, rel=1e-3)
