"""Randomized funcparser sweep: the SQL compiler vs an independent
python interpreter of the same AST.

The fixed oracle rows pin compile_col == compile_sql on specific
expressions; this sweep pins compile_sql == reference semantics over
hundreds of random ASTs from the total-function subset of the grammar
(no division/log domains — those carry engine-specific edge encodings
and are covered by the fixed rows and p_func's 17-case sweep)."""

import math
import random

import duckdb
import pytest

from lucene_solr_spark.search.funcparser import compile_sql, parse_func

FIELDS = {"fa": 3.5, "fb": -2.0, "fc": 7.0}
COLS = {k: repr(v) for k, v in FIELDS.items()}

_BIN = ["sum", "sub", "product", "min", "max"]
_CMP = ["gt", "gte", "lt", "lte", "eq"]


def _gen(rng, depth):
    if depth <= 0 or rng.random() < 0.3:
        if rng.random() < 0.5:
            return repr(round(rng.uniform(-5, 5), 3))
        return rng.choice(list(FIELDS))
    r = rng.random()
    if r < 0.30:
        name = rng.choice(_BIN)
        n = rng.randint(2, 3) if name in ("sum", "product",
                                          "min", "max") else 2
        args = ", ".join(_gen(rng, depth - 1) for _ in range(n))
        return f"{name}({args})"
    if r < 0.40:
        return f"abs({_gen(rng, depth - 1)})"
    if r < 0.48:
        f = rng.choice(["floor", "ceil"])
        return f"{f}({_gen(rng, depth - 1)})"
    if r < 0.58:
        c = rng.choice(_CMP)
        return (f"if({c}({_gen(rng, depth - 1)}, "
                f"{_gen(rng, depth - 1)}), "
                f"{_gen(rng, depth - 1)}, {_gen(rng, depth - 1)})")
    if r < 0.68:
        return (f"map({_gen(rng, depth - 1)}, -1, 1, "
                f"{_gen(rng, depth - 1)})")
    if r < 0.76:
        b = rng.choice(["and", "or", "xor"])
        return (f"{b}({_gen(rng, depth - 1)}, "
                f"{_gen(rng, depth - 1)})")
    if r < 0.82:
        return f"not({_gen(rng, depth - 1)})"
    if r < 0.90:
        return (f"linear({_gen(rng, depth - 1)}, "
                f"{round(rng.uniform(-2, 2), 2)}, "
                f"{round(rng.uniform(-2, 2), 2)})")
    return rng.choice(["pi()", "e()", "true()", "false()"])


def _ev(node):
    """Independent interpreter (reference float semantics)."""
    name = node.name
    if name == "lit":
        return node.value
    if name == "fld":
        return float(FIELDS[node.field])
    a = [_ev(x) for x in node.args]
    if name in ("sum", "add"):
        out = a[0]
        for v in a[1:]:
            out += v
        return out
    if name in ("product", "mul"):
        out = a[0]
        for v in a[1:]:
            out *= v
        return out
    if name == "sub":
        return a[0] - a[1]
    if name == "min":
        return min(a)
    if name == "max":
        return max(a)
    if name == "abs":
        return abs(a[0])
    if name == "floor":
        return float(math.floor(a[0]))
    if name == "ceil":
        return float(math.ceil(a[0]))
    if name == "map":
        return a[3] if -1 <= a[0] <= 1 else a[0]
    if name in ("gt", "gte", "lt", "lte", "eq"):
        import operator as op
        f = {"gt": op.gt, "gte": op.ge, "lt": op.lt,
             "lte": op.le, "eq": op.eq}[name]
        return 1.0 if f(a[0], a[1]) else 0.0
    if name == "if":
        return a[1] if a[0] != 0.0 else a[2]
    if name == "not":
        return 0.0 if a[0] != 0.0 else 1.0
    if name == "and":
        return 1.0 if all(v != 0.0 for v in a) else 0.0
    if name == "or":
        return 1.0 if any(v != 0.0 for v in a) else 0.0
    if name == "xor":
        t = sum(1 for v in a if v != 0.0)
        return 1.0 if 0 < t < len(a) else 0.0
    if name == "linear":
        return a[0] * a[1] + a[2]
    if name == "pi":
        return math.pi
    if name == "e":
        return math.e
    if name == "true":
        return 1.0
    if name == "false":
        return 0.0
    raise AssertionError(name)


def test_random_asts_sql_matches_interpreter():
    rng = random.Random(20260821)
    con = duckdb.connect()
    checked = 0
    for _ in range(300):
        expr = _gen(rng, 4)
        ast = parse_func(expr)
        sql = compile_sql(ast, COLS)
        got = con.execute(f"SELECT {sql}").fetchone()[0]
        exp = _ev(ast)
        assert got == pytest.approx(exp, rel=1e-12, abs=1e-12), expr
        checked += 1
    assert checked == 300
