"""Lucene expressions module: JS-syntax expression -> portable SQL.

The reference compiles a small JavaScript-like language to bytecode and
binds variables to per-document DoubleValuesSources
(lucene/expressions/src/java/org/apache/lucene/expressions/js/
JavascriptCompiler.java:73, grammar in Javascript.g; bindings via
expressions/SimpleBindings.java).  Users sort and score by expressions
like ``"_score + ln(1 + popularity)"``.

Here the same grammar compiles to ONE portable SQL scalar expression
evaluated by whole-stage codegen (and, bit-for-bit, by the DuckDB
oracle): a recursive-descent Pratt parser produces an AST, and
``JsExpression.sql(bindings)`` renders it with each variable replaced
by a caller-supplied SQL fragment (the SimpleBindings analogue —
``_score`` to the score column, field names to docvalue columns).

Semantics follow the reference:

- everything is a double; comparison / logical operators yield
  1.0 or 0.0 (JavascriptCompiler pushes doubles for boolean results);
- the ternary condition and the logical operands are "true" iff != 0;
- the function library is the DEFAULT_FUNCTIONS table (abs, ceil,
  exp, floor, ln, log10, log2, logn, max, min, pow, sqrt, trig,
  hyperbolic trig, atan2, haversin); hyperbolic and logn forms expand
  to exp/ln compositions so the SAME text runs on Spark SQL and DuckDB.

Only deterministic scalar math — the compiled text contains no dialect
branches, so engine and oracle share one formula string exactly like
search/payloads.py and the BM25 score text.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["JsExpression", "JsParseError", "compile_expression"]


class JsParseError(ValueError):
    """Raised for syntax errors / unknown functions / bad arity —
    the analogue of JavascriptCompiler's ParseException."""


_TOKEN_RE = re.compile(r"""
    (?P<num>\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><=|>=|==|!=|&&|\|\||[-+*/%<>!?:(),])
  | (?P<ws>\s+)
""", re.VERBOSE)

# name -> arity (JavascriptCompiler.DEFAULT_FUNCTIONS)
FUNCTIONS: dict[str, int] = {
    "abs": 1, "acos": 1, "asin": 1, "atan": 1, "atan2": 2,
    "ceil": 1, "cos": 1, "cosh": 1, "exp": 1, "floor": 1,
    "haversin": 4, "ln": 1, "log10": 1, "log2": 1, "logn": 2,
    "max": 2, "min": 2, "pow": 2, "sin": 1, "sinh": 1,
    "sqrt": 1, "tan": 1, "tanh": 1,
}


# -- AST ----------------------------------------------------------------------

@dataclass(frozen=True)
class _Num:
    value: float


@dataclass(frozen=True)
class _Var:
    name: str


@dataclass(frozen=True)
class _Call:
    func: str
    args: tuple


@dataclass(frozen=True)
class _Unary:
    op: str
    operand: object


@dataclass(frozen=True)
class _Binary:
    op: str
    left: object
    right: object


@dataclass(frozen=True)
class _Ternary:
    cond: object
    then: object
    other: object


# -- parser (precedence climbing) ---------------------------------------------

_BIN_PREC = {
    "||": 1, "&&": 2,
    "==": 3, "!=": 3,
    "<": 4, "<=": 4, ">": 4, ">=": 4,
    "+": 5, "-": 5,
    "*": 6, "/": 6, "%": 6,
}
_TERNARY_PREC = 0


class _Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(src):
            m = _TOKEN_RE.match(src, pos)
            if not m:
                raise JsParseError(
                    f"unexpected character {src[pos]!r} at {pos}")
            pos = m.end()
            kind = m.lastgroup
            if kind != "ws":
                self.toks.append((kind, m.group()))
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        if t[0] is None:
            raise JsParseError("unexpected end of expression")
        self.i += 1
        return t

    def expect(self, text: str):
        kind, tok = self.next()
        if tok != text:
            raise JsParseError(f"expected {text!r}, got {tok!r}")

    def parse(self):
        node = self.expr(_TERNARY_PREC)
        if self.peek()[0] is not None:
            raise JsParseError(f"trailing input at token {self.peek()[1]!r}")
        return node

    def expr(self, min_prec: int):
        node = self.unary()
        while True:
            kind, tok = self.peek()
            if kind == "op" and tok == "?" and min_prec <= _TERNARY_PREC:
                # right-associative ternary, lowest precedence
                self.next()
                then = self.expr(_TERNARY_PREC)
                self.expect(":")
                other = self.expr(_TERNARY_PREC)
                node = _Ternary(node, then, other)
                continue
            if kind != "op" or tok not in _BIN_PREC:
                return node
            prec = _BIN_PREC[tok]
            if prec < min_prec:
                return node
            self.next()
            rhs = self.expr(prec + 1)  # all binaries left-associative
            node = _Binary(tok, node, rhs)

    def unary(self):
        kind, tok = self.peek()
        if kind == "op" and tok in ("-", "+", "!"):
            self.next()
            operand = self.unary()
            if tok == "+":
                return operand
            return _Unary(tok, operand)
        return self.primary()

    def primary(self):
        kind, tok = self.next()
        if kind == "num":
            return _Num(float(tok))
        if kind == "name":
            nk, nt = self.peek()
            if nk == "op" and nt == "(":
                if tok not in FUNCTIONS:
                    raise JsParseError(f"unknown function {tok!r}")
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.expr(_TERNARY_PREC))
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.expr(_TERNARY_PREC))
                self.expect(")")
                if len(args) != FUNCTIONS[tok]:
                    raise JsParseError(
                        f"{tok}() takes {FUNCTIONS[tok]} args, "
                        f"got {len(args)}")
                return _Call(tok, tuple(args))
            return _Var(tok)
        if kind == "op" and tok == "(":
            node = self.expr(_TERNARY_PREC)
            self.expect(")")
            return node
        raise JsParseError(f"unexpected token {tok!r}")


# -- SQL rendering --------------------------------------------------------------

def _bool01(cond_sql: str) -> str:
    return f"(CASE WHEN {cond_sql} THEN 1.0e0 ELSE 0.0e0 END)"


def _truthy(sql: str) -> str:
    return f"({sql}) <> 0.0e0"


def _num_sql(v: float) -> str:
    """Exact double literal, DOUBLE-typed in BOTH dialects: DuckDB
    parses plain ``1.0`` as DECIMAL (decimal arithmetic would diverge
    from Spark's double math), but scientific notation is DOUBLE
    everywhere.  17 significant digits round-trip any float64."""
    return f"{v:.17e}"


def _render(node, b: dict[str, str]) -> str:
    if isinstance(node, _Num):
        return _num_sql(node.value)
    if isinstance(node, _Var):
        if node.name not in b:
            raise JsParseError(f"unbound variable {node.name!r}")
        return f"({b[node.name]})"
    if isinstance(node, _Unary):
        inner = _render(node.operand, b)
        if node.op == "-":
            return f"(- {inner})"
        return _bool01(f"NOT ({_truthy(inner)})")
    if isinstance(node, _Binary):
        l, r = _render(node.left, b), _render(node.right, b)
        op = node.op
        if op in ("+", "-", "*", "/"):
            return f"({l} {op} {r})"
        if op == "%":
            # JS fmod (keeps the dividend's sign) == SQL % on doubles
            # in both dialects
            return f"({l} % {r})"
        if op in ("<", "<=", ">", ">="):
            return _bool01(f"{l} {op} {r}")
        if op == "==":
            return _bool01(f"{l} = {r}")
        if op == "!=":
            return _bool01(f"{l} <> {r}")
        if op == "&&":
            return _bool01(f"({_truthy(l)}) AND ({_truthy(r)})")
        if op == "||":
            return _bool01(f"({_truthy(l)}) OR ({_truthy(r)})")
        raise JsParseError(f"unknown operator {op!r}")
    if isinstance(node, _Ternary):
        c = _truthy(_render(node.cond, b))
        return (f"(CASE WHEN {c} THEN {_render(node.then, b)} "
                f"ELSE {_render(node.other, b)} END)")
    if isinstance(node, _Call):
        a = [_render(x, b) for x in node.args]
        f = node.func
        if f in ("abs", "acos", "asin", "atan", "ceil", "cos", "exp",
                 "floor", "ln", "log10", "log2", "sin", "sqrt", "tan"):
            return f"{f}({a[0]})"
        if f == "atan2":
            return f"atan2({a[0]}, {a[1]})"
        if f == "pow":
            return f"pow({a[0]}, {a[1]})"
        if f == "max":
            return f"greatest({a[0]}, {a[1]})"
        if f == "min":
            return f"least({a[0]}, {a[1]})"
        if f == "logn":
            # logn(base, x) = ln(x) / ln(base)
            return f"(ln({a[1]}) / ln({a[0]}))"
        if f == "cosh":
            return f"((exp({a[0]}) + exp(- {a[0]})) / 2.0e0)"
        if f == "sinh":
            return f"((exp({a[0]}) - exp(- {a[0]})) / 2.0e0)"
        if f == "tanh":
            x = a[0]
            return (f"((exp(2.0e0 * {x}) - 1.0e0) / "
                    f"(exp(2.0e0 * {x}) + 1.0e0))")
        if f == "haversin":
            # SloppyMath.haversinMeters shape (exact trig, meters)
            lat1, lon1, lat2, lon2 = a
            return (
                "(6371008.7714 * 2.0e0 * asin(sqrt("
                f"pow(sin(radians({lat2} - {lat1}) / 2.0e0), 2.0e0) + "
                f"cos(radians({lat1})) * cos(radians({lat2})) * "
                f"pow(sin(radians({lon2} - {lon1}) / 2.0e0), 2.0e0))))")
        raise JsParseError(f"unknown function {f!r}")
    raise JsParseError(f"unknown node {node!r}")


def _variables(node, out: set):
    if isinstance(node, _Var):
        out.add(node.name)
    elif isinstance(node, _Unary):
        _variables(node.operand, out)
    elif isinstance(node, _Binary):
        _variables(node.left, out)
        _variables(node.right, out)
    elif isinstance(node, _Ternary):
        for n in (node.cond, node.then, node.other):
            _variables(n, out)
    elif isinstance(node, _Call):
        for n in node.args:
            _variables(n, out)


@dataclass(frozen=True)
class JsExpression:
    """A compiled expression (Expression.java analogue): ``source`` is
    the original text, ``variables`` the free variables to bind, and
    ``sql(bindings)`` renders portable SQL with each variable replaced
    by its binding fragment (SimpleBindings.java)."""

    source: str
    _ast: object = field(repr=False)

    @property
    def variables(self) -> frozenset:
        out: set = set()
        _variables(self._ast, out)
        return frozenset(out)

    def sql(self, bindings: dict[str, str]) -> str:
        return _render(self._ast, bindings)


def compile_expression(source: str) -> JsExpression:
    """JavascriptCompiler.compile analogue: parse ``source`` once;
    raises JsParseError on syntax errors, unknown functions, or wrong
    arity (binding errors surface at .sql() time, when the bindings
    are known)."""
    return JsExpression(source, _Parser(source).parse())
