"""Solr function-query syntax -> twin compilers (Catalyst + SQL).

The reference dispatches function strings like ``sum(n_chars,
product(2, doc_id))`` through FunctionQParser
(solr/core/src/java/org/apache/solr/search/FunctionQParser.java:48)
into the ValueSourceParser registry
(solr/core/src/java/org/apache/solr/search/ValueSourceParser.java:85
— one ``addParser`` per function name). Here the same grammar parses
into a tiny AST with TWO compilers that share association order
operation-for-operation: ``compile_col`` emits a Catalyst Column over
docvalue columns (whole-stage codegen — a function query at 100 TB is
a projected scan, no UDF) and ``compile_sql`` emits the identical
DuckDB arithmetic for the oracle, so engine == oracle is bit-exact
before the round-6 staging.

Supported ValueSources (each mirrors its reference parser):

- numeric literals, bare field names, ``field(name)``
  (FieldValueSourceParser)
- ``sum``/``add``, ``sub``, ``product``/``mul``, ``div`` —
  SumFloatFunction et al. (left-fold for the n-ary forms)
- ``min``/``max`` (n-ary), ``abs``
- ``log`` (base 10, Log10 — ValueSourceParser "log"), ``ln``,
  ``sqrt``, ``exp``, ``pow``, ``floor``, ``ceil``
- ``map(v, min, max, target [, default])`` — RangeMapFloatFunction:
  value in [min, max] -> target, else the value itself (or default)
- ``if(cond, a, b)`` with ``gt/gte/lt/lte/eq`` comparison sources
  (SolrComparisonBoolFunction; numeric cond: nonzero = true)
- ``exists(v)`` (ValueSourceParser.java:778 — for a field ref, true
  iff the doc has a value; any computed source always exists) and
  ``def(v, d)`` (DefFunction, ValueSourceParser.java:935 — the field
  value when present, else the default)
- index-statistic sources (ValueSourceParser.java:646-717), resolved
  through an explicit ``ctx`` mapping the caller prepares from the
  index's stats tables (the analogue of createWeight binding the
  IndexSearcher into the context map): ``docfreq(f,t)``,
  ``totaltermfreq(f,t)``/``ttf``, ``sumtotaltermfreq(f)``/``sttf``,
  ``termfreq(f,t)``, ``tf(f,t)`` (ClassicSimilarity sqrt(freq),
  TFValueSource.java:40), ``idf(f,t)`` (ln((maxDoc+1)/(df+1))+1,
  IDFValueSource.java:55), ``norm(f)`` (the decoded SmallFloat length
  norm 1/sqrt(qdl), NormValueSource.java:42 with TFIDFSimilarity's
  normTable[0]=0), ``maxdoc()``, ``numdocs()``.  ``ctx`` maps the
  triples produced by :func:`collect_index_sources` to a Column
  (compile_col) or SQL string (compile_sql); without a ctx these
  names raise, as do ``scale``/``ord``/relevance sources (dataset
  context; documented divergence).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import functions as F


class FuncParseError(ValueError):
    pass


@dataclass(frozen=True)
class FuncNode:
    name: str            # "lit", "fld", or function name
    args: tuple = ()
    value: float = 0.0   # for lit
    field: str = ""      # for fld


_NUM_RE = re.compile(r"^-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _split_args(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts]


def parse_func(s: str) -> FuncNode:
    """FunctionQParser.parseValueSource's grammar: literal, bare
    field, or name(args...)."""
    s = s.strip()
    if not s:
        raise FuncParseError("empty function")
    if _NUM_RE.match(s):
        return FuncNode("lit", value=float(s))
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        # quoted term literal (FunctionQParser.parseArg quoted form)
        return FuncNode("str", field=s[1:-1])
    m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)\((.*)\)$", s, re.S)
    if m:
        name, body = m.group(1), m.group(2)
        if name == "field":
            fname = body.strip().strip("'\"")
            if not _NAME_RE.match(fname):
                raise FuncParseError(f"bad field name {fname!r}")
            return FuncNode("fld", field=fname)
        args = tuple(parse_func(a) for a in _split_args(body)) \
            if body.strip() else ()
        return FuncNode(name, args=args)
    if _NAME_RE.match(s):
        return FuncNode("fld", field=s)
    raise FuncParseError(f"cannot parse function {s!r}")


_NARY = {"sum", "add", "product", "mul", "min", "max"}
_CMP = {"gt", "gte", "lt", "lte", "eq"}

# index-statistic sources (ValueSourceParser.java:646-717) and their
# canonical names (alias("totaltermfreq","ttf") etc.)
_TERM_SOURCES = {"docfreq", "totaltermfreq", "ttf", "termfreq",
                 "tf", "idf"}
_FIELD_SOURCES = {"norm", "sumtotaltermfreq", "sttf"}
_CONST_SOURCES = {"maxdoc", "numdocs"}
_CANON = {"ttf": "totaltermfreq", "sttf": "sumtotaltermfreq"}


def _canon(name: str) -> str:
    return _CANON.get(name, name)


def _str_arg(node: FuncNode, what: str) -> str:
    """A field/term argument: bare word (fld) or quoted literal."""
    if node.name in ("fld", "str"):
        return node.field
    if node.name == "lit":
        v = node.value
        return str(int(v)) if v == int(v) else repr(v)
    raise FuncParseError(f"expected a {what} name, got {node.name!r}")


def collect_index_sources(node: FuncNode) -> set:
    """All (canonical_name, field, term) triples the AST needs from
    the index — the caller resolves each into a Column / SQL
    expression and passes the mapping as ``ctx`` to the compilers
    (createWeight's context-map binding, NormValueSource.java:58)."""
    out: set = set()
    if node.name in _TERM_SOURCES and len(node.args) == 2:
        out.add((_canon(node.name), _str_arg(node.args[0], "field"),
                 _str_arg(node.args[1], "term")))
        return out
    if node.name in _FIELD_SOURCES and len(node.args) == 1:
        out.add((_canon(node.name), _str_arg(node.args[0], "field"),
                 ""))
        return out
    if node.name in _CONST_SOURCES:
        out.add((node.name, "", ""))
        return out
    for a in node.args:
        out |= collect_index_sources(a)
    return out


def _index_lookup(node: FuncNode, ctx):
    """Resolve an index-statistic node against ctx; None if the node
    is not an index source."""
    name = node.name
    if name in _TERM_SOURCES:
        _arity(name, len(node.args))
        key = (_canon(name), _str_arg(node.args[0], "field"),
               _str_arg(node.args[1], "term"))
    elif name in _FIELD_SOURCES:
        _arity(name, len(node.args))
        key = (_canon(name), _str_arg(node.args[0], "field"), "")
    elif name in _CONST_SOURCES:
        _arity(name, len(node.args))
        key = (name, "", "")
    else:
        return None
    if ctx is None:
        raise FuncParseError(
            f"{name}(): needs index context — pass ctx (see "
            "collect_index_sources)")
    if key not in ctx:
        raise FuncParseError(f"index ctx missing {key!r}")
    return ctx[key]


def _arity(name: str, n: int):
    want = {"sub": 2, "div": 2, "pow": 2, "abs": 1, "log": 1,
            "ln": 1, "sqrt": 1, "exp": 1, "floor": 1, "ceil": 1,
            "if": 3, "exists": 1, "def": 2,
            "docfreq": 2, "totaltermfreq": 2, "ttf": 2,
            "termfreq": 2, "tf": 2, "idf": 2,
            "norm": 1, "sumtotaltermfreq": 1, "sttf": 1,
            "maxdoc": 0, "numdocs": 0}.get(name)
    if want is not None and n != want:
        raise FuncParseError(f"{name}() takes {want} args, got {n}")
    if name in _NARY and n < 1:
        raise FuncParseError(f"{name}() needs at least one arg")
    if name in _CMP and n != 2:
        raise FuncParseError(f"{name}() takes 2 args, got {n}")
    if name == "map" and n not in (4, 5):
        raise FuncParseError(f"map() takes 4 or 5 args, got {n}")


def compile_col(node: FuncNode, cols: dict, ctx: dict = None) -> "F.Column":
    """AST -> Catalyst Column; ``cols`` maps field name -> Column;
    ``ctx`` maps collect_index_sources triples -> Column."""
    if node.name == "lit":
        return F.lit(node.value)
    if node.name == "fld":
        if node.field not in cols:
            raise FuncParseError(f"unknown field {node.field!r} "
                                 f"(have {sorted(cols)})")
        return cols[node.field].cast("double")
    name = node.name
    hit = _index_lookup(node, ctx)
    if hit is not None:
        return hit
    _arity(name, len(node.args))
    if name == "exists":
        arg = node.args[0]
        if arg.name == "fld":
            if arg.field not in cols:
                raise FuncParseError(f"unknown field {arg.field!r}")
            return cols[arg.field].isNotNull().cast("double")
        return F.lit(1.0)
    if name == "def":
        arg = node.args[0]
        dflt = compile_col(node.args[1], cols, ctx)
        if arg.name == "fld":
            if arg.field not in cols:
                raise FuncParseError(f"unknown field {arg.field!r}")
            return F.coalesce(cols[arg.field].cast("double"), dflt)
        return compile_col(arg, cols, ctx)
    a = [compile_col(x, cols, ctx) for x in node.args]
    if name in ("sum", "add"):
        out = a[0]
        for c in a[1:]:
            out = out + c
        return out
    if name in ("product", "mul"):
        out = a[0]
        for c in a[1:]:
            out = out * c
        return out
    if name == "sub":
        return a[0] - a[1]
    if name == "div":
        return a[0] / a[1]
    if name == "min":
        return F.least(*a) if len(a) > 1 else a[0]
    if name == "max":
        return F.greatest(*a) if len(a) > 1 else a[0]
    if name == "abs":
        return F.abs(a[0])
    if name == "log":
        return F.log10(a[0])
    if name == "ln":
        return F.log(a[0])
    if name == "sqrt":
        return F.sqrt(a[0])
    if name == "exp":
        return F.exp(a[0])
    if name == "pow":
        return F.pow(a[0], a[1])
    if name == "floor":
        return F.floor(a[0]).cast("double")
    if name == "ceil":
        return F.ceil(a[0]).cast("double")
    if name == "map":
        inside = (a[0] >= a[1]) & (a[0] <= a[2])
        els = a[4] if len(a) > 4 else a[0]
        return F.when(inside, a[3]).otherwise(els)
    if name in _CMP:
        op = {"gt": "__gt__", "gte": "__ge__", "lt": "__lt__",
              "lte": "__le__", "eq": "__eq__"}[name]
        return getattr(a[0], op)(a[1]).cast("double")
    if name == "if":
        cond = a[0] != F.lit(0.0)
        return F.when(cond, a[1]).otherwise(a[2])
    if name in ("scale", "ord", "rord", "query"):
        raise FuncParseError(
            f"{name}(): needs dataset/index context the row-local "
            "compiler cannot see (documented divergence)")
    raise FuncParseError(f"unknown function {name!r}")


def compile_sql(node: FuncNode, cols: dict, ctx: dict = None) -> str:
    """AST -> DuckDB SQL with the SAME association order as
    compile_col; ``cols`` maps field name -> SQL expression; ``ctx``
    maps collect_index_sources triples -> SQL expression."""
    if node.name == "lit":
        return f"CAST({node.value!r} AS DOUBLE)"
    if node.name == "fld":
        if node.field not in cols:
            raise FuncParseError(f"unknown field {node.field!r}")
        return f"CAST({cols[node.field]} AS DOUBLE)"
    name = node.name
    hit = _index_lookup(node, ctx)
    if hit is not None:
        return hit
    _arity(name, len(node.args))
    if name == "exists":
        arg = node.args[0]
        if arg.name == "fld":
            if arg.field not in cols:
                raise FuncParseError(f"unknown field {arg.field!r}")
            return (f"(CASE WHEN {cols[arg.field]} IS NOT NULL THEN "
                    "CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)")
        return "CAST(1.0 AS DOUBLE)"
    if name == "def":
        arg = node.args[0]
        dflt = compile_sql(node.args[1], cols, ctx)
        if arg.name == "fld":
            if arg.field not in cols:
                raise FuncParseError(f"unknown field {arg.field!r}")
            return (f"COALESCE(CAST({cols[arg.field]} AS DOUBLE), "
                    f"{dflt})")
        return compile_sql(arg, cols, ctx)
    a = [compile_sql(x, cols, ctx) for x in node.args]
    if name in ("sum", "add"):
        out = a[0]
        for c in a[1:]:
            out = f"({out} + {c})"
        return out
    if name in ("product", "mul"):
        out = a[0]
        for c in a[1:]:
            out = f"({out} * {c})"
        return out
    if name == "sub":
        return f"({a[0]} - {a[1]})"
    if name == "div":
        return f"({a[0]} / {a[1]})"
    if name == "min":
        return f"LEAST({', '.join(a)})" if len(a) > 1 else a[0]
    if name == "max":
        return f"GREATEST({', '.join(a)})" if len(a) > 1 else a[0]
    if name == "abs":
        return f"ABS({a[0]})"
    if name == "log":
        return f"LOG10({a[0]})"
    if name == "ln":
        return f"LN({a[0]})"
    if name == "sqrt":
        return f"SQRT({a[0]})"
    if name == "exp":
        return f"EXP({a[0]})"
    if name == "pow":
        return f"POWER({a[0]}, {a[1]})"
    if name == "floor":
        return f"CAST(FLOOR({a[0]}) AS DOUBLE)"
    if name == "ceil":
        return f"CAST(CEIL({a[0]}) AS DOUBLE)"
    if name == "map":
        els = a[4] if len(a) > 4 else a[0]
        return (f"(CASE WHEN {a[0]} >= {a[1]} AND {a[0]} <= {a[2]} "
                f"THEN {a[3]} ELSE {els} END)")
    if name in _CMP:
        op = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}.get(
            name, "=")
        return (f"(CASE WHEN {a[0]} {op} {a[1]} THEN "
                "CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)")
    if name == "if":
        return (f"(CASE WHEN {a[0]} <> 0.0 THEN {a[1]} "
                f"ELSE {a[2]} END)")
    raise FuncParseError(f"unknown function {name!r}")
