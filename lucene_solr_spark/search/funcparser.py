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
  names raise.
- the remaining row-local registrations: ``linear`` (val*m+c),
  ``recip`` (a/(m*x+b)), ``mod`` (Java %), ``pi``/``e``/``true``/
  ``false`` constants, ``not``/``and``/``or``/``xor``
  (MultiBoolFunction; xor = MIXED operands, some true AND some
  false), ``sqedist``/``dist`` (first-half/second-half source split,
  p-norms with p=1/2 exact and positive p generic), ``hsin``
  (HaversineFunction with the SOLR-2114 convert flag), ``strdist``
  with the 'edit' Levenshtein similarity (jw/ngram raise — iterative
  matchers without a portable twin), ``concat``/``literal`` (string
  sources), and ``ms`` (DateValueSourceParser — date fields via
  cols, date-math literals resolved at compile; NOW rides
  ctx[("now","","")]).
- ``query``/``boost`` resolve the quoted subquery's per-doc score
  through ctx[("query", body, "")] (QueryValueSource defVal 0) and
  ``scale`` its global (min, max) pair through
  ctx[("scale", field, "")] (ScaleFloatFunction).

Every OTHER name ValueSourceParser registers (ord/rord/top/cscore/
currency/geodist/geohash/ghhsin/joindf/vector/childfield/payload/
agg*/testfunc/sleep/threadid) dispatches to a typed FuncParseError
naming the surface that implements its semantics (_SPEC_RAISE) — the
registry-closure analogue of localparams' qparser dispatch.
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
    """Top-level comma split, quote-aware (StrParser's quoted-string
    scanning in the reference FunctionQParser): parens and commas
    inside '...'/"..." are literal text, and a backslash escapes the
    next char inside quotes, so concat(f, ',') and query('text:(a b')
    lex correctly."""
    parts, depth, cur = [], 0, []
    quote = None
    esc = False
    for ch in s:
        if quote is not None:
            cur.append(ch)
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
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
        # quoted term literal (FunctionQParser.parseArg quoted form);
        # StrParser unescapes backslash-escaped chars inside quotes —
        # the quote-aware _split_args keeps them raw until here
        body = s[1:-1]
        if "\\" in body:
            out = []
            esc = False
            for ch in body:
                if esc:
                    out.append(ch)
                    esc = False
                elif ch == "\\":
                    esc = True
                else:
                    out.append(ch)
            body = "".join(out)
        return FuncNode("str", field=body)
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
_BOOL_NARY = {"and", "or", "xor"}    # MultiBoolFunction reductions

# Every remaining name ValueSourceParser.java registers dispatches to
# a typed error naming the surface that implements its semantics —
# the registry-closure analogue of localparams' qparser dispatch.
_SPEC_RAISE = {
    "ord": "OrdFieldSource needs the ordinal dictionary — q_func_ord",
    "rord": "reverse ordinals — q_func_ord's dense_rank machinery",
    "top": "top-level-reader wrapper for ord/rord — q_func_ord",
    "cscore": "collapse-context score — the q_collapse surface",
    "currency": "schema currency type (exchange-rate provider)",
    "geodist": "sfield/pt param resolution — q_geo_distance",
    "geohash": "geohash string encoding (spatial contrib)",
    "ghhsin": "geohash haversine — q_geo_distance / hsin()",
    "joindf": "cross-index join docfreq — the q_xc_join surface",
    "vector": "multi-value grouping is inlined by dist()/sqedist()",
    "childfield": "block-join doc transformer — q_block_join rows",
    "payload": "payload docvalues — the q_payload surface",
    "testfunc": "test-only hook (ValueSourceParser.java:90)",
    "sleep": "debug utility (wall-clock side effect)",
    "threadid": "debug utility (executor-local identity)",
    "agg": "JSON facet aggregation context — q_facet_json_stats",
}


def _spec_error(name: str):
    why = _SPEC_RAISE.get(name)
    if why is None and name.startswith("agg_"):
        why = ("JSON facet aggregation context — q_facet_json_stats / "
               "q_facet_unique / q_stats_percentiles")
    if why is not None:
        raise FuncParseError(f"{name}(): {why}")


def _raw_str(node: FuncNode, cols: dict, sql: bool):
    """A string-typed operand (ConcatStringFunction / StringDistance
    operands): quoted literal, literal(...), or a RAW field column
    (no double cast)."""
    if node.name == "str":
        # '' -escape embedded quotes so a quote-bearing literal stays
        # one well-formed SQL string (both dialects use '' escaping)
        if sql:
            return "'" + node.field.replace("'", "''") + "'"
        return F.lit(node.field)
    if node.name == "literal":
        return _raw_str(node.args[0], cols, sql)
    if node.name == "fld":
        if node.field not in cols:
            raise FuncParseError(f"unknown field {node.field!r}")
        return cols[node.field]
    raise FuncParseError(
        f"expected a string operand, got {node.name!r}")


def _ms_literal(spec: str, ctx) -> float:
    """Resolve a date-math string to epoch milliseconds
    (DateValueSourceParser / DateMathParser): a NOW-anchored spec
    needs the request's fixed now instant — supplied as a python
    float under ctx[("now","","")]."""
    from datetime import datetime, timezone

    from ..analysis.datemath import apply_math, parse_date_math
    if spec == "NOW" or spec.startswith(("NOW/", "NOW+", "NOW-")):
        if ctx is None or ("now", "", "") not in ctx:
            raise FuncParseError(
                "NOW-anchored date math needs ctx[('now','','')] "
                "(the request's fixed now, in epoch ms)")
        now_ms = float(ctx[("now", "", "")])
        base = datetime.fromtimestamp(now_ms / 1000.0,
                                      tz=timezone.utc) \
            .replace(tzinfo=None)
        dt = apply_math(base, spec[3:])
    else:
        dt = parse_date_math(spec)
    epoch = datetime(1970, 1, 1)
    return (dt - epoch).total_seconds() * 1000.0


def _halves(name: str, a: list):
    """Split a compiled source list into the two point vectors
    (ValueSourceParser.getMultiValueSources: first half vs second)."""
    if len(a) < 2 or len(a) % 2:
        raise FuncParseError(
            f"{name}(): there must be an even number of sources")
    d = len(a) // 2
    return a[:d], a[d:]


def _query_lookup(node: FuncNode, ctx):
    """QueryValueSource (query(..) / boost(..)): the subquery's
    per-doc score with default 0 — the caller resolves the quoted
    subquery body into a score Column / SQL under
    ctx[("query", body, "")]."""
    arg = node.args[0]
    if arg.name not in ("str", "fld"):
        raise FuncParseError(
            "query(): pass the subquery as a quoted string")
    key = ("query", arg.field, "")
    if ctx is None or key not in ctx:
        raise FuncParseError(
            f"query(): needs ctx[{key!r}] -> per-doc score column "
            "(0 where the subquery misses, QueryValueSource defVal)")
    return ctx[key]


def _ms_operand(node: FuncNode, cols: dict, ctx, sql: bool):
    """One ms() operand: a date docvalue field (the caller maps it to
    an epoch-ms expression) or a date-math string literal resolved at
    compile time (DateValueSourceParser.parseArg ordering)."""
    if node.name == "fld":
        if node.field not in cols:
            raise FuncParseError(f"unknown field {node.field!r}")
        c = cols[node.field]
        return f"CAST({c} AS DOUBLE)" if sql else c.cast("double")
    if node.name == "str":
        v = _ms_literal(node.field, ctx)
        return f"CAST({v!r} AS DOUBLE)" if sql else F.lit(v)
    raise FuncParseError(
        "ms(): operands are date fields or quoted date-math strings")


def _strdist_expr(node: FuncNode, cols: dict, sql: bool):
    """StringDistanceFunction with the 'edit' measure
    (LevenshteinDistance.java:106): 1 - lev/max(len), with the
    reference's empty-string branches (both empty -> 1, one empty ->
    0).  jw/ngram are iterative matchers without a portable twin and
    raise (documented divergence; same policy as spellcheck's shared
    Damerau SQL)."""
    if len(node.args) not in (3, 4):
        raise FuncParseError("strdist() takes 3 or 4 args")
    measure = _str_arg(node.args[2], "measure").lower()
    if measure != "edit":
        raise FuncParseError(
            f"strdist(): measure {measure!r} has no portable twin "
            "(only 'edit' is supported; jw/ngram are iterative "
            "matchers — documented divergence)")
    s1 = _raw_str(node.args[0], cols, sql)
    s2 = _raw_str(node.args[1], cols, sql)
    if sql:
        l1, l2 = f"LENGTH({s1})", f"LENGTH({s2})"
        sim = (f"(1.0 - CAST(levenshtein({s1}, {s2}) AS DOUBLE) / "
               f"CAST(GREATEST({l1}, {l2}) AS DOUBLE))")
        return (f"(CASE WHEN {l1} = 0 AND {l2} = 0 THEN 1.0 "
                f"WHEN {l1} = 0 OR {l2} = 0 THEN 0.0 "
                f"ELSE {sim} END)")
    l1, l2 = F.length(s1), F.length(s2)
    sim = (F.lit(1.0) - F.levenshtein(s1, s2).cast("double")
           / F.greatest(l1, l2).cast("double"))
    return (F.when((l1 == 0) & (l2 == 0), F.lit(1.0))
            .when((l1 == 0) | (l2 == 0), F.lit(0.0))
            .otherwise(sim))


def _scale_expr(node: FuncNode, cols: dict, ctx, sql: bool):
    """ScaleFloatFunction: (x - min) * ((u - l)/(max - min)) + l,
    with the source's global min/max supplied by the caller as a
    (min, max) pair under ctx[("scale", field, "")] — 1-row
    aggregates broadcast into the projection (q_func_scale's plan)."""
    src = node.args[0]
    if src.name != "fld":
        raise FuncParseError(
            "scale(): only field sources are supported (the global "
            "min/max pair rides ctx[('scale', field, '')])")
    key = ("scale", src.field, "")
    if ctx is None or key not in ctx:
        raise FuncParseError(
            f"scale(): needs ctx[{key!r}] -> (min, max) of the field")
    mn, mx = ctx[key]
    if src.field not in cols:
        raise FuncParseError(f"unknown field {src.field!r}")
    compile_fn = compile_sql if sql else compile_col
    lo = compile_fn(node.args[1], cols, ctx)
    hi = compile_fn(node.args[2], cols, ctx)
    if sql:
        x = f"CAST({cols[src.field]} AS DOUBLE)"
        return (f"((({x} - {mn}) * (({hi} - {lo}) / ({mx} - {mn}))) "
                f"+ {lo})")
    x = cols[src.field].cast("double")
    return (x - mn) * ((hi - lo) / (mx - mn)) + lo


def _hsin_expr(node: FuncNode, a: list, sql: bool):
    """HaversineFunction.java:70 (spatial4j distHaversineRAD):
    2r·asin(min(1, sqrt(sin²((y1-y2)/2) + cos y1 cos y2
    sin²((x1-x2)/2)))); args (radius, convertToRads, y1, x1, y2, x2)
    with the SOLR-2114 required convert flag."""
    flag = _str_arg(node.args[1], "convert flag").lower()
    convert = flag in ("true", "1", "1.0")
    radius, y1, x1, y2, x2 = a[0], a[2], a[3], a[4], a[5]
    import math
    d2r = math.pi / 180.0
    if sql:
        if convert:
            y1, x1 = f"({y1} * {d2r!r})", f"({x1} * {d2r!r})"
            y2, x2 = f"({y2} * {d2r!r})", f"({x2} * {d2r!r})"
        hy = f"SIN(({y1} - {y2}) * 0.5)"
        hx = f"SIN(({x1} - {x2}) * 0.5)"
        h = f"(({hy} * {hy}) + ((COS({y1}) * COS({y2})) * ({hx} * {hx})))"
        return f"((2.0 * {radius}) * ASIN(LEAST(1.0, SQRT({h}))))"
    if convert:
        y1, x1 = y1 * F.lit(d2r), x1 * F.lit(d2r)
        y2, x2 = y2 * F.lit(d2r), x2 * F.lit(d2r)
    hy = F.sin((y1 - y2) * F.lit(0.5))
    hx = F.sin((x1 - x2) * F.lit(0.5))
    h = (hy * hy) + ((F.cos(y1) * F.cos(y2)) * (hx * hx))
    return (F.lit(2.0) * radius) * F.asin(F.least(F.lit(1.0),
                                                  F.sqrt(h)))

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
            "maxdoc": 0, "numdocs": 0,
            "linear": 3, "recip": 4, "mod": 2, "pi": 0, "e": 0,
            "true": 0, "false": 0, "not": 1, "hsin": 6,
            "literal": 1, "scale": 3, "boost": 2, "query": 1}.get(name)
    if want is not None and n != want:
        raise FuncParseError(f"{name}() takes {want} args, got {n}")
    if name in _NARY and n < 1:
        raise FuncParseError(f"{name}() needs at least one arg")
    if name in _CMP and n != 2:
        raise FuncParseError(f"{name}() takes 2 args, got {n}")
    if name == "map" and n not in (4, 5):
        raise FuncParseError(f"map() takes 4 or 5 args, got {n}")
    if name == "ms" and n > 2:
        raise FuncParseError(f"ms() takes 0-2 args, got {n}")


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
    _spec_error(name)
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
    if name == "concat":
        # ConcatStringFunction: string concatenation, NULL if any
        # operand is missing (exists == all exist)
        return F.concat(*[_raw_str(x, cols, sql=False)
                          for x in node.args])
    if name == "literal":
        return _raw_str(node.args[0], cols, sql=False)
    if name == "strdist":
        return _strdist_expr(node, cols, sql=False)
    if name == "hsin":
        ha = [compile_col(x, cols, ctx) for i, x in
              enumerate(node.args) if i != 1]
        ha.insert(1, None)      # flag slot read from the AST
        return _hsin_expr(node, ha, sql=False)
    if name == "ms":
        vals = [_ms_operand(x, cols, ctx, sql=False)
                for x in node.args]
        if not vals:
            if ctx is None or ("now", "", "") not in ctx:
                raise FuncParseError(
                    "ms() needs ctx[('now','','')] (epoch ms)")
            return F.lit(float(ctx[("now", "", "")]))
        return vals[0] if len(vals) == 1 else vals[0] - vals[1]
    if name == "query":
        return _query_lookup(node, ctx)
    if name == "boost":
        q = FuncNode("query", args=(node.args[0],))
        return _query_lookup(q, ctx) * compile_col(node.args[1],
                                                   cols, ctx)
    if name == "scale":
        return _scale_expr(node, cols, ctx, sql=False)
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
    if name == "linear":
        # LinearFloatFunction: val*slope + intercept
        return a[0] * a[1] + a[2]
    if name == "recip":
        # ReciprocalFloatFunction: a / (m*x + b)
        return a[2] / (a[1] * a[0] + a[3])
    if name == "mod":
        return a[0] % a[1]
    if name == "pi":
        import math
        return F.lit(math.pi)
    if name == "e":
        import math
        return F.lit(math.e)
    if name == "true":
        return F.lit(1.0)
    if name == "false":
        return F.lit(0.0)
    if name == "not":
        return F.when(a[0] != F.lit(0.0), F.lit(0.0)) \
            .otherwise(F.lit(1.0))
    if name in _BOOL_NARY:
        if not a:
            raise FuncParseError(f"{name}() needs operands")
        preds = [c != F.lit(0.0) for c in a]
        if name == "and":
            out = preds[0]
            for p in preds[1:]:
                out = out & p
        elif name == "or":
            out = preds[0]
            for p in preds[1:]:
                out = out | p
        else:                     # xor: some true AND some false
            any_t, any_f = preds[0], ~preds[0]
            for p in preds[1:]:
                any_t, any_f = any_t | p, any_f | (~p)
            out = any_t & any_f
        return F.when(out, F.lit(1.0)).otherwise(F.lit(0.0))
    if name == "sqedist":
        v1, v2 = _halves(name, a)
        out = (v1[0] - v2[0]) * (v1[0] - v2[0])
        for x, y in zip(v1[1:], v2[1:]):
            out = out + (x - y) * (x - y)
        return out
    if name == "dist":
        p, rest = node.args[0], a[1:]
        v1, v2 = _halves(name, rest)
        pv = p.value if p.name == "lit" else None
        if pv == 1.0:
            out = F.abs(v1[0] - v2[0])
            for x, y in zip(v1[1:], v2[1:]):
                out = out + F.abs(x - y)
            return out
        if pv == 2.0:
            out = (v1[0] - v2[0]) * (v1[0] - v2[0])
            for x, y in zip(v1[1:], v2[1:]):
                out = out + (x - y) * (x - y)
            return F.sqrt(out)
        if pv is None or pv <= 0.0:
            raise FuncParseError(
                "dist(): power must be a positive literal "
                "(0/Infinity sparseness norms not supported)")
        out = F.pow(F.abs(v1[0] - v2[0]), F.lit(pv))
        for x, y in zip(v1[1:], v2[1:]):
            out = out + F.pow(F.abs(x - y), F.lit(pv))
        return F.pow(out, F.lit(1.0 / pv))
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
    _spec_error(name)
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
    if name == "concat":
        # '||', not CONCAT(): DuckDB's CONCAT skips NULL operands,
        # while Spark's F.concat (ConcatStringFunction semantics, the
        # compile_col twin) returns NULL when ANY operand is NULL —
        # '||' propagates NULL the same way in both engines
        parts = " || ".join(_raw_str(x, cols, sql=True)
                            for x in node.args)
        return f"({parts})"
    if name == "literal":
        return _raw_str(node.args[0], cols, sql=True)
    if name == "strdist":
        return _strdist_expr(node, cols, sql=True)
    if name == "hsin":
        ha = [compile_sql(x, cols, ctx) for i, x in
              enumerate(node.args) if i != 1]
        ha.insert(1, None)
        return _hsin_expr(node, ha, sql=True)
    if name == "ms":
        vals = [_ms_operand(x, cols, ctx, sql=True)
                for x in node.args]
        if not vals:
            if ctx is None or ("now", "", "") not in ctx:
                raise FuncParseError(
                    "ms() needs ctx[('now','','')] (epoch ms)")
            return f"CAST({float(ctx[('now', '', '')])!r} AS DOUBLE)"
        return vals[0] if len(vals) == 1 else f"({vals[0]} - {vals[1]})"
    if name == "query":
        return _query_lookup(node, ctx)
    if name == "boost":
        q = FuncNode("query", args=(node.args[0],))
        return (f"({_query_lookup(q, ctx)} * "
                f"{compile_sql(node.args[1], cols, ctx)})")
    if name == "scale":
        return _scale_expr(node, cols, ctx, sql=True)
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
    if name == "linear":
        return f"(({a[0]} * {a[1]}) + {a[2]})"
    if name == "recip":
        return f"({a[2]} / (({a[1]} * {a[0]}) + {a[3]}))"
    if name == "mod":
        return f"({a[0]} % {a[1]})"
    if name == "pi":
        import math
        return f"CAST({math.pi!r} AS DOUBLE)"
    if name == "e":
        import math
        return f"CAST({math.e!r} AS DOUBLE)"
    if name == "true":
        return "CAST(1.0 AS DOUBLE)"
    if name == "false":
        return "CAST(0.0 AS DOUBLE)"
    if name == "not":
        return (f"(CASE WHEN {a[0]} <> 0.0 THEN CAST(0.0 AS DOUBLE) "
                "ELSE CAST(1.0 AS DOUBLE) END)")
    if name in _BOOL_NARY:
        if not a:
            raise FuncParseError(f"{name}() needs operands")
        preds = [f"({c} <> 0.0)" for c in a]
        if name == "and":
            cond = " AND ".join(preds)
        elif name == "or":
            cond = " OR ".join(preds)
        else:
            cond = (f"(({' OR '.join(preds)}) AND "
                    f"({' OR '.join('NOT ' + p for p in preds)}))")
        return (f"(CASE WHEN {cond} THEN CAST(1.0 AS DOUBLE) "
                "ELSE CAST(0.0 AS DOUBLE) END)")
    if name == "sqedist":
        v1, v2 = _halves(name, a)
        terms = [f"(({x} - {y}) * ({x} - {y}))"
                 for x, y in zip(v1, v2)]
        out = terms[0]
        for t in terms[1:]:
            out = f"({out} + {t})"
        return out
    if name == "dist":
        p, rest = node.args[0], a[1:]
        v1, v2 = _halves(name, rest)
        pv = p.value if p.name == "lit" else None
        if pv == 1.0:
            terms = [f"ABS({x} - {y})" for x, y in zip(v1, v2)]
            out = terms[0]
            for t in terms[1:]:
                out = f"({out} + {t})"
            return out
        if pv == 2.0:
            terms = [f"(({x} - {y}) * ({x} - {y}))"
                     for x, y in zip(v1, v2)]
            out = terms[0]
            for t in terms[1:]:
                out = f"({out} + {t})"
            return f"SQRT({out})"
        if pv is None or pv <= 0.0:
            raise FuncParseError(
                "dist(): power must be a positive literal "
                "(0/Infinity sparseness norms not supported)")
        terms = [f"POWER(ABS({x} - {y}), CAST({pv!r} AS DOUBLE))"
                 for x, y in zip(v1, v2)]
        out = terms[0]
        for t in terms[1:]:
            out = f"({out} + {t})"
        return f"POWER({out}, CAST({1.0 / pv!r} AS DOUBLE))"
    raise FuncParseError(f"unknown function {name!r}")
