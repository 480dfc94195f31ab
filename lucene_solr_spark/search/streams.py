"""Solr streaming expressions -> Spark DataFrame plans.

The reference's streaming-expression language (solr/solrj/src/java/org/
apache/solr/client/solrj/io/stream/expr/StreamExpressionParser.java;
stream decorators in solr/solrj/src/java/org/apache/solr/client/solrj/
io/stream/{CloudSolrStream,InnerJoinStream,RollupStream,MergeStream,
UniqueStream,RankStream,SelectStream,IntersectStream,ComplementStream,
SortStream,HavingStream}.java) composes relational operators over
sorted tuple streams. Here every decorator compiles to the equivalent
Catalyst operator, so the "stream" is a DataFrame plan and the sorted
-merge machinery Solr hand-rolls (worker collapsing, partitionKeys)
becomes Spark's shuffle:

| expression            | reference stream class        | Spark plan |
|-----------------------|-------------------------------|------------|
| search(coll, q, fl, sort) | CloudSolrStream/SearchStream | filtered scan / match-set join |
| innerJoin(l, r, on=)  | InnerJoinStream (sorted merge)| equi join  |
| hashJoin(l, r, on=)   | HashJoinStream (hash right)   | broadcast equi join |
| leftOuterJoin(l, r)   | LeftOuterJoinStream           | left join  |
| rollup(s, over=, aggs)| RollupStream (sorted groups)  | groupBy.agg (partial+final) |
| unique(s, over=)      | UniqueStream                  | distinct over key projection |
| top(s, n=, sort=)     | RankStream (size-n heap)      | orderBy.limit (TakeOrderedAndProject) |
| merge(a, b, on=)      | MergeStream (k-way merge)     | unionByName + sort |
| select(s, a as b, ...)| SelectStream                  | select/alias |
| intersect(a, b, on=)  | IntersectStream               | left_semi join |
| complement(a, b, on=) | ComplementStream              | left_anti join |
| sort(s, by=)          | SortStream (full re-sort)     | orderBy    |
| cartesianProduct(s, f as a) | CartesianProductStream  | explode    |
| facet(coll, buckets=, aggs) | FacetStream (JSON facet push-down) | groupBy.agg + TakeOrdered |
| random(coll, q=, rows=, seed=) | RandomStream (random_<seed> sort) | top-k on hash32shift key |
| having(s, cond)       | HavingStream (gt/lt/eq/...)   | filter     |

Scale notes: Solr executes these on a single aggregator node pulling
sorted shards (worker collapse is opt-in via parallel()); every mapping
above is instead a distributed shuffle plan, so rollup/join scale with
executors and small right sides broadcast (hashJoin). Sort specs on
search() become orderBy rather than an index-sort contract — Catalyst
is free to drop the sort when a downstream operator re-shuffles (same
freedom Solr's optimizer takes when re-sorting for partitionKeys).

Expression grammar (StreamExpressionParser.java:46 shape):
  expr   := name '(' arg (',' arg)* ')'
  arg    := expr | ident '=' value | value
  value  := '"' chars '"' | bare-token (no top-level ',' or parens)
"""

from __future__ import annotations

import math
import os
import re
from contextlib import contextmanager
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _d(c):
    """Cast an evaluator operand Column to double (the reference's
    Number.doubleValue() at every distribution constructor)."""
    return c.cast("double")


def _require_int_literal(raw, what: str) -> None:
    """Reject non-integral literal shape parameters (the exact
    finite-sum closed forms for gamma/beta hold for integer shapes
    only — documented engine domain; raising beats a silent
    truncation to int)."""
    if isinstance(raw, str) and re.match(r"^-?\d*\.\d+$", raw) \
            and not float(raw).is_integer():
        raise ValueError(f"{what} must be an integer "
                         f"(got {raw}; the closed-form engine domain)")


def _ks_one_sample_p(dstat, n):
    """One-sample Kolmogorov-Smirnov p-value 1 - P(D_n < d) via the
    Marsaglia-Tsang-Wang H-matrix power (the double path of
    commons-math KolmogorovSmirnovTest.cdf; JSS 8(18) 2003). A
    bounded per-cell scalar — the reference computes it on the
    /stream worker node; here an Arrow-batched pandas UDF keeps it
    executor-side (pytest-pinned laws; excluded from oracle rows
    like every library-approximation float)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _p(ds: pd.Series, ns: pd.Series) -> pd.Series:
        import numpy as np

        def cdf(d, n):
            if d <= 0:
                return 0.0
            if d >= 1:
                return 1.0
            k = int(math.ceil(n * d))
            m = 2 * k - 1
            h = k - n * d
            big = np.zeros((m, m))
            for i in range(m):
                for j in range(m):
                    if i - j + 1 >= 0:
                        big[i][j] = 1.0
            for i in range(m):
                big[i][0] -= h ** (i + 1)
                big[m - 1][i] -= h ** (m - i)
            big[m - 1][0] += (2 * h - 1) ** m if 2 * h - 1 > 0 else 0
            for i in range(m):
                for j in range(m):
                    if i - j + 1 > 0:
                        for g in range(1, i - j + 2):
                            big[i][j] /= g
            # H^n with the commons-math scaling-by-1e140 guard
            e_v = 0
            hp = np.eye(m)
            ev_hp = 0
            p = n
            b = big.copy()
            e_b = 0
            while p > 0:
                if p % 2 == 1:
                    hp = hp @ b
                    ev_hp += e_b
                    if hp[k - 1][k - 1] > 1e140:
                        hp *= 1e-140
                        ev_hp += 140
                b = b @ b
                e_b *= 2
                if b[k - 1][k - 1] > 1e140:
                    b *= 1e-140
                    e_b += 140
                p //= 2
            e_v = ev_hp
            t = hp[k - 1][k - 1]
            for i in range(1, n + 1):
                t = t * i / n
                if t < 1e-140:
                    t *= 1e140
                    e_v -= 140
            return t * (10.0 ** e_v) if e_v else t

        out = []
        for d, n in zip(ds, ns):
            out.append(None if d is None or n is None
                       else 1.0 - cdf(float(d), int(n)))
        return pd.Series(out, dtype="float64")

    return _p(dstat.cast("double"), n.cast("long"))


def _ks_two_sample_p(xs, ys):
    """Two-sample KS: the reference stores
    kolmogorovSmirnovTest(x, y) — the exact P-VALUE — under the
    "d-statistic" key (KolmogorovSmirnovEvaluator.java:40; mirrored
    bug-compatibly). Exact P by the commons-math lattice count: the
    fraction of C(n+m, n) interleavings whose path deviation
    reaches d (non-strict), computed with integer arithmetic."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _p(xa: pd.Series, ya: pd.Series) -> pd.Series:
        from fractions import Fraction

        def dstat(x, y):
            n, m = len(x), len(y)
            xs_, ys_ = sorted(x), sorted(y)
            i = j = 0
            best = 0  # |i*m - j*n| numerator over lcm n*m
            while i < n and j < m:
                z = min(xs_[i], ys_[j])
                while i < n and xs_[i] == z:
                    i += 1
                while j < m and ys_[j] == z:
                    j += 1
                best = max(best, abs(i * m - j * n))
            return best  # d = best / (n*m)

        def exact_p(dnm, n, m):
            # paths (0,0)->(n,m); count those with ALL interior
            # |i*m - j*n| < dnm (strict interior => P of reaching d
            # non-strictly = 1 - count/C). commons-math exactP with
            # strict=false counts paths that stay strictly inside.
            from functools import lru_cache

            @lru_cache(maxsize=None)
            def cnt(i, j):
                if abs(i * m - j * n) >= dnm and not (
                        (i == 0 and j == 0) or (i == n and j == m)):
                    return 0
                if i == n and j == m:
                    return 1
                t = 0
                if i < n:
                    t += cnt(i + 1, j)
                if j < m:
                    t += cnt(i, j + 1)
                return t

            total = math.comb(n + m, n)
            return float(1 - Fraction(cnt(0, 0), total))

        out = []
        for x, y in zip(xa, ya):
            if x is None or y is None:
                out.append(None)
                continue
            x, y = list(x), list(y)
            out.append(exact_p(dstat(x, y), len(x), len(y)))
        return pd.Series(out, dtype="float64")

    return _p(xs, ys)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

@dataclass
class StreamExpr:
    name: str
    args: list = field(default_factory=list)      # positional: StreamExpr|str
    params: dict = field(default_factory=dict)    # key=value (str -> str)


_NAME_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*\(")


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (outside parens and double quotes)."""
    parts, depth, inq, cur = [], 0, False, []
    for ch in s:
        if inq:
            cur.append(ch)
            if ch == '"':
                inq = False
            continue
        if ch == '"':
            inq = True
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
    return [p.strip() for p in parts if p.strip()]


def _unquote(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        return v[1:-1]
    return v


_PARAM_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_.]*)\s*=\s*(.*)$", re.S)


def parse_stream(text: str) -> StreamExpr:
    """Parse one streaming expression (recursive descent, whole-string)."""
    m = _NAME_RE.match(text)
    if not m:
        raise ValueError(f"not a stream expression: {text[:40]!r}")
    body = text.strip()
    if not body.endswith(")"):
        raise ValueError(f"unbalanced expression: {text[:40]!r}")
    inner = body[m.end():-1]
    node = StreamExpr(m.group(1))
    for part in _split_top(inner):
        if _NAME_RE.match(part):
            try:
                node.args.append(parse_stream(part))
                continue
            except ValueError:
                # looks like an expression but has a trailing tail
                # ("add(a,b) as c") — an evaluator spec, kept as a
                # string for the operator (e.g. select) to interpret
                pass
        pm = _PARAM_RE.match(part)
        # key=value only when the value isn't itself a nested expression
        if pm and not _NAME_RE.match(pm.group(1)):
            node.params[pm.group(1)] = _unquote(pm.group(2))
        else:
            node.args.append(_unquote(part))
    return node


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------

_AGG_FNS = ("count", "sum", "min", "max", "avg")
_GAP_RE = re.compile(r"^\+?(\d+)(MINUTE|HOUR|DAY|WEEK)S?$", re.I)
_UNIT_US = {"minute": 60_000_000, "hour": 3_600_000_000,
            "day": 86_400_000_000, "week": 604_800_000_000}


def _parse_gap(gap: str) -> tuple[int, str]:
    """Solr date-math gap ('+1HOUR', '+15MINUTES') -> (n, sql unit).
    Fixed-width units only — MONTH/YEAR gaps are calendar-dependent and
    would need the range-facet date-math engine, not a constant step."""
    m = _GAP_RE.match(gap.strip())
    if not m:
        raise ValueError(f"unsupported timeseries gap {gap!r}")
    return int(m.group(1)), m.group(2).lower()
# nested expressions that are operator arguments, not tuple sources
_NON_STREAM_FNS = set(_AGG_FNS) | {"gt", "lt", "eq", "gteq", "lteq"}


def _zpad_expr(i: str, n: str):
    """ZplotStream.pad (ZplotStream.java:400): zero-pad a row/col
    index to a width chosen by the matrix dimension (none < 11,
    2 < 101, 3 < 1001, 4 < 10001, else 5)."""
    return F.expr(
        f"CASE WHEN {n} < 11 THEN CAST({i} AS STRING) "
        f"ELSE lpad(CAST({i} AS STRING), "
        f"CASE WHEN {n} < 101 THEN 2 WHEN {n} < 1001 THEN 3 "
        f"WHEN {n} < 10001 THEN 4 ELSE 5 END, '0') END")


def _sort_cols(spec: str):
    cols = []
    for piece in spec.split(","):
        piece = piece.strip()
        if not piece:
            continue
        toks = piece.split()
        name = toks[0]
        desc = len(toks) > 1 and toks[1].lower() == "desc"
        cols.append(F.col(name).desc() if desc else F.col(name).asc())
    return cols


def _agg_col(e: StreamExpr):
    """count(*) / sum(f) / min(f) / max(f) / avg(f) -> named agg column.

    Names follow RollupStream's metric identifiers (count(*), sum(f))
    flattened to SQL-safe aliases: count, sum_f, min_f, max_f, avg_f.
    Counts and integer sums stay BIGINT; avg is a double.
    """
    fn = e.name
    arg = e.args[0] if e.args else "*"
    if fn == "count":
        return F.count("*").cast("long").alias("count")
    col = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}[fn](arg)
    return col.alias(f"{fn}_{arg}")


def _replace_lit(tok: str):
    """A replace()/setValue() operand literal -> typed Column.
    Integer / decimal / boolean tokens keep their type (the reference
    compares Object.equals on the parsed tuple value); anything else
    is the (already unquoted) string."""
    if re.match(r"^-?\d+$", tok):
        return F.lit(int(tok))
    if re.match(r"^-?\d*\.\d+$", tok):
        return F.lit(float(tok))
    if tok in ("true", "false"):
        return F.lit(tok == "true")
    return F.lit(tok)


def _apply_replace(df: DataFrame, fld: str, orig: str, params: dict):
    """ReplaceOperation (solrj/io/ops/ReplaceOperation.java:43 with
    ReplaceWithValueOperation / ReplaceWithFieldOperation variants):
    in `fld`, tuples whose current value equals `orig` (or is missing
    when orig is the null keyword) take withValue=<literal> /
    withField=<other field>; everything else passes through. Compiled
    to one codegen CASE WHEN — a replace over 10^12 tuples is a plain
    projected scan, no UDF. A quoted "null" string operand is
    indistinguishable from the null keyword after parsing (documented
    divergence; the reference keeps the distinction in its JSON AST).
    """
    if "withValue" in params:
        repl = _replace_lit(params["withValue"])
    elif "withField" in params:
        repl = F.col(params["withField"])
    else:
        raise ValueError("replace() needs withValue= or withField=")
    cur = F.col(fld) if fld in df.columns else F.lit(None)
    cond = cur.isNull() if orig == "null" else cur == _replace_lit(orig)
    out = F.when(cond, repl).otherwise(cur)
    return df.withColumn(fld, out)


class _Dist:
    """A probability-distribution object flowing through the
    evaluator tree (the reference returns commons-math
    RealDistribution / IntegerDistribution instances from
    solrj/io/eval/{Normal,Uniform,UniformInteger,Binomial,Poisson,
    Geometric,ZipF,Constant,Triangular,LogNormal,Weibull,Gamma,Beta,
    Enumerated}DistributionEvaluator.java; Lang.java registers the
    constructor names). Here the object is a tagged bundle of
    Catalyst parameter Columns: the consuming evaluators —
    cumulativeProbability / probability / density / sample /
    outliers / kolmogorovSmirnov — compile the matching commons-math
    closed form into a whole-stage-codegen expression, so a
    distribution query over a 100 TB column is a plain projected
    scan (no UDF, no driver round-trip). ``integer`` marks the
    IntegerDistribution branch (pmf semantics for probability())."""

    __slots__ = ("kind", "integer", "p")

    def __init__(self, kind: str, integer: bool, **p):
        self.kind, self.integer, self.p = kind, integer, p


class _VFunc:
    """A solrj/io/eval VectorFunction flowing through the evaluator
    tree (the reference wraps a commons-math UnivariateFunction plus
    the rendered fitted-value list; Lerp/Spline/Akima/PolyFit/
    Derivative/IntegrateEvaluator.java produce and consume them).
    Here the function is a bundle of Catalyst Columns:

    - kind 'pp' — piecewise polynomial: ``lx`` knots (ascending),
      ``coefs`` array<array<double>> of per-segment ASCENDING-power
      coefficients on [lx[i], lx[i+1]] evaluated at dx = z - lx[i]
      (commons-math PolynomialSplineFunction layout);
    - kind 'poly' — one global polynomial evaluated at raw z
      (commons-math PolynomialFunction, the PolyFit result).

    ``fitted`` is the rendered list (the reference's VectorFunction
    value list) — tuple()/select() bindings coerce to it via
    _as_col. ``ctx`` mirrors VectorFunction.addToContext (amplitude/
    angularFrequency/phase for the harmonic family). Every consumer
    compiles to whole-stage-codegen expressions over bounded cells —
    at 100 TB the fits run per-group inside projections, shuffle-free."""

    __slots__ = ("kind", "fitted", "lx", "coefs", "ctx")

    def __init__(self, kind, fitted, lx=None, coefs=None, ctx=None):
        self.kind, self.fitted = kind, fitted
        self.lx, self.coefs, self.ctx = lx, coefs, ctx or {}


class _Mat:
    """A labeled matrix flowing through the evaluator tree (the
    reference's solrj/io/eval/Matrix.java: double[][] data plus
    rowLabels, columnLabels and an attributes map; TermVectors/
    SetRowLabels/SetColumnLabels/GetAttribute...Evaluator.java
    produce and consume it). Here the object is a bundle of Catalyst
    Columns — ``rows`` array<array<double>>, ``rlab``/``clab``
    array<string> (or None), ``attrs`` name -> Column — plus an
    optional ``base`` 1-row relation the Columns are valid over
    (DataFrame-backed builders like termVectors aggregate a bounded
    cell to one row first; plain matrix() literals ride the
    expression's own base). Unlabeled matrix math keeps returning
    bare array<array<double>> Columns — _mrows() unwraps either."""

    __slots__ = ("rows", "rlab", "clab", "attrs", "base")

    def __init__(self, rows, rlab=None, clab=None, attrs=None,
                 base=None):
        self.rows, self.rlab, self.clab = rows, rlab, clab
        self.attrs, self.base = attrs or {}, base


class _Clus:
    """A clustering result flowing through the evaluator tree (the
    reference returns KmeansEvaluator.ClusterTuple /
    DbscanEvaluator.ClusterTuple from solrj/io/eval/{Kmeans,
    MultiKmeans,FuzzyKmeans,Dbscan}Evaluator.java; consumed by
    Get{Centroids,Cluster,MembershipMatrix}Evaluator.java and
    ZplotStream's clusters mode). Here the object wraps ONE struct
    Column {cents, assign, memb, ids, pts} produced by a bounded
    Arrow pandas UDF over the (config-sized) matrix cell — the same
    per-cell worker-node computation the reference performs, kept
    executor-side (the KS p-value precedent). ``fuzzy`` gates
    getMembershipMatrix."""

    __slots__ = ("blob", "fuzzy", "base")

    def __init__(self, blob, fuzzy=False, base=None):
        self.blob, self.fuzzy, self.base = blob, fuzzy, base


_CLUS_SCHEMA = ("cents array<array<double>>, assign array<int>, "
                "memb array<array<double>>, ids array<string>, "
                "pts array<array<double>>")


def _cluster_blob(rows, ids, algo, k, max_iter, trials, fuzz, eps,
                  min_pts):
    """Clustering kernel over a 1-row matrix cell. kmeans/
    multiKmeans/fuzzyKmeans reproduce the commons-math algorithms
    with a PINNED RandomState(42) where the reference draws from an
    unseeded JDKRandomGenerator (nondeterministic by construction —
    the engine's runs are reproducible, a documented divergence;
    clustering LAWS are pytest-pinned). dbscan is deterministic in
    both engines (DBSCANClusterer.java visit order = row order) and
    carries a full DuckDB oracle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_CLUS_SCHEMA)
    def _c(rs: pd.Series, ids_s: pd.Series) -> pd.DataFrame:
        import numpy as np

        def dists(X, c):
            return np.sqrt(((X[:, None, :] - c[None, :, :]) ** 2)
                           .sum(axis=2))

        def kmeans_pp(X, rng):
            n = len(X)
            cents = [X[rng.randint(n)]]
            while len(cents) < k:
                d2 = np.min(
                    ((X[:, None, :] - np.array(cents)[None, :, :])
                     ** 2).sum(axis=2), axis=1)
                tot = d2.sum()
                probs = (np.full(n, 1.0 / n) if tot <= 0
                         else d2 / tot)
                cents.append(X[rng.choice(n, p=probs)])
            c = np.array(cents)
            assign = np.zeros(n, dtype=int)
            for _ in range(max(1, max_iter)):
                na = np.argmin(dists(X, c), axis=1)
                # empty-cluster repair (commons-math
                # LARGEST_VARIANCE strategy simplified: steal the
                # globally farthest point — documented)
                for ci in range(k):
                    if not (na == ci).any():
                        far = np.argmax(np.min(dists(X, c), axis=1))
                        na[far] = ci
                if (na == assign).all() and _ > 0:
                    break
                assign = na
                for ci in range(k):
                    m = X[assign == ci]
                    if len(m):
                        c[ci] = m.mean(axis=0)
            return c, assign

        def wcss(X, c, assign):
            return float(((X - c[assign]) ** 2).sum())

        def fuzzy(X, rng):
            n = len(X)
            u = rng.rand(n, k)
            u /= u.sum(axis=1, keepdims=True)
            m = fuzz
            c = np.zeros((k, X.shape[1]))
            for _ in range(max(1, max_iter)):
                um = u ** m
                c = (um.T @ X) / um.sum(axis=0)[:, None]
                d = dists(X, c)
                d = np.maximum(d, 1e-12)
                nu = 1.0 / ((d[:, :, None] / d[:, None, :])
                            ** (2.0 / (m - 1.0))).sum(axis=2)
                if np.abs(nu - u).max() < 1e-3:
                    u = nu
                    break
                u = nu
            return c, u, np.argmax(u, axis=1)

        def dbscan(X):
            # DBSCANClusterer.java:141 — visit in row order;
            # neighbors d <= eps excluding self; core if
            # len(neigh) >= minPts; border points join the FIRST
            # cluster that expands to them; else NOISE (-1)
            n = len(X)
            d = dists(X, X)
            neigh = [np.where((d[i] <= eps)
                              & (np.arange(n) != i))[0]
                     for i in range(n)]
            assign = np.full(n, -1, dtype=int)
            visited = np.zeros(n, dtype=bool)
            cid = -1
            for i in range(n):
                if visited[i]:
                    continue
                visited[i] = True
                if len(neigh[i]) < min_pts:
                    continue
                cid += 1
                assign[i] = cid
                queue = list(neigh[i])
                qi = 0
                while qi < len(queue):
                    j = queue[qi]
                    qi += 1
                    if assign[j] == -1:
                        assign[j] = cid
                    if not visited[j]:
                        visited[j] = True
                        if len(neigh[j]) >= min_pts:
                            queue.extend(neigh[j])
            return assign

        def cents_from(X, assign):
            out = []
            for ci in range(assign.max() + 1 if len(assign) else 0):
                m = X[assign == ci]
                if len(m):
                    out.append(m.mean(axis=0))
            return np.array(out) if out else np.zeros((0, X.shape[1]))

        res = {"cents": [], "assign": [], "memb": [], "ids": [],
               "pts": []}
        for pts, rl in zip(rs, ids_s):
            X = np.array([list(r) for r in pts], dtype=float)
            labels = (list(rl) if rl is not None
                      else [str(i) for i in range(len(X))])
            rng = np.random.RandomState(42)
            memb = np.zeros((0, 0))
            if algo == "dbscan":
                assign = dbscan(X)
                c = cents_from(X, assign)
            elif algo == "fuzzy":
                c, memb, assign = fuzzy(X, rng)
            else:
                best = None
                for _t in range(trials if algo == "multi" else 1):
                    c0, a0 = kmeans_pp(X, rng)
                    w = wcss(X, c0, a0)
                    if best is None or w < best[0]:
                        best = (w, c0, a0)
                _, c, assign = best
            res["cents"].append([[float(v) for v in row]
                                 for row in c])
            res["assign"].append([int(x) for x in assign])
            res["memb"].append([[float(v) for v in row]
                                for row in memb])
            res["ids"].append(labels)
            res["pts"].append([[float(v) for v in row] for row in X])
        return pd.DataFrame(res)

    return _c(rows, ids)


class _Hull:
    """A 2-D convex hull flowing through the evaluator tree (the
    reference's commons-math ConvexHull2D from ConvexHullEvaluator
    .java:40, consumed by GetVertices/GetBaryCenter/GetArea/
    GetBoundarySize/ProjectToBorderEvaluator.java). The blob struct
    {verts, bary, area, boundary} is computed ONCE by a bounded
    Arrow pandas UDF over the matrix cell (MonotoneChain twin:
    sort by x then y, lower+upper chains, CCW from the leftmost-
    lowest vertex — the commons-math order)."""

    __slots__ = ("blob", "base")

    def __init__(self, blob, base=None):
        self.blob, self.base = blob, base


class _Ball:
    """A smallest enclosing disk (commons-math WelzlEncloser +
    DiskGenerator from EnclosingDiskEvaluator.java:40, consumed by
    GetCenter/GetRadius/GetSupportPointsEvaluator.java). The minimal
    ball is UNIQUE, so the engine computes it by deterministic
    candidate enumeration (all 2-point diameters and 3-point
    circumcircles) instead of Welzl's move-to-front scan — identical
    center/radius; the support-point ORDER may differ from the
    reference (documented; tests compare as sets)."""

    __slots__ = ("blob", "base")

    def __init__(self, blob, base=None):
        self.blob, self.base = blob, base


def _hull_blob(rows):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("verts array<array<double>>, bary array<double>, "
                "area double, boundary double")
    def _h(rs: pd.Series) -> pd.DataFrame:
        out = {"verts": [], "bary": [], "area": [], "boundary": []}
        for pts in rs:
            P = sorted((float(p[0]), float(p[1])) for p in pts)

            def cross(o, q, r):
                return ((q[0] - o[0]) * (r[1] - o[1])
                        - (q[1] - o[1]) * (r[0] - o[0]))

            lower = []
            for p in P:
                while len(lower) >= 2 \
                        and cross(lower[-2], lower[-1], p) <= 0:
                    lower.pop()
                lower.append(p)
            upper = []
            for p in reversed(P):
                while len(upper) >= 2 \
                        and cross(upper[-2], upper[-1], p) <= 0:
                    upper.pop()
                upper.append(p)
            verts = lower[:-1] + upper[:-1]
            # shoelace area + perimeter + area-weighted centroid
            n = len(verts)
            a2 = 0.0
            cx = cy = 0.0
            per = 0.0
            for i in range(n):
                x0, y0 = verts[i]
                x1, y1 = verts[(i + 1) % n]
                w = x0 * y1 - x1 * y0
                a2 += w
                cx += (x0 + x1) * w
                cy += (y0 + y1) * w
                per += math.hypot(x1 - x0, y1 - y0)
            area = a2 / 2.0
            if area != 0:
                cx /= (6.0 * area)
                cy /= (6.0 * area)
            out["verts"].append([list(v) for v in verts])
            out["bary"].append([cx, cy])
            out["area"].append(abs(area))
            out["boundary"].append(per)
        return pd.DataFrame(out)

    return _h(rows)


def _disk_blob(rows):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("center array<double>, radius double, "
                "support array<array<double>>")
    def _b(rs: pd.Series) -> pd.DataFrame:
        out = {"center": [], "radius": [], "support": []}
        for pts in rs:
            P = [(float(p[0]), float(p[1])) for p in pts]

            def covers(c, r, eps=1e-9):
                return all(math.hypot(p[0] - c[0], p[1] - c[1])
                           <= r + eps for p in P)

            best = None
            for i in range(len(P)):
                for j in range(i + 1, len(P)):
                    c = ((P[i][0] + P[j][0]) / 2.0,
                         (P[i][1] + P[j][1]) / 2.0)
                    r = math.hypot(P[i][0] - c[0], P[i][1] - c[1])
                    if covers(c, r) and (best is None
                                         or r < best[1]):
                        best = (c, r, [P[i], P[j]])
            for i in range(len(P)):
                for j in range(i + 1, len(P)):
                    for k in range(j + 1, len(P)):
                        ax, ay = P[i]
                        bx, by = P[j]
                        cx_, cy_ = P[k]
                        d = 2.0 * (ax * (by - cy_) + bx * (cy_ - ay)
                                   + cx_ * (ay - by))
                        if d == 0:
                            continue
                        ux = ((ax * ax + ay * ay) * (by - cy_)
                              + (bx * bx + by * by) * (cy_ - ay)
                              + (cx_ * cx_ + cy_ * cy_)
                              * (ay - by)) / d
                        uy = ((ax * ax + ay * ay) * (cx_ - bx)
                              + (bx * bx + by * by) * (ax - cx_)
                              + (cx_ * cx_ + cy_ * cy_)
                              * (bx - ax)) / d
                        r = math.hypot(ax - ux, ay - uy)
                        if covers((ux, uy), r) \
                                and (best is None or r < best[1]):
                            best = ((ux, uy), r,
                                    [P[i], P[j], P[k]])
            c, r, sup = best if best else ((P[0][0], P[0][1]), 0.0,
                                           [P[0]])
            out["center"].append([c[0], c[1]])
            out["radius"].append(r)
            out["support"].append([list(s) for s in sup])
        return pd.DataFrame(out)

    return _b(rows)


def _project_border(verts, pts):
    """Nearest point on the hull boundary for each input point
    (Region.projectToBoundary in ProjectToBorderEvaluator.java:47)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<array<double>>")
    def _p(vs: pd.Series, qs: pd.Series) -> pd.Series:
        res = []
        for verts_, pts_ in zip(vs, qs):
            V = [(float(v[0]), float(v[1])) for v in verts_]
            rows = []
            for q in pts_:
                qx, qy = float(q[0]), float(q[1])
                bd = None
                for i in range(len(V)):
                    x0, y0 = V[i]
                    x1, y1 = V[(i + 1) % len(V)]
                    dx, dy = x1 - x0, y1 - y0
                    L2 = dx * dx + dy * dy
                    t = (0.0 if L2 == 0 else max(
                        0.0, min(1.0, ((qx - x0) * dx
                                       + (qy - y0) * dy) / L2)))
                    px, py = x0 + t * dx, y0 + t * dy
                    d = math.hypot(qx - px, qy - py)
                    if bd is None or d < bd[0]:
                        bd = (d, [px, py])
                rows.append(bd[1])
            res.append(rows)
        return pd.Series(res)

    return _p(verts, pts)


class _Ols:
    """A multiple-regression result (OLSRegressionEvaluator.java:40's
    MultipleRegressionTuple): wraps the result struct so predict()
    can dispatch statically; getValue()/tuple() unwrap to the
    struct."""

    __slots__ = ("tup", "base")

    def __init__(self, tup, base=None):
        self.tup, self.base = tup, base


class _BiFunc:
    """BicubicSplineEvaluator.java:40's BivariateFunction (commons-
    math PiecewiseBicubicSplineInterpolator), consumed by
    predict(f, x, y). The engine evaluates by SUCCESSIVE 1-D natural
    cubic splines — spline across y inside each grid row at y*, then
    spline across x over those values — which agrees with the
    reference exactly at the knots and on (bi)linear data (every
    interpolating scheme reproduces them; the oracle-able surface);
    off-knot values on curved grids follow the successive-spline
    construction rather than commons-math's piecewise-Lagrange
    5-point stencils (documented divergence, pytest pins the
    independent Python twin). All three members are bounded Catalyst
    array Columns — a predict is one codegen projection."""

    __slots__ = ("xs", "ys", "grid")

    def __init__(self, xs, ys, grid):
        self.xs, self.ys, self.grid = xs, ys, grid

    @property
    def blob(self):
        return F.struct(self.xs.alias("xs"), self.ys.alias("ys"),
                        self.grid.alias("grid"))


class _Markov:
    """MarkovChainEvaluator.java:58's MarkovChain: a transition
    matrix plus current state, consumed by sample(mc, n). The
    reference seeds the walk with new Random() when no initial state
    is given — nondeterministic; the engine requires the explicit
    initial state operand."""

    __slots__ = ("rows", "state0")

    def __init__(self, rows, state0):
        self.rows, self.state0 = rows, state0


def _loess_blob(xs, ys, bandwidth, robust_iters):
    """commons-math3 LoessInterpolator.smooth, the algorithm behind
    LoessEvaluator.java:40: tricube-weighted local linear regression
    over a floor(bandwidth*n)-point window that advances AT MOST ONE
    step per point (updateBandwidthInterval with unit user weights —
    NOT a k-NN while loop), tricube distance scaled by the FARTHER
    window edge, the beta=0 guard at sqrt(|E[x^2]-E[x]^2|) < 1e-12
    (DEFAULT_ACCURACY), then `robust_iters` biweight re-weighting
    passes with medianResidual = sortedResiduals[n/2] (an integer
    index, not an interpolated percentile) and early exit when the
    median residual is zero. A bounded Arrow kernel over the
    literal/cell series — the reference runs commons-math
    driver-side. n <= 2 returns y unchanged, as in the reference."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _lo(xx: pd.Series, yy: pd.Series) -> pd.Series:
        def tricube(d):
            t = 1.0 - d * d * d
            return t * t * t

        res_out = []
        for xv, yv in zip(xx, yy):
            x = [float(v) for v in xv]
            y = [float(v) for v in yv]
            n = len(x)
            if n <= 2:
                res_out.append(list(y))
                continue
            k = int(bandwidth * n)
            res = [0.0] * n
            residuals = [0.0] * n
            rw = [1.0] * n
            for it in range(robust_iters + 1):
                left, right = 0, k - 1
                for i in range(n):
                    xi = x[i]
                    if i > 0 and right + 1 < n \
                            and x[right + 1] - xi < xi - x[left]:
                        left += 1
                        right += 1
                    edge = (left if xi - x[left] > x[right] - xi
                            else right)
                    sw = sx = sxx = sy = sxy = 0.0
                    denom = abs(1.0 / (x[edge] - xi))
                    for j in range(left, right + 1):
                        xk, yk = x[j], y[j]
                        dist = (xi - xk) if j < i else (xk - xi)
                        w = tricube(dist * denom) * rw[j]
                        xkw = xk * w
                        sw += w
                        sx += xkw
                        sxx += xk * xkw
                        sy += yk * w
                        sxy += yk * xkw
                    mx, my = sx / sw, sy / sw
                    mxy, mxx = sxy / sw, sxx / sw
                    if math.sqrt(abs(mxx - mx * mx)) < 1e-12:
                        beta = 0.0
                    else:
                        beta = (mxy - mx * my) / (mxx - mx * mx)
                    alpha = my - beta * mx
                    res[i] = beta * xi + alpha
                    residuals[i] = abs(y[i] - res[i])
                if it == robust_iters:
                    break
                med = sorted(residuals)[n // 2]
                if med == 0.0:
                    break
                for i in range(n):
                    arg = residuals[i] / (6.0 * med)
                    rw[i] = (0.0 if arg >= 1.0
                             else (1.0 - arg * arg) ** 2)
            res_out.append(res)
        return pd.Series(res_out)

    return _lo(xs, ys)


def _curvefit_blob(xs, ys, model):
    """Gauss/HarmonicFitEvaluator.java:40 — commons-math
    {Gaussian,Harmonic}CurveFitter: a ParameterGuesser seed refined
    by Levenberg-Marquardt to the least-squares optimum. The engine
    seeds with the same ideas (Gaussian: max/centroid + FWHM width;
    harmonic: the dominant DFT bin's amplitude/frequency/phase — a
    documented divergence from the reference's AMS integral guesser,
    immaterial once LM converges) and runs damped Gauss-Newton to
    machine precision in a bounded Arrow kernel. On data exactly on
    the model the optimum IS the generating parameter triple — the
    oracle-able surface; noisy-data parity is pinned by pytest laws,
    not bit equality (the reference's LM internals are not
    re-derivable). Harmonic results are canonicalized to a > 0,
    omega > 0, phase in (-pi, pi] (cos-model gauge freedom)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _cf(xx: pd.Series, yy: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for xv, yv in zip(xx, yy):
            x = np.asarray(list(xv), dtype=float)
            y = np.asarray(list(yv), dtype=float)
            n = len(x)
            if model == "gauss":
                k = int(np.argmax(y))
                norm, mean = float(y[k]), float(x[k])
                above = x[y >= norm / 2.0]
                fw = (float(above.max() - above.min())
                      if len(above) > 1
                      else float(x.max() - x.min()) / 4.0 or 1.0)
                p = np.array([norm, mean, max(fw / 2.35482, 1e-3)])

                def f(p):
                    return p[0] * np.exp(-((x - p[1]) ** 2)
                                         / (2.0 * p[2] * p[2]))

                def jac(p):
                    e = np.exp(-((x - p[1]) ** 2)
                               / (2.0 * p[2] * p[2]))
                    return np.stack(
                        [e,
                         p[0] * e * (x - p[1]) / (p[2] * p[2]),
                         p[0] * e * ((x - p[1]) ** 2) / p[2] ** 3],
                        axis=1)
            else:
                dt = float(x[-1] - x[0]) / (n - 1) if n > 1 else 1.0
                sp = np.fft.rfft(y - y.mean())
                k = (int(np.argmax(np.abs(sp[1:]))) + 1
                     if len(sp) > 1 else 1)
                w0 = 2.0 * math.pi * k / (n * dt)
                p = np.array([2.0 * float(np.abs(sp[k])) / n, w0,
                              float(np.angle(sp[k])) - w0
                              * float(x[0])])

                def f(p):
                    return p[0] * np.cos(p[1] * x + p[2])

                def jac(p):
                    c = np.cos(p[1] * x + p[2])
                    s = np.sin(p[1] * x + p[2])
                    return np.stack([c, -p[0] * x * s, -p[0] * s],
                                    axis=1)

            lam, r = 1e-3, y - f(p)
            cost = float(r @ r)
            for _ in range(300):
                J = jac(p)
                A, g = J.T @ J, J.T @ r
                dp, moved = np.zeros_like(p), False
                for _ in range(60):
                    try:
                        dp = np.linalg.solve(
                            A + lam * np.diag(
                                np.maximum(np.diag(A), 1e-12)), g)
                    except np.linalg.LinAlgError:
                        lam *= 10.0
                        continue
                    pn = p + dp
                    rn = y - f(pn)
                    cn = float(rn @ rn)
                    if cn <= cost:
                        p, r, cost = pn, rn, cn
                        lam = max(lam * 0.3, 1e-14)
                        moved = True
                        break
                    lam *= 10.0
                    if lam > 1e14:
                        break
                if not moved or float(np.linalg.norm(dp)) \
                        < 1e-14 * (1.0 + float(np.linalg.norm(p))):
                    break
            if model == "harm":
                a_, w_, ph_ = (float(v) for v in p)
                if w_ < 0:
                    w_, ph_ = -w_, -ph_
                if a_ < 0:
                    a_, ph_ = -a_, ph_ + math.pi
                ph_ = (ph_ + math.pi) % (2.0 * math.pi) - math.pi
                if ph_ <= -math.pi:
                    ph_ += 2.0 * math.pi
                out.append([a_, w_, ph_])
            else:
                out.append([float(p[0]), float(p[1]),
                            abs(float(p[2]))])
        return pd.Series(out)

    return _cf(xs, ys)


def _ols_blob(rows, ys):
    """OLS with intercept (commons-math OLSMultipleLinearRegression
    .newSampleData(y, x)): beta = lstsq([1 X], y); regressandVariance
    = sample var of y; RSquared = 1 - SSR/SST (centered);
    adjustedRSquared = 1 - SSR(n-1)/(SST(n-k));
    regressionParametersVariance = (X'X)^-1 (unscaled, the
    commons-math calculateBetaVariance contract); standard errors =
    sqrt(diag((X'X)^-1) * SSR/(n-k)). A bounded Arrow kernel over the
    matrix cell — the reference runs commons-math driver-side."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("regressandVariance double, "
                "regressionParameters array<double>, "
                "RSquared double, adjustedRSquared double, "
                "residualSumSquares double, "
                "regressionParametersStandardErrors array<double>, "
                "regressionParametersVariance array<array<double>>")
    def _o(rs: pd.Series, yy: pd.Series) -> pd.DataFrame:
        import numpy as np
        out = {k: [] for k in
               ("regressandVariance", "regressionParameters",
                "RSquared", "adjustedRSquared", "residualSumSquares",
                "regressionParametersStandardErrors",
                "regressionParametersVariance")}
        for pts, yv in zip(rs, yy):
            X0 = np.array([list(r) for r in pts], dtype=float)
            y = np.array(list(yv), dtype=float)
            n = len(y)
            X = np.hstack([np.ones((n, 1)), X0])
            k = X.shape[1]
            xtx_inv = np.linalg.inv(X.T @ X)
            beta = xtx_inv @ (X.T @ y)
            resid = y - X @ beta
            ssr = float(resid @ resid)
            sst = float(((y - y.mean()) ** 2).sum())
            sigma2 = ssr / (n - k)
            out["regressandVariance"].append(sst / (n - 1))
            out["regressionParameters"].append(
                [float(b) for b in beta])
            out["RSquared"].append(1.0 - ssr / sst)
            out["adjustedRSquared"].append(
                1.0 - (ssr * (n - 1)) / (sst * (n - k)))
            out["residualSumSquares"].append(ssr)
            out["regressionParametersStandardErrors"].append(
                [float(v) for v in
                 np.sqrt(np.diag(xtx_inv) * sigma2)])
            out["regressionParametersVariance"].append(
                [[float(v) for v in row] for row in xtx_inv])
        return pd.DataFrame(out)

    return _o(rows, ys)


def _corr_pvalues_blob(corr_rows, n):
    """PearsonsCorrelation.getCorrelationPValues (consumed by
    CorrelationSignificanceEvaluator.java:44): two-tailed p = I_x(
    nu/2, 1/2) with x = nu/(nu + t^2), t = r sqrt(nu/(1-r^2)),
    nu = n-2; zero diagonal. Regularized incomplete beta via the
    Lentz continued fraction (deterministic; pytest pins closed-form
    cases nu=1,2)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<array<double>>")
    def _pv(cr: pd.Series, ns: pd.Series) -> pd.Series:
        def betacf(aa, bb, x):
            tiny = 1e-300
            qab, qap, qam = aa + bb, aa + 1.0, aa - 1.0
            c = 1.0
            d = 1.0 - qab * x / qap
            if abs(d) < tiny:
                d = tiny
            d = 1.0 / d
            h = d
            for m in range(1, 200):
                m2 = 2 * m
                num = m * (bb - m) * x / ((qam + m2) * (aa + m2))
                d = 1.0 + num * d
                if abs(d) < tiny:
                    d = tiny
                c = 1.0 + num / c
                if abs(c) < tiny:
                    c = tiny
                d = 1.0 / d
                h *= d * c
                num = (-(aa + m) * (qab + m) * x
                       / ((aa + m2) * (qap + m2)))
                d = 1.0 + num * d
                if abs(d) < tiny:
                    d = tiny
                c = 1.0 + num / c
                if abs(c) < tiny:
                    c = tiny
                d = 1.0 / d
                delta = d * c
                h *= delta
                if abs(delta - 1.0) < 1e-15:
                    break
            return h

        def betainc(aa, bb, x):
            if x <= 0:
                return 0.0
            if x >= 1:
                return 1.0
            ln_front = (math.lgamma(aa + bb) - math.lgamma(aa)
                        - math.lgamma(bb) + aa * math.log(x)
                        + bb * math.log(1.0 - x))
            front = math.exp(ln_front)
            if x < (aa + 1.0) / (aa + bb + 2.0):
                return front * betacf(aa, bb, x) / aa
            return 1.0 - front * betacf(bb, aa, 1.0 - x) / bb

        res = []
        for rows, nv in zip(cr, ns):
            nu = float(nv) - 2.0
            mat = []
            for i, row in enumerate(rows):
                prow = []
                for j, r in enumerate(row):
                    if i == j:
                        prow.append(0.0)
                        continue
                    r = max(min(float(r), 1.0 - 1e-15),
                            -1.0 + 1e-15)
                    t2 = r * r * nu / (1.0 - r * r)
                    prow.append(betainc(nu / 2.0, 0.5,
                                        nu / (nu + t2)))
                mat.append(prow)
            res.append(mat)
        return pd.Series(res)

    return _pv(corr_rows, n)


def _let1(val, body):
    """Expression-level let-binding: evaluate ``val`` ONCE and feed
    it to ``body`` as a higher-order-function lambda variable —
    element_at(transform(array(val), v -> body(v)), 1). Catalyst
    Columns are trees, not DAGs: every re-reference of a Column
    copies its whole subtree, and the spline/akima/polyfit folds
    referenced 4-30x blow the plan to OOM without this (same family
    of fix as the repo's array_repeat staging note)."""
    return F.element_at(F.transform(F.array(val), body), 1)


def _as_col(v):
    """Coerce an evaluator result to a Column for tuple()/select()
    binding (the reference renders a VectorFunction as its fitted
    list; distributions have no rendering — consuming them directly
    is an error, as in the reference)."""
    if isinstance(v, _VFunc):
        return v.fitted
    if isinstance(v, _Mat):
        # the reference renders a Matrix tuple value as its data
        # (list of rows)
        return v.rows
    if isinstance(v, _Dist):
        raise ValueError("a distribution is not a value — consume it "
                         "via cumulativeProbability/probability/"
                         "density/sample/outliers/kolmogorovSmirnov")
    if isinstance(v, _Clus):
        raise ValueError("a clustering result is not a value — "
                         "consume it via getCentroids/getCluster/"
                         "getMembershipMatrix/zplot(clusters=...)")
    if isinstance(v, _Ols):
        # the reference renders the MultipleRegressionTuple as its
        # field map
        return v.tup
    if isinstance(v, _BiFunc):
        raise ValueError("a bicubicSpline is not a value — consume "
                         "it via predict(f, x, y)")
    return v


def det_expr(m, mul, add, sub):
    """Structural Laplace expansion along the first row. One
    generator drives BOTH engines (Catalyst Column ops and DuckDB
    SQL strings), so the floating-point evaluation order — hence
    every rounding — is identical; the polyfit oracle rows depend on
    this parity."""
    n = len(m)
    if n == 1:
        return m[0][0]
    total = None
    for j in range(n):
        minor = [[m[i][k] for k in range(n) if k != j]
                 for i in range(1, n)]
        term = mul(m[0][j], det_expr(minor, mul, add, sub))
        if total is None:
            total = term
        elif j % 2 == 0:
            total = add(total, term)
        else:
            total = sub(total, term)
    return total


class _Daemon:
    """A registered daemon (DaemonStream.java:57): the wrapped
    expression's plan plus an iteration counter. ``run_once()``
    replays the plan and forces it — the deterministic stand-in for
    the reference's interval thread (iterations is the logical
    clock; there is deliberately no wall-clock state)."""

    def __init__(self, ev, expr: "StreamExpr", run_interval: str):
        self.ev = ev
        self.expr = expr
        self.run_interval = run_interval
        self.iterations = 0
        self.state = "STOPPED"

    def run_once(self) -> int:
        self.state = "RUNNING"
        n = self.ev.eval(self.expr).count()
        self.iterations += 1
        self.state = "STOPPED"
        return int(n)

    def info(self) -> dict:
        return {"id": None, "state": self.state,
                "iterations": self.iterations}


class StreamEvaluator:
    """Evaluates a parsed streaming expression against named collections.

    ``collections``: name -> DataFrame (stored-fields view).
    ``text_search``: optional callable (collection, query_text) ->
    DataFrame of matching ids, used for full-text ``q`` on an analyzed
    field (the engine's Searcher.matching plugged in by the caller);
    plain ``field:value`` predicates become pushed column filters.
    """

    def __init__(self, collections: dict[str, DataFrame],
                 text_search=None, writers: dict | None = None,
                 mlt=None, chroot: str | None = None,
                 postings=None, jdbc_reader=None):
        self.collections = collections
        self.text_search = text_search
        self.writers = writers or {}
        self.mlt = mlt
        self.chroot = chroot
        # (collection, field) -> postings DataFrame (term, docid) —
        # the features()/train() streams' term statistics source,
        # plugged by the caller like text_search/mlt
        self.postings = postings
        # connection-spec -> DataFrame; the JDBCStream face. The
        # default raises (no JDBC driver ships in this engine);
        # callers inject spark.read.jdbc or a test double.
        self.jdbc_reader = jdbc_reader

    # -- q handling ----------------------------------------------------------

    def _apply_q(self, coll: str, df: DataFrame, q: str) -> DataFrame:
        q = q.strip()
        if not q or q == "*:*":
            return df
        fld, _, rhs = q.partition(":")
        fld, rhs = fld.strip(), rhs.strip().strip('"')
        if fld == "text" and self.text_search is not None:
            ids = self.text_search(coll, rhs)
            key = ids.columns[0]
            return df.join(ids, df[df.columns[0]] == ids[key],
                           "left_semi") if key not in df.columns \
                else df.join(ids, key, "left_semi")
        if re.match(r"^\[.* TO .*\]$", rhs):
            lo, hi = rhs[1:-1].split(" TO ")
            c = F.col(fld)
            cond = None
            if lo.strip() != "*":
                cond = c >= float(lo)
            if hi.strip() != "*":
                hc = c <= float(hi)
                cond = hc if cond is None else (cond & hc)
            return df if cond is None else df.filter(cond)
        return df.filter(F.col(fld) == rhs)

    # -- combinators ---------------------------------------------------------

    def eval(self, e) -> DataFrame:
        if isinstance(e, str):
            e = parse_stream(e)
        fn = getattr(self, f"_s_{e.name}", None)
        if fn is None:
            raise ValueError(f"unknown stream function {e.name!r}")
        return fn(e)

    def _streams(self, e: StreamExpr) -> list[DataFrame]:
        return [self.eval(a) for a in e.args if isinstance(a, StreamExpr)
                and a.name not in _NON_STREAM_FNS]

    # -- Lang.java alias registrations (same classes, second names) ----------

    def _s_export(self, e: StreamExpr) -> DataFrame:
        # Lang.java:84 registers both "shuffle" and "export" to
        # ShuffleStream (the /export handler face)
        return self._s_shuffle(e)

    def _s_gatherNodes(self, e: StreamExpr) -> DataFrame:
        # Lang.java registers gatherNodes + nodes to GatherNodesStream
        return self._s_nodes(e)

    def _s_knnSearch(self, e: StreamExpr) -> DataFrame:
        # Lang.java maps knnSearch -> KnnStream (MoreLikeThis knn)
        return self._s_knn(e)

    def _s_stream(self, e: StreamExpr) -> DataFrame:
        # Lang.java maps stream -> GetStream: replay a let-bound
        # stream cell, identical to get()
        return self._s_get(e)

    def _s_search(self, e: StreamExpr) -> DataFrame:
        coll = e.args[0]
        df = self.collections[coll]
        df = self._apply_q(coll, df, e.params.get("q", "*:*"))
        if "fl" in e.params:
            df = df.select(*[c.strip()
                             for c in e.params["fl"].split(",")])
        if "sort" in e.params:
            df = df.orderBy(*_sort_cols(e.params["sort"]))
        return df

    def _s_innerJoin(self, e: StreamExpr, how: str = "inner",
                     broadcast_right: bool = False) -> DataFrame:
        if "hashed" in e.params:
            # the reference's hashJoin/outerHashJoin spelling:
            # hashJoin(full, hashed=stream, on=...) — the hashed side
            # is the in-memory (broadcast) side by definition
            (left,) = self._streams(e)
            right = self.eval(parse_stream(e.params["hashed"]))
            broadcast_right = True
        else:
            left, right = self._streams(e)
        on = e.params["on"]
        lk, _, rk = on.partition("=")
        lk, rk = lk.strip(), rk.strip() or lk.strip()
        if rk != lk:
            right = right.withColumnRenamed(rk, lk)
        if broadcast_right:
            right = F.broadcast(right)
        return left.join(right, lk, how)

    def _s_hashJoin(self, e: StreamExpr) -> DataFrame:
        return self._s_innerJoin(e, broadcast_right=True)

    def _s_leftOuterJoin(self, e: StreamExpr) -> DataFrame:
        return self._s_innerJoin(e, how="left")

    def _s_outerHashJoin(self, e: StreamExpr) -> DataFrame:
        """OuterHashJoinStream (solrj/io/stream/OuterHashJoinStream
        .java:48): left outer with the hashed (right) side held in
        memory — the broadcast-hash-join face of the reference's
        HashMap<String, List<Tuple>>; unmatched full-stream tuples
        pass through unmerged."""
        return self._s_innerJoin(e, how="left", broadcast_right=True)

    def _s_rollup(self, e: StreamExpr) -> DataFrame:
        (src,) = self._streams(e)
        over = [c.strip() for c in e.params["over"].split(",")]
        aggs = [_agg_col(a) for a in e.args
                if isinstance(a, StreamExpr) and a.name in _AGG_FNS]
        return src.groupBy(*over).agg(*aggs)

    def _s_unique(self, e: StreamExpr) -> DataFrame:
        (src,) = self._streams(e)
        over = [c.strip() for c in e.params["over"].split(",")]
        return src.select(*over).distinct()

    def _s_top(self, e: StreamExpr) -> DataFrame:
        (src,) = self._streams(e)
        n = int(e.params["n"])
        return src.orderBy(*_sort_cols(e.params["sort"])).limit(n)

    def _s_merge(self, e: StreamExpr) -> DataFrame:
        a, b = self._streams(e)
        return a.unionByName(b).orderBy(*_sort_cols(e.params["on"]))

    def _s_select(self, e: StreamExpr) -> DataFrame:
        """SelectStream (solrj/io/stream/SelectStream.java) including
        evaluator operands (the solrj/io/eval RecursiveEvaluator
        family — Add/Subtract/Multiply/Divide/Modulo/AbsoluteValue/
        NaturalLog/Power/SquareRoot/GreaterThan/.../IfThenElse/And/Or/
        Not Evaluator.java): ``select(s, f, add(a,b) as c, ...)``.
        Every evaluator compiles to the equivalent Catalyst expression
        — whole-stage codegen, never a per-tuple interpreter."""
        src = None
        cols = []
        rops = []           # (target field, replace node), post-select
        recs = []           # recNum() aliases, post-select windows
        for a in e.args:
            if isinstance(a, StreamExpr) and a.name == "replace":
                # bare 3-operand form: replace(field, orig, withX=...)
                if len(a.args) < 2:
                    raise ValueError("replace() needs (field, "
                                     "original) operands")
                rops.append((a.args[0], a.args[1], a.params))
                continue
            if isinstance(a, StreamExpr):
                src = self.eval(a)
                continue
            if " as " in a and a.lstrip().startswith("replace("):
                # aliased 2-operand form: replace(orig, withX=..) as f
                expr_txt, alias = a.rsplit(" as ", 1)
                rnode = parse_stream(expr_txt.strip())
                if len(rnode.args) != 1:
                    raise ValueError("replace(original, ...) as "
                                     "field needs 1 operand")
                rops.append((alias.strip(), rnode.args[0],
                             rnode.params))
                continue
            if " as " in a:
                expr_txt, alias = a.rsplit(" as ", 1)
                expr_txt, alias = expr_txt.strip(), alias.strip()
                if expr_txt == "recNum()":
                    # RecNumEvaluator.java:39 (++index): a 0-based
                    # record sequence. The reference counts arrival
                    # order; a distributed plan has none, so the
                    # sequence orders by ALL selected columns
                    # ascending (the group()/col() divergence
                    # contract). Global row_number = one single-
                    # partition sort — recNum is a global sequence by
                    # definition; at corpus scale use the 2-pass
                    # per-partition offset pattern (index/docids.py).
                    recs.append(alias)
                    continue
                if "(" in expr_txt:
                    with self._scoped(src.columns if src is not None
                                      else ()):
                        col = _as_col(self._eval_col(
                            parse_stream(expr_txt)))
                else:
                    col = F.col(expr_txt)
                cols.append(col.alias(alias))
            else:
                cols.append(F.col(a))
        out = src.select(*cols)
        for field, orig, params in rops:
            out = _apply_replace(out, field, orig, params)
        for alias in recs:
            w = Window.orderBy(
                *[F.col(c).asc() for c in out.columns])
            out = out.withColumn(
                alias, (F.row_number().over(w) - 1).cast("long"))
        return out

    # -- array math (the math-expressions guide surface) ---------------------

    @staticmethod
    def _mrows(x):
        """Unwrap a labeled _Mat to its data rows; bare
        array<array<double>> Columns pass through (Matrix.getData())."""
        return x.rows if isinstance(x, _Mat) else x

    @staticmethod
    def _arr_sum(c):
        return F.aggregate(c, F.lit(0.0),
                           lambda s, x: s + x.cast("double"))

    @classmethod
    def _arr_mean(cls, c):
        return cls._arr_sum(c) / F.size(c)

    @classmethod
    def _arr_var_sample(cls, c):
        """Sample variance (n-1), commons-math Variance default —
        from exact integer-safe sums so both engines fold
        order-independently."""
        n = F.size(c).cast("double")
        s = cls._arr_sum(c)
        ssq = F.aggregate(c, F.lit(0.0),
                          lambda a, x: a + x.cast("double")
                          * x.cast("double"))
        return (ssq - s * s / n) / (n - F.lit(1.0))

    @staticmethod
    def _arr_percentile(c, p):
        """commons-math3 Percentile LEGACY estimation
        (PercentileEvaluator.java:47): pos = p/100*(n+1) over the
        sorted values (1-indexed); < 1 -> min, >= n -> max, else
        linear interpolation between floor(pos) and floor(pos)+1."""
        s = F.sort_array(c)
        n = F.size(c)
        pos = F.lit(p / 100.0) * (n + F.lit(1)).cast("double")
        ip = F.floor(pos).cast("int")
        d = pos - F.floor(pos)
        lo = F.element_at(s, ip).cast("double")
        hi = F.element_at(s, ip + F.lit(1)).cast("double")
        return (F.when(n == 1, F.element_at(s, 1).cast("double"))
                .when(pos < 1, F.element_at(s, 1).cast("double"))
                .when(pos >= n.cast("double"),
                      F.element_at(s, n).cast("double"))
                .otherwise(lo + d * (hi - lo)))

    @contextmanager
    def _scoped(self, cols):
        """Bind the set of resolvable tuple fields for _eval_col's
        FieldValueEvaluator fallback (unknown bare identifier ->
        string literal). Case-insensitive like Catalyst resolution."""
        prev = getattr(self, "_scope_cols", None)
        self._scope_cols = {c.lower() for c in cols}
        try:
            yield
        finally:
            self._scope_cols = prev

    def _eval_col(self, node):
        """solrj/io/eval evaluator tree -> Catalyst Column."""
        if isinstance(node, str):
            if re.match(r"^-?\d+$", node):
                return F.lit(int(node))
            if re.match(r"^-?\d*\.\d+$", node):
                return F.lit(float(node))
            if node in ("true", "false"):
                return F.lit(node == "true")
            vfc = getattr(self, "_vfunc_cells", {})
            if node in vfc:
                # a let-bound model cell — rebuild the _VFunc over
                # its broadcast attribute triple (one materialized
                # fit, attribute-sized consumer trees)
                cfc = F.col(f"{node}__vcf")
                return _VFunc(
                    vfc[node], F.col(f"{node}__vfit"),
                    lx=F.col(f"{node}__vlx"), coefs=cfc,
                    ctx=({"amplitude": F.get(cfc, 0),
                          "angularFrequency": F.get(cfc, 1),
                          "phase": F.get(cfc, 2)}
                         if vfc[node] == "harm" else None))
            mc = getattr(self, "_mat_cells", {})
            if node in mc:
                # a let-bound labeled matrix — rebuild the _Mat over
                # its broadcast column bundle (one materialized
                # matrix, N consumers)
                return _Mat(F.col(f"{node}__mrows"),
                            rlab=F.col(f"{node}__mrlab"),
                            clab=F.col(f"{node}__mclab"),
                            attrs={k: F.col(f"{node}__ma_{k}")
                                   for k in mc[node]})
            mcv = getattr(self, "_mc_vars", None)
            if mcv and node in mcv:
                # a monteCarlo iteration variable — the per-
                # iteration draw bound by MonteCarloEvaluator's
                # populateVariables
                return mcv[node]
            cc = getattr(self, "_obj_cells", {})
            if node in cc:
                # a let-bound blob object — one materialized blob,
                # N accessor consumers
                kind, meta = cc[node]
                blob = F.col(f"{node}__cblob")
                if kind == "clus":
                    return _Clus(blob, fuzzy=meta)
                if kind == "ols":
                    return _Ols(blob)
                if kind == "bif":
                    return _BiFunc(blob["xs"], blob["ys"],
                                   blob["grid"])
                return (_Hull if kind == "hull" else _Ball)(blob)
            scope = getattr(self, "_scope_cols", None)
            if (scope is not None
                    and re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", node)
                    and node.lower() not in scope):
                # FieldValueEvaluator.java:120 — a field name absent
                # from the tuple evaluates to the name itself as a
                # raw string (how array(a, b, c) spells out string
                # labels in the reference's expressions)
                return F.lit(node)
            return F.col(node)
        a = [self._eval_col(x) for x in node.args]
        fn = node.name
        if fn == "add":
            out = a[0]
            for x in a[1:]:
                out = out + x
            return out
        if fn == "sub":
            return a[0] - a[1]
        if fn == "mult":
            out = a[0]
            for x in a[1:]:
                out = out * x
            return out
        if fn == "div":
            # DivideEvaluator promotes to double
            return a[0].cast("double") / a[1]
        if fn == "mod":
            return a[0] % a[1]
        if fn == "abs":
            return F.abs(a[0])
        if fn == "log":
            return F.log(a[0])              # natural log
        if fn == "pow":
            return F.pow(a[0], a[1])
        if fn == "sqrt":
            return F.sqrt(a[0])
        if fn == "gt":
            return a[0] > a[1]
        if fn == "gteq":
            return a[0] >= a[1]
        if fn == "lt":
            return a[0] < a[1]
        if fn == "lteq":
            return a[0] <= a[1]
        if fn == "eq":
            return a[0] == a[1]
        if fn == "and":
            return a[0] & a[1]
        if fn == "or":
            return a[0] | a[1]
        if fn == "not":
            return ~a[0]
        if fn == "if":
            return F.when(a[0], a[1]).otherwise(a[2])
        # -- temporal evaluators (solrj/io/eval/
        # RecursiveTemporalEvaluator.java + TemporalEvaluator{Year,
        # Month,Day,DayOfYear,DayOfQuarter,Quarter,Week,Hour,Minute,
        # Second,Epoch}.java; Lang.java registers the lowercase
        # field-accessor names). Each extracts a UTC date part from a
        # timestamp (or ISO-8601 string — cast handles both); the
        # engine runs with spark.sql.session.timeZone=UTC so the
        # parts match java.time's LocalDateTime view. Scalar fields
        # only (the reference's list recursion is the bounded col()
        # cell path)."""
        if fn in ("year", "month", "day", "dayOfYear", "dayOfQuarter",
                  "quarter", "week", "hour", "minute", "second",
                  "epoch"):
            ts = a[0].cast("timestamp")
            part = {
                "year": lambda: F.year(ts),
                "month": lambda: F.month(ts),
                "day": lambda: F.dayofmonth(ts),
                "dayOfYear": lambda: F.dayofyear(ts),
                # IsoFields.DAY_OF_QUARTER (1-based)
                "dayOfQuarter": lambda: (
                    F.dayofyear(ts)
                    - F.dayofyear(F.date_trunc("quarter", ts))
                    + F.lit(1)),
                "quarter": lambda: F.quarter(ts),
                # IsoFields.WEEK_OF_WEEK_BASED_YEAR == weekofyear
                "week": lambda: F.weekofyear(ts),
                "hour": lambda: F.hour(ts),
                "minute": lambda: F.minute(ts),
                "second": lambda: F.second(ts),
                # TemporalEvaluatorEpoch.java:42 — UTC millis
                "epoch": lambda: F.unix_millis(ts),
            }[fn]()
            return part.cast("long")
        if fn == "analyze":
            # AnalyzeEvaluator (solr/core/src/java/org/apache/solr/
            # handler/AnalyzeEvaluator.java:53 — run the field's
            # analyzer over a value, return the token list; the math
            # guide pairs it with termVectors). The engine's shared
            # simple-analyzer chain as one codegen regexp — the
            # second (fieldName) operand selects the analyzer and is
            # accepted for parity (one analyzer here).
            from ..analysis.analyzers import _SIMPLE_RE
            return F.transform(
                F.regexp_extract_all(a[0], F.lit(str(_SIMPLE_RE)),
                                     F.lit(0)),
                lambda t: F.lower(t))
        # -- array evaluators (the math-expressions guide; each maps
        # to a Catalyst higher-order function — no driver lists, no
        # UDFs; the reference evaluates java.util.List driver-side) --
        if fn == "array":                # ArrayEvaluator.java
            return F.array(*a)
        if fn == "sequence":             # SequenceEvaluator: len,start,stride
            ln, st, sd = (int(node.args[i]) for i in range(3))
            return F.sequence(F.lit(st), F.lit(st + (ln - 1) * sd),
                              F.lit(sd))
        if fn == "length":               # LengthEvaluator
            return F.size(a[0]).cast("long")
        if fn == "rev":                  # ReverseEvaluator
            return F.reverse(a[0])
        if fn == "valueAt":              # ValueAtEvaluator.java:37 (0-based)
            return F.get(a[0], a[1])
        if fn == "mean":
            return self._arr_mean(a[0])
        if fn in ("variance", "var"):    # Lang.java:176 registers var
            return self._arr_var_sample(a[0])
        if fn == "double":               # DoubleEvaluator (Lang.java:296)
            # RecursiveNumericEvaluator: scalar -> double; a list
            # operand maps element-wise
            return (F.transform(a[0], lambda x: x.cast("double"))
                    if isinstance(node.args[0], StreamExpr)
                    and node.args[0].name in ("array", "sequence")
                    else a[0].cast("double"))
        if fn == "long":                 # LongEvaluator (Lang.java:297)
            return (F.transform(a[0], lambda x: x.cast("long"))
                    if isinstance(node.args[0], StreamExpr)
                    and node.args[0].name in ("array", "sequence")
                    else a[0].cast("long"))
        if fn == "stddev":
            return F.sqrt(self._arr_var_sample(a[0]))
        if fn == "percentile":           # PercentileEvaluator.java:47
            return self._arr_percentile(a[0], float(node.args[1]))
        if fn == "movingAvg":            # MovingAverageEvaluator.java:54
            w = int(node.args[1])
            idx = F.sequence(F.lit(1), F.size(a[0]) - F.lit(w - 1))
            arr = a[0]
            return F.transform(
                idx, lambda i: self._arr_sum(F.slice(arr, i, w)) / w)
        if fn == "movingMedian":         # MovingMedianEvaluator.java:37
            # sliding window of the LAST w values; once full, the
            # commons-math LEGACY percentile-50 of the window (the
            # same interpolation _arr_percentile already pins) —
            # output length n-w+1, matching DescriptiveStatistics'
            # ramp-up suppression. The source array is staged through
            # array_repeat (child evaluated ONCE) so the interpreted
            # HOF doesn't rebuild it per window.
            w = int(node.args[1])
            arr = a[0]
            idx = F.sequence(F.lit(1), F.size(arr) - F.lit(w - 1))
            reps = F.array_repeat(arr, F.size(arr) - F.lit(w - 1))
            return F.zip_with(
                idx, reps,
                lambda i, s: self._arr_percentile(F.slice(s, i, w),
                                                  50))
        if fn == "movingMAD":            # MovingMADEvaluator.java:36
            # mean absolute deviation around the window mean. The
            # reference folds |d - S/w|; here each term is the exact
            # integer |w*d - S| with ONE final division by w^2 —
            # algebraically equal, cross-engine stable (documented
            # few-ulp divergence from the reference's fold). Source
            # staged via array_repeat like movingMedian.
            w = int(node.args[1])
            arr = a[0]
            idx = F.sequence(F.lit(1), F.size(arr) - F.lit(w - 1))
            reps = F.array_repeat(arr, F.size(arr) - F.lit(w - 1))

            def mad(i, srep):
                win = F.slice(srep, i, w)
                s = self._arr_sum(win)
                return self._arr_sum(F.transform(
                    win,
                    lambda d: F.abs(d.cast("double") * w - s))
                ) / F.lit(float(w * w))

            return F.zip_with(idx, reps, mad)
        if fn == "pairSort":             # PairSortEvaluator.java:37
            # sort (x,y) pairs by x then y; returns the 2-row matrix
            # [sorted x; y carried along] — array_sort on structs is
            # exactly the reference's PairComp lexicographic order
            pairs = F.array_sort(F.zip_with(
                a[0], a[1],
                lambda x, y: F.struct(x.cast("double").alias("a"),
                                      y.cast("double").alias("b"))))
            return F.array(F.transform(pairs, lambda p: p["a"]),
                           F.transform(pairs, lambda p: p["b"]))
        if fn == "finddelay":            # FindDelayEvaluator.java:40
            # argmax |conv(a, reverse(b))| with FIRST-max tie rule
            # (strict > scan), result (idx+1) - len(b)
            arr, brev = a[0], F.reverse(a[1])
            la, lb = F.size(arr), F.size(brev)
            ks = F.sequence(F.lit(1), la + lb - F.lit(1))
            conv = F.transform(ks, lambda k: self._arr_sum(
                F.transform(
                    F.sequence(F.greatest(F.lit(1), k - lb + F.lit(1)),
                               F.least(k, la)),
                    lambda i: F.element_at(arr, i).cast("double")
                    * F.element_at(brev, (k - i + F.lit(1))
                                   .cast("int")))))
            absconv = F.transform(conv, F.abs)
            first_max = F.array_position(absconv, F.array_max(absconv))
            return (first_max - lb).cast("double")
        if fn == "diff":                 # TimeDifferencingEvaluator.java:64
            lag = int(node.args[1]) if len(node.args) > 1 else 1
            n = F.size(a[0])
            return F.zip_with(
                F.slice(a[0], lag + 1, n - F.lit(lag)),
                F.slice(a[0], 1, n - F.lit(lag)),
                lambda x, y: x.cast("double") - y.cast("double"))
        if fn in ("ebeAdd", "ebeSubtract", "ebeMultiply", "ebeDivide"):
            op = {"ebeAdd": lambda x, y: x.cast("double") + y,
                  "ebeSubtract": lambda x, y: x.cast("double") - y,
                  "ebeMultiply": lambda x, y: x.cast("double") * y,
                  "ebeDivide": lambda x, y: x.cast("double") / y}[fn]
            return F.zip_with(a[0], a[1], op)
        if fn == "dotProduct":           # DotProductEvaluator
            return self._arr_sum(F.zip_with(
                a[0], a[1],
                lambda x, y: x.cast("double") * y.cast("double")))
        if fn == "cosineSimilarity":     # CosineSimilarityEvaluator
            dot = self._arr_sum(F.zip_with(
                a[0], a[1],
                lambda x, y: x.cast("double") * y.cast("double")))
            na = F.sqrt(self._arr_sum(F.zip_with(
                a[0], a[0],
                lambda x, y: x.cast("double") * y.cast("double"))))
            nb = F.sqrt(self._arr_sum(F.zip_with(
                a[1], a[1],
                lambda x, y: x.cast("double") * y.cast("double"))))
            return dot / (na * nb)
        if fn in ("zscores", "standardize"):  # NormalizeEvaluator —
            # Lang.java:135,266 registers BOTH names on the same class
            m = self._arr_mean(a[0])
            sd = F.sqrt(self._arr_var_sample(a[0]))
            return F.transform(a[0],
                               lambda x: (x.cast("double") - m) / sd)
        # -- statistical evaluators (solrj/io/eval) — all computed from
        # exact raw-moment sums (integer-valued doubles fold exactly in
        # any order) with fixed textual formula shapes mirrored verbatim
        # by the DuckDB oracle, so both engines perform the identical
        # IEEE operation sequence ----------------------------------------
        if fn == "cov":                  # CovarianceEvaluator.java —
            # commons-math Covariance, biasCorrected=true (n-1)
            n = F.size(a[0]).cast("double")
            sx, sy = self._arr_sum(a[0]), self._arr_sum(a[1])
            sxy = self._arr_sum(F.zip_with(
                a[0], a[1],
                lambda x, y: x.cast("double") * y.cast("double")))
            return (sxy - sx * sy / n) / (n - F.lit(1.0))
        if fn == "corr":                 # CorrelationEvaluator.java,
            # type=pearsons default: centered-sums Pearson (the n-1
            # bias corrections cancel)
            if node.params.get("type", "pearsons") != "pearsons":
                raise ValueError("corr: only type=pearsons supported")
            if len(a) == 1:
                # MATRIX form: columns are variables ->
                # k x k correlation matrix carrying the observation
                # count for corrPValues (the reference stashes the
                # PearsonsCorrelation object as the "corr" attribute)
                m = self._mrows(a[0])
                nn = F.size(m).cast("double")
                cols = F.transform(
                    F.sequence(F.lit(0),
                               F.size(F.get(m, 0)) - F.lit(1)),
                    lambda i: F.transform(m, lambda r: F.get(r, i)))
                # stage (cols, n) via array_repeat so the nested HOF
                # evaluates the transpose once per row
                k = F.size(cols)
                reps = F.array_repeat(
                    F.struct(cols.alias("c"), nn.alias("n")), k)

                def _pearson(ci, cj, nv):
                    sx = self._arr_sum(ci)
                    sy = self._arr_sum(cj)
                    sxx = self._arr_sum(F.zip_with(
                        ci, ci, lambda x, y: x.cast("double")
                        * y.cast("double")))
                    syy = self._arr_sum(F.zip_with(
                        cj, cj, lambda x, y: x.cast("double")
                        * y.cast("double")))
                    sxy = self._arr_sum(F.zip_with(
                        ci, cj, lambda x, y: x.cast("double")
                        * y.cast("double")))
                    return ((sxy - sx * sy / nv)
                            / (F.sqrt(sxx - sx * sx / nv)
                               * F.sqrt(syy - sy * sy / nv)))

                rows = F.zip_with(
                    F.sequence(F.lit(0), k - F.lit(1)), reps,
                    lambda i, s: F.transform(
                        s["c"],
                        lambda cj: _pearson(F.get(s["c"], i), cj,
                                            s["n"])))
                return _Mat(rows, attrs={"n": nn},
                            base=a[0].base
                            if isinstance(a[0], _Mat) else None)
            n = F.size(a[0]).cast("double")
            sx, sy = self._arr_sum(a[0]), self._arr_sum(a[1])
            sxx = self._arr_sum(F.zip_with(
                a[0], a[0],
                lambda x, y: x.cast("double") * y.cast("double")))
            syy = self._arr_sum(F.zip_with(
                a[1], a[1],
                lambda x, y: x.cast("double") * y.cast("double")))
            sxy = self._arr_sum(F.zip_with(
                a[0], a[1],
                lambda x, y: x.cast("double") * y.cast("double")))
            return ((sxy - sx * sy / n)
                    / (F.sqrt(sxx - sx * sx / n)
                       * F.sqrt(syy - sy * sy / n)))
        if fn == "regress":              # RegressionEvaluator.java —
            # commons-math SimpleRegression OLS; emits the tuple fields
            # the reference maps (slope/intercept/R/N/RSquared/
            # totalSumSquares/regressionSumSquares/meanSquareError)
            n = F.size(a[0]).cast("double")
            sx, sy = self._arr_sum(a[0]), self._arr_sum(a[1])
            sxx = self._arr_sum(F.zip_with(
                a[0], a[0],
                lambda x, y: x.cast("double") * y.cast("double")))
            syy = self._arr_sum(F.zip_with(
                a[1], a[1],
                lambda x, y: x.cast("double") * y.cast("double")))
            sxy = self._arr_sum(F.zip_with(
                a[0], a[1],
                lambda x, y: x.cast("double") * y.cast("double")))
            cxx = sxx - sx * sx / n
            cyy = syy - sy * sy / n
            cxy = sxy - sx * sy / n
            slope = cxy / cxx
            icept = sy / n - slope * (sx / n)
            ssr = slope * cxy
            r2 = slope * cxy / cyy
            return F.struct(
                slope.alias("slope"), icept.alias("intercept"),
                (F.when(slope < 0, -F.sqrt(r2))
                 .otherwise(F.sqrt(r2))).alias("R"),
                F.size(a[0]).cast("long").alias("N"),
                r2.alias("RSquared"),
                cyy.alias("totalSumSquares"),
                ssr.alias("regressionSumSquares"),
                ((cyy - slope * cxy) / (n - F.lit(2.0)))
                .alias("meanSquareError"))
        if fn == "predict":              # PredictEvaluator.java over a
            # regress() tuple, a lerp() interpolator or a knnRegress()
            # model: scalar for a numeric literal, element-wise for an
            # array operand (the reference dispatches on runtime type;
            # here on the operand's syntactic shape)
            model = node.args[0]
            kind = model.name if isinstance(model, StreamExpr) else ""
            lit = (isinstance(node.args[1], str)
                   and re.match(r"^-?\d+(\.\d+)?$", node.args[1]))

            if isinstance(a[0], _BiFunc):
                # BivariateFunction.value(x, y): spline across y in
                # each grid row at y*, then across x (see _BiFunc)
                if len(a) != 3:
                    raise ValueError("predict: a bicubicSpline "
                                     "model takes (x, y)")
                b = a[0]
                zx, zy = _d(a[1]), _d(a[2])

                def _sp_val(lx, lyv, z):
                    vf = _VFunc("pp", None, lx=lx,
                                coefs=self._spline_coefs(lx, lyv))
                    return self._vf_value(vf, z)

                gcol = F.transform(
                    b.grid, lambda r: _sp_val(b.ys, r, zy))
                return _let1(gcol,
                             lambda g: _sp_val(b.xs, g, zx))
            if isinstance(a[0], _Ols):
                # MultipleRegressionTuple.predict (OLSRegression-
                # Evaluator.java:105): beta0 + sum(beta[i+1] *
                # x[i]); a vector operand -> one prediction, a
                # matrix operand -> per-row predictions
                beta = a[0].tup["regressionParameters"]

                def _pred(vec):
                    return F.get(beta, 0) + self._arr_sum(F.zip_with(
                        vec, F.slice(beta, 2, F.size(beta) - 1),
                        lambda x, b: x.cast("double") * b))

                if (isinstance(node.args[1], StreamExpr)
                        and node.args[1].name == "matrix") \
                        or isinstance(a[1], _Mat):
                    return F.transform(self._mrows(a[1]), _pred)
                return _pred(a[1])
            if isinstance(a[0], _VFunc):
                # PredictEvaluator over a VectorFunction —
                # func.value(z). Piecewise evaluation clamps to the
                # outermost segment (the reference's
                # PolynomialSplineFunction throws OutOfRangeException
                # outside [x0, xn] — documented divergence, same as
                # the round-3w lerp precedent); polyfit's global
                # polynomial extrapolates like the reference.
                vf = a[0]
                if lit:
                    return self._vf_value(vf, a[1].cast("double"))
                return F.transform(
                    a[1],
                    lambda t: self._vf_value(vf, t.cast("double")))
            if kind == "knnRegress":
                # KnnRegressionEvaluator.java — mean y of the k
                # nearest x knots by |x - z|; ties sort by (distance,
                # y) ascending (the reference keeps first-found order
                # — documented tie divergence). Bounded-cell op.
                m = a[0]
                k = int(model.args[2]) if len(model.args) > 2 else 3

                def _knn(z):
                    pairs = F.zip_with(
                        m["lx"], m["ly"],
                        lambda xv, yv: F.struct(
                            F.abs(xv.cast("double") - z).alias("d"),
                            yv.cast("double").alias("y")))
                    top = F.slice(F.sort_array(pairs), 1, k)
                    return F.aggregate(
                        top, F.lit(0.0),
                        lambda acc, p: acc + p["y"]) / F.lit(float(k))

                if lit:
                    return _knn(a[1].cast("double"))
                return F.transform(
                    a[1], lambda t: _knn(t.cast("double")))
            reg = a[0]
            if lit:
                return reg["intercept"] + reg["slope"] * a[1]
            return F.transform(
                a[1], lambda x: reg["intercept"]
                + reg["slope"] * x.cast("double"))
        if fn == "knnRegress":           # model leaf for predict()
            ys = a[1] if len(a) > 1 else a[0]
            xs = (a[0] if len(a) > 1 else
                  F.transform(F.sequence(F.lit(0), F.size(a[0])
                                         - F.lit(1)),
                              lambda i: i.cast("double")))
            return F.struct(xs.alias("lx"), ys.alias("ly"))
        if fn == "getValue":             # GetValueEvaluator.java:44 —
            # pull one field of a tuple: a let-bound tuple CELL
            # (injected as {name}__t_{field} broadcast columns) or an
            # evaluator struct-tuple (regress/describe)
            if isinstance(node.args[0], str):
                nm = node.args[0]
                if nm in getattr(self, "_tuple_cells", set()):
                    return F.col(f"{nm}__t_{node.args[1]}")
                if nm in getattr(self, "_lets", {}) \
                        and nm not in getattr(self, "_value_cells",
                                              set()) \
                        and getattr(self, "_obj_cells",
                                    {}).get(nm, ("",))[0] != "ols":
                    # a STREAM cell (multi-row) — not addressable as
                    # a tuple; value cells (and regression tuples)
                    # fall through to getItem
                    raise ValueError(f"getValue({nm!r}): not a bound "
                                     "tuple cell")
            a0 = a[0].tup if isinstance(a[0], _Ols) else a[0]
            return a0[str(node.args[1])]
        if fn == "expMovingAvg":         # ExponentialMovingAverage-
            # Evaluator.java: seed = mean of the first w observations,
            # then ema = alpha*(x - last) + last over the remainder;
            # alpha defaults to 2/(w+1). Sequential left fold — the
            # oracle replays the identical recurrence in a recursive
            # CTE, so the op order (hence every rounding) matches.
            w = int(node.args[1])
            alpha = (float(node.args[2]) if len(node.args) > 2
                     else 2.0 / (w + 1.0))
            arr = a[0]
            seed = self._arr_sum(F.slice(arr, 1, w)) / w
            rest = F.slice(arr, F.lit(w + 1),
                           F.greatest(F.size(arr) - F.lit(w), F.lit(0)))
            return F.aggregate(
                rest, F.array(seed),
                lambda acc, x: F.concat(acc, F.array(
                    F.lit(alpha)
                    * (x.cast("double") - F.element_at(acc, -1))
                    + F.element_at(acc, -1))))
        if fn == "freqTable":            # FrequencyTableEvaluator.java
            # — commons-math Frequency over longValue()s, ascending
            # value order; pct/cumPct are proportions in [0,1]
            arr = F.transform(a[0], lambda x: x.cast("long"))
            vals = F.array_sort(F.array_distinct(arr))
            n = F.size(arr).cast("double")
            return F.transform(vals, lambda v: F.struct(
                v.alias("value"),
                F.size(F.filter(arr, lambda x: x == v))
                .cast("long").alias("count"),
                F.size(F.filter(arr, lambda x: x <= v))
                .cast("long").alias("cumFreq"),
                (F.size(F.filter(arr, lambda x: x <= v)) / n)
                .alias("cumPct"),
                (F.size(F.filter(arr, lambda x: x == v)) / n)
                .alias("pct")))
        if fn == "describe":             # DescribeEvaluator.java —
            # commons-math DescriptiveStatistics summary; skewness and
            # kurtosis per Skewness.java / Kurtosis.java (bias-
            # corrected), central moments expanded from raw sums
            arr = F.transform(a[0], lambda x: x.cast("double"))
            n = F.size(arr).cast("double")
            s = self._arr_sum(arr)
            ssq = F.aggregate(arr, F.lit(0.0), lambda c, x: c + x * x)
            scb = F.aggregate(arr, F.lit(0.0),
                              lambda c, x: c + x * x * x)
            sq4 = F.aggregate(arr, F.lit(0.0),
                              lambda c, x: c + x * x * x * x)
            m = s / n
            var = (ssq - s * s / n) / (n - F.lit(1.0))
            sd = F.sqrt(var)
            m3 = scb - F.lit(3.0) * m * ssq + F.lit(2.0) * n * m * m * m
            m4 = (sq4 - F.lit(4.0) * m * scb
                  + F.lit(6.0) * m * m * ssq
                  - F.lit(3.0) * n * m * m * m * m)
            skew = (n / ((n - F.lit(1.0)) * (n - F.lit(2.0)))
                    * m3 / (sd * sd * sd))
            kurt = ((n * (n + F.lit(1.0))
                     / ((n - F.lit(1.0)) * (n - F.lit(2.0))
                        * (n - F.lit(3.0)))) * m4 / (var * var)
                    - (F.lit(3.0) * (n - F.lit(1.0))
                       * (n - F.lit(1.0)))
                    / ((n - F.lit(2.0)) * (n - F.lit(3.0))))
            gmean = F.exp(F.aggregate(
                arr, F.lit(0.0), lambda c, x: c + F.log(x)) / n)
            return F.struct(
                F.array_max(arr).alias("max"), m.alias("mean"),
                F.array_min(arr).alias("min"), sd.alias("stdev"),
                s.alias("sum"), F.size(arr).cast("long").alias("N"),
                var.alias("var"), kurt.alias("kurtosis"),
                skew.alias("skewness"),
                ((ssq - s * s / n) / n).alias("popVar"),
                gmean.alias("geometricMean"), ssq.alias("sumsq"))
        # -- matrix / normalization evaluators (solrj/io/eval) — the
        # math-expressions matrix surface. A matrix is an
        # array<array<double>> value; every operator is a Catalyst
        # higher-order function over the bounded cell (the reference
        # materializes double[][] on the driver) ---------------------------
        if fn == "matrix":               # MatrixEvaluator.java — rows
            return F.array(*a)
        if fn == "pivot":                # PivotEvaluator.java:45 —
            # pivot(tupleListCell, x, y, value): a list of tuples to
            # a labeled matrix. x/y labels are TreeSet-ordered
            # (sorted distinct strings); duplicate (x,y) pairs keep
            # the LAST tuple's value (the reference's data[xi][yi]
            # overwrite in list order; our cells are sorted-struct
            # arrays, so "last" = the lexicographically-largest
            # tuple — deterministic on both engines, documented
            # divergence from arrival order). Missing cells are 0.0.
            # O(|x|*|y|*|t|) interpreted HOF — bounded by the cell
            # contract (pivot belongs on aggregated cells).
            t = self._mrows(a[0])
            x, y, v = (str(node.args[i]) for i in (1, 2, 3))
            xs = F.array_sort(F.array_distinct(F.transform(
                t, lambda s: s[x].cast("string"))))
            ys = F.array_sort(F.array_distinct(F.transform(
                t, lambda s: s[y].cast("string"))))
            # stage the tuple list via array_repeat so the
            # interpreted HOF evaluates the child once per row, not
            # once per (row, col) pair
            treps = F.array_repeat(t, F.size(xs))

            def _row(xl, trep):
                return F.transform(ys, lambda yl: F.coalesce(
                    F.try_element_at(
                        F.filter(trep,
                                 lambda s: (s[x].cast("string") == xl)
                                 & (s[y].cast("string") == yl)),
                        F.lit(-1))[v].cast("double"),
                    F.lit(0.0)))

            return _Mat(F.zip_with(xs, treps, _row), rlab=xs, clab=ys)
        if fn in ("kmeans", "multiKmeans", "fuzzyKmeans", "dbscan"):
            # Kmeans/MultiKmeans/FuzzyKmeans/DbscanEvaluator.java —
            # see _cluster_blob for the determinism contract
            m = a[0]
            rows = self._mrows(m)
            ids = (m.rlab if isinstance(m, _Mat)
                   and m.rlab is not None
                   else F.lit(None).cast("array<string>"))
            base = m.base if isinstance(m, _Mat) else None
            max_iter = int(node.params.get("maxIterations", 1000))
            if fn == "dbscan":
                if len(node.args) > 3:
                    mk = node.args[3]
                    if not (isinstance(mk, StreamExpr)
                            and mk.name == "euclidean"):
                        raise ValueError(
                            "dbscan: only the euclidean distance "
                            "measure is implemented (the commons-"
                            "math default)")
                blob = _cluster_blob(rows, ids, "dbscan", 0, 0, 1,
                                     0.0, float(node.args[1]),
                                     int(node.args[2]))
                return _Clus(blob, base=base)
            kk = int(node.args[1])
            if fn == "fuzzyKmeans":
                fz = float(node.params.get("fuzziness", 1.2))
                blob = _cluster_blob(rows, ids, "fuzzy", kk,
                                     max_iter, 1, fz, 0.0, 0)
                return _Clus(blob, fuzzy=True, base=base)
            tr = (int(node.args[2]) if fn == "multiKmeans" else 1)
            blob = _cluster_blob(rows, ids,
                                 "multi" if fn == "multiKmeans"
                                 else "kmeans",
                                 kk, max_iter, tr, 0.0, 0.0, 0)
            return _Clus(blob, base=base)
        if fn == "corrPValues":
            # CorrelationSignificanceEvaluator.java:44 — two-tailed
            # t-test p-values of a corr() matrix (needs the
            # observation count the corr matrix carries; Pearsons
            # only, like the reference)
            m = a[0]
            if not isinstance(m, _Mat) or "n" not in m.attrs:
                raise ValueError("corrPValues: operand must be a "
                                 "corr() matrix (Pearsons)")
            return _Mat(_corr_pvalues_blob(m.rows, m.attrs["n"]),
                        base=m.base)
        if fn == "olsRegress":           # OLSRegressionEvaluator:40
            m = a[0]
            return _Ols(_ols_blob(self._mrows(m), a[1]),
                        base=m.base if isinstance(m, _Mat) else None)
        if fn == "markovChain":          # MarkovChainEvaluator.java:58
            if len(node.args) < 2:
                raise ValueError(
                    "markovChain: the engine requires the explicit "
                    "initial-state operand (the reference seeds "
                    "with new Random() — nondeterministic)")
            return _Markov(self._mrows(a[0]), int(node.args[1]))
        if fn == "monteCarlo":
            # MonteCarloEvaluator.java:75 — per iteration re-draw
            # every named variable (each compile of sample(...)
            # yields an independent rand()) and evaluate the
            # function; returns the iteration results array. Random
            # by contract like sample() — law-pinned, excluded from
            # oracle rows.
            if len(node.args) != 2:
                raise ValueError("monteCarlo needs (function, "
                                 "iterations) plus named variables")
            it = int(node.args[1])
            prev_mc = getattr(self, "_mc_vars", None)
            draws = []
            try:
                for _i in range(it):
                    self._mc_vars = {
                        nm: _as_col(self._eval_col(
                            parse_stream(txt)
                            if _NAME_RE.match(txt) else txt))
                        for nm, txt in node.params.items()}
                    draws.append(_as_col(self._eval_col(
                        node.args[0])).cast("double"))
            finally:
                self._mc_vars = prev_mc
            return F.array(*draws)
        if fn == "convexHull":           # ConvexHullEvaluator.java:40
            m = a[0]
            return _Hull(_hull_blob(self._mrows(m)),
                         base=m.base if isinstance(m, _Mat) else None)
        if fn == "getVertices":          # GetVerticesEvaluator.java
            h = a[0]
            if not isinstance(h, _Hull):
                raise ValueError("getVertices: operand must be a "
                                 "convexHull result")
            return _Mat(h.blob["verts"], base=h.base)
        if fn == "getBaryCenter":        # GetBaryCenterEvaluator.java
            h = a[0]
            if not isinstance(h, _Hull):
                raise ValueError("getBaryCenter: operand must be a "
                                 "convexHull result")
            return h.blob["bary"]
        if fn == "getArea":              # GetAreaEvaluator.java —
            # Region.getSize() of the hull polygon = its area
            h = a[0]
            if not isinstance(h, _Hull):
                raise ValueError("getArea: operand must be a "
                                 "convexHull result")
            return h.blob["area"]
        if fn == "getBoundarySize":      # GetBoundarySizeEvaluator —
            # the hull perimeter
            h = a[0]
            if not isinstance(h, _Hull):
                raise ValueError("getBoundarySize: operand must be "
                                 "a convexHull result")
            return h.blob["boundary"]
        if fn == "projectToBorder":      # ProjectToBorderEvaluator:47
            h, m = a[0], a[1]
            if not isinstance(h, _Hull):
                raise ValueError("projectToBorder: first operand "
                                 "must be a convexHull result")
            return _Mat(_project_border(h.blob["verts"],
                                        self._mrows(m)),
                        base=h.base)
        if fn == "enclosingDisk":        # EnclosingDiskEvaluator:40
            m = a[0]
            return _Ball(_disk_blob(self._mrows(m)),
                         base=m.base if isinstance(m, _Mat) else None)
        if fn == "getCenter":            # GetCenterEvaluator.java
            b = a[0]
            if not isinstance(b, _Ball):
                raise ValueError("getCenter: operand must be an "
                                 "enclosingDisk result")
            return b.blob["center"]
        if fn == "getRadius":            # GetRadiusEvaluator.java
            b = a[0]
            if not isinstance(b, _Ball):
                raise ValueError("getRadius: operand must be an "
                                 "enclosingDisk result")
            return b.blob["radius"]
        if fn == "getSupportPoints":     # GetSupportPointsEvaluator
            b = a[0]
            if not isinstance(b, _Ball):
                raise ValueError("getSupportPoints: operand must be "
                                 "an enclosingDisk result")
            return _Mat(b.blob["support"], base=b.base)
        if fn == "latlonVectors":        # LatLonVectorsEvaluator.java
            # :60 — tuples with a "lat,lon" (or "lat lon") string
            # field -> [lat, lon] rows; row labels from the id field;
            # column labels ["lat", "lon"]. Pure Catalyst split/cast
            # over the cell — no UDF.
            fld = node.params.get("field")
            if not fld:
                raise ValueError('latlonVectors: the named parameter '
                                 '"field" must be set')
            t = self._mrows(a[0])

            def _ll(s):
                raw = s[fld].cast("string")
                parts = (F.when(raw.contains(","),
                                F.split(raw, ","))
                         .otherwise(F.split(raw, " ")))
                return F.transform(
                    parts, lambda v: F.trim(v).cast("double"))

            rows = F.transform(t, _ll)
            ids = F.transform(t, lambda s: s["id"].cast("string"))
            return _Mat(rows, rlab=ids,
                        clab=F.array(F.lit("lat"), F.lit("lon")))
        if fn == "getCentroids":         # GetCentroidsEvaluator.java
            c = a[0]
            if not isinstance(c, _Clus):
                raise ValueError("getCentroids: operand must be a "
                                 "clustering result")
            return _Mat(c.blob["cents"], base=c.base)
        if fn == "getCluster":           # GetClusterEvaluator.java —
            # the i-th cluster's member points as a matrix with the
            # member row labels
            c = a[0]
            if not isinstance(c, _Clus):
                raise ValueError("getCluster: operand must be a "
                                 "clustering result")
            ci = a[1].cast("int")
            z = F.zip_with(
                F.zip_with(c.blob["pts"], c.blob["assign"],
                           lambda p, g: F.struct(p.alias("p"),
                                                 g.alias("g"))),
                c.blob["ids"],
                lambda s, d: F.struct(s["p"].alias("p"),
                                      s["g"].alias("g"),
                                      d.alias("id")))
            sel = F.filter(z, lambda s: s["g"] == ci)
            return _Mat(F.transform(sel, lambda s: s["p"]),
                        rlab=F.transform(sel, lambda s: s["id"]),
                        base=c.base)
        if fn == "getMembershipMatrix":  # GetMembershipMatrix-
            # Evaluator.java — fuzzyKmeans only, like the reference
            c = a[0]
            if not isinstance(c, _Clus) or not c.fuzzy:
                raise ValueError("getMembershipMatrix: operand must "
                                 "be a fuzzyKmeans result")
            return _Mat(c.blob["memb"], base=c.base)
        if fn in ("putCache", "getCache", "removeCache", "listCache"):
            # Put/Get/Remove/ListCacheEvaluator.java — the
            # StreamContext object cache: a {workspace: {key: value}}
            # map living for the evaluator's lifetime (the reference
            # scopes it to the Solr core's StreamContext). Values are
            # compiled Catalyst expressions — a putCache inside one
            # expression and a getCache in a later one replay the
            # SAME expression tree, so the cached object never
            # round-trips through the driver as data.
            if not hasattr(self, "_obj_cache"):
                self._obj_cache = {}
            cache = self._obj_cache
            if fn == "putCache":
                space, key = str(node.args[0]), str(node.args[1])
                cache.setdefault(space, {})[key] = a[2]
                return a[2]
            if fn == "getCache":
                space, key = str(node.args[0]), str(node.args[1])
                got = cache.get(space, {}).get(key)
                return got if got is not None else F.lit(None)
            if fn == "removeCache":
                space, key = str(node.args[0]), str(node.args[1])
                got = cache.get(space, {}).pop(key, None)
                return got if got is not None else F.lit(False)
            # listCache() -> workspace names; listCache(space) ->
            # keys. The reference returns ConcurrentHashMap
            # enumeration order; sorted here (documented divergence).
            keys = (sorted(cache.get(str(node.args[0]), {}))
                    if node.args else sorted(cache))
            if not keys:
                return F.expr("cast(array() as array<string>)")
            return F.array(*[F.lit(k) for k in keys])
        if fn == "transpose":            # TransposeEvaluator.java
            m = self._mrows(a[0])
            return F.transform(
                F.sequence(F.lit(0), F.size(F.get(m, 0)) - F.lit(1)),
                lambda i: F.transform(m, lambda r: F.get(r, i)))
        if fn == "rowAt":                # RowAtEvaluator.java (0-based)
            return F.get(self._mrows(a[0]), a[1])
        if fn == "columnAt":             # ColumnAtEvaluator.java
            m, i = self._mrows(a[0]), a[1]
            return F.transform(m, lambda r: F.get(r, i))
        if fn == "rowCount":             # RowCountEvaluator.java
            return F.size(self._mrows(a[0])).cast("long")
        if fn == "columnCount":          # ColumnCountEvaluator.java
            return F.size(F.get(self._mrows(a[0]), 0)).cast("long")
        if fn == "sumRows":              # SumRowsEvaluator.java
            return F.transform(self._mrows(a[0]),
                               lambda r: self._arr_sum(r))
        if fn == "sumColumns":           # SumColumnsEvaluator.java
            m = self._mrows(a[0])
            t = F.transform(
                F.sequence(F.lit(0), F.size(F.get(m, 0)) - F.lit(1)),
                lambda i: F.transform(m, lambda r: F.get(r, i)))
            return F.transform(t, lambda r: self._arr_sum(r))
        if fn == "grandSum":             # GrandSumEvaluator.java
            return self._arr_sum(
                F.transform(self._mrows(a[0]),
                            lambda r: self._arr_sum(r)))
        # -- labeled-matrix surface (solrj/io/eval Matrix.java labels
        # + attributes; Set/GetRowLabels, Set/GetColumnLabels,
        # GetAttribute(s)Evaluator.java; termVectors/topFeatures) ----
        if fn == "setRowLabels":         # SetRowLabelsEvaluator.java
            m = a[0] if isinstance(a[0], _Mat) else _Mat(a[0])
            lab = F.transform(a[1], lambda v: v.cast("string"))
            return _Mat(m.rows, rlab=lab, clab=m.clab,
                        attrs=m.attrs, base=m.base)
        if fn == "setColumnLabels":      # SetColumnLabelsEvaluator.java
            m = a[0] if isinstance(a[0], _Mat) else _Mat(a[0])
            lab = F.transform(a[1], lambda v: v.cast("string"))
            return _Mat(m.rows, rlab=m.rlab, clab=lab,
                        attrs=m.attrs, base=m.base)
        if fn in ("getRowLabels", "getColumnLabels"):
            # Get{Row,Column}LabelsEvaluator.java — error on a
            # label-less operand like the reference's null return
            # consumed downstream
            if not isinstance(a[0], _Mat):
                raise ValueError(f"{fn}() expects a labeled matrix")
            lab = a[0].rlab if fn == "getRowLabels" else a[0].clab
            if lab is None:
                raise ValueError(f"{fn}(): matrix has no labels")
            return lab
        if fn == "getAttribute":         # GetAttributeEvaluator.java
            if not isinstance(a[0], _Mat):
                raise ValueError("getAttribute() expects a matrix")
            key = node.args[1].strip('"')
            if key not in a[0].attrs:
                raise ValueError(f"getAttribute(): no attribute "
                                 f"{key!r}")
            return a[0].attrs[key]
        if fn == "getAttributes":        # GetAttributesEvaluator.java
            if not isinstance(a[0], _Mat):
                raise ValueError("getAttributes() expects a matrix")
            if not a[0].attrs:
                raise ValueError("getAttributes(): no attributes")
            return F.struct(*[c.alias(k)
                              for k, c in sorted(a[0].attrs.items())])
        if fn == "topFeatures":          # TopFeaturesEvaluator.java:40
            # per row: column labels of the top-k positive values —
            # TreeSet<Pair> pollLast order = value DESC then index
            # DESC on ties, exactly sort_array(struct(v,i), desc)
            if not isinstance(a[0], _Mat) or a[0].clab is None:
                raise ValueError("topFeatures() expects a matrix "
                                 "with column labels")
            m, k = a[0], int(node.args[1])
            clab = m.clab
            return F.transform(m.rows, lambda r: F.transform(
                F.slice(F.sort_array(F.filter(F.zip_with(
                    r, F.sequence(F.lit(0), F.size(r) - F.lit(1)),
                    lambda v, i: F.struct(v.alias("v"),
                                          i.alias("i"))),
                    lambda s: s["v"] > 0), asc=False), 1, k),
                lambda s: F.element_at(clab, s["i"] + F.lit(1))))
        if fn == "featureSelect":        # FeatureSelectEvaluator.java:33
            # keep the matrix columns whose label is in the feature
            # set, preserving the matrix's own column order; the
            # feature operand may be nested lists (topFeatures emits
            # one list per row — loadFeatures flattens recursively)
            m = a[0]
            if not isinstance(m, _Mat) or m.clab is None:
                raise ValueError("The featureSelect function expects "
                                 "a matrix with column labels")
            feats = a[1]
            fnode = node.args[1]
            nested = (isinstance(fnode, StreamExpr)
                      and fnode.name in ("topFeatures", "matrix"))
            if isinstance(fnode, str) \
                    and fnode in getattr(self, "_lets", {}) \
                    and fnode in getattr(self, "_value_cells", set()):
                # a let-bound cell: its relation's schema says
                # whether the value is a nested list (topFeatures
                # emits one list per row)
                from pyspark.sql.types import ArrayType
                dt = self._lets[fnode].schema[fnode].dataType
                nested = (isinstance(dt, ArrayType)
                          and isinstance(dt.elementType, ArrayType))
            if nested:
                feats = F.flatten(feats)
            feats = F.transform(feats, lambda v: v.cast("string"))
            clab = m.clab
            keep = F.filter(
                F.sequence(F.lit(0), F.size(clab) - F.lit(1)),
                lambda j: F.array_contains(
                    feats, F.element_at(clab, j + F.lit(1))))
            rows = F.transform(m.rows, lambda r: F.transform(
                keep, lambda j: F.element_at(r, j + F.lit(1))))
            nclab = F.transform(
                keep, lambda j: F.element_at(clab, j + F.lit(1)))
            return _Mat(rows, rlab=m.rlab, clab=nclab, base=m.base)
        if fn == "termVectors":          # TermVectorsEvaluator.java:73
            # tf-idf doc x term matrix over a bound let cell of
            # (id, terms) tuples: rowLabels = ids, columnLabels =
            # surviving terms in TreeMap (sorted) order, docFreqs
            # attribute; value = sqrt(tf) * (ln((n+1)/(df+1)) + 1).
            # The reference materializes the doc list on the driver;
            # here the bounded cell collapses to ONE aggregated row
            # and the whole construction is codegen array lambdas
            # over it (docs sort by id — the col() ordering contract).
            cells = getattr(self, "_lets", {})
            cname = node.args[0] if node.args else None
            if not isinstance(cname, str) or cname not in cells:
                raise ValueError("termVectors() expects a bound let "
                                 "cell of (id, terms) tuples")
            src = cells[cname]
            if "terms" not in src.columns or "id" not in src.columns:
                raise ValueError("The document tuples must contain "
                                 "id and terms fields")
            mtl = int(node.params.get("minTermLength", 3))
            mindf = float(node.params.get("minDocFreq", 0.05))
            maxdf = float(node.params.get("maxDocFreq", 0.5))
            if not (0 <= mindf <= 1) or not (0 <= maxdf <= 1):
                raise ValueError("Doc frequency percentage must be "
                                 "between 0 and 1")
            exc = [s for s in node.params.get("exclude", "").split(",")
                   if s]
            one = src.agg(F.sort_array(F.collect_list(F.struct(
                F.col("id").cast("string").alias("id"),
                F.col("terms").alias("terms")))).alias("_docs"))
            docs = F.col("_docs")
            n = F.size(docs)

            def _keep(t):
                c = F.length(t) >= F.lit(mtl)
                for e in exc:
                    c = c & ~t.contains(F.lit(e))
                return c

            dterms = F.transform(
                docs, lambda d: F.array_distinct(
                    F.filter(d["terms"], _keep)))
            allt = F.array_sort(F.array_distinct(F.flatten(dterms)))
            dfarr = F.transform(allt, lambda t: F.size(
                F.filter(dterms, lambda ts: F.array_contains(ts, t))))
            # (int)(n * minDocFreq) / (int)(n * maxDocFreq) — Java
            # int cast truncation (operands non-negative -> floor)
            mn = F.floor(n.cast("double") * F.lit(mindf)).cast("int")
            mx = F.floor(n.cast("double") * F.lit(maxdf)).cast("int")
            feats = F.filter(F.zip_with(allt, dfarr,
                                        lambda t, d: F.struct(
                                            t.alias("t"),
                                            d.alias("d"))),
                             lambda s: (s["d"] >= mn) & (s["d"] <= mx))
            rows = F.transform(docs, lambda d: F.transform(
                feats, lambda s: F.sqrt(
                    F.size(F.filter(d["terms"],
                                    lambda w: w == s["t"]))
                    .cast("double"))
                * (F.log((n + F.lit(1)).cast("double")
                         / (s["d"] + F.lit(1)).cast("double"))
                   + F.lit(1.0))))
            rlab = F.transform(docs, lambda d: d["id"])
            clab = F.transform(feats, lambda s: s["t"])
            return _Mat(rows, rlab=rlab, clab=clab,
                        attrs={"docFreqs": feats}, base=one)
        if fn == "scale":                # ScaleEvaluator.java —
            # commons-math MathArrays.scale(factor, arr); factor first
            return F.transform(
                a[1], lambda v: a[0] * v.cast("double"))
        if fn == "minMaxScale":          # MinMaxScaleEvaluator.java —
            # rescale to [lo, hi] (default [0,1]):
            # lo + (x - min) * (hi - lo) / (max - min)
            lo = a[1] if len(a) > 1 else F.lit(0.0)
            hi = a[2] if len(a) > 2 else F.lit(1.0)
            mn = F.array_min(a[0]).cast("double")
            mx = F.array_max(a[0]).cast("double")
            return F.transform(
                a[0], lambda v: lo + (v.cast("double") - mn)
                * (hi - lo) / (mx - mn))
        if fn == "unitize":              # UnitEvaluator.java — scale
            # to the unit vector x / ||x||
            nrm = F.sqrt(self._arr_sum(F.zip_with(
                a[0], a[0],
                lambda x, y: x.cast("double") * y.cast("double"))))
            return F.transform(a[0],
                               lambda v: v.cast("double") / nrm)
        if fn == "normalizeSum":         # NormalizeSumEvaluator.java —
            # scale to sum = 1 (a probability distribution)
            s = self._arr_sum(a[0])
            return F.transform(a[0], lambda v: v.cast("double") / s)
        if fn == "log10":                # Log10Evaluator.java —
            # element-wise over an array operand, scalar for a literal
            lit = (isinstance(node.args[0], str)
                   and re.match(r"^-?\d+(\.\d+)?$", node.args[0]))
            if lit:
                return F.log10(a[0])
            return F.transform(a[0],
                               lambda v: F.log10(v.cast("double")))
        if fn in ("manhattan", "canberra", "euclidean", "earthMovers",
                  "chebyshev", "cosine"):
            # distance-measure MARKERS (Manhattan/Canberra/Euclidean/
            # EarthMovers/Chebyshev/CosineDistanceEvaluator.java —
            # they construct the commons-math DistanceMeasure passed
            # to distance()/knn(); their own doWork is never called)
            if node.args:
                raise ValueError(f"{fn}() takes no arguments")
            return F.lit(fn)
        if fn == "distance":             # DistanceEvaluator.java over
            # two vectors; measure from a marker argument
            # (distance(a, b, manhattan()) — the reference pattern,
            # default EuclideanDistance) or the type= alias
            typ = next((x.name for x in node.args
                        if isinstance(x, StreamExpr)
                        and x.name in ("manhattan", "canberra",
                                       "euclidean", "earthMovers",
                                       "chebyshev", "cosine")),
                       node.params.get("type", "euclidean"))
            if typ == "cosine":          # CosineDistanceEvaluator
                # .java:56: Precision.round(1 - |cosineSimilarity|, 8)
                # — commons-math Precision.round is HALF_UP, same as
                # Spark ROUND
                dot = self._arr_sum(F.zip_with(
                    a[0], a[1],
                    lambda x, y: x.cast("double") * y.cast("double")))
                na = F.sqrt(self._arr_sum(F.transform(
                    a[0], lambda x: x.cast("double")
                    * x.cast("double"))))
                nb = F.sqrt(self._arr_sum(F.transform(
                    a[1], lambda x: x.cast("double")
                    * x.cast("double"))))
                return F.round(F.lit(1.0) - F.abs(dot / (na * nb)), 8)
            if typ == "chebyshev":       # ChebyshevDistance: max|a-b|
                return F.array_max(F.zip_with(
                    a[0], a[1],
                    lambda x, y: F.abs(x.cast("double")
                                       - y.cast("double"))))
            if typ == "earthMovers":     # EarthMoversDistance.java —
                # lastDistance += a[i] - b[i]; total += |lastDistance|
                acc = F.aggregate(
                    F.zip_with(a[0], a[1],
                               lambda x, y: x.cast("double")
                               - y.cast("double")),
                    F.struct(F.lit(0.0).alias("last"),
                             F.lit(0.0).alias("total")),
                    lambda s, d: F.struct(
                        (s["last"] + d).alias("last"),
                        (s["total"] + F.abs(s["last"] + d))
                        .alias("total")))
                return acc["total"]
            if typ == "euclidean":
                return F.sqrt(self._arr_sum(F.zip_with(
                    a[0], a[1],
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")))))
            if typ == "manhattan":
                return self._arr_sum(F.zip_with(
                    a[0], a[1],
                    lambda x, y: F.abs(x.cast("double")
                                       - y.cast("double"))))
            if typ == "canberra":
                # 0/0 terms contribute 0 (commons-math
                # CanberraDistance.java)
                return self._arr_sum(F.zip_with(
                    a[0], a[1],
                    lambda x, y: F.when(
                        (x == 0) & (y == 0), F.lit(0.0))
                    .otherwise(F.abs(x.cast("double")
                                     - y.cast("double"))
                               / (F.abs(x.cast("double"))
                                  + F.abs(y.cast("double"))))))
            raise ValueError(f"distance: unknown type {typ!r}")
        # -- array / scalar utilities (solrj/io/eval) ----------------------
        if fn in ("ceil", "floor", "round"):
            # Ceiling/Floor/RoundEvaluator.java — element-wise over an
            # array operand, scalar for a literal. round is
            # Math.round = floor(x + 0.5) (half-UP even for negatives
            # — NOT SQL ROUND's half-away-from-zero), mirrored as the
            # same floor expression on both engines.
            op = {"ceil": lambda v: F.ceil(v).cast("double"),
                  "floor": lambda v: F.floor(v).cast("double"),
                  "round": lambda v: F.floor(v + F.lit(0.5))
                  .cast("double")}[fn]
            if (isinstance(node.args[0], str)
                    and re.match(r"^-?\d+(\.\d+)?$", node.args[0])):
                return op(a[0].cast("double"))
            return F.transform(a[0], lambda v: op(v.cast("double")))
        if fn == "precision":            # PrecisionEvaluator.java —
            # commons-math Precision.round(x, d) HALF_UP, the same
            # floor(x*10^d + 0.5)/10^d shape both engines share
            d = int(node.args[1])
            p = float(10 ** d)
            return (F.floor(a[0].cast("double") * F.lit(p) + F.lit(0.5))
                    / F.lit(p))
        if fn == "recip":                # RecipEvaluator.java — 1/x
            if (isinstance(node.args[0], str)
                    and re.match(r"^-?\d+(\.\d+)?$", node.args[0])):
                return F.lit(1.0) / a[0].cast("double")
            return F.transform(
                a[0], lambda v: F.lit(1.0) / v.cast("double"))
        if fn in ("scalarAdd", "scalarSubtract", "scalarMultiply",
                  "scalarDivide"):       # Scalar*Evaluator.java —
            # scalar first, applied to each element (subtract/divide:
            # element op scalar)
            s, arr = a[0].cast("double"), a[1]
            op = {"scalarAdd": lambda v: v + s,
                  "scalarSubtract": lambda v: v - s,
                  "scalarMultiply": lambda v: v * s,
                  "scalarDivide": lambda v: v / s}[fn]
            return F.transform(arr, lambda v: op(v.cast("double")))
        if fn == "append":               # AppendEvaluator.java
            return F.concat(*a)
        if fn == "copyOf":               # CopyOfEvaluator.java —
            # Arrays.copyOf semantics: truncate or ZERO-pad to length
            n = int(node.args[1])
            padded = F.concat(
                a[0].cast("array<double>"),
                F.array_repeat(F.lit(0.0),
                               F.greatest(F.lit(n) - F.size(a[0]),
                                          F.lit(0))))
            return F.slice(padded, 1, n)
        if fn == "copyOfRange":          # CopyOfRangeEvaluator.java —
            # [from, to) 0-based like Arrays.copyOfRange
            lo, hi = int(node.args[1]), int(node.args[2])
            return F.slice(a[0], lo + 1, hi - lo)
        if fn == "repeat":               # RepeatEvaluator.java
            return F.array_repeat(a[0].cast("double"),
                                  int(node.args[1]))
        if fn == "ones":                 # OnesEvaluator.java
            return F.array_repeat(F.lit(1.0), int(node.args[0]))
        if fn == "zeros":                # ZerosEvaluator.java
            return F.array_repeat(F.lit(0.0), int(node.args[0]))
        if fn == "asc":                  # AscEvaluator.java — sort asc
            return F.sort_array(a[0])
        if fn == "mode":                 # ModeEvaluator.java —
            # commons-math StatUtils.mode: ALL most-frequent values,
            # ascending. The max count is zipped in through an
            # array_repeat const (evaluated once) — referencing it
            # inside a filter lambda would re-derive every per-value
            # count per element, O(d^2 * n) on the interpreted HOF
            # path.
            arr = F.transform(a[0], lambda x: x.cast("double"))
            vals = F.array_sort(F.array_distinct(arr))
            cnt = F.transform(
                vals, lambda v: F.size(F.filter(arr, lambda x: x == v)))
            keep = F.zip_with(
                cnt, F.array_repeat(F.array_max(cnt), F.size(cnt)),
                lambda c, m: c == m)
            packed = F.zip_with(
                vals, keep,
                lambda v, k: F.struct(v.alias("v"), k.alias("k")))
            return F.transform(
                F.filter(packed, lambda p: p["k"]),
                lambda p: p["v"])
        if fn == "sumSq":                # SumSqEvaluator.java
            return self._arr_sum(F.zip_with(
                a[0], a[0],
                lambda x, y: x.cast("double") * y.cast("double")))
        if fn in ("norm", "l2norm"):     # NormEvaluator.java — L2;
            # Lang.java:240 registers the lowercase "l2norm" name
            return F.sqrt(self._arr_sum(F.zip_with(
                a[0], a[0],
                lambda x, y: x.cast("double") * y.cast("double"))))
        if fn in ("l1Norm", "l1norm"):   # L1NormEvaluator.java
            # (Lang.java:241 name is all-lowercase)
            return self._arr_sum(F.transform(
                a[0], lambda v: F.abs(v.cast("double"))))
        if fn in ("lInfNorm", "linfnorm"):  # LInfNormEvaluator.java
            # (Lang.java:242 name is all-lowercase)
            return F.array_max(F.transform(
                a[0], lambda v: F.abs(v.cast("double"))))
        if fn == "meanDifference":       # MeanDifferenceEvaluator —
            # StatUtils.meanDifference = sum(a-b)/n
            return self._arr_sum(F.zip_with(
                a[0], a[1],
                lambda x, y: x.cast("double") - y.cast("double"))) \
                / F.size(a[0])
        if fn == "sumDifference":        # SumDifferenceEvaluator
            return self._arr_sum(F.zip_with(
                a[0], a[1],
                lambda x, y: x.cast("double") - y.cast("double")))
        if fn == "indexOf":              # IndexOfEvaluator — 0-based
            # first position of the value, -1 when absent
            return (F.coalesce(F.array_position(
                a[0], a[1]), F.lit(0)) - F.lit(1)).cast("long")
        # -- string evaluators (solrj/io/eval) -----------------------------
        if fn == "upper":                # UpperEvaluator.java
            return F.upper(a[0])
        if fn == "lower":                # LowerEvaluator.java
            return F.lower(a[0])
        if fn == "trim":                 # TrimEvaluator.java
            return F.trim(a[0])
        if fn == "concat":               # ConcatEvaluator.java —
            # delim= param (default "")
            return F.concat_ws(node.params.get("delim", ""), *a)
        if fn == "matches":              # MatchesEvaluator.java —
            # java.util.regex find() (UNANCHORED substring search)
            return a[0].rlike(str(node.args[1]))
        if fn == "coalesce":             # CoalesceEvaluator.java
            return F.coalesce(*a)
        if fn == "isNull":               # IsNullEvaluator.java
            return a[0].isNull()
        if fn == "notNull":              # NotNullEvaluator.java
            return a[0].isNotNull()
        # -- scalar math / trig / utility evaluators (round-3ac wave) ------
        # solrj/io/eval/{Sine,ArcSine,HyperbolicSine,Cosine,ArcCosine,
        # HyperbolicCosine,Tangent,ArcTangent,HyperbolicTangent,
        # CubedRoot}Evaluator.java — each doWork is the matching
        # java.lang.Math call (scalar; the reference's List recursion
        # is the bounded col() cell path — arrays route through the
        # array evaluators above). Library trig/cbrt is sub-ulp
        # cross-engine; registry rows stage results through the
        # FLOOR(x*1e6+0.5)/1e6 convention like every float row.
        if fn in ("sin", "asin", "sinh", "cos", "acos", "cosh",
                  "tan", "atan", "tanh", "cbrt"):
            impl = {"sin": F.sin, "asin": F.asin, "sinh": F.sinh,
                    "cos": F.cos, "acos": F.acos, "cosh": F.cosh,
                    "tan": F.tan, "atan": F.atan, "tanh": F.tanh,
                    "cbrt": F.cbrt}[fn]
            return impl(a[0].cast("double"))
        if fn == "eor":                  # ExclusiveOrEvaluator.java —
            # true iff EXACTLY ONE of >=2 booleans is true (the
            # reference counts trues and compares == 1)
            if len(a) < 2:
                raise ValueError("eor() needs at least 2 values")
            cnt = a[0].cast("int")
            for x in a[1:]:
                cnt = cnt + x.cast("int")
            return cnt == F.lit(1)
        if fn == "trunc":                # TruncEvaluator.java —
            # value.toString().substring(0, n). Java substring throws
            # past the end; Catalyst substring clamps (documented —
            # the reference path is an error, not a value).
            return F.substring(a[0], 1, int(node.args[1]))
        if fn == "split":                # SplitEvaluator.java —
            # String.split(p, -1): split on a Java regex, trailing
            # empty strings KEPT (limit -1). F.split shares the JVM
            # regex dialect and limit semantics exactly.
            return F.split(a[0], str(node.args[1]), -1)
        if fn == "dateTime":             # DateEvaluator.java — parse
            # with the SimpleDateFormat template (UTC unless a third
            # tz operand names a zone) and re-format as the
            # reference's fixed yyyy-MM-dd'T'HH:mm:ss'Z' UTC shape
            ts = F.to_timestamp(a[0], str(node.args[1]))
            if len(node.args) > 2:
                ts = F.to_utc_timestamp(ts, str(node.args[2]))
            return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
        if fn == "convert":              # ConversionEvaluator.java —
            # the fixed length-unit factor table (constructConverter);
            # unsupported pairs raise like the reference's
            # EvaluatorException
            frm = str(node.args[0]).upper()
            to = str(node.args[1]).upper()
            factors = {
                ("INCHES", "MILLIMETERS"): 25.4,
                ("INCHES", "CENTIMETERS"): 2.54,
                ("INCHES", "METERS"): 0.0254,
                ("FEET", "METERS"): 0.30,
                ("YARDS", "METERS"): 0.91,
                ("YARDS", "KILOMETERS"): 0.00091,
                ("MILES", "KILOMETERS"): 1.61,
                ("MILLIMETERS", "INCHES"): 0.039,
                ("CENTIMETERS", "INCHES"): 0.39,
                ("METERS", "FEET"): 3.28,
                ("KILOMETERS", "MILES"): 0.62,
                ("KILOMETERS", "FEET"): 3280.8,
            }
            if (frm, to) not in factors:
                raise ValueError(
                    f"convert: no conversion from {frm} to {to}")
            return a[2].cast("double") * F.lit(factors[(frm, to)])
        if fn == "val":                  # RawValueEvaluator.java —
            # one literal; Integer promotes to Long, Float to Double
            raw = str(node.args[0])
            if re.match(r"^-?\d+$", raw):
                return F.lit(int(raw))
            if re.match(r"^-?\d*\.\d+$", raw):
                return F.lit(float(raw))
            return F.lit(raw)
        if fn == "addAll":               # AppendEvaluator.java
            # ("addAll" in Lang.java:143) — concatenate the operand
            # lists, SKIPPING null operands. Numeric lists (the
            # math-expression contract; the reference also passes
            # through bare objects — col() cells here are numeric).
            arrs = F.array(*[
                F.transform(x, lambda v: v.cast("double")) for x in a])
            return F.flatten(F.filter(arrs, lambda r: r.isNotNull()))
        if fn == "natural":              # NaturalEvaluator.java —
            # the list [0, 1, .., n-1]
            c = a[0].cast("long")
            return F.when(c > 0, F.sequence(F.lit(0).cast("long"),
                                            c - 1)) \
                .otherwise(F.expr("array()").cast("array<long>"))
        if fn == "colAt":                # ColumnAtEvaluator.java —
            # column i of a (row-major) matrix as a list
            return F.transform(a[0], lambda r: F.get(r, a[1]))
        if fn == "uuid":                 # UuidEvaluator.java —
            # UUID.randomUUID(); random by contract (pytest pins the
            # format law, never a value — excluded from oracle rows)
            return F.expr("uuid()")
        # -- statistics + linear algebra (solrj/io/eval) -------------------
        # p-values are deliberately OMITTED from ttest/pairedTtest/
        # mannWhitney/anova: they need the regularized incomplete
        # beta / erf special functions, whose library implementations
        # are not cross-engine-stable; the statistic fields (exact
        # arithmetic over raw-moment sums / integer ranks) carry the
        # decision weight and ARE emitted. Where commons-math uses
        # incremental (Welford) accumulation the raw-moment expansion
        # here can differ in the last ulps — documented, and the
        # oracle mirrors this form.
        if fn == "rank":                 # RankEvaluator.java —
            # commons-math NaturalRanking, ties AVERAGE: rank(v) =
            # (first + last)/2 over the sorted positions of v's tie
            # block == |{y < v}| + (|{y == v}| + 1)/2, 1-based.
            # Computed with two native array_position scans per
            # element (not nested filter() lambdas — the interpreted
            # HOF path makes that O(n^2) with a catastrophic
            # constant; measured minutes at a 5k series).
            arr = F.transform(a[0], lambda x: x.cast("double"))
            srt = F.sort_array(arr)
            rsrt = F.reverse(srt)
            n1 = F.size(arr) + F.lit(1)
            return F.transform(
                arr, lambda v:
                (F.array_position(srt, v)
                 + (n1 - F.array_position(rsrt, v))).cast("double")
                / F.lit(2.0))
        if fn == "hist":                 # HistogramEvaluator.java —
            # commons-math EmpiricalDistribution(bins): delta =
            # (max-min)/bins, findBin = min(max(ceil((v-min)/delta)-1,
            # 0), bins-1); per-bin SummaryStatistics
            bins = int(node.args[1]) if len(node.args) > 1 else 10
            arr = F.transform(a[0], lambda x: x.cast("double"))
            mn = F.array_min(arr)
            delta = (F.array_max(arr) - mn) / F.lit(float(bins))
            # The interpreted HOF path re-evaluates lambda
            # subexpressions PER ELEMENT, so referencing array_min /
            # array_max inside a transform or filter lambda costs
            # O(n) per element — O(n^2) per pass (measured minutes at
            # a 5k series). array_repeat evaluates its child ONCE, so
            # packing (min, delta) into a repeated const array and
            # zipping keeps every pass O(n).
            consts = F.array_repeat(
                F.struct(mn.alias("mn"), delta.alias("d")),
                F.size(arr))
            pairs = F.zip_with(
                arr, consts,
                lambda v, c: F.struct(
                    v.alias("v"),
                    F.least(F.greatest(
                        F.ceil((v - c["mn"]) / c["d"]) - F.lit(1),
                        F.lit(0)), F.lit(bins - 1)).alias("i")))

            def _stats(i):
                sel = F.transform(
                    F.filter(pairs, lambda p: p["i"] == i),
                    lambda p: p["v"])
                nn = F.size(sel).cast("double")
                s = F.aggregate(sel, F.lit(0.0), lambda c, x: c + x)
                ssq = F.aggregate(sel, F.lit(0.0),
                                  lambda c, x: c + x * x)
                var = (ssq - s * s / nn) / (nn - F.lit(1.0))
                return F.struct(
                    F.array_max(sel).alias("max"),
                    (s / nn).alias("mean"),
                    F.array_min(sel).alias("min"),
                    F.sqrt(var).alias("stdev"), s.alias("sum"),
                    F.size(sel).cast("long").alias("N"),
                    var.alias("var"))

            return F.transform(
                F.sequence(F.lit(0), F.lit(bins - 1)),
                lambda i: _stats(i.cast("long")))
        if fn == "chiSquareDataSet":
            # ChiSquareDataSetEvaluator.java:39 — commons-math
            # ChiSquareTest.chiSquareDataSetsComparison over two
            # long[] count vectors: equal sums -> dev = o1-o2; else
            # weight w = sqrt(sum1/sum2), dev = o1/w - o2*w; stat =
            # sum(dev^2/(o1+o2)); p = 1 - chi2cdf(stat, n-1) via the
            # runtime-df closed form (_chi2_cdf). The (w, unequal)
            # scalars stage through array_repeat so the interpreted
            # HOF doesn't recompute the sums per element.
            o1 = F.transform(a[0], lambda v: v.cast("long"))
            o2 = F.transform(a[1], lambda v: v.cast("long"))
            cs1 = F.aggregate(o1, F.lit(0).cast("long"),
                              lambda s, v: s + v)
            cs2 = F.aggregate(o2, F.lit(0).cast("long"),
                              lambda s, v: s + v)
            consts = F.array_repeat(
                F.struct(F.sqrt(cs1.cast("double") / cs2.cast("double"))
                         .alias("w"),
                         (cs1 != cs2).alias("uneq")),
                F.size(o1))
            terms = F.zip_with(
                F.zip_with(o1, o2, lambda x, z: F.struct(
                    x.alias("x"), z.alias("z"))),
                consts,
                lambda p, c: self._sq(
                    F.when(c["uneq"],
                           p["x"].cast("double") / c["w"]
                           - p["z"].cast("double") * c["w"])
                    .otherwise((p["x"] - p["z"]).cast("double")))
                / (p["x"] + p["z"]).cast("double"))
            stat = self._arr_sum(terms)
            p = F.lit(1.0) - self._chi2_cdf(stat,
                                            F.size(o1) - F.lit(1))
            return F.struct(stat.alias("chisquare-statistic"),
                            p.alias("p-value"))
        if fn == "gtestDataSet":
            # GTestDataSetEvaluator.java:39 — commons-math
            # GTest.gDataSetsComparison: G = 2N(H(rows) + H(cols) -
            # H(table)) with natural-log Shannon entropies over the
            # 2xn count table (zero cells contribute 0); p = 1 -
            # chi2cdf(G, n-1). Same mutual-information identity as
            # the reference's entropy() calls — few-ulp op-order
            # divergence, inside the round-6 staging.
            o1 = F.transform(a[0], lambda v: v.cast("long"))
            o2 = F.transform(a[1], lambda v: v.cast("long"))
            cs1 = F.aggregate(o1, F.lit(0).cast("long"),
                              lambda s, v: s + v)
            cs2 = F.aggregate(o2, F.lit(0).cast("long"),
                              lambda s, v: s + v)
            ntot = (cs1 + cs2).cast("double")

            def _ent(vals, total):
                reps = F.array_repeat(total, F.size(vals))
                return -self._arr_sum(F.zip_with(
                    vals, reps,
                    lambda v, t: F.when(
                        v > F.lit(0),
                        (v.cast("double") / t)
                        * F.log(v.cast("double") / t))
                    .otherwise(F.lit(0.0))))

            def _ent2(va, vb):
                return -((F.when(va > F.lit(0),
                                 (va.cast("double") / vb)
                                 * F.log(va.cast("double") / vb))
                          .otherwise(F.lit(0.0))))

            hr = _ent2(cs1, ntot) + _ent2(cs2, ntot)
            hc = _ent(F.zip_with(o1, o2, lambda x, z: x + z), ntot)
            ht = _ent(F.concat(o1, o2), ntot)
            g = F.lit(2.0) * ntot * (hr + hc - ht)
            p = F.lit(1.0) - self._chi2_cdf(g, F.size(o1) - F.lit(1))
            return F.struct(g.alias("G-statistic"),
                            p.alias("p-value"))
        if fn == "fft":
            # FFTEvaluator.java:50 — commons-math
            # FastFourierTransformer STANDARD forward over a real
            # series; returns the 2-row [real; imaginary] matrix with
            # rowLabels. The engine computes the direct DFT X_k =
            # sum_j x_j e^(-2 pi i k j / n) as nested codegen folds —
            # O(n^2) on a bounded series cell (the reference requires
            # power-of-2 length for its radix-2 butterflies; the DFT
            # has no such constraint and equals it to the last ulps).
            arr = F.transform(a[0], lambda v: v.cast("double"))
            n = F.size(arr)
            ks = F.sequence(F.lit(0), n - F.lit(1))
            reps = F.array_repeat(arr, n)

            def _dft_row(trig):
                def row(k, xs):
                    m = F.size(xs).cast("double")
                    idx = F.sequence(F.lit(0), F.size(xs) - F.lit(1))
                    return self._arr_sum(F.zip_with(
                        xs, idx,
                        lambda x, j: x * trig(
                            F.lit(2.0 * math.pi)
                            * k.cast("double") * j.cast("double")
                            / m)))
                return row

            real = F.zip_with(ks, reps, _dft_row(F.cos))
            imag = F.zip_with(
                ks, reps,
                lambda k, xs: -self._arr_sum(F.zip_with(
                    xs, F.sequence(F.lit(0), F.size(xs) - F.lit(1)),
                    lambda x, j: x * F.sin(
                        F.lit(2.0 * math.pi) * k.cast("double")
                        * j.cast("double")
                        / F.size(xs).cast("double")))))
            return _Mat(F.array(real, imag),
                        rlab=F.array(F.lit("real"), F.lit("imaginary")))
        if fn == "ifft":
            # IFFTEvaluator.java:45 — inverse transform of the
            # [real; imaginary] matrix, STANDARD normalization (1/n
            # on the inverse); returns the REAL parts only, like the
            # reference: x_j = (1/n) sum_k (re_k cos(2 pi k j / n) -
            # im_k sin(2 pi k j / n)).
            if not isinstance(a[0], _Mat):
                raise ValueError("ifft function requires a matrix "
                                 "as a parameter")
            m = self._mrows(a[0])
            rrow, irow = F.get(m, 0), F.get(m, 1)
            n = F.size(rrow)
            js = F.sequence(F.lit(0), n - F.lit(1))
            reps = F.array_repeat(
                F.zip_with(rrow, irow, lambda r, i: F.struct(
                    r.alias("re"), i.alias("im"))), n)
            return F.zip_with(
                js, reps,
                lambda j, cs: self._arr_sum(F.zip_with(
                    cs, F.sequence(F.lit(0), F.size(cs) - F.lit(1)),
                    lambda c, k: c["re"] * F.cos(
                        F.lit(2.0 * math.pi) * k.cast("double")
                        * j.cast("double")
                        / F.size(cs).cast("double"))
                    - c["im"] * F.sin(
                        F.lit(2.0 * math.pi) * k.cast("double")
                        * j.cast("double")
                        / F.size(cs).cast("double"))))
                / F.size(cs).cast("double"))
        if fn == "ttest":                # TTestEvaluator.java —
            # commons-math TTest.t(a, b): Welch two-sample statistic
            # (m1-m2)/sqrt(v1/n1 + v2/n2) from raw moments
            def _mv(c):
                nn = F.size(c).cast("double")
                s = self._arr_sum(c)
                ssq = F.aggregate(c, F.lit(0.0),
                                  lambda acc, x: acc
                                  + x.cast("double") * x.cast("double"))
                return nn, s / nn, (ssq - s * s / nn) / (nn - F.lit(1.0))
            n1, m1, v1 = _mv(a[0])
            n2, m2, v2 = _mv(a[1])
            t = (m1 - m2) / F.sqrt(v1 / n1 + v2 / n2)
            return F.struct(t.alias("t-statistic"))
        if fn == "pairedTtest":          # PairedTTestEvaluator.java —
            # TTest.pairedT: meanDiff / sqrt(varDiff / n)
            d = F.zip_with(a[0], a[1],
                           lambda x, y: x.cast("double")
                           - y.cast("double"))
            nn = F.size(d).cast("double")
            s = self._arr_sum(d)
            ssq = F.aggregate(d, F.lit(0.0), lambda c, x: c + x * x)
            vd = (ssq - s * s / nn) / (nn - F.lit(1.0))
            t = (s / nn) / F.sqrt(vd / nn)
            return F.struct(t.alias("t-statistic"))
        if fn == "mannWhitney":          # MannWhitneyUEvaluator.java —
            # commons-math MannWhitneyUTest.mannWhitneyU =
            # max(U1, U2), ranks over the pooled sample, ties average
            both = F.concat(
                F.transform(a[0], lambda x: x.cast("double")),
                F.transform(a[1], lambda x: x.cast("double")))
            n1 = F.size(a[0]).cast("double")
            n2 = F.size(a[1]).cast("double")
            r1 = self._arr_sum(F.transform(
                F.transform(a[0], lambda x: x.cast("double")),
                lambda v:
                F.size(F.filter(both, lambda y: y < v)).cast("double")
                + (F.size(F.filter(both, lambda y: y == v))
                   .cast("double") + F.lit(1.0)) / F.lit(2.0)))
            u1 = r1 - n1 * (n1 + F.lit(1.0)) / F.lit(2.0)
            u2 = n1 * n2 - u1
            return F.struct(F.greatest(u1, u2).alias("u-statistic"))
        if fn == "anova":                # AnovaEvaluator.java —
            # commons-math OneWayAnova.anovaFValue over k groups:
            # F = (ssbg/(k-1)) / (sswg/(n-k)) from raw sums
            k = float(len(a))
            ns, ss, qs = [], [], []
            for arr in a:
                ns.append(F.size(arr).cast("double"))
                ss.append(self._arr_sum(arr))
                qs.append(F.aggregate(
                    arr, F.lit(0.0),
                    lambda c, x: c + x.cast("double")
                    * x.cast("double")))
            tot_n = ns[0]
            tot_s = ss[0]
            for x in ns[1:]:
                tot_n = tot_n + x
            for x in ss[1:]:
                tot_s = tot_s + x
            ssbg = None
            sswg = None
            for nn, s, q in zip(ns, ss, qs):
                term = s * s / nn
                ssbg = term if ssbg is None else ssbg + term
                w = q - s * s / nn
                sswg = w if sswg is None else sswg + w
            ssbg = ssbg - tot_s * tot_s / tot_n
            f = (ssbg / F.lit(k - 1.0)) / (sswg / (tot_n - F.lit(k)))
            return F.struct(f.alias("f-ratio"))
        if fn == "conv":                 # ConvolutionEvaluator.java —
            # commons-math MathArrays.convolve: full convolution,
            # out[k] = sum_i x[i]*y[k-i], length n+m-1
            x, y = a[0], a[1]
            n = F.size(x)
            m = F.size(y)
            return F.transform(
                F.sequence(F.lit(0), n + m - F.lit(2)),
                lambda k: F.aggregate(
                    F.sequence(F.greatest(F.lit(0), k - m + F.lit(1)),
                               F.least(n - F.lit(1), k)),
                    F.lit(0.0),
                    lambda acc, i: acc
                    + F.get(x, i).cast("double")
                    * F.get(y, k - i).cast("double")))
        if fn == "matrixMult":           # MatrixMultiplyEvaluator.java
            A, Bm = a[0], a[1]
            r = F.size(F.get(Bm, 0))
            q = F.size(Bm)
            return F.transform(
                A, lambda row: F.transform(
                    F.sequence(F.lit(0), r - F.lit(1)),
                    lambda j: F.aggregate(
                        F.sequence(F.lit(0), q - F.lit(1)),
                        F.lit(0.0),
                        lambda acc, i: acc
                        + F.get(row, i).cast("double")
                        * F.get(F.get(Bm, i), j).cast("double"))))
        if fn == "ltrim":                # LeftShiftEvaluator.java —
            # drop the first n elements
            n = int(node.args[1])
            return F.slice(a[0], n + 1,
                           F.greatest(F.size(a[0]) - F.lit(n),
                                      F.lit(0)))
        if fn == "rtrim":                # RightShiftEvaluator.java —
            # drop the last n elements
            n = int(node.args[1])
            return F.slice(a[0], 1,
                           F.greatest(F.size(a[0]) - F.lit(n),
                                      F.lit(0)))
        if fn == "factorial":            # FactorialEvaluator.java —
            # CombinatoricsUtils.factorial; exact below 2^53
            return F.aggregate(
                F.sequence(F.lit(1),
                           F.greatest(a[0].cast("int"), F.lit(1))),
                F.lit(1.0), lambda acc, i: acc * i.cast("double"))
        if fn == "binomialCoefficient":  # BinomialCoefficient-
            # Evaluator.java — CombinatoricsUtils.binomialCoefficient
            # via the multiplicative form c = c*(n-k+i)/i (each step
            # an exact integer, the same order commons-math uses)
            nn, kk = int(node.args[0]), int(node.args[1])
            kk = min(kk, nn - kk)
            if kk <= 0:
                return F.lit(1.0)
            return F.aggregate(
                F.sequence(F.lit(1), F.lit(kk)), F.lit(1.0),
                lambda acc, i: acc * (F.lit(float(nn - kk))
                                      + i.cast("double"))
                / i.cast("double"))
        if fn == "primes":               # PrimesEvaluator.java —
            # the first `count` primes >= start (commons-math
            # Primes.nextPrime loop). Candidate bound count*20+start+
            # 100 is generous for the count sizes the surface serves
            # (config-sized literals).
            count, start = int(node.args[0]), int(node.args[1])
            hi = start + count * 20 + 100
            cand = F.sequence(F.lit(max(2, start)), F.lit(hi))
            pr = F.filter(
                cand, lambda v: ~F.exists(
                    F.sequence(F.lit(2), F.greatest(
                        F.floor(F.sqrt(v.cast("double"))).cast("int"),
                        F.lit(2))),
                    lambda d: (v % d == 0) & (d < v)))
            return F.transform(F.slice(pr, 1, count),
                               lambda v: v.cast("double"))
        if fn == "oscillate":            # OscillateEvaluator.java —
            # amp*sin(freq*i + phase) for i in 0..127 (a sine wave
            # carrier; library sin -> pytest-pinned, not oracle-able)
            amp, freq, phase = (float(node.args[i]) for i in range(3))
            return F.transform(
                F.sequence(F.lit(0), F.lit(127)),
                lambda i: F.lit(amp) * F.sin(F.lit(freq)
                                             * i.cast("double")
                                             + F.lit(phase)))
        # -- interpolation / curve fitting (round-3ae wave) ----------------
        # Lerp/Spline/Akima/PolyFitEvaluator.java return
        # VectorFunctions (x = 0..n-1 in the y-only forms);
        # Derivative/IntegrateEvaluator.java consume them. See _VFunc.
        if fn in ("lerp", "spline", "akima"):
            xs, ys = self._vf_knots(a)
            if fn == "lerp":
                # LerpEvaluator.java — commons-math LinearInterpolator:
                # degree-1 segments [y_i, (y_{i+1}-y_i)/(x_{i+1}-x_i)]
                coefs = F.transform(
                    F.sequence(F.lit(0), F.size(xs) - F.lit(2)),
                    lambda j: F.array(
                        F.get(ys, j),
                        (F.get(ys, j + F.lit(1)) - F.get(ys, j))
                        / (F.get(xs, j + F.lit(1)) - F.get(xs, j))))
            elif fn == "spline":
                coefs = self._spline_coefs(xs, ys)
            else:
                coefs = self._akima_coefs(xs, ys)
            vf = _VFunc("pp", None, lx=xs, coefs=coefs)
            vf.fitted = F.transform(
                xs, lambda z: self._vf_value(vf, z.cast("double")))
            return vf
        if fn == "loess":
            # LoessEvaluator.java:40 — commons-math LoessInterpolator:
            # the smoothed series (the VectorFunction's rendered
            # list), wrapped with the natural-cubic spline OVER THE
            # SMOOTHED VALUES (LoessInterpolator.interpolate =
            # SplineInterpolator on (x, smooth(x,y))), so predict/
            # derivative/integrate consume it like any other fit.
            # bandwidth/robustIterations named params mirror the
            # reference defaults. Window mechanics in _loess_blob.
            xs, ys = self._vf_knots(a)
            bw = float(node.params.get("bandwidth", 0.25))
            ri = int(node.params.get("robustIterations", 2))
            if not (0.0 < bw <= 1.0):
                raise ValueError("loess: bandwidth must be in (0, 1]")
            sm = _loess_blob(xs, ys, bw, ri)
            vf = _VFunc("pp", sm, lx=xs,
                        coefs=_let1(sm, lambda s: self._spline_coefs(
                            xs, F.transform(
                                s, lambda v: v.cast("double")))))
            return vf
        if fn == "bicubicSpline":
            # BicubicSplineEvaluator.java:40 — two numeric knot
            # arrays + a grid matrix -> a BivariateFunction for
            # predict(f, x, y); see _BiFunc for the evaluation
            # contract
            if len(a) != 3:
                raise ValueError("The bicubicSpline function "
                                 "requires three parameters")
            grid = self._mrows(a[2])
            return _BiFunc(
                F.transform(a[0], lambda v: v.cast("double")),
                F.transform(a[1], lambda v: v.cast("double")),
                F.transform(grid, lambda r: F.transform(
                    r, lambda v: v.cast("double"))))
        if fn in ("gaussfit", "harmfit", "harmonicFit"):
            # Gauss/HarmonicFitEvaluator.java:40 — ParameterGuesser
            # + Levenberg-Marquardt in a bounded Arrow kernel
            # (_curvefit_blob); the result is a _VFunc whose coefs
            # are the fitted [norm, mean, sigma] / [a, omega, phi]
            # triple, rendered at the knots like every fit. The
            # harmonic fit carries amplitude/angularFrequency/phase
            # in ctx (VectorFunction.addToContext,
            # HarmonicFitEvaluator.java:118-120).
            xs, ys = self._vf_knots(a)
            model = "gauss" if fn == "gaussfit" else "harm"
            cf = _curvefit_blob(xs, ys, model)
            vf = _VFunc(model, None, lx=xs, coefs=cf,
                        ctx=({"amplitude": F.get(cf, 0),
                              "angularFrequency": F.get(cf, 1),
                              "phase": F.get(cf, 2)}
                             if model == "harm" else None))
            vfx = vf

            def _fitval(c, z):
                if model == "gauss":
                    return (F.get(c, 0)
                            * F.exp(-((z - F.get(c, 1))
                                      * (z - F.get(c, 1)))
                                    / (F.lit(2.0) * F.get(c, 2)
                                       * F.get(c, 2))))
                return (F.get(c, 0)
                        * F.cos(F.get(c, 1) * z + F.get(c, 2)))

            vf.fitted = _let1(cf, lambda c: F.transform(
                xs, lambda z: _fitval(c, z.cast("double"))))
            return vfx
        if fn in ("getAmplitude", "getAngularFrequency",
                  "getPhase"):
            # Get{Amplitude,AngularFrequency,Phase}Evaluator.java —
            # VectorFunction.getFromContext on a harmonic fit
            key = {"getAmplitude": "amplitude",
                   "getAngularFrequency": "angularFrequency",
                   "getPhase": "phase"}[fn]
            vf = a[0]
            if not isinstance(vf, _VFunc) or key not in vf.ctx:
                raise ValueError(f"{fn}: operand must be a harmonic "
                                 "fit (a VectorFunction carrying "
                                 f"{key!r})")
            return vf.ctx[key]
        if fn == "polyfit":
            # PolyFitEvaluator.java — commons-math
            # PolynomialCurveFitter (Levenberg-Marquardt). On a
            # linear model LM converges to the exact least-squares
            # solution; the engine computes it directly via the
            # normal equations + Cramer (det_expr drives the oracle's
            # identical-order SQL). Degree <= 3 (default 3, the
            # reference default), matching exact-arithmetic Cramer.
            deg = 3
            if node.args and isinstance(node.args[-1], str) \
                    and re.match(r"^\d+$", node.args[-1]):
                deg = int(node.args[-1])
                a = a[:-1]
            if deg > 3 or deg < 1:
                raise ValueError("polyfit: degree must be 1..3 "
                                 "(Cramer closed-form domain)")
            xs, ys = self._vf_knots(a)
            cf = self._polyfit_coefs(xs, ys, deg)
            vf = _VFunc("poly", None, lx=xs, coefs=cf)
            vf.fitted = F.transform(
                xs, lambda z: self._horner(cf, z.cast("double")))
            return vf
        if fn == "derivative":
            # DerivativeEvaluator.java — func.derivative() evaluated
            # at the knots (every engine _VFunc is differentiable, so
            # the reference's akima-respline fallback never applies)
            vf = a[0]
            if not isinstance(vf, _VFunc):
                raise ValueError("derivative: operand must be an "
                                 "interpolator/fit (VectorFunction)")
            if vf.kind == "harm":
                # d/dz a cos(wz+phi) = a w cos(wz + phi + pi/2) —
                # still a harmonic, so the derivative is the same
                # kind with coefs [a*w, w, phi + pi/2]
                ncf = F.array(
                    F.get(vf.coefs, 0) * F.get(vf.coefs, 1),
                    F.get(vf.coefs, 1),
                    F.get(vf.coefs, 2) + F.lit(math.pi / 2.0))
                out = _VFunc("harm", None, lx=vf.lx, coefs=ncf)
                out.fitted = F.transform(
                    vf.lx, lambda z: self._vf_value(
                        out, z.cast("double")))
                return out
            if vf.kind == "gauss":
                raise ValueError(
                    "derivative: not supported for a gaussfit model "
                    "(the derivative is not in the engine's "
                    "function families; use predict on a fine grid)")
            if vf.kind == "poly":
                dcf = self._poly_deriv(vf.coefs)
                out = _VFunc("poly", None, lx=vf.lx, coefs=dcf)
                out.fitted = F.transform(
                    vf.lx,
                    lambda z: self._horner(dcf, z.cast("double")))
                return out
            dcoefs = F.transform(vf.coefs, self._poly_deriv)
            out = _VFunc("pp", None, lx=vf.lx, coefs=dcoefs)
            out.fitted = F.transform(
                vf.lx, lambda z: self._vf_value(out, z.cast("double")))
            return out
        if fn == "integral":             # Lang.java:211 registers
            fn = "integrate"             # IntegrateEvaluator as
            # "integral"; the engine keeps "integrate" as an alias
            # (the math-expressions guide's historical name)
        if fn == "integrate":
            # IntegrateEvaluator.java — Romberg over the function.
            # The engine integrates the piecewise/global polynomial
            # EXACTLY (antiderivative closed form); the reference's
            # RombergIntegrator converges to the same value within
            # its 1e-6 relative default on these smooth integrands
            # (documented approximation parity, like erf).
            vf = a[0]
            if not isinstance(vf, _VFunc):
                raise ValueError("integrate: operand must be an "
                                 "interpolator/fit (VectorFunction)")
            if len(a) == 3:
                return (self._vf_integral(vf, a[2].cast("double"))
                        - self._vf_integral(vf, a[1].cast("double")))
            # 1-arg form: cumulative integrals at each knot (the
            # reference emits Integer 0 first, then doubles)
            x0 = F.get(vf.lx, 0).cast("double")
            return F.transform(
                vf.lx, lambda z: self._vf_integral(vf,
                                                   z.cast("double"))
                - self._vf_integral(vf, x0))
        # -- probability distributions (round-3ad wave) --------------------
        # Constructor evaluators return a _Dist (the reference's
        # commons-math distribution object); the consumers below
        # compile closed forms. Parameterizations mirror the
        # reference constructors verbatim (see _Dist docstring).
        if fn == "empiricalDistribution":
            # EmpiricalDistributionEvaluator.java:33 — the sorted
            # backing array plus the bin count (default 99, the
            # evaluator's own default); consumers compile the
            # commons-math bin-kernel cdf (see _empirical_cdf)
            bins = int(node.args[1]) if len(node.args) > 1 else 99
            if bins < 1:
                raise ValueError("empiricalDistribution: bins must "
                                 "be >= 1")
            return _Dist("empirical", False,
                         s=F.sort_array(F.transform(
                             a[0], lambda v: v.cast("double"))),
                         bins=bins)
        if fn == "multiVariateNormalDistribution":
            # MultiVariateNormalDistributionEvaluator.java:33 —
            # means vector + covariance matrix. The engine's
            # density/sample closed forms are 2-D (Cramer inverse /
            # Cholesky); higher dimensions raise at compile time
            # when the literal shape says so.
            if isinstance(node.args[0], StreamExpr) \
                    and node.args[0].name == "array" \
                    and len(node.args[0].args) != 2:
                raise ValueError(
                    "multiVariateNormalDistribution: the engine's "
                    "closed forms are 2-D (see _mvn_density)")
            return _Dist("mvn", False,
                         means=F.transform(a[0],
                                           lambda v: v.cast("double")),
                         cov=F.transform(
                             self._mrows(a[1]),
                             lambda r: F.transform(
                                 r, lambda v: v.cast("double"))))
        if fn == "normalDistribution":
            return _Dist("normal", False, mean=_d(a[0]), sd=_d(a[1]))
        if fn == "uniformDistribution":
            # UniformRealDistribution(lower, upper)
            return _Dist("uniform", False, lo=_d(a[0]), hi=_d(a[1]))
        if fn == "uniformIntegerDistribution":
            return _Dist("uniformInt", True, lo=_d(a[0]), hi=_d(a[1]))
        if fn == "binomialDistribution":
            # BinomialDistribution(numberOfTrials, successProb).
            # Exact-factorial closed forms: domain n <= 20 (the
            # surface's config-sized trial counts; factorial(21)
            # overflows the exact-integer double range).
            return _Dist("binomial", True, n=_d(a[0]), p=_d(a[1]))
        if fn == "poissonDistribution":
            return _Dist("poisson", True, lam=_d(a[0]))
        if fn == "geometricDistribution":
            # GeometricDistribution(p): pmf p(1-p)^k on k >= 0
            return _Dist("geometric", True, p=_d(a[0]))
        if fn == "zipFDistribution":
            # ZipfDistribution(numberOfElements, exponent)
            return _Dist("zipf", True, n=_d(a[0]), s=_d(a[1]))
        if fn == "constantDistribution":
            return _Dist("constant", False, c=_d(a[0]))
        if fn == "triangularDistribution":
            return _Dist("triangular", False, a=_d(a[0]), c=_d(a[1]),
                         b=_d(a[2]))
        if fn == "logNormalDistribution":
            # LogNormalDistribution(scale, shape) — scale is the
            # MEAN OF ln(X) in commons-math naming
            return _Dist("lognormal", False, m=_d(a[0]), s=_d(a[1]))
        if fn == "weibullDistribution":
            # WeibullDistribution(shape, scale)
            return _Dist("weibull", False, al=_d(a[0]), be=_d(a[1]))
        if fn == "gammaDistribution":
            # GammaDistribution(shape, scale). INTEGER shape domain:
            # the regularized incomplete gamma closed form is the
            # exact finite sum 1 - e^-y * sum(y^i/i!) only for
            # integral shape (non-integral would need a continued
            # fraction; raise rather than silently approximate).
            _require_int_literal(node.args[0], "gammaDistribution shape")
            return _Dist("gamma", False, sh=_d(a[0]), th=_d(a[1]))
        if fn == "betaDistribution":
            # BetaDistribution(alpha, beta), INTEGER shapes: the
            # regularized incomplete beta is the exact binomial sum
            # I_x(a,b) = sum_{j=a}^{a+b-1} C(a+b-1,j) x^j (1-x)^(n-j)
            _require_int_literal(node.args[0], "betaDistribution alpha")
            _require_int_literal(node.args[1], "betaDistribution beta")
            return _Dist("beta", False, al=_d(a[0]), be=_d(a[1]))
        if fn == "enumeratedDistribution":
            # EnumeratedIntegerDistribution(samples) — pmf from
            # sample frequencies; the two-arg (singletons, probs)
            # variant zips explicit probabilities
            if len(a) == 1:
                return _Dist("enumerated", True, arr=a[0])
            return _Dist("enumerated2", True, vals=a[0], probs=a[1])
        if fn == "cumulativeProbability":
            # CumulativeProbabilityEvaluator.java:23 — real branch
            # takes a double, integer branch truncates to int
            d0 = a[0]
            if not isinstance(d0, _Dist):
                raise ValueError("cumulativeProbability: first "
                                 "operand must be a distribution")
            x = a[1].cast("int").cast("double") if d0.integer \
                else a[1].cast("double")
            return self._dist_cdf(d0, x)
        if fn == "probability":
            # ProbabilityEvaluator.java:33 — 2-arg integer pmf;
            # 3-arg real range cdf(hi) - cdf(lo)
            d0 = a[0]
            if not isinstance(d0, _Dist):
                raise ValueError("probability: first operand must "
                                 "be a distribution")
            if len(a) == 2:
                if not d0.integer:
                    raise ValueError("probability(dist, k) needs an "
                                     "integer distribution (the real "
                                     "branch is the 3-arg range form)")
                return self._dist_pmf(d0, a[1].cast("int"))
            return (self._dist_cdf(d0, a[2].cast("double"))
                    - self._dist_cdf(d0, a[1].cast("double")))
        if fn == "density":
            # DensityEvaluator.java — RealDistribution.density(x)
            d0 = a[0]
            if not isinstance(d0, _Dist):
                raise ValueError("density: first operand must be a "
                                 "distribution")
            if d0.kind == "mvn":
                # the multivariate branch takes a point VECTOR
                return self._mvn_density(d0, a[1])
            return self._dist_pdf(d0, a[1].cast("double"))
        if fn == "sample":
            # SampleEvaluator.java:33 — random draws (random by
            # contract: pytest pins distributional laws, never a
            # value — excluded from oracle rows). Inverse-CDF /
            # direct transforms of rand()/randn(); one draw without
            # n, a list with n.
            d0 = a[0]
            if isinstance(d0, _Markov):
                # MarkovChain.sample (MarkovChainEvaluator.java:85):
                # each draw advances the state via the current row's
                # EnumeratedIntegerDistribution (inverse-cdf on a
                # uniform). Sequential left fold carrying (state,
                # walk); random like every sample() — law-pinned.
                n = int(node.args[1]) if len(node.args) > 1 else 1
                mrows = d0.rows

                def _step(acc, _i):
                    srow = F.get(mrows, acc["s"])
                    u = F.rand()
                    nxt = F.least(
                        F.size(F.filter(
                            F.transform(
                                F.sequence(F.lit(1), F.size(srow)),
                                lambda j: F.aggregate(
                                    F.slice(srow, 1, j), F.lit(0.0),
                                    lambda t, p: t
                                    + p.cast("double"))),
                            lambda c: c <= u)),
                        F.size(srow) - F.lit(1)).cast("int")
                    return F.struct(
                        nxt.alias("s"),
                        F.concat(acc["out"],
                                 F.array(nxt)).alias("out"))

                walk = F.aggregate(
                    F.sequence(F.lit(1), F.lit(n)),
                    F.struct(F.lit(d0.state0).cast("int").alias("s"),
                             F.expr("cast(array() as array<int>)")
                             .alias("out")),
                    _step)["out"]
                return walk if len(node.args) > 1 else F.get(walk, 0)
            if not isinstance(d0, _Dist):
                raise ValueError("sample: first operand must be a "
                                 "distribution")
            n = int(node.args[1]) if len(node.args) > 1 else None
            if n is None:
                return self._dist_sample(d0, 0)
            return F.array(*[self._dist_sample(d0, i)
                             for i in range(n)])
        if fn == "outliers":
            # OutliersEvaluator.java:30 — values whose cdf falls at
            # or beyond the low/high thresholds; a negative
            # threshold disables that side (the reference's
            # `low >= 0 &&` / `hi >= 0 &&` guards). Returns the
            # flagged (value, cumulative-probability) pairs in vec
            # order as array<struct>, the columnar stand-in for the
            # reference's tuple list.
            d0, vec = a[0], a[1]
            if not isinstance(d0, _Dist):
                raise ValueError("outliers: first operand must be a "
                                 "distribution")
            low, hi = float(node.args[2]), float(node.args[3])
            cast = ((lambda v: v.cast("int").cast("double"))
                    if d0.integer else (lambda v: v.cast("double")))
            pairs = F.transform(vec, lambda v: F.struct(
                v.cast("double").alias("value"),
                self._dist_cdf(d0, cast(v))
                .alias("cumulativeProbablity_d")))
            lo_ok = F.lit(low >= 0)
            hi_ok = F.lit(hi >= 0)
            return F.filter(pairs, lambda s: (
                (lo_ok & (s["cumulativeProbablity_d"] <= F.lit(low)))
                | (hi_ok
                   & (s["cumulativeProbablity_d"] >= F.lit(hi)))))
        if fn == "ks":
            fn = "kolmogorovSmirnov"
        if fn == "kolmogorovSmirnov":
            # KolmogorovSmirnovEvaluator.java:24. One-sample branch
            # (dist, data): d-statistic is the exact order-statistic
            # sup max((i+1)/n - F(x_(i)), F(x_(i)) - i/n) (pure
            # Catalyst — oracle-able); p-value is 1 - cdf(d, n) via
            # the Marsaglia-Tsang-Wang H-matrix power (commons-math
            # KolmogorovSmirnovTest.cdf's double path) in an Arrow
            # pandas UDF (a bounded per-cell scalar, the same
            # driver-local computation the reference performs —
            # pytest-pinned, excluded from oracle rows). Two-sample
            # branch (data, data): the reference labels the result
            # "d-statistic" but stores kolmogorovSmirnovTest(x, y)
            # — the exact-P P-VALUE. Mirrored bug-compatibly via the
            # exact lattice count.
            if isinstance(a[0], _Dist):
                d0, arr = a[0], a[1]
                srt = F.array_sort(F.transform(
                    arr, lambda v: v.cast("double")))
                n = F.size(srt)
                nd = n.cast("double")
                devs = F.zip_with(
                    F.sequence(F.lit(1), n), srt,
                    lambda i, v: F.greatest(
                        i.cast("double") / nd - self._dist_cdf(d0, v),
                        self._dist_cdf(d0, v)
                        - (i.cast("double") - 1) / nd))
                dstat = F.array_max(devs)
                return F.struct(
                    dstat.alias("d-statistic"),
                    _ks_one_sample_p(dstat, n).alias("p-value"))
            x2 = F.transform(a[0], lambda v: v.cast("double"))
            y2 = F.transform(a[1], lambda v: v.cast("double"))
            return F.struct(
                _ks_two_sample_p(x2, y2).alias("d-statistic"))
        raise ValueError(f"unknown evaluator {fn!r}")

    # -- distribution closed forms (round-3ad wave) ------------------------

    @staticmethod
    def _powi(base, k):
        """base**k for k >= 0 as exp(k * ln base) with k==0 / base==0
        guards. Library pow() is avoided (exp/ln divergence is
        sub-ulp cross-engine and the round-6 staging absorbs it;
        pow() implementations disagree more — see the repo's
        rounding-trap notes)."""
        kd = k.cast("double")
        return (F.when(kd == F.lit(0.0), F.lit(1.0))
                .when(base == F.lit(0.0), F.lit(0.0))
                .otherwise(F.exp(kd * F.log(base))))

    @staticmethod
    def _sq(c):
        return c * c

    @staticmethod
    def _erf(x):
        """Abramowitz & Stegun 7.1.26 (|eps| <= 1.5e-7). The DuckDB
        oracle embeds the IDENTICAL arithmetic (same association
        order), so engine == oracle bit-exact; the reference's
        commons-math Erf differs by <= 1.5e-7 — inside the round-6
        staging every registry float crosses."""
        ax = F.abs(x)
        t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * ax)
        y = ((((F.lit(1.061405429) * t - F.lit(1.453152027)) * t
               + F.lit(1.421413741)) * t - F.lit(0.284496736)) * t
             + F.lit(0.254829592)) * t
        e = F.lit(1.0) - y * F.exp(-(ax * ax))
        return F.when(x < F.lit(0.0), -e).otherwise(e)

    @classmethod
    def _chi2_cdf(cls, x, df):
        """Chi-squared cumulativeProbability for a RUNTIME integer
        df: the regularized lower incomplete gamma P(df/2, x/2) in
        closed form — even df a finite Poisson sum (the gamma-dist
        path generalized to a runtime fold), odd df the erf +
        half-integer finite sum P = erf(sqrt(y)) - e^-y *
        sum_{j=1..k} y^(j-1/2)/Gamma(j+1/2) with the term recurrence
        t_{j+1} = t_j * y/(j+1/2), t_1 = 2*sqrt(y/pi). Exact but for
        the A&S erf twin (<= 1.5e-7, same note as the normal cdf);
        pinned against an independent gamma series in
        tests/test_r3ai_ops.py. Both folds are runtime-length
        Catalyst aggregates — no UDF, no driver round-trip."""
        y = x.cast("double") / F.lit(2.0)
        dfi = df.cast("int")
        k_e = (dfi / F.lit(2)).cast("int")
        even_fold = F.aggregate(
            F.sequence(F.lit(1), k_e - F.lit(1)),
            F.struct(F.lit(1.0).alias("s"), F.lit(1.0).alias("t")),
            lambda acc, i: F.struct(
                (acc["s"] + acc["t"] * y
                 / i.cast("double")).alias("s"),
                (acc["t"] * y / i.cast("double")).alias("t")))["s"]
        sum_e = F.when(k_e <= F.lit(1), F.lit(1.0)).otherwise(even_fold)
        p_even = F.lit(1.0) - F.exp(-y) * sum_e
        k_o = ((dfi - F.lit(1)) / F.lit(2)).cast("int")
        t1 = F.lit(2.0) * F.sqrt(y / F.lit(math.pi))
        odd_fold = F.aggregate(
            F.sequence(F.lit(1), k_o - F.lit(1)),
            F.struct(t1.alias("s"), t1.alias("t")),
            lambda acc, j: F.struct(
                (acc["s"] + acc["t"] * y
                 / (j.cast("double") + F.lit(0.5))).alias("s"),
                (acc["t"] * y
                 / (j.cast("double") + F.lit(0.5))).alias("t")))["s"]
        sum_o = (F.when(k_o == F.lit(0), F.lit(0.0))
                 .when(k_o == F.lit(1), t1).otherwise(odd_fold))
        p_odd = cls._erf(F.sqrt(y)) - F.exp(-y) * sum_o
        return (F.when(x.cast("double") <= F.lit(0.0), F.lit(0.0))
                .otherwise(F.when(dfi % F.lit(2) == F.lit(0), p_even)
                           .otherwise(p_odd)))

    def _binom_pmf(self, n, p, kk):
        """C(n,k) p^k (1-p)^(n-k) with exact factorials (n <= 20)."""
        c = (F.factorial(n.cast("int")).cast("double")
             / (F.factorial(kk.cast("int")).cast("double")
                * F.factorial((n - kk).cast("int")).cast("double")))
        return (F.when((kk < F.lit(0)) | (kk.cast("double") > n),
                       F.lit(0.0))
                .otherwise(c * self._powi(p, kk)
                           * self._powi(F.lit(1.0) - p,
                                        n - kk.cast("double"))))

    def _dist_cdf(self, d: "_Dist", x):
        """commons-math cumulativeProbability closed forms, branch
        structure mirrored per class (cited on each kind)."""
        P = d.p
        if d.kind == "empirical":
            return self._empirical_cdf(d, x)
        if d.kind == "mvn":
            raise ValueError(
                "cumulativeProbability: not defined for a "
                "multivariate normal (the reference's commons-math "
                "MultivariateNormalDistribution has density/sample "
                "only)")
        if d.kind == "normal":
            # NormalDistribution.cumulativeProbability =
            # 0.5 * erfc(-(x-m)/(sd*sqrt(2)))
            return F.lit(0.5) * (F.lit(1.0) + self._erf(
                (x - P["mean"]) / (P["sd"] * F.sqrt(F.lit(2.0)))))
        if d.kind == "uniform":
            return (F.when(x <= P["lo"], F.lit(0.0))
                    .when(x >= P["hi"], F.lit(1.0))
                    .otherwise((x - P["lo"]) / (P["hi"] - P["lo"])))
        if d.kind == "uniformInt":
            # (k - lower + 1) / (upper - lower + 1), clamped
            return (F.when(x < P["lo"], F.lit(0.0))
                    .when(x >= P["hi"], F.lit(1.0))
                    .otherwise((x - P["lo"] + F.lit(1.0))
                               / (P["hi"] - P["lo"] + F.lit(1.0))))
        if d.kind == "binomial":
            kk = x.cast("int")
            return (F.when(kk < F.lit(0), F.lit(0.0))
                    .when(kk.cast("double") >= P["n"], F.lit(1.0))
                    .otherwise(F.aggregate(
                        F.sequence(F.lit(0), kk), F.lit(0.0),
                        lambda acc, i: acc + self._binom_pmf(
                            P["n"], P["p"], i))))
        if d.kind == "poisson":
            kk = x.cast("int")
            return (F.when(kk < F.lit(0), F.lit(0.0))
                    .otherwise(F.aggregate(
                        F.sequence(F.lit(0), kk), F.lit(0.0),
                        lambda acc, i: acc + self._dist_pmf(d, i))))
        if d.kind == "geometric":
            kk = x.cast("int")
            return (F.when(kk < F.lit(0), F.lit(0.0))
                    .otherwise(F.lit(1.0) - self._powi(
                        F.lit(1.0) - P["p"],
                        kk.cast("double") + F.lit(1.0))))
        if d.kind == "zipf":
            kk = x.cast("int")
            h_n = F.aggregate(
                F.sequence(F.lit(1), P["n"].cast("int")), F.lit(0.0),
                lambda acc, i: acc + F.lit(1.0)
                / self._powi(i.cast("double"), P["s"]))
            h_k = F.aggregate(
                F.sequence(F.lit(1), kk), F.lit(0.0),
                lambda acc, i: acc + F.lit(1.0)
                / self._powi(i.cast("double"), P["s"]))
            return (F.when(kk < F.lit(1), F.lit(0.0))
                    .when(kk.cast("double") >= P["n"], F.lit(1.0))
                    .otherwise(h_k / h_n))
        if d.kind == "constant":
            return F.when(x < P["c"], F.lit(0.0)).otherwise(F.lit(1.0))
        if d.kind == "triangular":
            aa, cc, bb = P["a"], P["c"], P["b"]
            return (F.when(x < aa, F.lit(0.0))
                    .when(x < cc, (x - aa) * (x - aa)
                          / ((bb - aa) * (cc - aa)))
                    .when(x == cc, (cc - aa) / (bb - aa))
                    .when(x <= bb, F.lit(1.0) - (bb - x) * (bb - x)
                          / ((bb - aa) * (bb - cc)))
                    .otherwise(F.lit(1.0)))
        if d.kind == "lognormal":
            return (F.when(x <= F.lit(0.0), F.lit(0.0))
                    .otherwise(F.lit(0.5) + F.lit(0.5) * self._erf(
                        (F.log(x) - P["m"])
                        / (P["s"] * F.sqrt(F.lit(2.0))))))
        if d.kind == "weibull":
            return (F.when(x <= F.lit(0.0), F.lit(0.0))
                    .otherwise(F.lit(1.0) - F.exp(
                        -self._powi(x / P["be"], P["al"]))))
        if d.kind == "gamma":
            y = x / P["th"]
            return (F.when(x <= F.lit(0.0), F.lit(0.0))
                    .otherwise(F.lit(1.0) - F.exp(-y) * F.aggregate(
                        F.sequence(F.lit(0),
                                   P["sh"].cast("int") - F.lit(1)),
                        F.lit(0.0),
                        lambda acc, i: acc + self._powi(y, i)
                        / F.factorial(i).cast("double"))))
        if d.kind == "beta":
            nn = (P["al"] + P["be"]).cast("int") - F.lit(1)
            return (F.when(x <= F.lit(0.0), F.lit(0.0))
                    .when(x >= F.lit(1.0), F.lit(1.0))
                    .otherwise(F.aggregate(
                        F.sequence(P["al"].cast("int"), nn),
                        F.lit(0.0),
                        lambda acc, j: acc + self._binom_pmf(
                            nn.cast("double"), x, j))))
        if d.kind == "enumerated":
            # sum of sample frequencies at values <= k over n (one
            # division — the reference sums per-distinct freq/n
            # doubles; few-ulp divergence, inside round-6)
            return (F.size(F.filter(P["arr"],
                                    lambda v: v.cast("double") <= x))
                    .cast("double")
                    / F.size(P["arr"]).cast("double"))
        if d.kind == "enumerated2":
            return F.aggregate(
                F.zip_with(P["vals"], P["probs"],
                           lambda v, pr: F.when(
                               v.cast("double") <= x,
                               pr.cast("double"))
                           .otherwise(F.lit(0.0))),
                F.lit(0.0), lambda acc, t: acc + t)
        raise ValueError(f"no cdf for distribution {d.kind!r}")

    def _empirical_cdf(self, d: "_Dist", x):
        """commons-math 3.6 EmpiricalDistribution
        .cumulativeProbability (EmpiricalDistributionEvaluator
        .java:33): equal-width bins over [min, max], binIndex =
        min(max(ceil((v-min)/delta) - 1, 0), bins-1); each bin's
        kernel is Normal(mean, sample-sd) — or the constant
        distribution at the mean when the bin has one value or zero
        variance — and cdf = pBminus + pB * (K(x) - K(lo)) /
        (K(hi) - K(lo)) with lo = min for bin 0 else min + delta*i,
        hi = max for the last bin else min + delta*(i+1). The
        normal kernel uses the shared A&S erf (the documented
        <= 1.5e-7 divergence from commons-math, inside round-6).
        One codegen expression over the bounded sorted cell."""
        P = d.p
        B = P["bins"]

        # staged with _let1 so the A&S erf's ~8x argument expansion
        # multiplies cheap lambda-variable references, not whole
        # aggregate subtrees (the array_repeat-staging family of
        # fix — an unstaged version OOMs Catalyst codegen)
        def body(sv):
            n = F.size(sv).cast("double")
            mn = F.get(sv, 0).cast("double")
            mx = F.element_at(sv, -1).cast("double")
            delta = (mx - mn) / F.lit(float(B))

            def bidx(v):
                return F.least(
                    F.greatest(F.ceil((v - mn) / delta).cast("int")
                               - F.lit(1), F.lit(0)),
                    F.lit(B - 1))

            def with_i(i):
                binv = F.filter(
                    sv, lambda v: bidx(v.cast("double")) == i)
                nbefore = F.size(F.filter(
                    sv, lambda v: bidx(v.cast("double")) < i))
                stats = _let1(binv, lambda bv: F.struct(
                    F.size(bv).cast("double").alias("nb"),
                    F.aggregate(
                        bv, F.lit(0.0),
                        lambda t, v: t + v.cast("double"))
                    .alias("sm"),
                    F.aggregate(
                        bv, F.lit(0.0),
                        lambda t, v: t + v.cast("double")
                        * v.cast("double")).alias("ssq")))
                pre = F.struct(
                    stats.alias("st"),
                    nbefore.cast("double").alias("nbef"),
                    (F.when(i == F.lit(0), mn)
                     .otherwise(mn + delta * i.cast("double")))
                    .alias("lo"),
                    (F.when(i == F.lit(B - 1), mx)
                     .otherwise(mn + delta * (i.cast("double")
                                              + F.lit(1.0))))
                    .alias("hi"))
                return _let1(pre, lambda pv: formula(pv))

            def formula(pv):
                # safe denominators: the nb==0 and nb==1 branches
                # are overridden downstream (ANSI mode would error
                # on an eager 0-division inside the staging struct)
                nb = F.greatest(pv["st"]["nb"], F.lit(1.0))
                nb1 = F.greatest(pv["st"]["nb"] - F.lit(1.0),
                                 F.lit(1.0))
                mean = pv["st"]["sm"] / nb
                var = ((pv["st"]["ssq"] - pv["st"]["sm"]
                        * pv["st"]["sm"] / nb) / nb1)
                core = F.struct(mean.alias("mean"),
                                var.alias("var"),
                                F.sqrt(F.abs(var)).alias("sd"))
                return _let1(core, lambda cv: formula2(pv, cv))

            def formula2(pv, cv):
                nb = pv["st"]["nb"]
                lo, hi = pv["lo"], pv["hi"]

                def kn(z):
                    return F.lit(0.5) * (F.lit(1.0) + self._erf(
                        (z - cv["mean"])
                        / (cv["sd"] * F.sqrt(F.lit(2.0)))))

                def kc(z):
                    return (F.when(z < cv["mean"], F.lit(0.0))
                            .otherwise(F.lit(1.0)))

                isconst = ((nb <= F.lit(1.0))
                           | (cv["var"] <= F.lit(0.0)))
                within = (F.when(isconst,
                                 (kc(x) - kc(lo))
                                 / (kc(hi) - kc(lo)))
                          .otherwise((kn(x) - kn(lo))
                                     / (kn(hi) - kn(lo))))
                # an EMPTY probe bin: pB = 0 and the reference
                # builds a NaN kernel (commons-math constructs a
                # Normal(NaN, NaN) from the empty SummaryStatistics
                # and returns NaN); the engine returns the
                # well-defined left limit pBminus instead
                # (documented divergence)
                return (F.when(x < mn, F.lit(0.0))
                        .when(x >= mx, F.lit(1.0))
                        .when(pv["st"]["nb"] == F.lit(0.0),
                              pv["nbef"] / n)
                        .otherwise(pv["nbef"] / n
                                   + (nb / n) * within))

            return _let1(bidx(x), with_i)

        return _let1(P["s"], body)

    def _mvn_density(self, d: "_Dist", xv):
        """MultivariateNormalDistribution.density for the 2-D case
        (the engine's closed-form domain): with covariance
        [[a, b], [c, dd]] and dx = x - mu, q = (dd*dx0^2 -
        (b+c)*dx0*dx1 + a*dx1^2) / det, density = exp(-q/2) /
        (2 pi sqrt(det)) — Cramer's inverse folded into the
        quadratic form. The reference diagonalizes; same value."""
        P = d.p
        means, cov = P["means"], P["cov"]
        x0 = F.get(xv, 0).cast("double")
        x1 = F.get(xv, 1).cast("double")
        aa = F.get(F.get(cov, 0), 0)
        b = F.get(F.get(cov, 0), 1)
        c = F.get(F.get(cov, 1), 0)
        dd = F.get(F.get(cov, 1), 1)
        det = aa * dd - b * c
        dx = x0 - F.get(means, 0)
        dy = x1 - F.get(means, 1)
        q = (dd * dx * dx - (b + c) * dx * dy + aa * dy * dy) / det
        return (F.exp(F.lit(-0.5) * q)
                / (F.lit(2.0 * math.pi) * F.sqrt(det)))

    def _dist_pmf(self, d: "_Dist", kk):
        """IntegerDistribution.probability(k) closed forms."""
        P = d.p
        kd = kk.cast("double")
        if d.kind == "uniformInt":
            return (F.when((kd < P["lo"]) | (kd > P["hi"]), F.lit(0.0))
                    .otherwise(F.lit(1.0)
                               / (P["hi"] - P["lo"] + F.lit(1.0))))
        if d.kind == "binomial":
            return self._binom_pmf(P["n"], P["p"], kk)
        if d.kind == "poisson":
            return (F.when(kk < F.lit(0), F.lit(0.0))
                    .otherwise(F.exp(-P["lam"])
                               * self._powi(P["lam"], kd)
                               / F.factorial(kk.cast("int"))
                               .cast("double")))
        if d.kind == "geometric":
            return (F.when(kk < F.lit(0), F.lit(0.0))
                    .otherwise(P["p"] * self._powi(
                        F.lit(1.0) - P["p"], kd)))
        if d.kind == "zipf":
            h_n = F.aggregate(
                F.sequence(F.lit(1), P["n"].cast("int")), F.lit(0.0),
                lambda acc, i: acc + F.lit(1.0)
                / self._powi(i.cast("double"), P["s"]))
            return (F.when((kd < F.lit(1.0)) | (kd > P["n"]),
                           F.lit(0.0))
                    .otherwise(F.lit(1.0) / self._powi(kd, P["s"])
                               / h_n))
        if d.kind == "enumerated":
            return (F.size(F.filter(P["arr"],
                                    lambda v: v.cast("double") == kd))
                    .cast("double")
                    / F.size(P["arr"]).cast("double"))
        if d.kind == "enumerated2":
            return F.aggregate(
                F.zip_with(P["vals"], P["probs"],
                           lambda v, pr: F.when(
                               v.cast("double") == kd,
                               pr.cast("double"))
                           .otherwise(F.lit(0.0))),
                F.lit(0.0), lambda acc, t: acc + t)
        raise ValueError(f"no pmf for distribution {d.kind!r}")

    def _dist_pdf(self, d: "_Dist", x):
        """RealDistribution.density closed forms."""
        P = d.p
        if d.kind == "normal":
            z = (x - P["mean"]) / P["sd"]
            return (F.exp(F.lit(-0.5) * z * z)
                    / (P["sd"]
                       * F.sqrt(F.lit(2.0) * F.lit(math.pi))))
        if d.kind == "uniform":
            return (F.when((x < P["lo"]) | (x > P["hi"]), F.lit(0.0))
                    .otherwise(F.lit(1.0) / (P["hi"] - P["lo"])))
        if d.kind == "constant":
            # ConstantRealDistribution.density: 1 at the point
            return F.when(x == P["c"], F.lit(1.0)).otherwise(F.lit(0.0))
        if d.kind == "triangular":
            aa, cc, bb = P["a"], P["c"], P["b"]
            return (F.when(x < aa, F.lit(0.0))
                    .when(x < cc, F.lit(2.0) * (x - aa)
                          / ((bb - aa) * (cc - aa)))
                    .when(x == cc, F.lit(2.0) / (bb - aa))
                    .when(x <= bb, F.lit(2.0) * (bb - x)
                          / ((bb - aa) * (bb - cc)))
                    .otherwise(F.lit(0.0)))
        if d.kind == "lognormal":
            z = (F.log(x) - P["m"]) / P["s"]
            return (F.when(x <= F.lit(0.0), F.lit(0.0))
                    .otherwise(F.exp(F.lit(-0.5) * z * z)
                               / (x * P["s"]
                                  * F.sqrt(F.lit(2.0)
                                           * F.lit(math.pi)))))
        if d.kind == "weibull":
            xs = x / P["be"]
            xp = self._powi(xs, P["al"] - F.lit(1.0))
            return (F.when(x < F.lit(0.0), F.lit(0.0))
                    .otherwise((P["al"] / P["be"]) * xp
                               * F.exp(-(xp * xs))))
        if d.kind == "gamma":
            y = x / P["th"]
            return (F.when(x <= F.lit(0.0), F.lit(0.0))
                    .otherwise(self._powi(y, P["sh"] - F.lit(1.0))
                               * F.exp(-y)
                               / (F.factorial(P["sh"].cast("int")
                                              - F.lit(1))
                                  .cast("double") * P["th"])))
        if d.kind == "beta":
            inv_b = (F.factorial((P["al"] + P["be"]).cast("int")
                                 - F.lit(1)).cast("double")
                     / (F.factorial(P["al"].cast("int") - F.lit(1))
                        .cast("double")
                        * F.factorial(P["be"].cast("int") - F.lit(1))
                        .cast("double")))
            return (F.when((x <= F.lit(0.0)) | (x >= F.lit(1.0)),
                           F.lit(0.0))
                    .otherwise(self._powi(x, P["al"] - F.lit(1.0))
                               * self._powi(F.lit(1.0) - x,
                                            P["be"] - F.lit(1.0))
                               * inv_b))
        raise ValueError(f"no density for distribution {d.kind!r}")

    def _dist_sample(self, d: "_Dist", seed_slot: int):
        """One random draw (SampleEvaluator). rand()/randn() are
        Spark's per-row generators; seed_slot decorrelates multiple
        draws in one tuple. Kinds with closed-form inverse CDFs;
        others raise (the laws cover the supported set)."""
        P = d.p
        u = F.rand()
        if d.kind == "mvn":
            # 2-D Cholesky transform: x = mu + L z with
            # L = [[sqrt(a), 0], [b/sqrt(a), sqrt(d - b^2/a)]]
            means, cov = P["means"], P["cov"]
            aa = F.get(F.get(cov, 0), 0)
            b = F.get(F.get(cov, 0), 1)
            dd = F.get(F.get(cov, 1), 1)
            l11 = F.sqrt(aa)
            l21 = b / l11
            l22 = F.sqrt(dd - l21 * l21)
            z1, z2 = F.randn(), F.randn()
            return F.array(F.get(means, 0) + l11 * z1,
                           F.get(means, 1) + l21 * z1 + l22 * z2)
        if d.kind == "normal":
            return P["mean"] + P["sd"] * F.randn()
        if d.kind == "lognormal":
            return F.exp(P["m"] + P["s"] * F.randn())
        if d.kind == "uniform":
            return P["lo"] + (P["hi"] - P["lo"]) * u
        if d.kind == "uniformInt":
            return F.floor(P["lo"] + (P["hi"] - P["lo"] + F.lit(1.0))
                           * u).cast("int")
        if d.kind == "constant":
            return P["c"]
        if d.kind == "geometric":
            return F.floor(F.log(F.lit(1.0) - u)
                           / F.log(F.lit(1.0) - P["p"])).cast("int")
        if d.kind == "weibull":
            return P["be"] * F.exp(F.log(-F.log(F.lit(1.0) - u))
                                   / P["al"])
        if d.kind == "triangular":
            aa, cc, bb = P["a"], P["c"], P["b"]
            fc = (cc - aa) / (bb - aa)
            return (F.when(u < fc, aa + F.sqrt(u * (bb - aa)
                                               * (cc - aa)))
                    .otherwise(bb - F.sqrt((F.lit(1.0) - u)
                                           * (bb - aa) * (bb - cc))))
        if d.kind == "enumerated":
            arr = P["arr"]
            return F.get(arr, F.floor(u * F.size(arr)).cast("int"))
        raise ValueError(f"sample: no sampler for {d.kind!r}")

    # -- VectorFunction machinery (round-3ae wave) --------------------------

    @staticmethod
    def _vf_knots(a):
        """(x, y) knot Columns from the 1- or 2-operand evaluator
        forms (x = 0..n-1 when only y is given — the reference's
        y-only branch). Knot arrays are bounded cells."""
        if len(a) > 1:
            xs = F.transform(a[0], lambda v: v.cast("double"))
            ys = F.transform(a[1], lambda v: v.cast("double"))
        else:
            ys = F.transform(a[0], lambda v: v.cast("double"))
            xs = F.transform(
                F.sequence(F.lit(0), F.size(a[0]) - F.lit(1)),
                lambda i: i.cast("double"))
        return xs, ys

    @staticmethod
    def _horner(cf, t):
        """commons-math PolynomialFunction.value — descending Horner
        (result = c[n-1]; then result = t*result + c[j]). The oracle
        twin is list_reduce(list_reverse(cf), (acc, e) -> acc*t + e)
        — the identical left fold, so rounding matches bit-for-bit."""
        rev = F.reverse(cf)
        return F.aggregate(
            F.slice(rev, 2,
                    F.greatest(F.size(rev) - F.lit(1), F.lit(0))),
            F.element_at(rev, 1).cast("double"),
            lambda acc, e: acc * t + e)

    def _vf_value(self, vf: "_VFunc", z):
        """func.value(z): global Horner for 'poly'; segment lookup +
        Horner at dx = z - x_i for 'pp' (segment = count(x <= z)
        clamped to [1, n-1], the binary-search twin)."""
        if vf.kind == "poly":
            return self._horner(vf.coefs, z)
        if vf.kind == "gauss":
            # commons-math Gaussian.value: norm * exp(-(z-mean)^2
            # / (2 sigma^2)) with coefs [norm, mean, sigma]
            p0, p1, p2 = (F.get(vf.coefs, i) for i in range(3))
            return p0 * F.exp(-((z - p1) * (z - p1))
                              / (F.lit(2.0) * p2 * p2))
        if vf.kind == "harm":
            # commons-math HarmonicOscillator.value:
            # a * cos(omega z + phi) with coefs [a, omega, phi]
            return (F.get(vf.coefs, 0)
                    * F.cos(F.get(vf.coefs, 1) * z
                            + F.get(vf.coefs, 2)))
        idx = F.size(F.filter(vf.lx, lambda v: v <= z))
        i = F.least(F.greatest(idx, F.lit(1)),
                    F.size(vf.lx) - F.lit(1))
        x0 = F.get(vf.lx, i - F.lit(1)).cast("double")
        cf = F.get(vf.coefs, i - F.lit(1))
        return self._horner(cf, z - x0)

    @staticmethod
    def _poly_deriv(cf):
        """[c0, c1, c2, ...] -> [c1, 2*c2, 3*c3, ...] (commons-math
        PolynomialFunction.polynomialDerivative coefficient order)."""
        return F.zip_with(
            F.slice(cf, 2, F.greatest(F.size(cf) - F.lit(1),
                                      F.lit(0))),
            F.sequence(F.lit(1),
                       F.greatest(F.size(cf) - F.lit(1), F.lit(1))),
            lambda c, k: c.cast("double") * k.cast("double"))

    @staticmethod
    def _poly_antideriv(cf):
        """[c0, c1, ...] -> [0, c0, c1/2, c2/3, ...] (the exact
        antiderivative the closed-form integrate uses)."""
        return F.concat(
            F.array(F.lit(0.0)),
            F.zip_with(cf, F.sequence(F.lit(1), F.size(cf)),
                       lambda c, k: c.cast("double")
                       / k.cast("double")))

    def _vf_integral(self, vf: "_VFunc", z):
        """Exact integral of the fitted function from x0 to z
        (clamped segment evaluation like _vf_value). For 'poly' the
        global antiderivative difference; for 'pp' the prefix sum of
        full-segment integrals plus the partial head segment —
        an ascending left fold (the oracle mirrors the order)."""
        if vf.kind == "poly":
            anti = self._poly_antideriv(vf.coefs)
            return self._horner(anti, z)
        if vf.kind == "gauss":
            # antiderivative: norm*sigma*sqrt(pi/2)
            # * erf((z-mean)/(sigma*sqrt(2))) — the A&S erf the
            # distribution family already pins (<= 1.5e-7 vs the
            # reference's Romberg, inside the round-6 staging)
            p0, p1, p2 = (F.get(vf.coefs, i) for i in range(3))
            return (p0 * p2 * F.lit(math.sqrt(math.pi / 2.0))
                    * self._erf((z - p1)
                                / (p2 * F.lit(math.sqrt(2.0)))))
        if vf.kind == "harm":
            # antiderivative: (a/omega) sin(omega z + phi)
            return ((F.get(vf.coefs, 0) / F.get(vf.coefs, 1))
                    * F.sin(F.get(vf.coefs, 1) * z
                            + F.get(vf.coefs, 2)))
        n = F.size(vf.lx)
        idx = F.size(F.filter(vf.lx, lambda v: v <= z))
        i = F.least(F.greatest(idx, F.lit(1)), n - F.lit(1))
        # full segments j = 0..i-2, then partial on segment i-1
        segs = F.zip_with(
            F.sequence(F.lit(1), n - F.lit(1)),
            vf.coefs,
            lambda j, cf: F.struct(j.alias("j"), cf.alias("cf")))
        vfself = vf

        def _seg_term(s):
            j = s["j"]
            cf = s["cf"]
            x_lo = F.get(vfself.lx, j - F.lit(1)).cast("double")
            x_hi = F.get(vfself.lx, j).cast("double")
            anti = self._poly_antideriv(cf)
            return (F.when(j < i, self._horner(anti, x_hi - x_lo))
                    .when(j == i, self._horner(anti, z - x_lo))
                    .otherwise(F.lit(0.0)))

        return F.aggregate(segs, F.lit(0.0),
                           lambda acc, s: acc + _seg_term(s))

    def _spline_coefs(self, xs, ys):
        """commons-math SplineInterpolator.interpolate — the natural
        cubic tridiagonal sweep mirrored line-for-line: forward fold
        g = 2*(x[i+1]-x[i-1]) - h[i-1]*mu[i-1]; mu[i] = h[i]/g;
        z[i] = (3*(y[i+1]*h[i-1] - y[i]*(x[i+1]-x[i-1])
        + y[i-1]*h[i]) / (h[i-1]*h[i]) - h[i-1]*z[i-1]) / g; then the
        backward c sweep and the b/d closures. Both folds are
        list-of-struct accumulators with DuckDB list_reduce twins of
        identical order."""
        n = F.size(xs)
        # i = 1..n-2 prep: {hp, hi, xd, num} (bounded-cell gets over
        # attribute arrays — no HOF re-evaluation blowup)
        mid = F.when(n >= 3, F.transform(
            F.sequence(F.lit(1), n - F.lit(2)),
            lambda i: F.struct(
                (F.get(xs, i) - F.get(xs, i - F.lit(1))).alias("hp"),
                (F.get(xs, i + F.lit(1)) - F.get(xs, i)).alias("hi"),
                (F.get(xs, i + F.lit(1))
                 - F.get(xs, i - F.lit(1))).alias("xd"),
                (F.lit(3.0)
                 * (F.get(ys, i + F.lit(1))
                    * (F.get(xs, i) - F.get(xs, i - F.lit(1)))
                    - F.get(ys, i) * (F.get(xs, i + F.lit(1))
                                      - F.get(xs, i - F.lit(1)))
                    + F.get(ys, i - F.lit(1))
                    * (F.get(xs, i + F.lit(1)) - F.get(xs, i)))
                 / ((F.get(xs, i) - F.get(xs, i - F.lit(1)))
                    * (F.get(xs, i + F.lit(1)) - F.get(xs, i))))
                .alias("num")))) \
            .otherwise(F.expr(
                "array()").cast(
                "array<struct<hp:double,hi:double,xd:double,"
                "num:double>>"))
        fwd = F.aggregate(
            mid,
            F.array(F.struct(F.lit(0.0).alias("mu"),
                             F.lit(0.0).alias("z"))),
            lambda acc, e: F.concat(acc, F.array(F.struct(
                (e["hi"] / (F.lit(2.0) * e["xd"]
                            - e["hp"] * F.element_at(acc, -1)["mu"]))
                .alias("mu"),
                ((e["num"] - e["hp"] * F.element_at(acc, -1)["z"])
                 / (F.lit(2.0) * e["xd"]
                    - e["hp"] * F.element_at(acc, -1)["mu"]))
                .alias("z")))))
        # backward: c[n-1] = 0; c[j] = z[j] - mu[j]*c[j+1].
        # cs is referenced 4x per segment below — bind it ONCE via
        # _let1 (tree-duplication guard).
        cs = F.aggregate(
            F.reverse(fwd),
            F.array(F.lit(0.0)),
            lambda acc, e: F.concat(
                F.array(e["z"] - e["mu"] * F.element_at(acc, 1)),
                acc))
        return _let1(cs, lambda c: F.transform(
            F.sequence(F.lit(0), n - F.lit(2)),
            lambda j: F.array(
                F.get(ys, j),
                # b[j] = (y[j+1]-y[j])/h[j] - h[j]*(c[j+1]+2c[j])/3
                (F.get(ys, j + F.lit(1)) - F.get(ys, j))
                / (F.get(xs, j + F.lit(1)) - F.get(xs, j))
                - (F.get(xs, j + F.lit(1)) - F.get(xs, j))
                * (F.get(c, j + F.lit(1))
                   + F.lit(2.0) * F.get(c, j)) / F.lit(3.0),
                F.get(c, j),
                # d[j] = (c[j+1]-c[j])/(3*h[j])
                (F.get(c, j + F.lit(1)) - F.get(c, j))
                / (F.lit(3.0) * (F.get(xs, j + F.lit(1))
                                 - F.get(xs, j))))))

    def _akima_coefs(self, xs, ys):
        """commons-math AkimaSplineInterpolator.interpolate (n >= 5):
        segment slopes d_i; weights w_i = |d_i - d_{i-1}|; interior
        derivatives (wP*d[i-1] + wM*d[i])/(wP+wM) with the flat
        x-weighted fallback when both weights vanish; endpoint
        derivatives by the three-point quadratic
        (differentiateThreePoint); Hermite segment coefficients
        c2 = (3*(y1-y0)/w - 2*fd0 - fd1)/w,
        c3 = (2*(y0-y1)/w + fd0 + fd1)/w^2. Precision.equals(w, 0)
        is mirrored as w == 0.0 (documented — the 1-ulp band differs
        only on adversarial inputs)."""
        n = F.size(xs)
        diffs = F.transform(
            F.sequence(F.lit(0), n - F.lit(2)),
            lambda i: (F.get(ys, i + F.lit(1)) - F.get(ys, i))
            / (F.get(xs, i + F.lit(1)) - F.get(xs, i)))

        def _d3p(at, i0, i1, i2):
            # differentiateThreePoint: quadratic through (x_{i0..2},
            # y_{i0..2}) differentiated at x_at
            y0 = F.get(ys, i0)
            y1 = F.get(ys, i1)
            y2 = F.get(ys, i2)
            t = F.get(xs, at) - F.get(xs, i0)
            t1 = F.get(xs, i1) - F.get(xs, i0)
            t2 = F.get(xs, i2) - F.get(xs, i0)
            qa = (y2 - y0 - (t2 / t1 * (y1 - y0))) \
                / (t2 * t2 - t1 * t2)
            qb = (y1 - y0 - (qa * t1 * t1)) / t1
            return F.lit(2.0) * qa * t + qb

        def _fd(i):
            # i is a 0-based int Column
            dp = F.get(diffs, i - F.lit(1))   # d[i-1]
            di = F.get(diffs, i)              # d[i]
            w_p = F.abs(F.get(diffs, i + F.lit(1)) - di)   # w[i+1]
            w_m = F.abs(dp - F.get(diffs, i - F.lit(2)))   # w[i-1]
            flat = (((F.get(xs, i + F.lit(1)) - F.get(xs, i)) * dp)
                    + ((F.get(xs, i) - F.get(xs, i - F.lit(1)))
                       * di)) \
                / (F.get(xs, i + F.lit(1))
                   - F.get(xs, i - F.lit(1)))
            wt = (w_p * dp + w_m * di) / (w_p + w_m)
            return (
                F.when(i == 0, _d3p(F.lit(0), F.lit(0), F.lit(1),
                                    F.lit(2)))
                .when(i == 1, _d3p(F.lit(1), F.lit(0), F.lit(1),
                                   F.lit(2)))
                .when(i == n - F.lit(2),
                      _d3p(n - F.lit(2), n - F.lit(3), n - F.lit(2),
                           n - F.lit(1)))
                .when(i == n - F.lit(1),
                      _d3p(n - F.lit(1), n - F.lit(3), n - F.lit(2),
                           n - F.lit(1)))
                .when((w_p == F.lit(0.0)) & (w_m == F.lit(0.0)),
                      flat)
                .otherwise(wt))

        fds = F.transform(F.sequence(F.lit(0), n - F.lit(1)), _fd)
        # fds referenced 2x per segment — bind once (_let1 guard)
        return _let1(fds, lambda fd: F.transform(
            F.sequence(F.lit(0), n - F.lit(2)),
            lambda j: self._hermite_cf(
                F.get(xs, j + F.lit(1)) - F.get(xs, j),
                F.get(ys, j), F.get(ys, j + F.lit(1)),
                F.get(fd, j), F.get(fd, j + F.lit(1)))))

    @staticmethod
    def _hermite_cf(w, y0, y1, fd0, fd1):
        return F.array(
            y0, fd0,
            (F.lit(3.0) * (y1 - y0) / w - F.lit(2.0) * fd0 - fd1) / w,
            (F.lit(2.0) * (y0 - y1) / w + fd0 + fd1) / (w * w))

    def _polyfit_coefs(self, xs, ys, deg: int):
        """Least squares via normal equations + Cramer (det_expr —
        the same generator emits the oracle SQL, so evaluation order
        matches). S_k = sum x^k, T_k = sum x^k*y as ascending folds."""
        def _pow(v, k):
            out = None
            for _ in range(k):
                out = v if out is None else out * v
            return F.lit(1.0) if out is None else out

        def _ssum(k):
            return F.aggregate(xs, F.lit(0.0),
                               lambda acc, v: acc + _pow(v, k))

        def _tsum(k):
            return F.aggregate(
                F.zip_with(xs, ys,
                           lambda v, y: _pow(v, k) * y),
                F.lit(0.0), lambda acc, t: acc + t)

        m = deg + 1
        # bind the moment vectors ONCE (_let1): the Cramer expansion
        # references each S_k up to 4! times — unbound, the deg-3
        # tree OOMs the plan
        sv = F.array(*[_ssum(k) for k in range(2 * deg + 1)])
        tv = F.array(*[_tsum(k) for k in range(m)])

        def _with(svec, tvec):
            S = [F.get(svec, k) for k in range(2 * deg + 1)]
            T = [F.get(tvec, k) for k in range(m)]
            A = [[S[i + j] for j in range(m)] for i in range(m)]
            mul = lambda p, q: p * q
            add = lambda p, q: p + q
            sub = lambda p, q: p - q
            den = det_expr(A, mul, add, sub)
            cols = []
            for k in range(m):
                Ak = [[(T[i] if j == k else A[i][j])
                       for j in range(m)] for i in range(m)]
                cols.append(det_expr(Ak, mul, add, sub) / den)
            return F.array(*cols)

        return _let1(sv, lambda s: _let1(tv, lambda t: _with(s, t)))

    def _s_knn(self, e: StreamExpr) -> DataFrame:
        """KnnStream (solrj/io/stream/KnnStream.java:63): the k most
        similar docs to ``id`` via MoreLikeThis over ``qf`` — the
        reference issues an MLT request; here the engine's in-plan MLT
        (interesting-term selection + scored disjunction, no driver
        round-trip) plugs in through the ``mlt`` callable exactly like
        full-text ``q`` plugs in through ``text_search``."""
        if self.mlt is None:
            raise ValueError("knn() needs an mlt callable")
        qf = e.params.get("qf", "text")
        if qf != "text":
            raise ValueError("knn(): only the analyzed 'text' field "
                             "is indexed")
        return self.mlt(e.args[0], int(e.params["id"]),
                        int(e.params.get("k", "10")))

    def _s_significantTerms(self, e: StreamExpr) -> DataFrame:
        """SignificantTermsStream (solrj/io/stream/
        SignificantTermsStream.java; scoring in solr/core/.../search/
        SignificantTermsQParserPlugin.java:206): per dictionary term,
        fg = number of FOREGROUND (q-matched) docs containing it,
        background docFreq over the whole collection, and

            score = (float)ln(fg) * (float)(ln((numDocs+1)/(df+1)) + 1)

        with the reference's exact float32 cast points (:206 — the
        ratio is computed in FLOAT because (float)(numDocs+1) infects
        the division; float-via-double double-rounding is exact for
        p=24 in 53-bit, so the CAST chain reproduces the bits).
        minDocFreq/maxDocFreq are absolute when >= 1, fractions of
        numDocs when < 1 (:167-178); minTermLength (:182); top
        numTerms by score (ties term ASC).

        Scale shape: two explode+groupBy passes (fg over the matched
        slice, df over the corpus — both map-side combinable), one
        vocabulary-sized equi-join, numDocs as a 1-row broadcast, and
        a TakeOrderedAndProject for the top slice."""
        from ..analysis.analyzers import simple_tokens_col
        coll = e.args[0]
        full = self.collections[coll]
        fgd = self._apply_q(coll, full, e.params.get("q", "*:*"))
        field = e.params.get("field", "text")
        tok = F.explode(F.array_distinct(
            simple_tokens_col(field))).alias("term")
        fg = (fgd.select(tok).groupBy("term")
              .agg(F.count("*").cast("long").alias("fg")))
        bg = (full.select(tok).groupBy("term")
              .agg(F.count("*").cast("long").alias("df")))
        nd = full.agg(F.count("*").cast("long").alias("num_docs"))
        j = fg.join(bg, "term").crossJoin(F.broadcast(nd))
        min_df = float(e.params.get("minDocFreq", "5"))
        max_df = float(e.params.get("maxDocFreq", "0.3"))
        min_len = int(e.params.get("minTermLength", "4"))
        lo = (F.col("df") >= min_df if min_df >= 1.0
              else F.col("df") / F.col("num_docs") >= min_df)
        hi = (F.col("df") <= max_df if max_df >= 1.0
              else F.col("df") / F.col("num_docs") <= max_df)
        score = (
            "CAST(CAST(ln(CAST(fg AS DOUBLE)) AS FLOAT) * CAST(ln("
            "CAST(CAST(CAST(num_docs + 1 AS FLOAT) AS DOUBLE) / "
            "CAST(CAST(df + 1 AS FLOAT) AS DOUBLE) AS FLOAT)) + 1.0 "
            "AS FLOAT) AS FLOAT)")
        out = (j.filter(lo & hi & (F.length("term") >= min_len))
               .select("term", "fg", "df", F.expr(score).alias("score"))
               .orderBy(F.desc("score"), F.asc("term")))
        if "numTerms" in e.params:
            out = out.limit(int(e.params["numTerms"]))
        return out

    def _s_tuple(self, e: StreamExpr) -> DataFrame:
        """TupStream (solrj/io/stream/TupStream.java:52): ONE tuple of
        named values — the leaf the math-expression guide pairs with
        let(). Each value is an evaluator tree or literal compiled to
        a Catalyst expression over a 1-row relation (spark.range(1)),
        so the whole tuple is a single whole-stage-codegen project on
        one row — no data scan at all. (The reference also allows a
        value to be a bound let() cell or stream; those land in cells
        as DataFrames and replay via get(), not tuple().)"""
        # inject referenced cells (col() value cells and _VFunc
        # model cells) as 1-row broadcast columns so evaluator trees
        # can name them
        base = self._cell_base(list(e.params.values()))
        cols = []
        with self._scoped(base.columns):
            for name, txt in e.params.items():
                node = (parse_stream(txt) if _NAME_RE.match(txt)
                        else txt)
                cols.append(_as_col(self._eval_col(node)).alias(name))
        if not cols:
            raise ValueError("tuple() needs at least one named value")
        return base.select(*cols)

    def _s_col(self, e: StreamExpr) -> DataFrame:
        """ColumnEvaluator (solrj/io/eval/ColumnEvaluator.java):
        ``col(cell, field)`` — pull one field of a let-bound stream
        into an array. The reference materializes a java.util.List on
        the driver (the math-expressions guide's working set is always
        a pulled series); here the array is ONE aggregated row that
        stays executor-side and broadcasts into tuple() consumers.

        Ordering: the reference keeps stream order; a hash aggregate
        has none, so elements sort by the cell's REMAINING columns
        ascending (for the canonical ``search(..., sort="id asc")``
        cell those coincide; documented divergence otherwise, pinned
        in tests).

        Scale shape: one collect_list shuffle to a single reducer —
        bounded by the SERIES length, so col() belongs on aggregated
        or sampled streams (a timeseries, a facet table), never the
        raw corpus; the array then rides broadcast joins."""
        cells = getattr(self, "_lets", {})
        cell = e.args[0] if e.args else None
        if not isinstance(cell, str) or cell not in cells:
            raise ValueError("col() first arg must be a bound let cell")
        field = e.args[1]
        df = cells[cell]
        if field not in df.columns:
            raise ValueError(f"col(): no field {field!r} in cell")
        order = [c for c in df.columns if c != field] or [field]
        st = F.struct(*[F.col(c) for c in order],
                      F.col(field).alias("_v"))
        arr = F.transform(F.sort_array(F.collect_list(st)),
                          lambda s: s["_v"])
        return df.agg(arr.alias("value"))

    def _s_let(self, e: StreamExpr) -> DataFrame:
        """LetStream (solrj/io/stream/LetStream.java:42): bind named
        cells to stream results, evaluate the body with the bindings
        in scope; ``get(name)`` (GetStream.java) replays a cell. Here
        a cell binds the stream's *plan* (lazy, like every DataFrame)
        rather than a materialized tuple list — Catalyst reuses or
        recomputes it per reference exactly as it would any shared
        subplan."""
        vars_prev = getattr(self, "_lets", {})
        vc_prev = getattr(self, "_value_cells", set())
        vf_prev = getattr(self, "_vfunc_cells", {})
        mc_prev = getattr(self, "_mat_cells", {})
        tc_prev = getattr(self, "_tuple_cells", set())
        cc_prev = getattr(self, "_obj_cells", {})
        self._lets = dict(vars_prev)
        self._value_cells = set(vc_prev)
        self._vfunc_cells = dict(vf_prev)
        self._mat_cells = dict(mc_prev)
        self._tuple_cells = set(tc_prev)
        self._obj_cells = dict(cc_prev)
        try:
            for name, txt in e.params.items():
                node = parse_stream(txt)
                if not isinstance(node, str) and node.name == "memset":
                    # MemsetEvaluator (solrj/io/eval/MemsetEvaluator
                    # .java:115 + LetStream.java:198 lets.putAll):
                    # the cell name itself is NOT bound — each vars=
                    # entry binds directly as a value cell
                    self._bind_memset(node)
                    continue
                if isinstance(node, str) \
                        or hasattr(self, f"_s_{node.name}"):
                    self._lets[name] = self.eval(node)
                    if not isinstance(node, str) \
                            and node.name in ("col", "cell"):
                        # a value cell: guaranteed 1-row array,
                        # eligible for broadcast injection into
                        # tuple()
                        self._value_cells.add(name)
                    if not isinstance(node, str) \
                            and node.name in ("tuple", "setValue"):
                        # a 1-row tuple cell: getValue()/setValue()
                        # can address its fields (injected as
                        # {name}__t_{field} broadcast columns)
                        self._tuple_cells.add(name)
                    continue
                # evaluator cell (the reference's let binds ANY
                # evaluator result). A _VFunc (spline/akima/lerp/
                # polyfit model) materializes ONCE as a 1-row
                # broadcast relation — consumers then reference
                # plain attributes, so N predict/derivative/
                # integrate calls over one model cost ONE fit (both
                # at analysis time — the Catalyst tree stays linear
                # — and at run time). Plain evaluator values bind
                # like col() value cells.
                base = self._cell_base([txt])
                with self._scoped(base.columns):
                    val = self._eval_col(node)
                if isinstance(val, _VFunc):
                    self._lets[name] = base.select(
                        val.lx.alias(f"{name}__vlx"),
                        val.coefs.alias(f"{name}__vcf"),
                        val.fitted.alias(f"{name}__vfit"))
                    self._vfunc_cells[name] = val.kind
                elif isinstance(val, _Mat):
                    # a labeled matrix materializes ONCE as a 1-row
                    # broadcast relation (the _VFunc pattern): N
                    # consumers cost one construction
                    null_s = F.lit(None).cast("array<string>")
                    cols = [val.rows.alias(f"{name}__mrows"),
                            (val.rlab if val.rlab is not None
                             else null_s).alias(f"{name}__mrlab"),
                            (val.clab if val.clab is not None
                             else null_s).alias(f"{name}__mclab")]
                    for k in sorted(val.attrs):
                        cols.append(val.attrs[k].alias(f"{name}__ma_{k}"))
                    src = val.base if val.base is not None else base
                    self._lets[name] = src.select(*cols)
                    self._mat_cells[name] = sorted(val.attrs)
                elif isinstance(val, (_Clus, _Hull, _Ball, _Ols,
                                      _BiFunc)):
                    # a blob-backed result object (clustering /
                    # convex hull / enclosing disk / multiple
                    # regression): ONE materialized blob row (one
                    # kernel invocation), N accessor consumers
                    src = (getattr(val, "base", None)
                           if getattr(val, "base", None) is not None
                           else base)
                    blob = (val.tup if isinstance(val, _Ols)
                            else val.blob)
                    self._lets[name] = src.select(
                        blob.alias(f"{name}__cblob"))
                    kind = {"_Clus": "clus", "_Hull": "hull",
                            "_Ball": "ball", "_Ols": "ols",
                            "_BiFunc": "bif"}[type(val).__name__]
                    self._obj_cells[name] = (
                        kind, val.fuzzy if kind == "clus" else None)
                else:
                    self._lets[name] = base.select(
                        _as_col(val).alias(name))
                    self._value_cells.add(name)
            body = [a for a in e.args if isinstance(a, StreamExpr)]
            if len(body) != 1:
                raise ValueError("let() needs exactly one body stream")
            return self.eval(body[0])
        finally:
            self._lets = vars_prev
            self._value_cells = vc_prev
            self._vfunc_cells = vf_prev
            self._mat_cells = mc_prev
            self._tuple_cells = tc_prev
            self._obj_cells = cc_prev

    def _bind_memset(self, node: StreamExpr) -> None:
        """MemsetEvaluator.java:115: drain the wrapped stream ONCE
        and bind each cols= field as a vars= value-cell array; size=
        caps the tuple count. The reference loads driver-side
        ArrayLists in arrival order; here the arrays are ONE
        aggregated row in full-tuple ascending order (the col()
        ordering contract, documented divergence) that stays
        executor-side and broadcasts into consumers. All vars share
        one tuple order by construction (a single sorted struct
        list), exactly like the reference's parallel arrays."""
        srcs = [x for x in node.args if isinstance(x, StreamExpr)]
        if len(srcs) != 1:
            raise ValueError("memset() wraps exactly one stream")
        src = self.eval(srcs[0])
        if "cols" not in node.params or "vars" not in node.params:
            raise ValueError("memset() needs cols= and vars= params")
        cols = [c.strip() for c in node.params["cols"].split(",")
                if c.strip()]
        vs = [v.strip() for v in node.params["vars"].split(",")
              if v.strip()]
        if len(cols) != len(vs):
            raise ValueError("memset(): cols and vars lists must be "
                             "the same size")
        size = int(node.params.get("size", -1))
        st = F.sort_array(F.collect_list(
            F.struct(*[F.col(c) for c in src.columns])))
        if size > -1:
            st = F.slice(st, 1, size)
        agg = src.agg(st.alias("_t"))

        def _extract(cname):
            # NOT `lambda s, c=c: s[c]` — a 2-parameter lambda is the
            # (element, index) HOF form and would bind c to the index
            return lambda s: s[cname]

        for c, v in zip(cols, vs):
            if c not in src.columns:
                raise ValueError(f"memset(): no column {c!r} in the "
                                 "wrapped stream")
            self._lets[v] = agg.select(
                F.transform(F.col("_t"), _extract(c)).alias(v))
            self._value_cells.add(v)

    def _s_setValue(self, e: StreamExpr) -> DataFrame:
        """SetValueEvaluator.java:44: a COPY of the tuple with one
        field set/overwritten — here a let-bound 1-row tuple cell
        with withColumn; string values keep their (unquoted) text,
        numerics their type, and any evaluator tree compiles against
        the cell's own columns."""
        cells = getattr(self, "_lets", {})
        if len(e.args) != 3:
            raise ValueError("setValue() needs (tuple, key, value)")
        name = e.args[0]
        if not isinstance(name, str) or name not in cells:
            raise ValueError("setValue() first operand must be a "
                             "bound let tuple cell")
        df = cells[name]
        key = str(e.args[1])
        with self._scoped(df.columns):
            col = _as_col(self._eval_col(e.args[2]))
        return df.withColumn(key, col)

    def _cell_base(self, texts) -> DataFrame:
        """1-row base relation with every referenced let cell
        injected as a broadcast column (value cells by name, _VFunc
        cells as their __vlx/__vcf/__vfit attribute triple)."""
        spark = next(iter(self.collections.values())).sparkSession
        base = spark.range(1)
        cells = getattr(self, "_lets", {})
        for nm in sorted(getattr(self, "_value_cells", set())):
            if any(re.search(rf"\b{re.escape(nm)}\b", t)
                   for t in texts):
                cdf = cells[nm]
                base = base.crossJoin(F.broadcast(
                    cdf.select(F.col(cdf.columns[0]).alias(nm))))
        for nm in sorted(getattr(self, "_vfunc_cells", {})):
            if any(re.search(rf"\b{re.escape(nm)}\b", t)
                   for t in texts):
                base = base.crossJoin(F.broadcast(cells[nm]))
        for nm in sorted(getattr(self, "_mat_cells", {})):
            if any(re.search(rf"\b{re.escape(nm)}\b", t)
                   for t in texts):
                base = base.crossJoin(F.broadcast(cells[nm]))
        for nm in sorted(getattr(self, "_tuple_cells", set())):
            if any(re.search(rf"\b{re.escape(nm)}\b", t)
                   for t in texts):
                cdf = cells[nm]
                base = base.crossJoin(F.broadcast(cdf.select(
                    *[F.col(c).alias(f"{nm}__t_{c}")
                      for c in cdf.columns])))
        for nm in sorted(getattr(self, "_obj_cells", {})):
            if any(re.search(rf"\b{re.escape(nm)}\b", t)
                   for t in texts):
                base = base.crossJoin(F.broadcast(cells[nm]))
        return base

    def _s_get(self, e: StreamExpr) -> DataFrame:
        name = e.args[0]
        cells = getattr(self, "_lets", {})
        if name not in cells:
            raise ValueError(f"get({name!r}): no such let cell")
        return cells[name]

    def _s_daemon(self, e: StreamExpr) -> DataFrame:
        """DaemonStream (solr/solrj/src/java/org/apache/solr/client/
        solrj/io/stream/DaemonStream.java:57): wrap a stream and
        re-run it on an interval in the background — the continuous-
        indexing pattern daemon(update(topic(...))). Here the daemon
        is registered under its id with the wrapped expression's
        PLAN; ``run_once()`` replays it deterministically (no wall
        clock, no thread — Spark's real scheduler analogue is
        Structured Streaming's triggers, streaming/incremental.py;
        this surface keeps the reference's admin contract: the
        daemon() call answers with the info tuple, and the registry
        supports list/stop like the DaemonStream admin API). The
        runInterval param is recorded, never slept on."""
        did = e.params.get("id")
        if not did:
            raise ValueError("daemon() requires an id= param")
        body = [x for x in e.args if isinstance(x, StreamExpr)]
        if len(body) != 1:
            raise ValueError("daemon() wraps exactly one stream")
        if not hasattr(self, "daemons"):
            self.daemons = {}
        self.daemons[did] = _Daemon(self, body[0],
                                    e.params.get("runInterval", "0"))
        spark = next(iter(self.collections.values())).sparkSession
        return spark.createDataFrame(
            [(did, "STOPPED", 0)],
            "id string, state string, iterations long")

    def _s_priority(self, e: StreamExpr) -> DataFrame:
        """PriorityStream (solrj/io/stream/PriorityStream.java:36):
        wraps a high-priority and a low-priority stream (topics, in
        the reference); emits the HIGH stream's tuples, and reads the
        low stream only when high is empty — scheduling, not
        merging. The emptiness probe is a bounded count on the high
        stream (topic pulls are incremental batches by contract)."""
        hi, lo = self._streams(e)
        if hi.limit(1).count() > 0:
            return hi
        return lo

    def _s_executor(self, e: StreamExpr) -> DataFrame:
        """ExecutorStream (solrj/io/stream/ExecutorStream.java:53):
        drain the wrapped stream's tuples, each carrying an
        ``expr_s`` streaming expression, and execute them (the
        reference fans them across a thread pool and emits nothing;
        jobs-as-data). Here each job's plan is evaluated and forced,
        and one tuple per job reports {id, n} — the job list is
        config-sized by the operator's contract, so the driver-side
        drain is bounded; each executed expression stays a fully
        distributed plan."""
        (src,) = self._streams(e)
        if "expr_s" not in src.columns:
            raise ValueError("executor() needs a stream with expr_s")
        rows = src.collect()
        out = []
        for r in rows:
            n = self.eval(parse_stream(r["expr_s"])).count()
            out.append((r["id"] if "id" in src.columns else "",
                        int(n)))
        spark = next(iter(self.collections.values())).sparkSession
        return spark.createDataFrame(out, "id string, n long")

    def _s_topic(self, e: StreamExpr) -> DataFrame:
        """TopicStream (solr/solrj/src/java/org/apache/solr/client/
        solrj/io/stream/TopicStream.java:75): checkpointed pub/sub —
        ``topic(checkpointCollection, collection, id=.., q=..,
        fl=.., initialCheckpoint=.., rows=..)``. Each call emits the
        next batch of matching tuples whose version EXCEEDS the
        stored checkpoint, ordered by version ASC and capped at
        ``rows`` (the reference's per-pull page, default 500), then
        advances the checkpoint to the max version emitted
        (TopicStream.getCheckpoints/persistCheckpoints semantics:
        initialCheckpoint=-1 starts at the collection's CURRENT max
        version so only new docs flow; initialCheckpoint=0 replays
        everything, mirroring Solr's strictly-positive _version_
        invariant). The checkpoint registry is keyed by
        (checkpointCollection, id) exactly like the reference's
        checkpoint doc; ``checkpointEvery`` is recorded, never slept
        on. 100 TB shape: the pull is a pushed range filter
        (version > cp) + global top-rows — one narrow sort of a
        bounded page; the durable-checkpoint analogue is the
        commit.json high-water mark in streaming/incremental.py."""
        chk, coll = e.args[0], e.args[1]
        tid = e.params.get("id")
        if not tid:
            raise ValueError("topic() requires an id= param")
        df = self.collections[coll]
        vf = e.params.get("versionField", "_version_")
        if vf not in df.columns:
            raise ValueError(
                f"topic(): no version field {vf!r} in {coll!r}")
        rows_cap = int(e.params.get("rows", "500"))
        df = self._apply_q(coll, df, e.params.get("q", "*:*"))
        if not hasattr(self, "topic_checkpoints"):
            self.topic_checkpoints = {}
        key = (chk, tid)
        if key not in self.topic_checkpoints:
            init = int(e.params.get("initialCheckpoint", "-1"))
            if init > -1:
                cp = init
            else:
                m = df.agg(F.max(F.col(vf)).alias("m")).first()["m"]
                cp = int(m) if m is not None else 0
            self.topic_checkpoints[key] = cp
        cp = self.topic_checkpoints[key]
        batch = (df.where(F.col(vf) > F.lit(cp))
                 .orderBy(F.col(vf).asc()).limit(rows_cap))
        mx = batch.agg(F.max(F.col(vf)).alias("m")).first()["m"]
        if mx is not None:
            self.topic_checkpoints[key] = int(mx)
        fl = e.params.get("fl")
        if fl:
            batch = batch.select(*[c.strip() for c in fl.split(",")])
        return batch

    def _s_commit(self, e: StreamExpr) -> DataFrame:
        """CommitStream (solrj/io/stream/CommitStream.java:44):
        ``commit(collection, batchSize=N, updateStream)`` — pass the
        wrapped update stream's tuples through unchanged, issuing a
        commit to the destination every batchSize indexed docs and a
        final commit at EOF. In this engine every update() append is
        already ONE atomic durable generation (commit.json swap), so
        the explicit commit maps to the NRT-reopen side: force a
        fresh reader snapshot and record the commit cadence the
        reference would have produced (floor(docs/batchSize) + the
        EOF commit). The ack tuples flow through untouched
        (CommitStream.read contract)."""
        dest = e.args[0]
        batch = int(e.params.get("batchSize", "0"))
        if batch < 0:
            raise ValueError("commit(): batchSize cannot be < 0")
        writers = getattr(self, "writers", None) or {}
        if dest not in writers:
            raise ValueError(f"no writer bound for collection {dest!r}")
        (src,) = self._streams(e)
        docs = 0
        if "batchIndexed" in src.columns:
            got = src.agg(
                F.sum("batchIndexed").alias("s")).first()["s"]
            docs = int(got or 0)
        six = writers[dest].reader()  # the NRT reopen
        self.last_commit = {
            "collection": dest,
            "commits": (docs // batch if batch > 0 else 0) + 1,
            "doc_count": int(six.doc_count)}
        return src

    def _s_plist(self, e: StreamExpr) -> DataFrame:
        """ParallelListStream (solrj/io/stream/
        ParallelListStream.java:109): like list(), but the wrapped
        streams are OPENED concurrently (a thread pool in the
        reference) while tuples still drain in listed order. Under
        Spark the open is a lazy plan, so plist() and list() compile
        to the same UNION — the concurrent open IS the scheduler
        running the union's legs as parallel stages; the ``_list_src``
        ordinal keeps the reference's drain order observable."""
        return self._s_list(e)

    def _s_calc(self, e: StreamExpr) -> DataFrame:
        """CalculatorStream (solrj/io/stream/CalculatorStream.java:87):
        the zero-field one-tuple source — emits exactly ONE empty
        tuple so ``select(calc(), add(1, 2) as s)`` evaluates pure
        math with no collection behind it."""
        spark = next(iter(self.collections.values())).sparkSession
        return spark.range(1).select()

    def _s_noop(self, e: StreamExpr) -> DataFrame:
        """NoOpStream (solrj/io/stream/NoOpStream.java:90): emits EOF
        immediately — zero tuples, zero fields (the reference's
        placeholder leg for parallel plumbing tests)."""
        spark = next(iter(self.collections.values())).sparkSession
        return spark.range(0).select()

    def _s_cat(self, e: StreamExpr) -> DataFrame:
        """CatStream (solr/core/src/java/org/apache/solr/handler/
        CatStream.java:49): ``cat("a.csv,b.txt", maxLines=N)`` — emit
        one (file, line) tuple per text line of each named file under
        the configured chroot (Solr's userfiles dir), files drained in
        listed order, capped at maxLines ACROSS files. DataFrame
        extension: a 1-based ``line_no`` ordinal materializes the
        arrival order the reference carries implicitly (parseCSV's
        header contract needs it). Each file is read wholetext (one
        row) then split — the reference also streams each file off
        ONE node; user files are config-sized by contract, and
        corpus-scale line data enters through spark.read.text
        proper. A trailing newline yields no empty last line
        (BufferedReader.lines parity); interior empty lines are
        kept."""
        if self.chroot is None:
            raise ValueError("cat(): no chroot configured")
        spec = _unquote(e.args[0])
        names = [s.strip() for s in spec.split(",") if s.strip()]
        if not names:
            raise ValueError("cat(): no files named")
        spark = next(iter(self.collections.values())).sparkSession
        legs = []
        for ordinal, name in enumerate(names):
            path = os.path.join(self.chroot, name)
            if not os.path.exists(path):
                raise ValueError(f"cat(): file not found under "
                                 f"chroot: {name!r}")
            raw = spark.read.text(path, wholetext=True)
            arr = F.split(F.col("value"), "\n")
            arr = F.when(F.element_at(arr, -1) == "",
                         F.slice(arr, 1, F.size(arr) - 1)
                         ).otherwise(arr)
            legs.append(raw.select(
                F.lit(ordinal).alias("_file_ord"),
                F.lit(name).alias("file"),
                F.posexplode(arr).alias("_pos", "line")))
        out = legs[0]
        for leg in legs[1:]:
            out = out.unionByName(leg)
        out = out.select(
            "_file_ord", "file",
            (F.col("_pos") + F.lit(1)).alias("line_no"), "line")
        max_lines = int(e.params.get("maxLines", "-1"))
        if max_lines >= 0:
            out = (out.orderBy("_file_ord", "line_no")
                   .limit(max_lines))
        return out.select("file", "line_no", "line")

    # quote-aware CSV field split (CsvStream.java:160 — split on
    # commas outside double quotes, then strip surrounding quotes)
    _CSV_SPLIT = ',(?=(?:[^"]*"[^"]*")*[^"]*$)'

    def _parse_lines(self, e: StreamExpr, sep_regex: str,
                     strip_quotes: bool) -> DataFrame:
        (src,) = self._streams(e)
        for c in ("file", "line_no", "line"):
            if c not in src.columns:
                raise ValueError(
                    f"parse stream needs a (file, line_no, line) "
                    f"source (cat()); missing {c!r}")
        import re as _re

        # ONE distributed job collects only the header line of every
        # file (n_files rows of metadata — config-scale, unlike the
        # former per-file .first() loop that launched a Spark job per
        # file and could not survive a 10^5-file manifest)
        hdr_rows = (src.groupBy("file")
                    .agg(F.min("line_no").alias("_hln"))
                    .join(src, "file")
                    .where(F.col("line_no") == F.col("_hln"))
                    .select("file", "_hln", "line").collect())
        file_headers = {}
        for r in sorted(hdr_rows, key=lambda r: r["file"]):
            headers = _re.split(sep_regex, r["line"])
            if strip_quotes:
                headers = [h[1:-1] if h.startswith('"')
                           and h.endswith('"') else h for h in headers]
            file_headers[r["file"]] = (int(r["_hln"]), headers)
        all_cols: list = []
        for fname in sorted(file_headers):
            for h in file_headers[fname][1]:
                if h not in all_cols:
                    all_cols.append(h)

        # broadcast the per-file header metadata and build ONE plan:
        # each output column reads its per-file position from a
        # (header -> LAST 1-based position) map — duplicate header
        # names within a file resolve to the LAST occurrence, the
        # reference's Tuple.put overwrite order (CsvStream.java:160)
        hrows = []
        for f, (hl, hs) in file_headers.items():
            hpos = {}
            for i, h in enumerate(hs):
                hpos[h] = i + 1
            hrows.append((f, hl, len(hs), hpos))
        hdf = src.sparkSession.createDataFrame(
            hrows,
            "file string, _hln bigint, _hn int, _hpos map<string,int>")
        j = (src.join(F.broadcast(hdf), "file")
             .where(F.col("line_no") > F.col("_hln")))
        arr = F.split(F.col("line"), sep_regex, -1)
        # CsvStream.java:131 — header/line field-count mismatch is an
        # error, enforced with ONE job
        first_bad = (j.where(F.size(arr) != F.col("_hn"))
                     .select("file", "line_no")
                     .orderBy("file", "line_no").first())
        if first_bad is not None:
            raise ValueError(
                "Headers and lines must have the same number of "
                f"fields [file:{first_bad['file']} line number:"
                f"{first_bad['line_no']}]")
        cols = [F.concat(F.col("file"), F.lit("_"),
                         F.col("line_no")).alias("id")]
        for h in all_cols:
            p = F.element_at(F.col("_hpos"), F.lit(h))
            c = F.when(p.isNotNull(), F.element_at(arr, p))
            if strip_quotes:
                c = F.regexp_replace(c, '^"(.*)"$', "$1")
            cols.append(F.when(c == "", None).otherwise(c).alias(h))
        return j.select(*cols)

    def _s_parseCSV(self, e: StreamExpr) -> DataFrame:
        """CsvStream (solrj/io/stream/CsvStream.java:120): wrap a
        (file, line) stream — the FIRST line of each file is its
        header; every later line splits on commas OUTSIDE double
        quotes (the reference's lookahead regex, used verbatim JVM-
        side), surrounding quotes stripped, empty fields null
        (tuple key omitted in the reference), plus an
        ``id = file_lineNumber`` key. Per-file headers may differ:
        legs union with allowMissingColumns, the DataFrame face of
        schemaless tuples. Header reads are one driver row per FILE
        (config-sized); the line parsing itself is a distributed
        split projection."""
        return self._parse_lines(e, self._CSV_SPLIT,
                                 strip_quotes=True)

    def _s_parseTSV(self, e: StreamExpr) -> DataFrame:
        """TsvStream (solrj/io/stream/TsvStream.java:76): parseCSV's
        contract with a plain tab split and NO quote handling."""
        return self._parse_lines(e, "\t", strip_quotes=False)

    def _s_shuffle(self, e: StreamExpr) -> DataFrame:
        """ShuffleStream (solrj/io/stream/ShuffleStream.java — Lang
        registration solrj/io/Lang.java:84): search()'s expression
        surface over the /export handler — the FULL sorted match set
        (no rows page), hash-routed across workers by partitionKeys.
        Spark realization: the full-export scan with an explicit
        repartition(partitionKeys) + sortWithinPartitions when
        partition keys are given (the worker-slice contract parallel()
        consumes), else one global sort. sort= is mandatory exactly
        as the export handler requires."""
        if "sort" not in e.params:
            raise ValueError("shuffle() requires a sort= param")
        out = self._s_search(e)
        pk = e.params.get("partitionKeys")
        if pk:
            keys = [c.strip() for c in pk.split(",")]
            out = (out.repartition(*[F.col(k) for k in keys])
                   .sortWithinPartitions(
                       *_sort_cols(e.params["sort"])))
        return out

    def _s_sql(self, e: StreamExpr) -> DataFrame:
        """SqlStream (solrj/io/stream/SqlStream.java:221 — Lang
        registration Lang.java:95): ``sql(collection, stmt="...")``
        routes the statement to the /sql handler and streams the
        result tuples. Here the handler is SolrSQL
        (search/sql_handler.py) over this evaluator's collections,
        sharing its text_search hook — same push-down rules, same
        Catalyst plan as the handler's own tests."""
        from .sql_handler import SolrSQL
        coll = e.args[0]
        if coll not in self.collections:
            raise ValueError(f"sql(): unknown collection {coll!r}")
        stmt = e.params.get("stmt")
        if not stmt:
            raise ValueError("sql() requires a stmt= param")
        return SolrSQL(self.collections,
                       text_search=self.text_search).execute(
                           _unquote(stmt))

    def _s_cell(self, e: StreamExpr) -> DataFrame:
        """CellStream (solrj/io/stream/CellStream.java:42):
        ``cell(name, stream)`` — drain the wrapped stream and emit ONE
        tuple ``{name: [tuples...]}``, the whole-tuple sibling of
        col()'s single-field cell (the zplot / matrix workflows
        consume it). The reference materializes the tuple list on one
        node; here it is ONE aggregated array-of-structs row that
        stays executor-side and can broadcast.

        Ordering: the reference keeps stream order; a hash aggregate
        has none, so tuples sort by ALL columns ascending — for the
        canonical ``search(..., sort="id asc")`` source those
        coincide (documented divergence otherwise, pinned in tests).

        Scale shape: one collect_list shuffle to a single reducer,
        bounded by the wrapped stream's size — cell() belongs on
        aggregated/sampled streams, never the raw corpus."""
        name = (e.args[0] if e.args
                and not isinstance(e.args[0], StreamExpr) else None)
        if not name:
            raise ValueError("cell() needs a name as its first argument")
        srcs = self._streams(e)
        if len(srcs) != 1:
            raise ValueError("cell() wraps exactly one stream")
        df = srcs[0]
        st = F.struct(*[F.col(c) for c in df.columns])
        return df.agg(F.sort_array(F.collect_list(st)).alias(str(name)))

    def _s_hashRollup(self, e: StreamExpr) -> DataFrame:
        """HashRollupStream (solrj/io/stream/HashRollupStream.java:41):
        RollupStream WITHOUT the sorted-input contract — the reference
        keeps an in-memory hash of group accumulators instead of
        reducing adjacent runs. Spark's groupBy already IS that hash
        aggregate (partial+final HashAggregate, no sort), so both
        parse surfaces compile to the identical distributed plan —
        the sorted-vs-hashed distinction is an execution detail
        Catalyst owns (and chooses per-plan)."""
        return self._s_rollup(e)

    def _s_eval(self, e: StreamExpr) -> DataFrame:
        """EvalStream (solrj/io/stream/EvalStream.java:40): read the
        FIRST tuple of the wrapped stream, parse its ``expr_s`` field
        as a streaming expression, and evaluate THAT — expressions
        stored as data. The single-tuple ``limit(1).collect()`` is a
        bounded driver round-trip by the operator's contract (the
        inner stream carries config-sized expression strings); the
        evaluated expression itself stays a fully distributed plan."""
        srcs = self._streams(e)
        if len(srcs) != 1:
            raise ValueError("eval() wraps exactly one stream")
        src = srcs[0]
        if "expr_s" not in src.columns:
            raise ValueError("eval() needs a stream with an expr_s field")
        rows = src.limit(1).collect()
        if not rows:
            raise ValueError("eval(): wrapped stream produced no tuple")
        return self.eval(parse_stream(rows[0]["expr_s"]))

    def _s_plot(self, e: StreamExpr) -> DataFrame:
        """PlotStream (solrj/io/stream/PlotStream.java): one tuple
        ``{plot: type, data: [[x1,y1], [x2,y2], ...]}`` zipped from
        x/y evaluator arrays (array literals, col() value cells, or
        any array evaluator). Catalyst zip_with over the two arrays —
        one codegen project on one row, no driver lists."""
        ptype = e.params.get("type", "scatter")
        if "x" not in e.params or "y" not in e.params:
            raise ValueError("plot() needs x= and y= array values")
        spark = next(iter(self.collections.values())).sparkSession
        base = spark.range(1)
        cells = getattr(self, "_lets", {})
        for name in sorted(getattr(self, "_value_cells", set())):
            if any(re.search(rf"\b{re.escape(name)}\b", txt)
                   for txt in (e.params["x"], e.params["y"])):
                cdf = cells[name]
                base = base.crossJoin(F.broadcast(
                    cdf.select(F.col(cdf.columns[0]).alias(name))))
        with self._scoped(base.columns):
            xs = self._eval_col(parse_stream(e.params["x"])
                                if _NAME_RE.match(e.params["x"])
                                else e.params["x"])
            ys = self._eval_col(parse_stream(e.params["y"])
                                if _NAME_RE.match(e.params["y"])
                                else e.params["y"])
        data = F.zip_with(xs, ys, lambda x, y: F.array(
            x.cast("double"), y.cast("double")))
        return base.select(F.lit(ptype).alias("plot"),
                           data.alias("data"))

    def _s_zplot(self, e: StreamExpr) -> DataFrame:
        """ZplotStream (solrj/io/stream/ZplotStream.java:123): turn
        evaluator results into plottable tuples. Modes: named vector
        params -> one tuple per index (x auto-generated 0.. when only
        y is given, ZplotStream.java:211); table=matrix -> one tuple
        per row with rowLabel + one column per column label
        (java:332); heat=matrix -> long-form (y, x, z) tuples with
        the reference's zero-padded row/col fallback labels
        (java:363 + pad()); dist=freqTable/hist cell -> (x, y)
        density pairs (java:313 list branch); clusters=kmeans/dbscan
        result -> (x, y, cluster) tuples (java:219). The
        RealDistribution dist mode draws 500k RANDOM samples in the
        reference (nondeterministic by construction) and raises.
        Everything stays executor-side; only table mode reads the
        (config-sized) label row once to fix the static output
        schema."""
        if not e.params:
            raise ValueError("zplot() needs named parameters")
        if ("table" in e.params or "dist" in e.params) \
                and len(e.params) > 1:
            raise ValueError("zplot: table/dist must be the only "
                             "parameter")
        base = self._cell_base(list(e.params.values()))
        vals = {}
        with self._scoped(base.columns):
            for name, txt in e.params.items():
                node = (parse_stream(txt) if _NAME_RE.match(txt)
                        else txt)
                vals[name] = self._eval_col(node)
        if "clusters" in e.params:
            return self._zplot_clusters(base, vals["clusters"])
        if "table" in e.params:
            return self._zplot_table(base, vals["table"])
        if "heat" in e.params:
            return self._zplot_heat(base, vals["heat"])
        if "dist" in e.params:
            return self._zplot_dist(base, vals["dist"])
        names = list(e.params)
        sel = base.select(*[_as_col(vals[n]).alias(n) for n in names])
        df = sel.select(F.posexplode(
            F.arrays_zip(*[F.col(n) for n in names])).alias("i", "s"))
        cols = []
        if "y" in names and "x" not in names:
            cols.append(F.col("i").cast("long").alias("x"))
        cols += [F.col("s")[n].alias(n) for n in names]
        return df.select(*cols)

    def _zplot_bundle(self, base, m, what):
        """Matrix operand -> 1-row (rows, rl, cl) relation; labels
        null for a bare (unlabeled) matrix, like Matrix.getRowLabels
        returning null in the reference."""
        null_s = F.lit(None).cast("array<string>")
        if isinstance(m, _Mat):
            src = m.base if m.base is not None else base
            return src.select(
                self._mrows(m).alias("rows"),
                (m.rlab if m.rlab is not None else null_s).alias("rl"),
                (m.clab if m.clab is not None else null_s).alias("cl"))
        return base.select(_as_col(m).alias("rows"),
                           null_s.alias("rl"), null_s.alias("cl"))

    def _zplot_table(self, base, m) -> DataFrame:
        bundle = self._zplot_bundle(base, m, "table")
        # matrix cells are config-sized by contract — ONE bounded
        # driver read of the LABEL row fixes the static output
        # schema (the reference's whole Matrix lives driver-side);
        # the data rows stay executor-side
        lab = bundle.select(
            F.col("cl"), F.size(F.get("rows", 0)).alias("nc")).first()
        clabels = (list(lab["cl"]) if lab["cl"] is not None
                   else [f"col{j}" for j in range(lab["nc"])])
        ex = bundle.select(F.col("rl"),
                           F.posexplode("rows").alias("i", "r"))
        rl = F.coalesce(F.get(F.col("rl"), F.col("i")),
                        F.col("i").cast("string")).alias("rowLabel")
        return ex.select(rl, *[
            F.get(F.col("r"), j).cast("double").alias(cl)
            for j, cl in enumerate(clabels)])

    def _zplot_heat(self, base, m) -> DataFrame:
        bundle = self._zplot_bundle(base, m, "heat")
        b1 = bundle.select("rl", "cl", F.size("rows").alias("nr"),
                           F.posexplode("rows").alias("i", "r"))
        b2 = b1.select("rl", "cl", "nr", "i",
                       F.size("r").alias("ncl"),
                       F.posexplode("r").alias("j", "z"))
        y = F.coalesce(F.get(F.col("rl"), F.col("i")),
                       F.concat(F.lit("row"), _zpad_expr("i", "nr")))
        x = F.coalesce(F.get(F.col("cl"), F.col("j")),
                       F.concat(F.lit("col"), _zpad_expr("j", "ncl")))
        return b2.select(y.alias("y"), x.alias("x"),
                         F.col("z").cast("double").alias("z"))

    def _zplot_clusters(self, base, c) -> DataFrame:
        """ZplotStream.java:219 clusters branch: one (x, y, cluster)
        tuple per clustered 2-D point, cluster names "cluster1"..;
        dbscan noise points (assign -1) are in no cluster and are
        not emitted, like the reference's cluster-list walk."""
        if not isinstance(c, _Clus):
            raise ValueError("zplot(clusters=...) needs a kmeans/"
                             "multiKmeans/fuzzyKmeans/dbscan result")
        src = c.base if c.base is not None else base
        bundle = src.select(c.blob["pts"].alias("pts"),
                            c.blob["assign"].alias("asg"))
        z = bundle.select(F.explode(F.zip_with(
            F.col("pts"), F.col("asg"),
            lambda p, g: F.struct(p.alias("p"),
                                  g.alias("g")))).alias("s"))
        return (z.filter(F.col("s")["g"] >= 0)
                .select(F.col("s")["p"][0].alias("x"),
                        F.col("s")["p"][1].alias("y"),
                        F.concat(F.lit("cluster"),
                                 (F.col("s")["g"] + 1)
                                 .cast("string")).alias("cluster")))

    def _zplot_dist(self, base, v) -> DataFrame:
        from pyspark.sql.types import ArrayType, StructType
        tmp = base.select(_as_col(v).alias("d"))
        et = tmp.schema["d"].dataType
        if not (isinstance(et, ArrayType)
                and isinstance(et.elementType, StructType)):
            raise ValueError(
                "zplot(dist=...) supports freqTable/hist tuple-list "
                "cells; the reference's RealDistribution mode draws "
                "500k random samples (nondeterministic) and is not "
                "reproduced")
        fields = set(et.elementType.names)
        ex = tmp.select(F.explode("d").alias("s"))
        if "N" in fields:                # hist branch (java:316)
            if "prob" not in fields:
                raise ValueError("zplot(dist=hist): the cell needs a "
                                 "prob field (the reference reads "
                                 "t.get(\"prob\"))")
            return ex.select(
                F.round(F.col("s")["mean"], 2).alias("x"),
                F.col("s")["prob"].cast("double").alias("y"))
        if "count" in fields:            # freqTable branch (java:323)
            return ex.select(
                F.col("s")["value"].alias("x"),
                F.col("s")["pct"].cast("double").alias("y"))
        raise ValueError("zplot(dist=...): unrecognized tuple-list "
                         "cell (need freqTable or hist shape)")

    def _s_stats(self, e: StreamExpr) -> DataFrame:
        """StatsStream (solrj/io/stream/StatsStream.java:57): metrics
        over the whole match set, ONE tuple out — a partial+final
        aggregate with no grouping key (the degenerate FacetStream)."""
        coll = e.args[0]
        df = self._apply_q(coll, self.collections[coll],
                           e.params.get("q", "*:*"))
        aggs = [_agg_col(a) for a in e.args[1:]
                if isinstance(a, StreamExpr) and a.name in _AGG_FNS]
        return df.agg(*aggs)

    def _s_facet(self, e: StreamExpr) -> DataFrame:
        """FacetStream (solrj/io/stream/FacetStream.java:63): push-down
        facet aggregation — buckets + metrics + bucketSorts +
        bucketSizeLimit. The reference pushes the work to Solr's JSON
        facet API precisely so the aggregation happens engine-side
        instead of streaming tuples; here "engine-side" is one
        partial+final hash aggregate, and bucketSizeLimit becomes
        TakeOrderedAndProject. Sort specs accept both the Solr metric
        identifier ('count(*) desc', 'sum(f) asc') and the flattened
        alias ('count desc', 'sum_f asc')."""
        coll = e.args[0]
        df = self._apply_q(coll, self.collections[coll],
                           e.params.get("q", "*:*"))
        buckets = [b.strip() for b in e.params["buckets"].split(",")]
        aggs = [_agg_col(a) for a in e.args[1:]
                if isinstance(a, StreamExpr) and a.name in _AGG_FNS]
        out = df.groupBy(*buckets).agg(*aggs)
        sort_spec = e.params.get("bucketSorts", f"{buckets[0]} asc")
        sort_spec = re.sub(
            r"([a-z]+)\((\*|[A-Za-z0-9_]+)\)",
            lambda m: "count" if m.group(1) == "count"
            else f"{m.group(1)}_{m.group(2)}", sort_spec)
        out = out.orderBy(*_sort_cols(sort_spec))
        if "bucketSizeLimit" in e.params:
            out = out.limit(int(e.params["bucketSizeLimit"]))
        return out

    def _s_facet2D(self, e: StreamExpr) -> DataFrame:
        """Facet2DStream (solrj/io/stream/Facet2DStream.java:63): a
        two-dimensional facet cross-tab — the top ``nx`` x-buckets by
        their metric total, and within each, the top ``ny`` y-buckets
        (``dimensions="nx,ny"``; one metric, count(*) default). The
        nested JSON facet the reference pushes down becomes one
        (x,y) hash aggregate + a tiny x-total top-k + ONE window
        PARTITIONED BY x for the per-x y ranking (per-bucket sorts,
        never global)."""
        coll = e.args[0]
        df = self._apply_q(coll, self.collections[coll],
                           e.params.get("q", "*:*"))
        x, y = e.params["x"], e.params["y"]
        nx, ny = (int(v) for v in
                  e.params.get("dimensions", "10,10").split(","))
        metrics = [a for a in e.args[1:]
                   if isinstance(a, StreamExpr) and a.name in _AGG_FNS]
        mcol = _agg_col(metrics[0]) if metrics else \
            F.count("*").cast("long").alias("count")
        g = df.groupBy(x, y).agg(mcol)
        mname = g.columns[-1]
        topx = (g.groupBy(x)
                .agg(F.sum(mname).alias("__tot"))
                .orderBy(F.desc("__tot"), F.asc(x)).limit(nx)
                .select(x))
        w = Window.partitionBy(x).orderBy(F.desc(mname), F.asc(y))
        return (g.join(F.broadcast(topx), x)
                .withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") <= ny)
                .select(x, y, mname))

    def _s_random(self, e: StreamExpr) -> DataFrame:
        """RandomStream (solrj/io/stream/RandomStream.java:54): a
        pseudo-random sample of the match set. The reference sorts on
        ``random_<seed>`` — Solr's RandomSortField — with the seed
        derived from Random(); here the seed is an explicit ``seed``
        parameter over the SAME bit-exact hash32shift order
        (randomsort.py), so the sample is reproducible. hash32shift is
        a 32-bit bijection: distinct ids get distinct keys, the order
        is total, and the 'sample' is one TakeOrderedAndProject over a
        codegen key — no RAND(), no shuffle beyond top-k."""
        from .randomsort import wang_hash32_sql
        coll = e.args[0]
        df = self._apply_q(coll, self.collections[coll],
                           e.params.get("q", "*:*"))
        key = df.columns[0]
        seed = int(e.params.get("seed", "0"))
        h = wang_hash32_sql(key, seed, "spark")
        out = df.withColumn("__rk", F.expr(h)).orderBy("__rk")
        if "rows" in e.params:
            out = out.limit(int(e.params["rows"]))
        fl = e.params.get("fl")
        if fl:
            return out.select(*[c.strip() for c in fl.split(",")])
        return out.drop("__rk")

    def _s_cartesianProduct(self, e: StreamExpr) -> DataFrame:
        """CartesianProductStream (solrj/io/stream/
        CartesianProductStream.java:60): one outgoing tuple per value
        of a multivalued field, the scalar fields repeated.
        ``productSort`` orders the emission WITHIN each incoming tuple
        (the reference sorts the generated mini-batch, :151) — here
        sort_array before the explode, so no global shuffle is added;
        only ``<alias> asc|desc`` specs are meaningful per-tuple.
        """
        inner = self._streams(e)[0]
        spec = next(a for a in e.args if isinstance(a, str))
        m = re.match(r"^(\S+)(?:\s+as\s+(\S+))?$", spec)
        fld, alias = m.group(1), m.group(2) or m.group(1)
        ps = e.params.get("productSort")
        col = F.col(fld)
        if ps:
            toks = ps.split()
            if toks[0] != alias:
                raise ValueError(
                    f"productSort must order by {alias!r}, got {ps!r}")
            col = F.sort_array(col, asc=not (
                len(toks) > 1 and toks[1].lower() == "desc"))
        keep = [c for c in inner.columns if c != fld]
        return inner.select(*keep, F.explode(col).alias(alias))

    def _s_intersect(self, e: StreamExpr) -> DataFrame:
        a, b = self._streams(e)
        return a.join(b.select(e.params["on"]).distinct(),
                      e.params["on"], "left_semi")

    def _s_complement(self, e: StreamExpr) -> DataFrame:
        a, b = self._streams(e)
        return a.join(b.select(e.params["on"]).distinct(),
                      e.params["on"], "left_anti")

    def _s_sort(self, e: StreamExpr) -> DataFrame:
        (src,) = self._streams(e)
        return src.orderBy(*_sort_cols(e.params["by"]))

    def _s_reduce(self, e: StreamExpr) -> DataFrame:
        """ReducerStream + GroupOperation (solrj/io/stream/
        ReducerStream.java:31, solrj/io/ops/GroupOperation.java:108):
        one tuple per ``by`` group; the group operation keeps the
        top-``n`` tuples of the group under its ``sort`` comparator,
        the emitted tuple carries the comparator-best tuple's fields
        plus a ``group`` list of the kept tuples in comparator order.

        Spark realization: the reference requires the underlying
        stream pre-sorted by ``by`` because it reduces ADJACENT runs
        on one node; a hash aggregate needs no such contract, so the
        sort requirement disappears — one row_number window
        partitioned by the group keys (per-partition sorts, never
        global) keeps rank<=n, then ONE groupBy assembles the ordered
        ``group`` array. Two key-local shuffles on the group keys,
        both map-side combinable at the window stage; at 100 TB each
        group's candidate set is bounded by n before the collect, so
        no group ever materializes unbounded state (the reference's
        PriorityQueue bound, kept).

        Determinism note: GroupOperation's PriorityQueue breaks
        comparator ties arbitrarily; here ties break by the remaining
        columns ascending so both engines agree (documented
        divergence, pinned in tests)."""
        group_ops = [a for a in e.args if isinstance(a, StreamExpr)
                     and a.name in ("group", "distinct")]
        if len(group_ops) != 1:
            raise ValueError("reduce() needs exactly one group(...) "
                             "or distinct() op")
        gop = group_ops[0]
        srcs = [a for a in e.args if isinstance(a, StreamExpr)
                and a.name not in ("group", "distinct")
                and a.name not in _NON_STREAM_FNS]
        if len(srcs) != 1:
            raise ValueError("reduce() needs exactly one stream source")
        src = self.eval(srcs[0])
        by = [c.split()[0].strip() for c in e.params["by"].split(",")
              if c.strip()]
        if gop.name == "distinct":
            # DistinctOperation (solrj/io/ops/DistinctOperation
            # .java:49): keep only the FIRST tuple of each group. The
            # reference's "first" is source arrival order (it reduces
            # adjacent runs of a by-sorted stream); a hash aggregate
            # has no arrival order, so ties break by the remaining
            # columns ascending — deterministic on both engines
            # (same divergence note as group() below).
            other = [c for c in src.columns if c not in by]
            w = Window.partitionBy(*by).orderBy(
                *[F.col(c).asc() for c in other])
            return (src.withColumn("_rk", F.row_number().over(w))
                    .filter(F.col("_rk") == 1).drop("_rk"))
        n = int(gop.params["n"])
        if n <= 0:
            raise ValueError("group() n must be > 0")
        order = _sort_cols(gop.params["sort"])
        # deterministic tie-break: every remaining column ascending
        sort_names = {p.split()[0].strip()
                      for p in gop.params["sort"].split(",") if p.strip()}
        ties = [F.col(c).asc() for c in src.columns
                if c not in sort_names and c not in by]
        w = Window.partitionBy(*by).orderBy(*order, *ties)
        other = [c for c in src.columns if c not in by]
        ranked = (src.withColumn("_rk", F.row_number().over(w))
                  .filter(F.col("_rk") <= n))
        head = [F.max(F.when(F.col("_rk") == 1, F.col(c))).alias(c)
                for c in other]
        grp = F.sort_array(F.collect_list(
            F.struct(F.col("_rk").alias("rk"),
                     *[F.col(c) for c in other]))).alias("group")
        return ranked.groupBy(*by).agg(*head, grp)

    def _s_list(self, e: StreamExpr) -> DataFrame:
        """ListStream (solrj/io/stream/ListStream.java:36): opens each
        wrapped stream in turn and emits its tuples — stream
        concatenation. Spark realization: unionByName with
        allowMissingColumns (the reference's tuples are schemaless
        maps; missing fields read as null), which stays a UNION node —
        no shuffle, each leg keeps its own plan. The reference
        guarantees leg ORDER (stream i fully drains before i+1); a
        distributed union interleaves partitions instead, so a
        ``_list_src`` ordinal column records the leg a tuple came from
        (sorting by it restores the contract when a consumer needs
        it)."""
        srcs = self._streams(e)
        if not srcs:
            raise ValueError("list() needs at least one stream")
        legs = [s.withColumn("_list_src", F.lit(i))
                for i, s in enumerate(srcs)]
        out = legs[0]
        for leg in legs[1:]:
            out = out.unionByName(leg, allowMissingColumns=True)
        return out

    def _s_null(self, e: StreamExpr) -> DataFrame:
        """NullStream (solrj/io/stream/NullStream.java:42): drains the
        wrapped stream and emits ONE tuple — the tuple count — the
        reference's parallel-optimization harness (it also reports a
        wall-clock ``timer`` field; a deterministic engine contract
        can't hash wall time, so the count is the tuple and timing
        lives in bench.py). Compiles to a groupless COUNT(*) — partial
        + final aggregate, no data movement beyond one long per
        partition."""
        (src,) = self._streams(e)
        return src.agg(F.count("*").cast("long").alias("nullCount"))

    def _s_echo(self, e: StreamExpr) -> DataFrame:
        """EchoStream (solrj/io/stream/EchoStream.java): one tuple
        {echo: <text>} — the hello-world leaf of the expression
        language (useful to probe a worker round-trip)."""
        spark = next(iter(self.collections.values())).sparkSession
        txt = _unquote(e.args[0]) if e.args else ""
        return spark.range(1).select(F.lit(txt).alias("echo"))

    def _s_parallel(self, e: StreamExpr) -> DataFrame:
        """ParallelStream (solr/solrj/src/java/org/apache/solr/client/
        solrj/io/stream/ParallelStream.java:70): ships the inner
        expression to ``workers`` worker nodes, each evaluating it over
        the hash(partitionKeys)-routed slice of the tuples (the
        HashQParserPlugin fq injected at the search() leaves); the
        aggregator k-way-merges worker outputs by ``sort``.

        Spark realization: the inner expression's Catalyst plan is
        ALREADY the worker fan-out — every groupBy/join inside it
        hash-shuffles on its keys, which is exactly the workers=N +
        partitionKeys contract (Solr requires partitionKeys to cover
        the inner rollup/unique keys for the same reason a hash shuffle
        does). parallel() therefore pins the fan-out width: the
        evaluated stream is repartitioned into ``workers`` hash
        partitions on the partitionKeys columns — one partition = one
        worker's tuple slice, keys never straddle workers — and the
        merge comparator becomes orderBy. Output tuples are the inner
        stream's, unchanged (the decorator is transparent); the
        routing law (key-disjoint workers, exact width) is pinned in
        tests/test_r3d_ops.py.
        """
        (src,) = self._streams(e)
        workers = int(e.params.get("workers", "4"))
        keys = [k.strip() for k in e.params.get("partitionKeys", "")
                .split(",") if k.strip()]
        out = (src.repartition(workers, *[F.col(k) for k in keys])
               if keys else src.repartition(workers))
        if "sort" in e.params:
            out = out.orderBy(*_sort_cols(e.params["sort"]))
        return out

    def _s_fetch(self, e: StreamExpr) -> DataFrame:
        """FetchStream (solr/solrj/src/java/org/apache/solr/client/
        solrj/io/stream/FetchStream.java): decorate a stream with extra
        fields ``fl`` fetched from ``collection`` by key (``on="
        streamField=collectionField"``). Solr fetches in batched id
        lookups; here it is ONE left equi-join whose right side is the
        projected collection scan — tuples without a match pass through
        unchanged (null-filled), exactly FetchStream's behavior. AQE
        broadcasts whichever side is small (for the usual top-k input
        stream, the stream side)."""
        coll = e.args[0]
        (src,) = self._streams(e)
        lk, _, rk = e.params["on"].partition("=")
        lk, rk = lk.strip(), rk.strip() or lk.strip()
        fl = [c.strip() for c in e.params["fl"].split(",")]
        right = self.collections[coll].select(
            F.col(rk).alias(lk), *[F.col(c) for c in fl])
        return src.join(right, lk, "left")

    def _s_timeseries(self, e: StreamExpr) -> DataFrame:
        """TimeSeriesStream (solr/solrj/src/java/org/apache/solr/
        client/solrj/io/stream/TimeSeriesStream.java:338-374): a JSON
        range facet over ``field`` from ``start`` to ``end`` (end
        exclusive) stepped by ``gap``; every bucket is emitted and
        missing metrics are zero-filled (:420 ``t.put(identifier, 0)``).

        Plan shape: the bucket spine is ONE in-plan sequence() expand
        of a single row (never a driver loop); matching rows map to a
        bucket ordinal by integer division on microseconds (exact for
        the fixed-width MINUTE/HOUR/DAY/WEEK gaps this implements) and
        aggregate with map-side partials; the spine left-joins the
        aggregate so empty buckets survive. The spine is k rows —
        broadcast — so the whole thing costs one scan + one partial
        aggregation shuffle regardless of corpus size."""
        coll = e.args[0]
        df = self.collections[coll]
        df = self._apply_q(coll, df, e.params.get("q", "*:*"))
        fld = e.params["field"]
        start = e.params["start"].replace("T", " ").rstrip("Z")
        end = e.params["end"].replace("T", " ").rstrip("Z")
        n, unit = _parse_gap(e.params["gap"])
        ival = f"interval {n} {unit}"
        gap_us = n * _UNIT_US[unit]
        spark = df.sparkSession
        # literals typed to the column (timestamp vs timestamp_ntz):
        # a mismatched literal makes Catalyst wrap the COLUMN in a
        # cast, which blocks parquet predicate pushdown on the range
        ntz = df.schema[fld].dataType.typeName() == "timestamp_ntz"
        tlit = "timestamp_ntz" if ntz else "timestamp"
        spine = (spark.range(1).select(F.explode(F.expr(
            f"sequence({tlit}'{start}', {tlit}'{end}', {ival})"))
            .alias(fld))
            .filter(F.col(fld) < F.expr(f"{tlit}'{end}'"))
            .withColumn("_bucket", F.expr(
                f"(unix_micros(CAST({fld} AS TIMESTAMP)) - "
                f"unix_micros(timestamp'{start}')) DIV {gap_us}")))
        rows = (df.filter((F.col(fld) >= F.expr(f"{tlit}'{start}'"))
                          & (F.col(fld) < F.expr(f"{tlit}'{end}'")))
                .withColumn("_bucket", F.expr(
                    f"(unix_micros(CAST({fld} AS TIMESTAMP)) - "
                    f"unix_micros(timestamp'{start}')) DIV {gap_us}")))
        aggs = [_agg_col(a) for a in e.args
                if isinstance(a, StreamExpr) and a.name in _AGG_FNS]
        agg = rows.groupBy("_bucket").agg(*aggs)
        names = [c for c in agg.columns if c != "_bucket"]
        return (F.broadcast(spine).join(agg, "_bucket", "left")
                .select(fld, *[F.coalesce(F.col(c), F.lit(0)).alias(c)
                               for c in names])
                .orderBy(fld))

    def _s_update(self, e: StreamExpr) -> DataFrame:
        """UpdateStream (solrj/io/stream/UpdateStream.java:45: wraps a
        stream and indexes its tuples into a destination collection,
        emitting batch-ack tuples).  The destination is an IndexWriter
        bound via ``writers`` at evaluator construction; the whole
        incoming stream is ONE append generation (one atomic commit —
        Solr's batchSize micro-batching maps to the outer Structured
        Streaming foreachBatch loop, see streaming/incremental.py for
        the daemon() analogue).  Emits one tuple: (batchIndexed,
        generation)."""
        dest = e.args[0]
        (src,) = self._streams(e)
        writers = getattr(self, "writers", None) or {}
        if dest not in writers:
            raise ValueError(f"no writer bound for collection {dest!r}")
        w = writers[dest]
        order = [c.strip() for c in
                 e.params.get("order", src.columns[0]).split(",")]
        before = w.commit_state()["doc_count"]
        six = w.append_raw(src, text_col=e.params.get("field", "text"),
                           order_cols=order,
                           lineage="update() stream")
        st = w.commit_state()
        spark = src.sparkSession
        return spark.createDataFrame(
            [(int(six.doc_count - before), int(st["generation"]))],
            "batchIndexed long, generation long")

    def _s_delete(self, e: StreamExpr) -> DataFrame:
        """DeleteStream (solrj/io/stream/DeleteStream.java:40: extends
        UpdateStream, issuing deleteById for each wrapped tuple's id):
        the wrapped stream's ``id`` column IS the delete set, committed
        as one atomic generation through the writer's distributed
        delete path; emits one (batchDeleted, generation) ack tuple
        like update()."""
        dest = e.args[0]
        (src,) = self._streams(e)
        writers = getattr(self, "writers", None) or {}
        if dest not in writers:
            raise ValueError(f"no writer bound for collection {dest!r}")
        w = writers[dest]
        idc = e.params.get("id", src.columns[0])
        ids = src.select(F.col(idc).cast("long").alias("docid")) \
            .distinct()
        n = ids.count()
        w.delete_docids_df(ids, lineage="delete() stream")
        st = w.commit_state()
        return src.sparkSession.createDataFrame(
            [(int(n), int(st["generation"]))],
            "batchDeleted long, generation long")

    def _s_shortestPath(self, e: StreamExpr) -> DataFrame:
        """ShortestPathStream (solrj/io/graph/ShortestPathStream.java:59):
        ALL shortest paths between two nodes of an edge collection,
        breadth-first with a per-level visited cut, bounded by
        maxDepth.  Every shortest walk visits each intermediate node at
        exactly its BFS depth (a shorter splice would otherwise exist),
        so excluding earlier-visited nodes per level loses no shortest
        path while keeping the frontier linear in reachable nodes —
        the property that makes BFS-by-joins scale: each level is ONE
        equi-join + ONE anti-join, never a path-enumeration blow-up
        beyond the answer set.

        Emits (path, depth) with path as 'a->b->c'; empty if the
        target is unreachable within maxDepth.
        """
        coll = e.args[0]
        frm, _, to = e.params["edge"].partition("=")
        edges = (self.collections[coll]
                 .select(F.col(frm.strip()).alias("_src"),
                         F.col(to.strip()).alias("_dst"))
                 .filter(F.col("_src") != F.col("_dst")).distinct())
        src_v, dst_v = e.params["from"], e.params["to"]
        maxd = int(e.params.get("maxDepth", 6))
        spark = edges.sparkSession
        cur = spark.createDataFrame([(int(src_v), str(src_v))],
                                    "node long, path string")
        visited = cur.select("node")
        hits = []
        for depth in range(1, maxd + 1):
            nxt = (cur.join(edges, cur["node"] == edges["_src"])
                   .select(F.col("_dst").alias("node"),
                           F.concat("path", F.lit("->"),
                                    F.col("_dst").cast("string"))
                           .alias("path"))
                   .join(visited, "node", "left_anti"))
            hits.append(nxt.filter(F.col("node") == int(dst_v))
                        .select("path",
                                F.lit(depth).cast("long").alias("depth")))
            visited = visited.union(nxt.select("node").distinct())
            cur = nxt
        allhits = hits[0]
        for h in hits[1:]:
            allhits = allhits.union(h)
        w = Window.partitionBy()
        return (allhits
                .withColumn("_min", F.min("depth").over(w))
                .filter(F.col("depth") == F.col("_min"))
                .select("path", "depth"))

    def _s_nodes(self, e: StreamExpr) -> DataFrame:
        """GatherNodesStream (solrj/io/graph/GatherNodesStream.java:60):
        walk="from->to" joins each incoming tuple's ``from`` value to
        the collection's ``to`` field; gather names the field whose
        DISTINCT values become the emitted node tuples, each with the
        number of edges that reached it (the count(*) metric).  One
        semi-joinable equi-join + one hash agg — the single-hop
        traversal primitive nested nodes() calls stack into BFS.
        """
        coll = e.args[0]
        (src,) = self._streams(e)
        frm, _, to = e.params["walk"].partition("->")
        frm, to = frm.strip(), to.strip()
        gather = e.params["gather"].strip()
        edges = self.collections[coll]
        j = edges.join(
            src.select(F.col(frm).alias(to)).distinct(), to)
        return (j.groupBy(F.col(gather).alias("node"))
                .agg(F.count("*").cast("long").alias("count")))

    def _labels_for(self, coll: str, e: StreamExpr) -> DataFrame:
        """(docid, outcome 0/1) from the collection's outcome field
        and positiveLabel (TextLogisticRegressionQParserPlugin
        .java:160's comparison)."""
        outcome = e.params.get("outcome")
        if not outcome:
            raise ValueError(f"{e.name}() requires an outcome= param")
        positive = e.params.get("positiveLabel", "1")
        df = self._apply_q(coll, self.collections[coll],
                           e.params.get("q", "*:*"))
        return df.select(
            F.col(df.columns[0]).alias("docid"),
            (F.col(outcome).cast("string") == positive)
            .cast("int").alias("outcome"))

    def _s_features(self, e: StreamExpr) -> DataFrame:
        """FeaturesSelectionStream (solrj/io/stream/
        FeaturesSelectionStream.java:60, Lang.java:67): information-
        gain term ranking via mlstreams.features_selection over the
        engine's postings (the igain qparser math, one distributed
        aggregate — no driver term loop)."""
        if self.postings is None:
            raise ValueError("features() needs a postings hook "
                             "(collection, field) -> (term, docid)")
        coll = e.args[0]
        field = e.params.get("field", "text")
        num_terms = int(e.params.get("numTerms", 10))
        fset = e.params.get("featureSet", "features")
        from .mlstreams import features_selection
        return features_selection(self.postings(coll, field),
                                  self._labels_for(coll, e),
                                  num_terms, feature_set=fset)

    def _s_train(self, e: StreamExpr) -> DataFrame:
        """TextLogitStream (solrj/io/stream/TextLogitStream.java:80,
        Lang.java:66): logistic regression over the wrapped
        features() stream's terms. One tuple per iteration carrying
        the weight vector, iteration-start error, the model name and
        the term list (the shape ModelStream consumes). The term
        list is config-sized (numTerms), so the one bounded driver
        read here matches the reference's getTerms round-trip
        (TextLogitStream.java:426)."""
        if self.postings is None:
            raise ValueError("train() needs a postings hook")
        coll = e.args[0]
        feats = [x for x in e.args if isinstance(x, StreamExpr)
                 and x.name == "features"]
        if len(feats) != 1:
            raise ValueError("train() wraps exactly one features() "
                             "stream")
        terms = [r["term_s"]
                 for r in self.eval(feats[0]).collect()]
        field = e.params.get("field", "text")
        name = e.params.get("name", "model")
        max_it = int(e.params.get("maxIterations", 3))
        from .mlstreams import train_logit
        wl = train_logit(self.postings(coll, field),
                         self._labels_for(coll, e), terms,
                         max_iterations=max_it)
        st = F.sort_array(F.collect_list(F.struct(
            F.col("idx"), F.col("weight"))))
        return (wl.groupBy("iteration_i")
                .agg(F.transform(st, lambda s: s["weight"])
                     .alias("weights_ds"),
                     F.first("error").alias("error_d"))
                .withColumn("name_s", F.lit(name))
                .withColumn("terms_ss",
                            F.array(*[F.lit(t) for t in terms]))
                .orderBy("iteration_i"))

    def _s_model(self, e: StreamExpr) -> DataFrame:
        """ModelStream (solrj/io/stream/ModelStream.java, Lang
        .java:77): pull the LATEST stored model tuple by id from the
        model collection (the reference caches by cacheMillis —
        recorded, never slept on; Catalyst replays the read)."""
        coll = e.args[0]
        mid = e.params.get("id")
        if not mid:
            raise ValueError("model() requires an id= param")
        df = self.collections[coll]
        return (df.filter(F.col("name_s") == mid)
                .orderBy(F.col("iteration_i").desc()).limit(1))

    def _s_jdbc(self, e: StreamExpr) -> DataFrame:
        """JDBCStream (solrj/io/stream/JDBCStream.java:150, Lang
        .java:43): ``jdbc(connection=, sql=, sort=, [driver=])``.
        The sort= contract is enforced like the reference (the
        stream declares its sort order). No JDBC driver ships in
        this engine — the caller injects ``jdbc_reader`` (in Spark,
        a closure over spark.read.format("jdbc"); in tests, a
        double), keeping the surface honest without a fake DB."""
        for p in ("connection", "sql", "sort"):
            if p not in e.params:
                raise ValueError(f"jdbc() requires a {p}= param")
        if self.jdbc_reader is None:
            raise ValueError(
                "jdbc(): no JDBC driver is bundled — inject a "
                "jdbc_reader(connection, sql, params) callable "
                "(e.g. spark.read.format('jdbc'))")
        out = self.jdbc_reader(e.params["connection"],
                               e.params["sql"], dict(e.params))
        return out.orderBy(*_sort_cols(e.params["sort"]))

    def _s_scoreNodes(self, e: StreamExpr) -> DataFrame:
        """ScoreNodesStream (solrj/io/stream/ScoreNodesStream.java:48):
        tf-idf score each gathered node.  termFreq is the inner
        stream's count(*) metric (:85), docFreq/numDocs come from the
        collection the node terms live in, and the score is :243

            (ln(termFreq) + 1) * (ln((numDocs+1)/(docFreq+1)) + 1)

        ``collection``/``field`` params name where the node terms are
        counted (the reference reads them from gatherNodes tuple
        metadata).  docFreq is ONE hash aggregate over the collection
        joined to the (tiny) node set — the reference instead issues a
        TermsComponent lookup per batch; the aggregate is the
        distributed equivalent and broadcasts the node side.
        """
        (src,) = self._streams(e)
        coll = self.collections[e.params["collection"]]
        fld = e.params["field"]
        dfreq = (coll.groupBy(F.col(fld).alias("node"))
                 .agg(F.count("*").cast("long").alias("docFreq")))
        num_docs = coll.count()
        out = src.join(F.broadcast(dfreq), "node", "left") \
            .na.fill({"docFreq": 0})
        score = ((F.log(F.col("count").cast("double")) + 1.0)
                 * (F.log((F.lit(float(num_docs + 1)))
                          / (F.col("docFreq").cast("double") + 1.0))
                    + 1.0))
        return out.select(
            "node", "count", "docFreq",
            F.lit(num_docs).cast("long").alias("numDocs"),
            score.alias("nodeScore"))

    def _s_having(self, e: StreamExpr) -> DataFrame:
        (src,) = self._streams(e)
        conds = [a for a in e.args if isinstance(a, StreamExpr)
                 and a.name in ("gt", "lt", "eq", "gteq", "lteq")]
        ops = {"gt": ">", "lt": "<", "eq": "=", "gteq": ">=", "lteq": "<="}
        out = src
        for c in conds:
            out = out.filter(F.expr(
                f"{c.args[0]} {ops[c.name]} {c.args[1]}"))
        return out
