"""Solr Parallel SQL handler (solr/core/src/java/org/apache/solr/
handler/SQLHandler.java:50; the Calcite planner in handler/sql/
SolrRules.java pushes Project/Filter/Aggregate/Sort into streaming
expressions — SolrFilter.java translates WHERE into a Solr query,
SolrAggregate.java into rollup/facet streams, LimitStream.java caps).

The Spark re-expression inverts the flow: a small recursive-descent
parser for the handler's documented SQL subset compiles straight to
DataFrame operators, so Catalyst plays Calcite's role natively.
Supported, like the reference's documented surface:

  SELECT col[, ...] | agg(col)[, ...]
  FROM collection
  [WHERE <field> <op> <value> [AND ...]]     op: = != < <= > >=
  [GROUP BY col[, ...]] [HAVING agg(col) op value]
  [ORDER BY col|agg(col) [ASC|DESC], ...] [LIMIT n]

Solr's map of `WHERE textfield = 'terms'` to a full-text search is
kept: an equality predicate on the registered text field becomes an
engine match (the caller provides ``text_search`` exactly like the
streaming-expression evaluator).  Aggregates: count(*), sum, min,
max, avg with RollupStream's flattened aliases (count, sum_f, ...).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_AGG_RE = re.compile(r"^(count|sum|min|max|avg)\((\*|[A-Za-z_][\w]*)\)$",
                     re.I)
_TOKEN = re.compile(
    r"\s*('(?:[^']*)'|[A-Za-z_][\w]*\(\s*(?:\*|[A-Za-z_][\w]*)\s*\)"
    r"|[A-Za-z_][\w]*|<=|>=|!=|=|<|>|,|\d+(?:\.\d+)?)")

_KEYWORDS = {"select", "from", "where", "and", "group", "by", "having",
             "order", "limit", "asc", "desc"}


class SQLParseError(ValueError):
    pass


def _tokenize(text: str) -> list[str]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN.match(text, i)
        if not m:
            if text[i:].strip():
                raise SQLParseError(f"bad token at {text[i:]!r}")
            break
        out.append(re.sub(r"\s+", "", m.group(1))
                   if "(" in m.group(1) else m.group(1))
        i = m.end()
    return out


def _agg_col(expr: str):
    m = _AGG_RE.match(expr)
    if not m:
        return None
    fn, arg = m.group(1).lower(), m.group(2)
    if fn == "count":
        return F.count("*").cast("long").alias("count")
    col = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}[fn](arg)
    if fn in ("sum", "min", "max"):
        col = col.cast("long")
    return col.alias(f"{fn}_{arg}")


def _agg_alias(expr: str) -> str:
    m = _AGG_RE.match(expr)
    fn, arg = m.group(1).lower(), m.group(2)
    return "count" if fn == "count" else f"{fn}_{arg}"


class SolrSQL:
    """Compiles the handler's SQL subset to a DataFrame plan."""

    def __init__(self, collections: dict[str, DataFrame],
                 text_search=None, text_field: str = "text"):
        self.collections = collections
        self.text_search = text_search
        self.text_field = text_field

    def execute(self, sql: str) -> DataFrame:
        t = _tokenize(sql)
        pos = 0

        def peek():
            return t[pos].lower() if pos < len(t) else None

        def take(expected=None):
            nonlocal pos
            if pos >= len(t):
                raise SQLParseError("unexpected end of query")
            tok = t[pos]
            if expected and tok.lower() != expected:
                raise SQLParseError(f"expected {expected!r}, got {tok!r}")
            pos += 1
            return tok

        take("select")
        cols = [take()]
        while peek() == ",":
            take()
            cols.append(take())
        take("from")
        coll = take()
        if coll not in self.collections:
            raise SQLParseError(f"unknown collection {coll!r}")
        df = self.collections[coll]

        if peek() == "where":
            take()
            while True:
                fld, op, val = take(), take(), take()
                df = self._apply_pred(coll, df, fld, op, val)
                if peek() == "and":
                    take()
                else:
                    break

        group_cols: list[str] = []
        if peek() == "group":
            take(), take("by")
            group_cols.append(take())
            while peek() == ",":
                take()
                group_cols.append(take())

        aggs = [c for c in cols if _AGG_RE.match(c)]
        plains = [c for c in cols if not _AGG_RE.match(c)]
        if aggs:
            bad = [c for c in plains if c not in group_cols]
            if bad:
                raise SQLParseError(f"non-grouped columns {bad}")
            df = df.groupBy(*group_cols).agg(*[_agg_col(a) for a in aggs])
            out_cols = group_cols + [_agg_alias(a) for a in aggs]
        else:
            if group_cols:
                raise SQLParseError("GROUP BY without aggregates")
            out_cols = plains
        df = df.select(*out_cols)

        if peek() == "having":
            take()
            expr, op, val = take(), take(), take()
            name = _agg_alias(expr) if _AGG_RE.match(expr) else expr
            df = df.filter(F.expr(f"{name} {op} {val}"))

        if peek() == "order":
            take(), take("by")
            order = []
            while True:
                expr = take()
                name = _agg_alias(expr) if _AGG_RE.match(expr) else expr
                direction = "asc"
                if peek() in ("asc", "desc"):
                    direction = take().lower()
                order.append(F.col(name).desc() if direction == "desc"
                             else F.col(name).asc())
                if peek() == ",":
                    take()
                else:
                    break
            df = df.orderBy(*order)

        if peek() == "limit":
            take()
            df = df.limit(int(take()))

        if pos != len(t):
            raise SQLParseError(f"trailing tokens {t[pos:]!r}")
        return df

    def _apply_pred(self, coll: str, df: DataFrame, fld: str, op: str,
                    val: str) -> DataFrame:
        if val.startswith("'"):
            pyval = val[1:-1]
            lit = F.lit(pyval)
        else:
            pyval = float(val) if "." in val else int(val)
            lit = F.lit(pyval)
        if (fld == self.text_field and op == "="
                and self.text_search is not None):
            # SolrFilter.java: equality on the indexed text field is a
            # full-text query, not a string compare
            ids = self.text_search(coll, pyval)
            key = ids.columns[0]
            return df.join(ids, key, "left_semi")
        c = F.col(fld)
        cond = {"=": c == lit, "!=": c != lit, "<": c < lit,
                "<=": c <= lit, ">": c > lit, ">=": c >= lit}[op]
        return df.filter(cond)
