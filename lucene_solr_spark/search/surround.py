"""Surround query parser (lucene/queryparser/src/java/org/apache/
lucene/queryparser/surround/parser/QueryParser.jj): the span-oriented
query language — ``W`` (ordered within distance) and ``N`` (unordered
within distance) proximity operators plus AND / OR / NOT and
parentheses, compiled to this engine's span AST.

Mapping (surround semantics -> AST):

* ``a W b`` / ``a 1W b``: ordered adjacency -> ``SpanNear((a, b), 0)``.
  n-ary ``W`` chains of distance 1 flatten to one SpanNear with total
  gap 0 (adjacent runs are exactly total-gap-0 runs).
* ``a nW b`` (n > 1, binary): ordered within n -> ``SpanNear((a, b),
  n - 1)`` (surround distance counts positions, our slop counts gaps).
* ``a nN b`` (binary): unordered within n -> union of both orders,
  the NearSpansUnordered composition the engine already scores:
  ``SpanOr((SpanNear((a, b), n-1), SpanNear((b, a), n-1)))``.
* ``AND`` / ``OR`` / ``NOT`` -> Bool must / should / must_not, with
  surround precedence NOT > AND > OR; W/N bind tightest.

Like the reference parser, operators are case-insensitive; distance
defaults to 1. n-ary W with distance > 1 and nested span operands are
rejected with QueryParseError (the reference supports them via
nested SpanNearQuery — our span AST is term-tuple based), which keeps
everything this parser ACCEPTS exactly equal to the reference's
result set.
"""

from __future__ import annotations

import re

from ..analysis.analyzers import simple_tokenize
from .parser import QueryParseError
from .query import Bool, Query, SpanNear, SpanOr, Term

_TOKEN_RE = re.compile(r"\(|\)|(\d*)([WwNn])\b|[^\s()]+")


def _tokenize(text: str) -> list:
    out = []
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        if m.group(2) is not None and (m.group(1) or tok.upper() in
                                       ("W", "N")):
            out.append(("op", int(m.group(1) or 1), m.group(2).upper()))
        elif tok in "()":
            out.append((tok,))
        elif tok.upper() in ("AND", "OR", "NOT"):
            out.append((tok.upper(),))
        else:
            toks = simple_tokenize(tok)
            if len(toks) != 1:
                raise QueryParseError(f"unparsable surround term {tok!r}")
            out.append(("term", toks[0]))
    return out


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise QueryParseError("unexpected end of surround query")
        self.i += 1
        return t

    # OR -> AND -> NOT -> proximity -> atom
    def parse_or(self) -> Query:
        left = self.parse_and()
        shoulds = [left]
        while self.peek() == ("OR",):
            self.next()
            shoulds.append(self.parse_and())
        if len(shoulds) == 1:
            return left
        return Bool(should=tuple(shoulds))

    def parse_and(self) -> Query:
        left = self.parse_not()
        musts = [left]
        while self.peek() == ("AND",):
            self.next()
            musts.append(self.parse_not())
        if len(musts) == 1:
            return left
        return Bool(must=tuple(musts))

    def parse_not(self) -> Query:
        left = self.parse_prox()
        while self.peek() == ("NOT",):
            self.next()
            right = self.parse_prox()
            left = Bool(must=(left,), must_not=(right,))
        return left

    def parse_prox(self) -> Query:
        left = self.parse_atom()
        chain = [left]
        dists = []
        kinds = []
        while (t := self.peek()) is not None and t[0] == "op":
            self.next()
            dists.append(t[1])
            kinds.append(t[2])
            chain.append(self.parse_atom())
        if not dists:
            return left
        terms = []
        for node in chain:
            if not isinstance(node, Term):
                raise QueryParseError(
                    "surround proximity over non-term operands is not "
                    "supported (nested spans)")
            terms.append(node.term)
        if all(k == "W" for k in kinds):
            if all(d == 1 for d in dists):
                return SpanNear(tuple(terms), 0)
            if len(terms) == 2:
                return SpanNear(tuple(terms), dists[0] - 1)
            raise QueryParseError(
                "n-ary W with distance > 1 is not supported")
        if kinds == ["N"] and len(terms) == 2:
            a, b = terms
            n = dists[0] - 1
            return SpanOr((SpanNear((a, b), n), SpanNear((b, a), n)))
        raise QueryParseError("unsupported N-operator combination")

    def parse_atom(self) -> Query:
        t = self.next()
        if t == ("(",):
            node = self.parse_or()
            if self.next() != (")",):
                raise QueryParseError("expected )")
            return node
        if t[0] == "term":
            return Term(t[1])
        raise QueryParseError(f"unexpected token {t!r}")


def parse_surround(text: str) -> Query:
    toks = _tokenize(text)
    if not toks:
        raise QueryParseError("empty surround query")
    p = _P(toks)
    node = p.parse_or()
    if p.peek() is not None:
        raise QueryParseError(f"trailing tokens at {p.peek()!r}")
    return node
