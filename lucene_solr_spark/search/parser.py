"""Classic query-syntax parser: string -> query AST.

The analogue of Lucene's classic QueryParser
(lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/
QueryParserBase.java:105 parse; grammar QueryParser.jj). Supported
subset (single default text field):

    hello world              -> OR of terms (default OR like QueryParser
                                 with default operator OR)
    +apache -jakarta lucene  -> required / prohibited / optional
    "exact phrase"           -> PhraseQuery (quoted)
    "sloppy phrase"~2        -> SpanNear proximity (slop)
    a AND b / a && b         -> both required
    a OR b  / a || b         -> optional
    NOT a / !a               -> prohibited
    (grouping)               -> Bool subtree
    wild*card / wi?ld        -> WildcardQuery; trailing-* only -> Prefix
    fuzzy~ / fuzzy~1         -> FuzzyQuery (default max edits 2)
    [aaa TO bbb] / {aaa TO bbb} -> TermRange (inclusive/exclusive)
    term^2.5                 -> Boost
    field:term               -> accepted; only the default text field
                                exists, other field names are rejected

Leaf text runs through the SAME analyzer as indexing
(QueryParserBase.getFieldQuery -> createFieldQuery, analyzers must
match or query terms never equal indexed terms — SURVEY.md §3.3); a
quoted leaf whose analysis yields multiple tokens becomes a Phrase,
one token a Term, zero tokens drops the clause (MatchNoDocs).
"""

from __future__ import annotations

import re

from ..analysis.analyzers import simple_tokenize
from .query import (
    Bool, Boost, Fuzzy, Phrase, PhraseWildcard, Prefix, Query, SpanNear,
    Term, TermRange,
    Wildcard,
)


class QueryParseError(ValueError):
    pass


_TOKEN_RE = re.compile(r"""
    \s*(
        \(|\)|
        \[[^\]]*\]|\{[^}]*\}|            # ranges
        "(?:[^"\\]|\\.)*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?|  # quoted (+slop+boost)
        \|\||&&|!|\+|-|
        [^\s()\[\]{}+!]+                 # bare term-ish chunk
    )""", re.VERBOSE)


def _tokenize_query(s: str) -> list:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            break
        tok = m.group(1)
        if tok:
            out.append(tok)
        pos = m.end()
    return out


_RANGE_RE = re.compile(r"^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$",
                       re.IGNORECASE)
_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)$")
_FUZZY_RE = re.compile(r"~(\d*)$")


class _Parser:
    def __init__(self, tokens: list, default_field: str = "text"):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    # expr := clause ((AND|OR|implicit) clause)*
    def parse_expr(self) -> Query:
        must, should, must_not = [], [], []
        pending_op = None
        while True:
            t = self.peek()
            if t is None or t == ")":
                break
            if t in ("AND", "&&"):
                self.next()
                pending_op = "AND"
                continue
            if t in ("OR", "||"):
                self.next()
                pending_op = "OR"
                continue
            occur = ""
            if t in ("NOT", "!"):
                self.next()
                occur = "-"
                t = self.peek()
                if t is None:
                    raise QueryParseError("dangling NOT")
            elif t in ("+", "-"):
                occur = self.next()
            node = self.parse_clause()
            if node is None:
                pending_op = None
                continue
            if occur == "-":
                must_not.append(node)
            elif occur == "+":
                must.append(node)
            elif pending_op == "AND":
                # promote previous optional clause to required too
                if should:
                    must.append(should.pop())
                must.append(node)
            else:
                should.append(node)
            pending_op = None
        if not (must or should or must_not):
            raise QueryParseError("empty query")
        if len(should) == 1 and not must and not must_not:
            return should[0]
        if len(must) == 1 and not should and not must_not:
            return must[0]
        return Bool(must=tuple(must), should=tuple(should),
                    must_not=tuple(must_not))

    def parse_clause(self) -> Query | None:
        t = self.next()
        boost = None
        if t == "(":
            node = self.parse_expr()
            if self.next() != ")":
                raise QueryParseError("unbalanced parenthesis")
            nxt = self.peek()
            if nxt and _BOOST_RE.match(nxt or ""):
                boost = float(_BOOST_RE.match(self.next()).group(1))
            return Boost(node, boost) if boost else node

        m = _BOOST_RE.search(t)
        if m and not t.startswith('"'):
            boost = float(m.group(1))
            t = t[:m.start()]

        node = self._leaf(t)
        if node is None:
            return None
        return Boost(node, boost) if boost else node

    def _leaf(self, t: str) -> Query | None:
        # field prefix
        if ":" in t and not t.startswith('"'):
            field, rest = t.split(":", 1)
            if field != self.default_field:
                raise QueryParseError(f"unknown field {field!r}")
            t = rest
        # quoted phrase (optionally ~slop and/or ^boost)
        if t.startswith('"'):
            slop, boost = 0, None
            body = t
            bm = re.search(r'\^(\d+(?:\.\d+)?)$', body)
            if bm:
                boost = float(bm.group(1))
                body = body[: bm.start()]
            sm = re.search(r'"~(\d+)$', body)
            if sm:
                slop = int(sm.group(1))
                body = body[: sm.start() + 1]
            text = body[1:-1].replace('\\"', '"')
            if ("*" in text or "?" in text) and not slop:
                # ComplexPhraseQueryParser (lucene/queryparser/src/java/
                # org/apache/lucene/queryparser/complexPhrase/
                # ComplexPhraseQueryParser.java): wildcard-bearing slots
                # inside a quoted phrase expand against the term
                # dictionary — realized as PhraseWildcard (sandbox
                # PhraseWildcardQuery semantics). Patterns are
                # lowercased, not analyzed, like any multi-term query.
                slots = []
                for raw in text.split():
                    if "*" in raw or "?" in raw:
                        slots.append(raw.lower())
                    else:
                        tk = simple_tokenize(raw)
                        if not tk:
                            return None
                        slots.append(tk[0])
                node = PhraseWildcard(tuple(slots))
                return Boost(node, boost) if boost is not None else node
            terms = simple_tokenize(text)
            if not terms:
                return None
            if len(terms) == 1:
                node: Query = Term(terms[0])
            elif slop:
                # scored sloppy PhraseQuery ("a b"~n —
                # QueryParserBase.getFieldQuery slop handling;
                # SloppyPhraseMatcher semantics) when terms are
                # distinct; repeated terms fall back to the ordered
                # SpanNear filter (no-repeats matcher limitation)
                if len(set(terms)) == len(terms):
                    node = Phrase(tuple(terms), slop)
                else:
                    node = SpanNear(tuple(terms), slop)
            else:
                node = Phrase(tuple(terms))
            return Boost(node, boost) if boost is not None else node
        # range
        rm = _RANGE_RE.match(t)
        if rm:
            lo = simple_tokenize(rm.group(2)) or [rm.group(2).lower()]
            hi = simple_tokenize(rm.group(3)) or [rm.group(3).lower()]
            return TermRange(lo[0], hi[0],
                             include_lower=rm.group(1) == "[",
                             include_upper=rm.group(4) == "]")
        # fuzzy
        fm = _FUZZY_RE.search(t)
        if fm:
            base = t[: fm.start()]
            edits = int(fm.group(1)) if fm.group(1) else 2
            terms = simple_tokenize(base)
            if not terms:
                return None
            return Fuzzy(terms[0], edits)
        # wildcard / prefix: analyze the literal runs, keep * and ?
        if "*" in t or "?" in t:
            lowered = t.lower()
            if re.fullmatch(r"[a-z0-9]+\*", lowered):
                return Prefix(lowered[:-1])
            return Wildcard(lowered)
        terms = simple_tokenize(t)
        if not terms:
            return None
        if len(terms) == 1:
            return Term(terms[0])
        # one chunk, several tokens (e.g. "foo-bar") -> phrase like
        # QueryParser's createFieldQuery
        return Phrase(tuple(terms))


def parse(query: str, default_field: str = "text") -> Query:
    """Parse classic query syntax into the engine AST."""
    toks = _tokenize_query(query)
    if not toks:
        raise QueryParseError("empty query")
    return _Parser(toks, default_field).parse_expr()
