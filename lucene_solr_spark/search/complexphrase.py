"""ComplexPhraseQueryParser -> engine query AST (the NINTH parser
family).

The reference parser (lucene/queryparser/src/java/org/apache/lucene/
queryparser/complexPhrase/ComplexPhraseQueryParser.java:63) extends the
classic syntax so QUOTED PHRASES may embed multi-term subclauses —
wildcards and alternation groups — which it rewrites to span queries
over the expanded terms. Here each quoted phrase compiles to the
engine AST node whose oracle-proven machinery already implements that
expansion:

- ``"ha* join"``            -> PhraseWildcard (pattern slots expanded
  against the term dictionary, PhraseWildcardQuery.java:63)
- ``"table (hash merge)"``  -> MultiPhrase (alternation slots,
  MultiPhraseQuery.java:56)
- ``"slow batch"~2``        -> sloppy Phrase (SloppyPhraseMatcher
  semantics)
- plain quoted              -> exact Phrase

Outside quotes the classic +must / -must_not / bare-should clause
forms apply (same Bool assembly as the classic parser).

Documented divergences (raised, never silently wrong):
- a phrase mixing pattern AND alternation slots in one quote is
  rejected (the engine nodes are one-per-mechanism; the reference
  builds a single span tree);
- slop > 0 combines only with plain-term phrases (the engine's sloppy
  matcher is exact for distinct plain terms).
"""

from __future__ import annotations

import re

from .query import (
    Bool, MultiPhrase, Phrase, PhraseWildcard, Query, Term,
)


class ComplexPhraseError(ValueError):
    pass


_CLAUSE_RE = re.compile(
    r"""\s*([+-]?)                 # occur prefix
        ("(?:[^"\\]|\\.)*"(?:~\d+)?   # quoted phrase (+slop)
         |\S+)                     # or a bare token
    """, re.X)


def _norm(tok: str) -> str:
    return tok.lower()


def _split_slots(body: str) -> list:
    """Split a phrase body into slots, honoring (...) groups."""
    slots, i, n = [], 0, len(body)
    while i < n:
        if body[i].isspace():
            i += 1
            continue
        if body[i] == "(":
            j = body.index(")", i)
            alts = tuple(_norm(t) for t in body[i + 1:j].split())
            if not alts:
                raise ComplexPhraseError("empty alternation group")
            slots.append(alts)
            i = j + 1
        else:
            j = i
            while j < n and not body[j].isspace():
                j += 1
            slots.append(_norm(body[i:j]))
            i = j
    if not slots:
        raise ComplexPhraseError("empty phrase")
    return slots


def _compile_phrase(body: str, slop: int) -> Query:
    slots = _split_slots(body)
    has_group = any(isinstance(s, tuple) for s in slots)
    has_pattern = any(isinstance(s, str) and ("*" in s or "?" in s)
                      for s in slots)
    if has_group and has_pattern:
        raise ComplexPhraseError(
            "mixed wildcard and alternation slots in one phrase are "
            "not supported (one mechanism per quote)")
    if slop > 0 and (has_group or has_pattern):
        raise ComplexPhraseError(
            "slop combines only with plain-term phrases")
    if len(slots) == 1 and isinstance(slots[0], str) and not has_pattern:
        return Term(slots[0])
    if has_pattern:
        return PhraseWildcard(tuple(slots))
    if has_group:
        return MultiPhrase(tuple(
            s if isinstance(s, tuple) else (s,) for s in slots))
    return Phrase(tuple(slots), slop=slop)


def parse_complex_phrase(q: str) -> Query:
    """Parse a ComplexPhraseQueryParser query string."""
    must, must_not, should = [], [], []
    pos = 0
    while pos < len(q):
        m = _CLAUSE_RE.match(q, pos)
        if not m:
            break
        pos = m.end()
        occur, tok = m.group(1), m.group(2)
        if tok.startswith('"'):
            sm = re.match(r'^"((?:[^"\\]|\\.)*)"(?:~(\d+))?$', tok)
            if not sm:
                raise ComplexPhraseError(f"bad phrase token {tok!r}")
            node = _compile_phrase(sm.group(1),
                                   int(sm.group(2) or 0))
        else:
            t = _norm(tok)
            if "*" in t or "?" in t:
                from .query import Wildcard
                node = Wildcard(t)
            else:
                node = Term(t)
        (must if occur == "+" else
         must_not if occur == "-" else should).append(node)
    if not (must or should):
        raise ComplexPhraseError("no positive clauses")
    if not must_not and len(must) + len(should) == 1:
        return (must or should)[0]   # single-clause unwrap
    return Bool(must=tuple(must), should=tuple(should),
                must_not=tuple(must_not))
