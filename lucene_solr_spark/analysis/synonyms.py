"""Query-time multi-word synonym expansion — the SynonymGraphFilter +
graph-aware QueryBuilder pair.

Reference semantics re-expressed:

- SynonymMap holds rules mapping a multi-token input path to one or
  more output paths (lucene/analysis/common/src/java/org/apache/lucene/
  analysis/synonym/SynonymMap.java:42); matching is greedy longest
  input first (SynonymGraphFilter.java:58 — "matches always happen at
  the leftmost possible position, then longest").
- At query time the graph filter emits a token *graph*; QueryBuilder
  walks its articulation points and, for the boolean case, builds per
  slot a disjunction of the paths through the slot, where a one-token
  path becomes a TermQuery and a multi-token path a PhraseQuery
  (lucene/core/src/java/org/apache/lucene/util/QueryBuilder.java:
  analyzeGraphBoolean / analyzeGraphPhrase).

This module performs the same expansion directly on the analyzed token
sequence (our analyzer emits a linear stream, so rule matching IS the
graph construction): the result is an ordinary query AST that both
backends — the Spark engine and the DuckDB oracle generator — already
evaluate, which keeps synonym-expanded queries inside the oracle gate
with zero new scoring code.
"""

from __future__ import annotations

from ..search.query import Bool, Phrase, Query, Term


def _path_query(path: tuple[str, ...]) -> Query:
    """One graph path -> TermQuery / PhraseQuery (QueryBuilder shape)."""
    if len(path) == 1:
        return Term(path[0])
    return Phrase(tuple(path))


class SynonymGraph:
    """A query-time SynonymMap: input token path -> synonym paths.

    ``rules`` maps an input path (tuple of analyzed tokens) to the
    tuple of synonym paths it ALSO matches; the original path is always
    kept (SynonymMap.Builder.add with keepOrig=true, the
    SynonymGraphFilter default for query parsers).
    """

    def __init__(self, rules: dict[tuple[str, ...],
                                   tuple[tuple[str, ...], ...]]):
        for lhs, rhss in rules.items():
            if not lhs or any(not p for p in rhss):
                raise ValueError("empty synonym path")
        self.rules = dict(rules)
        self._max_len = max((len(k) for k in rules), default=0)

    def _match_at(self, tokens: list[str], i: int):
        """Longest rule whose input path starts at tokens[i]."""
        for n in range(min(self._max_len, len(tokens) - i), 0, -1):
            lhs = tuple(tokens[i:i + n])
            if lhs in self.rules:
                return lhs, self.rules[lhs]
        return None

    def expand(self, tokens: list[str], occur: str = "should") -> Query:
        """Expand an analyzed token sequence into a query AST.

        Each synonym-matched slot becomes Bool(should=(orig-path,
        *synonym-paths)) — QueryBuilder.analyzeGraphBoolean's per-slot
        disjunction; unmatched tokens stay TermQuery.  ``occur``
        combines the slots: ``should`` (default OR operator) or
        ``must`` (AND operator), QueryBuilder.createBooleanQuery's
        ``operator`` argument.
        """
        if occur not in ("should", "must"):
            raise ValueError(f"occur must be should|must, got {occur!r}")
        slots: list[Query] = []
        i = 0
        while i < len(tokens):
            m = self._match_at(tokens, i)
            if m is None:
                slots.append(Term(tokens[i]))
                i += 1
                continue
            lhs, rhss = m
            paths = (_path_query(lhs),) + tuple(
                _path_query(p) for p in rhss)
            slots.append(Bool(should=paths))
            i += len(lhs)
        if not slots:
            raise ValueError("no tokens to expand")
        if len(slots) == 1:
            return slots[0]
        if occur == "must":
            return Bool(must=tuple(slots))
        return Bool(should=tuple(slots))
