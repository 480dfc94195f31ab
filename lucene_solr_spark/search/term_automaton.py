"""TermAutomatonQuery — term-transition automata compiled to the AST.

Reference: ``lucene/sandbox/src/java/org/apache/lucene/search/
TermAutomatonQuery.java:53-71`` — a proximity query whose automaton
transitions are TERMS ("a generalization of PhraseQuery,
MultiPhraseQuery and SpanNearQuery"), built with ``createState`` /
``setAccept`` / ``addTransition`` / ``finish``; its canonical producer
is ``TokenStreamToTermAutomatonQuery.java`` (graph token streams with
multi-token synonyms, where paths through the automaton have DIFFERENT
lengths — the case MultiPhraseQuery cannot express).

Spark-first realization: Lucene's scorer merge-sorts per-document
position lists and runs the automaton over them
(``TermAutomatonScorer.java``); on an acyclic automaton that is
exactly "match any accepted term-path as an exact phrase".  We
therefore compile the finished automaton by enumerating its accepted
paths and REWRITING to the disjunction of their phrase queries
(single-term paths become TermQuery) — each path is then scored by
the engine's oracle-proven Phrase/Term machinery, and the disjunction
by the Bool SHOULD path.  This mirrors Lucene's own
``QueryBuilder.analyzeGraphPhrase`` strategy of flattening a token
graph into per-path queries.

Bounds (the analogue of ``finish(maxDeterminizedStates)``,
TermAutomatonQuery.java:125): the automaton must be ACYCLIC (a cycle
raises, like Lucene's determinization-size blowup) and path count is
capped by ``max_paths``.  ``addAnyTransition`` (the '*' transition)
is out of subset — it requires dictionary expansion at every
position; use the multi-term queries for that.
"""

from __future__ import annotations

from .query import Bool, Phrase, Query, Term


class TermAutomatonError(ValueError):
    pass


class TermAutomaton:
    """createState/setAccept/addTransition/finish, like the reference."""

    def __init__(self) -> None:
        self._n = 0
        self._accept: set[int] = set()
        self._trans: list[tuple[int, int, str]] = []
        self._finished: Query | None = None

    def create_state(self) -> int:
        self._n += 1
        return self._n - 1

    def set_accept(self, state: int, accept: bool = True) -> None:
        if not 0 <= state < self._n:
            raise TermAutomatonError(f"unknown state {state}")
        (self._accept.add if accept else self._accept.discard)(state)

    def add_transition(self, source: int, dest: int, term: str) -> None:
        if not (0 <= source < self._n and 0 <= dest < self._n):
            raise TermAutomatonError("transition on unknown state")
        self._trans.append((source, dest, term.lower()))

    def finish(self, max_paths: int = 128) -> Query:
        """Enumerate accepted paths from state 0 and compile to the
        disjunction of their phrase queries (the acyclic-automaton
        equivalence of TermAutomatonScorer's position-merge run)."""
        if self._finished is not None:
            return self._finished
        if not self._accept:
            raise TermAutomatonError("no accept states")
        out: dict[int, list[tuple[int, tuple[str, ...]]]] = {}
        for s, d, t in self._trans:
            out.setdefault(s, []).append((d, t))
        paths: list[tuple[str, ...]] = []

        def walk(state: int, terms: tuple, seen: tuple) -> None:
            if state in seen:
                raise TermAutomatonError(
                    "cyclic automaton (the finish(maxDeterminizedStates)"
                    " blowup analogue) — acyclic term graphs only")
            if state in self._accept and terms:
                paths.append(terms)
                if len(paths) > max_paths:
                    raise TermAutomatonError(
                        f"more than {max_paths} accepted paths")
            for dest, term in sorted(out.get(state, ())):
                walk(dest, terms + (term,), seen + (state,))

        walk(0, (), ())
        if not paths:
            raise TermAutomatonError("automaton accepts no path")
        # deterministic clause order: path-term-sequence ascending
        clauses = tuple(
            Term(p[0]) if len(p) == 1 else Phrase(p)
            for p in sorted(set(paths)))
        self._finished = (clauses[0] if len(clauses) == 1
                          else Bool(should=clauses))
        return self._finished


def token_stream_to_query(paths: list[list[str]]) -> Query:
    """TokenStreamToTermAutomatonQuery.java shape: build the automaton
    from the distinct root-to-end paths of a graph token stream (each
    ``paths`` element is one path, e.g. ['wi', 'fi', 'network'] and
    ['wifi', 'network']) and finish it."""
    ta = TermAutomaton()
    start = ta.create_state()
    end = ta.create_state()
    ta.set_accept(end)
    for p in paths:
        if not p:
            raise TermAutomatonError("empty path")
        prev = start
        for i, term in enumerate(p):
            nxt = end if i == len(p) - 1 else ta.create_state()
            ta.add_transition(prev, nxt, term)
            prev = nxt
    return ta.finish()
