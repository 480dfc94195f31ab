"""eDisMax query parser: Solr's ExtendedDismaxQParser re-expressed
over the engine's query AST.

Reference semantics (solr/core/src/java/org/apache/solr/search/
ExtendedDismaxQParser.java, solr/core/src/java/org/apache/solr/util/
SolrPluginUtils.java):

- the user query is parsed with the classic grammar, but every term
  leaf is *aliased* across the ``qf`` fields as a DisjunctionMaxQuery
  with the ``tie`` tiebreaker and per-field boosts
  (ExtendedSolrQueryParser.getAliasedQuery, ExtendedDismaxQParser.java:
  1081-1108);
- ``mm`` (minimum-should-match spec) is applied to the top-level
  BooleanQuery's optional clauses via SolrPluginUtils.setMinShouldMatch;
  when the query contains explicit operators (AND/OR/NOT/+/-) and no
  explicit ``mm`` was given, mm processing is turned off ("0%") —
  parseOriginalQuery, ExtendedDismaxQParser.java:408-417;
- ``pf``/``pf2``/``pf3`` add sloppy phrase queries over the bare
  (non-field, non-phrase) words of the query as optional boost clauses:
  whole-query phrase for pf, consecutive bigram/trigram shingles for
  pf2/pf3, summed across shingles and dismax'ed across fields
  (addPhraseFieldQueries / addShingledPhraseQueries,
  ExtendedDismaxQParser.java:296-360);
- ``bq`` boost queries join as additional optional clauses
  (ExtendedDismaxQParser.java:186-196).

One analyzed field ("text") exists; any other field named in ``qf`` is
treated as a Solr ``StrField`` (exact raw-value match -> FieldTerm
node). The output is a plain query AST, so the Spark engine and the
DuckDB oracle both evaluate it with no parser-specific code.
"""

from __future__ import annotations

import re

from ..analysis.analyzers import simple_tokenize
from .parser import QueryParseError, _Parser, _tokenize_query
from .query import (
    Bool, Boost, DisMax, FieldTerm, Phrase, Query,
)

_OPERATOR_TOKENS = {"AND", "OR", "NOT", "&&", "||", "!", "+", "-"}
_BARE_WORD_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")
_COND_SPLIT_RE = re.compile(r"(\s+<\s*)|(\s*<\s+)")


def calculate_min_should_match(optional_clause_count: int,
                               spec: str) -> int:
    """Port of SolrPluginUtils.calculateMinShouldMatch
    (SolrPluginUtils.java:671-717): plain integers, negatives
    (count back from all), percentages (truncated toward zero like
    Java's (int) cast), and space-separated conditional specs
    ``"upper<spec"`` evaluated left to right."""
    result = optional_clause_count
    spec = spec.strip()
    if "<" in spec:
        spec = _COND_SPLIT_RE.sub("<", spec)
        for s in spec.split(" "):
            parts = s.split("<")
            if len(parts) < 2 or not parts[0]:
                raise ValueError(f"invalid mm spec {s!r}")
            upper_bound = int(parts[0])
            if optional_clause_count <= upper_bound:
                return result
            result = calculate_min_should_match(
                optional_clause_count, parts[1])
        return result
    if "%" in spec:
        percent = int(spec[:-1])
        calc = (result * percent) / 100.0
        # Java (int) cast truncates toward zero for both signs
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc
    return (optional_clause_count if optional_clause_count < result
            else (0 if result < 0 else result))


class _EdismaxParser(_Parser):
    """Classic parser with eDisMax field aliasing: each text leaf
    expands to a per-field DisMax across ``qf``; bare words are
    recorded for pf phrase boosting (normalClauses,
    ExtendedDismaxQParser.java:304-316)."""

    def __init__(self, tokens: list, qf: dict, tie: float,
                 text_field: str = "text"):
        super().__init__(tokens, default_field=text_field)
        self.qf = qf
        self.tie = tie
        self.text_field = text_field
        self.pf_words: list[str] = []

    def _alias(self, text_node: Query | None, raw: str) -> Query | None:
        clauses: list[Query] = []
        for fld, boost in self.qf.items():
            if fld == self.text_field:
                if text_node is not None:
                    clauses.append(Boost(text_node, boost)
                                   if boost != 1.0 else text_node)
            elif _BARE_WORD_RE.match(raw):
                # StrField: the raw (unanalyzed) token, exact match
                node: Query = FieldTerm(fld, raw)
                clauses.append(Boost(node, boost)
                               if boost != 1.0 else node)
        if not clauses:
            return None
        if len(clauses) == 1:
            return clauses[0]
        return DisMax(tuple(clauses), self.tie)

    def _leaf(self, t: str) -> Query | None:
        if ":" in t and not t.startswith('"'):
            fld, rest = t.split(":", 1)
            if fld in self.qf and fld != self.text_field:
                # explicitly fielded clause: no qf aliasing
                return FieldTerm(fld, rest.strip('"'))
            # fall through: classic handling (text field or error)
            return super()._leaf(t)
        if t.startswith('"'):
            # quoted phrases alias only to analyzed fields
            node = super()._leaf(t)
            if node is None:
                return None
            b = self.qf.get(self.text_field)
            if b is None:
                return None
            return Boost(node, b) if b != 1.0 else node
        if _BARE_WORD_RE.match(t):
            self.pf_words.extend(simple_tokenize(t))
        return self._alias(super()._leaf(t), t)


def _shingle_phrases(words: list[str], wordgram: int,
                     slop: int) -> list[Query]:
    """Phrase queries for pf (wordgram 0 = whole query) / pf2 / pf3
    (addShingledPhraseQueries, ExtendedDismaxQParser.java:346-360)."""
    if wordgram == 0:
        return [Phrase(tuple(words), slop)] if len(words) > 1 else []
    return [Phrase(tuple(words[i:i + wordgram]), slop)
            for i in range(len(words) - wordgram + 1)]


def edismax(q: str, qf: dict | None = None, tie: float = 0.0,
            mm: str | None = None, pf: dict | None = None,
            ps: int = 0, pf2: dict | None = None, ps2: int | None = None,
            pf3: dict | None = None, ps3: int | None = None,
            bq: tuple = (), text_field: str = "text") -> Query:
    """Parse an eDisMax request into the engine AST.

    ``qf``/``pf``/``pf2``/``pf3`` map field name -> boost; ``ps*`` are
    the phrase slops (ps2/ps3 default to ps, ExtendedDismaxQParser
    U.java FieldParams).  ``mm=None`` reproduces the q.op=OR default
    ("0%")."""
    qf = dict(qf or {text_field: 1.0})
    toks = _tokenize_query(q)
    if not toks:
        raise QueryParseError("empty query")
    found_ops = any(t in _OPERATOR_TOKENS for t in toks)

    up = _EdismaxParser(toks, qf, tie, text_field)
    main = up.parse_expr()

    # mm processing (parseOriginalQuery, ExtendedDismaxQParser.java:
    # 408-417): explicit operators turn mm off unless the user gave one
    mm_spec = mm
    if found_ops and mm is None:
        mm_spec = "0%"
    if mm_spec is None:
        mm_spec = "0%"
    if isinstance(main, Bool) and main.should and \
            main.minimum_should_match == 0:
        msm = calculate_min_should_match(len(main.should), mm_spec)
        if msm > 0:
            main = Bool(main.must, main.should, main.must_not,
                        main.filter, msm)

    # phrase-field boosts over the bare words
    extras: list[Query] = []
    words = up.pf_words
    for fields, wordgram, slop in (
            (pf, 0, ps), (pf2, 2, ps2 if ps2 is not None else ps),
            (pf3, 3, ps3 if ps3 is not None else ps)):
        if not fields or len(words) < max(2, wordgram):
            continue
        per_field: list[Query] = []
        for fld, boost in fields.items():
            if fld != text_field:
                continue    # phrases only exist on analyzed fields
            phrases = _shingle_phrases(words, wordgram, slop or 0)
            if not phrases:
                continue
            node: Query = (phrases[0] if len(phrases) == 1
                           else Bool(should=tuple(phrases)))
            per_field.append(Boost(node, boost)
                             if boost != 1.0 else node)
        if len(per_field) == 1:
            extras.append(per_field[0])
        elif per_field:
            extras.append(DisMax(tuple(per_field), tie))

    extras.extend(bq)
    if not extras:
        return main
    return Bool(must=(main,), should=tuple(extras))
