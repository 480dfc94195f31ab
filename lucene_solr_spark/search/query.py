"""Query AST — the engine-side analogue of Lucene's Query tree.

Each node maps to a documented reference operator (SURVEY.md §2.2).
Semantics notes that both backends (Spark DataFrame compiler and the
DuckDB oracle-SQL generator) must honor identically:

- Term        TermQuery (SEARCH/TermQuery.java:108): BM25-scored postings.
- Bool        BooleanQuery (SEARCH/BooleanQuery.java:75): score = sum of
              scoring clauses (MUST + matching SHOULD); MUST_NOT excludes
              (ReqExclScorer), FILTER matches without scoring
              (ScoreMode.COMPLETE_NO_SCORES), minimumNumberShouldMatch.
- Phrase      exact PhraseQuery (SEARCH/PhraseQuery.java:70,
              ExactPhraseMatcher.java:36): freq = number of positions p
              with term_i at p+i for all i; idf = sum of per-term idfs
              (double sum of float idfs, BM25Similarity.java:172-181).
- Synonym     SynonymQuery (SEARCH/SynonymQuery.java:203-219):
              pseudo-term with df = max(df_i), per-doc freq = sum tf_i.
- Prefix / Wildcard / TermRange / TermInSet / Fuzzy / Regexp
              multi-term queries under the constant-score rewrite
              (MultiTermQueryConstantScoreWrapper): every matching doc
              scores boost * 1.0.
- DisMax      DisjunctionMaxQuery (SEARCH/DisjunctionMaxQuery.java:45):
              max(clause scores) + tiebreak * (sum - max).
- Boost       BoostQuery: multiply subquery scores.
- ConstantScore  ConstantScoreQuery: fixed score for matching docs.
- MatchAll    MatchAllDocsQuery: every doc, score 1.0.

Tie-breaking everywhere: score DESC, docid ASC
(SEARCH/HitQueue.java:76-79, TopDocs.merge TopDocs.java:33-34).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple, Union

Query = Union[
    "Term", "Bool", "Phrase", "MultiPhrase", "SpanNear", "Synonym", "Prefix",
    "Wildcard", "TermRange", "TermInSet", "Fuzzy", "Regexp", "DisMax",
    "Boost", "ConstantScore", "MatchAll",
]


@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Bool:
    must: Tuple[Query, ...] = ()
    should: Tuple[Query, ...] = ()
    must_not: Tuple[Query, ...] = ()
    filter: Tuple[Query, ...] = ()
    minimum_should_match: int = 0


@dataclass(frozen=True)
class Phrase:
    terms: Tuple[str, ...]
    slop: int = 0


@dataclass(frozen=True)
class MultiPhrase:
    """Phrase with term alternatives per slot (MultiPhraseQuery,
    SEARCH/MultiPhraseQuery.java:56). freq = number of start positions
    p with SOME alternative of slot i at p+i for every i; idf = double
    sum of every alternative's idf (BM25Similarity.idfExplain over all
    terms, MultiPhraseQuery weight construction)."""

    slots: Tuple[Tuple[str, ...], ...]


@dataclass(frozen=True)
class SpanNear:
    """Ordered proximity filter (SpanNearQuery,
    lucene/core/src/java/org/apache/lucene/search/spans/
    SpanNearQuery.java, in_order=true): matches docs containing
    positions p_1 < p_2 < ... < p_k for the k terms with total gap
    p_k - p_1 - (k-1) <= slop. Used in constant-score / FILTER
    contexts (our engine scores spans under the constant-score
    rewrite rather than Lucene's sloppyFreq)."""

    terms: Tuple[str, ...]
    slop: int = 0


@dataclass(frozen=True)
class Synonym:
    terms: Tuple[str, ...]


@dataclass(frozen=True)
class Prefix:
    prefix: str


@dataclass(frozen=True)
class Wildcard:
    pattern: str  # Lucene syntax: * = any run, ? = one char


@dataclass(frozen=True)
class TermRange:
    lower: str
    upper: str
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class TermInSet:
    terms: Tuple[str, ...]


@dataclass(frozen=True)
class Fuzzy:
    """Documented divergence from the reference: Lucene's FuzzyQuery
    uses Damerau-Levenshtein (transpositions count as ONE edit,
    SEARCH/FuzzyQuery.java:56 transpositions=true default); both our
    backends use classic Levenshtein (Spark/DuckDB builtins), so a pure
    transposition costs 2 edits. Engine and oracle agree with each
    other; term sets can differ from Lucene for transposed pairs at the
    edit boundary."""

    term: str
    max_edits: int = 2


@dataclass(frozen=True)
class Regexp:
    pattern: str


@dataclass(frozen=True)
class DisMax:
    clauses: Tuple[Query, ...]
    tiebreak: float = 0.0


@dataclass(frozen=True)
class Boost:
    query: Query
    boost: float


@dataclass(frozen=True)
class ConstantScore:
    query: Query
    score: float = 1.0


@dataclass(frozen=True)
class MatchAll:
    pass


def collect_terms(q: Query) -> set:
    """All literal terms referenced by the tree (for stats resolution)."""
    if isinstance(q, Term):
        return {q.term}
    if isinstance(q, (Phrase, Synonym, TermInSet, SpanNear)):
        return set(q.terms)
    if isinstance(q, MultiPhrase):
        return {t for slot in q.slots for t in slot}
    if isinstance(q, Bool):
        out = set()
        for sub in (*q.must, *q.should, *q.must_not, *q.filter):
            out |= collect_terms(sub)
        return out
    if isinstance(q, DisMax):
        out = set()
        for sub in q.clauses:
            out |= collect_terms(sub)
        return out
    if isinstance(q, (Boost, ConstantScore)):
        return collect_terms(q.query)
    return set()
