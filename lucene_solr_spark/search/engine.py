"""Query compiler: AST -> Spark DataFrame plans (double-precision mode).

The Spark realization of Lucene's Weight/Scorer stage
(SEARCH/IndexSearcher.java:459-505, Boolean2ScorerSupplier):

    term lookup      -> filter on the postings DataFrame (Catalyst prunes)
    MUST             -> inner join on docid   (ConjunctionDISI)
    SHOULD           -> union-all + groupBy(docid) (DisjunctionSumScorer)
    MUST_NOT         -> left_anti join        (ReqExclScorer)
    FILTER           -> left_semi join        (COMPLETE_NO_SCORES)
    phrase           -> position-list intersection (ExactPhraseMatcher)
    top-k            -> orderBy(score desc, docid asc).limit(k)
                        == TakeOrderedAndProject (per-partition heaps +
                        k-way merge = TopScoreDocCollector + TopDocs.merge)

Statistics are frozen at query-compile time exactly like
IndexSearcher.createWeight: per-term df comes from one tiny lookup on the
cached term_stats table, idf/avgdl are computed in python doubles and
inlined as literals (libm == the DuckDB oracle's libm, so engine and
oracle share the same transcendental bits).

Scores here are float64 end-to-end — the "oracle-checkable" mode whose
arithmetic is expressible in ANSI SQL. The Lucene float32 bit-parity
kernel lives in bm25.score32 and is exercised by the pytest oracle
(tests/test_lucene_parity.py); rank order agrees between the two modes
except at float32-rounding ties, which the fixtures pin.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import K1
from ..index.builder import InvertedIndex
from .bm25 import idf_sql, score_sql
from .payloads import payload_check_tf_sql, payload_factor_sql
from .query import (
    Bool, Boost, ConstantScore, DisMax, FieldExists, FieldTerm, Fuzzy,
    Interval, MatchAll,
    MultiPhrase, PayloadCheck, PayloadScore, Phrase, PhrasePositions,
    PhraseWildcard,
    Prefix, Query,
    Regexp, ReversedWildcard, SpanNear,
    SpanNot, SpanOr,
    Synonym, Term, TermInSet, TermRange, Wildcard, collect_terms,
    osa_le1_sql, osa_le2_sql, rewrite,
)


def _like_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


def wildcard_to_like(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        else:
            out.append(_like_escape(ch))
    return "".join(out)


MAX_CLAUSE_COUNT = 1024  # IndexSearcher.maxClauseCount (IndexSearcher.java:91)


class TooManyClauses(ValueError):
    pass


def term_predicate(q: Query):
    """Column predicate over a ``term`` column for multi-term queries
    (the term-dictionary scan of MultiTermQuery.rewrite,
    SEARCH/MultiTermQuery.java:66) — shared by the naive engine and the
    segment searcher's driver-side expansion. None for non-multi-term
    nodes."""
    t = F.col("term")
    if isinstance(q, Prefix):
        return t.like(_like_escape(q.prefix) + "%")
    if isinstance(q, ReversedWildcard):
        # ReversedWildcardFilterFactory strategy: evaluate the reversed
        # pattern against the reversed term, so a leading wildcard
        # becomes a trailing one ('*tion' -> reverse(term) LIKE
        # 'noit%'). With the reversed tokens materialized at index
        # build (as the Solr factory does) this is a pushable
        # StringStartsWith on the term dictionary instead of a full
        # dictionary regex sweep.
        return F.reverse(t).like(wildcard_to_like(q.pattern[::-1]))
    if isinstance(q, Wildcard):
        return t.like(wildcard_to_like(q.pattern))
    if isinstance(q, TermRange):
        lo = t >= q.lower if q.include_lower else t > q.lower
        hi = t <= q.upper if q.include_upper else t < q.upper
        return lo & hi
    if isinstance(q, TermInSet):
        return t.isin(list(q.terms))
    if isinstance(q, Fuzzy):
        # exact OSA accept set of Lucene's transposition automata
        # (LevenshteinAutomata.java:36): the SAME SQL text as the
        # oracle (query.osa_le{1,2}_sql — decomposition proof in the
        # Fuzzy docstring), compiled to a Column via F.expr
        if q.transpositions and q.max_edits == 1:
            return F.expr(osa_le1_sql("term", q.term))
        if q.transpositions and q.max_edits == 2:
            return F.expr(osa_le2_sql("term", q.term))
        return F.levenshtein(t, F.lit(q.term)) <= q.max_edits
    if isinstance(q, Regexp):
        # Lucene RegExp DIALECT (RegExp.java grammar — '^'/'$'
        # literal, '\\d' = letter d, '<n-m>' intervals, a&b / ~a
        # automaton algebra as predicate AND/NOT where they span a
        # whole (sub)pattern) translated via search/regexp.py, then
        # full-term anchored like the automaton match
        # (RegexpQuery.java:48); unanchored rlike is substring search
        from .regexp import lucene_regexp_to_tree

        def _build(node):
            kind = node[0]
            if kind == "re":
                return t.rlike("^(?:" + node[1] + ")$")
            if kind in ("and", "or"):
                c = _build(node[1][0])
                for x in node[1][1:]:
                    c = (c & _build(x)) if kind == "and" \
                        else (c | _build(x))
                return c
            return ~_build(node[1])
        return _build(lucene_regexp_to_tree(q.pattern))
    return None


class Searcher:
    def __init__(self, ix: InvertedIndex, query_cache=None,
                 similarity=None):
        """``query_cache``: optional search.cache.LRUQueryCache — caches
        filter-context match sets per query node (LRUQueryCache.java:90
        with UsageTrackingQueryCachingPolicy-style admission).

        ``similarity``: optional non-default similarity from
        search.similarities (IndexSearcher.setSimilarity analogue,
        SEARCH/IndexSearcher.java).  ``None`` keeps the built-in BM25
        path; a similarity instance reroutes Term/Synonym/Phrase/
        MultiPhrase clause scoring through its portable-SQL formula
        (the same text the DuckDB oracle evaluates)."""
        self.ix = ix
        self.query_cache = query_cache
        self.sim = similarity
        self._stats_cache: dict[str, tuple[int, int]] = {}

    # -- statistics (createWeight analogue) --------------------------------

    def _resolve_stats(self, terms: set) -> dict[str, tuple[int, int]]:
        """(df, ttf) per term, frozen at compile time like
        IndexSearcher.createWeight's TermStatistics."""
        missing = [t for t in terms if t not in self._stats_cache]
        if missing:
            rows = (self.ix.term_stats
                    .filter(F.col("term").isin(missing))
                    .select("term", "df", "ttf").collect())
            found = {r["term"]: (int(r["df"]), int(r["ttf"]))
                     for r in rows}
            for t in missing:
                self._stats_cache[t] = found.get(t, (0, 0))
        return {t: self._stats_cache[t] for t in terms}

    def _resolve_dfs(self, terms: set) -> dict[str, int]:
        return {t: st[0] for t, st in self._resolve_stats(terms).items()}

    def _field_df(self, fld: str, value: str) -> int:
        """docFreq of an exact stored-field value (FieldTerm stats),
        frozen per (field, value) like _resolve_stats."""
        key = (fld, value)
        cache = self.__dict__.setdefault("_field_df_cache", {})
        if key not in cache:
            cache[key] = int(self.ix.source
                             .filter(F.col(fld) == value).count())
        return cache[key]

    def scoring_bool_rewrite(self, q: Query) -> Bool:
        """MultiTermQuery.SCORING_BOOLEAN_REWRITE (SEARCH/
        MultiTermQuery.java rewrite methods; ScoringRewrite.java:41):
        expand the multi-term query against the term dictionary and
        score it as a SHOULD disjunction of TermQueries — each matched
        term contributes its own BM25, unlike the default
        CONSTANT_SCORE rewrite the engine's multi-term path uses.
        Expansion is the same driver-side weight-construction scan as
        every Lucene rewrite (one filtered pass over the tiny
        term_stats table), capped at maxClauseCount
        (IndexSearcher.TooManyClauses)."""
        pred = term_predicate(q)
        if pred is None:
            raise TypeError(f"not a multi-term query: {type(q).__name__}")
        rows = (self.ix.term_stats.filter(pred)
                .select("term").limit(MAX_CLAUSE_COUNT + 1).collect())
        if len(rows) > MAX_CLAUSE_COUNT:
            raise TooManyClauses(
                f"{type(q).__name__} expands past {MAX_CLAUSE_COUNT}")
        terms = tuple(sorted(r["term"] for r in rows))
        return Bool(should=tuple(Term(t) for t in terms))

    def common_terms(self, terms: tuple, max_term_frequency: float = 0.01,
                     low_msm: int = 0) -> Query:
        """CommonTermsQuery.buildQuery
        (lucene/queries/src/java/org/apache/lucene/queries/
        CommonTermsQuery.java:158-219): terms are classified by actual
        docFreq at compile time — high-frequency if
        ``df > ceil(maxTermFrequency * maxDoc)`` (or ``df > cutoff``
        when the cutoff is an absolute count >= 1) — then composed as
        ``MUST(low-freq SHOULD bool) + SHOULD(high-freq bool)``; with
        no low-frequency terms the high group becomes a plain
        conjunction.  Absent terms classify low (termStates == null
        branch, CommonTermsQuery.java:164-166).  Returns the rewritten
        Bool AST; run it with topk()/count() as usual."""
        st = self._resolve_stats(set(terms))
        n = self.ix.doc_count
        if max_term_frequency >= 1.0:
            cutoff = float(max_term_frequency)
        else:
            cutoff = math.ceil(max_term_frequency * float(n))
        low = tuple(Term(t) for t in terms if st[t][0] <= cutoff)
        high = tuple(Term(t) for t in terms if st[t][0] > cutoff)
        if not low:
            # all-high fallback: conjunction (CommonTermsQuery.java:189-197)
            return Bool(must=high)
        low_bool = Bool(should=low, minimum_should_match=low_msm)
        if not high:
            return low_bool
        return Bool(must=(low_bool,), should=(Bool(should=high),))

    def idf(self, df: int) -> float:
        n = self.ix.doc_count
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    # -- clause scoring -----------------------------------------------------

    def _score_expr(self, tf_expr: str, idf_value: float) -> F.Column:
        return F.expr(
            score_sql(tf_expr, "qdl", repr(idf_value), self.ix.avgdl_sql))

    def _clause_score(self, tf_expr: str,
                      term_stats: list[tuple[int, int]]) -> F.Column:
        """Similarity-dispatched clause score over frozen per-term
        (df, ttf) stats.  Default (BM25) keeps the historical summed-idf
        literal; a pluggable similarity emits its own formula with the
        per-term weights inlined as python-double literals
        (MultiSimilarity.MultiSimScorer shape for multi-term clauses,
        MultiSimilarity.java:66-72)."""
        if self.sim is None:
            idf_sum = sum(self.idf(df) for df, _ in term_stats)
            return self._score_expr(tf_expr, idf_sum)
        ws = [self.sim.weight(df, ttf, self.ix.doc_count, self.ix.sum_ttf)
              for df, ttf in term_stats]
        return F.expr(self.sim.doc_score_sql(
            tf_expr, "qdl", [repr(w) for w in ws], self.ix.avgdl_sql))

    def _with_qdl(self, df: DataFrame) -> DataFrame:
        return df.join(self.ix.docs.select("docid", "qdl"), "docid")

    def scored(self, q: Query) -> DataFrame:
        """(docid long, score double) — one row per matching doc.

        The tree is canonicalized first (query.rewrite — the
        BooleanQuery.rewrite / IndexSearcher.rewrite fixpoint)."""
        q = rewrite(q)
        ix = self.ix
        if isinstance(q, Term):
            st = self._resolve_stats({q.term})
            if st[q.term][0] == 0:
                return self._empty_scored()
            base = ix.postings.filter(F.col("term") == q.term)
            return (self._with_qdl(base.select("docid", "tf"))
                    .select("docid",
                            self._clause_score("tf", [st[q.term]])
                            .alias("score")))

        if isinstance(q, Synonym):
            st = self._resolve_stats(set(q.terms))
            # pseudo-term stats: df = max, ttf = sum (SynonymQuery.java:55)
            df_max = max((df for df, _ in st.values()), default=0)
            ttf_sum = sum(ttf for _, ttf in st.values())
            if df_max == 0:
                return self._empty_scored()
            base = (ix.postings.filter(F.col("term").isin(list(q.terms)))
                    .groupBy("docid").agg(F.sum("tf").alias("tf")))
            return (self._with_qdl(base)
                    .select("docid",
                            self._clause_score("tf", [(df_max, ttf_sum)])
                            .alias("score")))

        if isinstance(q, Phrase):
            return self._scored_phrase(q)

        if isinstance(q, PhrasePositions):
            return self._scored_phrase_positions(q)

        if isinstance(q, MultiPhrase):
            return self._scored_multiphrase(q)

        if isinstance(q, PhraseWildcard):
            return self._scored_multiphrase(self._expand_phrase_wildcard(q))

        if isinstance(q, (SpanNear, SpanOr, SpanNot, FieldExists)):
            # spans / field-exists score under the constant-score rewrite
            # (see query.py)
            return self.scored(ConstantScore(q, 1.0))

        if isinstance(q, FieldTerm):
            # StrField term query (query.FieldTerm): per-doc constant
            # idf / (1 + k1); df/N frozen at compile time like
            # createWeight's TermStatistics. Same SQL expression text
            # as the oracle -> identical IEEE754 double graph.
            df = self._field_df(q.field, q.value)
            if df == 0:
                return self._empty_scored()
            # CAST to DOUBLE: with bare int literals Spark types the
            # formula's 0.5 constants as DECIMAL and decimal division
            # rounds at scale 6 (5.5/3.5 -> 1.571429), a ~1e-6 score
            # error the oracle (double math) doesn't make.
            sc = (f"({idf_sql(f'CAST({df} AS DOUBLE)', f'CAST({ix.doc_count} AS DOUBLE)')})"
                  f" / (1e0 + {K1!r})")
            return (ix.source.filter(F.col(q.field) == q.value)
                    .select("docid", F.expr(sc).alias("score")))

        if isinstance(q, Bool):
            return self._scored_bool(q)

        if isinstance(q, DisMax):
            parts = [self.scored(c) for c in q.clauses]
            u = reduce(DataFrame.unionAll, parts)
            agg = u.groupBy("docid").agg(
                F.max("score").alias("mx"), F.sum("score").alias("sm"))
            tb = float(q.tiebreak)
            return agg.select(
                "docid",
                F.expr(f"mx + {tb!r} * (sm - mx)").alias("score"))

        if isinstance(q, Boost):
            sub = self.scored(q.query)
            return sub.select(
                "docid", F.expr(f"score * {float(q.boost)!r}").alias("score"))

        if isinstance(q, ConstantScore):
            m = self.matching(q.query)
            return m.select(
                "docid", F.lit(float(q.score)).cast("double").alias("score"))

        if isinstance(q, MatchAll):
            return ix.docs.select(
                "docid", F.lit(1.0).cast("double").alias("score"))

        if isinstance(q, (Prefix, Wildcard, TermRange, TermInSet, Fuzzy,
                          Regexp)):
            # multi-term under constant-score rewrite
            # (MultiTermQueryConstantScoreWrapper)
            return self.scored(ConstantScore(q, 1.0))

        if isinstance(q, Interval):
            return self._scored_interval(q)

        if isinstance(q, PayloadScore):
            # PayloadScoreQuery.java:52 — payload factor from the
            # matched occurrences (PayloadFunction fold over the shared
            # position-keyed encoder, payloads.py), optionally times
            # the wrapped span's BM25 score (includeSpanScore)
            st = self._resolve_stats({q.term})
            if st[q.term][0] == 0:
                return self._empty_scored()
            base = self.ix.postings.filter(F.col("term") == q.term)
            pay = F.expr(payload_factor_sql("positions", "tf", q.func,
                                            "spark"))
            if q.include_span_score:
                score = pay * self._clause_score("tf", [st[q.term]])
            else:
                score = pay
            return (self._with_qdl(base.select("docid", "tf", "positions"))
                    .select("docid", score.alias("score")))

        if isinstance(q, PayloadCheck):
            # SpanPayloadCheckQuery.java:56 — freq = accepted-span
            # count (occurrences whose encoder payload equals the
            # required value); idf from the unfiltered term stats
            st = self._resolve_stats({q.term})
            if st[q.term][0] == 0:
                return self._empty_scored()
            tf2 = F.expr(payload_check_tf_sql("positions", q.payload,
                                              "spark"))
            base = (self.ix.postings.filter(F.col("term") == q.term)
                    .select("docid", tf2.alias("tf"))
                    .filter(F.col("tf") > 0))
            return (self._with_qdl(base)
                    .select("docid",
                            self._clause_score("tf", [st[q.term]])
                            .alias("score")))

        raise TypeError(f"unsupported query node {type(q).__name__}")

    def _empty_scored(self) -> DataFrame:
        return (self.ix.docs.select("docid")
                .filter(F.lit(False))
                .select("docid", F.lit(0.0).cast("double").alias("score")))

    def _sloppy_udf(self, slop: int):
        """Vectorized UDF: per-doc position arrays -> exact sloppy freq
        (SloppyPhraseMatcher traversal + order-independent rational
        accumulation — see sloppy.py). Runs only on docs that already
        passed the docid intersection (TwoPhaseIterator shape)."""
        import pandas as pd

        from .sloppy import (
            chain_freqs_2_vec, sloppy_freq_f64, sloppy_match_lengths,
        )

        def f(*cols):
            if len(cols) == 2:
                # 2-term hot path: lockstep-vectorized chain (exact
                # same rational freq; property-tested vs the matcher)
                return pd.Series(chain_freqs_2_vec(
                    list(cols[0]), list(cols[1]), slop))
            out = []
            for row in zip(*cols):
                mls = sloppy_match_lengths(list(row), slop)
                out.append(sloppy_freq_f64(mls, slop))
            return pd.Series(out, dtype="float64")

        return F.pandas_udf(f, "double")

    def _scored_interval(self, q: Interval) -> DataFrame:
        """IntervalQuery: docid intersection over the source's required
        terms pre-filters candidates (TwoPhaseIterator shape); the
        minimal-interval algebra (intervals.py) runs in one vectorized
        UDF over the candidates' position arrays only — never the full
        corpus."""
        import pandas as pd

        from .intervals import (
            all_terms, interval_freq, required_terms, saturation_score,
        )
        req = sorted(required_terms(q.source))
        if not req:
            raise TypeError("interval source has no required terms")
        # required terms first: the base frame must be a required
        # posting list, optional terms (notContaining's small side)
        # left-join onto it
        allt = req + sorted(all_terms(q.source) - set(req))
        st = self._resolve_stats(set(allt))
        if any(st[t][0] == 0 for t in req):
            return self._empty_scored()
        joined = None
        for i, t in enumerate(allt):
            p = (self.ix.postings.filter(F.col("term") == t)
                 .select("docid", F.col("positions").alias(f"pos{i}")))
            how = "inner" if t in req else "left"
            joined = p if joined is None else joined.join(p, "docid", how)
        src, pivot, boost = q.source, float(q.pivot), float(q.boost)

        def f(*cols):
            out = []
            for row in zip(*cols):
                positions = {t: list(v) for t, v in zip(allt, row)
                             if v is not None}
                out.append(saturation_score(
                    interval_freq(src, positions), pivot, boost))
            return pd.Series(out, dtype="float64")

        udf = F.pandas_udf(f, "double")
        return (joined.select(
            "docid",
            udf(*[F.col(f"pos{i}") for i in range(len(allt))])
            .alias("score"))
            .filter(F.col("score") > 0.0))

    def _scored_phrase(self, q: Phrase) -> DataFrame:
        terms = list(q.terms)
        st = self._resolve_stats(set(terms))
        if any(st[t][0] == 0 for t in terms):
            return self._empty_scored()
        # per-term stats combined by the similarity: BM25 sums idfs in
        # double (BM25Similarity.idfExplain(termStats[])); pluggable
        # similarities follow MultiSimScorer (one addend per term)
        stats_list = [st[t] for t in terms]
        joined = None
        for i, t in enumerate(terms):
            p = (self.ix.postings.filter(F.col("term") == t)
                 .select("docid", F.col("positions").alias(f"pos{i}")))
            joined = p if joined is None else joined.join(p, "docid")
        if q.slop > 0:
            if len(set(terms)) != len(terms):
                raise TypeError("sloppy phrase requires distinct terms "
                                "(no-repeats case)")
            udf = self._sloppy_udf(q.slop)
            out = (joined.select(
                "docid",
                udf(*[F.col(f"pos{i}") for i in range(len(terms))])
                .alias("tf"))
                .filter(F.col("tf") > 0))
        else:
            conds = " AND ".join(
                f"array_contains(pos{i}, x + {i})"
                for i in range(1, len(terms)))
            freq = (f"size(filter(pos0, x -> {conds}))" if conds
                    else "size(pos0)")
            out = (joined.select("docid",
                                 F.expr(freq).cast("long").alias("tf"))
                   .filter(F.col("tf") > 0))
        return (self._with_qdl(out)
                .select("docid",
                        self._clause_score("tf", stats_list)
                        .alias("score")))

    def _scored_phrase_positions(self, q: PhrasePositions) -> DataFrame:
        """Exact phrase with EXPLICIT positions (PhraseQuery.Builder
        .add(Term, position)): term i must sit at base + (positions[i]
        - positions[0]) — the gap-aware variant of _scored_phrase; the
        consecutive case IS positions=(0,1,2,...)."""
        terms = list(q.terms)
        offs = [p - q.positions[0] for p in q.positions]
        st = self._resolve_stats(set(terms))
        if any(st[t][0] == 0 for t in terms):
            return self._empty_scored()
        stats_list = [st[t] for t in terms]
        joined = None
        for i, t in enumerate(terms):
            p = (self.ix.postings.filter(F.col("term") == t)
                 .select("docid", F.col("positions").alias(f"pos{i}")))
            joined = p if joined is None else joined.join(p, "docid")
        conds = " AND ".join(
            f"array_contains(pos{i}, x + {offs[i]})"
            for i in range(1, len(terms)))
        freq = (f"size(filter(pos0, x -> {conds}))" if conds
                else "size(pos0)")
        out = (joined.select("docid",
                             F.expr(freq).cast("long").alias("tf"))
               .filter(F.col("tf") > 0))
        return (self._with_qdl(out)
                .select("docid",
                        self._clause_score("tf", stats_list)
                        .alias("score")))

    def _expand_phrase_wildcard(self, q: PhraseWildcard) -> MultiPhrase:
        """Expand pattern slots against the term dictionary
        (PhraseWildcardQuery.java:63 walks a TermsEnum per multi-term
        slot with a maxMultiTermExpansions cap). One bounded lookup per
        pattern slot — ≤ max_expansions tiny rows to the driver, the
        same driver-side rewrite every Lucene multi-term query performs
        at weight-construction time, independent of corpus size."""
        slots = []
        for s, is_pat in zip(q.slots, q.pattern_slots()):
            if not is_pat:
                slots.append((s,))
                continue
            rows = (self.ix.term_stats
                    .filter(F.col("term").like(wildcard_to_like(s)))
                    .select("term").orderBy("term")
                    .limit(int(q.max_expansions)).collect())
            slots.append(tuple(r["term"] for r in rows))
        return MultiPhrase(tuple(slots))

    def _scored_multiphrase(self, q: MultiPhrase) -> DataFrame:
        all_terms = [t for slot in q.slots for t in slot]
        st = self._resolve_stats(set(all_terms))
        # a slot with NO indexed alternative can never match
        if any(all(st[t][0] == 0 for t in slot) for slot in q.slots):
            return self._empty_scored()
        # df=0 alternatives contribute no stats (engine skips them)
        stats_list = [st[t] for t in all_terms if st[t][0] > 0]
        joined = None
        for i, slot in enumerate(q.slots):
            # union the alternatives' position lists (UnionPostingsEnum)
            p = (self.ix.postings
                 .filter(F.col("term").isin([t for t in slot]))
                 .groupBy("docid")
                 .agg(F.sort_array(F.array_distinct(
                     F.flatten(F.collect_list("positions"))))
                     .alias(f"pos{i}")))
            joined = p if joined is None else joined.join(p, "docid")
        conds = " AND ".join(
            f"array_contains(pos{i}, x + {i})"
            for i in range(1, len(q.slots)))
        freq = f"size(filter(pos0, x -> {conds}))" if conds else "size(pos0)"
        out = (joined.select("docid", F.expr(freq).cast("long").alias("tf"))
               .filter(F.col("tf") > 0))
        return (self._with_qdl(out)
                .select("docid",
                        self._clause_score("tf", stats_list)
                        .alias("score")))

    def _span_near_expr(self, q: SpanNear) -> str:
        """Nested-lambda EXISTS over per-term position arrays pos0..posk:
        ordered positions, total gap <= slop."""
        k = len(q.terms)
        inner = (f"a{k - 1} > a{k - 2} AND "
                 f"a{k - 1} - a0 - {k - 1} <= {q.slop}")
        expr = f"exists(pos{k - 1}, a{k - 1} -> {inner})"
        for i in range(k - 2, 0, -1):
            expr = f"exists(pos{i}, a{i} -> a{i} > a{i - 1} AND {expr})"
        return f"exists(pos0, a0 -> {expr})"

    def _matching_span(self, q: SpanNear) -> DataFrame:
        dfs = self._resolve_dfs(set(q.terms))
        if any(dfs[t] == 0 for t in q.terms):
            return (self.ix.docs.select("docid").filter(F.lit(False)))
        joined = None
        for i, t in enumerate(q.terms):
            p = (self.ix.postings.filter(F.col("term") == t)
                 .select("docid", F.col("positions").alias(f"pos{i}")))
            joined = p if joined is None else joined.join(p, "docid")
        if len(q.terms) == 1:
            return joined.select("docid")
        return (joined.filter(F.expr(self._span_near_expr(q)))
                .select("docid"))

    def _scored_bool(self, q: Bool) -> DataFrame:
        n_clauses = (len(q.must) + len(q.should) + len(q.must_not)
                     + len(q.filter))
        if n_clauses > MAX_CLAUSE_COUNT:
            raise TooManyClauses(
                f"{n_clauses} clauses > maxClauseCount {MAX_CLAUSE_COUNT}")
        musts = [self.scored(m) for m in q.must]
        base = None
        if musts:
            base = musts[0].select("docid", F.col("score").alias("s0"))
            for i, m in enumerate(musts[1:], start=1):
                base = base.join(
                    m.select("docid", F.col("score").alias(f"s{i}")), "docid")
            total = "(" + " + ".join(f"s{i}" for i in range(len(musts))) + ")"
            base = base.select("docid", F.expr(total).alias("score"))

        if q.should:
            sh = reduce(DataFrame.unionAll, [self.scored(s) for s in q.should])
            sh = sh.groupBy("docid").agg(
                F.sum("score").alias("opt"), F.count("*").alias("nm"))
            if base is not None:
                base = base.join(sh, "docid", "left")
                if q.minimum_should_match > 0:
                    base = base.filter(
                        F.coalesce(F.col("nm"), F.lit(0))
                        >= q.minimum_should_match)
                base = base.select(
                    "docid",
                    (F.col("score") + F.coalesce(F.col("opt"), F.lit(0.0)))
                    .alias("score"))
            else:
                msm = max(q.minimum_should_match, 1)
                base = (sh.filter(F.col("nm") >= msm)
                        .select("docid", F.col("opt").alias("score")))
        flts = list(q.filter)
        if base is None:
            if not flts:
                raise ValueError("Bool query with no positive clauses")
            base = (self.matching(flts.pop(0))
                    .select("docid", F.lit(0.0).cast("double").alias("score")))
        for f in flts:
            base = base.join(self.matching(f), "docid", "left_semi")
        for x in q.must_not:
            base = base.join(self.matching(x), "docid", "left_anti")
        return base

    # -- non-scoring match sets ---------------------------------------------

    def _term_pred(self, q: Query):
        return term_predicate(q)

    def matching(self, q: Query) -> DataFrame:
        """(docid) distinct — FILTER / MUST_NOT / constant-score contexts."""
        q = rewrite(q)
        if self.query_cache is not None:
            return self.query_cache.get_or_compute(
                q, lambda: self._matching_uncached(q))
        return self._matching_uncached(q)

    def _matching_uncached(self, q: Query) -> DataFrame:
        pred = self._term_pred(q)
        if pred is not None:
            return (self.ix.postings.filter(pred)
                    .select("docid").distinct())
        if isinstance(q, Term):
            return (self.ix.postings.filter(F.col("term") == q.term)
                    .select("docid"))
        if isinstance(q, SpanNear):
            return self._matching_span(q)
        if isinstance(q, SpanOr):
            # SpanOrQuery: union of clause match sets
            parts = [self.matching(c) for c in q.clauses]
            return reduce(DataFrame.unionAll, parts).distinct()
        if isinstance(q, SpanNot):
            # SpanNotQuery (pre/post=0): docs with an include span that
            # does not share a start position with any exclude span.
            # Position-granular realization: exclude docs where every
            # include start is covered — here simplified to doc
            # granularity minus docs whose include matches are all
            # excluded; with pre/post=0 and distinct-term spans, doc
            # has a surviving span iff it matches include and NOT
            # (every include start == an exclude start) — realized as
            # include minus (include ∩ exclude-all) via position sets
            return self._matching_span_not(q)
        if isinstance(q, FieldExists):
            # DocValuesFieldExistsQuery: stored column non-null
            return (self.ix.source
                    .filter(F.col(q.field).isNotNull())
                    .select("docid"))
        if isinstance(q, FieldTerm):
            return (self.ix.source
                    .filter(F.col(q.field) == q.value)
                    .select("docid"))
        if isinstance(q, MatchAll):
            return self.ix.docs.select("docid")
        return self.scored(q).select("docid")

    def _span_starts(self, q: Query) -> DataFrame | None:
        """(docid, starts array<long>) of span start positions, or None
        when the node is not a span primitive. Used by SpanNot."""
        if isinstance(q, Term):
            return (self.ix.postings.filter(F.col("term") == q.term)
                    .select("docid", F.col("positions").alias("starts")))
        if isinstance(q, SpanNear):
            dfs = self._resolve_dfs(set(q.terms))
            if any(dfs[t] == 0 for t in q.terms):
                return (self.ix.docs.select("docid").filter(F.lit(False))
                        .select("docid",
                                F.expr("array()").alias("starts")))
            joined = None
            for i, t in enumerate(q.terms):
                p = (self.ix.postings.filter(F.col("term") == t)
                     .select("docid", F.col("positions").alias(f"pos{i}")))
                joined = p if joined is None else joined.join(p, "docid")
            k = len(q.terms)
            if k == 1:
                return joined.select(
                    "docid", F.col("pos0").alias("starts"))
            inner = (f"a{k - 1} > a{k - 2} AND "
                     f"a{k - 1} - a0 - {k - 1} <= {q.slop}")
            expr = f"exists(pos{k - 1}, a{k - 1} -> {inner})"
            for i in range(k - 2, 0, -1):
                expr = f"exists(pos{i}, a{i} -> a{i} > a{i - 1} AND {expr})"
            return joined.select(
                "docid",
                F.expr(f"filter(pos0, a0 -> {expr})").alias("starts"))
        return None

    def _matching_span_not(self, q: SpanNot) -> DataFrame:
        inc = self._span_starts(q.include)
        exc = self._span_starts(q.exclude)
        if inc is None or exc is None:
            raise TypeError("SpanNot needs span primitives "
                            "(Term / SpanNear)")
        j = inc.join(exc.select("docid",
                                F.col("starts").alias("xstarts")),
                     "docid", "left")
        surv = ("size(filter(starts, s -> xstarts IS NULL OR "
                "NOT array_contains(xstarts, s))) > 0")
        return j.filter(F.expr(surv)).select("docid")

    # -- top-k ----------------------------------------------------------------

    def topk(self, q: Query, k: int = 10,
             round_digits: int = 6) -> DataFrame:
        """Top-k by (rounded score DESC, docid ASC) — rounding first makes
        the ordering identical between engine and DuckDB oracle at ulp
        noise levels; ties inside a rounded score break by docid exactly
        like HitQueue.lessThan."""
        s = self.scored(q).select(
            "docid", F.round(F.col("score"), round_digits).alias("score"))
        return (s.orderBy(F.desc("score"), F.asc("docid"))
                .limit(k)
                .select(F.col("docid").alias("doc_id"), "score"))

    def count(self, q: Query) -> DataFrame:
        """TotalHitCountCollector analogue."""
        return self.matching(q).agg(F.count("*").cast("long").alias("n_hits"))

    # -- explanations (Weight.explain / CheckHits.verifyExplanation) ---------

    def explain(self, q: Query, docid: int) -> dict:
        """Score breakdown for one document (Explanation tree analogue,
        SEARCH/Weight.java explain). Self-consistency contract: the
        returned ``value`` equals the scored() value for the doc
        (CheckHits.verifyExplanation, CheckHits.java:330)."""
        row = (self.scored(q).filter(F.col("docid") == docid)
               .select("score").first())
        value = float(row["score"]) if row is not None else 0.0
        node = {"value": value, "matched": row is not None,
                "description": type(q).__name__}
        if isinstance(q, Term):
            dfs = self._resolve_dfs({q.term})
            tf_row = (self.ix.postings
                      .filter((F.col("term") == q.term)
                              & (F.col("docid") == docid))
                      .select("tf").first())
            dl_row = (self.ix.docs.filter(F.col("docid") == docid)
                      .select("qdl").first())
            node["details"] = {
                "term": q.term,
                "df": dfs[q.term],
                "idf": self.idf(dfs[q.term]) if dfs[q.term] else 0.0,
                "tf": int(tf_row["tf"]) if tf_row else 0,
                "qdl": int(dl_row["qdl"]) if dl_row else None,
                "avgdl": self.ix.avgdl,
                "formula": "idf * tf / (tf + k1*((1-b) + b*qdl/avgdl))",
            }
        elif isinstance(q, Bool):
            node["details"] = {
                "must": [self.explain(m, docid) for m in q.must],
                "should": [self.explain(s1, docid) for s1 in q.should],
                "must_not_matched": [
                    bool(self.matching(x)
                         .filter(F.col("docid") == docid).first())
                    for x in q.must_not],
            }
        return node

    # -- Lucene float32 bit-parity mode --------------------------------------

    def _score32_udf(self):
        """Vectorized pandas UDF evaluating the reference's exact float32
        BM25 (BM25Similarity.java:222-235): per-row weight column so one
        UDF serves all terms; the 256-entry normInverse cache is baked
        from the index's frozen avgdl."""
        import numpy as np
        import pandas as pd

        from .bm25 import avgdl32, norm_inverse_cache, score32

        cache = norm_inverse_cache(
            avgdl32(self.ix.sum_ttf, self.ix.doc_count))

        def _f(tf, nb, w):
            weights = w.to_numpy(dtype=np.float32)
            return pd.Series(
                score32(tf.to_numpy(), nb.to_numpy(), weights, cache))

        return F.pandas_udf(_f, "float")

    def scored32(self, q: Query) -> DataFrame:
        """(docid, score float32) with Lucene-exact arithmetic.

        Clause sums run in float64 (exact for <=2^29 float32 addends, so
        order-independent and bit-equal to the reference's double
        accumulation in ConjunctionScorer/DisjunctionSumScorer) and are
        narrowed back to float32.
        """
        import numpy as np

        from .bm25 import idf32

        q = rewrite(q)
        udf = self._score32_udf()
        ix = self.ix

        def term32(term: str, boost: float = 1.0) -> DataFrame:
            dfs = self._resolve_dfs({term})
            if dfs[term] == 0:
                return self._empty_scored32()
            w = float(np.float32(boost) *
                      idf32(dfs[term], ix.doc_count))
            base = (ix.postings.filter(F.col("term") == term)
                    .select("docid", "tf")
                    .join(ix.docs.select("docid", "norm_byte"), "docid"))
            return base.select(
                "docid",
                udf(F.col("tf"), F.col("norm_byte"),
                    F.lit(w).cast("float")).alias("score"))

        if isinstance(q, Term):
            return term32(q.term)
        if isinstance(q, Synonym):
            # pseudo-term: freq = sum of tfs, idf from max df
            # (SynonymQuery.java:203-219)
            dfs = self._resolve_dfs(set(q.terms))
            df_max = max(dfs.values(), default=0)
            if df_max == 0:
                return self._empty_scored32()
            w = float(idf32(df_max, ix.doc_count))
            base = (ix.postings.filter(F.col("term").isin(list(q.terms)))
                    .groupBy("docid").agg(F.sum("tf").alias("tf"))
                    .join(ix.docs.select("docid", "norm_byte"), "docid"))
            return base.select(
                "docid",
                udf(F.col("tf"), F.col("norm_byte"),
                    F.lit(w).cast("float")).alias("score"))
        if isinstance(q, Boost):
            if isinstance(q.query, Term):
                return term32(q.query.term, q.boost)
            sub = self.scored32(q.query)
            return sub.select(
                "docid",
                F.expr(f"CAST(CAST(score AS DOUBLE) * "
                       f"CAST({float(np.float32(q.boost))!r} AS FLOAT) "
                       f"AS FLOAT)").alias("score"))
        if isinstance(q, Phrase):
            # phrase freq via the double-mode plan, then float32 scoring
            # with idf = (float) double-sum of per-term float32 idfs
            dfs = self._resolve_dfs(set(q.terms))
            if any(dfs[t] == 0 for t in q.terms):
                return self._empty_scored32()
            idf_d = float(np.float32(sum(
                float(idf32(dfs[t], ix.doc_count)) for t in q.terms)))
            joined = None
            for i, t in enumerate(q.terms):
                p = (ix.postings.filter(F.col("term") == t)
                     .select("docid", F.col("positions").alias(f"pos{i}")))
                joined = p if joined is None else joined.join(p, "docid")
            if q.slop > 0:
                import pandas as pd

                from .sloppy import sloppy_freq_f32, sloppy_match_lengths
                slop = q.slop

                def f32freq(*cols):
                    return pd.Series(
                        [float(sloppy_freq_f32(
                            sloppy_match_lengths(list(row), slop)))
                         for row in zip(*cols)], dtype="float64")

                out = (joined.select(
                    "docid",
                    F.pandas_udf(f32freq, "double")(
                        *[F.col(f"pos{i}")
                          for i in range(len(q.terms))]).alias("tf"))
                    .filter(F.col("tf") > 0)
                    .join(ix.docs.select("docid", "norm_byte"), "docid"))
            else:
                conds = " AND ".join(
                    f"array_contains(pos{i}, x + {i})"
                    for i in range(1, len(q.terms)))
                freq = (f"size(filter(pos0, x -> {conds}))" if conds
                        else "size(pos0)")
                out = (joined.select("docid",
                                     F.expr(freq).cast("long").alias("tf"))
                       .filter(F.col("tf") > 0)
                       .join(ix.docs.select("docid", "norm_byte"), "docid"))
            return out.select(
                "docid", udf(F.col("tf"), F.col("norm_byte"),
                             F.lit(idf_d).cast("float")).alias("score"))
        if isinstance(q, DisMax):
            # DisjunctionMaxScorer (SEARCH/DisjunctionMaxScorer.java):
            # float max; the other clauses' float scores sum in DOUBLE;
            # result = (float)(max + tieBreak * otherSum). f32 clause
            # values are exact in f64, so MAX/SUM below reproduce the
            # reference bit-for-bit (tieBreak narrowed to float32 first)
            parts = [self.scored32(c) for c in q.clauses]
            u = reduce(DataFrame.unionAll, parts)
            tb = float(np.float32(q.tiebreak))
            agg = u.groupBy("docid").agg(
                F.expr("MAX(CAST(score AS DOUBLE))").alias("mx"),
                F.expr("SUM(CAST(score AS DOUBLE))").alias("sm"))
            return agg.select(
                "docid",
                F.expr(f"CAST(mx + CAST({tb!r} AS DOUBLE) * (sm - mx) "
                       f"AS FLOAT)").alias("score"))
        if isinstance(q, (Prefix, Wildcard, TermRange, TermInSet, Fuzzy,
                          Regexp, SpanNear, SpanOr, SpanNot, FieldExists)):
            # constant-score rewrite: every matching doc scores 1.0f
            return self.matching(q).select(
                "docid", F.lit(1.0).cast("float").alias("score"))
        if isinstance(q, ConstantScore):
            return self.matching(q.query).select(
                "docid",
                F.lit(float(np.float32(q.score))).cast("float")
                .alias("score"))
        if isinstance(q, Bool):
            musts = [self.scored32(m) for m in q.must]
            base = None
            if musts:
                base = musts[0].select("docid", F.col("score").alias("s0"))
                for i, m in enumerate(musts[1:], start=1):
                    base = base.join(
                        m.select("docid", F.col("score").alias(f"s{i}")),
                        "docid")
                total = " + ".join(
                    f"CAST(s{i} AS DOUBLE)" for i in range(len(musts)))
                base = base.select(
                    "docid", F.expr(f"CAST({total} AS FLOAT)").alias("score"))
            if q.should:
                sh = reduce(DataFrame.unionAll,
                            [self.scored32(s) for s in q.should])
                sh = sh.groupBy("docid").agg(
                    F.expr("CAST(SUM(CAST(score AS DOUBLE)) AS FLOAT)")
                    .alias("opt"), F.count("*").alias("nm"))
                if base is not None:
                    base = base.join(sh, "docid", "left")
                    if q.minimum_should_match > 0:
                        base = base.filter(
                            F.coalesce(F.col("nm"), F.lit(0))
                            >= q.minimum_should_match)
                    base = base.select(
                        "docid",
                        F.expr("CAST(CAST(score AS DOUBLE) + "
                               "COALESCE(CAST(opt AS DOUBLE), 0D) AS FLOAT)")
                        .alias("score"))
                else:
                    msm = max(q.minimum_should_match, 1)
                    base = (sh.filter(F.col("nm") >= msm)
                            .select("docid", F.col("opt").alias("score")))
            if base is None:
                raise ValueError("Bool query with no positive clauses")
            for f in q.filter:
                base = base.join(self.matching(f), "docid", "left_semi")
            for x in q.must_not:
                base = base.join(self.matching(x), "docid", "left_anti")
            return base
        raise TypeError(
            f"float32 mode does not support {type(q).__name__} yet")

    def _empty_scored32(self) -> DataFrame:
        return (self.ix.docs.select("docid").filter(F.lit(False))
                .select("docid", F.lit(0.0).cast("float").alias("score")))

    def topk32(self, q: Query, k: int = 10) -> DataFrame:
        """Lucene-parity top-k: float32 scores, ties broken by docid ASC
        (HitQueue.lessThan)."""
        return (self.scored32(q)
                .orderBy(F.desc("score"), F.asc("docid")).limit(k)
                .select(F.col("docid").alias("doc_id"), "score"))
