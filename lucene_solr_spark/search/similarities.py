"""Pluggable similarities (the reference's Similarity extension point).

Lucene ships ~18 similarities under
lucene/core/src/java/org/apache/lucene/search/similarities/ (SURVEY.md
§2.8: "v1 ships BM25 only").  This module adds the three most-used
non-BM25 ones on the naive (double-SQL, oracle-checkable) path:

* ``ClassicSimilarity`` — the TF-IDF practical scoring function
  (ClassicSimilarity.java:39-62, TFIDFSimilarity.java:557-565):
  ``score = boost * idf * sqrt(tf) * 1/sqrt(dl)`` with
  ``idf = ln((docCount+1)/(docFreq+1)) + 1`` and
  ``lengthNorm = 1/sqrt(numTerms)`` decoded from the norm byte.
* ``LMDirichletSimilarity`` — Dirichlet-smoothed query-likelihood LM
  (LMDirichletSimilarity.java:73-78, collection model
  LMSimilarity.java:154-156):
  ``score = max(0, boost * (ln(1 + tf/(mu*p)) + ln(mu/(dl+mu))))``
  with ``p = (ttf+1)/(sumTotalTermFreq+1)`` and mu = 2000.
* ``BooleanSimilarity`` — score == query boost, tf/norms ignored
  (BooleanSimilarity.java:47-60).

Design: each similarity is a *formula-text generator*.  The doc-
dependent part of the score is one SQL string evaluated by BOTH Spark
(``F.expr``, whole-stage codegen) and the DuckDB oracle, so the two
backends execute the same IEEE-754 double graph and ``round(score, 6)``
value-hashes agree — the same contract bm25.score_sql already uses.
Per-term constants ("weights") are supplied by the caller either as
Python-double literals (the engine, mirroring
IndexSearcher.createWeight freezing stats at compile time) or as SQL
sub-expressions over the ts/st CTEs (the oracle); both compute the
identical double value.

Multi-term scoring (phrase / multi-phrase) follows
SimilarityBase.scorer -> MultiSimilarity.MultiSimScorer
(MultiSimilarity.java:66-72): the per-term scores at the shared
(phrase) freq are summed.  For BM25 and TF-IDF the score is linear in
the weight, so this reduces to the summed-idf form the engine already
emits; LMDirichlet is non-linear and keeps one clamped addend per term.

The packed-segment WAND path stays BM25-only: block-max impacts are
precomputed for one similarity at index time, exactly as Lucene's
impacts are (codecs/CompetitiveImpactAccumulator.java) — a different
Similarity means TOP_SCORES pruning is unavailable and the exhaustive
(naive) path is the correct executor.
"""

from __future__ import annotations

import math
import struct

from .bm25 import score_sql


def _f32(x: float) -> float:
    """Round a double to the nearest float32 and back (Java ``float``
    arithmetic, used where the reference stores a constant as float)."""
    return struct.unpack("<f", struct.pack("<f", x))[0]


def _sum_weights(weight_exprs: list[str]) -> str:
    return " + ".join(f"({w})" for w in weight_exprs)


class BM25Similarity:
    """Default similarity (BM25Similarity.java:222-235); reproduces the
    exact formula text the engine/oracle emitted before similarities
    became pluggable, so existing oracle rows are byte-stable."""

    name = "bm25"

    def weight(self, df: int, ttf: int, n: int, sum_ttf: int) -> float:
        """Engine-side per-term constant: idf (BM25Similarity.java:70-72)."""
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def weight_sql(self, df_sql: str, ttf_sql: str, n_sql: str,
                   sumttf_sql: str) -> str:
        """Oracle-side SQL computing the same constant."""
        return (f"ln(1e0 + (({n_sql}) - ({df_sql}) + 0.5) / "
                f"(({df_sql}) + 0.5))")

    def doc_score_sql(self, tf_expr: str, qdl_expr: str,
                      weight_exprs: list[str], avgdl_sql: str) -> str:
        return score_sql(tf_expr, qdl_expr, _sum_weights(weight_exprs),
                         avgdl_sql)


class ClassicSimilarity:
    """TF-IDF (ClassicSimilarity.java:39-62; scoring loop
    TFIDFSimilarity.java:557-565: queryWeight * tf(freq) * normTable[b]).

    Linear in the weight, so phrase scoring uses the summed-idf form
    (TFIDFSimilarity builds one scorer whose idf explanation is the sum
    over terms)."""

    name = "classic"

    def weight(self, df: int, ttf: int, n: int, sum_ttf: int) -> float:
        # idf = ln((docCount+1)/(docFreq+1)) + 1  (ClassicSimilarity.java:62)
        return math.log((n + 1.0) / (df + 1.0)) + 1.0

    def weight_sql(self, df_sql: str, ttf_sql: str, n_sql: str,
                   sumttf_sql: str) -> str:
        return (f"(ln((CAST({n_sql} AS DOUBLE) + 1e0) / "
                f"(CAST({df_sql} AS DOUBLE) + 1e0)) + 1e0)")

    def doc_score_sql(self, tf_expr: str, qdl_expr: str,
                      weight_exprs: list[str], avgdl_sql: str) -> str:
        # tf(freq)=sqrt(freq) (ClassicSimilarity.java:46);
        # lengthNorm=1/sqrt(dl) (ClassicSimilarity.java:39-41) with dl
        # the quantized decoded length (qdl), mirroring normTable.
        w = _sum_weights(weight_exprs)
        return (f"(({w}) * sqrt(CAST({tf_expr} AS DOUBLE)) / "
                f"sqrt(CAST({qdl_expr} AS DOUBLE)))")


class LMDirichletSimilarity:
    """Dirichlet-smoothed LM (LMDirichletSimilarity.java:73-78).

    Per-term: score = ln(1 + tf/(mu*p)) + ln(mu/(dl+mu)), clamped at 0
    (the reference's ``score > 0.0d ? score : 0.0d``), with collection
    probability p = (ttf+1)/(numberOfFieldTokens+1)
    (LMSimilarity.java:154-156).  The per-term constant is mu*p.
    Non-linear in the constant, so multi-term scoring keeps one clamped
    addend per term (MultiSimilarity.java:66-72)."""

    name = "lmdirichlet"

    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)

    def weight(self, df: int, ttf: int, n: int, sum_ttf: int) -> float:
        return self.mu * ((ttf + 1.0) / (sum_ttf + 1.0))

    def weight_sql(self, df_sql: str, ttf_sql: str, n_sql: str,
                   sumttf_sql: str) -> str:
        return (f"({self.mu!r} * ((CAST({ttf_sql} AS DOUBLE) + 1e0) / "
                f"(CAST({sumttf_sql} AS DOUBLE) + 1e0)))")

    def doc_score_sql(self, tf_expr: str, qdl_expr: str,
                      weight_exprs: list[str], avgdl_sql: str) -> str:
        parts = []
        for w in weight_exprs:
            p = (f"(ln(1e0 + CAST({tf_expr} AS DOUBLE) / ({w})) + "
                 f"ln({self.mu!r} / (CAST({qdl_expr} AS DOUBLE) + "
                 f"{self.mu!r})))")
            parts.append(f"(CASE WHEN {p} > 0e0 THEN {p} ELSE 0e0 END)")
        return "(" + " + ".join(parts) + ")"


class BooleanSimilarity:
    """Score == boost; tf, norms and collection stats are ignored
    (BooleanSimilarity.java:47-60).  Clause combination still follows
    the Bool/DisMax operators, so a SHOULD of k matching terms scores
    k * boost exactly as DisjunctionSumScorer over BooleanWeight does."""

    name = "boolean"

    def weight(self, df: int, ttf: int, n: int, sum_ttf: int) -> float:
        return 1.0

    def weight_sql(self, df_sql: str, ttf_sql: str, n_sql: str,
                   sumttf_sql: str) -> str:
        return "1e0"

    def doc_score_sql(self, tf_expr: str, qdl_expr: str,
                      weight_exprs: list[str], avgdl_sql: str) -> str:
        return f"CAST({_sum_weights(weight_exprs)} AS DOUBLE)"


class SweetSpotSimilarity(ClassicSimilarity):
    """SweetSpot TF-IDF (lucene/misc/src/java/org/apache/lucene/misc/
    SweetSpotSimilarity.java:39): ClassicSimilarity with a plateau
    lengthNorm — 1/sqrt(steepness*(|x-min|+|x-max|-(max-min))+1), so
    every length inside [min, max] norms to exactly 1.0
    (SweetSpotSimilarity.java:117-132) — and the baselineTf tf helper
    ((x==0) ? 0 : (x<=min) ? base : sqrt(x + base^2 - min),
    SweetSpotSimilarity.java:150-166). idf is inherited from Classic.
    With min=max=1, steepness=0.5, base=min=0 this degrades to
    ClassicSimilarity exactly (the javadoc's own check)."""

    name = "sweetspot"

    def __init__(self, ln_min: int = 40, ln_max: int = 120,
                 steepness: float = 0.5, tf_base: float = 1.5,
                 tf_min: float = 2.0):
        self.ln_min = int(ln_min)
        self.ln_max = int(ln_max)
        self.steepness = float(steepness)
        self.tf_base = float(tf_base)
        self.tf_min = float(tf_min)

    def doc_score_sql(self, tf_expr: str, qdl_expr: str,
                      weight_exprs: list[str], avgdl_sql: str) -> str:
        w = _sum_weights(weight_exprs)
        x = f"CAST({qdl_expr} AS DOUBLE)"
        norm = (f"(1e0 / sqrt({self.steepness!r} * "
                f"(abs({x} - {self.ln_min}) + abs({x} - {self.ln_max}) "
                f"- {self.ln_max - self.ln_min}) + 1e0))")
        t = f"CAST({tf_expr} AS DOUBLE)"
        tf = (f"(CASE WHEN {t} = 0e0 THEN 0e0 "
              f"WHEN {t} <= {self.tf_min!r} THEN {self.tf_base!r} "
              f"ELSE sqrt({t} + {self.tf_base * self.tf_base!r} "
              f"- {self.tf_min!r}) END)")
        return f"(({w}) * {tf} * {norm})"


class LMJelinekMercerSimilarity:
    """Jelinek-Mercer smoothed LM (LMJelinekMercerSimilarity.java:63-68):
    ``score = boost * ln(1 + ((1-lambda)*tf/dl) / (lambda*p))`` with the
    default collection model ``p = (ttf+1)/(numberOfFieldTokens+1)``
    (LMSimilarity.java:154-156).  Java stores lambda as a ``float``
    (:42) and computes ``1 - lambda`` in float32 before promoting, so
    both constants are float32-rounded here.  Default lambda = 0.7, the
    Solr LMJelinekMercerSimilarityFactory default for long queries.
    Non-linear in the per-term constant (lambda*p), so multi-term
    scoring keeps one addend per term (MultiSimilarity.java:66-72);
    ln(1+x) with x >= 0 needs no clamp."""

    name = "lmjelinekmercer"

    def __init__(self, lam: float = 0.7):
        self.lam = _f32(lam)
        self.one_minus = _f32(1.0 - self.lam)

    def weight(self, df: int, ttf: int, n: int, sum_ttf: int) -> float:
        return self.lam * ((ttf + 1.0) / (sum_ttf + 1.0))

    def weight_sql(self, df_sql: str, ttf_sql: str, n_sql: str,
                   sumttf_sql: str) -> str:
        return (f"({self.lam!r} * ((CAST({ttf_sql} AS DOUBLE) + 1e0) / "
                f"(CAST({sumttf_sql} AS DOUBLE) + 1e0)))")

    def doc_score_sql(self, tf_expr: str, qdl_expr: str,
                      weight_exprs: list[str], avgdl_sql: str) -> str:
        parts = [
            (f"ln(1e0 + (({self.one_minus!r} * "
             f"CAST({tf_expr} AS DOUBLE)) / "
             f"CAST({qdl_expr} AS DOUBLE)) / ({w}))")
            for w in weight_exprs]
        return "(" + " + ".join(parts) + ")"


class DFRInL2Similarity:
    """DFR I(n)L2 (DFRSimilarity.java:110-114 with BasicModelIn.java:
    33-44, AfterEffectL.java:32-34, NormalizationH2.java:58-60):
    ``tfn = tf * log2(1 + c*avgdl/dl)`` (H2, c=1), after-effect L's
    scoreTimes1pTfn == 1, and I(n)'s combined form
    ``A * (1 - 1/(1+tfn))`` with ``A = log2((N+1)/(df+0.5))``.
    log2(x) = ln(x)/ln(2) exactly as SimilarityBase.log2.  The basic-
    model weight A multiplies a term-independent factor, but Lucene's
    MultiSimScorer sums per-term scores, so one addend per term is the
    bit-faithful multi-term form."""

    name = "dfr_inl2"

    def __init__(self, c: float = 1.0):
        self.c = _f32(c)  # NormalizationH2 stores c as float

    def weight(self, df: int, ttf: int, n: int, sum_ttf: int) -> float:
        return math.log((n + 1) / (df + 0.5)) / math.log(2.0)

    def weight_sql(self, df_sql: str, ttf_sql: str, n_sql: str,
                   sumttf_sql: str) -> str:
        return (f"(ln((CAST({n_sql} AS DOUBLE) + 1e0) / "
                f"(CAST({df_sql} AS DOUBLE) + 0.5e0)) / ln(2e0))")

    def _tfn(self, tf_expr: str, qdl_expr: str, avgdl_sql: str) -> str:
        return (f"(CAST({tf_expr} AS DOUBLE) * (ln(1e0 + {self.c!r} * "
                f"({avgdl_sql}) / CAST({qdl_expr} AS DOUBLE)) / ln(2e0)))")

    def doc_score_sql(self, tf_expr: str, qdl_expr: str,
                      weight_exprs: list[str], avgdl_sql: str) -> str:
        tfn = self._tfn(tf_expr, qdl_expr, avgdl_sql)
        parts = [f"(({w}) * (1e0 - 1e0 / (1e0 + {tfn})))"
                 for w in weight_exprs]
        return "(" + " + ".join(parts) + ")"


class IBLLSimilarity(DFRInL2Similarity):
    """Information-based LL-DF-H2 (IBSimilarity.java:99-105 with
    DistributionLL.java:33-35, LambdaDF.java:28-36, NormalizationH2):
    per term ``score = -ln(lambda / (tfn + lambda))`` with
    ``lambda = (float)((df+1)/(N+1))`` — LambdaDF casts to float32 and
    nextDowns an exact 1 (a term present in every doc) so the
    distribution stays finite.  tfn inherits the H2 normalization text
    from DFRInL2Similarity (same Normalization class in the
    reference)."""

    name = "ib_ll"

    # largest float32 < 1 == Math.nextDown(1.0f) (LambdaDF.java:33)
    _NEXT_DOWN_1 = 1.0 - 2.0 ** -24

    def weight(self, df: int, ttf: int, n: int, sum_ttf: int) -> float:
        lam = _f32((df + 1.0) / (n + 1.0))
        return self._NEXT_DOWN_1 if lam == 1.0 else lam

    def weight_sql(self, df_sql: str, ttf_sql: str, n_sql: str,
                   sumttf_sql: str) -> str:
        lam = (f"CAST(CAST(((CAST({df_sql} AS DOUBLE) + 1e0) / "
               f"(CAST({n_sql} AS DOUBLE) + 1e0)) AS FLOAT) AS DOUBLE)")
        return (f"(CASE WHEN {lam} = 1e0 THEN {self._NEXT_DOWN_1!r} "
                f"ELSE {lam} END)")

    def doc_score_sql(self, tf_expr: str, qdl_expr: str,
                      weight_exprs: list[str], avgdl_sql: str) -> str:
        tfn = self._tfn(tf_expr, qdl_expr, avgdl_sql)
        parts = [f"(0e0 - ln(({w}) / ({tfn} + ({w}))))"
                 for w in weight_exprs]
        return "(" + " + ".join(parts) + ")"


class AxiomaticF2EXP:
    """Axiomatic F2EXP (AxiomaticF2EXP.java:52-91, combined in
    Axiomatic.score Axiomatic.java:104-112): per term
    ``score = idf * tfln`` with
    ``tfln = freq / (freq + s + s*dl/avgdl)`` (AxiomaticF2EXP.java:77)
    and ``idf = pow((N+1)/df, k)`` (AxiomaticF2EXP.java:85); tf and ln
    components are the constant 1 (:61,:69), gamma is 0 (:91) so the
    reference's final ``Math.max(0, score)`` clamp is a no-op.  s and k
    are stored as floats (Axiomatic.java:45,50; defaults 0.25f / 0.35f,
    :100) and promote to double inside the arithmetic.  Non-linear in
    the per-term constant, so multi-term scoring keeps one addend per
    term (MultiSimilarity.java:66-72).  ``pow`` is evaluated by libm on
    both backends (Math.pow itself is only 1-ulp-accurate), absorbed by
    the round(score, 6) compare contract."""

    name = "axiomatic_f2exp"

    def __init__(self, s: float = 0.25, k: float = 0.35):
        self.s = _f32(s)
        self.k = _f32(k)

    def weight(self, df: int, ttf: int, n: int, sum_ttf: int) -> float:
        return math.pow((n + 1.0) / df, self.k)

    def weight_sql(self, df_sql: str, ttf_sql: str, n_sql: str,
                   sumttf_sql: str) -> str:
        return (f"pow((CAST({n_sql} AS DOUBLE) + 1e0) / "
                f"CAST({df_sql} AS DOUBLE), {self.k!r})")

    def doc_score_sql(self, tf_expr: str, qdl_expr: str,
                      weight_exprs: list[str], avgdl_sql: str) -> str:
        t = f"CAST({tf_expr} AS DOUBLE)"
        x = f"CAST({qdl_expr} AS DOUBLE)"
        # Java operand order: (freq + s) + ((s * docLen) / avgdl)
        tfln = (f"({t} / (({t} + {self.s!r}) + "
                f"(({self.s!r} * {x}) / ({avgdl_sql}))))")
        parts = [f"(({w}) * {tfln})" for w in weight_exprs]
        return "(" + " + ".join(parts) + ")"


class DFIStandardizedSimilarity:
    """Divergence from Independence with the standardized measure
    (DFISimilarity.java:55-65, IndependenceStandardized.java:37-39):
    per term ``expected = (ttf+1) * dl / (sumTotalTermFreq+1)``; if
    ``freq <= expected`` the term contributes 0 (DFISimilarity.java:60),
    else ``log2((freq-expected)/sqrt(expected) + 1)`` with
    SimilarityBase.log2 = ln/ln(2).  The per-term constant here is
    ``(ttf+1)/(sumTotalTermFreq+1)`` and expected = constant * dl; the
    reference multiplies before dividing, a 1-ulp reshuffle absorbed by
    the round(score, 6) contract (engine and oracle execute the
    identical regrouped graph, so they agree bit-exactly with each
    other).  Non-linear per term (MultiSimilarity.java:66-72)."""

    name = "dfi_standardized"

    def weight(self, df: int, ttf: int, n: int, sum_ttf: int) -> float:
        return (ttf + 1.0) / (sum_ttf + 1.0)

    def weight_sql(self, df_sql: str, ttf_sql: str, n_sql: str,
                   sumttf_sql: str) -> str:
        return (f"((CAST({ttf_sql} AS DOUBLE) + 1e0) / "
                f"(CAST({sumttf_sql} AS DOUBLE) + 1e0))")

    def doc_score_sql(self, tf_expr: str, qdl_expr: str,
                      weight_exprs: list[str], avgdl_sql: str) -> str:
        t = f"CAST({tf_expr} AS DOUBLE)"
        x = f"CAST({qdl_expr} AS DOUBLE)"
        parts = []
        for w in weight_exprs:
            e = f"(({w}) * {x})"
            m = f"(({t} - {e}) / sqrt({e}))"
            parts.append(
                f"(CASE WHEN {t} <= {e} THEN 0e0 "
                f"ELSE (ln({m} + 1e0) / ln(2e0)) END)")
        return "(" + " + ".join(parts) + ")"


SIMILARITIES = {
    "bm25": BM25Similarity,
    "classic": ClassicSimilarity,
    "lmdirichlet": LMDirichletSimilarity,
    "boolean": BooleanSimilarity,
    "sweetspot": SweetSpotSimilarity,
    "lmjelinekmercer": LMJelinekMercerSimilarity,
    "dfr_inl2": DFRInL2Similarity,
    "ib_ll": IBLLSimilarity,
    "axiomatic_f2exp": AxiomaticF2EXP,
    "dfi_standardized": DFIStandardizedSimilarity,
}
