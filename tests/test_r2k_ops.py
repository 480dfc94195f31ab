"""Round-2k operators: LM Jelinek-Mercer / DFR I(n)L2 / IB LL-DF-H2
similarities, SpanContaining/SpanWithin, Solr [subquery] transformer,
interpolated bigram LM — algorithmic laws on real testdata (driver-
contract parity runs in tools/verify_contract.py; these pin the math
against independent Python recomputation)."""

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def se(spark):
    from __spark_entry__ import _searcher
    return _searcher(spark, SF)


@pytest.fixture(scope="module")
def stats(se):
    ts = {r.term: (r.df, r.ttf) for r in se.ix.term_stats.collect()}
    qdl = {r.docid: r.qdl for r in se.ix.docs.select("docid", "qdl")
           .collect()}
    return ts, qdl, se.ix.doc_count, se.ix.sum_ttf


def _tf(se, term):
    return {r.docid: r.tf for r in se.ix.postings
            .filter(F.col("term") == term).select("docid", "tf")
            .collect()}


# -- similarities: independent Python recomputation of every hit -----------

def test_lmjm_scores(spark, se, stats):
    """score = ln(1 + ((1-lam32)*tf/dl) / (lam32 * (ttf+1)/(sumttf+1)))
    (LMJelinekMercerSimilarity.java:63-68)."""
    from lucene_solr_spark.search.similarities import _f32
    from lucene_solr_spark.search.query import Term
    from lucene_solr_spark.search.engine import Searcher
    ts, qdl, n, sumttf = stats
    lam = _f32(0.7)
    one_minus = _f32(1.0 - lam)
    sim = __import__("lucene_solr_spark.search.similarities",
                     fromlist=["SIMILARITIES"]).SIMILARITIES[
                         "lmjelinekmercer"]()
    eng = Searcher(se.ix, similarity=sim)
    tf = _tf(se, "merge")
    got = {r.docid: r.score
           for r in eng.scored(Term("merge")).collect()}
    assert got
    p = (ts["merge"][1] + 1.0) / (sumttf + 1.0)
    for d, s in got.items():
        exp = math.log(1.0 + ((one_minus * tf[d]) / qdl[d]) / (lam * p))
        assert abs(s - exp) < 1e-12, d


def test_dfr_inl2_scores(spark, se, stats):
    """score = log2((N+1)/(df+0.5)) * (1 - 1/(1+tfn)),
    tfn = tf*log2(1 + avgdl/dl) (DFRSimilarity.java:110,
    BasicModelIn.java:33-44, NormalizationH2.java:58)."""
    from lucene_solr_spark.search.query import Term
    from lucene_solr_spark.search.engine import Searcher
    from lucene_solr_spark.search.similarities import SIMILARITIES
    ts, qdl, n, sumttf = stats
    eng = Searcher(se.ix, similarity=SIMILARITIES["dfr_inl2"]())
    tf = _tf(se, "window")
    got = {r.docid: r.score
           for r in eng.scored(Term("window")).collect()}
    assert got
    avgdl = sumttf / float(n)
    A = math.log((n + 1) / (ts["window"][0] + 0.5)) / math.log(2.0)
    for d, s in got.items():
        tfn = tf[d] * (math.log(1.0 + 1.0 * avgdl / qdl[d])
                       / math.log(2.0))
        exp = A * (1.0 - 1.0 / (1.0 + tfn))
        assert abs(s - exp) < 1e-9, d


def test_ib_ll_scores(spark, se, stats):
    """score = -ln(lam / (tfn + lam)), lam = float32((df+1)/(N+1))
    (IBSimilarity.java:99, DistributionLL.java:33, LambdaDF.java:28)."""
    from lucene_solr_spark.search.query import Term
    from lucene_solr_spark.search.engine import Searcher
    from lucene_solr_spark.search.similarities import SIMILARITIES, _f32
    ts, qdl, n, sumttf = stats
    eng = Searcher(se.ix, similarity=SIMILARITIES["ib_ll"]())
    tf = _tf(se, "hash")
    got = {r.docid: r.score for r in eng.scored(Term("hash")).collect()}
    assert got
    avgdl = sumttf / float(n)
    lam = _f32((ts["hash"][0] + 1.0) / (n + 1.0))
    if lam == 1.0:
        lam = 1.0 - 2.0 ** -24
    for d, s in got.items():
        tfn = tf[d] * (math.log(1.0 + avgdl / qdl[d]) / math.log(2.0))
        exp = -math.log(lam / (tfn + lam))
        assert abs(s - exp) < 1e-9, d


def test_ib_lambda_nextdown_guard():
    """A term in every doc gives float32 lambda == 1; LambdaDF.java:33
    nextDowns it so -ln(lam/(tfn+lam)) stays > 0 and finite."""
    from lucene_solr_spark.search.similarities import SIMILARITIES
    sim = SIMILARITIES["ib_ll"]()
    lam = sim.weight(df=999, ttf=5000, n=999, sum_ttf=100000)
    assert 0.0 < lam < 1.0 and lam == 1.0 - 2.0 ** -24


# -- spans: brute force over token lists ------------------------------------

def _token_lists(spark):
    from __spark_entry__ import _documents
    from lucene_solr_spark.analysis.analyzers import simple_tokens_col
    return {r.doc_id: r.toks for r in _documents(spark, SF).select(
        "doc_id", simple_tokens_col("text").alias("toks")).collect()}


def _windows(toks, a, b, slop):
    pa = [i for i, t in enumerate(toks) if t == a]
    pb = [i for i, t in enumerate(toks) if t == b]
    return [(p1, p2) for p1 in pa for p2 in pb
            if p2 > p1 and p2 - p1 - 1 <= slop]


def test_span_containing_bruteforce(spark):
    from __spark_entry__ import (_q_span_containing, _SC_A, _SC_B,
                                 _SC_C, _SC_SLOP)
    got = {r.doc_id: r.n_spans
           for r in _q_span_containing(spark, SF).collect()}
    assert got, "containing spec must fire on the fixture corpus"
    toks = _token_lists(spark)
    exp = {}
    for d, ts in toks.items():
        pc = [i for i, t in enumerate(ts) if t == _SC_C]
        n = sum(1 for p1, p2 in _windows(ts, _SC_A, _SC_B, _SC_SLOP)
                if any(p1 <= q <= p2 for q in pc))
        if n:
            exp[d] = n
    exp = dict(sorted(exp.items())[:20])
    assert got == exp


def test_span_within_bruteforce(spark):
    from __spark_entry__ import (_q_span_within, _SW_A, _SW_B, _SW_C,
                                 _SW_SLOP)
    got = {r.doc_id: r.n_within
           for r in _q_span_within(spark, SF).collect()}
    assert got, "within spec must fire on the fixture corpus"
    toks = _token_lists(spark)
    exp = {}
    for d, ts in toks.items():
        ws = _windows(ts, _SW_A, _SW_B, _SW_SLOP)
        n = sum(1 for q, t in enumerate(ts) if t == _SW_C
                and any(p1 <= q <= p2 for p1, p2 in ws))
        if n:
            exp[d] = n
    exp = dict(sorted(exp.items())[:20])
    assert got == exp


# -- [subquery] transformer --------------------------------------------------

def test_subquery_children_share_parent_field(spark, se):
    from __spark_entry__ import (_q_subquery, _documents, _SUBQ_TERM,
                                 _SUBQ_K, _SUBQ_ROWS)
    from lucene_solr_spark.search.query import Term
    rows = _q_subquery(spark, SF).collect()
    parents = [r.doc_id for r in se.topk(Term(_SUBQ_TERM), _SUBQ_K)
               .collect()]
    lang = {r.doc_id: r.lang for r in _documents(spark, SF)
            .select("doc_id", "lang").collect()}
    nchars = {r.doc_id: r.n_chars for r in _documents(spark, SF)
              .select("doc_id", "n_chars").collect()}
    assert {r.doc_id for r in rows} == set(parents)
    by_parent = {}
    for r in rows:
        by_parent.setdefault(r.doc_id, []).append(r)
    for p, rs in by_parent.items():
        assert [r.rk for r in sorted(rs, key=lambda r: r.rk)] == \
            list(range(1, _SUBQ_ROWS + 1))
        for r in rs:
            assert lang[r.sub_id] == lang[p]
        # children are the global top-rows by (n_chars DESC, id ASC)
        # within the parent's lang
        cands = sorted((d for d in lang if lang[d] == lang[p]),
                       key=lambda d: (-nchars[d], d))[:_SUBQ_ROWS]
        assert sorted(r.sub_id for r in rs) == sorted(cands)


# -- bigram LM ----------------------------------------------------------------

def test_bigram_logprob_tiny_corpus(spark):
    """Exact hand computation on a 3-doc corpus."""
    from lucene_solr_spark.textops.ops import bigram_logprob
    docs = [(0, "a b a b"), (1, "a b c"), (2, "b a")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: (r.logprob, r.n_bigrams)
           for r in bigram_logprob(df).collect()}
    toks = {d: t.split() for d, t in docs}
    from collections import Counter
    uni = Counter(w for t in toks.values() for w in t)
    tot = float(sum(uni.values()))
    bgc = Counter((t[i], t[i + 1]) for t in toks.values()
                  for i in range(len(t) - 1))
    ctx = Counter()
    for (w1, _), c in bgc.items():
        ctx[w1] += c
    for d, t in toks.items():
        lps = [math.log(0.75 * (bgc[(t[i], t[i + 1])] / ctx[t[i]])
                        + 0.25 * (uni[t[i + 1]] / tot))
               for i in range(len(t) - 1)]
        exp = round(sum(lps) / len(lps), 6)
        assert got[d] == (pytest.approx(exp, abs=1e-6), len(lps)), d


def test_bigram_conditionals_sum_to_one(spark):
    """Per context w1, the MLE conditional rows sum to 1 — the LM
    normalization law, checked on the real corpus."""
    from lucene_solr_spark.textops.ops import with_tokens
    from __spark_entry__ import _documents
    df = _documents(spark, SF)
    toks = with_tokens(df).select("doc_id", "tokens")
    bg = toks.select(F.explode(F.expr(
        "transform(sequence(1, size(tokens) - 1), "
        "i -> struct(tokens[i-1] AS w1, tokens[i] AS w2))"))
        .alias("b")).select("b.w1", "b.w2")
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("bc"))
    rows = (bgc.groupBy("w1").agg(F.sum("bc").alias("n")).collect())
    total = {r.w1: r.n for r in rows}
    probs = bgc.withColumn("p", F.col("bc").cast("double")).collect()
    agg = {}
    for r in probs:
        agg[r.w1] = agg.get(r.w1, 0.0) + r.bc / total[r.w1]
    assert all(abs(v - 1.0) < 1e-9 for v in agg.values())
