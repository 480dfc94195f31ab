"""Round-3v ops: statistics + linear-algebra evaluators (solrj/io/
eval/: RankEvaluator — NaturalRanking ties AVERAGE, HistogramEvaluator
— EmpiricalDistribution, TTestEvaluator / PairedTTestEvaluator —
commons-math TTest statistics, MannWhitneyUEvaluator — U = max(U1,U2),
AnovaEvaluator — OneWayAnova F ratio, ConvolutionEvaluator —
MathArrays.convolve, MatrixMultiplyEvaluator)."""

import math

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs}), docs


def _series(docs):
    rows = docs.select("doc_id", "n_chars").collect()
    rows.sort(key=lambda r: r["doc_id"])
    return [float(r["n_chars"]) for r in rows]


def _tuple_over_series(ev, exprs):
    body = ", ".join(f"{k}={v}" for k, v in exprs.items())
    return ev.eval('let(a=search(documents, q="*:*", '
                   'fl="doc_id,n_chars", sort="doc_id asc"), '
                   f'x=col(a, n_chars), tuple({body}))').collect()[0]


def _avg_rank(pool, v):
    lt = sum(1 for y in pool if y < v)
    eq = sum(1 for y in pool if y == v)
    return lt + (eq + 1) / 2.0


def _mean_var(xs):
    n = float(len(xs))
    s = sum(xs)
    q = sum(x * x for x in xs)
    return s / n, (q - s * s / n) / (n - 1.0)


# ---------------------------------------------------------------------------
# rank — NaturalRanking ties=average
# ---------------------------------------------------------------------------

def test_rank_matches_average_tie_twin(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "r3": "valueAt(rank(x), 3)",
        "rsum": "valueAt(sumRows(matrix(rank(x))), 0)"})
    assert r["r3"] == _avg_rank(v, v[3])
    n = len(v)
    assert r["rsum"] == n * (n + 1) / 2.0  # ranks always sum to n(n+1)/2


# ---------------------------------------------------------------------------
# hist — EmpiricalDistribution binning + per-bin stats
# ---------------------------------------------------------------------------

def test_hist_bins_partition_and_stats(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    out = ev.eval('let(a=search(documents, q="*:*", '
                  'fl="doc_id,n_chars", sort="doc_id asc"), '
                  'x=col(a, n_chars), tuple(h=hist(x, 8)))')
    h = out.collect()[0]["h"]
    assert len(h) == 8
    mn, mx = min(v), max(v)
    delta = (mx - mn) / 8.0
    bins = [[] for _ in range(8)]
    for x in v:
        i = min(max(math.ceil((x - mn) / delta) - 1, 0), 7)
        bins[i].append(x)
    assert sum(b["N"] for b in h) == len(v)
    for i, b in enumerate(h):
        assert b["N"] == len(bins[i])
        if bins[i]:
            m, var = _mean_var(bins[i])
            assert b["min"] == min(bins[i]) and b["max"] == max(bins[i])
            assert b["sum"] == sum(bins[i])
            assert b["mean"] == pytest.approx(m, rel=1e-12)
            if len(bins[i]) > 1:
                assert b["var"] == pytest.approx(var, rel=1e-10)


# ---------------------------------------------------------------------------
# ttest / pairedTtest / mannWhitney / anova statistics
# ---------------------------------------------------------------------------

def test_ttest_welch_statistic(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    b = sorted(v)[:200]
    m1, v1 = _mean_var(v)
    m2, v2 = _mean_var(b)
    t = (m1 - m2) / math.sqrt(v1 / len(v) + v2 / len(b))
    r = _tuple_over_series(ev, {
        "tt": "getValue(ttest(x, copyOfRange(asc(x), 0, 200)), "
              "t-statistic)"})
    assert r["tt"] == pytest.approx(t, rel=1e-10)


def test_paired_ttest_statistic(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    d = [a - 0.5 * b for a, b in zip(v, sorted(v))]
    md, vd = _mean_var(d)
    t = md / math.sqrt(vd / len(d))
    r = _tuple_over_series(ev, {
        "pt": "getValue(pairedTtest(x, scalarMultiply(0.5, asc(x))), "
              "t-statistic)"})
    assert r["pt"] == pytest.approx(t, rel=1e-10)


def test_mann_whitney_u_statistic(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    A, B = v[:150], v[150:400]
    pool = A + B
    r1 = sum(_avg_rank(pool, a) for a in A)
    u1 = r1 - len(A) * (len(A) + 1) / 2.0
    u2 = len(A) * len(B) - u1
    r = _tuple_over_series(ev, {
        "mw": "getValue(mannWhitney(copyOfRange(x, 0, 150), "
              "copyOfRange(x, 150, 400)), u-statistic)"})
    assert r["mw"] == max(u1, u2)


def test_anova_f_ratio(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    gs = [v[:150], v[150:300], v[300:450]]
    tot = [x for g in gs for x in g]
    ssbg = sum(sum(g) ** 2 / len(g) for g in gs) \
        - sum(tot) ** 2 / len(tot)
    sswg = sum(sum(x * x for x in g) - sum(g) ** 2 / len(g)
               for g in gs)
    f = (ssbg / 2.0) / (sswg / (len(tot) - 3.0))
    r = _tuple_over_series(ev, {
        "av": "getValue(anova(copyOfRange(x, 0, 150), "
              "copyOfRange(x, 150, 300), copyOfRange(x, 300, 450)), "
              "f-ratio)"})
    assert r["av"] == pytest.approx(f, rel=1e-10)


# ---------------------------------------------------------------------------
# conv / matrixMult
# ---------------------------------------------------------------------------

def test_convolution_full(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    x, y = v[:50], v[:30]
    full = [sum(x[i] * y[k - i]
                for i in range(max(0, k - 29), min(50, k + 1)))
            for k in range(79)]
    r = _tuple_over_series(ev, {
        "n": "length(conv(copyOfRange(x, 0, 50), "
             "copyOfRange(x, 0, 30)))",
        "c0": "valueAt(conv(copyOfRange(x, 0, 50), "
              "copyOfRange(x, 0, 30)), 0)",
        "c40": "valueAt(conv(copyOfRange(x, 0, 50), "
               "copyOfRange(x, 0, 30)), 40)",
        "cl": "valueAt(conv(copyOfRange(x, 0, 50), "
              "copyOfRange(x, 0, 30)), 78)"})
    assert r["n"] == 79
    assert r["c0"] == full[0] == x[0] * y[0]
    assert r["c40"] == full[40]
    assert r["cl"] == full[78] == x[49] * y[29]


def test_matrix_multiply_gram(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "g00": "valueAt(rowAt(matrixMult(matrix(copyOfRange(x, 0, 100), "
               "copyOfRange(x, 100, 200)), transpose(matrix("
               "copyOfRange(x, 0, 100), copyOfRange(x, 100, 200)))), "
               "0), 0)",
        "g01": "valueAt(rowAt(matrixMult(matrix(copyOfRange(x, 0, 100), "
               "copyOfRange(x, 100, 200)), transpose(matrix("
               "copyOfRange(x, 0, 100), copyOfRange(x, 100, 200)))), "
               "0), 1)"})
    a, b = v[:100], v[100:200]
    assert r["g00"] == sum(x * x for x in a)
    assert r["g01"] == sum(x * y for x, y in zip(a, b))
