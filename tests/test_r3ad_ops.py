"""Round-3ad ops: probability-distribution evaluators
(solrj/io/eval/{Normal,Uniform,UniformInteger,Binomial,Poisson,
Geometric,ZipF,Constant,Triangular,LogNormal,Weibull,Gamma,Beta,
Enumerated}DistributionEvaluator.java consumed by
CumulativeProbabilityEvaluator.java / ProbabilityEvaluator.java /
DensityEvaluator.java / SampleEvaluator.java /
OutliersEvaluator.java / KolmogorovSmirnovEvaluator.java).

Laws: every closed form is checked against an INDEPENDENT python
twin — math.erf for the normal family (the engine's A&S-7.1.26
polynomial must land within 1.5e-7 of the true erf), exact
rational/combinatorial twins for the discrete families, Simpson
numeric integration of the density for the gamma/beta cdfs, exact
order statistics for the KS d-statistic, brute-force interleaving
enumeration for the two-sample exact P, and the analytic n=1 law
for the one-sample Marsaglia p-value."""

import math
from itertools import combinations

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs}), docs


def _tup(ev, exprs):
    body = ", ".join(f"{k}={v}" for k, v in exprs.items())
    return ev.eval('let(a=search(documents, q="*:*", '
                   'fl="doc_id,n_chars", sort="doc_id asc"), '
                   f'x=col(a, n_chars), tuple({body}))').collect()[0]


def _series(docs, n=30):
    rows = docs.select("doc_id", "n_chars").collect()
    rows.sort(key=lambda r: r["doc_id"])
    return [float(r["n_chars"]) for r in rows][:n]


# ---------------------------------------------------------------------------
# continuous families — cdf/density twins
# ---------------------------------------------------------------------------

def test_normal_family(spark):
    ev, docs = _ev(spark)
    v = _series(docs, 3)
    r = _tup(ev, {
        "nc": "cumulativeProbability(normalDistribution(500, 150), "
              "valueAt(x, 0))",
        "nd": "density(normalDistribution(500, 150), valueAt(x, 0))",
        "npr": "probability(normalDistribution(500, 150), "
               "valueAt(x, 0), add(valueAt(x, 0), 100))"})
    x = v[0]
    true_cdf = 0.5 * (1 + math.erf((x - 500) / (150 * math.sqrt(2))))
    # A&S 7.1.26 guarantee
    assert abs(r["nc"] - true_cdf) < 1.5e-7
    assert r["nd"] == pytest.approx(
        math.exp(-0.5 * ((x - 500) / 150) ** 2)
        / (150 * math.sqrt(2 * math.pi)), rel=1e-12)
    hi_cdf = 0.5 * (1 + math.erf((x + 100 - 500) / (150 * math.sqrt(2))))
    assert abs(r["npr"] - (hi_cdf - true_cdf)) < 3e-7


def test_uniform_real_exact(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "lo": "cumulativeProbability(uniformDistribution(10, 20), 5)",
        "mid": "cumulativeProbability(uniformDistribution(10, 20), 12)",
        "hi": "cumulativeProbability(uniformDistribution(10, 20), 25)",
        "din": "density(uniformDistribution(10, 20), 15)",
        "dout": "density(uniformDistribution(10, 20), 25)"})
    assert r["lo"] == 0.0 and r["hi"] == 1.0
    assert r["mid"] == pytest.approx(0.2, abs=0)
    assert r["din"] == pytest.approx(0.1, abs=0) and r["dout"] == 0.0


def test_triangular_exact(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "a": "cumulativeProbability(triangularDistribution(0, 4, 10), 2)",
        "b": "cumulativeProbability(triangularDistribution(0, 4, 10), 4)",
        "c": "cumulativeProbability(triangularDistribution(0, 4, 10), 7)",
        "da": "density(triangularDistribution(0, 4, 10), 2)",
        "db": "density(triangularDistribution(0, 4, 10), 4)",
        "dc": "density(triangularDistribution(0, 4, 10), 7)"})
    # commons-math TriangularDistribution closed forms
    assert r["a"] == pytest.approx(4 / (10 * 4), abs=1e-15)       # x^2/(b a_c)
    assert r["b"] == pytest.approx(4 / 10, abs=1e-15)             # (c-a)/(b-a)
    assert r["c"] == pytest.approx(1 - 9 / (10 * 6), abs=1e-15)
    assert r["da"] == pytest.approx(2 * 2 / (10 * 4), abs=1e-15)
    assert r["db"] == pytest.approx(2 / 10, abs=1e-15)
    assert r["dc"] == pytest.approx(2 * 3 / (10 * 6), abs=1e-15)


def test_lognormal_weibull_twins(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "lc": "cumulativeProbability(logNormalDistribution(1.5, 0.5), 7)",
        "ld": "density(logNormalDistribution(1.5, 0.5), 7)",
        "wc": "cumulativeProbability(weibullDistribution(1.5, 3), 2)",
        "wd": "density(weibullDistribution(1.5, 3), 2)",
        "w0": "cumulativeProbability(weibullDistribution(2, 3), -1)"})
    z = (math.log(7) - 1.5) / 0.5
    assert abs(r["lc"] - 0.5 * (1 + math.erf(z / math.sqrt(2)))) < 1.5e-7
    assert r["ld"] == pytest.approx(
        math.exp(-0.5 * z * z) / (7 * 0.5 * math.sqrt(2 * math.pi)),
        rel=1e-12)
    xs = 2 / 3
    assert r["wc"] == pytest.approx(1 - math.exp(-xs ** 1.5), rel=1e-12)
    assert r["wd"] == pytest.approx(
        (1.5 / 3) * xs ** 0.5 * math.exp(-xs ** 1.5), rel=1e-12)
    assert r["w0"] == 0.0


def test_constant_distribution_step(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "lo": "cumulativeProbability(constantDistribution(42), 41.5)",
        "at": "cumulativeProbability(constantDistribution(42), 42)",
        "hi": "cumulativeProbability(constantDistribution(42), 43)",
        "dat": "density(constantDistribution(42), 42)",
        "doff": "density(constantDistribution(42), 41)"})
    assert (r["lo"], r["at"], r["hi"]) == (0.0, 1.0, 1.0)
    assert (r["dat"], r["doff"]) == (1.0, 0.0)


# ---------------------------------------------------------------------------
# gamma / beta — independent Simpson-integration twins
# ---------------------------------------------------------------------------

def _simpson(f, a, b, n=4000):
    h = (b - a) / n
    s = f(a) + f(b)
    for i in range(1, n):
        s += f(a + i * h) * (4 if i % 2 else 2)
    return s * h / 3


def test_gamma_integer_shape_cdf_vs_integration(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "c": "cumulativeProbability(gammaDistribution(3, 2), 5)",
        "d": "density(gammaDistribution(3, 2), 5)",
        "z": "cumulativeProbability(gammaDistribution(3, 2), 0)"})
    pdf = lambda t: t ** 2 * math.exp(-t / 2) / (math.gamma(3) * 2 ** 3)
    assert r["c"] == pytest.approx(_simpson(pdf, 0, 5), abs=1e-9)
    assert r["d"] == pytest.approx(pdf(5), rel=1e-12)
    assert r["z"] == 0.0


def test_beta_integer_shape_cdf_vs_integration(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "c": "cumulativeProbability(betaDistribution(2, 3), 0.35)",
        "d": "density(betaDistribution(2, 3), 0.35)",
        "one": "cumulativeProbability(betaDistribution(2, 3), 1.5)"})
    bfn = math.gamma(2) * math.gamma(3) / math.gamma(5)
    pdf = lambda t: t * (1 - t) ** 2 / bfn
    assert r["c"] == pytest.approx(_simpson(pdf, 0, 0.35), abs=1e-9)
    assert r["d"] == pytest.approx(pdf(0.35), rel=1e-12)
    assert r["one"] == 1.0


def test_gamma_beta_reject_non_integer_shape(spark):
    ev, _ = _ev(spark)
    with pytest.raises(Exception, match="integer"):
        _tup(ev, {"c": "cumulativeProbability("
                       "gammaDistribution(2.5, 2), 5)"})
    with pytest.raises(Exception, match="integer"):
        _tup(ev, {"c": "density(betaDistribution(1.5, 3), 0.3)"})


# ---------------------------------------------------------------------------
# discrete families — exact combinatorial twins
# ---------------------------------------------------------------------------

def test_binomial_exact(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "p5": "probability(binomialDistribution(20, 0.25), 5)",
        "c5": "cumulativeProbability(binomialDistribution(20, 0.25), 5)",
        "neg": "probability(binomialDistribution(20, 0.25), -1)",
        "top": "cumulativeProbability(binomialDistribution(20, 0.25), 20)"})
    pmf = lambda k: math.comb(20, k) * 0.25 ** k * 0.75 ** (20 - k)
    assert r["p5"] == pytest.approx(pmf(5), rel=1e-12)
    assert r["c5"] == pytest.approx(sum(pmf(i) for i in range(6)),
                                    rel=1e-12)
    assert r["neg"] == 0.0 and r["top"] == 1.0


def test_poisson_exact(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "p": "probability(poissonDistribution(4.0), 6)",
        "c": "cumulativeProbability(poissonDistribution(4.0), 6)",
        "z": "probability(poissonDistribution(4.0), 0)"})
    pmf = lambda k: math.exp(-4) * 4 ** k / math.factorial(k)
    assert r["p"] == pytest.approx(pmf(6), rel=1e-12)
    assert r["c"] == pytest.approx(sum(pmf(i) for i in range(7)),
                                   rel=1e-12)
    assert r["z"] == pytest.approx(math.exp(-4), rel=1e-12)


def test_geometric_exact(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "p": "probability(geometricDistribution(0.3), 4)",
        "c": "cumulativeProbability(geometricDistribution(0.3), 4)",
        "z": "probability(geometricDistribution(0.3), 0)"})
    # commons-math GeometricDistribution: pmf p(1-p)^k on k >= 0
    assert r["p"] == pytest.approx(0.3 * 0.7 ** 4, rel=1e-12)
    assert r["c"] == pytest.approx(1 - 0.7 ** 5, rel=1e-12)
    assert r["z"] == pytest.approx(0.3, rel=1e-12)


def test_zipf_exact(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "p": "probability(zipFDistribution(10, 2), 3)",
        "c": "cumulativeProbability(zipFDistribution(10, 2), 3)",
        "full": "cumulativeProbability(zipFDistribution(10, 2), 10)"})
    h = sum(1 / k ** 2 for k in range(1, 11))
    hk = sum(1 / k ** 2 for k in range(1, 4))
    assert r["p"] == pytest.approx((1 / 9) / h, rel=1e-12)
    assert r["c"] == pytest.approx(hk / h, rel=1e-12)
    assert r["full"] == 1.0


def test_uniform_integer_exact(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "p": "probability(uniformIntegerDistribution(3, 7), 5)",
        "c": "cumulativeProbability(uniformIntegerDistribution(3, 7), 5)",
        "lo": "cumulativeProbability(uniformIntegerDistribution(3, 7), 2)",
        "hi": "cumulativeProbability(uniformIntegerDistribution(3, 7), 7)"})
    assert r["p"] == pytest.approx(0.2, abs=0)
    assert r["c"] == pytest.approx(3 / 5, abs=1e-15)
    assert r["lo"] == 0.0 and r["hi"] == 1.0


def test_enumerated_from_samples_and_pairs(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "p": "probability(enumeratedDistribution("
             "array(1, 2, 2, 3, 3, 3)), 3)",
        "c": "cumulativeProbability(enumeratedDistribution("
             "array(1, 2, 2, 3, 3, 3)), 2)",
        "p2": "probability(enumeratedDistribution(array(10, 20, 30), "
              "array(0.2, 0.5, 0.3)), 20)",
        "c2": "cumulativeProbability(enumeratedDistribution("
              "array(10, 20, 30), array(0.2, 0.5, 0.3)), 20)"})
    assert r["p"] == pytest.approx(0.5, abs=0)
    assert r["c"] == pytest.approx(0.5, abs=0)
    assert r["p2"] == pytest.approx(0.5, abs=0)
    assert r["c2"] == pytest.approx(0.7, rel=1e-15)


def test_probability_two_arg_requires_integer_dist(spark):
    ev, _ = _ev(spark)
    with pytest.raises(Exception, match="integer"):
        _tup(ev, {"p": "probability(normalDistribution(0, 1), 1)"})


# ---------------------------------------------------------------------------
# kolmogorovSmirnov
# ---------------------------------------------------------------------------

def test_ks_one_sample_d_statistic_exact(spark):
    ev, docs = _ev(spark)
    v = sorted(_series(docs, 20))
    r = _tup(ev, {
        "ks": "kolmogorovSmirnov(uniformDistribution(0, 2000), "
              "copyOfRange(x, 0, 20))"})
    n = len(v)
    cdf = lambda t: min(max(t / 2000, 0.0), 1.0)
    d = max(max((i + 1) / n - cdf(t), cdf(t) - i / n)
            for i, t in enumerate(v))
    assert r["ks"]["d-statistic"] == pytest.approx(d, abs=1e-12)
    assert 0.0 <= r["ks"]["p-value"] <= 1.0


def test_ks_one_sample_p_value_n1_analytic(spark):
    # n=1 against U(0,1): D = max(u, 1-u); P(D <= t) = 2t - 1 on
    # [1/2, 1], so p = P(D >= d) = 2 - 2d — closed form that pins
    # the Marsaglia matrix path end-to-end.
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "ks": "kolmogorovSmirnov(uniformDistribution(0, 1), "
              "array(0.3))"})
    d = max(0.3, 0.7)
    assert r["ks"]["d-statistic"] == pytest.approx(d, abs=1e-12)
    assert r["ks"]["p-value"] == pytest.approx(2 - 2 * d, abs=1e-9)


def test_ks_one_sample_p_close_to_asymptotic(spark):
    # for n=20 and moderate d, the exact p is within a few percent
    # of the Kolmogorov asymptotic Q(d sqrt(n))
    ev, _ = _ev(spark)
    vals = ", ".join(str((7 * i + 3) % 20 / 20.0) for i in range(20))
    r = _tup(ev, {"ks": f"kolmogorovSmirnov("
                        f"uniformDistribution(0, 1), array({vals}))"})
    d, p = r["ks"]["d-statistic"], r["ks"]["p-value"]
    lam = d * math.sqrt(20)
    q = 2 * sum((-1) ** (j - 1) * math.exp(-2 * j * j * lam * lam)
                for j in range(1, 101))
    assert p == pytest.approx(q, abs=0.05)


def _brute_two_sample_p(x, y):
    def dst(a, b):
        na, nb = len(a), len(b)
        best = 0.0
        sa, sb = sorted(a), sorted(b)
        for z in sorted(set(a + b)):
            fa = sum(1 for t in sa if t <= z) / na
            fb = sum(1 for t in sb if t <= z) / nb
            best = max(best, abs(fa - fb))
        return best

    d_obs = dst(x, y)
    vals = sorted(x + y)
    cnt = tot = 0
    for idx in combinations(range(len(vals)), len(x)):
        a = [vals[i] for i in idx]
        b = [vals[i] for i in range(len(vals)) if i not in set(idx)]
        tot += 1
        if dst(a, b) >= d_obs - 1e-12:
            cnt += 1
    return cnt / tot


def test_ks_two_sample_exact_p_vs_brute_force(spark):
    # the reference stores the two-sample P-VALUE under the
    # "d-statistic" key (KolmogorovSmirnovEvaluator.java two-sample
    # branch) — mirrored bug-compatibly
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "a": "ks(array(1, 2, 3, 4, 10), array(5, 6, 7, 8, 9))",
        "b": "kolmogorovSmirnov(array(1, 3, 5, 7), array(2, 4, 6, 8))"})
    assert r["a"]["d-statistic"] == pytest.approx(
        _brute_two_sample_p([1, 2, 3, 4, 10], [5, 6, 7, 8, 9]),
        abs=1e-12)
    assert r["b"]["d-statistic"] == pytest.approx(
        _brute_two_sample_p([1, 3, 5, 7], [2, 4, 6, 8]), abs=1e-12)


# ---------------------------------------------------------------------------
# outliers
# ---------------------------------------------------------------------------

def test_outliers_twin_and_disable_flags(spark):
    ev, docs = _ev(spark)
    v = _series(docs, 30)
    r = _tup(ev, {
        "ol": "outliers(normalDistribution(800, 300), "
              "copyOfRange(x, 0, 30), 0.1, 0.9)",
        "lo_only": "outliers(normalDistribution(800, 300), "
                   "copyOfRange(x, 0, 30), 0.1, -1)",
        "none": "outliers(normalDistribution(800, 300), "
                "copyOfRange(x, 0, 30), -1, -1)"})
    cdf = lambda t: 0.5 * (1 + math.erf((t - 800) / (300 * math.sqrt(2))))
    flagged = [t for t in v if cdf(t) <= 0.1 + 2e-7 or cdf(t) >= 0.9 - 2e-7]
    loose = [t for t in v if cdf(t) <= 0.1 - 2e-7 or cdf(t) >= 0.9 + 2e-7]
    assert len(loose) <= len(r["ol"]) <= len(flagged)
    # vec order preserved, cumulative probability attached
    got = [s["value"] for s in r["ol"]]
    assert got == sorted(got, key=lambda t: v.index(t))
    for s in r["ol"]:
        assert abs(s["cumulativeProbablity_d"] - cdf(s["value"])) < 2e-7
    lo_twin = [t for t in v if cdf(t) <= 0.1 + 2e-7]
    assert len(r["lo_only"]) <= len(lo_twin)
    assert all(s["cumulativeProbablity_d"] <= 0.1 + 1e-12
               for s in r["lo_only"])
    assert r["none"] == []


# ---------------------------------------------------------------------------
# sample — distributional laws (random by contract)
# ---------------------------------------------------------------------------

def test_sample_laws(spark):
    ev, _ = _ev(spark)
    r = _tup(ev, {
        "nm": "mean(sample(normalDistribution(100, 5), 400))",
        "ui": "sample(uniformIntegerDistribution(3, 7), 200)",
        "cs": "sample(constantDistribution(9))",
        "tr": "sample(triangularDistribution(0, 2, 10), 200)",
        "wb": "sample(weibullDistribution(2, 5), 200)",
        "ge": "sample(geometricDistribution(0.5), 200)",
        "en": "sample(enumeratedDistribution(array(4, 4, 8)), 100)"})
    assert r["nm"] == pytest.approx(100, abs=2.0)   # sd/sqrt(400)=0.25
    assert all(3 <= t <= 7 for t in r["ui"])
    assert len(set(r["ui"])) >= 3
    assert r["cs"] == 9.0
    assert all(0 <= t <= 10 for t in r["tr"])
    assert all(t >= 0 for t in r["wb"])
    assert all(t >= 0 and t == int(t) for t in r["ge"])
    assert set(r["en"]) <= {4.0, 8.0}


def test_sample_unsupported_kind_raises(spark):
    ev, _ = _ev(spark)
    with pytest.raises(Exception, match="sample"):
        _tup(ev, {"z": "sample(zipFDistribution(10, 2), 5)"})
