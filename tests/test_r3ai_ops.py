"""Round-3ai ops: fft/ifft (FFTEvaluator.java:50 / IFFTEvaluator
.java:45 — commons-math FastFourierTransformer STANDARD), and the
two-sample count tests chiSquareDataSet / gtestDataSet
(ChiSquareDataSetEvaluator.java:39, GTestDataSetEvaluator.java:39 —
commons-math ChiSquareTest.chiSquareDataSetsComparison /
GTest.gDataSetsComparison) with the runtime-df chi-square cdf
(regularized lower incomplete gamma closed forms, erf via the A&S
7.1.26 twin shared with the normal cdf)."""

import cmath
import math

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs})


def _one(spark, expr):
    return _ev(spark).eval(expr).collect()[0]


# ---------------------------------------------------------------------------
# fft / ifft
# ---------------------------------------------------------------------------

def _dft(xs):
    n = len(xs)
    return [sum(xs[j] * cmath.exp(-2j * math.pi * k * j / n)
                for j in range(n)) for k in range(n)]


def test_fft_matches_dft_twin(spark):
    xs = [1.0, 2.0, -1.0, 3.0, 0.5, -2.0, 4.0, 1.5]
    arr = ", ".join(str(v) for v in xs)
    r = _one(spark, f'let(m=fft(array({arr})), '
                    'tuple(re=rowAt(m, 0), im=rowAt(m, 1), '
                    'rl=getRowLabels(m)))')
    want = _dft(xs)
    assert r["rl"] == ["real", "imaginary"]
    for g, w in zip(r["re"], want):
        assert abs(g - w.real) < 1e-9
    for g, w in zip(r["im"], want):
        assert abs(g - w.imag) < 1e-9


def test_ifft_roundtrips_fft(spark):
    xs = [3.0, -1.0, 2.5, 0.0, 1.0, 4.0, -2.0, 0.5]
    arr = ", ".join(str(v) for v in xs)
    r = _one(spark, f'tuple(x=ifft(fft(array({arr}))))')
    for g, w in zip(r["x"], xs):
        assert abs(g - w) < 1e-9


def test_ifft_requires_complex_matrix(spark):
    with pytest.raises(ValueError, match="matrix"):
        _one(spark, 'tuple(x=ifft(array(1.0, 2.0)))')


# ---------------------------------------------------------------------------
# chi-square cdf twins
# ---------------------------------------------------------------------------

def _erf(x):
    t = 1.0 / (1.0 + 0.3275911 * x)
    return 1.0 - (((((1.061405429 * t - 1.453152027) * t)
                    + 1.421413741) * t - 0.284496736) * t
                  + 0.254829592) * t * math.exp(-x * x)


def _chi2_cdf(x, df):
    if x <= 0:
        return 0.0
    y = x / 2.0
    if df % 2 == 0:
        k = df // 2
        s, t = 1.0, 1.0
        for i in range(1, k):
            t = t * y / i
            s += t
        return 1.0 - math.exp(-y) * s
    k = (df - 1) // 2
    if k == 0:
        s = 0.0
    else:
        s = t = 2.0 * math.sqrt(y / math.pi)
        for j in range(1, k):
            t = t * y / (j + 0.5)
            s += t
    return _erf(math.sqrt(y)) - math.exp(-y) * s


def _chi2_dataset(o1, o2):
    cs1, cs2 = sum(o1), sum(o2)
    stat = 0.0
    if cs1 == cs2:
        for x, z in zip(o1, o2):
            d = float(x - z)
            stat += d * d / (x + z)
    else:
        w = math.sqrt(cs1 / cs2)
        for x, z in zip(o1, o2):
            d = x / w - z * w
            stat += d * d / (x + z)
    return stat, 1.0 - _chi2_cdf(stat, len(o1) - 1)


def _entropy(vals, total):
    h = 0.0
    for v in vals:
        if v > 0:
            p = v / total
            h -= p * math.log(p)
    return h


def _gtest_dataset(o1, o2):
    cs1, cs2 = sum(o1), sum(o2)
    n = cs1 + cs2
    hr = _entropy([cs1, cs2], n)
    hc = _entropy([x + z for x, z in zip(o1, o2)], n)
    ht = _entropy(list(o1) + list(o2), n)
    g = 2.0 * n * (hr + hc - ht)
    return g, 1.0 - _chi2_cdf(g, len(o1) - 1)


@pytest.mark.parametrize("o1,o2", [
    ([10, 9, 11, 8, 12], [11, 10, 9, 12, 8]),          # equal sums, df=4
    ([30, 20, 25, 27, 18, 31], [14, 22, 19, 16, 25, 21]),  # weighted, df=5
    ([5, 6], [7, 4]),                                   # df=1 (erf only)
])
def test_chi_square_dataset_matches_twin(spark, o1, o2):
    a1 = ", ".join(map(str, o1))
    a2 = ", ".join(map(str, o2))
    r = _one(spark, f'let(t=chiSquareDataSet(array({a1}), '
                    f'array({a2})), tuple('
                    'cs=getValue(t, chisquare-statistic), '
                    'p=getValue(t, p-value)))')
    stat, p = _chi2_dataset(o1, o2)
    assert abs(r["cs"] - stat) < 1e-9
    assert abs(r["p"] - p) < 1e-7


@pytest.mark.parametrize("o1,o2", [
    ([10, 9, 11, 8, 12], [11, 10, 9, 12, 8]),
    ([30, 20, 25, 27, 18, 31], [14, 22, 19, 16, 25, 21]),
])
def test_gtest_dataset_matches_twin(spark, o1, o2):
    a1 = ", ".join(map(str, o1))
    a2 = ", ".join(map(str, o2))
    r = _one(spark, f'let(t=gtestDataSet(array({a1}), array({a2})), '
                    'tuple(g=getValue(t, G-statistic), '
                    'p=getValue(t, p-value)))')
    g, p = _gtest_dataset(o1, o2)
    assert abs(r["g"] - g) < 1e-9
    assert abs(r["p"] - p) < 1e-7


def test_chi2_cdf_twin_against_independent_series():
    """The closed forms (finite Poisson sum / erf + half-integer sum)
    agree with an independent power-series regularized gamma P."""
    def series(a, x, iters=500):
        s = t = 1.0 / a
        for n in range(1, iters):
            t *= x / (a + n)
            s += t
        return math.exp(a * math.log(x) - x - math.lgamma(a)) * s

    for df in (1, 2, 3, 4, 5, 7, 10, 15):
        for x in (0.5, 1.0, 2.3, 5.0, 9.2, 20.0):
            assert abs(_chi2_cdf(x, df) - series(df / 2, x / 2)) < 2e-7
