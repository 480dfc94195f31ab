"""Round-3aq ops: empiricalDistribution
(EmpiricalDistributionEvaluator.java:33 — commons-math bin-kernel
cdf) and multiVariateNormalDistribution
(MultiVariateNormalDistributionEvaluator.java:33 — 2-D density +
Cholesky sample)."""

import math

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs})


def _one(spark, expr):
    return _ev(spark).eval(expr).collect()[0]


def _arr(vals):
    return "array(" + ", ".join(repr(float(v)) for v in vals) + ")"


def _ers(z):
    t = 1.0 / (1.0 + 0.3275911 * abs(z))
    y = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
          - 0.284496736) * t + 0.254829592) * t
    e = 1.0 - y * math.exp(-(abs(z) * abs(z)))
    return -e if z < 0 else e


def _emp_cdf_twin(x, data, B):
    s = sorted(data)
    n, mn, mx = len(s), s[0], s[-1]
    delta = (mx - mn) / B
    if x < mn:
        return 0.0
    if x >= mx:
        return 1.0

    def bi(v):
        return min(max(math.ceil((v - mn) / delta) - 1, 0), B - 1)

    i = bi(x)
    binv = [v for v in s if bi(v) == i]
    nb = len(binv)
    pbm = sum(1 for v in s if bi(v) < i) / n
    if nb == 0:
        # engine rule: empty probe bin -> the left limit pBminus
        # (the reference's commons-math returns NaN here)
        return pbm
    m = sum(binv) / nb
    var = ((sum(v * v for v in binv) - sum(binv) ** 2 / nb)
           / (nb - 1) if nb > 1 else 0.0)
    lo = mn if i == 0 else mn + delta * i
    hi = mx if i == B - 1 else mn + delta * (i + 1)
    if nb <= 1 or var <= 0:
        def K(z):
            return 0.0 if z < m else 1.0
    else:
        sd = math.sqrt(var)

        def K(z):
            return 0.5 * (1 + _ers((z - m) / (sd * math.sqrt(2))))

    return pbm + (nb / n) * (K(x) - K(lo)) / (K(hi) - K(lo))


D1 = [0.5, 1.0, 1.2, 1.7, 2.2, 2.8, 3.1, 3.3, 3.9, 4.4,
      4.8, 5.5, 6.1, 6.4, 7.2, 7.7, 8.3, 8.9, 9.6, 10.0]
# second series with a single-value bin (constant kernel): bin 2 of
# 3 over [0, 9] holds only 7.9
D2 = [0.0, 0.5, 1.1, 1.6, 2.3, 2.9, 4.1, 7.9, 9.0]


def test_empirical_cdf_matches_twin(spark):
    ed = f"empiricalDistribution({_arr(D1)}, 4)"
    probes = [0.6, 1.9, 3.05, 5.4, 7.69, 9.99]
    body = ", ".join(f"p{i}=cumulativeProbability({ed}, {x!r})"
                     for i, x in enumerate(probes))
    row = _one(spark, f"tuple({body})")
    for i, x in enumerate(probes):
        assert row[f"p{i}"] == pytest.approx(
            _emp_cdf_twin(x, D1, 4), abs=1e-9), x


def test_empirical_constant_kernel_bin(spark):
    ed = f"empiricalDistribution({_arr(D2)}, 3)"
    # probe inside the single-value bin [6, 9): constant kernel at
    # 7.9 -> 0 before the point, jumps after
    row = _one(spark, f"tuple(lo=cumulativeProbability({ed}, 6.5), "
               f"hi=cumulativeProbability({ed}, 8.2))")
    assert row["lo"] == pytest.approx(
        _emp_cdf_twin(6.5, D2, 3), abs=1e-9)
    assert row["hi"] == pytest.approx(
        _emp_cdf_twin(8.2, D2, 3), abs=1e-9)
    assert row["lo"] < row["hi"]


def test_empirical_bounds(spark):
    ed = f"empiricalDistribution({_arr(D1)}, 4)"
    row = _one(spark, f"tuple(a=cumulativeProbability({ed}, 0.4), "
               f"b=cumulativeProbability({ed}, 10.0), "
               f"c=cumulativeProbability({ed}, 11.0))")
    assert row["a"] == 0.0
    assert row["b"] == 1.0
    assert row["c"] == 1.0


def test_empirical_default_bins(spark):
    ed = f"empiricalDistribution({_arr(D1)})"
    row = _one(spark, f"tuple(p=cumulativeProbability({ed}, 5.0))")
    assert row["p"] == pytest.approx(
        _emp_cdf_twin(5.0, D1, 99), abs=1e-9)


MVN = ("multiVariateNormalDistribution(array(1.0, 2.0), "
       "matrix(array(2.0, 0.5), array(0.5, 1.0)))")


def _mvn_twin(x, mu, cov):
    (a, b), (c, d) = cov
    det = a * d - b * c
    dx, dy = x[0] - mu[0], x[1] - mu[1]
    q = (d * dx * dx - (b + c) * dx * dy + a * dy * dy) / det
    return math.exp(-0.5 * q) / (2 * math.pi * math.sqrt(det))


def test_mvn_density_matches_twin(spark):
    row = _one(spark, f"tuple(d1=density({MVN}, array(1.5, 2.5)), "
               f"d2=density({MVN}, array(-1.0, 0.5)))")
    cov = [[2.0, 0.5], [0.5, 1.0]]
    assert row["d1"] == pytest.approx(
        _mvn_twin([1.5, 2.5], [1, 2], cov), abs=1e-12)
    assert row["d2"] == pytest.approx(
        _mvn_twin([-1.0, 0.5], [1, 2], cov), abs=1e-12)


def test_mvn_sample_law(spark):
    # random draws: pin the law, not values — sample means near mu
    # (n=200, sd of the mean ~ 0.1, allow 5 sigma)
    row = _one(spark, f"tuple(s=sample({MVN}, 200))")
    xs = [v[0] for v in row["s"]]
    ys = [v[1] for v in row["s"]]
    assert len(row["s"]) == 200
    assert sum(xs) / 200 == pytest.approx(1.0, abs=0.5)
    assert sum(ys) / 200 == pytest.approx(2.0, abs=0.35)


def test_mvn_higher_dim_literal_raises(spark):
    with pytest.raises(Exception, match="2-D"):
        _one(spark, "tuple(d=density(multiVariateNormalDistribution("
             "array(1.0, 2.0, 3.0), matrix(array(1.0, 0.0, 0.0), "
             "array(0.0, 1.0, 0.0), array(0.0, 0.0, 1.0))), "
             "array(1.0, 2.0, 3.0)))")


def test_mvn_cumulative_probability_raises(spark):
    with pytest.raises(Exception, match="multivariate"):
        _one(spark, f"tuple(p=cumulativeProbability({MVN}, 1.0))")
