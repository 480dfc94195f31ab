"""Round-3al ops: olsRegress/predict (OLSRegressionEvaluator.java:40
— commons-math OLSMultipleLinearRegression), the matrix form of
corr() + corrPValues (CorrelationSignificanceEvaluator.java:44,
t-test p-values via Lentz incomplete beta), monteCarlo
(MonteCarloEvaluator.java:75 — per-iteration variable redraw), and
markovChain + sample (MarkovChainEvaluator.java:58)."""

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
# olsRegress
# ---------------------------------------------------------------------------

# y = 2 + 3*x1 - x2 with a small perturbation on the last row
OBS = [(1.0, 2.0), (2.0, 1.0), (3.0, 5.0), (4.0, 3.0), (5.0, 8.0)]
YS = [3.0, 7.0, 6.0, 11.0, 9.5]


def _ols_twin(obs, ys):
    import numpy as np
    X = np.hstack([np.ones((len(obs), 1)), np.array(obs)])
    y = np.array(ys)
    xtx_inv = np.linalg.inv(X.T @ X)
    beta = xtx_inv @ (X.T @ y)
    resid = y - X @ beta
    ssr = float(resid @ resid)
    sst = float(((y - y.mean()) ** 2).sum())
    n, k = X.shape
    return {
        "beta": beta, "ssr": ssr,
        "r2": 1.0 - ssr / sst,
        "ar2": 1.0 - (ssr * (n - 1)) / (sst * (n - k)),
        "rv": sst / (n - 1),
        "se": np.sqrt(np.diag(xtx_inv) * ssr / (n - k)),
    }


def _mat(pts):
    return "matrix(" + ", ".join(
        "array(" + ", ".join(map(str, p)) + ")" for p in pts) + ")"


def test_ols_regress_matches_twin(spark):
    ys = "array(" + ", ".join(map(str, YS)) + ")"
    r = _one(spark, f'let(o=olsRegress({_mat(OBS)}, {ys}), '
                    'tuple(b=getValue(o, regressionParameters), '
                    'r2=getValue(o, RSquared), '
                    'ar2=getValue(o, adjustedRSquared), '
                    'ssr=getValue(o, residualSumSquares), '
                    'rv=getValue(o, regressandVariance), '
                    'se=getValue(o, '
                    'regressionParametersStandardErrors)))')
    w = _ols_twin(OBS, YS)
    for g, b in zip(r["b"], w["beta"]):
        assert abs(g - b) < 1e-9
    assert abs(r["r2"] - w["r2"]) < 1e-9
    assert abs(r["ar2"] - w["ar2"]) < 1e-9
    assert abs(r["ssr"] - w["ssr"]) < 1e-9
    assert abs(r["rv"] - w["rv"]) < 1e-9
    for g, s in zip(r["se"], w["se"]):
        assert abs(g - s) < 1e-9


def test_ols_predict_vector_and_matrix(spark):
    ys = "array(" + ", ".join(map(str, YS)) + ")"
    r = _one(spark, f'let(o=olsRegress({_mat(OBS)}, {ys}), '
                    'tuple(p1=predict(o, array(2.0, 2.0)), '
                    'pm=predict(o, matrix(array(2.0, 2.0), '
                    'array(4.0, 1.0)))))')
    w = _ols_twin(OBS, YS)["beta"]
    want1 = w[0] + w[1] * 2.0 + w[2] * 2.0
    want2 = w[0] + w[1] * 4.0 + w[2] * 1.0
    assert abs(r["p1"] - want1) < 1e-9
    assert abs(r["pm"][0] - want1) < 1e-9
    assert abs(r["pm"][1] - want2) < 1e-9


# ---------------------------------------------------------------------------
# corr matrix + corrPValues
# ---------------------------------------------------------------------------

COLS = [(1.0, 2.0, 10.0), (2.0, 1.0, 8.0), (3.0, 5.0, 6.0),
        (4.0, 3.0, 5.0), (5.0, 8.0, 1.0), (6.0, 6.0, 2.0)]


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    return ((sxy - sx * sy / n)
            / (math.sqrt(sxx - sx * sx / n)
               * math.sqrt(syy - sy * sy / n)))


def test_corr_matrix_is_pairwise_pearson(spark):
    r = _one(spark, f'let(c=corr({_mat(COLS)}), tuple(m=c))')
    cols = list(zip(*COLS))
    for i in range(3):
        for j in range(3):
            want = 1.0 if i == j else _pearson(cols[i], cols[j])
            assert abs(r["m"][i][j] - want) < 1e-9


def test_corr_pvalues_match_closed_forms(spark):
    """nu = n-2 = 4; independent check via the exact integer-df
    student-t tail: p2 = I_x(nu/2, 1/2). For nu=4 the closed form is
    p2 = 1 - (u (3 - u^2) / 2) with u = t/sqrt(4+t^2)... checked via
    numerical integration instead (simpler and independent)."""
    r = _one(spark, f'let(c=corr({_mat(COLS)}), '
                    'p=corrPValues(c), tuple(m=c, pv=p))')

    def t_pdf(x, nu):
        return ((math.gamma((nu + 1) / 2)
                 / (math.sqrt(nu * math.pi) * math.gamma(nu / 2)))
                * (1 + x * x / nu) ** (-(nu + 1) / 2))

    def p2_numeric(t, nu, steps=200000):
        # 2 * P(T > |t|) by Simpson over [|t|, |t|+60]
        a, b = abs(t), abs(t) + 60.0
        h = (b - a) / steps
        s = t_pdf(a, nu) + t_pdf(b, nu)
        for i in range(1, steps):
            s += t_pdf(a + i * h, nu) * (4 if i % 2 else 2)
        return 2.0 * s * h / 3.0

    nu = len(COLS) - 2
    for i in range(3):
        assert r["pv"][i][i] == 0.0
        for j in range(3):
            if i == j:
                continue
            rr = r["m"][i][j]
            t = rr * math.sqrt(nu / (1 - rr * rr))
            assert abs(r["pv"][i][j] - p2_numeric(t, nu)) < 1e-6


def test_corr_pvalues_requires_corr_matrix(spark):
    with pytest.raises(ValueError, match="corr"):
        _one(spark, 'tuple(p=corrPValues(matrix(array(1.0))))')


# ---------------------------------------------------------------------------
# monteCarlo — random by contract, laws only
# ---------------------------------------------------------------------------

def test_monte_carlo_laws(spark):
    r = _one(spark, 'tuple(mc=monteCarlo(a=sample('
                    'uniformDistribution(0.0, 1.0)), '
                    'b=sample(uniformDistribution(0.0, 1.0)), '
                    'add(a, b), 400))')
    assert len(r["mc"]) == 400
    assert all(0.0 <= v <= 2.0 for v in r["mc"])
    m = sum(r["mc"]) / len(r["mc"])
    assert abs(m - 1.0) < 0.15            # CLT-loose
    # iterations are independent draws, not one value repeated
    assert len(set(round(v, 9) for v in r["mc"])) > 300


# ---------------------------------------------------------------------------
# markovChain — deterministic transition matrices pin the walk
# ---------------------------------------------------------------------------

def test_markov_chain_deterministic_cycle(spark):
    # permutation matrix: 0 -> 1 -> 2 -> 0 ...
    r = _one(spark, 'tuple(w=sample(markovChain(matrix('
                    'array(0.0, 1.0, 0.0), array(0.0, 0.0, 1.0), '
                    'array(1.0, 0.0, 0.0)), 0), 6))')
    assert r["w"] == [1, 2, 0, 1, 2, 0]


def test_markov_chain_absorbing_state(spark):
    r = _one(spark, 'tuple(w=sample(markovChain(matrix('
                    'array(0.0, 1.0), array(0.0, 1.0)), 0), 5))')
    assert r["w"] == [1, 1, 1, 1, 1]


def test_markov_chain_requires_initial_state(spark):
    with pytest.raises(ValueError, match="initial-state"):
        _one(spark, 'tuple(w=sample(markovChain(matrix('
                    'array(0.5, 0.5), array(0.5, 0.5))), 3))')
