"""Round-3ao ops: gaussfit (GaussFitEvaluator.java:40) and
harmfit/harmonicFit (HarmonicFitEvaluator.java:40) with the
getAmplitude/getAngularFrequency/getPhase context accessors,
derivative/integrate closed forms on the new _VFunc kinds."""

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


GY = [5.0 * math.exp(-((i - 6.0) ** 2) / 8.0) for i in range(13)]
HX = [i * 0.25 for i in range(40)]
HY = [2.5 * math.cos(1.2 * x + 0.5) for x in HX]


def test_gaussfit_exact_data_recovers_parameters(spark):
    row = _one(spark, f"let(g=gaussfit({_arr(GY)}), "
               "tuple(f=g, p=predict(g, 4.5)))")
    for got, want in zip(row["f"], GY):
        assert got == pytest.approx(want, abs=1e-9)
    assert row["p"] == pytest.approx(
        5.0 * math.exp(-((4.5 - 6.0) ** 2) / 8.0), abs=1e-9)


def test_gaussfit_noisy_data_converges_near(spark):
    noisy = [y + 0.01 * math.cos(7.0 * i)
             for i, y in enumerate(GY)]
    row = _one(spark, f"let(g=gaussfit({_arr(noisy)}), "
               "tuple(p=predict(g, 6.0)))")
    assert row["p"] == pytest.approx(5.0, abs=0.05)


def test_gaussfit_integrate_erf_antiderivative(spark):
    row = _one(spark, f"let(g=gaussfit({_arr(GY)}), "
               "tuple(ig=integrate(g, 2.0, 10.0)))")
    want = (5.0 * 2.0 * math.sqrt(math.pi / 2.0)
            * (math.erf((10.0 - 6.0) / (2.0 * math.sqrt(2.0)))
               - math.erf((2.0 - 6.0) / (2.0 * math.sqrt(2.0)))))
    # A&S 7.1.26 erf: |eps| <= 1.5e-7 per call
    assert row["ig"] == pytest.approx(want, abs=1e-5)


def test_gaussfit_derivative_raises(spark):
    with pytest.raises(Exception, match="gaussfit"):
        _one(spark, f"let(g=gaussfit({_arr(GY)}), "
             "tuple(d=predict(derivative(g), 1.0)))")


def test_harmfit_exact_data_recovers_triple(spark):
    row = _one(spark,
               f"let(h=harmfit({_arr(HX)}, {_arr(HY)}), "
               "tuple(a=getAmplitude(h), w=getAngularFrequency(h), "
               "ph=getPhase(h)))")
    assert row["a"] == pytest.approx(2.5, abs=1e-9)
    assert row["w"] == pytest.approx(1.2, abs=1e-9)
    assert row["ph"] == pytest.approx(0.5, abs=1e-9)


def test_harmfit_canonical_gauge(spark):
    # data generated with a NEGATIVE amplitude: the canonical fit
    # flips to a>0 with the phase shifted by pi (wrapped to (-pi,pi])
    ys = [-2.5 * math.cos(1.2 * x + 0.5) for x in HX]
    row = _one(spark,
               f"let(h=harmfit({_arr(HX)}, {_arr(ys)}), "
               "tuple(a=getAmplitude(h), w=getAngularFrequency(h), "
               "ph=getPhase(h)))")
    assert row["a"] == pytest.approx(2.5, abs=1e-9)
    assert row["w"] == pytest.approx(1.2, abs=1e-9)
    assert row["ph"] == pytest.approx(0.5 + math.pi - 2 * math.pi,
                                      abs=1e-9)


def test_harmfit_y_only_form(spark):
    # y-only form: x = 0..n-1 (HarmonicFitEvaluator's 1-arg branch)
    ys = [1.5 * math.cos(0.8 * i - 0.3) for i in range(50)]
    row = _one(spark, f"let(h=harmfit({_arr(ys)}), "
               "tuple(a=getAmplitude(h), w=getAngularFrequency(h), "
               "ph=getPhase(h)))")
    assert row["a"] == pytest.approx(1.5, abs=1e-9)
    assert row["w"] == pytest.approx(0.8, abs=1e-9)
    assert row["ph"] == pytest.approx(-0.3, abs=1e-9)


def test_harmfit_derivative_and_integral_closed_forms(spark):
    row = _one(spark,
               f"let(h=harmfit({_arr(HX)}, {_arr(HY)}), "
               "tuple(d=predict(derivative(h), 1.7), "
               "ig=integrate(h, 0.5, 2.0)))")
    assert row["d"] == pytest.approx(
        -2.5 * 1.2 * math.sin(1.2 * 1.7 + 0.5), abs=1e-9)
    want = (2.5 / 1.2) * (math.sin(1.2 * 2.0 + 0.5)
                          - math.sin(1.2 * 0.5 + 0.5))
    assert row["ig"] == pytest.approx(want, abs=1e-9)


def test_harmfit_let_cell_preserves_context(spark):
    # the _VFunc materialized through a let cell must still expose
    # amplitude/angularFrequency/phase (rebuilt from the coef triple)
    row = _one(spark,
               f"let(h=harmfit({_arr(HX)}, {_arr(HY)}), "
               "x=tuple(a=getAmplitude(h)), "
               "tuple(a2=getAmplitude(h), p=predict(h, 0.0)))")
    assert row["a2"] == pytest.approx(2.5, abs=1e-9)
    assert row["p"] == pytest.approx(2.5 * math.cos(0.5), abs=1e-9)


def test_get_amplitude_on_non_harmonic_raises(spark):
    with pytest.raises(Exception, match="harmonic"):
        _one(spark, f"let(g=gaussfit({_arr(GY)}), "
             "tuple(a=getAmplitude(g)))")
