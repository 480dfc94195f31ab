"""Round-3an ops: loess (LoessEvaluator.java:40 — commons-math3
LoessInterpolator.smooth with robustness passes, wrapped as the
natural-cubic spline over the smoothed series) and featureSelect
(FeatureSelectEvaluator.java:33 — labeled-matrix column selection
with recursive feature-list flattening)."""

import math

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs})


def _one(spark, expr):
    return _ev(spark).eval(expr).collect()[0]


def _loess_twin(x, y, bw, ri):
    """Independent Python port of commons-math3
    LoessInterpolator.smooth (unit user weights)."""
    n = len(x)
    if n <= 2:
        return list(y)
    k = int(bw * n)
    res, resid, rw = [0.0] * n, [0.0] * n, [1.0] * n

    def tri(d):
        t = 1.0 - d * d * d
        return t * t * t

    for it in range(ri + 1):
        left, right = 0, k - 1
        for i in range(n):
            xi = x[i]
            if i > 0 and right + 1 < n \
                    and x[right + 1] - xi < xi - x[left]:
                left += 1
                right += 1
            edge = left if xi - x[left] > x[right] - xi else right
            sw = sx = sxx = sy = sxy = 0.0
            den = abs(1.0 / (x[edge] - xi))
            for j in range(left, right + 1):
                d = (xi - x[j]) if j < i else (x[j] - xi)
                w = tri(d * den) * rw[j]
                xw = x[j] * w
                sw += w
                sx += xw
                sxx += x[j] * xw
                sy += y[j] * w
                sxy += y[j] * xw
            mx, my = sx / sw, sy / sw
            mxy, mxx = sxy / sw, sxx / sw
            beta = (0.0 if math.sqrt(abs(mxx - mx * mx)) < 1e-12
                    else (mxy - mx * my) / (mxx - mx * mx))
            res[i] = beta * xi + (my - beta * mx)
            resid[i] = abs(y[i] - res[i])
        if it == ri:
            break
        med = sorted(resid)[n // 2]
        if med == 0.0:
            break
        for i in range(n):
            a = resid[i] / (6.0 * med)
            rw[i] = 0.0 if a >= 1.0 else (1.0 - a * a) ** 2
    return res


_X = [0.0, 0.7, 1.1, 2.4, 3.0, 3.3, 4.9, 5.2, 6.0, 7.5, 8.1, 9.4]
_Y = [1.0, 2.2, 2.9, 4.1, 5.2, 14.0, 6.8, 8.1, 9.0, 10.2, 10.9,
      12.1]


def _arr(vals):
    return "array(" + ", ".join(map(str, vals)) + ")"


def test_loess_nonuniform_x_matches_twin(spark):
    row = _one(spark,
               f"let(l=loess({_arr(_X)}, {_arr(_Y)}, bandwidth=0.5, "
               "robustIterations=2), tuple(s=l))")
    tw = _loess_twin(_X, _Y, 0.5, 2)
    assert [round(v, 9) for v in row["s"]] \
        == [round(v, 9) for v in tw]


def test_loess_default_params(spark):
    # defaults bandwidth=0.25 (k=3), robustIterations=2
    row = _one(spark, f"let(l=loess({_arr(_Y)}), tuple(s=l))")
    tw = _loess_twin([float(i) for i in range(len(_Y))], _Y,
                     0.25, 2)
    assert [round(v, 9) for v in row["s"]] \
        == [round(v, 9) for v in tw]


def test_loess_zero_robust_iterations(spark):
    row = _one(spark,
               f"let(l=loess({_arr(_Y)}, bandwidth=0.5, "
               "robustIterations=0), tuple(s=l))")
    tw = _loess_twin([float(i) for i in range(len(_Y))], _Y,
                     0.5, 0)
    assert [round(v, 9) for v in row["s"]] \
        == [round(v, 9) for v in tw]


def test_loess_outlier_is_downweighted(spark):
    # robustness passes must pull the smoothed value at the outlier
    # (i=5, y=14.0) well below the plain pass
    plain = _one(spark,
                 f"let(l=loess({_arr(_Y)}, bandwidth=0.5, "
                 "robustIterations=0), tuple(s=l))")["s"][5]
    rob = _one(spark,
               f"let(l=loess({_arr(_Y)}, bandwidth=0.5, "
               "robustIterations=2), tuple(s=l))")["s"][5]
    assert rob < plain - 0.5


def test_loess_predict_interpolates_smoothed_knots(spark):
    # LoessInterpolator.interpolate = SplineInterpolator over
    # (x, smooth(x, y)): the spline passes through the SMOOTHED
    # values at the knots
    row = _one(spark,
               f"let(l=loess({_arr(_Y)}, bandwidth=0.5, "
               "robustIterations=2), "
               "tuple(s=l, p=predict(l, 4.0)))")
    assert row["p"] == pytest.approx(row["s"][4], abs=1e-9)


def test_loess_bad_bandwidth_raises(spark):
    with pytest.raises(Exception, match="bandwidth"):
        _one(spark, f"let(l=loess({_arr(_Y)}, bandwidth=1.5), "
             "tuple(s=l))")


_FS_BASE = (
    'let(a=select(top(search(documents, q="*:*", fl="doc_id,text", '
    'sort="doc_id asc"), n=20, sort="doc_id asc"), '
    'doc_id as id, analyze(text) as terms), '
    'm=termVectors(a, minTermLength=4, minDocFreq=0.05, '
    'maxDocFreq=0.9), {body})')


def test_featureselect_subset_in_matrix_order(spark):
    row = _one(spark, _FS_BASE.format(
        body='f=featureSelect(m, topFeatures(m, 2)), '
             'tuple(sel=getColumnLabels(f), allc=getColumnLabels(m),'
             ' tf=topFeatures(m, 2))'))
    sel, allc = list(row["sel"]), list(row["allc"])
    want = {t for feats in row["tf"] for t in feats}
    # selection = the flattened top-feature set, in the matrix's
    # own column order (FeatureSelectEvaluator keeps label order)
    assert sel == [t for t in allc if t in want]


def test_featureselect_literal_flat_list(spark):
    row = _one(spark, _FS_BASE.format(
        body='f=featureSelect(m, array("merge", "zzzz")), '
             'tuple(sel=getColumnLabels(f), '
             'r0=rowAt(f, 0), rl=getRowLabels(f))'))
    # 'merge' survives the df gates in this corpus; zzzz does not
    # exist -> exactly the intersection is kept
    assert list(row["sel"]) == ["merge"]
    assert len(row["r0"]) == 1
    assert len(row["rl"]) == 20


def test_featureselect_unlabeled_matrix_raises(spark):
    with pytest.raises(Exception, match="column labels"):
        _one(spark,
             'let(f=featureSelect(matrix(array(1.0, 2.0)), '
             'array("a")), tuple(x=getColumnLabels(f)))')
