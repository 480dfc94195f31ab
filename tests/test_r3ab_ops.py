"""Round-3ab ops: moving-window / pair-sort / finddelay evaluators
(solrj/io/eval/MovingMedianEvaluator.java:37,
MovingMADEvaluator.java:36, PairSortEvaluator.java:37,
FindDelayEvaluator.java:40) — sliding-window statistics, lexicographic
pair sorting into a matrix, and cross-correlation delay estimation."""

import statistics

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs}), docs


def _series(docs, n=60):
    rows = docs.select("doc_id", "n_chars").collect()
    rows.sort(key=lambda r: r["doc_id"])
    return [float(r["n_chars"]) for r in rows][:n]


def _tuple_over_series(ev, exprs):
    body = ", ".join(f"{k}={v}" for k, v in exprs.items())
    return ev.eval('let(a=search(documents, q="*:*", '
                   'fl="doc_id,n_chars", sort="doc_id asc"), '
                   f'x=col(a, n_chars), tuple({body}))').collect()[0]


def _legacy_median4(win):
    """commons-math LEGACY percentile 50 on a 4-element window:
    pos = 0.5*(n+1) = 2.5 -> midpoint of 2nd and 3rd order stats."""
    s = sorted(win)
    return s[1] + 0.5 * (s[2] - s[1])


# ---------------------------------------------------------------------------
# movingMedian
# ---------------------------------------------------------------------------

def test_moving_median_windows_and_length(spark):
    ev, docs = _ev(spark)
    v = _series(docs, 60)
    r = _tuple_over_series(ev, {
        "m0": "valueAt(movingMedian(copyOfRange(x, 0, 60), 4), 0)",
        "m5": "valueAt(movingMedian(copyOfRange(x, 0, 60), 4), 5)",
        "ln": "length(movingMedian(copyOfRange(x, 0, 60), 4))"})
    assert r["ln"] == 57  # n-w+1: ramp-up suppressed
    assert r["m0"] == _legacy_median4(v[0:4])
    assert r["m5"] == _legacy_median4(v[5:9])


def test_moving_median_odd_window_is_exact_mid(spark):
    ev, docs = _ev(spark)
    v = _series(docs, 20)
    r = _tuple_over_series(ev, {
        "m": "valueAt(movingMedian(copyOfRange(x, 0, 20), 5), 3)"})
    assert r["m"] == statistics.median(v[3:8])


# ---------------------------------------------------------------------------
# movingMAD
# ---------------------------------------------------------------------------

def test_moving_mad_matches_mean_absolute_deviation(spark):
    ev, docs = _ev(spark)
    v = _series(docs, 30)
    r = _tuple_over_series(ev, {
        "d0": "valueAt(movingMAD(copyOfRange(x, 0, 30), 4), 0)",
        "d9": "valueAt(movingMAD(copyOfRange(x, 0, 30), 4), 9)",
        "ln": "length(movingMAD(copyOfRange(x, 0, 30), 4))"})
    assert r["ln"] == 27

    def mad(win):
        m = sum(win) / len(win)
        return sum(abs(d - m) for d in win) / len(win)

    assert r["d0"] == pytest.approx(mad(v[0:4]), abs=1e-9)
    assert r["d9"] == pytest.approx(mad(v[9:13]), abs=1e-9)


# ---------------------------------------------------------------------------
# pairSort
# ---------------------------------------------------------------------------

def test_pairsort_sorts_by_x_then_y(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "x0": "valueAt(rowAt(pairSort(array(3, 1, 3, 2), "
              "array(9, 8, 7, 6)), 0), 0)",
        "y0": "valueAt(rowAt(pairSort(array(3, 1, 3, 2), "
              "array(9, 8, 7, 6)), 1), 0)",
        # tied x=3 pairs order by y: (3,7) before (3,9)
        "y2": "valueAt(rowAt(pairSort(array(3, 1, 3, 2), "
              "array(9, 8, 7, 6)), 1), 2)",
        "y3": "valueAt(rowAt(pairSort(array(3, 1, 3, 2), "
              "array(9, 8, 7, 6)), 1), 3)"})
    assert (r["x0"], r["y0"]) == (1.0, 8.0)
    assert (r["y2"], r["y3"]) == (7.0, 9.0)


# ---------------------------------------------------------------------------
# finddelay
# ---------------------------------------------------------------------------

def test_finddelay_finds_embedded_signal_offset(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "d1": "finddelay(array(1, 2, 3, 9, 3, 2, 1, 0, 0, 0), "
              "array(1, 2, 3))",
        "d2": "finddelay(array(0, 0, 1, 5, 1), array(1, 5, 1))",
        "d0": "finddelay(array(4, 7, 1, 0, 0), array(4, 7, 1))"})
    assert r["d1"] == 1.0  # b best-matches a shifted by 1
    assert r["d2"] == 2.0
    assert r["d0"] == 0.0  # aligned at the head


def test_finddelay_first_max_tie_rule(spark):
    """Two equal |conv| peaks -> the FIRST index wins (strict >
    scan, FindDelayEvaluator.java:66)."""
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "d": "finddelay(array(1, 0, 0, 1), array(1))"})
    # conv = [1,0,0,1]; both peaks |1|, first at 0-based idx 0
    # -> (0+1) - 1 = 0
    assert r["d"] == 0.0
