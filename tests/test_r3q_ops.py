"""Round-3q ops: col() value cells + math-expression array evaluators
(solrj/io/eval: ColumnEvaluator, PercentileEvaluator.java:47,
MovingAverageEvaluator.java:54, TimeDifferencingEvaluator.java:64,
DotProduct/CosineSimilarity/Reverse/ValueAt/Normalize evaluators)."""

import math

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs}), docs


def _series(docs):
    """The canonical cell: n_chars ordered by doc_id asc."""
    rows = docs.select("doc_id", "n_chars").collect()
    rows.sort(key=lambda r: r["doc_id"])
    return [float(r["n_chars"]) for r in rows]


# ---------------------------------------------------------------------------
# col() — value cell extraction (ColumnEvaluator.java)
# ---------------------------------------------------------------------------

def test_col_pulls_series_in_cell_order(spark):
    ev, docs = _ev(spark)
    out = ev.eval('let(a=search(documents, q="*:*", '
                  'fl="doc_id,n_chars", sort="doc_id asc"), '
                  'b=col(a, n_chars), '
                  'tuple(n=length(b), first=valueAt(b, 0), '
                  'last=valueAt(b, sub(length(b), 1))))')
    r = out.collect()[0]
    v = _series(docs)
    assert r["n"] == len(v)
    assert r["first"] == v[0]
    assert r["last"] == v[-1]


def test_col_requires_bound_cell_and_field(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError):
        ev.eval('let(a=search(documents, q="*:*", fl="doc_id"), '
                'tuple(x=valueAt(col(nosuch, doc_id), 0)))')


# ---------------------------------------------------------------------------
# scalar reductions: mean / stddev / percentile
# ---------------------------------------------------------------------------

def _tuple_over_series(ev, exprs):
    body = ", ".join(f"{k}={v}" for k, v in exprs.items())
    return ev.eval('let(a=search(documents, q="*:*", '
                   'fl="doc_id,n_chars", sort="doc_id asc"), '
                   f'b=col(a, n_chars), tuple({body}))').collect()[0]


def test_mean_stddev_python_twin(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {"m": "mean(b)", "sd": "stddev(b)",
                                "var": "variance(b)"})
    n = len(v)
    mean = sum(v) / n
    var = (sum(x * x for x in v) - sum(v) ** 2 / n) / (n - 1)
    assert r["m"] == pytest.approx(mean, rel=1e-12)
    assert r["var"] == pytest.approx(var, rel=1e-9)
    assert r["sd"] == pytest.approx(math.sqrt(var), rel=1e-9)


def test_percentile_legacy_interpolation(spark):
    """commons-math LEGACY: pos = p/100*(n+1), 1-indexed, linear
    interpolation — pinned against a direct python re-derivation."""
    ev, docs = _ev(spark)
    v = sorted(_series(docs))
    n = len(v)

    def legacy(p):
        pos = p / 100.0 * (n + 1)
        if n == 1 or pos < 1:
            return v[0]
        if pos >= n:
            return v[-1]
        ip = int(math.floor(pos))
        d = pos - ip
        return v[ip - 1] + d * (v[ip] - v[ip - 1])

    r = _tuple_over_series(ev, {"p25": "percentile(b, 25)",
                                "p50": "percentile(b, 50)",
                                "p75": "percentile(b, 75)",
                                "p999": "percentile(b, 99.9)"})
    for key, p in (("p25", 25), ("p50", 50), ("p75", 75),
                   ("p999", 99.9)):
        assert r[key] == pytest.approx(legacy(p), rel=1e-12), key


# ---------------------------------------------------------------------------
# array->array evaluators: movingAvg / diff / rev / zscores / ebe*
# ---------------------------------------------------------------------------

def test_moving_avg_and_diff_python_twin(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(
        ev, {"ma": "movingAvg(b, 4)", "d1": "diff(b)",
             "d2": "diff(b, 2)"})
    ma = [sum(v[i:i + 4]) / 4 for i in range(len(v) - 3)]
    assert list(r["ma"]) == pytest.approx(ma, rel=1e-12)
    assert list(r["d1"]) == pytest.approx(
        [v[i + 1] - v[i] for i in range(len(v) - 1)])
    assert list(r["d2"]) == pytest.approx(
        [v[i + 2] - v[i] for i in range(len(v) - 2)])


def test_rev_valueat_zscores(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(
        ev, {"rv": "valueAt(rev(b), 0)", "z": "zscores(b)"})
    assert r["rv"] == v[-1]
    n = len(v)
    mean = sum(v) / n
    sd = math.sqrt((sum(x * x for x in v) - sum(v) ** 2 / n) / (n - 1))
    assert list(r["z"]) == pytest.approx(
        [(x - mean) / sd for x in v], rel=1e-9)


def test_ebe_and_dot_cosine_python_twin(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(
        ev, {"dot": "dotProduct(b, rev(b))",
             "cs": "cosineSimilarity(b, rev(b))",
             "s0": "valueAt(ebeAdd(b, b), 0)",
             "m0": "valueAt(ebeMultiply(b, b), 0)"})
    w = v[::-1]
    dot = sum(x * y for x, y in zip(v, w))
    norm = math.sqrt(sum(x * x for x in v))
    assert r["dot"] == pytest.approx(dot, rel=1e-12)
    assert r["cs"] == pytest.approx(dot / (norm * norm), rel=1e-12)
    assert r["s0"] == 2 * v[0]
    assert r["m0"] == v[0] * v[0]


def test_unknown_evaluator_raises(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError):
        _tuple_over_series(ev, {"x": "frobnicate(b)"})
