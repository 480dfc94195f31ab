"""Round-3u ops: array/scalar utility + string evaluators
(solrj/io/eval/: Append, CopyOf, CopyOfRange, Repeat, Ones, Zeros,
Asc, Mode, SumSq, Norm, L1Norm, LInfNorm, MeanDifference,
SumDifference, IndexOf, Ceiling, Floor, Round, Recip, Precision,
Scalar{Add,Subtract,Multiply,Divide}, Upper, Lower, Trim, Concat,
Matches, Coalesce, IsNull, NotNull)."""

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


# ---------------------------------------------------------------------------
# array assembly: append / copyOf / copyOfRange / repeat / ones / zeros
# ---------------------------------------------------------------------------

def test_append_copyof_repeat(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "la": "length(append(x, rev(x), x))",
        "co3": "valueAt(copyOf(x, 7), 3)",
        "pad": "valueAt(copyOf(copyOfRange(x, 0, 3), 5), 4)",
        "padlen": "length(copyOf(copyOfRange(x, 0, 3), 5))",
        "cr0": "valueAt(copyOfRange(x, 2, 9), 0)",
        "crlen": "length(copyOfRange(x, 2, 9))",
        "rp": "valueAt(repeat(4.25, 5), 4)",
        "on": "sumSq(ones(6))", "zr": "length(zeros(8))"})
    assert r["la"] == 3 * len(v)
    assert r["co3"] == v[3]
    assert r["pad"] == 0.0 and r["padlen"] == 5  # Arrays.copyOf zero-pad
    assert r["cr0"] == v[2] and r["crlen"] == 7
    assert r["rp"] == 4.25 and r["on"] == 6.0 and r["zr"] == 8


# ---------------------------------------------------------------------------
# asc / mode / indexOf
# ---------------------------------------------------------------------------

def test_asc_mode_indexof(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "a0": "valueAt(asc(x), 0)",
        "a3": "valueAt(asc(x), 3)",
        "md": "valueAt(mode(x), 0)",
        "mdn": "length(mode(x))",
        "io": "indexOf(x, valueAt(x, 5))",
        "iomiss": "indexOf(x, -123)"})
    sv = sorted(v)
    assert r["a0"] == sv[0] and r["a3"] == sv[3]
    from collections import Counter
    c = Counter(v)
    mc = max(c.values())
    modes = sorted(k for k, n in c.items() if n == mc)
    assert r["md"] == modes[0] and r["mdn"] == len(modes)
    assert r["io"] == v.index(v[5])
    assert r["iomiss"] == -1


# ---------------------------------------------------------------------------
# norms / differences
# ---------------------------------------------------------------------------

def test_norms_and_differences(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "sq": "sumSq(x)", "nr": "norm(x)", "l1": "l1Norm(x)",
        "li": "lInfNorm(x)",
        "mdf": "meanDifference(x, scalarMultiply(2, rev(x)))",
        "sdf": "sumDifference(x, scalarMultiply(2, rev(x)))"})
    assert r["sq"] == sum(a * a for a in v)
    assert r["nr"] == pytest.approx(math.sqrt(sum(a * a for a in v)),
                                    rel=1e-14)
    assert r["l1"] == sum(abs(a) for a in v)
    assert r["li"] == max(abs(a) for a in v)
    assert r["sdf"] == sum(v) - 2 * sum(v)
    assert r["mdf"] == pytest.approx((sum(v) - 2 * sum(v)) / len(v),
                                     rel=1e-12)


# ---------------------------------------------------------------------------
# rounding family — Math.round is floor(x+0.5), NOT half-away-from-zero
# ---------------------------------------------------------------------------

def test_rounding_family(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "ce": "valueAt(ceil(scalarDivide(3, x)), 3)",
        "fl": "valueAt(floor(scalarDivide(3, x)), 3)",
        "rn": "valueAt(round(scalarDivide(3, x)), 3)",
        "negh": "round(-2.5)",
        "rc": "valueAt(recip(x), 3)",
        "pv": "precision(variance(x), 2)"})
    assert r["ce"] == math.ceil(v[3] / 3.0)
    assert r["fl"] == math.floor(v[3] / 3.0)
    assert r["rn"] == math.floor(v[3] / 3.0 + 0.5)
    assert r["negh"] == -2.0          # Math.round(-2.5) == -2
    assert r["rc"] == 1.0 / v[3]
    n = len(v)
    var = (sum(a * a for a in v) - sum(v) ** 2 / n) / (n - 1.0)
    assert r["pv"] == math.floor(var * 100.0 + 0.5) / 100.0


def test_scalar_ops(spark):
    ev, docs = _ev(spark)
    v = _series(docs)
    r = _tuple_over_series(ev, {
        "sa": "valueAt(scalarAdd(1.5, x), 3)",
        "ss": "valueAt(scalarSubtract(1.5, x), 3)",
        "sm": "valueAt(scalarMultiply(1.5, x), 3)",
        "sd": "valueAt(scalarDivide(4, x), 3)"})
    assert r["sa"] == v[3] + 1.5
    assert r["ss"] == v[3] - 1.5
    assert r["sm"] == v[3] * 1.5
    assert r["sd"] == v[3] / 4.0


# ---------------------------------------------------------------------------
# string evaluators in select()
# ---------------------------------------------------------------------------

def test_string_evaluators_in_select(spark):
    ev, docs = _ev(spark)
    out = ev.eval('select(search(documents, q="*:*", '
                  'fl="doc_id,lang,source", sort="doc_id asc"), '
                  'doc_id, upper(lang) as u, lower(source) as l, '
                  'concat(lang, source, delim=-) as c, '
                  'if(matches(source, "a"), 1, 0) as m, '
                  'if(isNull(lang), 1, 0) as inl, '
                  'coalesce(lang, source) as co)')
    got = {r["doc_id"]: r for r in out.collect()}
    import re as _re
    for row in docs.select("doc_id", "lang", "source").collect():
        g = got[row["doc_id"]]
        assert g["u"] == row["lang"].upper()
        assert g["l"] == row["source"].lower()
        assert g["c"] == f'{row["lang"]}-{row["source"]}'
        assert g["m"] == (1 if _re.search("a", row["source"]) else 0)
        assert g["inl"] == 0
        assert g["co"] == row["lang"]


def test_matches_is_unanchored_find(spark):
    # MatchesEvaluator.java:50 uses Matcher.find() — substring search
    ev, _ = _ev(spark)
    out = ev.eval('select(search(documents, q="*:*", '
                  'fl="doc_id,lang", sort="doc_id asc"), doc_id, '
                  'if(matches(lang, "n"), 1, 0) as m)')
    rows = out.collect()
    # 'en' contains 'n' mid-string — an anchored match would miss it
    assert any(r["m"] == 1 for r in rows)


def test_trim_evaluator(spark):
    ev, _ = _ev(spark)
    out = ev.eval('select(search(documents, q="*:*", '
                  'fl="doc_id,lang", sort="doc_id asc"), doc_id, '
                  'trim(concat(lang, lang, delim= )) as t)')
    r = out.collect()[0]
    assert r["t"] == r["t"].strip()
