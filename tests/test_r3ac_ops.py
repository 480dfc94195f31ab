"""Round-3ac ops: scalar trig / utility evaluators
(solrj/io/eval/{Sine,ArcSine,HyperbolicSine,Cosine,ArcCosine,
HyperbolicCosine,Tangent,ArcTangent,HyperbolicTangent,CubedRoot,
ExclusiveOr,Trunc,Split,Date,Conversion,RawValue,Append,Natural,
ColumnAt,Uuid}Evaluator.java) plus the lowercase l1norm/l2norm/
linfnorm and standardize Lang.java registrations."""

import math
import re

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs}), docs


def _tuple_over_series(ev, exprs):
    body = ", ".join(f"{k}={v}" for k, v in exprs.items())
    return ev.eval('let(a=search(documents, q="*:*", '
                   'fl="doc_id,n_chars", sort="doc_id asc"), '
                   f'x=col(a, n_chars), tuple({body}))').collect()[0]


def _series(docs, n=10):
    rows = docs.select("doc_id", "n_chars").collect()
    rows.sort(key=lambda r: r["doc_id"])
    return [float(r["n_chars"]) for r in rows][:n]


# ---------------------------------------------------------------------------
# trig family — each matches the java.lang.Math twin
# ---------------------------------------------------------------------------

def test_trig_family_matches_libm(spark):
    ev, docs = _ev(spark)
    v = _series(docs, 3)
    r = _tuple_over_series(ev, {
        "sn": "sin(div(valueAt(x, 0), 1000))",
        "cs": "cos(div(valueAt(x, 0), 1000))",
        "tn": "tan(div(valueAt(x, 0), 10000))",
        "asn": "asin(div(1, valueAt(x, 0)))",
        "acs": "acos(div(1, valueAt(x, 0)))",
        "atn": "atan(div(valueAt(x, 0), 1000))",
        "sh": "sinh(div(valueAt(x, 0), 10000))",
        "ch": "cosh(div(valueAt(x, 0), 10000))",
        "th": "tanh(div(valueAt(x, 0), 1000))",
        "cb": "cbrt(valueAt(x, 0))"})
    x = v[0]
    assert r["sn"] == pytest.approx(math.sin(x / 1000), abs=1e-15)
    assert r["cs"] == pytest.approx(math.cos(x / 1000), abs=1e-15)
    assert r["tn"] == pytest.approx(math.tan(x / 10000), abs=1e-15)
    assert r["asn"] == pytest.approx(math.asin(1 / x), abs=1e-15)
    assert r["acs"] == pytest.approx(math.acos(1 / x), abs=1e-15)
    assert r["atn"] == pytest.approx(math.atan(x / 1000), abs=1e-15)
    assert r["sh"] == pytest.approx(math.sinh(x / 10000), abs=1e-15)
    assert r["ch"] == pytest.approx(math.cosh(x / 10000), abs=1e-15)
    assert r["th"] == pytest.approx(math.tanh(x / 1000), abs=1e-15)
    assert r["cb"] == pytest.approx(x ** (1 / 3), rel=1e-12)


# ---------------------------------------------------------------------------
# eor — exactly one true (ExclusiveOrEvaluator.java counts trues == 1)
# ---------------------------------------------------------------------------

def test_eor_exactly_one_true(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "one": "if(eor(gt(1, 0), gt(0, 1)), 1, 0)",
        "two": "if(eor(gt(1, 0), gt(2, 1)), 1, 0)",
        "none": "if(eor(gt(0, 1), gt(1, 2)), 1, 0)",
        "three_one": "if(eor(gt(0, 1), gt(1, 0), gt(0, 2)), 1, 0)"})
    assert r["one"] == 1       # T,F -> exactly one
    assert r["two"] == 0       # T,T -> two trues (plain xor would say 0 too,
    assert r["none"] == 0      # F,F
    assert r["three_one"] == 1  # F,T,F


def test_eor_three_trues_is_false_not_parity(spark):
    # 3 trues: parity-xor would be true; the reference's count==1 is false
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "t3": "if(eor(gt(1, 0), gt(2, 0), gt(3, 0)), 1, 0)"})
    assert r["t3"] == 0


def test_eor_requires_two_values(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError):
        _tuple_over_series(ev, {"e": "if(eor(gt(1, 0)), 1, 0)"})


# ---------------------------------------------------------------------------
# trunc / split — string ops
# ---------------------------------------------------------------------------

def test_trunc_is_prefix_substring(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {"t": 'trunc(val("analytics"), 4)'})
    assert r["t"] == "anal"[:4] == "analytics"[:4]


def test_split_keeps_trailing_empties(spark):
    # String.split(p, -1): "a,b,,c,".split(",", -1) -> 5 tokens
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "n": 'length(split(val("a,b,,c,"), ","))',
        "mid": 'valueAt(split(val("a,b,,c,"), ","), 2)',
        "last": 'valueAt(split(val("a,b,,c,"), ","), 4)'})
    assert r["n"] == 5
    assert r["mid"] == ""
    assert r["last"] == ""


# ---------------------------------------------------------------------------
# dateTime — SimpleDateFormat parse + fixed UTC ISO re-format
# ---------------------------------------------------------------------------

def test_datetime_reformats_to_utc_iso(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "d": 'dateTime(val("2021-07-04 10:30:00"), '
             '"yyyy-MM-dd HH:mm:ss")'})
    assert r["d"] == "2021-07-04T10:30:00Z"


def test_datetime_honors_source_timezone(spark):
    # third operand names the PARSE zone; output stays UTC
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "d": 'dateTime(val("2021-07-04 10:30:00"), '
             '"yyyy-MM-dd HH:mm:ss", "America/New_York")'})
    assert r["d"] == "2021-07-04T14:30:00Z"  # EDT = UTC-4


# ---------------------------------------------------------------------------
# convert — the verbatim length-factor table
# ---------------------------------------------------------------------------

def test_convert_factor_table(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "mi": "convert(miles, kilometers, 10)",
        "inmm": "convert(inches, millimeters, 2)",
        "ftm": "convert(feet, meters, 10)",
        "kmft": "convert(kilometers, feet, 2)"})
    assert r["mi"] == 10 * 1.61
    assert r["inmm"] == 2 * 25.4
    assert r["ftm"] == 10 * 0.30
    assert r["kmft"] == 2 * 3280.8


def test_convert_unsupported_pair_raises(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError):
        _tuple_over_series(ev, {"x": "convert(miles, inches, 1)"})


# ---------------------------------------------------------------------------
# val / addAll / natural / colAt
# ---------------------------------------------------------------------------

def test_val_literal_promotion(spark):
    # RawValueEvaluator.init: Integer -> Long, Float -> Double
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "i": "val(7)", "f": "val(2.5)", "s": 'val("seven")'})
    assert r["i"] == 7 and isinstance(r["i"], int)
    assert r["f"] == 2.5 and isinstance(r["f"], float)
    assert r["s"] == "seven"


def test_addall_concatenates_in_order(spark):
    ev, docs = _ev(spark)
    v = _series(docs, 10)
    r = _tuple_over_series(ev, {
        "n": "length(addAll(copyOfRange(x, 0, 4), "
             "copyOfRange(x, 4, 10)))",
        "s": "l1norm(addAll(copyOfRange(x, 0, 4), "
             "copyOfRange(x, 4, 10)))",
        "first": "valueAt(addAll(copyOfRange(x, 0, 4), "
                 "copyOfRange(x, 4, 10)), 0)",
        "fifth": "valueAt(addAll(copyOfRange(x, 0, 4), "
                 "copyOfRange(x, 4, 10)), 4)"})
    assert r["n"] == 10
    assert r["s"] == sum(abs(t) for t in v)
    assert r["first"] == v[0]
    assert r["fifth"] == v[4]


def test_natural_is_zero_based_range(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "n": "length(natural(5))",
        "first": "valueAt(natural(5), 0)",
        "last": "valueAt(natural(5), 4)",
        "empty": "length(natural(0))",
        "sum": "l1norm(natural(10))"})
    assert r["n"] == 5
    assert r["first"] == 0 and r["last"] == 4
    assert r["empty"] == 0
    assert r["sum"] == 45.0


def test_colat_extracts_matrix_column(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "c0": "l1norm(colAt(matrix(array(3, 1, 4), array(1, 5, 9)), 0))",
        "c1": "l1norm(colAt(matrix(array(3, 1, 4), array(1, 5, 9)), 1))",
        "c2": "l1norm(colAt(matrix(array(3, 1, 4), array(1, 5, 9)), 2))"})
    assert r["c0"] == 3 + 1
    assert r["c1"] == 1 + 5
    assert r["c2"] == 4 + 9


# ---------------------------------------------------------------------------
# uuid — random by contract: pin only the format law
# ---------------------------------------------------------------------------

def test_uuid_format(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {"u": "uuid()"})
    assert re.match(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}"
                    r"-[0-9a-f]{4}-[0-9a-f]{12}$", r["u"])


# ---------------------------------------------------------------------------
# lowercase Lang.java aliases
# ---------------------------------------------------------------------------

def test_lowercase_norm_aliases_match(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "a1": "l1norm(copyOfRange(x, 0, 8))",
        "b1": "l1Norm(copyOfRange(x, 0, 8))",
        "a2": "l2norm(copyOfRange(x, 0, 8))",
        "b2": "norm(copyOfRange(x, 0, 8))",
        "ai": "linfnorm(copyOfRange(x, 0, 8))",
        "bi": "lInfNorm(copyOfRange(x, 0, 8))"})
    assert r["a1"] == r["b1"]
    assert r["a2"] == r["b2"]
    assert r["ai"] == r["bi"]


def test_standardize_is_zscores_alias(spark):
    ev, _ = _ev(spark)
    r = _tuple_over_series(ev, {
        "s": "valueAt(standardize(copyOfRange(x, 0, 12)), 3)",
        "z": "valueAt(zscores(copyOfRange(x, 0, 12)), 3)"})
    assert r["s"] == r["z"]
