"""Round-4b laws: ValueSourceParser registry closure.

Pinned reference semantics:
- LinearFloatFunction: val*slope + intercept; ReciprocalFloatFunction:
  a/(m*x+b) (both ValueSourceParser.java registrations).
- mod: DualFloatFunction a % b (Java fmod, sign of the dividend).
- MultiBoolFunction xor (ValueSourceParser.java "xor"): true iff the
  operands are MIXED — at least one true AND at least one false (NOT
  parity, NOT exactly-one).
- VectorDistanceFunction / SquaredEuclideanFunction: the source list
  splits first-half vs second-half (getMultiValueSources); odd counts
  raise; p=1 Manhattan, p=2 Euclidean, p<=0 unsupported here.
- HaversineFunction.java:70: (radius, convertFlag, y1, x1, y2, x2),
  the SOLR-2114 required convert flag parsed as a boolean word.
- StringDistanceFunction 'edit' (LevenshteinDistance.java:106):
  1 - lev/max(len) with both-empty -> 1, one-empty -> 0; jw/ngram
  raise (no portable twin).
- DateValueSourceParser ms(): 0 args = the request's fixed NOW, 1 =
  the instant, 2 = difference; NOW-anchored math needs the ctx now.
- Every other registered name (geodist/ord/rord/top/cscore/currency/
  geohash/ghhsin/joindf/vector/childfield/payload/agg*/testfunc/
  sleep/threadid) dispatches to a typed error naming the implementing
  surface — the registry-closure law.
"""

import math

import duckdb
import pytest

from lucene_solr_spark.search.funcparser import (FuncParseError,
                                                 compile_sql,
                                                 parse_func)


def _v(expr, cols=None, ctx=None):
    sql = compile_sql(parse_func(expr), cols or {}, ctx)
    return duckdb.sql(f"SELECT {sql} AS v").fetchone()[0]


def test_linear_and_recip_association():
    assert _v("linear(5, 2, 3)") == 13.0
    assert _v("recip(2, 3, 1, 4)") == pytest.approx(0.1)


def test_mod_keeps_dividend_sign():
    assert _v("mod(7.5, 2)") == 1.5
    assert _v("mod(sub(0, 7.5), 2)") == -1.5      # Java % semantics


def test_constants():
    assert _v("pi()") == pytest.approx(math.pi, abs=0)
    assert _v("e()") == pytest.approx(math.e, abs=0)
    assert _v("true()") == 1.0 and _v("false()") == 0.0


def test_bool_family():
    assert _v("not(0)") == 1.0 and _v("not(0.5)") == 0.0
    assert _v("and(1, 2, 3)") == 1.0 and _v("and(1, 0, 3)") == 0.0
    assert _v("or(0, 0)") == 0.0 and _v("or(0, 4)") == 1.0


def test_xor_is_mixed_not_parity():
    # MultiBoolFunction "xor": nTrue != 0 && nFalse != 0
    assert _v("xor(1, 0)") == 1.0
    assert _v("xor(1, 1)") == 0.0
    assert _v("xor(0, 0)") == 0.0
    assert _v("xor(1, 1, 0)") == 1.0      # parity would say 0
    assert _v("xor(1, 1, 1)") == 0.0      # exactly-one would differ too


def test_vector_distances_split_halves():
    assert _v("sqedist(1, 2, 4, 6)") == 25.0          # (1,2) vs (4,6)
    assert _v("dist(1, 1, 2, 4, 6)") == 7.0
    assert _v("dist(2, 1, 2, 4, 6)") == 5.0
    assert _v("dist(3, 0, 0, 1, 1)") == pytest.approx(2 ** (1 / 3))
    with pytest.raises(FuncParseError, match="even"):
        _v("sqedist(1, 2, 3)")
    with pytest.raises(FuncParseError, match="power"):
        _v("dist(0, 1, 2, 3, 4)")


def test_haversine_quarter_circle():
    # 0N0E -> 0N90E is a quarter of the great circle
    got = _v("hsin(6371.0088, true, 0, 0, 0, 90)")
    assert got == pytest.approx(6371.0088 * math.pi / 2, rel=1e-12)
    # already-radians form: convert flag false
    got2 = _v(f"hsin(1, false, 0, 0, 0, {math.pi / 2})")
    assert got2 == pytest.approx(math.pi / 2, rel=1e-12)


def test_strdist_edit_and_empty_branches():
    assert _v("strdist('kitten', 'sitting', edit)") == \
        pytest.approx(1 - 3 / 7)
    assert _v("strdist('', '', edit)") == 1.0
    assert _v("strdist('a', '', edit)") == 0.0
    with pytest.raises(FuncParseError, match="jw"):
        _v("strdist('a', 'b', jw)")


def test_concat_and_literal():
    assert _v("concat('a', 'b')") == "ab"
    assert _v("concat(literal('x'), 'y')") == "xy"
    cols = {"f": "'q'"}
    assert _v("concat(f, '!')", cols) == "q!"


def test_ms_datemath_and_now():
    day = 86_400_000.0
    assert _v("ms('2020-01-02T00:00:00Z', '2020-01-01T00:00:00Z')") \
        == day
    assert _v("ms('2026-01-02T00:00:00Z/DAY+3HOURS', "
              "'2026-01-01T00:00:00Z')") == day + 3 * 3_600_000
    now = {("now", "", ""): 1_000_000.0}
    assert _v("ms()", ctx=now) == 1_000_000.0
    assert _v("ms('NOW+1DAY')", ctx=now) == 1_000_000.0 + day
    with pytest.raises(FuncParseError, match="now"):
        _v("ms('NOW/DAY')")
    with pytest.raises(FuncParseError):
        _v("ms(1, 2, 3)", cols={"1": "x"})


def test_query_boost_scale_via_ctx():
    ctx = {("query", "foo", ""): "2.5"}
    assert _v("sum(query('foo'), 1)", ctx=ctx) == 3.5
    assert _v("boost('foo', 2)", ctx=ctx) == 5.0
    sctx = {("scale", "f", ""): ("0.0", "10.0")}
    assert _v("scale(f, 0, 1)", cols={"f": "5.0"}, ctx=sctx) == 0.5
    # ScaleFloatFunction association: (x-min)*((u-l)/(max-min))+l
    assert _v("scale(f, 10, 30)", cols={"f": "5.0"}, ctx=sctx) == 20.0
    with pytest.raises(FuncParseError, match="ctx"):
        _v("query('bar')")
    with pytest.raises(FuncParseError, match="min"):
        _v("scale(f, 0, 1)", cols={"f": "1.0"})


def test_registry_closure_typed_errors():
    for expr, frag in [
        ("geodist(1, 2, 3, 4)", "q_geo_distance"),
        ("ord(f)", "q_func_ord"),
        ("rord(f)", "q_func_ord"),
        ("top(f)", "q_func_ord"),
        ("cscore()", "collapse"),
        ("currency(f)", "currency"),
        ("geohash(1, 2)", "geohash"),
        ("ghhsin(1, 'a', 'b')", "q_geo_distance"),
        ("joindf(a, b)", "q_xc_join"),
        ("vector(1, 2)", "dist"),
        ("childfield(f)", "q_block_join"),
        ("payload(f, t)", "q_payload"),
        ("agg_hll(f)", "facet"),
        ("agg_percentile(f, 50)", "facet"),
        ("testfunc(1)", "test"),
        ("sleep(1, 2)", "debug"),
        ("threadid()", "debug"),
    ]:
        with pytest.raises(FuncParseError, match=frag):
            _v(expr, cols={"f": "1.0", "a": "1.0", "b": "1.0",
                           "t": "'x'"})
