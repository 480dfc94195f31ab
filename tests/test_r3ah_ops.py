"""Round-3ah ops: zplot stream (ZplotStream.java:123 vector/table/
heat/dist modes), PivotEvaluator.java:45, Set/GetValueEvaluator,
MemsetEvaluator.java:115 + LetStream.java:198 var merging,
Put/Get/Remove/ListCacheEvaluator (the StreamContext object cache),
RecNumEvaluator.java:39 in select(), and CosineDistanceEvaluator
.java:56 as a distance() marker."""

import math

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs}), docs


def _one(spark, expr):
    ev, _ = _ev(spark)
    return ev.eval(expr).collect()[0]


# ---------------------------------------------------------------------------
# cosine distance marker (CosineDistanceEvaluator.java:56)
# ---------------------------------------------------------------------------

def test_cosine_distance_matches_twin(spark):
    a, b = [1.0, 2.0, 3.0], [4.0, -5.0, 6.0]
    r = _one(spark, 'tuple(d=distance(array(1.0, 2.0, 3.0), '
                    'array(4.0, -5.0, 6.0), cosine()))')
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    assert r["d"] == round(1 - abs(dot / (na * nb)), 8)


# ---------------------------------------------------------------------------
# pivot (PivotEvaluator.java:45)
# ---------------------------------------------------------------------------

def test_pivot_builds_labeled_matrix(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    t = spark.createDataFrame(
        [("b", "q", 2.0), ("a", "p", 1.0), ("a", "q", 5.0),
         ("a", "q", 7.0)],                # duplicate (a,q)
        "x string, y string, v double")
    ev = StreamEvaluator({"t": t})
    r = ev.eval(
        'let(c=cell(c, search(t, q="*:*", fl="x,y,v", '
        'sort="x asc")), m=pivot(c, x, y, v), '
        'tuple(rows=getRowLabels(m), cols=getColumnLabels(m), '
        'd=m))').collect()[0]
    assert r["rows"] == ["a", "b"]
    assert r["cols"] == ["p", "q"]
    # duplicate (a,q): LAST tuple in sorted order wins -> 7.0;
    # missing (b,p) -> 0.0
    assert r["d"] == [[1.0, 7.0], [0.0, 2.0]]


# ---------------------------------------------------------------------------
# setValue / getValue (Set/GetValueEvaluator.java:44)
# ---------------------------------------------------------------------------

def test_set_and_get_value_on_tuple_cells(spark):
    r = _one(spark,
             'let(a=tuple(x=1, y="foo"), b=setValue(a, y, "bar"), '
             'c=setValue(b, z, add(2, 3)), '
             'tuple(ax=getValue(a, x), ay=getValue(a, y), '
             'cy=getValue(c, y), cz=getValue(c, z)))')
    assert (r["ax"], r["ay"]) == (1, "foo")     # original untouched
    assert (r["cy"], r["cz"]) == ("bar", 5)


def test_get_value_requires_tuple_cell(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError, match="tuple cell"):
        ev.eval('let(a=search(documents, q="*:*", fl="doc_id", '
                'sort="doc_id asc"), tuple(v=getValue(a, doc_id)))')


# ---------------------------------------------------------------------------
# memset (MemsetEvaluator.java:115; LetStream.java:198 putAll)
# ---------------------------------------------------------------------------

def test_memset_binds_vars_as_arrays(spark):
    ev, docs = _ev(spark)
    r = ev.eval(
        'let(a=memset(search(documents, q="*:*", '
        'fl="doc_id,n_chars", sort="doc_id asc"), '
        'cols="doc_id,n_chars", vars="d,p"), '
        'tuple(n=length(d), m=mean(p), d0=valueAt(d, 0)))'
    ).collect()[0]
    rows = sorted((x["doc_id"], x["n_chars"])
                  for x in docs.select("doc_id", "n_chars").collect())
    assert r["n"] == len(rows)
    assert abs(r["m"] - sum(n for _, n in rows) / len(rows)) < 1e-9
    assert r["d0"] == rows[0][0]


def test_memset_size_caps_in_tuple_order(spark):
    ev, docs = _ev(spark)
    r = ev.eval(
        'let(a=memset(search(documents, q="*:*", fl="doc_id", '
        'sort="doc_id asc"), cols="doc_id", vars="d", size=5), '
        'tuple(n=length(d), s=add(d)))').collect()[0]
    ids = sorted(x["doc_id"] for x in docs.select("doc_id").collect())
    assert r["n"] == 5


def test_memset_validates_cols_vars(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError, match="same size"):
        ev.eval('let(a=memset(search(documents, q="*:*", '
                'fl="doc_id"), cols="doc_id,lang", vars="d"), '
                'tuple(n=length(d)))')


# ---------------------------------------------------------------------------
# object cache (Put/Get/Remove/ListCacheEvaluator)
# ---------------------------------------------------------------------------

def test_cache_put_get_list_remove_across_expressions(spark):
    ev, _ = _ev(spark)
    r1 = ev.eval('tuple(p=putCache(w, k1, array(1, 2, 3)))').collect()[0]
    assert r1["p"] == [1, 2, 3]
    r2 = ev.eval('tuple(g=getCache(w, k1), l=listCache(w), '
                 's=listCache())').collect()[0]
    assert r2["g"] == [1, 2, 3]
    assert r2["l"] == ["k1"] and r2["s"] == ["w"]
    r3 = ev.eval('tuple(r=removeCache(w, k1))').collect()[0]
    assert r3["r"] == [1, 2, 3]
    r4 = ev.eval('tuple(g=getCache(w, k1), r=removeCache(w, k1), '
                 'l=listCache(w))').collect()[0]
    assert r4["g"] is None and r4["r"] is False and r4["l"] == []


# ---------------------------------------------------------------------------
# recNum in select (RecNumEvaluator.java:39)
# ---------------------------------------------------------------------------

def test_recnum_is_zero_based_sequence(spark):
    ev, docs = _ev(spark)
    rows = ev.eval('select(search(documents, q="*:*", '
                   'fl="doc_id,lang", sort="doc_id asc"), '
                   'doc_id, lang, recNum() as rn)').collect()
    want = sorted((x["doc_id"], x["lang"])
                  for x in docs.select("doc_id", "lang").collect())
    got = sorted((r["doc_id"], r["lang"], r["rn"]) for r in rows)
    assert [(d, l) for d, l, _ in got] == want
    assert [rn for _, _, rn in got] == list(range(len(want)))


# ---------------------------------------------------------------------------
# zplot (ZplotStream.java:123)
# ---------------------------------------------------------------------------

def test_zplot_vectors_with_auto_x(spark):
    ev, _ = _ev(spark)
    rows = (ev.eval('zplot(y=array(5.5, 6.5, 7.5))')
            .orderBy("x").collect())
    assert [(r["x"], r["y"]) for r in rows] == [
        (0, 5.5), (1, 6.5), (2, 7.5)]


def test_zplot_vectors_two_arrays(spark):
    ev, _ = _ev(spark)
    rows = (ev.eval('zplot(x=array(10, 20), y=array(1.5, 2.5))')
            .orderBy("x").collect())
    assert [(r["x"], r["y"]) for r in rows] == [(10, 1.5), (20, 2.5)]


def test_zplot_table_with_and_without_labels(spark):
    ev, _ = _ev(spark)
    rows = (ev.eval('zplot(table=matrix(array(1.0, 2.0), '
                    'array(3.0, 4.0)))')
            .orderBy("rowLabel").collect())
    assert rows[0]["rowLabel"] == "0"
    assert (rows[0]["col0"], rows[0]["col1"]) == (1.0, 2.0)
    assert (rows[1]["col0"], rows[1]["col1"]) == (3.0, 4.0)
    rows = (ev.eval(
        'zplot(table=setColumnLabels(setRowLabels(matrix('
        'array(1.0, 2.0), array(3.0, 4.0)), array(r1, r2)), '
        'array(c1, c2)))').orderBy("rowLabel").collect())
    assert [r["rowLabel"] for r in rows] == ["r1", "r2"]
    assert rows[1]["c2"] == 4.0


def test_zplot_heat_long_form_with_padded_fallbacks(spark):
    ev, _ = _ev(spark)
    rows = (ev.eval('zplot(heat=matrix(array(1.0, 2.0), '
                    'array(3.0, 4.0)))')
            .orderBy("y", "x").collect())
    assert [(r["y"], r["x"], r["z"]) for r in rows] == [
        ("row0", "col0", 1.0), ("row0", "col1", 2.0),
        ("row1", "col0", 3.0), ("row1", "col1", 4.0)]


def test_zplot_heat_pad_widths(spark):
    """12 rows -> 2-wide zero padding (ZplotStream.pad thresholds)."""
    ev, _ = _ev(spark)
    arrs = ", ".join(f"array({i}.0)" for i in range(12))
    rows = ev.eval(f'zplot(heat=matrix({arrs}))').collect()
    ys = sorted({r["y"] for r in rows})
    assert ys[0] == "row00" and ys[-1] == "row11"


def test_zplot_dist_freq_table(spark):
    ev, _ = _ev(spark)
    rows = (ev.eval('zplot(dist=freqTable(array(1, 1, 2, 3, 3, 3)))')
            .orderBy("x").collect())
    assert [(r["x"], round(r["y"], 9)) for r in rows] == [
        (1, round(2 / 6, 9)), (2, round(1 / 6, 9)),
        (3, round(3 / 6, 9))]


def test_zplot_mode_guards(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError, match="only the kmeans|kmeans"):
        ev.eval('zplot(clusters=x)')
    with pytest.raises(ValueError, match="only parameter"):
        ev.eval('zplot(table=matrix(array(1.0)), y=array(1.0))')
    # a _Dist operand is rejected before reaching the dist branch
    # (the reference's RealDistribution mode draws 500k random
    # samples — nondeterministic, not reproduced)
    with pytest.raises(ValueError, match="distribution"):
        ev.eval('zplot(dist=normalDistribution(0.0, 1.0))')
