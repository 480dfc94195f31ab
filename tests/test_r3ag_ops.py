"""Round-3ag ops: Lang.java second-name stream aliases
(export/gatherNodes/knnSearch/stream), OuterHashJoinStream.java:48,
SelectStream ReplaceOperation (solrj/io/ops/ReplaceWithValueOperation
.java:77 matchesOriginal + ReplaceWithFieldOperation), reduce() with
DistinctOperation.java:49, and the var/double/long scalar evaluators
(Lang.java:176,296,297)."""

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "id long, lv string")
    right = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (9, 90.0)], "id long, rv double")
    return StreamEvaluator({"L": left, "R": right})


def _docs_ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs}), docs


# ---------------------------------------------------------------------------
# outerHashJoin (OuterHashJoinStream.java:48)
# ---------------------------------------------------------------------------

def test_outer_hash_join_keeps_unmatched_left(spark):
    ev = _ev(spark)
    rows = ev.eval('outerHashJoin(search(L, q="*:*", fl="id,lv", '
                   'sort="id asc"), hashed=search(R, q="*:*", '
                   'fl="id,rv", sort="id asc"), on="id")').collect()
    got = sorted((r["id"], r["lv"], r["rv"]) for r in rows)
    assert got == [(1, "a", 10.0), (2, "b", 20.0),
                   (3, "c", None), (4, None, None)]


def test_outer_hash_join_broadcasts_hashed_side(spark):
    ev = _ev(spark)
    df = ev.eval('outerHashJoin(search(L, q="*:*", fl="id,lv", '
                 'sort="id asc"), hashed=search(R, q="*:*", '
                 'fl="id,rv", sort="id asc"), on="id")')
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Lang.java alias registrations — same class, second name
# ---------------------------------------------------------------------------

def test_export_is_shuffle_alias(spark):
    ev, docs = _docs_ev(spark)
    a = ev.eval('export(documents, q="*:*", fl="doc_id,lang", '
                'sort="doc_id asc", partitionKeys="lang")')
    b = ev.eval('shuffle(documents, q="*:*", fl="doc_id,lang", '
                'sort="doc_id asc", partitionKeys="lang")')
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))
    assert a.count() == docs.count()


def test_stream_is_get_alias(spark):
    ev, _ = _docs_ev(spark)
    rows = ev.eval(
        'let(a=search(documents, q="*:*", fl="doc_id", '
        'sort="doc_id asc"), top(stream(a), n=3, '
        'sort="doc_id asc"))').collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]


def test_gather_nodes_and_knn_search_dispatch(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    # same underlying implementations (Lang.java registers both
    # names on GatherNodesStream / KnnStream)
    ev = StreamEvaluator({})
    # knnSearch routes into _s_knn: same missing-mlt guard
    ev2 = StreamEvaluator({"documents": None})
    with pytest.raises(ValueError, match="mlt callable"):
        ev2.eval('knnSearch(documents, id="1", k=5)')
    # gatherNodes routes into _s_nodes: same unknown-collection guard
    with pytest.raises((ValueError, KeyError)):
        ev.eval('gatherNodes(missing, walk="a->b", gather="b")')


# ---------------------------------------------------------------------------
# replace ops in select() (ReplaceWithValue/ReplaceWithField)
# ---------------------------------------------------------------------------

def test_replace_value_match_with_value(spark):
    ev = _ev(spark)
    rows = ev.eval('select(search(L, q="*:*", fl="id,lv", '
                   'sort="id asc"), id, lv, '
                   'replace(lv, b, withValue="B"))').collect()
    assert sorted((r["id"], r["lv"]) for r in rows) == [
        (1, "a"), (2, "B"), (3, "c"), (4, None)]


def test_replace_null_with_value(spark):
    ev = _ev(spark)
    rows = ev.eval('select(search(L, q="*:*", fl="id,lv", '
                   'sort="id asc"), id, lv, '
                   'replace(lv, null, withValue="missing"))').collect()
    assert sorted((r["id"], r["lv"]) for r in rows) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "missing")]


def test_replace_with_field_and_numeric_original(spark):
    ev = _ev(spark)
    rows = ev.eval('select(search(R, q="*:*", fl="id,rv", '
                   'sort="id asc"), id, rv, '
                   'replace(rv, 90.0, withField=id))').collect()
    got = {r["id"]: r["rv"] for r in rows}
    assert got == {1: 10.0, 2: 20.0, 9: 9.0}


def test_replace_aliased_two_operand_form(spark):
    ev = _ev(spark)
    rows = ev.eval('select(search(L, q="*:*", fl="id,lv", '
                   'sort="id asc"), id, lv, '
                   'replace(null, withValue="x") as lv)').collect()
    assert sorted((r["id"], r["lv"]) for r in rows) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "x")]


def test_replace_requires_with_param(spark):
    ev = _ev(spark)
    with pytest.raises(ValueError, match="withValue"):
        ev.eval('select(search(L, q="*:*", fl="id,lv", '
                'sort="id asc"), id, lv, replace(lv, b))')


# ---------------------------------------------------------------------------
# reduce() with distinct() (DistinctOperation.java:49)
# ---------------------------------------------------------------------------

def test_reduce_distinct_keeps_one_tuple_per_group(spark):
    ev, docs = _docs_ev(spark)
    rows = ev.eval('reduce(search(documents, q="*:*", '
                   'fl="doc_id,lang,n_chars", sort="lang asc"), '
                   'by="lang", distinct())').collect()
    data = [(r["doc_id"], r["lang"], r["n_chars"])
            for r in docs.select("doc_id", "lang", "n_chars").collect()]
    want = {}
    for doc_id, lang, n_chars in data:
        # deterministic "first": remaining columns ascending
        key = (doc_id, n_chars)
        if lang not in want or key < want[lang]:
            want[lang] = key
    got = {r["lang"]: (r["doc_id"], r["n_chars"]) for r in rows}
    assert got == want
    assert len(rows) == len(want)


# ---------------------------------------------------------------------------
# var / double / long evaluators
# ---------------------------------------------------------------------------

def test_var_alias_matches_variance(spark):
    ev = _ev(spark)
    a = ev.eval('tuple(v=var(array(1, 2, 3, 4, 5)), '
                'w=variance(array(1, 2, 3, 4, 5)))').collect()[0]
    assert a["v"] == a["w"] == 2.5     # commons-math sample variance


def test_double_and_long_casts(spark):
    ev = _ev(spark)
    r = ev.eval('tuple(d=double("3"), l=long(3.9), '
                'da=double(array(1, 2)), la=long(array(1.7, 2.2)))'
                ).collect()[0]
    assert r["d"] == 3.0 and isinstance(r["d"], float)
    assert r["l"] == 3 and isinstance(r["l"], int)
    assert r["da"] == [1.0, 2.0]
    assert r["la"] == [1, 2]
