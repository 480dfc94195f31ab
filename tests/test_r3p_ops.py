"""Round-3p ops: reduce()/group(), list(), null(), echo() streams."""

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs}), docs


# ---------------------------------------------------------------------------
# reduce()/group() (ReducerStream.java:31, GroupOperation.java:108)
# ---------------------------------------------------------------------------

def test_reduce_group_python_twin(spark):
    ev, docs = _ev(spark)
    rows = ev.eval('reduce(search(documents, q="*:*", '
                   'fl="doc_id,lang,n_chars", sort="lang asc"), '
                   'by="lang", group(sort="n_chars desc", n=3))').collect()

    data = [(r["doc_id"], r["lang"], r["n_chars"])
            for r in docs.select("doc_id", "lang", "n_chars").collect()]
    groups = {}
    for doc_id, lang, n_chars in data:
        groups.setdefault(lang, []).append((doc_id, n_chars))

    got = {r["lang"]: r for r in rows}
    assert set(got) == set(groups)
    for lang, members in groups.items():
        # comparator: n_chars desc; tie-break doc_id asc (documented)
        members.sort(key=lambda t: (-t[1], t[0]))
        top = members[:3]
        r = got[lang]
        # emitted tuple carries the comparator-best member's fields
        assert (r["doc_id"], r["n_chars"]) == top[0]
        # the group list is rank-ordered and bounded by n
        grp = [(g["rk"], g["doc_id"], g["n_chars"]) for g in r["group"]]
        assert grp == [(i + 1, d, n) for i, (d, n) in enumerate(top)]


def test_reduce_requires_group_op(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError):
        ev.eval('reduce(search(documents, q="*:*"), by="lang")')
    with pytest.raises(ValueError):
        ev.eval('reduce(search(documents, q="*:*"), by="lang", '
                'group(sort="n_chars desc", n=0))')


# ---------------------------------------------------------------------------
# list() (ListStream.java:36)
# ---------------------------------------------------------------------------

def test_list_concatenates_with_null_fill(spark):
    ev, docs = _ev(spark)
    out = ev.eval('list(facet(documents, q="*:*", buckets="lang", '
                  'count(*)), facet(documents, q="*:*", '
                  'buckets="source", count(*)))')
    rows = out.collect()
    n_lang = docs.select("lang").distinct().count()
    n_src = docs.select("source").distinct().count()
    assert len(rows) == n_lang + n_src
    leg0 = [r for r in rows if r["_list_src"] == 0]
    leg1 = [r for r in rows if r["_list_src"] == 1]
    assert len(leg0) == n_lang and len(leg1) == n_src
    # missing fields read as null per leg
    assert all(r["source"] is None for r in leg0)
    assert all(r["lang"] is None for r in leg1)
    # counts cover the corpus on both legs
    total = docs.count()
    assert sum(r["count"] for r in leg0) == total
    assert sum(r["count"] for r in leg1) == total


def test_list_needs_a_stream(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError):
        ev.eval("list()")


# ---------------------------------------------------------------------------
# null() / echo()
# ---------------------------------------------------------------------------

def test_null_counts_tuples(spark):
    ev, docs = _ev(spark)
    rows = ev.eval('null(search(documents, q="*:*"))').collect()
    assert len(rows) == 1
    assert rows[0]["nullCount"] == docs.count()


def test_echo_one_tuple(spark):
    ev, _ = _ev(spark)
    rows = ev.eval('echo("hello world")').collect()
    assert [r["echo"] for r in rows] == ["hello world"]
