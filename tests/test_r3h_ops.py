"""Round-3h ops: evaluator select, let/get cells, stats stream,
tf-idf keyword extraction."""

import math

import pytest

SF = "/root/testdata/sf0.001"


def _mk_eval(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    return StreamEvaluator(
        {"documents": spark.read.parquet(f"{SF}/documents.parquet")})


# ---------------------------------------------------------------------------
# evaluator select (solrj/io/eval RecursiveEvaluator family)
# ---------------------------------------------------------------------------

def test_eval_select_arithmetic_twin(spark):
    ev = _mk_eval(spark)
    out = ev.eval('select(search(documents, q="*:*", '
                  'fl="doc_id,n_chars"), doc_id, n_chars, '
                  'add(n_chars, 10) as plus10, '
                  'sub(mult(n_chars, 2), mod(n_chars, 7)) as mixed, '
                  'div(n_chars, 2) as half, abs(sub(0, n_chars)) as ab, '
                  'if(gt(n_chars, 300), 1, 0) as is_long)').collect()
    assert out
    for r in out:
        n = r["n_chars"]
        assert r["plus10"] == n + 10
        assert r["mixed"] == 2 * n - (n % 7)
        assert r["half"] == n / 2.0
        assert r["ab"] == n
        assert r["is_long"] == (1 if n > 300 else 0)


def test_eval_select_boolean_and_math(spark):
    ev = _mk_eval(spark)
    out = ev.eval('select(search(documents, q="*:*", '
                  'fl="doc_id,n_chars"), doc_id, n_chars, '
                  'and(gt(n_chars, 100), lt(n_chars, 400)) as mid, '
                  'or(lteq(n_chars, 100), gteq(n_chars, 400)) as notmid, '
                  'not(eq(n_chars, 0)) as nonzero, '
                  'log(n_chars) as ln_n, sqrt(n_chars) as rt_n, '
                  'pow(n_chars, 2) as sq_n)').collect()
    for r in out:
        n = r["n_chars"]
        assert r["mid"] == (100 < n < 400)
        assert r["notmid"] == (not r["mid"])
        assert r["nonzero"] is True
        assert math.isclose(r["ln_n"], math.log(n), rel_tol=1e-12)
        assert math.isclose(r["rt_n"], math.sqrt(n), rel_tol=1e-12)
        assert r["sq_n"] == n * n


def test_eval_select_unknown_evaluator_raises(spark):
    ev = _mk_eval(spark)
    with pytest.raises(ValueError, match="unknown evaluator"):
        ev.eval('select(search(documents, q="*:*", fl="doc_id"), '
                'bogus(doc_id) as x)')


# ---------------------------------------------------------------------------
# let / get (LetStream.java, GetStream.java)
# ---------------------------------------------------------------------------

def test_let_binds_cells_and_get_replays(spark):
    ev = _mk_eval(spark)
    out = ev.eval(
        'let(a=top(search(documents, q="*:*", fl="doc_id,n_chars"), '
        'n=10, sort="n_chars desc, doc_id asc"), '
        'b=top(search(documents, q="*:*", fl="doc_id,lang"), n=30, '
        'sort="doc_id asc"), '
        'innerJoin(get(a), get(b), on="doc_id"))').collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    top10 = sorted(docs, key=lambda r: (-r["n_chars"], r["doc_id"]))[:10]
    first30 = {r["doc_id"] for r in sorted(
        docs, key=lambda r: r["doc_id"])[:30]}
    want = {r["doc_id"] for r in top10 if r["doc_id"] in first30}
    assert {r["doc_id"] for r in out} == want


def test_let_later_cell_sees_earlier_and_scope_pops(spark):
    ev = _mk_eval(spark)
    out = ev.eval(
        'let(a=search(documents, q="*:*", fl="doc_id,n_chars"), '
        'b=top(get(a), n=5, sort="n_chars desc, doc_id asc"), '
        'get(b))').collect()
    assert len(out) == 5
    # cells do not leak out of the let()
    with pytest.raises(ValueError, match="no such let cell"):
        ev.eval("get(b)")


# ---------------------------------------------------------------------------
# stats stream (StatsStream.java)
# ---------------------------------------------------------------------------

def test_stats_stream_one_tuple(spark):
    ev = _mk_eval(spark)
    rows = ev.eval('stats(documents, q="*:*", count(*), '
                   'sum(n_chars), avg(n_chars), min(n_chars), '
                   'max(n_chars))').collect()
    assert len(rows) == 1
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    ns = [r["n_chars"] for r in docs]
    r = rows[0]
    assert r["count"] == len(ns)
    assert r["sum_n_chars"] == sum(ns)
    assert math.isclose(r["avg_n_chars"], sum(ns) / len(ns),
                        rel_tol=1e-12)
    assert r["min_n_chars"] == min(ns)
    assert r["max_n_chars"] == max(ns)


def test_stats_stream_respects_q(spark):
    ev = _mk_eval(spark)
    r = ev.eval('stats(documents, q="lang:en", count(*))').collect()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert r["count"] == docs.filter("lang = 'en'").count()


# ---------------------------------------------------------------------------
# tfidf_keywords
# ---------------------------------------------------------------------------

def test_tfidf_keywords_python_twin(spark):
    from lucene_solr_spark.analysis.analyzers import simple_tokenize
    from lucene_solr_spark.textops.ops import tfidf_keywords
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = docs.select("doc_id", "text").collect()
    tf, dfreq = {}, {}
    for r in rows:
        per = {}
        for t in simple_tokenize(r["text"]):
            per[t] = per.get(t, 0) + 1
        tf[r["doc_id"]] = per
        for t in per:
            dfreq[t] = dfreq.get(t, 0) + 1
    n = float(len(rows))

    got = {}
    for r in tfidf_keywords(docs, k=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["score"]))
    assert set(got) == set(tf)
    for d, per in tf.items():
        scored = sorted(
            ((round(c * math.log(n / dfreq[t]), 6), t)
             for t, c in per.items()),
            key=lambda x: (-x[0], x[1]))[:3]
        want = [(i + 1, t, s) for i, (s, t) in enumerate(scored)]
        assert sorted(got[d]) == want
