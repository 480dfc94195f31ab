"""Round-3s ops: cell / hashRollup / eval / plot stream decorators
(solrj/io/stream/CellStream.java:42, HashRollupStream.java:41,
EvalStream.java:40, PlotStream.java)."""

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark, extra=None):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    colls = {"documents": docs}
    if extra:
        colls.update(extra)
    return StreamEvaluator(colls), docs


# ---------------------------------------------------------------------------
# cell() — whole-tuple cells (CellStream.java:42)
# ---------------------------------------------------------------------------

def test_cell_emits_one_tuple_with_all_rows(spark):
    ev, docs = _ev(spark)
    out = ev.eval('cell(c, search(documents, q="*:*", '
                  'fl="doc_id,lang", sort="doc_id asc"))')
    rows = out.collect()
    assert len(rows) == 1
    cell = rows[0]["c"]
    assert len(cell) == docs.count()
    # ascending-by-all-columns order convention -> doc_id ascending
    ids = [t["doc_id"] for t in cell]
    assert ids == sorted(ids)
    # tuples carry exactly the selected fields
    assert set(cell[0].asDict()) == {"doc_id", "lang"}


def test_cell_requires_name_and_single_stream(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError):
        ev.eval('cell(search(documents, q="*:*", fl="doc_id"))')


# ---------------------------------------------------------------------------
# hashRollup() — RollupStream semantics without the sort contract
# ---------------------------------------------------------------------------

def test_hashrollup_equals_rollup(spark):
    ev, _ = _ev(spark)
    a = ev.eval('hashRollup(search(documents, q="*:*", '
                'fl="lang,n_chars", sort="lang asc"), '
                'over="lang", count(*), sum(n_chars))')
    b = ev.eval('rollup(search(documents, q="*:*", '
                'fl="lang,n_chars", sort="lang asc"), '
                'over="lang", count(*), sum(n_chars))')
    ra = sorted((r["lang"], r["count"], r["sum_n_chars"])
                for r in a.collect())
    rb = sorted((r["lang"], r["count"], r["sum_n_chars"])
                for r in b.collect())
    assert ra == rb and len(ra) > 1


def test_hashrollup_matches_groupby_twin(spark):
    ev, docs = _ev(spark)
    out = ev.eval('hashRollup(search(documents, q="*:*", '
                  'fl="source,n_chars", sort="source asc"), '
                  'over="source", count(*), max(n_chars))')
    got = {r["source"]: (r["count"], r["max_n_chars"])
           for r in out.collect()}
    tw = {}
    for r in docs.select("source", "n_chars").collect():
        c, m = tw.get(r["source"], (0, -1))
        tw[r["source"]] = (c + 1, max(m, r["n_chars"]))
    assert got == tw


# ---------------------------------------------------------------------------
# eval() — expressions as data (EvalStream.java:40)
# ---------------------------------------------------------------------------

def test_eval_runs_stored_expression(spark):
    ev, docs = _ev(spark)
    exprs = spark.createDataFrame(
        [("q1", 'hashRollup(search(documents, q="*:*", '
                'fl="lang,n_chars", sort="lang asc"), '
                'over="lang", count(*))')],
        "id string, expr_s string")
    ev2, _ = _ev(spark, {"exprs": exprs})
    out = ev2.eval('eval(search(exprs, q="*:*", fl="expr_s", '
                   'sort="expr_s asc"))')
    got = {r["lang"]: r["count"] for r in out.collect()}
    tw = {r["lang"]: r["cnt"] for r in
          docs.groupBy("lang").count()
          .withColumnRenamed("count", "cnt").collect()}
    assert got == tw


def test_eval_requires_expr_s_field(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError):
        ev.eval('eval(search(documents, q="*:*", fl="doc_id", '
                'sort="doc_id asc"))')


def test_eval_empty_stream_raises(spark):
    exprs_schema = "id string, expr_s string"
    ev, _ = _ev(spark, {"exprs":
                        __import__("pyspark").sql.SparkSession
                        .getActiveSession()
                        .createDataFrame([], exprs_schema)})
    with pytest.raises(ValueError):
        ev.eval('eval(search(exprs, q="*:*", fl="expr_s", '
                'sort="expr_s asc"))')


# ---------------------------------------------------------------------------
# plot() — zipped x/y pairs (PlotStream.java)
# ---------------------------------------------------------------------------

def test_plot_zips_value_cells(spark):
    ev, docs = _ev(spark)
    out = ev.eval('let(a=search(documents, q="*:*", '
                  'fl="doc_id,n_chars", sort="doc_id asc"), '
                  'x=col(a, n_chars), '
                  'plot(type=scatter, x=x, y=rev(x)))')
    row = out.collect()[0]
    assert row["plot"] == "scatter"
    rows = docs.select("doc_id", "n_chars").collect()
    rows.sort(key=lambda r: r["doc_id"])
    v = [float(r["n_chars"]) for r in rows]
    data = [(p[0], p[1]) for p in row["data"]]
    assert data == list(zip(v, v[::-1]))


def test_plot_array_literals_and_missing_axis(spark):
    ev, _ = _ev(spark)
    out = ev.eval('plot(type=line, x=array(1,2,3), y=array(9,8,7))')
    row = out.collect()[0]
    assert row["plot"] == "line"
    assert [(p[0], p[1]) for p in row["data"]] == \
        [(1.0, 9.0), (2.0, 8.0), (3.0, 7.0)]
    with pytest.raises(ValueError):
        ev.eval('plot(type=line, x=array(1,2,3))')
