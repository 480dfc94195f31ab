"""Round-3x ops: daemon / priority / executor stream decorators
(solrj/io/stream/DaemonStream.java:57, PriorityStream.java:36,
ExecutorStream.java:53) — the scheduling third of the streaming API:
background re-run registration, two-level topic scheduling, and
jobs-as-data execution."""

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.analyzers import simple_tokens_col
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    def text_search(coll, term):
        return (docs
                .where(F.array_contains(simple_tokens_col(), term))
                .select("doc_id"))

    exprs = spark.createDataFrame(
        [("j1", 'search(documents, q="text:merge", fl="doc_id", '
                'sort="doc_id asc")'),
         ("j2", 'search(documents, q="text:join", fl="doc_id", '
                'sort="doc_id asc")')],
        "id string, expr_s string")
    return StreamEvaluator({"documents": docs, "exprs": exprs},
                           text_search=text_search), docs


def _count(ev, term):
    return ev.eval(f'search(documents, q="text:{term}", fl="doc_id", '
                   'sort="doc_id asc")').count()


# ---------------------------------------------------------------------------
# priority — scheduling, not merging
# ---------------------------------------------------------------------------

def test_priority_high_nonempty_emits_only_high(spark):
    ev, _ = _ev(spark)
    hi = 'search(documents, q="text:merge", fl="doc_id", sort="doc_id asc")'
    lo = 'search(documents, q="*:*", fl="doc_id", sort="doc_id asc")'
    out = ev.eval(f"priority({hi}, {lo})")
    hi_ids = {r["doc_id"] for r in ev.eval(hi).collect()}
    assert {r["doc_id"] for r in out.collect()} == hi_ids
    # a doc matching ONLY the low stream must not appear
    lo_only = {r["doc_id"] for r in ev.eval(lo).collect()} - hi_ids
    assert lo_only and not (lo_only & {r["doc_id"] for r in out.collect()})


def test_priority_falls_through_when_high_empty(spark):
    ev, _ = _ev(spark)
    hi = ('search(documents, q="text:zzzabsentterm", fl="doc_id", '
          'sort="doc_id asc")')
    lo = 'search(documents, q="text:join", fl="doc_id", sort="doc_id asc")'
    out = ev.eval(f"priority({hi}, {lo})")
    assert out.count() == _count(ev, "join") > 0


# ---------------------------------------------------------------------------
# daemon — registration + deterministic run_once
# ---------------------------------------------------------------------------

def test_daemon_registers_and_answers_info_tuple(spark):
    ev, _ = _ev(spark)
    row = ev.eval(
        'daemon(id=d1, runInterval=1000, '
        'search(documents, q="text:merge", fl="doc_id", '
        'sort="doc_id asc"))').collect()
    assert [(r["id"], r["state"], r["iterations"]) for r in row] == [
        ("d1", "STOPPED", 0)]
    assert set(ev.daemons) == {"d1"}
    assert ev.daemons["d1"].run_interval == "1000"


def test_daemon_run_once_replays_plan_and_counts_iterations(spark):
    ev, _ = _ev(spark)
    ev.eval('daemon(id=d1, runInterval=5, '
            'search(documents, q="text:merge", fl="doc_id", '
            'sort="doc_id asc"))').collect()
    d = ev.daemons["d1"]
    n1 = d.run_once()
    n2 = d.run_once()
    assert n1 == n2 == _count(ev, "merge") > 0  # deterministic replay
    assert d.iterations == 2 and d.state == "STOPPED"


def test_daemon_list_and_stop_semantics(spark):
    ev, _ = _ev(spark)
    for did in ("a", "b"):
        ev.eval(f'daemon(id={did}, runInterval=1, '
                'search(documents, q="text:merge", fl="doc_id", '
                'sort="doc_id asc"))').collect()
    assert set(ev.daemons) == {"a", "b"}  # admin list
    del ev.daemons["a"]                   # admin stop/kill
    assert set(ev.daemons) == {"b"}


def test_daemon_requires_id(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError):
        ev.eval('daemon(runInterval=1, search(documents, q="*:*", '
                'fl="doc_id", sort="doc_id asc"))')


# ---------------------------------------------------------------------------
# executor — jobs-as-data
# ---------------------------------------------------------------------------

def test_executor_runs_each_stored_expression(spark):
    ev, _ = _ev(spark)
    rows = ev.eval('executor(search(exprs, q="*:*", fl="id,expr_s", '
                   'sort="id asc"))').collect()
    got = {r["id"]: r["n"] for r in rows}
    assert got == {"j1": _count(ev, "merge"), "j2": _count(ev, "join")}


def test_executor_requires_expr_s_column(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError):
        ev.eval('executor(search(documents, q="*:*", fl="doc_id", '
                'sort="doc_id asc"))')
