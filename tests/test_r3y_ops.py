"""Round-3y ops: topic / commit / plist / calc streams
(solrj/io/stream/TopicStream.java:75, CommitStream.java:44,
ParallelListStream.java:109, CalculatorStream.java:87) — the
continuous-ingestion surface: checkpointed pub/sub pulls, explicit
commit cadence over update streams, parallel-open concatenation, and
the zero-tuple math source."""

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark, docs=None):
    from lucene_solr_spark.search.streams import StreamEvaluator
    if docs is None:
        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "beta gamma"), (3, "alpha delta"),
             (4, "gamma delta"), (5, "alpha gamma")],
            "_version_ long, text string")
    return StreamEvaluator({"docs": docs}), docs


# ---------------------------------------------------------------------------
# topic — checkpointed pub/sub
# ---------------------------------------------------------------------------

def test_topic_initial_checkpoint_zero_replays_all(spark):
    ev, docs = _ev(spark)
    out = ev.eval('topic(chk, docs, id=t1, fl="_version_", '
                  'initialCheckpoint=0, rows=100)')
    assert [r["_version_"] for r in out.collect()] == [1, 2, 3, 4, 5]
    # checkpoint advanced to the max version emitted
    assert ev.topic_checkpoints[("chk", "t1")] == 5


def test_topic_second_pull_is_empty(spark):
    ev, _ = _ev(spark)
    ev.eval('topic(chk, docs, id=t1, initialCheckpoint=0, rows=100)')
    again = ev.eval('topic(chk, docs, id=t1, rows=100)')
    assert again.count() == 0


def test_topic_rows_cap_pages_in_version_order(spark):
    ev, _ = _ev(spark)
    p1 = ev.eval('topic(chk, docs, id=t2, fl="_version_", '
                 'initialCheckpoint=0, rows=2)').collect()
    p2 = ev.eval('topic(chk, docs, id=t2, fl="_version_", '
                 'rows=2)').collect()
    p3 = ev.eval('topic(chk, docs, id=t2, fl="_version_", '
                 'rows=2)').collect()
    assert [r["_version_"] for r in p1] == [1, 2]
    assert [r["_version_"] for r in p2] == [3, 4]
    assert [r["_version_"] for r in p3] == [5]


def test_topic_default_checkpoint_emits_only_new_docs(spark):
    """initialCheckpoint=-1 (default) starts at the collection's
    CURRENT max version — the first pull sees nothing; docs arriving
    after registration flow on the next pull."""
    ev, docs = _ev(spark)
    assert ev.eval('topic(chk, docs, id=t3, rows=100)').count() == 0
    grown = docs.unionByName(spark.createDataFrame(
        [(6, "epsilon"), (7, "zeta")], "_version_ long, text string"))
    ev.collections["docs"] = grown
    out = ev.eval('topic(chk, docs, id=t3, fl="_version_", rows=100)')
    assert [r["_version_"] for r in out.collect()] == [6, 7]


def test_topic_checkpoints_are_independent_per_id(spark):
    ev, _ = _ev(spark)
    ev.eval('topic(chk, docs, id=a, initialCheckpoint=0, rows=2)')
    out_b = ev.eval('topic(chk, docs, id=b, fl="_version_", '
                    'initialCheckpoint=0, rows=100)')
    assert out_b.count() == 5  # b's pull unaffected by a's checkpoint
    assert ev.topic_checkpoints[("chk", "a")] == 2


def test_topic_requires_id_and_version_field(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError, match="id="):
        ev.eval("topic(chk, docs, rows=10)")
    no_v = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    ev2, _ = _ev(spark, docs=no_v)
    with pytest.raises(ValueError, match="version field"):
        ev2.eval("topic(chk, docs, id=t, rows=10)")


# ---------------------------------------------------------------------------
# commit — explicit commit cadence over update()
# ---------------------------------------------------------------------------

def _writer_ev(spark, tmp_path):
    from lucene_solr_spark.index.writer import IndexWriter
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma"), (2, "alpha alpha"),
         (3, "gamma delta"), (4, "delta alpha")],
        "doc_id long, text string")
    w = IndexWriter.create(spark, str(tmp_path / "dest"),
                           docs_per_segment=512)
    return StreamEvaluator({"documents": docs},
                           writers={"dest": w}), w


def test_commit_passes_update_acks_through(spark, tmp_path):
    ev, w = _writer_ev(spark, tmp_path)
    [ack] = ev.eval(
        'commit(dest, batchSize=2, '
        'update(dest, search(documents, fl="doc_id,text", '
        'sort="doc_id asc"), order="doc_id"))').collect()
    assert ack.batchIndexed == 5 and ack.generation == 1
    assert w.reader().doc_count == 5
    # 5 docs / batchSize 2 -> 2 interior commits + the EOF commit
    assert ev.last_commit == {"collection": "dest", "commits": 3,
                              "doc_count": 5}


def test_commit_batchsize_zero_means_eof_commit_only(spark, tmp_path):
    ev, _ = _writer_ev(spark, tmp_path)
    ev.eval('commit(dest, '
            'update(dest, search(documents, fl="doc_id,text", '
            'sort="doc_id asc"), order="doc_id"))').collect()
    assert ev.last_commit["commits"] == 1


def test_commit_rejects_negative_batchsize_and_unbound_dest(spark,
                                                            tmp_path):
    ev, _ = _writer_ev(spark, tmp_path)
    with pytest.raises(ValueError, match="batchSize"):
        ev.eval('commit(dest, batchSize=-1, '
                'update(dest, search(documents, fl="doc_id,text", '
                'sort="doc_id asc")))')
    with pytest.raises(ValueError, match="no writer bound"):
        ev.eval('commit(nope, '
                'update(dest, search(documents, fl="doc_id,text", '
                'sort="doc_id asc")))')


# ---------------------------------------------------------------------------
# plist — parallel-open list
# ---------------------------------------------------------------------------

def test_plist_matches_list_with_leg_ordinals(spark):
    ev, _ = _ev(spark)
    a = 'search(docs, fl="_version_", sort="_version_ asc")'
    b = 'search(docs, fl="text", sort="text asc")'
    pl = ev.eval(f"plist({a}, {b})").collect()
    ll = ev.eval(f"list({a}, {b})").collect()
    key = lambda r: (r["_list_src"], r["_version_"], r["text"])
    assert sorted(map(key, pl)) == sorted(map(key, ll))
    assert {r["_list_src"] for r in pl} == {0, 1}


# ---------------------------------------------------------------------------
# calc — the zero-tuple source
# ---------------------------------------------------------------------------

def test_calc_emits_exactly_one_empty_tuple(spark):
    ev, _ = _ev(spark)
    out = ev.eval("calc()")
    assert out.count() == 1 and out.columns == []


def test_select_over_calc_computes_pure_math(spark):
    ev, _ = _ev(spark)
    [r] = ev.eval("select(calc(), add(2, 3) as s, "
                  "mult(4, 5) as m)").collect()
    assert (r["s"], r["m"]) == (5, 20)
