"""Replicator (lucene/replicator IndexRevision /
IndexReplicationHandler analogue, index/replicator.py): a replica
synced to a commit point answers every query identically; re-sync
copies only missing generation dirs; the commit publish is last."""

import os

import pytest

from lucene_solr_spark.index.replicator import (
    replicate, revision, snapshot_index,
)
from lucene_solr_spark.index.segments import open_segments
from lucene_solr_spark.index.writer import IndexWriter
from lucene_solr_spark.search.query import Bool, Phrase, Term
from lucene_solr_spark.search.segment_searcher import SegmentSearcher

QUERIES = (Term("ok"), Bool(must=(Term("ok"), Term("retry"))),
           Phrase(("ok", "the")), Term("error"))


def _results(spark, path):
    ss = SegmentSearcher(open_segments(spark, path))
    return {str(q): [(r.doc_id, r.score) for r in ss.topk(q, 10).collect()]
            for q in QUERIES}


@pytest.fixture()
def store(spark, xs_transcripts, tmp_path):
    w = IndexWriter.create(spark, str(tmp_path / "ix"),
                           docs_per_segment=128)
    half = xs_transcripts.count() // 2
    w.append_raw(xs_transcripts.limit(half).drop("docid"))
    return w


def test_replica_answers_identically(spark, store, tmp_path):
    dst = str(tmp_path / "replica")
    rep = replicate(store.path, dst)
    assert rep["copied"] and not rep["skipped"]
    assert _results(spark, dst) == _results(spark, store.path)
    six = open_segments(spark, dst)
    assert six.doc_count == open_segments(spark, store.path).doc_count


def test_resync_is_incremental(spark, store, xs_transcripts, tmp_path):
    dst = str(tmp_path / "replica")
    first = replicate(store.path, dst)
    # advance the source: another append + a delete + a dv update
    half = xs_transcripts.count() // 2
    store.append_raw(xs_transcripts.limit(half).drop("docid"))
    store.delete_by_term("error")
    store.update_numeric_docvalue("ok", "prio", 7)
    second = replicate(store.path, dst)
    # only NEW gen dirs travel; everything from the first sync is kept
    assert set(first["copied"]) & set(second["skipped"]) == \
        set(d for d in first["copied"] if not d.startswith(("catalog",
                                                            "term_stats")))
    assert all(not d.startswith("segments/")
               or d not in first["copied"] for d in second["copied"])
    # the replica now matches the advanced source, deletes included
    assert _results(spark, dst) == _results(spark, store.path)
    six = open_segments(spark, dst)
    assert six.del_gens and six.dv_gens
    ss = SegmentSearcher(six)
    assert ss.count(Term("error")).first()["n_hits"] == 0


def test_publish_is_last_and_atomic(spark, store, tmp_path):
    dst = str(tmp_path / "replica")
    rep = replicate(store.path, dst)
    # the manifest the replica published matches the source commit
    assert revision(dst)["state"] == revision(store.path)["state"]
    assert rep["generation"] == revision(store.path)["state"]["generation"]
    # no leftover temp artifacts
    for root, dirs, files in os.walk(dst):
        assert not [d for d in dirs if d.endswith(".copying")]
        assert "commit.json.tmp" not in files


def test_snapshot_refuses_nonempty_dest(store, tmp_path):
    d = tmp_path / "snap"
    d.mkdir()
    (d / "junk").write_text("x")
    with pytest.raises(ValueError):
        snapshot_index(store.path, str(d))
    snapshot_index(store.path, str(tmp_path / "snap2"))
    assert os.path.exists(tmp_path / "snap2" / "commit.json")
