"""Round-3k ops: exact-substring window dedup, LSH recall report,
winnowing overlap pairs."""

import hashlib
import re

import pytest

SF = "/root/testdata/sf0.001"


def _tokens(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return {r["doc_id"]: [w.lower() for w in
                          re.findall(r"[A-Za-z0-9]+", r["text"])]
            for r in docs.select("doc_id", "text").collect()}


# ---------------------------------------------------------------------------
# window_dedup (arXiv:2107.06499 ExactSubstr)
# ---------------------------------------------------------------------------

def test_window_dedup_python_twin(spark):
    from lucene_solr_spark.textops.ops import window_dedup
    toks = _tokens(spark)
    span = 16
    occ = {}
    per_doc = {}
    for d, t in toks.items():
        ws = [" ".join(t[i:i + span]) for i in range(len(t) - span + 1)]
        per_doc[d] = ws
        for w in ws:
            occ[w] = occ.get(w, 0) + 1

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r["doc_id"]: r for r in window_dedup(docs, span=span).collect()}
    assert set(got) == set(toks)
    n_flagged = 0
    for d, ws in per_doc.items():
        dup = sum(1 for w in ws if occ[w] >= 2)
        r = got[d]
        assert r["n_windows"] == len(ws)
        assert r["dup_windows"] == dup
        assert r["flagged"] == (dup > 0)
        n_flagged += r["flagged"]
    # the fixture's deliberate near-clones must trip the detector,
    # but not the whole corpus
    assert 0 < n_flagged < len(toks)


def test_window_dedup_short_docs_emit_zeros(spark):
    from pyspark.sql import Row
    from lucene_solr_spark.textops.ops import window_dedup
    df = spark.createDataFrame(
        [Row(doc_id=1, text="too short"),
         Row(doc_id=2, text=" ".join(f"w{i}" for i in range(20)))])
    got = {r["doc_id"]: r for r in window_dedup(df, span=16).collect()}
    assert got[1]["n_windows"] == 0 and not got[1]["flagged"]
    assert got[2]["n_windows"] == 5 and got[2]["dup_windows"] == 0


def test_window_dedup_within_doc_repeat_counts(spark):
    """ExactSubstr counts repeats anywhere — including twice inside
    ONE document."""
    from pyspark.sql import Row
    from lucene_solr_spark.textops.ops import window_dedup
    block = " ".join(f"t{i}" for i in range(4))
    df = spark.createDataFrame(
        [Row(doc_id=1, text=block + " filler " + block)])
    r = window_dedup(df, span=4).collect()[0]
    assert r["dup_windows"] >= 2 and r["flagged"]


# ---------------------------------------------------------------------------
# lsh_recall
# ---------------------------------------------------------------------------

def test_lsh_recall_consistent_with_pair_plans(spark):
    from lucene_solr_spark.textops.ops import (lsh_recall,
                                               minhash_lsh_pairs,
                                               near_dup_pairs)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {(r["doc_a"], r["doc_b"])
             for r in near_dup_pairs(docs, threshold=0.8).collect()}
    lsh = {(r["doc_a"], r["doc_b"])
           for r in minhash_lsh_pairs(docs, threshold=0.8).collect()}
    r = lsh_recall(docs).collect()[0]
    assert r["n_exact"] == len(exact)
    assert r["n_lsh"] == len(lsh)
    assert r["n_hits"] == len(exact & lsh)
    assert r["recall"] == round(len(exact & lsh) / max(len(exact), 1), 6)
    # banding verifies candidates against exact jaccard -> subset
    assert lsh <= exact
    assert exact and r["recall"] > 0.5


# ---------------------------------------------------------------------------
# winnow_overlap (MOSS, Schleimer et al. 2003)
# ---------------------------------------------------------------------------

def test_winnow_overlap_python_twin(spark):
    from lucene_solr_spark.textops.ops import winnow_overlap
    toks = _tokens(spark)
    sel = {}
    for d, t in toks.items():
        prints = set()
        for i in range(len(t) - 2):
            h = hashlib.md5(" ".join(t[i:i + 3]).encode()).hexdigest()
            if h[0] == "0":
                prints.add(h)
        sel[d] = prints
    want = {}
    ids = sorted(sel)
    got = {(r["doc_a"], r["doc_b"]): r["shared"]
           for r in winnow_overlap(
               spark.read.parquet(f"{SF}/documents.parquet")).collect()}
    # brute-force only over docs that could pair (sharing any print)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n = len(sel[a] & sel[b])
            if n >= 2:
                want[(a, b)] = n
    assert got == want and want
