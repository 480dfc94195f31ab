"""New operators: MultiPhrase, SpanNear, highlight, minhash/simhash/
fingerprint, LSH ANN, multimodal plumbing — engine vs DuckDB oracle on
real testdata plus structural checks."""

import duckdb
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import Searcher
from lucene_solr_spark.search.oracle import OracleBuilder
from lucene_solr_spark.search.query import MultiPhrase, Phrase, SpanNear, Term
from lucene_solr_spark.textops import ops as textops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def searcher(docs):
    return Searcher(build_index(docs))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"create view documents as select * "
              f"from '{SF}/documents.parquet'")
    c.execute(f"create view embeddings as select * "
              f"from '{SF}/embeddings.parquet'")
    return c


def _cmp(searcher, con, q, k=10):
    ob = OracleBuilder()
    eng = [(r.doc_id, r.score)
           for r in searcher.topk(q, k).collect()]
    ora = [(int(a), float(b))
           for a, b in con.execute(ob.topk_sql(q, k)).fetchall()]
    assert eng == ora, (eng[:3], ora[:3])
    return eng


def test_multiphrase_matches_oracle(searcher, con):
    hits = _cmp(searcher, con,
                MultiPhrase((("table", "slow"), ("hash", "batch"))))
    assert hits  # fixture vocabulary guarantees matches


def test_multiphrase_superset_of_exact_phrase(searcher):
    mp = {r.docid for r in searcher.matching(
        MultiPhrase((("table",), ("hash",)))).collect()}
    ph = {r.docid for r in searcher.matching(
        Phrase(("table", "hash"))).collect()}
    assert mp == ph  # single-alternative slots == exact phrase


def test_span_near_matches_oracle(searcher, con):
    _cmp(searcher, con, SpanNear(("join", "batch"), slop=3))


def test_span_near_slop_zero_equals_phrase_matchset(searcher):
    ph = {r.docid for r in searcher.matching(
        Phrase(("table", "hash"))).collect()}
    sp = {r.docid for r in searcher.matching(
        SpanNear(("table", "hash"), slop=0)).collect()}
    assert sp == ph


def test_span_near_widens_with_slop(searcher):
    n0 = searcher.matching(SpanNear(("join", "batch"), 0)).count()
    n5 = searcher.matching(SpanNear(("join", "batch"), 5)).count()
    assert n5 >= n0


def test_minhash_lsh_finds_near_dups(docs):
    exact = {(r.doc_a, r.doc_b) for r in
             textops.near_dup_pairs(docs, threshold=0.8).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in
           textops.minhash_lsh_pairs(docs, threshold=0.8).collect()}
    # LSH candidates are a (probabilistically near-complete) subset
    assert lsh <= exact
    if exact:
        assert len(lsh) >= 0.8 * len(exact)


def test_simhash_near_dups_are_closer_than_random(docs):
    sh = {r.doc_id: r.simhash for r in textops.simhash16(docs).collect()}
    pairs = [(r.doc_a, r.doc_b) for r in
             textops.near_dup_pairs(docs, threshold=0.8).collect()]

    def ham(a, b):
        return bin(sh[a] ^ sh[b]).count("1")

    assert pairs
    near = sum(ham(a, b) for a, b in pairs) / len(pairs)
    ids = sorted(sh)
    rand = [(ids[i], ids[(i * 7 + 3) % len(ids)]) for i in range(100)]
    rand = [(a, b) for a, b in rand if a != b]
    base = sum(ham(a, b) for a, b in rand) / len(rand)
    # near-duplicates must be markedly closer in simhash space
    assert near < base * 0.6


def test_fingerprint_deterministic(docs):
    a = {r.doc_id: r.fingerprint
         for r in textops.fingerprint(docs).collect()}
    b = {r.doc_id: r.fingerprint
         for r in textops.fingerprint(docs).collect()}
    assert a == b and len(a) > 0


def test_lsh_ann_subset_of_bruteforce_universe(spark):
    from lucene_solr_spark.vector.ann import cosine_topk, lsh_bucket_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = [(r.vec_id, r.cos) for r in
             cosine_topk(emb, 0, 10).collect()]
    approx = [(r.vec_id, r.cos) for r in
              lsh_bucket_topk(emb, 0, 10, n_planes=4).collect()]
    assert len(approx) > 0
    # every approx hit's score exists in the exact ranking universe:
    # scores must match the brute-force cosine for the same vec
    exact_all = {r.vec_id: r.cos for r in
                 cosine_topk(emb, 0, 10 ** 6).collect()}
    for vid, cos in approx:
        assert abs(exact_all[vid] - cos) < 1e-9


def test_multimodal_plumbing(spark, docs):
    from lucene_solr_spark.multimodal.blobs import (
        as_media, decode_images, resize_images, sample_frames,
    )
    media = as_media(
        docs.select("doc_id", F.encode("text", "utf-8").alias("blob")),
        "doc_id", "blob", "image")
    assert media.schema["payload"].dataType.typeName() == "binary"
    meta = decode_images(media).collect()
    assert len(meta) == docs.count()
    assert all(64 <= r.width < 257 and 64 <= r.height < 193 for r in meta)
    # deterministic across invocations
    meta2 = decode_images(media).collect()
    assert sorted(map(tuple, meta)) == sorted(map(tuple, meta2))
    rs = resize_images(media, 224, 224).collect()
    assert all(len(r.payload) == 32 for r in rs)  # sha256 fake payload
    fr = sample_frames(media.limit(5), every_n=24).collect()
    assert len(fr) >= 5
    # round 4: real mode parses actual headers (blobs.parse_image_meta)
    # — these text payloads are not encoded images, so dims are NULL
    # (real encoded fixtures are covered by test_r6b_media.py)
    rm = decode_images(media, real=True).collect()
    assert len(rm) == docs.count()
    assert all(r.width is None and r.height is None
               and r.channels is None for r in rm)


def test_highlight_snippet_contains_term(spark, searcher):
    top = searcher.topk(Term("window"), 5)
    src = searcher.ix.source.select(
        F.col("docid").alias("doc_id"), "text")
    snip = ("substring(text, greatest(1, locate('window', lower(text))"
            " - 20), 60)")
    rows = (top.join(src, "doc_id")
            .select("doc_id", F.expr(snip).alias("snippet")).collect())
    assert rows and all("window" in r.snippet.lower() for r in rows)


def test_explain_self_consistency(searcher):
    """CheckHits.verifyExplanation: explanation value == scored value,
    and leaf details recompose to it."""
    from lucene_solr_spark.search.query import Bool, Term
    top = searcher.topk(Term("dup"), 3).collect()
    for r in top:
        ex = searcher.explain(Term("dup"), r.doc_id)
        assert ex["matched"]
        assert round(ex["value"], 6) == r.score
        d = ex["details"]
        recomputed = (d["idf"] * d["tf"]
                      / (d["tf"] + 1.2 * ((1 - 0.75)
                                          + 0.75 * d["qdl"] / d["avgdl"])))
        assert abs(recomputed - ex["value"]) < 1e-9
    q = Bool(must=(Term("join"),), should=(Term("dup"),))
    hit = searcher.topk(q, 1).first()
    ex = searcher.explain(q, hit.doc_id)
    parts = sum(c["value"] for c in ex["details"]["must"]) + \
        sum(c["value"] for c in ex["details"]["should"] if c["matched"])
    assert abs(parts - ex["value"]) < 1e-9


def test_too_many_clauses(searcher):
    from lucene_solr_spark.search.engine import TooManyClauses
    from lucene_solr_spark.search.query import Bool, Term
    big = Bool(should=tuple(Term(f"t{i}") for i in range(1025)))
    with pytest.raises(TooManyClauses):
        searcher.scored(big)
