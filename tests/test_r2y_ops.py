"""Round-2y: CommonGramsFilter, binary-quantized ANN, writer
delete-by-query + TTL expiration — law tests (driver parity in
tools/verify_contract.py)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# CommonGramsFilter
# ---------------------------------------------------------------------------

def test_common_grams_python_model():
    """CommonGramsFilter.java:38 javadoc example: 'the quick brown fox'
    with common={the} -> grams the_quick (and fox_the/the_end when the
    common word is in second position)."""
    from lucene_solr_spark.analysis.filters import common_grams_py
    assert common_grams_py(["the", "quick", "brown", "fox"],
                           {"the"}) == ["the_quick"]
    assert common_grams_py(["quick", "the", "fox"], {"the"}) \
        == ["quick_the", "the_fox"]
    assert common_grams_py(["a", "b"], set()) == []
    # adjacent common words produce a gram per pair
    assert common_grams_py(["the", "of", "x"], {"the", "of"}) \
        == ["the_of", "of_x"]


def test_common_grams_spark_matches_model(spark):
    """The registry plan's gram extraction vs the python model on a
    crafted corpus with a known common set."""
    from lucene_solr_spark.analysis.filters import common_grams_py
    from collections import Counter
    docs = [("the cat sat on the mat",), ("a cat and the dog",),
            ("mat the",), ("solo",)]
    df = spark.createDataFrame(docs, "text string")
    toks = df.select(F.split("text", " ").alias("tokens"))
    common = {"the"}
    pairs = toks.select(F.explode(F.expr(
        "CASE WHEN size(tokens) < 2 THEN array() ELSE "
        "transform(sequence(1, size(tokens) - 1), "
        "i -> struct(tokens[i-1] AS w1, tokens[i] AS w2)) END"))
        .alias("b")).select("b.w1", "b.w2")
    got = Counter(
        r.gram for r in pairs
        .filter(F.col("w1").isin(*common) | F.col("w2").isin(*common))
        .select(F.concat_ws("_", "w1", "w2").alias("gram")).collect())
    want = Counter()
    for (t,) in docs:
        want.update(common_grams_py(t.split(" "), common))
    assert got == want


# ---------------------------------------------------------------------------
# binary quantization
# ---------------------------------------------------------------------------

def test_bq_signature_bits(spark):
    """Each signature bit must equal the sign test of its dimension."""
    from lucene_solr_spark.vector.ann import bq_sig_sql
    vec = [0.5, -1.0, 0.0, 2.0] + [-0.25] * 60
    df = spark.createDataFrame([(1, vec)],
                               "vec_id long, embedding array<float>")
    lo, hi = bq_sig_sql("embedding", 64)
    r = df.select(F.expr(lo).alias("lo"), F.expr(hi).alias("hi")) \
        .collect()[0]
    want_lo = sum(1 << i for i in range(32) if vec[i] > 0)
    want_hi = sum(1 << (i - 32) for i in range(32, 64) if vec[i] > 0)
    assert r.lo == want_lo == 0b1001  # dims 1 and 4 (zero is NOT set)
    assert r.hi == want_hi == 0


def test_bq_materialize_matches_inline_sigs(spark):
    """The materialized signature table must equal the inline
    signatures bq_topk computes (the 100 TB sidecar layout is a pure
    precomputation, never a semantics change)."""
    from pyspark.sql import functions as F
    from lucene_solr_spark.vector.ann import bq_materialize, bq_sig_sql
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    lo, hi = bq_sig_sql("embedding", 64)
    inline = {r.vec_id: (r.lo, r.hi) for r in emb.select(
        "vec_id", F.expr(lo).alias("lo"), F.expr(hi).alias("hi"))
        .collect()}
    mat = {r.vec_id: (r.slo, r.shi)
           for r in bq_materialize(emb, dim=64).collect()}
    assert mat == inline and len(mat) == emb.count()


def test_bq_hamming_matches_numpy(spark):
    import numpy as np
    from lucene_solr_spark.vector.ann import bq_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    q = rows[0]
    out = bq_topk(emb, query_vec_id=0, k=10, n_candidates=50).collect()
    qb = q > 0
    for r in out:
        want = int(np.sum((rows[r.vec_id] > 0) != qb))
        assert r.hamming == want
        cos = float(q @ rows[r.vec_id]
                    / (np.linalg.norm(q) * np.linalg.norm(rows[r.vec_id])))
        assert r.cos == pytest.approx(round(cos, 6), abs=2e-6)


def test_bq_rerank_is_exact_within_candidates(spark):
    """Within the Hamming candidate set the rerank must order exactly
    like brute-force cosine (the approximation is ONLY candidate
    recall, never rank inversion)."""
    from lucene_solr_spark.vector.ann import bq_topk, cosine_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    # with n_candidates = all vectors, BQ == brute force exactly
    full = bq_topk(emb, query_vec_id=0, k=10, n_candidates=n).collect()
    brute = cosine_topk(emb, query_vec_id=0, k=10).collect()
    assert [(r.vec_id, r.cos) for r in full] \
        == [(r.vec_id, r.cos) for r in brute]


# ---------------------------------------------------------------------------
# delete-by-query / TTL expiration
# ---------------------------------------------------------------------------

@pytest.fixture()
def dstore(spark, xs_transcripts, tmp_path):
    from lucene_solr_spark.index.writer import IndexWriter
    w = IndexWriter.create(spark, str(tmp_path / "ix"),
                           docs_per_segment=128)
    w.append_raw(xs_transcripts.drop("docid"))
    return w


def test_delete_by_query_matches_query_semantics(dstore):
    """deleteDocuments(Query): every live doc matching the AST (and
    only those) must be gone afterwards; stats keep deleted docs until
    merge (Lucene stats-ignore-deletes semantics)."""
    from lucene_solr_spark.search.query import Bool, Term
    from lucene_solr_spark.search.segment_searcher import SegmentSearcher
    w = dstore
    q = Bool(must=(Term("ok"), Term("retry")))
    before = {r.docid for r in
              SegmentSearcher(w.reader()).scored(q)
              .select("docid").collect()}
    assert before
    n0 = w.reader().doc_count
    six = w.delete_by_query(q)
    ss = SegmentSearcher(six)
    assert ss.scored(q).count() == 0
    # docs matching only one leg survive
    assert ss.scored(Term("ok")).count() > 0
    # unrelated queries lose exactly the overlap
    hits_ok = {r.docid for r in ss.scored(Term("ok"))
               .select("docid").collect()}
    assert not (hits_ok & before)
    assert six.doc_count == n0  # stats until merge


def test_delete_by_query_no_match_is_noop(dstore):
    from lucene_solr_spark.search.query import Term
    w = dstore
    st0 = w.commit_state()
    six = w.delete_by_query(Term("zzzzmissing"))
    assert w.commit_state()["generation"] == st0["generation"]
    assert six.doc_count == st0["doc_count"]


def test_expire_docs_ttl_sweep(spark, dstore, xs_transcripts):
    """DocExpirationUpdateProcessorFactory reaper: docs whose
    expiration docvalue <= NOW are deleted; later ones survive; a
    second sweep at a later NOW takes the next slice."""
    from lucene_solr_spark.search.query import Term
    from lucene_solr_spark.search.segment_searcher import SegmentSearcher
    w = dstore
    spark_ = xs_transcripts.sparkSession

    def deleted():
        st = w.commit_state()
        out = set()
        for g in st.get("del_gens", []):
            out |= {r.docid for r in spark_.read.parquet(
                f"{w.path}/deletes/gen={g}").collect()}
        return out

    # expiration docvalue: docid itself (docid d expires at time d)
    dv = xs_transcripts.select(
        F.col("docid"), F.col("docid").alias("expire_at"))
    six = w.expire_docs(dv, "expire_at", 99)
    assert deleted() == set(range(100))
    # search paths exclude the expired slice
    hits = {r.docid for r in SegmentSearcher(six).scored(Term("ok"))
            .select("docid").collect()}
    assert hits and not (hits & set(range(100)))
    # a later sweep takes the next slice (cumulative delete gens)
    w.expire_docs(dv, "expire_at", 199)
    assert deleted() == set(range(200))


# ---------------------------------------------------------------------------
# topic() / delete() streams
# ---------------------------------------------------------------------------

def test_topic_pull_resumes_from_checkpoint(spark, xs_transcripts,
                                            tmp_path):
    """TopicStream (solrj/io/stream/TopicStream.java:75): first pull
    sees everything since initialCheckpoint, later pulls only new
    generations; an idle pull is empty; a second subscriber with its
    own topic id replays from the beginning."""
    from lucene_solr_spark.index.writer import IndexWriter
    from lucene_solr_spark.streaming.topic import Topic
    w = IndexWriter.create(spark, str(tmp_path / "ix"),
                           docs_per_segment=256)
    batches = xs_transcripts.drop("docid")
    b1 = batches.limit(300)
    w.append_raw(b1)
    ck = str(tmp_path / "ckpt.json")
    t = Topic(spark, w.path, ck, "sub1")
    first = {r.docid for r in t.pull().collect()}
    assert first == set(range(300))
    # idle pull -> empty
    assert t.pull().count() == 0
    # new batch -> only the new docids
    w.append_raw(batches.subtract(b1).limit(100))
    second = {r.docid for r in t.pull().collect()}
    assert second == set(range(300, 400))
    # an independent subscription replays from the start
    t2 = Topic(spark, w.path, ck, "sub2")
    assert {r.docid for r in t2.pull().collect()} \
        == set(range(400))


def test_topic_pull_excludes_deleted(spark, xs_transcripts, tmp_path):
    from lucene_solr_spark.index.writer import IndexWriter
    from lucene_solr_spark.streaming.topic import Topic
    w = IndexWriter.create(spark, str(tmp_path / "ix"),
                           docs_per_segment=256)
    w.append_raw(xs_transcripts.drop("docid").limit(200))
    w.delete_docids(list(range(10)))
    t = Topic(spark, w.path, str(tmp_path / "c.json"), "s")
    got = {r.docid for r in t.pull().collect()}
    assert got == set(range(10, 200))


def test_delete_stream_decorator(spark, xs_transcripts, tmp_path):
    """DeleteStream (solrj/io/stream/DeleteStream.java:40): wrapped
    stream ids deleted in one generation, ack tuple emitted."""
    from lucene_solr_spark.index.writer import IndexWriter
    from lucene_solr_spark.search.query import Term
    from lucene_solr_spark.search.segment_searcher import SegmentSearcher
    from lucene_solr_spark.search.streams import StreamEvaluator
    w = IndexWriter.create(spark, str(tmp_path / "ix"),
                           docs_per_segment=256)
    w.append_raw(xs_transcripts.drop("docid"))
    victims = spark.createDataFrame(
        [(d,) for d in range(50)], "docid long")
    ev = StreamEvaluator({"victims": victims},
                         writers={"ix": w})
    ack = ev.eval('delete(ix, search(victims, q="*:*", fl="docid"), '
                  'id=docid)').collect()[0]
    assert ack.batchDeleted == 50
    hits = {r.docid for r in SegmentSearcher(w.reader())
            .scored(Term("ok")).select("docid").collect()}
    assert hits and not (hits & set(range(50)))
