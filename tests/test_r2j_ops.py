"""Round-2j operators: BlendedInfixSuggester position blending, CCNet
perplexity buckets, Solr group-by-function-query — algorithmic laws on
real testdata.  (Driver-contract parity runs in
tools/verify_contract.py; these pin the math.)"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


# -- BlendedInfixSuggester --------------------------------------------------

def test_blended_weight_is_floor_reciprocal(spark):
    """BlendedInfixSuggester POSITION_RECIPROCAL law: result weight ==
    (long)(stored_weight * 1/(position+1)) — recompute from the row's
    own pos and the stored n_chars."""
    from __spark_entry__ import _q_suggest_blended, _documents
    rows = _q_suggest_blended(spark, SF).collect()
    assert rows, "prefix 'val' must match in the fixture corpus"
    nc = {r.doc_id: r.n_chars
          for r in _documents(spark, SF).select("doc_id", "n_chars")
          .collect()}
    for r in rows:
        assert r.weight == int(nc[r.doc_id] * (1.0 / (r.pos + 1)))
    # ranked by blended weight desc, doc_id asc
    keys = [(-r.weight, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_blended_pos_is_first_match(spark):
    """pos is the FIRST token position whose term starts with the
    unfinished key — re-derive from the analyzed text."""
    from __spark_entry__ import _q_suggest_blended, _documents
    from lucene_solr_spark.analysis.analyzers import simple_tokens_col
    rows = _q_suggest_blended(spark, SF).collect()
    toks = {r.doc_id: r.toks for r in _documents(spark, SF).select(
        "doc_id", simple_tokens_col("text").alias("toks")).collect()}
    for r in rows:
        first = next(i for i, t in enumerate(toks[r.doc_id])
                     if t.startswith("val"))
        assert r.pos == first


# -- group.func -------------------------------------------------------------

def test_group_func_picks_bucket_max(spark):
    """Each returned doc is the top-scored doc of its bucket, and
    n_in_group totals the full match count."""
    from __spark_entry__ import (_q_group_func, _searcher, _GROUP_TERM,
                                 _GF_BUCKET)
    from lucene_solr_spark.search.query import Term
    se = _searcher(spark, SF)
    full = (se.scored(Term(_GROUP_TERM))
            .withColumn("score", F.round("score", 6))
            .join(se.ix.source.select("docid", "n_chars"), "docid")
            .withColumn("bucket",
                        F.floor(F.col("n_chars") / F.lit(_GF_BUCKET))
                        .cast("long"))
            .collect())
    best = {}
    counts = {}
    for r in full:
        counts[r.bucket] = counts.get(r.bucket, 0) + 1
        k = (-r.score, r.docid)
        if r.bucket not in best or k < best[r.bucket][0]:
            best[r.bucket] = (k, r.docid, r.score)
    got = _q_group_func(spark, SF).collect()
    assert {r.bucket for r in got} == set(best)
    for r in got:
        assert (r.doc_id, r.score) == best[r.bucket][1:]
        assert r.n_in_group == counts[r.bucket]


# -- perplexity buckets -----------------------------------------------------

def test_ppl_buckets_are_balanced_and_ordered(spark, docs):
    """NTILE law: per language the three buckets differ in size by at
    most 1, and every head logprob >= every middle >= every tail."""
    from lucene_solr_spark.textops import ops as textops
    rows = textops.perplexity_buckets(docs).collect()
    assert rows
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    rank = {"head": 0, "middle": 1, "tail": 2}
    for lang, rs in by_lang.items():
        sizes = [sum(1 for r in rs if r.bucket == b)
                 for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        # order law on the (rounded) score used for ranking
        ordered = sorted(rs, key=lambda r: (-r.logprob, r.doc_id))
        labels = [rank[r.bucket] for r in ordered]
        assert labels == sorted(labels), lang


def test_ppl_buckets_deterministic(spark, docs):
    from lucene_solr_spark.textops import ops as textops
    a = sorted((r.doc_id, r.bucket)
               for r in textops.perplexity_buckets(docs).collect())
    b = sorted((r.doc_id, r.bucket)
               for r in textops.perplexity_buckets(docs).collect())
    assert a == b

# -- SemDeDup ----------------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def test_semdedup_keeps_lowest_id_per_pair(spark, emb):
    """Every flagged duplicate has a lower-id neighbor in its own
    cluster with cos >= tau; every kept vector has none."""
    import numpy as np
    from lucene_solr_spark.vector.ann import semdedup
    tau = 0.35
    rows = semdedup(emb, stride=37, tau=tau).collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    clusters = {}
    for r in rows:
        clusters.setdefault(r.cent_id, []).append(r.vec_id)

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        return round(float(va @ vb)
                     / (float(np.sqrt(va @ va)) * float(np.sqrt(vb @ vb))),
                     6)

    for r in rows:
        lower = [o for o in clusters[r.cent_id] if o < r.vec_id]
        has_dup_src = any(cos(o, r.vec_id) >= tau for o in lower)
        assert r.is_dup == has_dup_src, (r.vec_id, r.cent_id)


def test_semdedup_total_and_fires(spark, emb):
    from lucene_solr_spark.vector.ann import semdedup
    rows = semdedup(emb, stride=37, tau=0.35).collect()
    assert len(rows) == emb.count()          # every vector classified
    assert any(r.is_dup for r in rows)       # threshold actually fires
    assert any(not r.is_dup for r in rows)


# -- CheckIndex --------------------------------------------------------------

def test_check_index_matches_reinversion(spark):
    """Packed-store segment metadata == re-inverting the raw text with
    the shared analyzer (the CheckIndex testPostings/testTerms law)."""
    from __spark_entry__ import _q_check_index, _documents
    from lucene_solr_spark.analysis.analyzers import simple_tokens_col
    got = {r.seg_id: (r.n_docs, r.n_terms, r.n_postings, r.n_tokens)
           for r in _q_check_index(spark, SF).collect()}
    toks = (_documents(spark, SF)
            .select("doc_id", simple_tokens_col("text").alias("toks"))
            .collect())
    exp = {}
    for r in toks:
        seg = r.doc_id // 1024
        d = exp.setdefault(seg, [0, set(), set(), 0])
        d[0] += 1
        for t in r.toks:
            d[1].add(t)
            d[2].add((t, r.doc_id))
        d[3] += len(r.toks)
    assert got == {s: (d[0], len(d[1]), len(d[2]), d[3])
                   for s, d in exp.items()}
