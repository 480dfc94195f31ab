"""Round-2r: WIMBD corpus top-k n-grams, Matryoshka truncated-dim kNN,
ord() docvalues-ordinal function query — law tests vs hand/numpy
recomputation (driver parity in tools/verify_contract.py)."""

import numpy as np

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# t_topk_ngrams
# ---------------------------------------------------------------------------

def test_topk_ngrams_tiny_law(spark):
    """Counts are over ALL occurrences; n_docs is distinct docs;
    ties break ngram-ASC."""
    from lucene_solr_spark.textops.ops import topk_ngrams
    df = spark.createDataFrame([
        (0, "a b a b"),     # 'a b' x2, 'b a' x1
        (1, "a b c"),       # 'a b' x1, 'b c' x1
        (2, "x"),           # <2 tokens: no ngrams
    ], "doc_id long, text string")
    rows = topk_ngrams(df, n=2, k=10).collect()
    got = [(r.ngram, r.n_occurrences, r.n_docs) for r in rows]
    assert got == [("a b", 3, 2), ("b a", 1, 1), ("b c", 1, 1)]


def test_topk_ngrams_matches_counter_at_sf(spark):
    """Engine top-20 bigrams == python Counter recomputation."""
    import re
    from collections import Counter
    from lucene_solr_spark.textops.ops import topk_ngrams
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    occ, dcount = Counter(), Counter()
    for d in docs.collect():
        toks = [t.lower() for t in re.findall(r"[A-Za-z0-9]+", d.text)]
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        occ.update(grams)
        dcount.update(set(grams))
    exp = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.ngram, r.n_occurrences, r.n_docs)
           for r in topk_ngrams(docs, n=2, k=20).collect()]
    assert [(g, c) for g, c, _ in got] == exp
    for g, _, nd in got:
        assert nd == dcount[g]


# ---------------------------------------------------------------------------
# v_ann_trunc
# ---------------------------------------------------------------------------

def test_ann_trunc_matches_numpy(spark):
    """Truncated-dim cosine == numpy over the first 8 dims only."""
    import __spark_entry__ as e
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)[:8]
            for r in emb}
    q = vecs[0]
    scored = sorted(
        ((round(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), 6),
          vid) for vid, v in vecs.items() if vid != 0),
        key=lambda t: (-t[0], t[1]))[:10]
    got = [(r.cos, r.vec_id)
           for r in e.queries()["v_ann_trunc"](spark, SF).collect()]
    assert [(c, v) for c, v in got] == scored


def test_ann_trunc_differs_from_fulldim(spark):
    """The 8-dim prefix ranking is a genuinely different ranking from
    full 64-dim cosine (otherwise the op tests nothing)."""
    import __spark_entry__ as e
    t8 = [r.vec_id for r in e.queries()["v_ann_trunc"](spark, SF).collect()]
    t64 = [r.vec_id
           for r in e.queries()["v_ann_cosine"](spark, SF).collect()]
    assert t8 != t64


# ---------------------------------------------------------------------------
# q_func_ord
# ---------------------------------------------------------------------------

def test_func_ord_is_sorted_dictionary_position(spark):
    """ord(source) = 1-based rank in the sorted distinct-values dict
    (OrdFieldSource); top-10 ranked by ord DESC, doc_id ASC."""
    import __spark_entry__ as e
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    dictionary = sorted({d.source for d in docs})
    ord_of = {s: i + 1 for i, s in enumerate(dictionary)}
    rows = e.queries()["q_func_ord"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.ord == ord_of[r.source]
    keys = [(-r.ord, r.doc_id) for r in rows]
    assert keys == sorted(keys)
