"""Round-3d ops: ParallelStream routing, CombinedFieldQuery (BM25F),
DCLM top-p selection, tokenizer fertility, FeatureField sigmoid."""

import math

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ParallelStream (_s_parallel)
# ---------------------------------------------------------------------------

_PAR_INNER = ('rollup(search(documents, q="*:*", fl="doc_id,lang", '
              'sort="lang asc"), over="lang", count(*))')


def _mk_eval(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return StreamEvaluator({"documents": docs})


def test_parallel_is_transparent(spark):
    """ParallelStream is a pure decorator: output tuples == inner
    stream's tuples (ParallelStream.java merges, never transforms)."""
    ev = _mk_eval(spark)
    plain = {tuple(r) for r in ev.eval(_PAR_INNER).collect()}
    par = {tuple(r) for r in ev.eval(
        f'parallel({_PAR_INNER}, workers=4, partitionKeys="lang", '
        f'sort="lang asc")').collect()}
    assert par == plain and len(par) > 1


def test_parallel_routing_is_key_disjoint(spark):
    """workers=N pins the fan-out width and hash(partitionKeys)
    routing: exactly N partitions, no key straddles two workers."""
    ev = _mk_eval(spark)
    out = ev.eval(f'parallel({_PAR_INNER}, workers=4, '
                  f'partitionKeys="lang")')
    assert out.rdd.getNumPartitions() == 4
    per_part = out.rdd.mapPartitionsWithIndex(
        lambda i, rows: [(r["lang"], i) for r in rows]).collect()
    seen = {}
    for lang, part in per_part:
        assert seen.setdefault(lang, part) == part


def test_parallel_sort_is_merge_comparator(spark):
    ev = _mk_eval(spark)
    rows = ev.eval(f'parallel({_PAR_INNER}, workers=2, '
                   f'partitionKeys="lang", sort="lang desc")').collect()
    langs = [r["lang"] for r in rows]
    assert langs == sorted(langs, reverse=True)


# ---------------------------------------------------------------------------
# CombinedFieldQuery — BM25F merged statistics
# ---------------------------------------------------------------------------

def _bm25(tf, dl, df, n, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf / (tf + k1 * ((1 - b) + b * dl / avgdl))


def test_combined_fields_python_twin(spark):
    """The Spark plan's top-10 equals a from-scratch python BM25F over
    merged per-field stats (CombinedFieldQuery.java:87 semantics as
    documented in __spark_entry__._q_combined_fields)."""
    import re
    import __spark_entry__ as entry
    from lucene_solr_spark.codecs.smallfloat import quantize_length_np
    import numpy as np

    got = [(r["doc_id"], r["score"])
           for r in entry._q_combined_fields(spark, SF).collect()]

    rows = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source", "text").collect())
    w_src = entry._CFQ_WSRC
    docs = []
    for r in rows:
        toks = [t.lower() for t in re.findall(r"[A-Za-z0-9]+", r["text"])]
        dl = float(quantize_length_np(np.array([len(toks)]))[0]) + w_src
        tfs = [toks.count(t) + w_src * (r["source"] == t)
               for t in entry._CFQ_TERMS]
        docs.append((r["doc_id"], dl, tfs))
    n = len(docs)
    avgdl = sum(d[1] for d in docs) / n
    dfs = [sum(1 for d in docs if d[2][i] > 0)
           for i in range(len(entry._CFQ_TERMS))]
    scored = []
    for doc_id, dl, tfs in docs:
        if all(tf == 0 for tf in tfs):
            continue
        s = sum(_bm25(tf, dl, dfs[i], n, avgdl)
                for i, tf in enumerate(tfs) if tf > 0)
        scored.append((doc_id, round(s, 6)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    assert got == scored[:10]


def test_combined_fields_keyword_side_matches(spark):
    """'src3' has zero text-side tf — every match comes through the
    source keyword pseudo-field, proving the ANY-field df/tf merge."""
    import __spark_entry__ as entry
    d = spark.read.parquet(f"{SF}/documents.parquet")
    src3 = {r["doc_id"] for r in
            d.filter("source = 'src3'").select("doc_id").collect()}
    assert src3
    got = {r["doc_id"]
           for r in entry._q_combined_fields(spark, SF).collect()}
    assert got & src3


# ---------------------------------------------------------------------------
# DCLM top-p selection
# ---------------------------------------------------------------------------

def test_dclm_select_keeps_ceil_frac_per_slice(spark):
    from lucene_solr_spark.textops.ops import dclm_select
    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = dclm_select(d, frac=0.25)
    kept = {}
    for r in out.collect():
        kept.setdefault(r["lang"], []).append(r)
    totals = {r["lang"]: r["count"]
              for r in d.groupBy("lang").count().collect()}
    for lang, rows in kept.items():
        assert len(rows) == math.ceil(0.25 * totals[lang])
        ranks = sorted(r["rnk"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))


def test_dclm_select_takes_the_top_scores(spark):
    """No discarded doc outranks a kept doc inside a slice (ties by
    doc_id ASC)."""
    from lucene_solr_spark.textops.ops import dclm_select, fasttext_score
    d = spark.read.parquet(f"{SF}/documents.parquet")
    kept = dclm_select(d, frac=0.25).collect()
    probs = {r["doc_id"]: r["prob"] for r in fasttext_score(d).collect()}
    langs = {r["doc_id"]: r["lang"] for r in
             d.select("doc_id", "lang").collect()}
    kept_ids = {r["doc_id"] for r in kept}
    worst = {}
    for r in kept:
        key = (r["prob"], -r["doc_id"])
        if r["lang"] not in worst or key < worst[r["lang"]]:
            worst[r["lang"]] = key
    for doc_id, prob in probs.items():
        if doc_id in kept_ids:
            continue
        w = worst[langs[doc_id]]
        assert (prob, -doc_id) < w


# ---------------------------------------------------------------------------
# Tokenizer fertility
# ---------------------------------------------------------------------------

def test_tok_fertility_hand_case(spark):
    from lucene_solr_spark.textops.ops import tok_fertility
    df = spark.createDataFrame(
        [("en", "hello world42 x"), ("en", "a-b c")],
        ["lang", "text"])
    row = tok_fertility(df).collect()[0]
    # words: 3 + 2 = 5; BPE tokens: hello|world|42|x (4) + a|-|b|c (4)
    assert (row["words"], row["tokens"]) == (5, 8)
    assert row["chars"] == len("hello world42 x") + len("a-b c")
    assert row["fertility"] == round(8 / 5, 6)
    assert row["chars_per_token"] == round(row["chars"] / 8, 6)


# ---------------------------------------------------------------------------
# FeatureField sigmoid
# ---------------------------------------------------------------------------

def test_feature_sigmoid_formula(spark):
    """Every returned score = base BM25 + w*v^2/(v^2+pivot^2) on that
    doc's n_chars."""
    import __spark_entry__ as entry
    got = {r["doc_id"]: r["score"]
           for r in entry._q_feature_sigmoid(spark, SF).collect()}
    se = entry._searcher(spark, SF)
    from lucene_solr_spark.search.query import Term
    base = {r["docid"]: r["score"]
            for r in se.scored(Term("hash")).collect()}
    nchars = {r["doc_id"]: r["n_chars"] for r in
              spark.read.parquet(f"{SF}/documents.parquet")
              .select("doc_id", "n_chars").collect()}
    w, piv = entry._FEAT_SIG_W, entry._FEAT_SIG_PIVOT
    for doc_id, sc in got.items():
        v2 = float(nchars[doc_id]) ** 2
        assert sc == pytest.approx(
            round(base[doc_id] + w * v2 / (v2 + piv * piv), 6), abs=2e-6)
