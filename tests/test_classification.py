"""lucene/classification module + misc/sandbox collectors:
SimpleNaiveBayesClassifier, KNearestNeighborClassifier,
DiversifiedTopDocsCollector, CoveringQuery — algorithmic laws on real
testdata (full driver parity runs in tools/verify_contract.py)."""

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_nb_assigns_argmax_class(spark):
    """Every assigned class must maximize the NB log score over ALL
    classes for that doc (recompute the full per-class matrix and
    compare)."""
    from __spark_entry__ import _NB_DOCS, _q_classify_nb, _searcher
    out = {r.doc_id: (r.cls, r.log_score)
           for r in _q_classify_nb(spark, SF).collect()}
    assert set(out) <= set(_NB_DOCS) and out
    se = _searcher(spark, SF)
    ix = se.ix
    # recompute the naive-bayes matrix independently (pandas-side)
    dl = {r.docid: r.lang for r in
          ix.source.select("docid", "lang")
          .filter(F.col("lang").isNotNull()).collect()}
    n_cls = len(dl)
    post = ix.postings.select("docid", "term", "tf").collect()
    n_pairs = len(post)
    n_docs_with_text = len({r.docid for r in post})
    avg_uniq = n_pairs / n_docs_with_text
    from collections import Counter, defaultdict
    df_c = Counter(dl.values())
    wc = Counter()
    for r in post:
        c = dl.get(r.docid)
        if c is not None:
            wc[(r.term, c)] += 1
    test_terms = defaultdict(list)
    for r in post:
        if r.docid in out:
            test_terms[r.docid].append((r.term, r.tf))
    for d, (cls, sc) in out.items():
        scores = {}
        for c, dfc in df_c.items():
            den = avg_uniq * dfc + n_cls
            ll = sum(tf * math.log((wc.get((t, c), 0) + 1) / den)
                     for t, tf in test_terms[d])
            scores[c] = math.log(dfc) - math.log(n_cls) + ll
        best = min(sorted(scores), key=lambda c: (-scores[c], c))
        assert cls == best, (d, cls, best, scores)
        assert abs(sc - scores[best]) < 1e-5


def test_knn_vote_is_boost_over_k(spark):
    """Class score = sum(score/maxScore over that class's neighbors)
    divided by k (or sumdoc when < k carry the field); counts sum to
    the number of classed neighbors."""
    from __spark_entry__ import _KNN_K, _q_classify_knn, _q_mlt, _searcher
    rows = _q_classify_knn(spark, SF).collect()
    assert rows
    nb = [(r.doc_id, r.score) for r in _q_mlt(spark, SF).collect()]
    mx = max(s for _, s in nb)
    se = _searcher(spark, SF)
    lang = {r.docid: r.lang for r in
            se.ix.source.select("docid", "lang").collect()}
    classed = [(d, s) for d, s in nb if lang.get(d) is not None]
    sumdoc = len(classed)
    denom = sumdoc if sumdoc < _KNN_K else _KNN_K
    from collections import defaultdict
    boost = defaultdict(float)
    cnt = defaultdict(int)
    for d, s in classed:
        boost[lang[d]] += s / mx
        cnt[lang[d]] += 1
    for r in rows:
        assert r.n == cnt[r.cls]
        assert abs(r.score - boost[r.cls] / denom) < 1e-5
    assert sum(r.n for r in rows) == sumdoc


def test_diversified_caps_hits_per_key(spark):
    """No key appears more than maxHitsPerKey (2) times, and the
    result equals filtering the full ranking by the per-key cap."""
    from lucene_solr_spark.search.query import Term
    from __spark_entry__ import _q_diversified, _searcher
    rows = _q_diversified(spark, SF).collect()
    assert rows
    from collections import Counter
    per_key = Counter(r.source for r in rows)
    assert max(per_key.values()) <= 2
    # reconstruct: walk the full ranking, keep ≤2 per key, take 10
    se = _searcher(spark, SF)
    full = (se.scored(Term("the")).withColumn("score",
                                              F.round("score", 6))
            .join(se.ix.source.select("docid", "source"), "docid")
            .orderBy(F.desc("score"), F.asc("docid")).collect())
    seen, expect = Counter(), []
    for r in full:
        if seen[r.source] < 2:
            seen[r.source] += 1
            expect.append((r.docid, r.score))
        if len(expect) == 10:
            break
    assert [(r.doc_id, r.score) for r in rows] == expect


def test_covering_respects_per_doc_min_match(spark):
    """Matching docs satisfy nm >= min_match(doc); a doc with nm below
    its per-doc requirement never appears."""
    from lucene_solr_spark.search.query import Term
    from __spark_entry__ import _q_covering, _searcher
    rows = _q_covering(spark, SF).collect()
    assert rows
    se = _searcher(spark, SF)
    nm = {}
    for t in ("dup", "join", "batch"):
        for r in se.matching(Term(t)).collect():
            nm[r.docid] = nm.get(r.docid, 0) + 1
    chars = {r.docid: r.n_chars for r in
             se.ix.source.select("docid", "n_chars").collect()}
    for r in rows:
        need = 1 if chars[r.doc_id] < 200 else 2
        assert nm[r.doc_id] >= need
