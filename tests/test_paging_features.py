"""CursorMark keyset paging, FeatureField saturation scoring, and
facet.query — laws on real testdata (driver parity in
tools/verify_contract.py)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.query import Term

SF = "/root/testdata/sf0.001"


def test_cursor_mark_equals_rows_6_to_10(spark):
    """Keyset page 2 must equal rows 6-10 of the global total order —
    the CursorMark contract (no skipped/duplicated docs across
    pages)."""
    from __spark_entry__ import _q_cursor_mark, _searcher
    page2 = [(r.doc_id, r.score)
             for r in _q_cursor_mark(spark, SF).collect()]
    se = _searcher(spark, SF)
    full = (se.scored(Term("the"))
            .select("docid", F.round("score", 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("docid")).limit(10)
            .collect())
    assert page2 == [(r.docid, r.score) for r in full[5:10]]


def test_feature_sat_score_law(spark):
    """score = BM25(text) + w * v/(v+pivot), monotone in the feature
    value: two docs with equal text score order by n_chars."""
    from __spark_entry__ import (
        _FEAT_PIVOT, _FEAT_W, _q_feature_sat, _searcher,
    )
    rows = _q_feature_sat(spark, SF).collect()
    assert rows
    se = _searcher(spark, SF)
    base = {r.docid: r.score
            for r in se.scored(Term("join")).collect()}
    chars = {r.docid: r.n_chars for r in
             se.ix.source.select("docid", "n_chars").collect()}
    for r in rows:
        v = chars[r.doc_id]
        expect = base[r.doc_id] + _FEAT_W * v / (v + _FEAT_PIVOT)
        assert abs(r.score - expect) < 1e-5
        # saturation bounded by the weight
        assert r.score - base[r.doc_id] < _FEAT_W


def test_facet_query_counts_match_matching(spark):
    from __spark_entry__ import _FACET_QUERIES, _q_facet_query, _searcher
    rows = {r.facet: r.n for r in _q_facet_query(spark, SF).collect()}
    se = _searcher(spark, SF)
    assert set(rows) == {label for label, _ in _FACET_QUERIES}
    for label, ast in _FACET_QUERIES:
        assert rows[label] == se.matching(ast).count()


def test_session_gap_partitions_events(spark):
    """Sessions partition the event stream: per-session counts sum to
    the table total, and no session spans a >=30-minute silence."""
    from __spark_entry__ import _s_session_gap
    rows = _s_session_gap(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert sum(r.n_events for r in rows) == ev.count()
    assert len(rows) >= ev.select("user_id").distinct().count()


def test_blended_df_flattens_idf(spark):
    """BlendedTermQuery law: with df blended to the shared max, a doc
    matching only the RARE term cannot out-idf one matching only the
    COMMON term at equal tf/qdl — and the combined score is
    mx + 0.01*(sum-mx) over the per-term scores."""
    from __spark_entry__ import _BLEND_TERMS, _q_blended, _searcher
    from lucene_solr_spark.search.bm25 import idf_sql, score_sql
    rows = _q_blended(spark, SF).collect()
    assert rows
    se = _searcher(spark, SF)
    ix = se.ix
    dfb = (ix.term_stats.filter(F.col("term").isin(list(_BLEND_TERMS)))
           .agg(F.max("df").alias("d")).collect()[0].d)
    sc = score_sql("tf", "qdl", idf_sql(str(dfb), str(ix.doc_count)),
                   ix.avgdl_sql)
    per = (ix.postings.filter(F.col("term").isin(list(_BLEND_TERMS)))
           .join(ix.docs.select("docid", "qdl"), "docid")
           .selectExpr("docid", f"{sc} AS s").collect())
    from collections import defaultdict
    by_doc = defaultdict(list)
    for r in per:
        by_doc[r.docid].append(r.s)
    for r in rows:
        ss = by_doc[r.doc_id]
        expect = max(ss) + 0.01 * (sum(ss) - max(ss))
        assert abs(r.score - expect) < 1e-5


def test_graph_bfs_depth_law(spark):
    """Graph traversal: depth-0 rows are exactly the root match set;
    every depth-d>0 node has a child at depth d-1 linking to it; no
    node exceeds maxDepth."""
    from __spark_entry__ import _GRAPH_DEPTH, _q_graph, _searcher
    from lucene_solr_spark.search.query import Term
    rows = {r.doc_id: r.depth for r in _q_graph(spark, SF).collect()}
    assert rows and max(rows.values()) <= _GRAPH_DEPTH
    se = _searcher(spark, SF)
    roots = {r.docid for r in se.matching(Term("dup")).collect()}
    assert {d for d, dep in rows.items() if dep == 0} == roots
    parent = {d: (d * 7 + 3) % 97 for d in
              [r.doc_id for r in
               spark.read.parquet(f"{SF}/documents.parquet")
               .select("doc_id").collect()]}
    for node, dep in rows.items():
        if dep > 0:
            assert any(parent.get(c) == node and rows.get(c) == dep - 1
                       for c in rows), (node, dep)
