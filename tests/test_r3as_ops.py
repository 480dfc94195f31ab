"""Round-3as ops: {!graph} traversal (GraphQueryParser.java:30 ->
GraphQuery.java:178-238 BFS) and the {!join} qparser
(JoinQParserPlugin)."""

import pytest

from lucene_solr_spark.search.localparams import (Graph,
                                                  LocalParamsError,
                                                  XCJoin,
                                                  local_query)
from lucene_solr_spark.search.query import Term

SF = "/root/testdata/sf0.001"


def _chain_src(spark, n=32, block=8):
    from pyspark.sql import functions as F
    return (spark.range(n).select(F.col("id").alias("doc_id"))
            .withColumn("prev_id",
                        F.when(F.col("doc_id") % block != 0,
                               F.col("doc_id") - 1)))


def _roots(spark, ids):
    from pyspark.sql import functions as F
    return spark.createDataFrame([(i,) for i in ids], ["doc_id"])


def _traverse(spark, ids, **kw):
    from lucene_solr_spark.search.graphquery import graph_traverse
    out = graph_traverse(_chain_src(spark), _roots(spark, ids),
                         "doc_id", "prev_id", **kw)
    return sorted((r["doc_id"], r["depth"]) for r in out.collect())


def test_graph_parse():
    spec = local_query("{!graph from=doc_id to=prev_id maxDepth=2 "
                       "returnRoot=false returnOnlyLeaf=true "
                       "traversalFilter='sort'}merge")
    assert isinstance(spec, Graph)
    assert spec.from_field == "doc_id"
    assert spec.to_field == "prev_id"
    assert spec.max_depth == 2
    assert spec.return_root is False
    assert spec.only_leaf is True
    assert spec.traversal_filter == Term("sort")
    d = local_query("{!graph}merge")
    assert (d.from_field, d.to_field, d.max_depth,
            d.return_root, d.only_leaf) \
        == ("node_id", "edge_ids", -1, True, False)


def test_bfs_chain_depths(spark):
    # seed 11: chain 11 -> 10 -> 9 -> 8 (block head), depths 0..3
    assert _traverse(spark, [11], max_depth=3) \
        == [(8, 3), (9, 2), (10, 1), (11, 0)]
    # maxDepth counts the root as 0 (GraphQuery.java:193): 0 = roots
    assert _traverse(spark, [11], max_depth=0) == [(11, 0)]
    assert _traverse(spark, [11], max_depth=1) \
        == [(10, 1), (11, 0)]


def test_bfs_visited_min_depth(spark):
    # overlapping chains: 11 reaches 10 at depth 1; seed 10 is a
    # root — visited docs keep their FIRST (minimum) depth
    assert _traverse(spark, [10, 11], max_depth=2) \
        == [(8, 2), (9, 1), (10, 0), (11, 0)]


def test_return_root_false_excludes_roots(spark):
    out = _traverse(spark, [11], max_depth=3, return_root=False)
    assert out == [(8, 3), (9, 2), (10, 1)]


def test_only_leaf_nodes(spark):
    # leaves = docs with NO edge value = block heads (doc_id % 8 == 0)
    out = _traverse(spark, [11], max_depth=3,
                    only_leaf_nodes=True)
    assert out == [(8, 3)]


def test_traversal_filter_dataframe(spark):
    # allow only even ids in post-root frontiers: 11 -> 10 passes,
    # 10 -> 9 blocked (odd), traversal stops
    allowed = _roots(spark, [0, 2, 4, 6, 8, 10])
    out = _traverse(spark, [11], max_depth=3,
                    traversal_filter=allowed)
    assert out == [(10, 1), (11, 0)]


def test_unbounded_depth_raises(spark):
    with pytest.raises(ValueError, match="maxDepth"):
        _traverse(spark, [11], max_depth=-1)


def test_join_parse():
    spec = local_query("{!join fromIndex=events from=user_id "
                       "to=doc_id}event_type:purchase")
    assert isinstance(spec, XCJoin)
    assert spec.predicate == ("eq", "event_type", "purchase")
    assert local_query("{!join from=a to=b}*:*").predicate \
        == ("all",)
    with pytest.raises(LocalParamsError):
        local_query("{!join from=a}x:y")
    with pytest.raises(LocalParamsError):
        local_query("{!join from=a to=b}bad body syntax")
