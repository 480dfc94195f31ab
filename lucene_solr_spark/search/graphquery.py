"""Solr {!graph} traversal query — breadth-first frontier expansion.

Mirrors GraphQuery/GraphQueryWeight.getDocSet (solr/core/src/java/
org/apache/solr/search/join/GraphQuery.java:178-238) re-expressed as
iterative DataFrame joins:

- frontier 0 = the root query's matches (``currentDepth`` 0);
- each level collects the ``to``-field (edge) values of NEW frontier
  docs and matches docs whose ``from``-field holds one of them
  (GraphTermsCollector + getResultQuery on the match field —
  GraphQuery.java:145-146 maps match=fromField, collect=toField);
- already-visited docs are skipped (the collector's skipSet is the
  accumulated result bitset) — here an anti join against the visited
  frontier union;
- ``traversalFilter`` ANDs into every frontier AFTER the root
  (GraphQuery.java:212-216);
- ``maxDepth`` counts the root as depth 0 and admits matches AT the
  max depth without expanding their edges (GraphQuery.java:193-198):
  maxDepth=0 -> roots only, maxDepth=1 -> roots + one hop;
- ``returnRoot=false`` removes the depth-0 set from the final result
  even when a root is reachable again later (the final
  ``andNot(rootBits)`` at GraphQuery.java:240-244);
- ``onlyLeafNodes=true`` keeps only docs with no value in the edge
  field (resolveLeafNodes' docs-without-terms set).

Scale shape: each level is one hash semi-join of the (small) frontier
key set against the collection — the frontier broadcast-joins when it
fits, and the loop is bounded by maxDepth (the production call shape;
unbounded graphs converge in diameter iterations). No driver-side
materialization of doc sets: the loop carries DataFrames, and only
unbounded traversals need a per-level emptiness check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_traverse(src: DataFrame, roots: DataFrame,
                   from_col: str, to_col: str,
                   max_depth: int = -1,
                   traversal_filter=None,
                   return_root: bool = True,
                   only_leaf_nodes: bool = False) -> DataFrame:
    """BFS doc-set traversal. ``src`` is the collection (must carry
    ``from_col`` and ``to_col``), ``roots`` the root matches (same
    schema or at least ``from_col``). ``traversal_filter`` is a
    Column predicate over ``src`` rows — or a DataFrame of allowed
    ``from_col`` keys (a query match set, applied as a semi join) —
    restricting every post-root frontier. Returns distinct ``from_col`` ids with their discovery
    ``depth`` (minimum level, like the bitset union)."""
    if max_depth < 0:
        raise ValueError("graph_traverse: unbounded traversal needs "
                         "an explicit maxDepth here (the driver-"
                         "loop emptiness probe is the caller's "
                         "choice at scale)")
    frontier = roots.select(F.col(from_col)).distinct() \
        .withColumn("depth", F.lit(0))
    visited = frontier
    for depth in range(1, max_depth + 1):
        edges = (src.join(frontier.select(from_col), from_col)
                 .select(F.col(to_col).alias(from_col))
                 .where(F.col(from_col).isNotNull()).distinct())
        nxt = src.join(edges, from_col, "left_semi")
        if traversal_filter is not None:
            if isinstance(traversal_filter, DataFrame):
                nxt = nxt.join(
                    traversal_filter.select(from_col).distinct(),
                    from_col, "left_semi")
            else:
                nxt = nxt.filter(traversal_filter)
        frontier = (nxt.select(from_col).distinct()
                    .join(visited.select(from_col), from_col,
                          "left_anti")
                    .withColumn("depth", F.lit(depth)))
        visited = visited.unionByName(frontier)
    out = visited
    if not return_root:
        out = out.filter(F.col("depth") > 0)
    if only_leaf_nodes:
        leaves = src.filter(F.col(to_col).isNull()) \
            .select(from_col)
        out = out.join(leaves, from_col, "left_semi")
    return out
