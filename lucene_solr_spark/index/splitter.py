"""Index splitting: by query (PKIndexSplitter) and round-robin parts
(MultiPassIndexSplitter).

The reference's misc-module splitters build the split as "the same
index minus the other side's documents":

- PKIndexSplitter (lucene/misc/src/java/org/apache/lucene/index/
  PKIndexSplitter.java:38) writes two indexes from one source — docs
  passing a filter query and the complement — by addIndexes over a
  reader view that hides the other side.
- MultiPassIndexSplitter (lucene/misc/src/java/org/apache/lucene/
  index/MultiPassIndexSplitter.java:43) makes N passes over the
  source; pass i keeps docs with ``docid % n == i`` (or contiguous
  ranges with ``--seq``), "deleting" the rest through a
  FakeDeleteIndexReader before copying.

This store expresses both the same way the reference does — replicate
the commit point, mark the complement deleted, then expunge-merge so
the survivors are physically rewritten and the collection/term
statistics shrink to the split (the role of the reference's
addIndexes copy):

1. ``replicate(src, dst)`` — incremental gen-dir copy + atomic
   commit swap (index/replicator.py);
2. ``delete_by_query`` / ``delete_docids_df`` — distributed hit
   resolution, the delete set never passes through the driver;
3. per-segment ``merge_segments([seg], expunge=True)`` — each segment
   rewritten in place of its deleted docs (expungeDeletes shape;
   Lucene renumbers docids on its copy, this store keeps the original
   docids — a representation difference, the document sets and every
   per-doc posting/norm are identical), then ``vacuum`` drops the
   dead generations.

At 100 TB each step is metadata- or scan-bounded: the replica copy is
a distributed FS copy of immutable directories, the delete set is one
pushed parquet write, and each expunge touches one segment's rows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from .replicator import replicate
from .segments import SegmentIndex
from .writer import IndexWriter

__all__ = ["expunge_all", "live_docids", "split_by_query",
           "split_round_robin"]


def live_docids(six: SegmentIndex):
    """Live docids of a store as a DataFrame (the liveDocs bitset
    read, MultiBits over per-segment live docs): positions with a
    nonzero norm byte in each segment's norms blob (expunged docs are
    zeroed in place — writer._merge_norms keeps blobs full-width),
    minus the not-yet-expunged delete sets.  One Arrow pass over the
    norms rows (segment-count bounded), no driver materialization.

    Caveat mirrored from the encoding: a live but token-less doc has
    norm byte 0 (SmallFloat(0)) and is indistinguishable from an
    expunged position here — such docs carry no postings and can
    never match a query, but a split would mis-place them; this
    store's writers always index non-empty text rows."""
    import pandas as pd  # noqa: F401  (imported in the worker below)
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("docid", LongType())])

    def fn(it):
        import numpy as np
        import pandas as pd
        for pdf in it:
            for r in pdf.itertuples(index=False):
                nb = np.frombuffer(r.norm_blob, dtype=np.uint8)
                ids = int(r.docid_min) + np.flatnonzero(nb)
                yield pd.DataFrame({"docid": ids.astype(np.int64)})

    ids = (six.norms.select("docid_min", "norm_blob")
           .mapInPandas(fn, schema))
    return ids.join(six.deleted, "docid", "left_anti")


def expunge_all(w: IndexWriter) -> SegmentIndex:
    """expungeDeletes over every live segment that carries deletes
    (IndexWriter.forceMergeDeletes — MergePolicy.findForcedDeletesMerges
    selects exactly the segments with deletions): each is rewritten
    singly, keeping the store's segment granularity (no forceMerge(1)
    collapse), then dead generations are vacuumed."""
    six = w.reader()
    if six.del_gens:
        with_dels = sorted(
            r["seg_id"]
            for r in six.deleted_by_segment().select("seg_id").collect())
        for seg in with_dels:
            w.merge_segments([seg], expunge=True)
    w.vacuum()
    return w.reader()


def split_by_query(spark: SparkSession, src: str, dst_pass: str,
                   dst_fail: str, query) -> tuple:
    """PKIndexSplitter.java:38 — split ``src`` into the docs matching
    ``query`` (-> ``dst_pass``) and the complement (-> ``dst_fail``).

    Returns ``(SegmentIndex_pass, SegmentIndex_fail)``.  Either side
    may be empty (all docs deleted) — its reader then reports
    ``doc_count`` minus the whole corpus, like an empty reference
    index dir."""
    out = []
    for dst, invert in ((dst_pass, True), (dst_fail, False)):
        replicate(src, dst)
        w = IndexWriter.open(spark, dst)
        six = w.reader()
        from ..search.segment_searcher import SegmentSearcher
        hits = SegmentSearcher(six).scored(query).select("docid")
        if invert:
            # drop the complement: live docids minus the hit set
            # (DocumentFilteredLeafIndexReader's negated liveDocs),
            # a distributed anti-join — no driver materialization
            drop = live_docids(six).join(hits, "docid", "left_anti")
            w.delete_docids_df(drop, lineage=f"pk-split keep={query!r}")
        else:
            w.delete_by_query(query, lineage=f"pk-split drop={query!r}")
        out.append(expunge_all(w))
    return tuple(out)


def split_round_robin(spark: SparkSession, src: str, dsts: list,
                      sequential: bool = False) -> list:
    """MultiPassIndexSplitter.java:43 — split ``src`` into
    ``len(dsts)`` parts; part i keeps ``docid % n == i`` (or the i-th
    contiguous docid range with ``sequential=True``, the --seq flag).

    The part count must be >= 2, like the reference's argument
    check."""
    n = len(dsts)
    if n < 2:
        raise ValueError("need at least 2 destinations")
    src_reader = IndexWriter.open(spark, src).reader()
    lo, hi = None, None
    if sequential:
        # docid span from the norms blobs (byte-per-doc width)
        bounds = (src_reader.norms
                  .select("docid_min",
                          (F.col("docid_min") + F.length("norm_blob")
                           - 1).alias("docid_max"))
                  .agg(F.min("docid_min").alias("lo"),
                       F.max("docid_max").alias("hi")).collect()[0])
        lo, hi = int(bounds["lo"]), int(bounds["hi"])
    out = []
    for i, dst in enumerate(dsts):
        replicate(src, dst)
        w = IndexWriter.open(spark, dst)
        docs = live_docids(w.reader())
        if sequential:
            # i-th of n contiguous docid ranges over [lo, hi]:
            # MultiPassIndexSplitter --seq uses partLen = maxDoc /
            # numParts (FLOOR) with the LAST part absorbing the
            # remainder (10 docs / 3 parts -> 3/3/4, not 4/4/2);
            # width 0 (more parts than docs) leaves every part but
            # the last empty, exactly like the reference
            width = (hi - lo + 1) // n
            a = lo + i * width
            b = (hi + 1) if i == n - 1 else lo + (i + 1) * width
            drop = docs.filter(~((F.col("docid") >= a)
                                 & (F.col("docid") < b)))
        else:
            drop = docs.filter(F.col("docid") % n != i)
        w.delete_docids_df(drop, lineage=f"rr-split part {i}/{n}")
        out.append(expunge_all(w))
    return out
