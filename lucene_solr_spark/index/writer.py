"""IndexWriter: incremental, resumable segment-store appends + merges.

The Spark re-expression of Lucene's write path
(INDEX/IndexWriter.java:1212 addDocument -> DWPT flush -> publish ->
TieredMergePolicy -> commit; INDEX/SegmentInfos.java generations):

- ``append(batch)`` = one "flush": assign docids continuing from the
  commit's doc_count (insertion-ordered like Lucene docIDs), build
  packed segments + norms for the batch, write them as NEW seg_id
  partitions, then atomically swap ``commit.json`` to a new generation
  whose catalog/term_stats snapshots include the batch. A crash before
  the swap leaves orphan partitions that no reader sees and that the
  next append simply ignores — that is the checkpoint/resume story
  (the north rule's "resumable from checkpoint with per-partition
  lineage + metrics").
- ``maybe_merge()`` = TieredMergePolicy
  (INDEX/TieredMergePolicy.java:312-401,565-625): size-tiered
  selection over the catalog, restricted to docid-adjacent runs so
  merged segments stay contiguous ranges. The merge job itself is a
  **bulk merge**: because blocks carry explicit lengths, a merged
  posting row is the docid-ordered concatenation of the source rows'
  block arrays — pure JVM (sort_array + flatten), no decode, exactly
  Lucene's bulk-merge fast path (FieldsConsumer.merge:86).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .builder import InvertedIndex, build_index
from .docids import assign_docids
from .segments import (
    SegmentIndex, build_norms, build_packed_postings, catalog_from_packed,
    read_commit, write_commit,
)


class IndexWriter:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- lifecycle ----------------------------------------------------------

    @classmethod
    def create(cls, spark: SparkSession, path: str,
               docs_per_segment: int = 65536) -> "IndexWriter":
        os.makedirs(path, exist_ok=True)
        write_commit(path, generation=0, doc_count=0, sum_ttf=0,
                     docs_per_segment=docs_per_segment, next_seg_id=0,
                     live_segs=[])
        return cls(spark, path)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "IndexWriter":
        read_commit(path)  # must exist
        return cls(spark, path)

    def commit_state(self) -> dict:
        return read_commit(self.path)

    def reader(self) -> SegmentIndex:
        from .segments import open_segments
        return open_segments(self.spark, self.path)

    # -- append -------------------------------------------------------------

    def append(self, batch: DataFrame, text_col: str = "text",
               order_cols: list | None = None, analyzer: str = "simple",
               lineage: str = "") -> SegmentIndex:
        """Index a new document batch (docids continue from doc_count)."""
        st = self.commit_state()
        order_cols = order_cols or ["conv_id", "turn_idx"]
        with_ids = assign_docids(batch, order_cols)
        if st["doc_count"]:
            with_ids = with_ids.withColumn(
                "docid", F.col("docid") + st["doc_count"])
        ix = build_index(with_ids, text_col=text_col, docid_col="docid",
                         analyzer=analyzer, cache=False)
        return self.append_index(ix, lineage=lineage)

    def append_index(self, ix: InvertedIndex, lineage: str = "") -> SegmentIndex:
        """Publish an already-built InvertedIndex whose docids start at
        the current commit's doc_count (segment-publish step)."""
        st = self.commit_state()
        dps = st["docs_per_segment"]
        base = st["doc_count"]
        seg_base = st["next_seg_id"]
        # resume: partitions at seg_id >= next_seg_id are orphans of a
        # crashed append (never referenced by any commit) — drop them so
        # the retry writes into clean partitions
        self._drop_orphans(seg_base)

        packed = build_packed_postings(ix.postings, ix.docs, dps,
                                       base_docid=base, seg_id_base=seg_base)
        (packed.repartition("seg_id")
         .sortWithinPartitions("seg_id", "term")
         .write.mode("append").partitionBy("seg_id")
         .parquet(f"{self.path}/postings"))

        norms = build_norms(ix.docs, dps, base_docid=base,
                            seg_id_base=seg_base)
        (norms.write.mode("append").partitionBy("seg_id")
         .parquet(f"{self.path}/norms"))

        gen = st["generation"] + 1
        new_segs = [r["seg_id"] for r in
                    self.spark.read.parquet(f"{self.path}/norms")
                    .filter(F.col("seg_id") >= seg_base)
                    .select("seg_id").distinct().collect()]
        live = sorted(set(st.get("live_segs", [])) | set(new_segs))

        # catalog snapshot = previous snapshot + new segment rows
        pk_new = (self.spark.read.parquet(f"{self.path}/postings")
                  .filter(F.col("seg_id").isin(new_segs)))
        nm_new = (self.spark.read.parquet(f"{self.path}/norms")
                  .filter(F.col("seg_id").isin(new_segs)))
        cat_new = catalog_from_packed(pk_new, nm_new, lineage)
        if st["generation"] > 0:
            cat_prev = self.spark.read.parquet(
                f"{self.path}/catalog/gen={st['generation']}")
            cat_new = cat_prev.unionByName(cat_new)
        cat_new.write.mode("overwrite").parquet(
            f"{self.path}/catalog/gen={gen}")

        # term_stats snapshot = previous + batch, summed
        ts_new = ix.term_stats
        if st["generation"] > 0:
            ts_prev = self.spark.read.parquet(
                f"{self.path}/term_stats/gen={st['generation']}")
            ts_new = (ts_prev.unionByName(ts_new)
                      .groupBy("term")
                      .agg(F.sum("df").cast("long").alias("df"),
                           F.sum("ttf").cast("long").alias("ttf")))
        ts_new.write.mode("overwrite").parquet(
            f"{self.path}/term_stats/gen={gen}")

        write_commit(self.path, generation=gen,
                     doc_count=st["doc_count"] + ix.doc_count,
                     sum_ttf=st["sum_ttf"] + ix.sum_ttf,
                     docs_per_segment=dps,
                     next_seg_id=(max(live) + 1) if live else 0,
                     live_segs=live, lineage=lineage)
        return self.reader()

    # -- tiered merge -------------------------------------------------------

    def maybe_merge(self, segs_per_tier: int = 10,
                    max_merge_at_once: int = 10,
                    floor_bytes: int = 2 << 20,
                    max_merged_bytes: int = 5 << 30) -> int:
        """Run the tiered policy until no merge qualifies; returns the
        number of merges executed."""
        n = 0
        while True:
            cat = [r.asDict() for r in self.reader().catalog.collect()]
            pick = pick_merge(cat, segs_per_tier, max_merge_at_once,
                              floor_bytes, max_merged_bytes)
            if not pick:
                return n
            self.merge_segments(pick)
            n += 1

    def merge_segments(self, seg_ids: list) -> SegmentIndex:
        """Bulk-merge docid-adjacent segments into one new segment."""
        st = self.commit_state()
        seg_ids = sorted(seg_ids)
        new_id = st["next_seg_id"]
        pk = (self.spark.read.parquet(f"{self.path}/postings")
              .filter(F.col("seg_id").isin(seg_ids)))
        # concatenation order must be docid order; seg_id order diverges
        # from it once merged segments (fresh, higher ids) re-merge, so
        # sort by the catalog's docid_min
        rng = {r["seg_id"]: int(r["docid_min"])
               for r in (self.reader().catalog
                         .filter(F.col("seg_id").isin(seg_ids))
                         .select("seg_id", "docid_min").collect())}
        rng_df = self.spark.createDataFrame(
            [(k, v) for k, v in rng.items()], "seg_id INT, docid_min LONG")
        pk = pk.join(F.broadcast(rng_df), "seg_id")
        merged = (pk.groupBy("term")
                  .agg(F.sort_array(F.collect_list(F.struct(
                      "docid_min", "df", "ttf", "doc_blocks", "tf_blocks",
                      "pos_blocks", "skip_last_docid", "skip_n_docs",
                      "skip_max_tf", "skip_min_qdl"))).alias("pl"))
                  .select(
                      F.lit(new_id).cast("int").alias("seg_id"),
                      "term",
                      F.aggregate("pl.df", F.lit(0).cast("long"),
                                  lambda a, x: a + x).alias("df"),
                      F.aggregate("pl.ttf", F.lit(0).cast("long"),
                                  lambda a, x: a + x).alias("ttf"),
                      F.flatten("pl.doc_blocks").alias("doc_blocks"),
                      F.flatten("pl.tf_blocks").alias("tf_blocks"),
                      F.flatten("pl.pos_blocks").alias("pos_blocks"),
                      F.flatten("pl.skip_last_docid").alias("skip_last_docid"),
                      F.flatten("pl.skip_n_docs").alias("skip_n_docs"),
                      F.flatten("pl.skip_max_tf").alias("skip_max_tf"),
                      F.flatten("pl.skip_min_qdl").alias("skip_min_qdl")))
        (merged.repartition(1).sortWithinPartitions("term")
         .write.mode("append").partitionBy("seg_id")
         .parquet(f"{self.path}/postings"))

        nm = (self.spark.read.parquet(f"{self.path}/norms")
              .filter(F.col("seg_id").isin(seg_ids)))

        def _merge_norms(it):
            import numpy as np
            import pandas as pd
            rows = []
            for pdf in it:
                rows.extend(pdf.to_dict("records"))
            if not rows:
                return
            rows.sort(key=lambda r: r["docid_min"])
            lo = int(rows[0]["docid_min"])
            spans = [(int(r["docid_min"]),
                      np.frombuffer(r["norm_blob"], dtype=np.uint8),
                      np.frombuffer(r["qdl_blob"], dtype=np.int32))
                     for r in rows]
            hi = max(s[0] + s[1].size for s in spans)
            nb = np.zeros(hi - lo, dtype=np.uint8)
            qb = np.zeros(hi - lo, dtype=np.int32)
            for s0, b, q in spans:
                nb[s0 - lo:s0 - lo + b.size] = b
                qb[s0 - lo:s0 - lo + q.size] = q
            yield pd.DataFrame({
                "seg_id": [new_id], "docid_min": [lo],
                "n_docs": [int(sum(r["n_docs"] for r in rows))],
                "norm_blob": [nb.tobytes()], "qdl_blob": [qb.tobytes()]})

        (nm.repartition(1).mapInPandas(_merge_norms, nm.schema)
         .write.mode("append").partitionBy("seg_id")
         .parquet(f"{self.path}/norms"))

        gen = st["generation"] + 1
        live = sorted((set(st["live_segs"]) - set(seg_ids)) | {new_id})
        pk_new = (self.spark.read.parquet(f"{self.path}/postings")
                  .filter(F.col("seg_id") == new_id))
        nm_new = (self.spark.read.parquet(f"{self.path}/norms")
                  .filter(F.col("seg_id") == new_id))
        lineage = f"merge({','.join(map(str, seg_ids))})"
        cat_prev = (self.spark.read.parquet(
            f"{self.path}/catalog/gen={st['generation']}")
            .filter(~F.col("seg_id").isin(seg_ids)))
        cat = cat_prev.unionByName(
            catalog_from_packed(pk_new, nm_new, lineage))
        cat.write.mode("overwrite").parquet(f"{self.path}/catalog/gen={gen}")
        # term stats unchanged by merge — snapshot carries forward
        src = f"{self.path}/term_stats/gen={st['generation']}"
        dst = f"{self.path}/term_stats/gen={gen}"
        self.spark.read.parquet(src).write.mode("overwrite").parquet(dst)

        write_commit(self.path, generation=gen, doc_count=st["doc_count"],
                     sum_ttf=st["sum_ttf"], docs_per_segment=st["docs_per_segment"],
                     next_seg_id=new_id + 1, live_segs=live, lineage=lineage)
        return self.reader()

    def _drop_orphans(self, next_seg_id: int) -> None:
        for sub in ("postings", "norms"):
            root = os.path.join(self.path, sub)
            if not os.path.isdir(root):
                continue
            for d in os.listdir(root):
                if d.startswith("seg_id=") and \
                        int(d.split("=")[1]) >= next_seg_id:
                    shutil.rmtree(os.path.join(root, d))

    def vacuum(self) -> list:
        """Delete non-live seg_id partition dirs (old merged inputs)."""
        st = self.commit_state()
        live = set(st["live_segs"])
        removed = []
        for sub in ("postings", "norms"):
            root = os.path.join(self.path, sub)
            if not os.path.isdir(root):
                continue
            for d in os.listdir(root):
                if d.startswith("seg_id="):
                    sid = int(d.split("=")[1])
                    if sid not in live:
                        shutil.rmtree(os.path.join(root, d))
                        removed.append(f"{sub}/{d}")
        return removed


# ---------------------------------------------------------------------------
# tiered merge policy (INDEX/TieredMergePolicy.java:312-401,565-625)
# ---------------------------------------------------------------------------

def pick_merge(catalog: list, segs_per_tier: int = 10,
               max_merge_at_once: int = 10, floor_bytes: int = 2 << 20,
               max_merged_bytes: int = 5 << 30):
    """Pick one merge (list of seg_ids) or None.

    Reproduces the tiered shape: segments sorted by size, the allowed
    segment budget = segsPerTier per size tier above the floor; when
    over budget, score docid-adjacent candidate runs by skew ×
    size^0.05 (TieredMergePolicy.score — smaller merges of equal-sized
    segments win) and return the best one under max_merged_bytes.
    Adjacency (by docid range) is our extra constraint so merged
    segments stay contiguous — Lucene concatenates arbitrary segments
    because its docids are per-segment; ours are global.
    """
    if len(catalog) < 2:
        return None
    by_size = sorted(catalog, key=lambda r: -r["packed_bytes"])
    # allowed count: log_{segsPerTier}(total/floor) tiers * segsPerTier
    total = sum(max(r["packed_bytes"], 1) for r in by_size)
    floored = max(float(floor_bytes), 1.0)
    level = total
    allowed = 0.0
    while level >= floored and allowed < 10_000:
        allowed += segs_per_tier
        level /= float(segs_per_tier)
    # sub-floor segments form one tier of their own (Lucene's floorSize)
    allowed = max(allowed, float(segs_per_tier))
    if len(catalog) <= int(allowed):
        return None

    by_range = sorted(catalog, key=lambda r: r["docid_min"])
    best, best_score = None, None
    for i in range(len(by_range)):
        run, run_bytes = [], 0
        for j in range(i, min(i + max_merge_at_once, len(by_range))):
            run.append(by_range[j])
            run_bytes += max(by_range[j]["packed_bytes"], 1)
            if run_bytes > max_merged_bytes:
                break
            if len(run) < 2:
                continue
            floored_sizes = [max(r["packed_bytes"], 1) for r in run]
            skew = max(floored_sizes) / float(sum(floored_sizes))
            score = skew * math.pow(sum(floored_sizes), 0.05)
            if best_score is None or score < best_score:
                best_score = score
                best = [r["seg_id"] for r in run]
    return best
