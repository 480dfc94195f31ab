"""IndexWriter: incremental, resumable segment-store appends + merges.

The Spark re-expression of Lucene's write path
(INDEX/IndexWriter.java:1212 addDocument -> DWPT flush -> publish ->
TieredMergePolicy -> commit; INDEX/SegmentInfos.java generations):

- ``append_raw(batch)`` = one "flush": assign docids continuing from
  the commit's doc_count (insertion-ordered like Lucene docIDs), build
  packed segments + norms for the batch with ONE data shuffle, and
  write them into fresh per-generation directories
  (``segments/gen=N`` — unified posting rows + the per-segment norms
  row from ONE kernel pass) — plain parquet appends, no
  dynamic-partition write, no sort (the build kernel already emits
  rows segment-grouped and term-sorted, so parquet row-group min/max
  stats prune term lookups for free). The commit.json swap is atomic;
  a crashed append leaves a gen directory no commit references, and
  the retry simply overwrites it — that is the checkpoint/resume story
  (the north rule's "resumable from checkpoint with per-partition
  lineage + metrics").
- ``maybe_merge()`` = TieredMergePolicy
  (INDEX/TieredMergePolicy.java:312-401,565-625): size-tiered
  selection over the catalog, restricted to docid-adjacent runs so
  merged segments stay contiguous ranges. The merge job itself is a
  **bulk merge**: because blocks carry explicit lengths, a merged
  posting row is the docid-ordered concatenation of the source rows'
  block arrays — pure JVM (sort_array+flatten, no decode), exactly
  Lucene's bulk-merge fast path (codecs/FieldsConsumer.merge:86).
- ``vacuum()`` deletes generation directories whose segments are all
  dead (merge inputs), like Lucene deleting merged-away segment files.
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
    SegmentIndex, build_norms, build_packed_postings,
    build_segments_direct, catalog_from_packed, read_commit,
    unify_segment_frames, write_commit,
)

_COMMIT_KEYS = {"generation", "doc_count", "sum_ttf", "docs_per_segment",
                "next_seg_id", "live_segs", "lineage", "data_gens"}
_PENDING_COMMIT = "pending_commit.json"


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
                     live_segs=[], data_gens={})
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

    def _gen_dir(self, sub: str, gen: int) -> str:
        return f"{self.path}/{sub}/gen={gen}"

    def _extras(self, st: dict) -> dict:
        return {k: v for k, v in st.items() if k not in _COMMIT_KEYS}

    def _write_commit(self, st: dict, **updates) -> None:
        fname = (_PENDING_COMMIT if getattr(self, "_pending_mode", False)
                 else "commit.json")
        merged = {**st, **updates}
        write_commit(self.path,
                     generation=merged["generation"],
                     doc_count=merged["doc_count"],
                     sum_ttf=merged["sum_ttf"],
                     docs_per_segment=merged["docs_per_segment"],
                     next_seg_id=merged["next_seg_id"],
                     live_segs=merged["live_segs"],
                     lineage=merged.get("lineage", ""),
                     data_gens=merged.get("data_gens", {}),
                     filename=fname)
        extras = self._extras(st)
        if extras:
            import json
            p = os.path.join(self.path, fname)
            with open(p) as f:
                c = json.load(f)
            c.update(extras)
            tmp = p + ".tmp"
            with open(tmp, "w") as f:
                json.dump(c, f)
            os.replace(tmp, p)

    # -- two-phase commit -----------------------------------------------

    def prepare_commit(self, batch: DataFrame, text_col: str = "text",
                       order_cols: list | None = None,
                       lineage: str = "") -> dict:
        """IndexWriter.prepareCommit analogue (INDEX/IndexWriter.java
        prepareCommit: flush + fsync the pending segments_N WITHOUT
        making it visible; a later commit() finishes it, rollback()
        abandons it): runs the full append_raw build — segment data
        lands on disk under the next generation's dirs — but the
        commit record is written to ``pending_commit.json``; readers
        (which resolve ``commit.json``) cannot observe any of it.

        The promote step is a single local rename, so the external
        coordinator of a cross-system transaction (the reason
        prepareCommit exists) holds only an O(1) second phase.
        Raises if a prepared commit is already outstanding, like the
        reference ("prepareCommit was already called")."""
        if os.path.exists(os.path.join(self.path, _PENDING_COMMIT)):
            raise RuntimeError("prepareCommit was already called with "
                               "no corresponding call to commit")
        self._pending_mode = True
        try:
            self.append_raw(batch, text_col=text_col,
                            order_cols=order_cols,
                            lineage=lineage or "prepared append")
        finally:
            self._pending_mode = False
        import json
        with open(os.path.join(self.path, _PENDING_COMMIT)) as f:
            return json.load(f)

    def commit(self) -> SegmentIndex:
        """Second phase: atomically promote the prepared commit
        (IndexWriter.commit after prepareCommit) — one rename, after
        which readers see the new generation."""
        pending = os.path.join(self.path, _PENDING_COMMIT)
        if not os.path.exists(pending):
            raise RuntimeError("no prepared commit to finish")
        os.replace(pending, os.path.join(self.path, "commit.json"))
        return self.reader()

    def rollback(self) -> SegmentIndex:
        """IndexWriter.rollback analogue: abandon the prepared commit.
        The unreferenced generation dirs stay on disk exactly like a
        crashed append's (no commit references them; the next
        append/prepare to that generation overwrites them) — the same
        crash-retry story the module docstring documents."""
        pending = os.path.join(self.path, _PENDING_COMMIT)
        if os.path.exists(pending):
            os.remove(pending)
        return self.reader()

    # -- append -------------------------------------------------------------

    def append(self, batch: DataFrame, text_col: str = "text",
               order_cols: list | None = None, analyzer: str = "simple",
               lineage: str = "",
               extra_commit: dict | None = None) -> SegmentIndex:
        """Index a new document batch (docids continue from doc_count).

        ``extra_commit`` keys land in the SAME atomic commit.json swap
        as the generation bump — streaming callers stamp their batch id
        here so replay-dedup survives a crash between append and stamp
        (exactly-once; cf. Solr UpdateLog replay, UpdateLog.java:96)."""
        st = self.commit_state()
        order_cols = order_cols or ["conv_id", "turn_idx"]
        with_ids = assign_docids(batch, order_cols)
        # capture the persisted staging handle BEFORE any withColumn —
        # derived DataFrames don't carry the attribute forward
        staging = getattr(with_ids, "_docids_staging", None)
        if st["doc_count"]:
            with_ids = with_ids.withColumn(
                "docid", F.col("docid") + st["doc_count"])
        ix = build_index(with_ids, text_col=text_col, docid_col="docid",
                         analyzer=analyzer, cache=False)
        out = self.append_index(ix, lineage=lineage,
                                extra_commit=extra_commit)
        if staging is not None:
            staging.unpersist()
        return out

    def append_raw(self, batch: DataFrame, text_col: str = "text",
                   order_cols: list | None = None,
                   lineage: str = "",
                   extra_commit: dict | None = None) -> SegmentIndex:
        """The hot build path: raw docs -> segments with ONE data shuffle.

        Unlike append()/append_index() (which materialize the exploded
        (term, docid) postings DataFrame — the oracle-checkable layout),
        this ships raw text straight to per-segment builder tasks that
        tokenize + invert + pack in vectorized numpy/Arrow (the DWPT
        shape). Shuffled bytes = corpus size, not token-explosion size.
        Results are bit-identical: the kernel implements the same
        tokenizer spec and shares the SmallFloat/packing code paths
        (tests assert store equality against the exploded path)."""
        st = self.commit_state()
        dps = st["docs_per_segment"]
        base = st["doc_count"]
        seg_base = st["next_seg_id"]
        gen = st["generation"] + 1
        order_cols = order_cols or ["conv_id", "turn_idx"]

        ids = assign_docids(batch, order_cols)
        # capture the persisted staging handle BEFORE any withColumn —
        # derived DataFrames don't carry the attribute forward
        staging = getattr(ids, "_docids_staging", None)
        if base:
            ids = ids.withColumn("docid", F.col("docid") + base)

        # mode=overwrite clears the orphan gen dir of a crashed attempt;
        # ONE kernel pass emits postings + norms into one unified dir
        # zstd: ~15% smaller segment files than snappy/none at equal
        # measured write time (interleaved A/B, docs/SCALE.md) — at
        # 100 TB the win is scan bandwidth, not disk
        build_segments_direct(ids, dps, text_col=text_col, base_docid=base,
                              seg_id_base=seg_base) \
            .write.mode("overwrite").option("compression", "zstd") \
            .parquet(self._gen_dir("segments", gen))
        out = self._publish(st, gen, lineage,
                            extra_commit=extra_commit)
        if staging is not None:
            staging.unpersist()
        return out

    def append_index(self, ix: InvertedIndex, lineage: str = "",
                     extra_commit: dict | None = None) -> SegmentIndex:
        """Publish an already-built InvertedIndex whose docids start at
        the current commit's doc_count (segment-publish step)."""
        st = self.commit_state()
        dps = st["docs_per_segment"]
        base = st["doc_count"]
        seg_base = st["next_seg_id"]
        gen = st["generation"] + 1

        # postings/docs feed three consumers (pack, norms, term_stats)
        # — persist so the invert pipeline runs once, not 3x
        own_cache = not ix._cached
        if own_cache:
            ix.postings.persist()
            ix.docs.persist()
        pk = build_packed_postings(ix.postings, ix.docs, dps,
                                   base_docid=base, seg_id_base=seg_base) \
            .sortWithinPartitions("seg_id", "term")
        nm = build_norms(ix.docs, dps, base_docid=base,
                         seg_id_base=seg_base)
        unify_segment_frames(pk, nm) \
            .write.mode("overwrite").option("compression", "zstd") \
            .parquet(self._gen_dir("segments", gen))
        out = self._publish(st, gen, lineage, extra_commit=extra_commit)
        if own_cache:
            ix.postings.unpersist()
            ix.docs.unpersist()
        return out

    def _publish(self, st: dict, gen: int, lineage: str,
                 extra_commit: dict | None = None) -> SegmentIndex:
        """Catalog/term_stats snapshots + atomic commit swap for the
        segments just written under gen's data dirs (scalar-column jobs
        only — blob columns never leave disk). ``extra_commit`` keys
        ride the same atomic swap (exactly-once stream stamps)."""
        if extra_commit:
            st = {**st, **extra_commit}
        seg_new = self.spark.read.parquet(self._gen_dir("segments", gen))
        pk_new = seg_new.filter(F.col("term").isNotNull())
        nm_new = seg_new.filter(F.col("term").isNull()) \
            .select("seg_id", "docid_min", "n_docs", "norm_blob",
                    "qdl_blob")
        cat_add = catalog_from_packed(pk_new, nm_new, lineage).persist()
        cat_rows = cat_add.collect()
        new_segs = [r["seg_id"] for r in cat_rows]
        live = sorted(set(st.get("live_segs", [])) | set(new_segs))

        cat_new = cat_add
        if st["generation"] > 0:
            cat_new = self.spark.read.parquet(
                f"{self.path}/catalog/gen={st['generation']}") \
                .unionByName(cat_add)
        cat_new.write.mode("overwrite").parquet(
            f"{self.path}/catalog/gen={gen}")
        cat_add.unpersist()

        ts_new = (pk_new.select("term", "df", "ttf")
                  .groupBy("term")
                  .agg(F.sum("df").cast("long").alias("df"),
                       F.sum("ttf").cast("long").alias("ttf")))
        if st["generation"] > 0:
            ts_prev = self.spark.read.parquet(
                f"{self.path}/term_stats/gen={st['generation']}")
            ts_new = (ts_prev.unionByName(ts_new)
                      .groupBy("term")
                      .agg(F.sum("df").cast("long").alias("df"),
                           F.sum("ttf").cast("long").alias("ttf")))
        ts_new.write.mode("overwrite").parquet(
            f"{self.path}/term_stats/gen={gen}")

        data_gens = dict(st.get("data_gens", {}))
        data_gens[gen] = sorted(new_segs)
        self._write_commit(
            st, generation=gen,
            doc_count=st["doc_count"] + sum(r["n_docs"] for r in cat_rows),
            sum_ttf=st["sum_ttf"] + sum(r["n_tokens"] for r in cat_rows),
            next_seg_id=(max(live) + 1) if live else 0,
            live_segs=live, lineage=lineage, data_gens=data_gens)
        return self.reader()

    # -- tiered merge -------------------------------------------------------

    def maybe_merge(self, segs_per_tier: int = 10,
                    max_merge_at_once: int = 10,
                    floor_bytes: int = 2 << 20,
                    max_merged_bytes: int = 5 << 30,
                    expunge: bool = False) -> int:
        """Run the tiered policy until no merge qualifies; returns the
        number of merges executed. ``expunge=True`` drops deleted docs
        in every merge (Lucene merges always do; the default keeps the
        zero-decode bulk fast path)."""
        n = 0
        while True:
            cat = [r.asDict() for r in self.reader().catalog.collect()]
            pick = pick_merge(cat, segs_per_tier, max_merge_at_once,
                              floor_bytes, max_merged_bytes)
            if not pick:
                return n
            self.merge_segments(pick, expunge=expunge)
            n += 1

    def merge_segments(self, seg_ids: list,
                       expunge: bool = False) -> SegmentIndex:
        """Bulk-merge docid-adjacent segments into one new segment.

        ``expunge=True`` drops deleted documents while merging (Lucene
        merges always do; SegmentMerger skips non-live docs —
        INDEX/SegmentMerger.java:97-180): postings are decoded,
        filtered, and re-encoded; collection statistics and the global
        term-stats snapshot are updated to the surviving corpus; the
        expunged docids leave the delete set."""
        st = self.commit_state()
        six = self.reader()
        seg_ids = sorted(seg_ids)
        new_id = st["next_seg_id"]
        gen = st["generation"] + 1
        pk = six.packed.filter(F.col("seg_id").isin(seg_ids))

        deleted_arr = None
        if expunge and six.del_gens:
            import numpy as np
            # only the merged segments' deletes are needed — bounded by
            # the merge's own size cap, never the global delete set
            rows = (six.deleted_by_segment()
                    .filter(F.col("seg_id").isin(seg_ids)).collect())
            ids = sorted(d for r in rows for d in r["del_ids"])
            if ids:
                deleted_arr = np.array(ids, dtype=np.int64)
        if deleted_arr is not None:
            nm_src = six.norms.filter(F.col("seg_id").isin(seg_ids)) \
                .select("seg_id", F.col("docid_min").alias("nlo"),
                        F.col("qdl_blob").alias("qblob"))
            pk = _expunge_packed(pk.join(nm_src, "seg_id"), deleted_arr)
        # concatenation order must be docid order; seg_id order diverges
        # from it once merged segments (fresh, higher ids) re-merge, so
        # sort by the catalog's docid_min
        rng = {r["seg_id"]: int(r["docid_min"])
               for r in (six.catalog
                         .filter(F.col("seg_id").isin(seg_ids))
                         .select("seg_id", "docid_min").collect())}
        rng_df = self.spark.createDataFrame(
            [(k, v) for k, v in rng.items()], "seg_id INT, docid_min LONG")
        pk = pk.join(F.broadcast(rng_df), "seg_id")
        merged = (pk.groupBy("term")
                  .agg(F.sort_array(F.collect_list(F.struct(
                      "docid_min", "df", "ttf", "doc_blocks", "tf_blocks",
                      "pos_blocks", "skip_last_docid", "skip_n_docs",
                      "skip_max_tf", "skip_min_qdl",
                      "packed_bytes"))).alias("pl"))
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
                      F.flatten("pl.skip_min_qdl").alias("skip_min_qdl"),
                      F.aggregate("pl.packed_bytes", F.lit(0).cast("long"),
                                  lambda a, x: a + x).alias("packed_bytes")))
        nm = six.norms.filter(F.col("seg_id").isin(seg_ids))
        _del_for_norms = deleted_arr

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
            n_docs = int(sum(r["n_docs"] for r in rows))
            if _del_for_norms is not None:
                sel = _del_for_norms[(_del_for_norms >= lo)
                                     & (_del_for_norms < hi)]
                was_live = nb[sel - lo] != 0
                nb[sel - lo] = 0
                qb[sel - lo] = 0
                n_docs -= int(was_live.sum())
            yield pd.DataFrame({
                "seg_id": [new_id], "docid_min": [lo],
                "n_docs": [n_docs],
                "norm_blob": [nb.tobytes()], "qdl_blob": [qb.tobytes()]})

        merged_norms = nm.repartition(1).mapInPandas(_merge_norms, nm.schema)
        unify_segment_frames(merged.sortWithinPartitions("term"),
                             merged_norms) \
            .write.mode("overwrite").option("compression", "zstd") \
            .parquet(self._gen_dir("segments", gen))

        live = sorted((set(st["live_segs"]) - set(seg_ids)) | {new_id})
        lineage = f"merge({','.join(map(str, seg_ids))})" + \
            (" expunge" if deleted_arr is not None else "")
        seg_new = self.spark.read.parquet(self._gen_dir("segments", gen))
        pk_new = seg_new.filter(F.col("term").isNotNull())
        nm_new = seg_new.filter(F.col("term").isNull()) \
            .select("seg_id", "docid_min", "n_docs", "norm_blob",
                    "qdl_blob")
        cat_old = self.spark.read.parquet(
            f"{self.path}/catalog/gen={st['generation']}")
        cat_new_rows = catalog_from_packed(pk_new, nm_new, lineage)
        cat = (cat_old.filter(~F.col("seg_id").isin(seg_ids))
               .unionByName(cat_new_rows))
        cat.write.mode("overwrite").parquet(f"{self.path}/catalog/gen={gen}")

        ts_prev = self.spark.read.parquet(
            f"{self.path}/term_stats/gen={st['generation']}")
        doc_count, sum_ttf = st["doc_count"], st["sum_ttf"]
        if deleted_arr is None:
            # bulk merge changes no statistics — snapshot carries forward
            ts_prev.write.mode("overwrite").parquet(
                f"{self.path}/term_stats/gen={gen}")
        else:
            # surviving-corpus stats: subtract the merged range's old
            # per-term contributions, add the expunged ones back
            old_range = (six.packed.filter(F.col("seg_id").isin(seg_ids))
                         .select("term", "df", "ttf"))
            delta = (old_range.groupBy("term")
                     .agg(F.sum("df").alias("odf"),
                          F.sum("ttf").alias("ottf")))
            new_range = (pk_new.select("term", "df", "ttf")
                         .groupBy("term")
                         .agg(F.sum("df").alias("ndf"),
                              F.sum("ttf").alias("nttf")))
            ts = (ts_prev.join(delta, "term", "left")
                  .join(new_range, "term", "left")
                  .select("term",
                          (F.col("df") - F.coalesce("odf", F.lit(0))
                           + F.coalesce("ndf", F.lit(0)))
                          .cast("long").alias("df"),
                          (F.col("ttf") - F.coalesce("ottf", F.lit(0))
                           + F.coalesce("nttf", F.lit(0)))
                          .cast("long").alias("ttf"))
                  .filter(F.col("df") > 0))
            ts.write.mode("overwrite").parquet(
                f"{self.path}/term_stats/gen={gen}")
            olds = cat_old.filter(F.col("seg_id").isin(seg_ids)).agg(
                F.sum("n_docs"), F.sum("n_tokens")).first()
            news = cat_new_rows.agg(
                F.sum("n_docs"), F.sum("n_tokens")).first()
            doc_count -= int(olds[0]) - int(news[0])
            sum_ttf -= int(olds[1]) - int(news[1])

        data_gens = dict(st.get("data_gens", {}))
        data_gens[gen] = [new_id]
        updates = dict(generation=gen, next_seg_id=new_id + 1,
                       live_segs=live, lineage=lineage,
                       data_gens=data_gens, doc_count=doc_count,
                       sum_ttf=sum_ttf)
        st2 = dict(st)
        if deleted_arr is not None:
            # expunged ids leave the delete set (they are gone from the
            # postings); ids outside the merged range stay deleted —
            # computed as a distributed filter, never a driver pass over
            # the global delete set
            rng_rows = nm_new.select("docid_min", "n_docs").first()
            lo = int(rng_rows["docid_min"])
            blob = nm_new.select("norm_blob").first()["norm_blob"]
            hi = lo + len(blob)
            remaining = six.deleted.filter(
                (F.col("docid") < lo) | (F.col("docid") >= hi))
            if remaining.limit(1).count():
                remaining.coalesce(1).write.mode("overwrite").parquet(
                    self._gen_dir("deletes", gen))
                st2["del_gens"] = [gen]
            else:
                st2["del_gens"] = []
        self._write_commit(st2, **updates)
        return self.reader()

    # -- deletes (live docs) ------------------------------------------------

    def delete_docids(self, docids, lineage: str = "") -> SegmentIndex:
        """Mark docids deleted (Lucene live-docs bitset,
        codecs/lucene50/Lucene50LiveDocsFormat.java). Postings keep the
        docs until a future compaction; every query path excludes them
        at scoring time, exactly like Lucene readers consulting
        liveDocs. Collection statistics (docCount/avgdl/idf) keep the
        deleted docs until merge, matching Lucene's stats-ignore-deletes
        semantics (IndexSearcher.collectionStatistics over
        Terms.getDocCount)."""
        st = self.commit_state()
        gen = st["generation"] + 1
        ids = sorted({int(d) for d in docids})
        df = self.spark.createDataFrame(
            [(d,) for d in ids], "docid LONG")
        df.coalesce(1).write.mode("overwrite").parquet(
            self._gen_dir("deletes", gen))
        # carry catalog/term_stats snapshots forward
        for sub in ("catalog", "term_stats"):
            self.spark.read.parquet(
                f"{self.path}/{sub}/gen={st['generation']}") \
                .write.mode("overwrite").parquet(
                    f"{self.path}/{sub}/gen={gen}")
        del_gens = list(st.get("del_gens", [])) + [gen]
        st2 = dict(st)
        st2["del_gens"] = del_gens
        self._write_commit(st2, generation=gen,
                           lineage=lineage or f"delete {len(ids)} docs")
        return self.reader()

    def update_by_term(self, term: str, batch, text_col: str = "text",
                       order_cols: list | None = None,
                       lineage: str = "") -> SegmentIndex:
        """IndexWriter.updateDocument(Term, doc) analogue
        (INDEX/IndexWriter.java updateDocument: an atomic
        delete-by-term + addDocuments): every live doc matching
        ``term`` is marked deleted and the replacement batch is
        indexed, both riding ONE commit.json swap — no reader
        generation can observe the delete without the add or vice
        versa. The old-doc resolution and the delete-set write are
        fully distributed (no driver materialization of hit lists,
        unlike the convenience delete_by_term)."""
        from ..search.query import Term as _Term
        from ..search.segment_searcher import SegmentSearcher
        st = self.commit_state()
        gen = st["generation"] + 1
        del_gens = list(st.get("del_gens", []))
        if st["doc_count"]:
            hits = (SegmentSearcher(self.reader())
                    .scored(_Term(term)).select("docid"))
            if hits.limit(1).count():
                hits.coalesce(1).write.mode("overwrite").parquet(
                    self._gen_dir("deletes", gen))
                del_gens = del_gens + [gen]
        return self.append_raw(
            batch, text_col=text_col, order_cols=order_cols,
            lineage=lineage or f"update term={term!r}",
            extra_commit={"del_gens": del_gens})

    def update_numeric_docvalue(self, term: str, field: str,
                                value: int,
                                lineage: str = "") -> SegmentIndex:
        """IndexWriter.updateNumericDocValue(Term, field, value)
        analogue (INDEX/IndexWriter.java updateNumericDocValue +
        DocValuesFieldUpdates.java): every live doc matching ``term``
        gets docvalue ``field`` set to ``value`` WITHOUT reindexing —
        a per-generation patch file resolved at read time with
        newest-generation-wins (SegmentIndex.dv_updates /
        resolve_docvalue).  Hit resolution and the patch write are
        fully distributed; the commit.json swap is atomic, so no
        reader observes a partial update."""
        from ..search.query import Term as _Term
        from ..search.segment_searcher import SegmentSearcher
        st = self.commit_state()
        gen = st["generation"] + 1
        hits = (SegmentSearcher(self.reader())
                .scored(_Term(term)).select("docid"))
        (hits.select("docid",
                     F.lit(field).alias("field"),
                     F.lit(int(value)).cast("long").alias("value"),
                     F.lit(gen).cast("int").alias("upd_gen"))
         .write.mode("overwrite")
         .parquet(self._gen_dir("dv_updates", gen)))
        for sub in ("catalog", "term_stats"):
            self.spark.read.parquet(
                f"{self.path}/{sub}/gen={st['generation']}") \
                .write.mode("overwrite").parquet(
                    f"{self.path}/{sub}/gen={gen}")
        st2 = dict(st)
        st2["dv_gens"] = list(st.get("dv_gens", [])) + [gen]
        self._write_commit(
            st2, generation=gen,
            lineage=lineage or f"dv update {field}={value} term={term!r}")
        return self.reader()

    def delete_by_term(self, term: str) -> SegmentIndex:
        """Delete every document containing ``term`` (delete-by-term,
        INDEX/DocumentsWriterDeleteQueue.java)."""
        from ..search.query import Term
        from ..search.segment_searcher import SegmentSearcher
        six = self.reader()
        hits = [r["docid"] for r in
                SegmentSearcher(six).scored(Term(term))
                .select("docid").collect()]
        if not hits:
            return six
        return self.delete_docids(hits, lineage=f"delete term={term!r}")

    def delete_by_query(self, query, lineage: str = "") -> SegmentIndex:
        """IndexWriter.deleteDocuments(Query..) analogue
        (INDEX/IndexWriter.java deleteDocuments(Query);
        BufferedUpdatesStream.java resolves the query against each
        segment at flush): every live doc matching an arbitrary query
        AST is marked deleted.  Hit resolution runs through the same
        pruned SegmentSearcher the readers use and the delete set is
        written straight from the executors — no driver
        materialization of the hit list (unlike the convenience
        delete_by_term), so a delete-by-query matching 10^9 docs
        streams 10^9 ids through a one-file parquet write, never the
        driver heap."""
        from ..search.segment_searcher import SegmentSearcher
        st = self.commit_state()
        if not st["doc_count"]:
            return self.reader()
        gen = st["generation"] + 1
        hits = (SegmentSearcher(self.reader())
                .scored(query).select("docid"))
        return self._commit_delete_set(
            st, gen, hits, lineage or f"deleteByQuery {query!r}")

    def expire_docs(self, docvalues: DataFrame, field: str,
                    now, docid_col: str = "docid") -> SegmentIndex:
        """DocExpirationUpdateProcessorFactory's reaper sweep
        (solr/core/src/java/org/apache/solr/update/processor/
        DocExpirationUpdateProcessorFactory.java: a periodic
        ``deleteByQuery {expirationField}:[* TO NOW]``): mark every
        live doc whose ``field`` value is <= ``now`` deleted.
        ``docvalues`` supplies the expiration docvalue as a
        (docid, field) table — the role Solr's stored expiration
        field plays.  The filter + delete-set write are one pushed
        parquet scan; nothing crosses the driver."""
        st = self.commit_state()
        if not st["doc_count"]:
            return self.reader()
        gen = st["generation"] + 1
        hits = (docvalues
                .filter(F.col(field) <= F.lit(now))
                .select(F.col(docid_col).cast("long").alias("docid")))
        return self._commit_delete_set(st, gen, hits,
                                       f"expire {field} <= {now}")

    def delete_docids_df(self, hits: DataFrame,
                         lineage: str = "") -> SegmentIndex:
        """DataFrame-native delete set (the DeleteStream shape,
        solrj/io/stream/DeleteStream.java:40 — deleteById per incoming
        tuple): mark every docid in ``hits`` deleted in ONE commit,
        with the set written executor-side (never the driver heap,
        unlike the convenience list-based delete_docids)."""
        st = self.commit_state()
        ids = hits.select(F.col(hits.columns[0]).cast("long")
                          .alias("docid")).distinct()
        return self._commit_delete_set(
            st, st["generation"] + 1, ids,
            lineage or "delete docids (df)")

    def _commit_delete_set(self, st: dict, gen: int, hits: DataFrame,
                           lineage: str) -> SegmentIndex:
        """Write a distributed delete set as generation ``gen`` and
        commit it (shared tail of delete_by_query / expire_docs); a
        no-op commit is skipped when nothing matches."""
        if not hits.limit(1).count():
            return self.reader()
        hits.coalesce(1).write.mode("overwrite").parquet(
            self._gen_dir("deletes", gen))
        for sub in ("catalog", "term_stats"):
            self.spark.read.parquet(
                f"{self.path}/{sub}/gen={st['generation']}") \
                .write.mode("overwrite").parquet(
                    f"{self.path}/{sub}/gen={gen}")
        st2 = dict(st)
        st2["del_gens"] = list(st.get("del_gens", [])) + [gen]
        self._write_commit(st2, generation=gen, lineage=lineage)
        return self.reader()

    def vacuum(self) -> list:
        """Delete generation data dirs whose segments are all dead."""
        st = self.commit_state()
        live = set(st["live_segs"])
        data_gens = {int(g): segs
                     for g, segs in st.get("data_gens", {}).items()}
        removed = []
        for g in sorted(data_gens):
            if not set(data_gens[g]) & live:
                for sub in ("segments",):
                    d = self._gen_dir(sub, g)
                    if os.path.isdir(d):
                        shutil.rmtree(d)
                        removed.append(f"{sub}/gen={g}")
                del data_gens[g]
        # also drop stale uncommitted gen dirs (crashed attempts)
        committed = set(data_gens)
        for sub in ("segments",):
            root = os.path.join(self.path, sub)
            if not os.path.isdir(root):
                continue
            for d in os.listdir(root):
                if d.startswith("gen=") and int(d.split("=")[1]) \
                        not in committed:
                    shutil.rmtree(os.path.join(root, d))
                    removed.append(f"{sub}/{d}")
        if removed:
            self._write_commit(st, data_gens=data_gens)
        return removed


def _expunge_packed(pk_with_norms: DataFrame, deleted_arr) -> DataFrame:
    """Decode-filter-reencode packed posting rows, dropping deleted
    docids (the live-docs filter of SegmentMerger's mergeTerms). Input
    rows carry their segment's ``nlo`` (docid_min) and ``qblob``
    (qdl forward blob) so surviving docs keep exact impact metadata."""
    import numpy as np

    from .segments import PACKED_SCHEMA

    def fn(it):
        import pandas as pd

        from ..codecs import blocks as blk
        for pdf in it:
            out = {c.name: [] for c in PACKED_SCHEMA.fields}
            for row in pdf.itertuples(index=False):
                d, t = blk.decode_all(row.doc_blocks, row.tf_blocks,
                                      row.skip_n_docs)
                keep = ~np.isin(d, deleted_arr)
                if not keep.any():
                    continue
                if keep.all():
                    # untouched row passes through byte-identical
                    # (list-typed cells arrive as numpy arrays from
                    # pandas — Arrow can't convert ndarray-of-binary
                    # back, so materialize plain lists)
                    for c in PACKED_SCHEMA.fields:
                        v = getattr(row, c.name)
                        if isinstance(v, np.ndarray):
                            v = v.tolist()
                        out[c.name].append(v)
                    continue
                pos = np.concatenate([
                    blk.decode_pos_block(
                        row.pos_blocks[i],
                        t[sum(row.skip_n_docs[:i]):
                          sum(row.skip_n_docs[:i + 1])])
                    for i in range(len(row.pos_blocks))]) \
                    if len(row.pos_blocks) else np.empty(0, dtype=np.int64)
                bounds = np.concatenate(([0], np.cumsum(t)))
                d2, t2 = d[keep], t[keep]
                pos2 = np.concatenate([
                    pos[bounds[i]:bounds[i + 1]]
                    for i in np.flatnonzero(keep)]) \
                    if pos.size else np.empty(0, dtype=np.int64)
                qblob = np.frombuffer(row.qblob, dtype=np.int32)
                qdl2 = qblob[d2 - int(row.nlo)].astype(np.int64)
                enc = blk.encode_postings(d2, t2, pos2, qdl2)
                out["seg_id"].append(row.seg_id)
                out["term"].append(row.term)
                out["df"].append(int(d2.size))
                out["ttf"].append(int(t2.sum()))
                out["doc_blocks"].append(enc["doc_blocks"])
                out["tf_blocks"].append(enc["tf_blocks"])
                out["pos_blocks"].append(enc["pos_blocks"])
                out["skip_last_docid"].append(
                    enc["skip_last_docid"].tolist())
                out["skip_n_docs"].append(enc["skip_n_docs"].tolist())
                out["skip_max_tf"].append(enc["skip_max_tf"].tolist())
                out["skip_min_qdl"].append(enc["skip_min_qdl"].tolist())
                out["packed_bytes"].append(
                    sum(len(x) for x in enc["doc_blocks"])
                    + sum(len(x) for x in enc["tf_blocks"])
                    + sum(len(x) for x in enc["pos_blocks"]))
            if out["seg_id"]:
                yield pd.DataFrame(out)
            else:
                # all rows fully deleted: emit a typed-empty frame
                # (pandas defaults empty columns to float64, which
                # Arrow cannot convert to the list<binary> fields)
                yield pd.DataFrame({k: pd.Series([], dtype=object)
                                    for k in out})

    return pk_with_norms.mapInPandas(fn, PACKED_SCHEMA)


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
