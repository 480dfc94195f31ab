"""Segment layout: packed posting blocks + norm blobs + catalog.

Spark-first realization of Lucene's immutable segment model
(lucene/core/src/java/org/apache/lucene/index/SegmentInfo.java,
IndexWriter.java:1212 flush path; postings layout
codecs/lucene84/Lucene84PostingsWriter.java:218-375):

- a **segment** is a contiguous docid range: ``seg_id = docid //
  docs_per_segment``. Lucene's DWPT-per-thread becomes a doc-range
  slice; every posting row is bounded by the segment size, which is the
  skew story — a stopword's postings never concentrate in one row
  larger than one segment's share (SURVEY.md §4.2 salting).
- per (segment, term) one **packed posting row**: 128-doc blocks of
  FOR-delta docids + FOR tfs + VByte position streams with flat skip
  arrays ``(last_docid, n_docs, max_tf, min_qdl)`` — the multi-level
  skip list + competitive impacts collapsed to binary-searchable
  columns (MultiLevelSkipListWriter.java:69-85,
  CompetitiveImpactAccumulator.java:71-118).
- per segment one **norms blob**: uint8 norm bytes indexed by
  ``docid - docid_min`` (Lucene80NormsFormat's forward index).
- a **catalog** row per segment with lineage + row-count/byte metrics
  (SegmentInfos analogue; the north rule's "checkpointed per-partition
  segment state with lineage + metrics").

Build = two shuffles: groupBy(seg_id, term) for packing (map-side
partial agg), groupBy(seg_id) for norms. Both scale linearly; no
global sort anywhere (docids were already assigned by the 2-pass
offset pattern in index/docids.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from ..codecs import blocks as blk
from .builder import InvertedIndex

PACKED_SCHEMA = StructType([
    StructField("seg_id", IntegerType()),
    StructField("term", StringType()),
    StructField("df", LongType()),
    StructField("ttf", LongType()),
    StructField("doc_blocks", ArrayType(BinaryType())),
    StructField("tf_blocks", ArrayType(BinaryType())),
    StructField("pos_blocks", ArrayType(BinaryType())),
    StructField("skip_last_docid", ArrayType(LongType())),
    StructField("skip_n_docs", ArrayType(IntegerType())),
    StructField("skip_max_tf", ArrayType(LongType())),
    StructField("skip_min_qdl", ArrayType(LongType())),
])


def _pack_rows(it):
    """mapInPandas kernel: one input row = one (seg_id, term) posting list
    with parallel docid/tf/qdl/pos arrays (docid-ascending), output = one
    packed row."""
    import pandas as pd

    for pdf in it:
        out = {c.name: [] for c in PACKED_SCHEMA.fields}
        for row in pdf.itertuples(index=False):
            d = np.asarray(row.docids, dtype=np.int64)
            t = np.asarray(row.tfs, dtype=np.int64)
            q = np.asarray(row.qdls, dtype=np.int64)
            p = np.asarray(row.pos_concat, dtype=np.int64)
            enc = blk.encode_postings(d, t, p, q)
            out["seg_id"].append(row.seg_id)
            out["term"].append(row.term)
            out["df"].append(int(d.size))
            out["ttf"].append(int(t.sum()))
            out["doc_blocks"].append(enc["doc_blocks"])
            out["tf_blocks"].append(enc["tf_blocks"])
            out["pos_blocks"].append(enc["pos_blocks"])
            out["skip_last_docid"].append(enc["skip_last_docid"].tolist())
            out["skip_n_docs"].append(enc["skip_n_docs"].tolist())
            out["skip_max_tf"].append(enc["skip_max_tf"].tolist())
            out["skip_min_qdl"].append(enc["skip_min_qdl"].tolist())
        yield pd.DataFrame(out)


def _seg_expr(docs_per_segment: int, base_docid: int = 0,
              seg_id_base: int = 0):
    return (F.lit(seg_id_base)
            + ((F.col("docid") - base_docid) / docs_per_segment)
            .cast("int")).cast("int")


def build_packed_postings(postings: DataFrame, docs: DataFrame,
                          docs_per_segment: int, base_docid: int = 0,
                          seg_id_base: int = 0) -> DataFrame:
    """(term, docid, tf, positions) + (docid, qdl) -> packed posting rows."""
    p = (postings
         .join(docs.select("docid", "qdl"), "docid")
         .withColumn("seg_id", _seg_expr(docs_per_segment, base_docid,
                                         seg_id_base)))
    agg = (p.groupBy("seg_id", "term")
           .agg(F.sort_array(F.collect_list(F.struct(
               "docid", "tf", "qdl", "positions"))).alias("pl"))
           .select(
               "seg_id", "term",
               F.col("pl.docid").alias("docids"),
               F.col("pl.tf").alias("tfs"),
               F.col("pl.qdl").alias("qdls"),
               F.flatten("pl.positions").alias("pos_concat")))
    return agg.mapInPandas(_pack_rows, PACKED_SCHEMA)


NORMS_SCHEMA = StructType([
    StructField("seg_id", IntegerType()),
    StructField("docid_min", LongType()),
    StructField("n_docs", LongType()),
    StructField("norm_blob", BinaryType()),   # uint8 norm byte per doc
    StructField("qdl_blob", BinaryType()),    # int32 LE quantized dl per doc
])


def build_norms(docs: DataFrame, docs_per_segment: int,
                base_docid: int = 0, seg_id_base: int = 0) -> DataFrame:
    """Per-segment forward norms: blob[docid - docid_min] = norm info."""
    def _blob(it):
        import pandas as pd
        for pdf in it:
            rows = {c.name: [] for c in NORMS_SCHEMA.fields}
            for row in pdf.itertuples(index=False):
                d = np.asarray(row.docids, dtype=np.int64)
                nb = np.asarray(row.norm_bytes, dtype=np.int64)
                qd = np.asarray(row.qdls, dtype=np.int64)
                lo = int(d.min())
                n = int(d.max()) - lo + 1
                blob = np.zeros(n, dtype=np.uint8)
                blob[d - lo] = nb.astype(np.uint8)
                qblob = np.zeros(n, dtype=np.int32)
                qblob[d - lo] = qd.astype(np.int32)
                rows["seg_id"].append(row.seg_id)
                rows["docid_min"].append(lo)
                rows["n_docs"].append(int(d.size))
                rows["norm_blob"].append(blob.tobytes())
                rows["qdl_blob"].append(qblob.tobytes())
            yield pd.DataFrame(rows)

    agg = (docs
           .withColumn("seg_id", _seg_expr(docs_per_segment, base_docid,
                                           seg_id_base))
           .groupBy("seg_id")
           .agg(F.sort_array(F.collect_list(F.struct(
               "docid", "norm_byte", "qdl"))).alias("dl"))
           .select("seg_id",
                   F.col("dl.docid").alias("docids"),
                   F.col("dl.norm_byte").alias("norm_bytes"),
                   F.col("dl.qdl").alias("qdls")))
    return agg.mapInPandas(_blob, NORMS_SCHEMA)


@dataclass
class SegmentIndex:
    """On-disk segment index handle (IndexReader-over-commit analogue).

    A commit = ``commit.json`` (generation, collection stats, live
    segment ids) + per-generation catalog/term_stats snapshots +
    cumulative seg_id-partitioned postings/norms stores. Readers see
    only the commit's live segments, so appends and merges are atomic
    at the commit.json swap — the segments_N model
    (INDEX/SegmentInfos.java)."""

    path: str
    spark: SparkSession
    doc_count: int
    sum_ttf: int
    docs_per_segment: int
    generation: int = 1
    live_segs: tuple = ()

    def _live(self, df: DataFrame) -> DataFrame:
        if not self.live_segs:
            return df
        return df.filter(F.col("seg_id").isin(list(self.live_segs)))

    @property
    def packed(self) -> DataFrame:
        return self._live(self.spark.read.parquet(f"{self.path}/postings"))

    @property
    def norms(self) -> DataFrame:
        return self._live(self.spark.read.parquet(f"{self.path}/norms"))

    @property
    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(
            f"{self.path}/term_stats/gen={self.generation}")

    @property
    def catalog(self) -> DataFrame:
        return self.spark.read.parquet(
            f"{self.path}/catalog/gen={self.generation}")

    @property
    def avgdl(self) -> float:
        return self.sum_ttf / float(self.doc_count)

    @property
    def avgdl_sql(self) -> str:
        return f"(CAST({self.sum_ttf} AS DOUBLE) / {self.doc_count})"


def catalog_from_packed(pk: DataFrame, norms: DataFrame,
                        lineage: str) -> DataFrame:
    """Segment metrics (rows/bytes) + lineage for new packed rows."""
    bytes_expr = (
        "aggregate(transform(doc_blocks, x -> length(x)), 0L, (a, x) -> a + x)"
        " + aggregate(transform(tf_blocks, x -> length(x)), 0L, (a, x) -> a + x)"
        " + aggregate(transform(pos_blocks, x -> length(x)), 0L, (a, x) -> a + x)")
    cat = pk.groupBy("seg_id").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
        F.sum("ttf").cast("long").alias("n_tokens"),
        F.sum(F.expr(bytes_expr)).cast("long").alias("packed_bytes"))
    nm = norms.select("seg_id", "docid_min",
                      F.col("n_docs").alias("n_docs"))
    return (cat.join(nm, "seg_id")
            .withColumn("lineage", F.lit(lineage))
            .withColumn("build_ts", F.lit(int(time.time()))))


def write_commit(path: str, generation: int, doc_count: int, sum_ttf: int,
                 docs_per_segment: int, next_seg_id: int,
                 live_segs: list, lineage: str = "") -> None:
    commit = {
        "generation": generation,
        "doc_count": doc_count,
        "sum_ttf": sum_ttf,
        "docs_per_segment": docs_per_segment,
        "next_seg_id": next_seg_id,
        "live_segs": sorted(int(s) for s in live_segs),
        "lineage": lineage,
    }
    tmp = os.path.join(path, "commit.json.tmp")
    with open(tmp, "w") as f:
        json.dump(commit, f)
    os.replace(tmp, os.path.join(path, "commit.json"))


def read_commit(path: str) -> dict:
    with open(os.path.join(path, "commit.json")) as f:
        return json.load(f)


def write_segments(ix: InvertedIndex, out_dir: str,
                   docs_per_segment: int = 65536,
                   lineage: str = "") -> SegmentIndex:
    """Materialize an InvertedIndex as generation-1 of a segment store."""
    from .writer import IndexWriter
    w = IndexWriter.create(ix.docs.sparkSession, out_dir,
                           docs_per_segment=docs_per_segment)
    w.append_index(ix, lineage=lineage)
    return w.reader()


def open_segments(spark: SparkSession, path: str) -> SegmentIndex:
    commit = read_commit(path)
    return SegmentIndex(path=path, spark=spark,
                        doc_count=commit["doc_count"],
                        sum_ttf=commit["sum_ttf"],
                        docs_per_segment=commit["docs_per_segment"],
                        generation=commit["generation"],
                        live_segs=tuple(commit.get("live_segs", ())))


# ---------------------------------------------------------------------------
# CheckIndex (INDEX/CheckIndex.java:496-508,723,1124 analogue)
# ---------------------------------------------------------------------------

CHECK_SCHEMA = StructType([
    StructField("seg_id", IntegerType()),
    StructField("term", StringType()),
    StructField("problem", StringType()),
])


def check_index(six: SegmentIndex) -> DataFrame:
    """Validate every packed posting row; returns a DataFrame of
    violations (empty == healthy index)."""

    def _check(it):
        import pandas as pd
        for pdf in it:
            probs = {"seg_id": [], "term": [], "problem": []}

            def bad(seg, term, msg):
                probs["seg_id"].append(seg)
                probs["term"].append(term)
                probs["problem"].append(msg)

            for row in pdf.itertuples(index=False):
                try:
                    d, t = blk.decode_all(row.doc_blocks, row.tf_blocks,
                                          row.skip_n_docs)
                except Exception as e:  # noqa: BLE001
                    bad(row.seg_id, row.term, f"decode error: {e}")
                    continue
                if d.size != row.df:
                    bad(row.seg_id, row.term, "df != decoded doc count")
                if int(t.sum()) != row.ttf:
                    bad(row.seg_id, row.term, "ttf != sum(tf)")
                if d.size > 1 and not bool(np.all(np.diff(d) > 0)):
                    bad(row.seg_id, row.term, "docids not strictly ascending")
                if bool(np.any(t < 1)):
                    bad(row.seg_id, row.term, "tf < 1")
                nb = len(row.skip_n_docs)
                off = 0
                for i in range(nb):
                    n = row.skip_n_docs[i]
                    if d[off + n - 1] != row.skip_last_docid[i]:
                        bad(row.seg_id, row.term,
                            f"skip_last_docid wrong at block {i}")
                    if int(t[off:off + n].max()) != row.skip_max_tf[i]:
                        bad(row.seg_id, row.term,
                            f"skip_max_tf wrong at block {i}")
                    off += n
            yield pd.DataFrame(probs)

    return six.packed.mapInPandas(_check, CHECK_SCHEMA)
