"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata, the way
a 100 TB training-data pipeline stores them: the Spark-side schema,
partitioning, Arrow batch shape, and UDF signatures are real and
tested; the actual codec work (JPEG decode, resampling, frame
extraction) is STUBBED because the sandbox ships no media libraries —
each stub either raises NotImplementedError (real-decode mode) or
produces a deterministic fake derived from the bytes (test mode).

Shapes follow the mapInPandas contract: one Arrow batch in, one out,
binary payload never round-trips through Python row objects.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),      # image | audio | video
    StructField("payload", BinaryType()),   # opaque encoded bytes
    StructField("n_bytes", LongType()),
    StructField("sha_hex", StringType()),
])

IMAGE_META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
])


def as_media(df: DataFrame, id_col: str, payload_col: str,
             kind: str) -> DataFrame:
    """Normalize any (id, binary) frame into the media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.octet_length(F.col(payload_col).cast("binary")).cast("long")
        .alias("n_bytes"),
        F.sha2(F.col(payload_col).cast("binary"), 256).alias("sha_hex"))


def _fake_dims(payload: bytes) -> tuple:
    """Deterministic fake decode: dimensions derived from a digest of
    the bytes, stable across engines/runs."""
    h = hashlib.md5(payload).digest()
    return (64 + h[0] % 193, 64 + h[1] % 129, 1 + h[2] % 3)


def decode_images(media: DataFrame, real: bool = False) -> DataFrame:
    """mapInPandas image decode: binary payload -> typed metadata.

    ``real=True`` would use an image codec (not available in this
    container) — raises NotImplementedError. ``real=False`` runs the
    full Arrow plumbing with the deterministic fake decoder.
    """

    def _decode(it):
        import pandas as pd
        for pdf in it:
            if real:
                raise NotImplementedError(
                    "image codecs are not installed in this container; "
                    "plug PIL/libvips here")
            rows = {"media_id": [], "n_bytes": [], "width": [],
                    "height": [], "channels": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c = _fake_dims(bytes(payload))
                rows["media_id"].append(int(mid))
                rows["n_bytes"].append(len(payload))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
            yield pd.DataFrame(rows)

    return (media.select("media_id", "payload")
            .mapInPandas(_decode, IMAGE_META_SCHEMA))


def resize_images(media: DataFrame, width: int, height: int,
                  real: bool = False) -> DataFrame:
    """mapInPandas resize: returns (media_id, payload) with the resized
    bytes. Fake mode re-digests the payload with the target dims so the
    output is deterministic and size-bounded."""

    def _resize(it):
        import pandas as pd
        for pdf in it:
            if real:
                raise NotImplementedError("resize needs an image codec")
            rows = {"media_id": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                digest = hashlib.sha256(
                    bytes(payload) + f":{width}x{height}".encode()).digest()
                rows["media_id"].append(int(mid))
                rows["payload"].append(digest)
            yield pd.DataFrame(rows)

    return (media.select("media_id", "payload")
            .mapInPandas(_resize, StructType([
                StructField("media_id", LongType()),
                StructField("payload", BinaryType())])))


def sample_frames(media: DataFrame, every_n: int = 24,
                  real: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame. Fake
    mode derives a deterministic frame count from the payload bytes."""

    def _frames(it):
        import pandas as pd
        for pdf in it:
            if real:
                raise NotImplementedError("frame sampling needs ffmpeg")
            rows = {"media_id": [], "frame_idx": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = 1 + hashlib.md5(bytes(payload)).digest()[3] % 96
                for fi in range(0, n_frames, every_n):
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(fi)
                    rows["payload"].append(hashlib.sha256(
                        bytes(payload) + f":f{fi}".encode()).digest())
            yield pd.DataFrame(rows)

    return (media.select("media_id", "payload")
            .mapInPandas(_frames, StructType([
                StructField("media_id", LongType()),
                StructField("frame_idx", IntegerType()),
                StructField("payload", BinaryType())])))
