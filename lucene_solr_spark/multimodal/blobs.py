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


# --------------------------------------------------------------------------
# dependency-free header codecs (real mode): metadata needs no image
# library — JPEG dims live in the SOFn segment, PNG's in IHDR, GIF's
# in the logical screen descriptor, BMP's in the info header. Formats
# per the public specs (ITU T.81 §B.2.2, PNG RFC 2083 §3.1, GIF89a,
# BITMAPINFOHEADER).
# --------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# SOF markers carry frame dims: C0-CF minus DHT (C4), JPG (C8), DAC (CC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
# RSTn (D0-D7)/SOI (D8)/TEM (01); EOI (D9) is deliberately excluded so
# it reaches the explicit EOI/SOS termination branch below
_JPEG_STANDALONE = frozenset(range(0xD0, 0xD9)) | {0x01}


def parse_image_meta(payload: bytes):
    """(width, height, channels) parsed from the encoded header bytes,
    or None if the format is not recognized. Pure function — no codec
    library; exercised against real ImageIO-encoded fixtures
    (tools/gen_media_fixtures.py)."""
    n = len(payload)
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" \
            and payload[12:16] == b"IHDR":
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        c = _PNG_CHANNELS.get(payload[25] if n > 25 else -1)
        return (w, h, c) if c else None
    if n >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 3 < n:
            if payload[i] != 0xFF:
                return None  # desynced: not a marker
            marker = payload[i + 1]
            if marker == 0xFF:          # fill byte
                i += 1
                continue
            if marker in _JPEG_STANDALONE:
                i += 2
                continue
            if i + 4 > n:
                return None
            seglen = int.from_bytes(payload[i + 2:i + 4], "big")
            if marker in _JPEG_SOF:
                if i + 10 > n:  # need payload[i+9] (channels byte)
                    return None
                h = int.from_bytes(payload[i + 5:i + 7], "big")
                w = int.from_bytes(payload[i + 7:i + 9], "big")
                return (w, h, payload[i + 9])
            if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no SOF
                return None
            i += 2 + seglen
        return None
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return (w, h, 3)
    if n >= 26 and payload[:2] == b"BM":
        # dispatch on the info-header size: 12 = OS/2 BITMAPCOREHEADER
        # (16-bit dims at 18/20); 40/52/56/64/108/124 =
        # BITMAPINFOHEADER family (32-bit dims at 18/22); anything
        # else is unparseable.
        hsz = int.from_bytes(payload[14:18], "little")
        if hsz == 12:
            w = int.from_bytes(payload[18:20], "little")
            h = int.from_bytes(payload[20:22], "little")
            return (w, h, 3)
        if hsz in (40, 52, 56, 64, 108, 124):
            w = int.from_bytes(payload[18:22], "little", signed=True)
            h = int.from_bytes(payload[22:26], "little", signed=True)
            return (abs(w), abs(h), 3)
        return None
    return None


def decode_images(media: DataFrame, real: bool = False) -> DataFrame:
    """mapInPandas image decode: binary payload -> typed metadata.

    ``real=True`` parses the actual encoded headers (JPEG/PNG/GIF/BMP,
    dependency-free — parse_image_meta); unrecognized payloads yield
    NULL dims. ``real=False`` runs the same Arrow plumbing with the
    deterministic fake decoder (pixel DECODE, as opposed to metadata,
    still needs a codec library — see resize_images/sample_frames).
    """

    def _decode(it):
        import pandas as pd
        for pdf in it:
            rows = {"media_id": [], "n_bytes": [], "width": [],
                    "height": [], "channels": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                if real:
                    # contract: unparseable/malformed payloads yield
                    # NULL dims, never a UDF crash
                    try:
                        meta = parse_image_meta(payload)
                    except Exception:
                        meta = None
                    w, h, c = meta if meta else (None, None, None)
                else:
                    w, h, c = _fake_dims(payload)
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
