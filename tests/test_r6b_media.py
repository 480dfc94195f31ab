"""Round-4: dependency-free image header codecs (blobs.parse_image_meta)
against REAL encoded fixtures (JDK ImageIO — tools/gen_media_fixtures.py;
the manifest dims were requested from the encoder, so they are
independent of the parser under test)."""

import json
import pathlib

import pytest

from lucene_solr_spark.multimodal.blobs import parse_image_meta

MEDIA = pathlib.Path(__file__).parent / "fixtures" / "media"


def _manifest():
    return json.loads((MEDIA / "manifest.json").read_text())


def test_real_fixture_dims():
    man = _manifest()
    assert len(man) >= 18
    for name, (w, h) in man.items():
        meta = parse_image_meta((MEDIA / name).read_bytes())
        assert meta is not None, name
        assert meta[0] == w and meta[1] == h, (name, meta)
        want_c = 1 if "gray" in name else 3
        assert meta[2] == want_c, (name, meta)


def test_unrecognized_and_truncated():
    assert parse_image_meta(b"") is None
    assert parse_image_meta(b"not an image at all") is None
    assert parse_image_meta(b"\xff\xd8\xff") is None  # JPEG, no SOF
    assert parse_image_meta(b"\x89PNG\r\n\x1a\n0000IHD") is None
    # truncating a real JPEG before its SOF must yield None, not junk
    jpg = (MEDIA / "img_37x23.jpg").read_bytes()
    assert parse_image_meta(jpg[:20]) is None


def test_jpeg_marker_walk_robustness():
    # fill bytes between markers + restart markers are legal
    jpg = (MEDIA / "img_640x480.jpg").read_bytes()
    padded = jpg[:2] + b"\xff" + jpg[2:]  # extra fill byte after SOI
    assert parse_image_meta(padded) == (640, 480, 3)


def test_decode_images_real_mode(spark):
    import __spark_entry__ as entry
    df = entry._q_blob_meta_real(spark, None)
    rows = {r.name: r for r in df.collect()}
    man = _manifest()
    assert set(rows) == set(man)
    for name, (w, h) in man.items():
        r = rows[name]
        assert (r.width, r.height) == (w, h), name
        assert r.channels == (1 if "gray" in name else 3)
        assert r.n_bytes == (MEDIA / name).stat().st_size


def test_decode_images_fake_mode_still_deterministic(spark):
    from lucene_solr_spark.multimodal.blobs import (as_media,
                                                    decode_images)
    df = spark.createDataFrame(
        [(1, b"abc"), (2, b"defg")], "id long, payload binary")
    media = as_media(df, "id", "payload", "image")
    a = sorted(decode_images(media).collect())
    b = sorted(decode_images(media).collect())
    assert a == b
    assert all(r.width and r.height and r.channels for r in a)


# --- round-5: advisor-reported edge cases ----------------------------------

def test_jpeg_truncated_at_sof_channels_byte():
    """SOF bounds: a JPEG truncated exactly at the channels byte
    (payload[i+9] one past the end) must return None, not IndexError
    (round-4 advisor finding: the guard was off by one)."""
    jpg = next(MEDIA.glob("*.jpg")).read_bytes()
    # locate the SOF marker via the same walk the parser does
    i = 2
    sof_at = None
    while i + 3 < len(jpg):
        if jpg[i] != 0xFF:
            break
        m = jpg[i + 1]
        if m == 0xFF:
            i += 1
            continue
        if 0xD0 <= m <= 0xD8 or m == 0x01:
            i += 2
            continue
        if m in range(0xC0, 0xD0) and m not in (0xC4, 0xC8, 0xCC):
            sof_at = i
            break
        i += 2 + int.from_bytes(jpg[i + 2:i + 4], "big")
    assert sof_at is not None
    # every truncation through the SOF payload must be a clean None
    for cut in range(sof_at, sof_at + 10):
        assert parse_image_meta(jpg[:cut]) is None, cut
    # one byte past the channels byte parses fine
    assert parse_image_meta(jpg[:sof_at + 10]) is not None


def test_jpeg_eoi_terminates_walk():
    """EOI (FFD9) with trailing garbage must hit the explicit
    termination branch (it used to sit in the standalone set, making
    the branch dead and striding into trailing bytes)."""
    # SOI, then EOI, then garbage that is NOT marker-aligned
    assert parse_image_meta(b"\xff\xd8\xff\xd9" + b"\x00" * 64) is None


def test_bmp_core_header_and_unknown_header():
    """OS/2 BITMAPCOREHEADER (size 12, 16-bit dims) parses correctly;
    an unknown info-header size returns None instead of garbage."""
    def bmp(hsz: int, body: bytes) -> bytes:
        return b"BM" + (14 + len(body) + 4).to_bytes(4, "little") + \
            b"\x00" * 4 + (14 + len(body)).to_bytes(4, "little") + \
            hsz.to_bytes(4, "little") + body + b"\x00" * 16
    core = bmp(12, (37).to_bytes(2, "little")
               + (23).to_bytes(2, "little")
               + (1).to_bytes(2, "little") + (24).to_bytes(2, "little"))
    assert parse_image_meta(core) == (37, 23, 3)
    info = bmp(40, (37).to_bytes(4, "little", signed=True)
               + (23).to_bytes(4, "little", signed=True) + b"\x00" * 32)
    assert parse_image_meta(info) == (37, 23, 3)
    assert parse_image_meta(bmp(99, b"\x00" * 40)) is None


def test_decode_images_malformed_payload_yields_null_dims(spark):
    """real=True contract: malformed payloads degrade to NULL dims
    (never a UDF crash) through the Arrow path."""
    from lucene_solr_spark.multimodal.blobs import (as_media,
                                                    decode_images)
    jpg = next(MEDIA.glob("*.jpg")).read_bytes()
    df = spark.createDataFrame(
        [(1, jpg[:30]), (2, b"\xff\xd8\xff\xc0\x00\x11\x08"),
         (3, b"garbage")], "id long, payload binary")
    media = as_media(df, "id", "payload", "image")
    rows = sorted(decode_images(media, real=True).collect())
    assert len(rows) == 3
    assert all(r.width is None and r.height is None for r in rows)
