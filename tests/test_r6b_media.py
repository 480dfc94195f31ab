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
