"""Image metadata scrubbing (imaging/metadata.py): byte-level PNG
chunk / JPEG segment removal with pixels untouched. Pins the strip
sets (PNG tEXt/zTXt/iTXt/tIME/eXIf; JPEG APP1-15/COM — APP0 kept),
the strip(inject(x)) == x roundtrip, malformed-payload passthrough
(report, never drop), decode survival after injection+scrub, and the
Arrow kernel's map-only plan."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from scrapy_products_tracker_spark.imaging.codec import decode_image, encode_image
from scrapy_products_tracker_spark.imaging.metadata import (
    inject_metadata,
    scrub_image_metadata,
    strip_image_metadata,
    strip_jpeg_metadata,
    strip_png_metadata,
)


def _px(seed=1, h=6, w=5):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), dtype=np.uint8)


def _jpeg_seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def test_png_strip_roundtrip_and_decode():
    d = encode_image(_px(), "png")
    inj = inject_metadata(d, [(b"gps", b"52.5,13.4"), (b"author", b"x")])
    assert inj != d and b"52.5,13.4" in inj
    out, n = strip_image_metadata(inj)
    assert (out, n) == (d, 2)
    # injected-but-unscrubbed payloads still decode (decoder skips
    # unknown chunks), and scrubbed ones decode to identical pixels
    assert np.array_equal(decode_image(inj), decode_image(d))
    clean, n0 = strip_image_metadata(d)
    assert (clean, n0) == (d, 0)


def test_lossy_surrogate_strip_keeps_prefix():
    d = encode_image(_px(2), "jpeg")  # LSY1-wrapped PNG in-sandbox
    inj = inject_metadata(d, [(b"k", b"v")])
    out, n = strip_image_metadata(inj)
    assert (out, n) == (d, 1) and out[:4] == b"LSY1"


def test_jpeg_marker_strip_sets():
    j = (
        b"\xff\xd8"
        + _jpeg_seg(0xE0, b"JFIF\x00")   # APP0: kept
        + _jpeg_seg(0xE1, b"Exif\x00\x00secret")  # APP1: dropped
        + _jpeg_seg(0xFE, b"edited with tool")    # COM: dropped
        + _jpeg_seg(0xDB, b"\x00" * 65)  # DQT: kept
        + _jpeg_seg(0xDA, b"\x01\x00")   # SOS: verbatim from here on
        + b"entropy\xff\x00data"
        + b"\xff\xd9"
    )
    out, n = strip_jpeg_metadata(j)
    assert n == 2
    assert b"secret" not in out and b"edited" not in out
    assert b"JFIF" in out and out.endswith(b"entropy\xff\x00data\xff\xd9")
    # inject + strip roundtrips to the already-clean form
    again, n2 = strip_image_metadata(inject_metadata(out, [(b"a", b"b")]))
    assert (again, n2) == (out, 1)


@pytest.mark.parametrize(
    "junk",
    [
        b"",
        b"notanimage",
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x10IHDRtrunc",  # truncated chunk
        b"\xff\xd8\x00bad",  # marker desync
        b"\xff\xd8" + b"\xff\xe1\x00\x01",  # seglen < 2
    ],
)
def test_malformed_passthrough(junk):
    out, n = strip_image_metadata(junk)
    assert out == junk and n is None


def test_strip_never_touches_critical_or_rendering_chunks():
    # a PNG with a planted tRNS-like ancillary chunk must keep it:
    # only the explicit metadata set is removed
    import zlib

    d = encode_image(_px(3), "png")
    body = b"\x00\x01"
    trns = (
        struct.pack(">I", len(body))
        + b"tRNS"
        + body
        + struct.pack(">I", zlib.crc32(b"tRNS" + body) & 0xFFFFFFFF)
    )
    (ihdr_len,) = struct.unpack(">I", d[8:12])
    cut = 8 + 12 + ihdr_len
    with_trns = d[:cut] + trns + d[cut:]
    out, n = strip_image_metadata(with_trns)
    assert n == 0 and out == with_trns


def test_curate_scrub_metadata_collapses_exif_variants(spark):
    # two payloads with identical pixels but different embedded
    # metadata: with scrub_metadata=True the exact-bytes dedup sees
    # identical scrubbed bytes and keeps the lowest id, and the
    # surviving payload no longer carries the metadata
    from scrapy_products_tracker_spark.imaging.dataset import curate

    clean = encode_image(_px(7), "png")
    cap = "a clear photo of a fox in the forest"
    rows = [
        ("a", bytearray(inject_metadata(clean, [(b"gps", b"1,2")])), 6, 5, "png", cap),
        ("b", bytearray(inject_metadata(clean, [(b"gps", b"3,4")])), 6, 5, "png", cap),
        ("c", bytearray(encode_image(_px(8), "png")), 6, 5, "png", cap),
    ]
    schema = "image_id string, bytes binary, w int, h int, fmt string, caption string"
    df = spark.createDataFrame(rows, schema)
    out = curate(df, min_caption_tokens=2, min_side_px=2, scrub_metadata=True).collect()
    ids = sorted(r["image_id"] for r in out)
    assert ids == ["a", "c"]
    assert bytes(next(r["bytes"] for r in out if r["image_id"] == "a")) == clean
    # without scrubbing, the metadata-differing pair does NOT collapse
    out2 = curate(df, min_caption_tokens=2, min_side_px=2).collect()
    assert sorted(r["image_id"] for r in out2) == ["a", "b", "c"]


def test_scrub_kernel_map_only_plan(spark):
    rows = [
        ("a", bytearray(encode_image(_px(4), "png"))),
        ("b", bytearray(inject_metadata(encode_image(_px(5), "png"), [(b"k", b"v")]))),
        ("c", bytearray(b"junk")),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = scrub_image_metadata(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["image_id"]: r for r in out.collect()}
    assert got["a"]["n_meta_stripped"] == 0
    assert got["b"]["n_meta_stripped"] == 1
    assert bytes(got["b"]["bytes"]) == encode_image(_px(5), "png")
    assert got["c"]["n_meta_stripped"] is None and bytes(got["c"]["bytes"]) == b"junk"
    assert got["d"]["n_meta_stripped"] is None and got["d"]["bytes"] is None
