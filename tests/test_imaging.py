import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy_products_tracker_spark.imaging import (
    decode_image,
    decode_png,
    encode_image,
    encode_png,
    phash64,
    psnr,
)


@given(st.integers(4, 40), st.integers(4, 40), st.booleans(), st.integers(0, 2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_png_roundtrip(w, h, gray, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w) if gray else (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_lossless_png_invariant():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    assert psnr(px, decode_image(encode_image(px, "png"))) == float("inf")


def test_lossy_jpeg_psnr_gate():
    # the input_hint invariant: decoded pixels PSNR >= 40 dB for lossy
    rng = np.random.default_rng(11)
    for _ in range(5):
        px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        out = decode_image(encode_image(px, "jpeg"))
        assert psnr(px, out) >= 40.0


def test_phash_deterministic_and_locality():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert phash64(px) == phash64(px.copy())
    # lossy re-encode should barely move the hash
    out = decode_image(encode_image(px, "jpeg"))
    ham = bin((phash64(px) ^ phash64(out)) & (2**64 - 1)).count("1")
    assert ham <= 4
    # int64 range
    assert -(2**63) <= phash64(px) < 2**63


def test_bad_container_raises():
    with pytest.raises(ValueError):
        decode_image(b"not an image at all")


def test_image_patch_stats_reassembles_and_reports(spark):
    """Patch lattice is a partition of the image: per-channel patch
    sums must add back to the whole-image sum, every pixel exactly
    once, for awkward (non-divisible) dims; junk payloads are reported
    as a (-1,-1) audit row, never dropped."""
    from scrapy_products_tracker_spark.imaging.quality import image_patch_stats

    rng = np.random.default_rng(11)
    rows = []
    truth = {}
    for i, (h, w) in enumerate([(19, 15), (8, 8), (5, 13), (1, 7)]):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        iid = f"img{i}"
        truth[iid] = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        rows.append((iid, bytearray(encode_image(px, "png"))))
    rows.append(("junk", bytearray(b"not an image")))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = image_patch_stats(df, grid=4).collect()

    got = {}
    for r in out:
        if r["image_id"] == "junk":
            assert (r["patch_row"], r["patch_col"], r["n_px"]) == (-1, -1, 0)
            assert r["s0"] is None and r["mean0_milli"] is None
            continue
        acc = got.setdefault(r["image_id"], [0, 0, 0, 0])
        acc[0] += r["n_px"]
        acc[1] += r["s0"]
        acc[2] += r["s1"]
        acc[3] += r["s2"]
        # milli-mean contract on every non-empty patch
        if r["n_px"] > 0:
            assert r["mean0_milli"] == r["s0"] * 1000 // r["n_px"]
    for i, (h, w) in enumerate([(19, 15), (8, 8), (5, 13), (1, 7)]):
        iid = f"img{i}"
        s = truth[iid]
        assert got[iid] == [h * w, int(s[0]), int(s[1]), int(s[2])]
    # grid x grid rows per decodable image (empty patches included when h < grid)
    n_patch_rows = sum(1 for r in out if r["image_id"] != "junk")
    assert n_patch_rows == 4 * 16


def test_pad_then_border_roundtrip(spark):
    """border_stats(pad_images(x)) recovers the planted widths on
    noisy content (noise edges never match the pad color), reports the
    full extent on a uniform image, and audits junk rows."""
    from scrapy_products_tracker_spark.imaging.quality import (
        image_border_stats,
        pad_images,
    )

    rng = np.random.default_rng(3)
    noisy = rng.integers(16, 240, size=(11, 9, 3), dtype=np.uint8)
    flat = np.full((6, 5, 3), 8, dtype=np.uint8)  # pad color == content
    rows = [
        ("noisy", bytearray(encode_image(noisy, "png")), 2, 0, 1, 3),
        ("flat", bytearray(encode_image(flat, "png")), 1, 1, 0, 0),
        ("junk", bytearray(b"xx"), 1, 1, 1, 1),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, t int, b int, l int, r int"
    )
    padded = pad_images(df, "t", "b", "l", "r")
    out = {r["image_id"]: r for r in image_border_stats(padded).collect()}

    n = out["noisy"]
    assert (n["h"], n["w"]) == (11 + 2, 9 + 4)
    assert (n["top"], n["bottom"], n["left"], n["right"]) == (2, 0, 1, 3)
    assert n["letterboxed"] == 1 and n["content_px"] == 11 * 9

    f = out["flat"]  # uniform content merges with the pad: full-extent borders
    assert (f["top"], f["bottom"]) == (f["h"], f["h"])
    assert f["content_px"] == 0

    j = out["junk"]
    assert j["ok"] == 0 and j["h"] is None and j["content_px"] is None


def test_dhash_gradient_invariance():
    """dhash is invariant to uniform brightness shifts (the average
    hash is not — that asymmetry is why running both is the standard
    ensemble) and changes little under small perturbations."""
    from scrapy_products_tracker_spark.imaging import dhash64

    rng = np.random.default_rng(5)
    px = rng.integers(40, 200, size=(32, 32, 3), dtype=np.uint8)
    base = dhash64(px)
    assert base == dhash64(px)  # deterministic
    shifted = np.clip(px.astype(np.int16) + 30, 0, 255).astype(np.uint8)
    assert dhash64(shifted) == base  # gradient signs survive +30 brightness
    tweaked = px.copy()
    tweaked[:2, :2] = 255
    d = bin((dhash64(tweaked) ^ base) & ((1 << 64) - 1)).count("1")
    assert d <= 8  # local edit flips only nearby gradient bits
