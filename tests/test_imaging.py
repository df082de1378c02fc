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
