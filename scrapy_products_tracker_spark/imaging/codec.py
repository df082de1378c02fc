"""Image payload codec: encode/decode, PSNR, perceptual hash.

The input contract (BASELINE.json ``input_hint``) fixes the payload row
schema ``(image_id, bytes, w, h, fmt, caption, phash)`` with a per-row
invariant of decoded-pixel PSNR >= 40 dB (exact for lossless) plus
caption equality — replacing the reference's on-disk image store
(reference: save_images_pipeline.py:27-41, utils/file_saver.py:19-66).

``fmt='png'`` is real, lossless PNG. ``fmt='jpeg'`` is handled by PIL
when available; in this sandbox (no PIL) it is a clearly-marked
deterministic lossy SURROGATE: pixels quantized to step Q=6 and stored
in a PNG container behind a magic prefix. The quantization noise is
uniform in [-Q/2, Q/2], so MSE <= Q^2/12 = 3 and PSNR >= 43.3 dB —
deterministically above the 40 dB gate, i.e. it faithfully simulates a
high-quality lossy codec while keeping decode bit-exact reproducible.
"""

from __future__ import annotations

import numpy as np

from .png import decode_png, encode_png

try:  # pragma: no cover - PIL absent in sandbox
    import io

    from PIL import Image

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

_LOSSY_MAGIC = b"LSY1"  # surrogate-jpeg container marker
_LOSSY_Q = 6  # quantization step -> PSNR floor 10*log10(255^2*12/36) ~= 43.3 dB


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode uint8 pixels as 'png' (lossless) or 'jpeg' (lossy)."""
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        if _HAS_PIL:  # pragma: no cover
            buf = io.BytesIO()
            Image.fromarray(pixels).save(buf, format="JPEG", quality=95)
            return buf.getvalue()
        q = np.minimum((pixels.astype(np.int32) // _LOSSY_Q) * _LOSSY_Q + _LOSSY_Q // 2, 255)
        return _LOSSY_MAGIC + encode_png(q.astype(np.uint8))
    raise ValueError(f"unsupported fmt {fmt!r}")


def decode_image(data: bytes) -> np.ndarray:
    """Decode payload bytes back to uint8 pixels (any supported container)."""
    if data[:4] == _LOSSY_MAGIC:
        return decode_png(data[4:])
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if _HAS_PIL:  # pragma: no cover
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    raise ValueError("unknown image container")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    if a.shape != b.shape:
        return 0.0
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit average perceptual hash (8x8 block means vs global mean).

    Replaces the reference's file-name-derived image identity
    (e.g. zoro_products_spider.py:94-96) with a content hash usable for
    near-duplicate image detection at scale.
    """
    gray = pixels if pixels.ndim == 2 else pixels.mean(axis=2)
    h, w = gray.shape
    # integral-image style 8x8 block means without external deps
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val  # signed int64


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash (Krawetz dHash): horizontal gradient sign
    over an 8-row x 9-col block-mean grid — the gradient twin of
    :func:`phash64`'s average hash. Each bit encodes a relation between
    NEIGHBORING blocks rather than to the global mean, so uniform
    brightness/contrast shifts (re-encodes, gamma tweaks) that flip
    average-hash bits leave dhash bits alone; running both hashes and
    unioning the candidate pairs is the standard cheap ensemble before
    a pixel-level confirm."""
    gray = pixels if pixels.ndim == 2 else pixels.mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(10) * w) // 9
    blocks = np.empty((8, 9), dtype=np.float64)
    for i in range(8):
        for j in range(9):
            cell = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
            # images narrower than the 9-col grid yield empty cells;
            # 0.0 keeps the hash defined (and warning-free) there
            blocks[i, j] = cell.mean() if cell.size else 0.0
    bits = (blocks[:, 1:] > blocks[:, :-1]).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val  # signed int64
