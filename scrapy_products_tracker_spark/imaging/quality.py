"""Decode-based image quality scoring for dataset curation.

The LAION-style metadata filters (imaging/dataset.laion_filter) run
before any decode; the next curation pass a multimodal pipeline makes
is pixel-level: drop near-black thumbnails, flat single-color
placeholder images, and blur/noise outliers before paying for
training. This module computes the standard cheap signals per row:

- ``brightness`` — mean luma (placeholder/black-frame detection),
- ``contrast`` — luma standard deviation (flat-image detection),
- ``sharpness`` — mean absolute horizontal gradient (blur proxy; the
  1-D Laplacian family — no conv dependency),
- ``entropy`` — Shannon entropy of the 256-bin channel-value
  histogram in bits (synthetic/low-information detection).

All four are fixed-pointed to integer milli-units so the output is
engine- and partitioning-exact (the same determinism contract as the
rest of the imaging ops). The kernel is an Arrow-batched
``mapInPandas`` decode — the only Python in the path, and the reason
this runs as its own sampled/suspect-partition pass rather than
inside the metadata filter (same cost split as media.phash_audit).
Undecodable/NULL payloads are REPORTED with NULL metrics, never fatal
(X6 audit semantics).

Reference scope: the reference stores image bytes without looking at
them (save_images_pipeline.py:27-41); this is forward-looking
training-pipeline surface per the task brief.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .codec import decode_image

__all__ = [
    "IMAGE_COLOR_SCHEMA",
    "IMAGE_QUALITY_SCHEMA",
    "color_metrics",
    "image_color_stats",
    "image_quality_stats",
    "quality_metrics",
]

IMAGE_QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("brightness_milli", T.LongType()),
        T.StructField("contrast_milli", T.LongType()),
        T.StructField("sharpness_milli", T.LongType()),
        T.StructField("entropy_milli", T.LongType()),
    ]
)


def quality_metrics(pixels: np.ndarray) -> tuple[int, int, int, int]:
    """(brightness, contrast, sharpness, entropy) in integer
    milli-units from a uint8 HxW[x3] array. Pure numpy with a fixed
    operation order, so the oracle builder can recompute the exact
    same integers from ground-truth pixels."""
    px = pixels if pixels.ndim == 3 else pixels[:, :, None]
    gray = px.mean(axis=2)
    brightness = float(gray.mean())
    contrast = float(gray.std())
    sharpness = float(np.abs(np.diff(gray, axis=1)).mean()) if gray.shape[1] > 1 else 0.0
    counts = np.bincount(px.reshape(-1), minlength=256).astype(np.float64)
    p = counts / counts.sum()
    nz = p[p > 0]
    entropy = float(-(nz * np.log2(nz)).sum())
    return (
        int(round(brightness * 1000)),
        int(round(contrast * 1000)),
        int(round(sharpness * 1000)),
        int(round(entropy * 1000)),
    )


def image_quality_stats(df: DataFrame) -> DataFrame:
    """Per-row quality metrics over (image_id, fmt, bytes)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, fmt, data in zip(pdf["image_id"], pdf["fmt"], pdf["bytes"]):
                metrics = (None, None, None, None)
                if data is not None:
                    try:  # hostile payload: report the row, never fail the task
                        metrics = quality_metrics(decode_image(bytes(data)))
                    except (ValueError, NotImplementedError, TypeError, struct.error):
                        pass
                out.append((mid, fmt, *metrics))
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id",
                    "fmt",
                    "brightness_milli",
                    "contrast_milli",
                    "sharpness_milli",
                    "entropy_milli",
                ],
            )

    return df.select("image_id", "fmt", "bytes").mapInPandas(_kernel, IMAGE_QUALITY_SCHEMA)


IMAGE_COLOR_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("colorfulness_milli", T.LongType()),
        T.StructField("gray_frac_milli", T.LongType()),
        T.StructField("sat_mean_milli", T.LongType()),
    ]
)


def color_metrics(pixels: np.ndarray) -> tuple[int, int, int]:
    """(colorfulness, gray_frac, sat_mean) in integer milli-units.

    - ``colorfulness`` — Hasler & Süsstrunk (SPIE'03) opponent-axis
      metric: ``sqrt(σ_rg² + σ_yb²) + 0.3·sqrt(μ_rg² + μ_yb²)`` over
      ``rg = R−G`` and ``yb = (R+G)/2 − B`` (the standard web-dataset
      "is this a drawing/screenshot/washed-out scan" signal);
    - ``gray_frac`` — fraction of exactly-neutral pixels (R==G==B):
      1000 flags grayscale payloads stored as 3-channel;
    - ``sat_mean`` — mean per-pixel channel spread max−min (a second,
      threshold-free saturation signal).

    Single-channel arrays are definitionally neutral: (0, 1000, 0).
    Fixed numpy operation order so the oracle builder reproduces the
    exact integers from ground-truth pixels."""
    if pixels.ndim != 3 or pixels.shape[2] < 3:
        return (0, 1000, 0)
    r = pixels[:, :, 0].astype(np.float64)
    g = pixels[:, :, 1].astype(np.float64)
    b = pixels[:, :, 2].astype(np.float64)
    rg = r - g
    yb = (r + g) / 2.0 - b
    colorfulness = float(
        np.sqrt(rg.std() ** 2 + yb.std() ** 2)
        + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    )
    spread = pixels.max(axis=2).astype(np.int64) - pixels.min(axis=2).astype(np.int64)
    gray_frac = float((spread == 0).mean())
    sat_mean = float(spread.mean())
    return (
        int(round(colorfulness * 1000)),
        int(round(gray_frac * 1000)),
        int(round(sat_mean * 1000)),
    )


def image_color_stats(df: DataFrame) -> DataFrame:
    """Per-row color/saturation metrics over (image_id, fmt, bytes) —
    same Arrow decode kernel + audit semantics as
    :func:`image_quality_stats` (junk/NULL payloads reported with NULL
    metrics, never dropped)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, fmt, data in zip(pdf["image_id"], pdf["fmt"], pdf["bytes"]):
                metrics = (None, None, None)
                if data is not None:
                    try:
                        metrics = color_metrics(decode_image(bytes(data)))
                    except (ValueError, NotImplementedError, TypeError, struct.error):
                        pass
                out.append((mid, fmt, *metrics))
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id",
                    "fmt",
                    "colorfulness_milli",
                    "gray_frac_milli",
                    "sat_mean_milli",
                ],
            )

    return df.select("image_id", "fmt", "bytes").mapInPandas(_kernel, IMAGE_COLOR_SCHEMA)


def image_channel_stats(df: DataFrame, fmt_col: str = "fmt", bytes_col: str = "bytes") -> DataFrame:
    """Per-format per-CHANNEL pixel statistics — the dataset
    normalization numbers (per-channel mean) every vision training
    run computes over its corpus before training.  All arithmetic is
    int64 (pixel sums, then floor-milli means), so the result is a
    pure function of the decoded pixels: ``(fmt, n, n_ok, total_px,
    ch0_mean_milli, ch1_mean_milli, ch2_mean_milli)``.

    One Arrow decode kernel (map-only) + one tiny per-format
    aggregate; undecodable payloads count in ``n`` but contribute no
    sums (n_ok counts successes) — report-never-drop, like the other
    audit kernels in this module."""
    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            T.StructField("fmt", T.StringType()),
            T.StructField("ok", T.IntegerType()),
            T.StructField("px", T.LongType()),
            T.StructField("s0", T.LongType()),
            T.StructField("s1", T.LongType()),
            T.StructField("s2", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for data, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                try:
                    px = decode_image(bytes(data))
                    n = int(px.shape[0] * px.shape[1])
                    s = px.reshape(-1, px.shape[2]).sum(axis=0, dtype=np.int64)
                    rows.append((fmt, 1, n, int(s[0]), int(s[1]), int(s[2])))
                except Exception:
                    rows.append((fmt, 0, 0, 0, 0, 0))
            yield pd.DataFrame(rows, columns=["fmt", "ok", "px", "s0", "s1", "s2"])

    per = df.mapInPandas(kernel, out_schema)
    sums = per.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.sum("ok").cast("long").alias("n_ok"),
        F.sum("px").alias("total_px"),
        F.sum("s0").alias("_s0"),
        F.sum("s1").alias("_s1"),
        F.sum("s2").alias("_s2"),
    )
    # int64 DIV keeps the milli-means engine-exact (no double rounding)
    mean_milli = lambda c: F.expr(f"{c} * 1000L div total_px")
    return sums.select(
        "fmt",
        "n",
        "n_ok",
        "total_px",
        mean_milli("_s0").alias("ch0_mean_milli"),
        mean_milli("_s1").alias("ch1_mean_milli"),
        mean_milli("_s2").alias("ch2_mean_milli"),
    ).orderBy("fmt")


def image_patch_stats(
    df: DataFrame,
    grid: int = 4,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """ViT-style patch-grid statistics: decode, split each image into a
    ``grid x grid`` patch lattice, and emit one row per patch with
    int64 channel sums and floor-milli means.

    Patchification is THE preprocessing step of every ViT-family
    vision/CLIP trainer (Dosovitskiy'21: images become patch-token
    sequences). The Spark-side shape of that pipeline is exactly this
    operator: an Arrow decode kernel fanning each image out to its
    patch rows, which downstream ops embed/normalize per patch. Patch
    boundaries use the integer lattice ``r_i = i*h div grid`` (every
    pixel lands in exactly one patch, no padding/cropping, any image
    size), and all stats are int64 sums + DIV milli-means — a pure
    function of decoded pixels, engine- and partitioning-exact.

    Output: ``(image_id, patch_row, patch_col, n_px, s0, s1, s2,
    mean0_milli, mean1_milli, mean2_milli)``. Undecodable payloads are
    REPORTED as one row ``(patch_row=-1, patch_col=-1, n_px=0, NULL
    sums/means)`` — audit semantics, never fatal, never dropped.

    Scale shape: map-only (one mapInPandas decode kernel, no shuffle);
    output is ``grid² × rows`` narrow int rows — the payload bytes
    themselves never leave the kernel. At 10^10 images this runs
    embarrassingly parallel over payload partitions; downstream
    per-patch aggregation shuffles only 10-column int rows."""
    if grid < 1:
        raise ValueError("grid must be >= 1")
    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("patch_row", T.IntegerType()),
            T.StructField("patch_col", T.IntegerType()),
            T.StructField("n_px", T.LongType()),
            T.StructField("s0", T.LongType()),
            T.StructField("s1", T.LongType()),
            T.StructField("s2", T.LongType()),
        ]
    )
    g = int(grid)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    px = decode_image(bytes(data))
                    h, w = int(px.shape[0]), int(px.shape[1])
                    for i in range(g):
                        r0, r1 = (i * h) // g, ((i + 1) * h) // g
                        for j in range(g):
                            c0, c1 = (j * w) // g, ((j + 1) * w) // g
                            patch = px[r0:r1, c0:c1]
                            n = int(patch.shape[0] * patch.shape[1])
                            if n == 0:
                                rows.append((iid, i, j, 0, 0, 0, 0))
                                continue
                            s = patch.reshape(-1, patch.shape[2]).sum(
                                axis=0, dtype=np.int64
                            )
                            rows.append(
                                (iid, i, j, n, int(s[0]), int(s[1]), int(s[2]))
                            )
                except Exception:
                    rows.append((iid, -1, -1, 0, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "patch_row", "patch_col", "n_px", "s0", "s1", "s2"],
            )

    per = df.select(id_col, bytes_col).mapInPandas(kernel, out_schema)
    mean = lambda c: F.when(
        F.col("n_px") > 0, F.expr(f"{c} * 1000L div n_px")
    ).cast("long")
    return per.select(
        id_col,
        "patch_row",
        "patch_col",
        "n_px",
        "s0",
        "s1",
        "s2",
        mean("s0").alias("mean0_milli"),
        mean("s1").alias("mean1_milli"),
        mean("s2").alias("mean2_milli"),
    )


def pad_images(
    df: DataFrame,
    top_col: str,
    bottom_col: str,
    left_col: str,
    right_col: str,
    color: tuple = (8, 8, 8),
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Uniform-border padding: decode, pad each side by the per-row
    widths in the four int columns with a constant ``color``, re-encode
    lossless PNG. The preprocessing twin of aspect bucketing
    (imaging/dataset.aspect_bucket_assign): a bucketed training batch
    pads its members to the bucket's common shape rather than
    distorting them with a resize — this is that pad as an Arrow
    kernel. Output: ``(image_id, bytes, fmt)`` with fmt='png'
    (padding must not re-lose pixels, so the output container is the
    lossless one regardless of input fmt). Undecodable rows are
    REPORTED with NULL bytes/fmt, never dropped. Map-only, no shuffle;
    payload bytes stay inside the kernel."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("fmt", T.StringType()),
        ]
    )
    c = np.asarray(color, dtype=np.uint8)
    from .codec import encode_image

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, t, b, lft, r in zip(
                pdf[id_col], pdf[bytes_col],
                pdf[top_col], pdf[bottom_col], pdf[left_col], pdf[right_col],
            ):
                try:
                    px = decode_image(bytes(data))
                    t, b, lft, r = int(t), int(b), int(lft), int(r)
                    if min(t, b, lft, r) < 0:
                        raise ValueError("negative pad width")
                    h, w, ch = px.shape
                    out = np.empty((h + t + b, w + lft + r, ch), dtype=np.uint8)
                    out[:, :] = c[:ch]
                    out[t:t + h, lft:lft + w] = px
                    rows.append((iid, encode_image(out, "png"), "png"))
                except Exception:
                    rows.append((iid, None, None))
            yield pd.DataFrame(rows, columns=[id_col, "bytes", "fmt"])

    return df.select(
        id_col, bytes_col, top_col, bottom_col, left_col, right_col
    ).mapInPandas(kernel, out_schema)


def image_border_stats(
    df: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Uniform-border (letterbox/pillarbox) detection — the standard
    crawled-image cleaning signal: thumbnails arrive letterboxed, and
    training pipelines crop the bars (or drop the row when content
    shrinks to nothing).

    Per side, the border width is the count of consecutive full rows
    (cols) from that edge inward whose every pixel EQUALS the side's
    corner pixel (top/left anchor ``px[0,0]``, bottom ``px[H-1,0]``,
    right ``px[0,W-1]``) — pure integer pixel comparisons, a bit-exact
    function of the decoded image (no tolerance knob to drift across
    engines). A fully uniform image reports full-extent borders on
    every side. Output: ``(image_id, ok, h, w, top, bottom, left,
    right, letterboxed, content_px)`` where letterboxed =
    (top>0 AND bottom>0) OR (left>0 AND right>0), content_px =
    max(0, h-top-bottom) * max(0, w-left-right). Undecodable rows
    report ok=0 with NULL metrics (audit semantics). Map-only."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("ok", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("top", T.IntegerType()),
            T.StructField("bottom", T.IntegerType()),
            T.StructField("left", T.IntegerType()),
            T.StructField("right", T.IntegerType()),
            T.StructField("letterboxed", T.IntegerType()),
            T.StructField("content_px", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    px = decode_image(bytes(data))
                    rows.append((iid, 1) + border_widths(px))
                except Exception:
                    rows.append((iid, 0) + (None,) * 8)
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "ok", "h", "w", "top", "bottom", "left", "right",
                    "letterboxed", "content_px",
                ],
            )

    return df.select(id_col, bytes_col).mapInPandas(kernel, out_schema)


def border_widths(px: np.ndarray) -> tuple:
    """(h, w, top, bottom, left, right, letterboxed, content_px) for
    decoded pixels — the shared pure-numpy core of image_border_stats,
    also replayed verbatim by the oracle builder over ground-truth
    pixels (the detection math itself is the contract)."""
    h, w = int(px.shape[0]), int(px.shape[1])

    def run(side_color, slices):
        n = 0
        for sl in slices:
            if (px[sl] == side_color).all():
                n += 1
            else:
                break
        return n

    top = run(px[0, 0], [(i, slice(None)) for i in range(h)])
    bottom = run(px[h - 1, 0], [(i, slice(None)) for i in range(h - 1, -1, -1)])
    left = run(px[0, 0], [(slice(None), j) for j in range(w)])
    right = run(px[0, w - 1], [(slice(None), j) for j in range(w - 1, -1, -1)])
    boxed = int((top > 0 and bottom > 0) or (left > 0 and right > 0))
    content = max(0, h - top - bottom) * max(0, w - left - right)
    return (h, w, top, bottom, left, right, boxed, content)
