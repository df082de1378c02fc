"""Local-edit-resistant image near-dup: patch-hash overlap.

A whole-image perceptual hash (phash/dhash, imaging/codec.py) treats a
watermark stamp, a logo overlay, or a corner banner as global noise —
enough flipped bits and the pair drops out of the banded Hamming join.
Web-scale image corpora are full of exactly these variants (the same
product photo re-hosted with a shop's overlay — the reference crawls
five shops of product photos, README.md:4). This module detects them
by hashing a grid of patches per image and pairing images that share
at least ``min_shared`` *identical* patch hashes: an edit localized to
k patches leaves grid²−k matching, so the pair survives any edit that
doesn't touch most of the image.

This is the inverted-index shape, not a similarity join:

1. ``patch_hash_table`` — ONE Arrow decode kernel per image (map-only;
   payload bytes never leave the kernel) emits ``grid²`` rows
   ``(image_id, patch_row, patch_col, patch_hash)``.
2. ``patch_overlap_pairs`` — distinct ``(image_id, patch_hash)``
   (a flat image's 16 identical patches count once), a frequency cap
   dropping *background* hashes (a white patch matches half the web;
   any hash appearing in more than ``max_images_per_hash`` images is
   evidence of nothing — the same hot-set discipline as
   ``caption_frequency_filter``), then a self-equi-join on the 8-byte
   ``patch_hash`` key and a pair-keyed count. No cartesian product
   anywhere; the join fan-out per hash is bounded by the cap, so the
   worst case is ``capped_hashes × max_images_per_hash²`` candidate
   rows — operator-chosen, skew-proof.

Determinism: patch boundaries are the integer lattice
``(i*h) div grid`` (same as quality.image_patch_stats), the per-patch
hash is codec.phash64's average-hash bit pattern — pure integer
comparisons over uint8 sums, bit-identical everywhere. Patches
narrower/shorter than the 8-block hash grid yield NULL hashes
(reported, never paired — audit semantics).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .codec import decode_image, phash64

PATCH_SCHEMA = "image_id string, patch_row int, patch_col int, patch_hash long"


def patch_hashes(pixels: np.ndarray, grid: int = 4) -> list[tuple[int, int, int | None]]:
    """(patch_row, patch_col, hash) per integer-lattice patch; None for
    patches too small for the 8x8 average-hash block grid."""
    h, w = pixels.shape[:2]
    ys = [(i * h) // grid for i in range(grid + 1)]
    xs = [(j * w) // grid for j in range(grid + 1)]
    out = []
    for i in range(grid):
        for j in range(grid):
            patch = pixels[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
            if patch.shape[0] < 8 or patch.shape[1] < 8:
                out.append((i, j, None))
            else:
                out.append((i, j, phash64(patch)))
    return out


def patch_hash_table(df: DataFrame, grid: int = 4) -> DataFrame:
    """``(image_id, patch_row, patch_col, patch_hash)`` — grid² rows per
    image via one Arrow decode kernel. Undecodable payloads are
    REPORTED as grid² NULL-hash rows (same contract as phash_audit:
    the audit sees every row; NULLs never form pairs)."""
    if grid < 1:
        raise ValueError("grid must be >= 1")

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["image_id"], pdf["bytes"]):
                hashes: list[tuple[int, int, int | None]]
                try:
                    hashes = patch_hashes(decode_image(bytes(data)), grid)
                except (ValueError, NotImplementedError, TypeError, struct.error):
                    hashes = [(i, j, None) for i in range(grid) for j in range(grid)]
                out.extend((mid, i, j, ph) for i, j, ph in hashes)
            yield pd.DataFrame(
                out, columns=["image_id", "patch_row", "patch_col", "patch_hash"]
            )

    return df.select("image_id", "bytes").mapInPandas(_kernel, PATCH_SCHEMA)


def patch_overlap_pairs(
    patches: DataFrame,
    min_shared: int = 4,
    max_images_per_hash: int = 64,
    id_col: str = "image_id",
    hash_col: str = "patch_hash",
) -> DataFrame:
    """(id_a, id_b, shared_patches) for pairs sharing >= ``min_shared``
    distinct patch-hash values, id_a < id_b. Hashes present in more
    than ``max_images_per_hash`` images are excluded as background
    before the join (both the correctness call — they are evidence of
    nothing — and the skew bound)."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    if max_images_per_hash < 2:
        raise ValueError("max_images_per_hash must be >= 2 to ever form a pair")
    ih = (
        patches.filter(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_ph"))
        .distinct()
    )
    rare = (
        ih.groupBy("_ph")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_images_per_hash)
        .select("_ph")
    )
    ihr = ih.join(rare, "_ph")
    left = ihr.select(F.col("_id").alias("id_a"), "_ph")
    right = ihr.select(F.col("_id").alias("id_b"), "_ph")
    return (
        left.join(right, "_ph")  # equi-join on the 8-byte hash key
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_patches"))  # (id,hash) distinct => count = #shared hashes
        .filter(F.col("shared_patches") >= min_shared)
    )
