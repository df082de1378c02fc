"""Partitioned Bloom-filter URL-seen set (vectorized, numpy kernels).

Reference semantics being replaced: MySQL ``UNIQUE(url)`` +
``INSERT ... ON DUPLICATE KEY UPDATE`` (product_targets.py:11,
utils/read_csv.py:66-70, category_result_consumer.py:38-52) — i.e. a
URL enters the frontier exactly once. A single-node unique index does
not exist at 10^10 URLs, so the seen-set becomes:

  1. a **partitioned Bloom filter**: the hash space is split into
     ``n_buckets`` shards; each shard owns a bit array sized for its
     share of keys. Build and probe are ``applyInPandas`` over the
     bucket key, so shard state never leaves one task and the work is
     pure vectorized numpy (no per-row Python).
  2. an **exact confirm**: Bloom "maybe seen" survivors go through a
     ``left_anti`` join against the frontier — false positives are
     rescued, so the pipeline stays exact while the Bloom pre-filter
     removes the bulk of re-discovered URLs *before* the expensive
     shuffle join (at 100 TB that join's probe side is the whole
     frontier; cutting its input is the point).

Probe positions use the Kirsch-Mitzenmacher construction g_i(x) =
h1(x) + i*h2(x) over two JVM-computed hashes (xxhash64 + murmur3), so
Python never hashes strings.

This module holds ONLY the shared hash/bit kernels (positions, bucket
key, parameter sizing). The engine's seen-set is
``seen_table.BloomTable``: bit arrays persisted as a bucket-sharded
parquet table, built / probed / delta-merged entirely executor-side.
The old driver-resident ``BloomShards`` container was deleted (VERDICT
r02 #8) so no config path can flip the seen-set back onto a
``collect()`` plan."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import bloom_hash_cols

_U64 = np.uint64


def optimal_params(n_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """(bits, k) for target false-positive rate."""
    n_keys = max(n_keys, 1)
    bits = max(64, int(-n_keys * math.log(fpr) / (math.log(2) ** 2)))
    k = max(1, round(bits / n_keys * math.log(2)))
    return bits, min(k, 16)


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, bits: int) -> np.ndarray:
    """(len, k) probe bit positions; all uint64 arithmetic, vectorized."""
    h1 = h1.astype(np.int64).view(_U64)
    h2 = h2.astype(np.int64).view(_U64)
    ii = np.arange(1, k + 1, dtype=_U64)[None, :]
    g = h1[:, None] + ii * h2[:, None]  # wraps mod 2^64
    return (g % _U64(bits)).astype(np.int64)


def bucket_col(h1: "F.Column", n_buckets: int) -> "F.Column":
    """JVM-side shard key for a 64-bit hash. ``h1 & (n_buckets-1)`` on
    two's-complement longs equals the numpy kernels' uint64-view modulo
    — but ONLY for power-of-two bucket counts (2^64 % n_buckets == 0;
    BloomTable enforces this), so build, probe, and delta paths all
    agree bit-for-bit. A silent mismatch would create Bloom FALSE
    NEGATIVES, and false-negative rows bypass the exact anti-join
    confirm entirely."""
    return h1.bitwiseAND(F.lit(n_buckets - 1)).cast("int")


def with_bloom_hashes(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach h1/h2 (JVM-side) used by every Bloom kernel downstream."""
    h1, h2 = bloom_hash_cols(F.col(url_col))
    return df.withColumn("_h1", h1).withColumn("_h2", h2)
