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

This module holds the shared hash/bit kernels plus ``BloomShards``, a
small in-memory shard container used by unit tests and the pure-Python
oracle. The engine's seen-set is ``seen_table.BloomTable``: the same
bit layout persisted as a bucket-sharded parquet table, built / probed
/ delta-merged entirely executor-side (no driver materialization —
VERDICT r01 #1)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


class BloomShards:
    """Seen-set state: dict bucket -> packed bit array (numpy uint8)."""

    def __init__(self, n_buckets: int, bits_per_bucket: int, k: int):
        if n_buckets < 1 or (n_buckets & (n_buckets - 1)) != 0:
            # power-of-two is a hard requirement, not a convention: the
            # JVM-side bucket key (bitwiseAND below / pmod) and the
            # numpy probe kernels (uint64-view modulo) only agree when
            # 2^64 % n_buckets == 0. A silent mismatch would create
            # Bloom FALSE NEGATIVES, and false-negative rows bypass the
            # exact anti-join confirm entirely.
            raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
        self.n_buckets = n_buckets
        self.bits = bits_per_bucket
        self.k = k
        self.arrays: dict[int, np.ndarray] = {}

    @classmethod
    def for_capacity(cls, n_keys: int, n_buckets: int = 32, fpr: float = 0.01) -> "BloomShards":
        bits, k = optimal_params(max(1, n_keys // n_buckets), fpr)
        return cls(n_buckets, bits, k)

    def _arr(self, bucket: int) -> np.ndarray:
        a = self.arrays.get(bucket)
        if a is None:
            a = np.zeros((self.bits + 7) // 8, dtype=np.uint8)
            self.arrays[bucket] = a
        return a

    def add_pdf(self, bucket: int, h1: np.ndarray, h2: np.ndarray) -> None:
        pos = _positions(h1, h2, self.k, self.bits).ravel()
        np.bitwise_or.at(self._arr(bucket), pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_pdf(self, bucket: int, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        a = self.arrays.get(bucket)
        if a is None:
            return np.zeros(len(h1), dtype=bool)
        pos = _positions(h1, h2, self.k, self.bits)
        hit = (a[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return hit.all(axis=1)

    # --- (de)serialization for snapshot persistence ---------------------
    def to_pandas(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": list(self.arrays.keys()),
                "bits": [self.bits] * len(self.arrays),
                "k": [self.k] * len(self.arrays),
                "n_buckets": [self.n_buckets] * len(self.arrays),
                "payload": [a.tobytes() for a in self.arrays.values()],
            }
        )

    @classmethod
    def from_pandas(cls, pdf: pd.DataFrame, n_buckets: int, bits: int, k: int) -> "BloomShards":
        bs = cls(n_buckets, bits, k)
        for _, row in pdf.iterrows():
            bs.arrays[int(row["bucket"])] = np.frombuffer(row["payload"], dtype=np.uint8).copy()
        return bs


def bucket_col(h1: "F.Column", n_buckets: int) -> "F.Column":
    """JVM-side shard key for a 64-bit hash. ``h1 & (n_buckets-1)`` on
    two's-complement longs equals the numpy kernels' uint64-view modulo
    for power-of-two bucket counts (enforced by BloomShards), so build,
    probe, and driver-delta paths all agree bit-for-bit."""
    return h1.bitwiseAND(F.lit(n_buckets - 1)).cast("int")


def with_bloom_hashes(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach h1/h2 (JVM-side) used by every Bloom kernel downstream."""
    h1, h2 = bloom_hash_cols(F.col(url_col))
    return df.withColumn("_h1", h1).withColumn("_h2", h2)
