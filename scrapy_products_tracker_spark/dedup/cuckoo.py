"""Cuckoo-filter fallback for the URL-seen set (supports deletion).

The Bloom shards (bloom.py) are the default pre-filter; the north rule
also names a cuckoo fallback — useful when URLs must be *removed* from
the seen-set (e.g. rolling a session back, O5/O6 semantics: the
reference flips ``is_tracked``/``status`` rather than deleting, but a
checkpoint rollback at scale wants real deletion).

Standard design (Fan et al., CoNEXT'14, public): buckets of 4 slots of
16-bit fingerprints; the alternate bucket is ``i ^ hash(fp)``. Probes
are vectorized numpy; inserts walk the eviction chain per key (inserts
are the cold path — the hot path is membership probing).
"""

from __future__ import annotations

import numpy as np

_FP_BITS = 16
_SLOTS = 4
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, n_buckets: int, seed: int = 42):
        # power-of-two bucket count so xor-indexing stays in range
        self.n_buckets = 1 << int(np.ceil(np.log2(max(2, n_buckets))))
        self.table = np.zeros((self.n_buckets, _SLOTS), dtype=np.uint16)
        self.rng = np.random.default_rng(seed)
        self.count = 0

    @classmethod
    def for_capacity(cls, n_keys: int) -> "CuckooFilter":
        return cls(max(2, int(n_keys / (_SLOTS * 0.84)) + 1))

    # fingerprints/buckets from two precomputed 64-bit hashes (JVM-side
    # xxhash64 + murmur3, same inputs as the Bloom kernels)
    def _fp(self, h2: np.ndarray) -> np.ndarray:
        fp = (h2.astype(np.int64).view(np.uint64) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # 0 means empty slot

    def _i1(self, h1: np.ndarray) -> np.ndarray:
        return (h1.astype(np.int64).view(np.uint64) % np.uint64(self.n_buckets)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # xor with a scrambled fingerprint (public mixing constant)
        mixed = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(self.n_buckets)
        return (i1.astype(np.uint64) ^ mixed).astype(np.int64) % self.n_buckets

    def add_many(self, h1: np.ndarray, h2: np.ndarray) -> int:
        fps, i1s = self._fp(h2), self._i1(h1)
        i2s = self._i2(i1s, fps)
        inserted = 0
        for fp, i1, i2 in zip(fps, i1s, i2s):
            if self._insert_one(int(fp), int(i1), int(i2)):
                inserted += 1
        return inserted

    def _insert_one(self, fp: int, i1: int, i2: int) -> bool:
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        i = i1
        for _ in range(_MAX_KICKS):
            slot = int(self.rng.integers(0, _SLOTS))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = int(
                self._i2(np.array([i], dtype=np.int64), np.array([fp], dtype=np.uint16))[0]
            )
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        raise RuntimeError("cuckoo filter full")

    def contains_many(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        fps, i1s = self._fp(h2), self._i1(h1)
        i2s = self._i2(i1s, fps)
        in1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        in2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        return in1 | in2

    # --- (de)serialization for snapshot persistence ---------------------
    def to_pandas(self):
        import pandas as pd

        return pd.DataFrame(
            {
                "n_buckets": [self.n_buckets],
                "count": [self.count],
                "table": [self.table.tobytes()],
            }
        )

    @classmethod
    def from_pandas(cls, pdf) -> "CuckooFilter":
        ck = cls(int(pdf["n_buckets"].iloc[0]))
        ck.table = (
            np.frombuffer(pdf["table"].iloc[0], dtype=np.uint16)
            .reshape(ck.n_buckets, _SLOTS)
            .copy()
        )
        ck.count = int(pdf["count"].iloc[0])
        return ck

    def delete_many(self, h1: np.ndarray, h2: np.ndarray) -> int:
        fps, i1s = self._fp(h2), self._i1(h1)
        i2s = self._i2(i1s, fps)
        removed = 0
        for fp, i1, i2 in zip(fps, i1s, i2s):
            for i in (int(i1), int(i2)):
                hit = np.flatnonzero(self.table[i] == fp)
                if hit.size:
                    self.table[i, hit[0]] = 0
                    self.count -= 1
                    removed += 1
                    break
        return removed
