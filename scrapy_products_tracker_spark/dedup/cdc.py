"""Content-defined chunking (CDC) dedup over binary payload columns.

The reference stores every downloaded image as an opaque file keyed by
URL-derived name (save_images_pipeline.py:27-41, zoro_products_spider
.py:94-96), so re-hosted or lightly re-encoded payloads are stored
twice in full.  This module generalizes the engine's exact-payload
dedup (md5 anti-join, imaging/neardup.py) to *sub-file* byte ranges:
Gear-hash content-defined chunking — the rolling-hash cut-point scheme
behind storage dedup systems (LBFS/Venti lineage; FastCDC, Xia et al.,
USENIX ATC'16) — splits each payload at content-determined boundaries,
so two files sharing a byte region (same image with different metadata
headers, truncated re-downloads, format containers with shared frames)
share the chunks of that region even when the region SHIFTS position.
Fixed-size blocking has no such resync property: one inserted byte
re-aligns every later block.

Definition (both the engine kernel here and the independent oracle
loop in oracle/builders.py implement exactly this):

- ``GEAR[b]`` is a 256-entry uint64 table, entry ``b`` = splitmix64(b)
  (Steele et al., the standard published mixer).
- rolling hash after byte ``i``: ``h_i = (h_{i-1} << 1 + GEAR[data_i])
  mod 2^64`` with ``h`` reset to 0 at each chunk start (the textbook
  Gear formulation).
- cut after byte ``i`` when ``(h_i & MASK) == 0`` and the chunk has
  reached ``min_size``; force a cut at ``max_size``; the file tail is
  a final (possibly short) chunk.  ``MASK`` selects the TOP
  ``log2(avg_size)`` bits (high bits mix contributions from the whole
  64-byte window; low bits see only the last few bytes), giving
  expected chunk length ``avg_size`` on random input.

Engine kernel shape: the ``<<1`` drops a bit per step, so ``h_i``
depends only on the last 64 bytes — for any position at least 64
bytes past its chunk start the reset-style hash EQUALS the pure
sliding-window hash ``sum_k GEAR[data_{i-k}] << k  (k = 0..63)``.
Since cuts are only tested at length >= ``min_size`` and this module
requires ``min_size >= 64``, the kernel may compute the window hash
for ALL positions in one vectorized pass (64 shifted adds over the
whole byte array — numpy uint64, wrap-around exact) and then apply
the min/max bookkeeping to the sparse candidate set (~1 per
``avg_size`` bytes) in a tiny Python loop.  The oracle side keeps the
per-byte reset-style loop; agreeing outputs pin the equivalence.

Scale shape: chunking is MAP-ONLY — one ``mapInPandas`` pass, payload
bytes never shuffle, no Exchange in the plan (pinned in
tests/test_cdc.py).  The corpus roll-up shuffles only ``(chunk_md5,
length)`` pairs (~50 bytes per chunk, ~1/512th of the payload
volume at the default ``avg_size``), so a 10^10-image store gets its
dedup index in a single narrow aggregation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_M64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Published splitmix64 finalizer (pure-int; table build only)."""
    z = (x + 0x9E3779B97F4A7C15) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def gear_table() -> np.ndarray:
    """The 256-entry uint64 Gear table: ``GEAR[b] = splitmix64(b)``."""
    return np.array([_splitmix64(b) for b in range(256)], dtype=np.uint64)


def _window_hashes(arr: np.ndarray, gear: np.ndarray) -> np.ndarray:
    """Sliding-window Gear hash at every position, vectorized.

    ``h[i] = sum_{k=0}^{min(63,i)} GEAR[arr[i-k]] << k`` (mod 2^64) —
    64 shifted adds over the whole array instead of a per-byte Python
    loop; numpy uint64 arithmetic wraps exactly like the oracle's
    ``& _M64``.
    """
    g = gear[arr]
    n = arr.shape[0]
    h = np.zeros(n, dtype=np.uint64)
    for k in range(min(64, n)):
        np.add(h[k:], g[: n - k] << np.uint64(k), out=h[k:])
    return h


def _chunk_spans(
    n: int, cand: np.ndarray, min_size: int, max_size: int
) -> list[tuple[int, int]]:
    """(offset, length) spans from the sorted candidate cut positions.

    Next cut = first hash candidate at chunk length in
    [min_size, max_size], else the forced max_size cut, else the file
    end (final chunk may be short).
    """
    spans = []
    start = 0
    while start < n:
        lo = start + min_size - 1
        hi = min(start + max_size - 1, n - 1)
        j = int(np.searchsorted(cand, lo))
        cut = int(cand[j]) if j < len(cand) and cand[j] <= hi else hi
        spans.append((start, cut - start + 1))
        start = cut + 1
    return spans


def cdc_chunks(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    min_size: int = 64,
    avg_size: int = 512,
    max_size: int = 2048,
) -> DataFrame:
    """Chunk each payload: ``(id, chunk_idx, offset, length,
    chunk_md5)``, one row per chunk, in file order.

    ``avg_size`` must be a power of two (it defines the cut mask);
    ``min_size >= 64`` is required — it is what makes the vectorized
    sliding-window hash exactly equal to reset-style Gear (module
    docstring).  NULL/empty payloads emit no rows (callers that need
    them keep an outer join on ``id_col``).
    """
    if min_size < 64:
        raise ValueError("min_size must be >= 64 (the Gear window width)")
    if avg_size & (avg_size - 1) or avg_size <= 0:
        raise ValueError("avg_size must be a power of two")
    if not (min_size <= avg_size <= max_size):
        raise ValueError("need min_size <= avg_size <= max_size")
    bits = avg_size.bit_length() - 1
    mask = np.uint64(((1 << bits) - 1) << (64 - bits))
    gear = gear_table()

    schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("length", T.LongType()),
            T.StructField("chunk_md5", T.StringType()),
        ]
    )

    def kernel(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids: list = []
            idxs: list = []
            offs: list = []
            lens: list = []
            md5s: list = []
            for _id, data in zip(pdf[id_col], pdf[bytes_col]):
                if data is None:
                    continue
                b = bytes(data)
                if not b:
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                h = _window_hashes(arr, gear)
                cand = np.nonzero((h & mask) == np.uint64(0))[0]
                for idx, (off, ln) in enumerate(
                    _chunk_spans(len(b), cand, min_size, max_size)
                ):
                    ids.append(_id)
                    idxs.append(idx)
                    offs.append(off)
                    lens.append(ln)
                    md5s.append(hashlib.md5(b[off : off + ln]).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=object),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "length": pd.Series(lens, dtype="int64"),
                    "chunk_md5": pd.Series(md5s, dtype=object),
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(kernel, schema)


def cdc_dedup_stats(chunks: DataFrame, id_col: str = "image_id") -> DataFrame:
    """One-row corpus dedup accounting over a ``cdc_chunks`` output:
    ``(n_files, total_chunks, total_bytes, uniq_chunks, uniq_bytes,
    dup_bytes)``.  ``uniq_bytes`` is what a chunk-addressed store
    would hold; ``dup_bytes`` is the saving vs storing files whole.
    Shuffles only (md5, length) pairs — never payload bytes.
    """
    totals = chunks.agg(
        F.countDistinct(id_col).alias("n_files"),
        F.count("*").alias("total_chunks"),
        F.sum("length").alias("total_bytes"),
    )
    uniq = (
        chunks.select("chunk_md5", "length")
        .distinct()
        .agg(F.count("*").alias("uniq_chunks"), F.sum("length").alias("uniq_bytes"))
    )
    return totals.crossJoin(uniq).withColumn(
        "dup_bytes", F.col("total_bytes") - F.col("uniq_bytes")
    )
