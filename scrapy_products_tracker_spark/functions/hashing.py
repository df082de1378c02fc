"""URL hashing: Spark-side murmur3/xxhash64 columns + a pure-Python
murmur3 that bit-matches Spark's ``F.hash`` for the oracle simulator.

The reference dedups URLs with a MySQL ``UNIQUE(url)`` key
(product_targets.py:11); at 10^10-URL scale identity must be a hash.
Hot path stays JVM-side: ``F.hash`` (Murmur3 x86 32-bit, seed 42) and
``F.xxhash64`` (seed 42) are whole-stage-codegen'd; the Python
implementation below exists only so the small-scale pure-Python
reference-semantics oracle can produce identical ``url_hash`` values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def murmur3_32(data: bytes, seed: int = 42) -> int:
    """Spark-compatible Murmur3 x86 32-bit (signed int32 result).

    Matches org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes
    (the implementation behind ``F.hash`` on string/binary): 4-byte
    little-endian words, then each tail byte mixed individually as a
    *sign-extended* int — this tail handling differs from canonical
    murmur3 and is what makes naive ports mismatch Spark.
    """
    h1 = seed & _M32
    n = len(data)
    aligned = n - (n % 4)
    for i in range(0, aligned, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(aligned, n):
        b = data[i]
        k1 = b - 256 if b >= 128 else b  # sign-extended byte
        h1 = _mix_h1(h1, _mix_k1(k1 & _M32))
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def murmur3_str(s: str, seed: int = 42) -> int:
    return murmur3_32(s.encode("utf-8"), seed)


_M64 = 0xFFFFFFFFFFFFFFFF
_XP1 = 0x9E3779B185EBCA87
_XP2 = 0xC2B2AE3D27D4EB4F
_XP3 = 0x165667B19E3779F9
_XP4 = 0x85EBCA77C2B2AE63
_XP5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xx_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _XP2) & _M64
    return (_rotl64(acc, 31) * _XP1) & _M64


def _xx_merge(acc: int, v: int) -> int:
    acc ^= _xx_round(0, v)
    return (acc * _XP1 + _XP4) & _M64


def xxhash64(data: bytes, seed: int = 42) -> int:
    """Pure-Python XXH64 matching Spark's ``F.xxhash64`` on strings
    (org.apache.spark.sql.catalyst.expressions.XxHash64, seed 42,
    UTF-8 bytes; standard XXH64 — public algorithm). Exists so the
    DuckDB-oracle builders can reproduce engine hashes (MinHash shingle
    hashes, LSH band hashes, SimHash token hashes) without Spark;
    bit-parity is pinned by tests/test_hashing_dedup.py."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XP1 + _XP2) & _M64
        v2 = (seed + _XP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XP1) & _M64
        while i <= n - 32:
            v1 = _xx_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xx_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xx_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xx_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = _xx_merge(h, v)
    else:
        h = (seed + _XP5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _xx_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _XP1 + _XP4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XP1) & _M64
        h = (_rotl64(h, 23) * _XP2 + _XP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XP5) & _M64
        h = (_rotl64(h, 11) * _XP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = 42) -> int:
    return xxhash64(s.encode("utf-8"), seed)


def xxhash64_long(v: int, seed: int = 42) -> int:
    """Spark's xxhash64 of a LongType value (8-byte little-endian)."""
    return xxhash64(int(v).to_bytes(8, "little", signed=True), seed)


def url_hash_col(url: Column) -> Column:
    """64-bit content-derived id for a canonical URL (JVM-side xxhash64).

    Replaces the reference's autoincrement primary key
    (mixins/mysql_primary_key.py:6-7), which cannot be stable across a
    distributed recompute.
    """
    return F.xxhash64(url)


def murmur3_col(url: Column) -> Column:
    """Spark built-in murmur3 (32-bit, seed 42) of a column."""
    return F.hash(url)


def bloom_hash_cols(url: Column) -> tuple[Column, Column]:
    """Two independent 64/32-bit hashes computed JVM-side; the bloom
    kernel derives its k probe positions from them with the
    Kirsch-Mitzenmacher construction (g_i = h1 + i*h2), so the Python
    side does only vectorized numpy arithmetic — no per-row hashing.
    """
    return F.xxhash64(url), F.hash(url).cast("long")
