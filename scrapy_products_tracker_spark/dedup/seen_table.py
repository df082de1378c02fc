"""Distributed URL-seen set: parquet-backed Bloom / cuckoo shard tables.

Replaces the reference's MySQL ``UNIQUE(url)`` seen-set
(product_targets.py:11, utils/read_csv.py:66-70) at 10^10-URL scale.
Round 1 kept the shard state driver-resident (collected bit arrays,
closure-shipped to executors) — fine at sandbox scale, ~12 GB of driver
state re-pickled per stage at 10^10 keys. This module is the at-scale
path the round-1 docstrings promised:

- **state lives in parquet**, one row per hash-space shard
  (``bucket -> packed bit array`` for Bloom, ``shard -> slot table``
  for cuckoo), written next to the frontier snapshots and referenced
  per-shard from the snapshot manifest (so a round's commit rewrites
  only dirty shards).
- **build** is ``groupBy(bucket).applyInPandas`` writing straight to
  the table — no ``.collect()`` anywhere.
- **probe** is a bucket-co-partitioned cogroup join: candidates are
  bucketed by the same JVM-side key that built the shards and each
  task sees exactly (its candidates, its one shard row). The shard
  payload never leaves the executors and is never broadcast.
- **delta-merge** (a round's newly inserted URLs) ORs Bloom bits /
  inserts cuckoo fingerprints into the dirty shards only, again as a
  cogroup.

All kernels are vectorized numpy over JVM-computed hashes
(xxhash64 + murmur3, Kirsch-Mitzenmacher probing — see bloom.py); no
per-row Python hashing. Both filters stay *pre*-filters: maybe-seen
candidates are always confirmed by an exact anti-join against the
frontier, so false positives never drop a URL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bloom import _positions, bucket_col, with_bloom_hashes
from .cuckoo import _SLOTS, CuckooFilter

BLOOM_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

CUCKOO_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),  # shard id (uniform name)
        T.StructField("count", T.LongType()),
        T.StructField("table", T.BinaryType()),
    ]
)

CUCKOO_DELTA_SCHEMA_COLS = ["bucket", "_h1", "_h2"]


def _require_pow2(n: int, what: str) -> None:
    if n < 1 or (n & (n - 1)) != 0:
        raise ValueError(f"{what} must be a power of two, got {n}")


def _marked_schema(df: DataFrame) -> T.StructType:
    return T.StructType(df.schema.fields + [T.StructField("_maybe_seen", T.BooleanType())])


class BloomTable:
    """Handle on a bucket-sharded Bloom seen-set stored in parquet."""

    kind = "bloom"

    def __init__(self, spark: SparkSession, paths: list[str], params: dict):
        self.spark = spark
        self.paths = [str(p) for p in paths]
        self.n_buckets = int(params["n_buckets"])
        self.bits = int(params["bits"])
        self.k = int(params["k"])
        _require_pow2(self.n_buckets, "n_buckets")

    @property
    def params(self) -> dict:
        return {"n_buckets": self.n_buckets, "bits": self.bits, "k": self.k}

    def shard_of_hash_col(self, url_hash_col) -> "F.Column":
        """Shard id from the frontier's url_hash (== xxhash64(url) ==
        the probe's _h1), JVM-side — lets callers piggyback dirty-shard
        detection on an existing job instead of a dedicated collect."""
        return bucket_col(url_hash_col, self.n_buckets)

    def shards_df(self) -> DataFrame:
        if not self.paths:
            return self.spark.createDataFrame([], BLOOM_SHARD_SCHEMA)
        return self.spark.read.parquet(*self.paths)

    # --- kernels (all executor-side) -----------------------------------
    @staticmethod
    def build_shards_df(
        df: DataFrame, url_col: str, n_buckets: int, bits: int, k: int
    ) -> DataFrame:
        """(bucket, payload) shard rows from a URL DataFrame; the caller
        writes them (store) — nothing is collected to the driver."""
        _require_pow2(n_buckets, "n_buckets")
        bits_, k_ = bits, k

        def _build(key, pdf):
            arr = np.zeros((bits_ + 7) // 8, dtype=np.uint8)
            pos = _positions(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), k_, bits_).ravel()
            np.bitwise_or.at(arr, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            return pd.DataFrame({"bucket": [key[0]], "payload": [arr.tobytes()]})

        hashed = with_bloom_hashes(df, url_col).withColumn(
            "_bucket", bucket_col(F.col("_h1"), n_buckets)
        )
        return hashed.groupBy("_bucket").applyInPandas(_build, BLOOM_SHARD_SCHEMA)

    def delta_df(self, inserts: DataFrame, url_col: str = "url") -> DataFrame:
        return self.build_shards_df(inserts, url_col, self.n_buckets, self.bits, self.k)

    @staticmethod
    def merge_shards(existing: DataFrame, delta: DataFrame) -> DataFrame:
        """OR shard payloads per bucket (existing dirty rows ∪ delta)."""

        def _or(key, pdf):
            arr = np.frombuffer(pdf["payload"].iloc[0], dtype=np.uint8).copy()
            for p in pdf["payload"].iloc[1:]:
                arr |= np.frombuffer(p, dtype=np.uint8)
            return pd.DataFrame({"bucket": [key[0]], "payload": [arr.tobytes()]})

        both = existing.select("bucket", "payload").unionByName(
            delta.select("bucket", "payload")
        )
        return both.groupBy("bucket").applyInPandas(_or, BLOOM_SHARD_SCHEMA)

    def mark(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        """df + ``_maybe_seen``: bucket-co-partitioned cogroup probe.

        Each task receives (bucket's candidates, bucket's shard row);
        the probe is the same vectorized Kirsch-Mitzenmacher test the
        build used. Candidates in buckets with no shard row are
        definitely unseen."""
        bits, k = self.bits, self.k
        out_schema = _marked_schema(df)
        helper = ["_h1", "_h2", "_bucket"]

        def _probe(cand: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
            if len(cand) == 0:
                out = cand.drop(columns=helper)
                out["_maybe_seen"] = pd.Series([], dtype=bool)
                return out
            h1 = cand["_h1"].to_numpy()
            h2 = cand["_h2"].to_numpy()
            if len(shard) == 0:
                hit = np.zeros(len(cand), dtype=bool)
            else:
                arr = np.frombuffer(shard["payload"].iloc[0], dtype=np.uint8)
                for p in shard["payload"].iloc[1:]:  # overlapping files: OR
                    arr = arr | np.frombuffer(p, dtype=np.uint8)
                pos = _positions(h1, h2, k, bits)
                hit = ((arr[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0).all(axis=1)
            out = cand.drop(columns=helper)
            out["_maybe_seen"] = hit
            return out

        hashed = with_bloom_hashes(df, url_col).withColumn(
            "_bucket", bucket_col(F.col("_h1"), self.n_buckets)
        )
        return (
            hashed.groupby("_bucket")
            .cogroup(self.shards_df().select("bucket", "payload").groupby("bucket"))
            .applyInPandas(lambda left, right: _probe(left, right), out_schema)
        )


def _cuckoo_shard_np(h1: np.ndarray, n_shards: int) -> np.ndarray:
    """Shard id from bits 32.. of h1 (the in-shard bucket index uses the
    low bits via ``% n_buckets``, so the two never correlate)."""
    return ((h1.astype(np.int64).view(np.uint64) >> np.uint64(32)) & np.uint64(n_shards - 1)).astype(
        np.int64
    )


def _cuckoo_shard_col(h1: "F.Column", n_shards: int) -> "F.Column":
    return F.shiftrightunsigned(h1, 32).bitwiseAND(F.lit(n_shards - 1)).cast("int")


def _cuckoo_from_row(table_bytes: bytes, n_buckets: int, count: int) -> CuckooFilter:
    ck = CuckooFilter(n_buckets)
    ck.table = np.frombuffer(table_bytes, dtype=np.uint16).reshape(n_buckets, _SLOTS).copy()
    ck.count = count
    return ck


class CuckooTable:
    """Handle on a sharded cuckoo seen-set stored in parquet.

    Same layout contract as BloomTable; supports deletion (O5/O6
    rollback semantics) via ``delete_delta`` — the Bloom table cannot
    retract entries."""

    kind = "cuckoo"

    def __init__(self, spark: SparkSession, paths: list[str], params: dict):
        self.spark = spark
        self.paths = [str(p) for p in paths]
        self.n_shards = int(params["n_shards"])
        self.n_buckets = int(params["n_buckets"])  # per shard
        _require_pow2(self.n_shards, "n_shards")
        _require_pow2(self.n_buckets, "n_buckets")

    @property
    def params(self) -> dict:
        return {"n_shards": self.n_shards, "n_buckets": self.n_buckets}

    def shard_of_hash_col(self, url_hash_col) -> "F.Column":
        """See BloomTable.shard_of_hash_col (url_hash == _h1)."""
        return _cuckoo_shard_col(url_hash_col, self.n_shards)

    @classmethod
    def params_for_capacity(cls, n_keys: int, n_shards: int) -> dict:
        per_shard = max(2, int(n_keys / max(1, n_shards) / (_SLOTS * 0.84)) + 1)
        n_buckets = 1 << int(np.ceil(np.log2(per_shard)))
        return {"n_shards": n_shards, "n_buckets": n_buckets}

    def shards_df(self) -> DataFrame:
        if not self.paths:
            return self.spark.createDataFrame([], CUCKOO_SHARD_SCHEMA)
        return self.spark.read.parquet(*self.paths)

    @property
    def count(self) -> int:
        """Total stored fingerprints (test/metrics convenience; reads
        only the tiny ``count`` column driver-side, never the tables)."""
        row = self.shards_df().agg(F.sum("count").alias("c")).collect()[0]
        return int(row["c"] or 0)

    # --- kernels -------------------------------------------------------
    @staticmethod
    def build_shards_df(
        df: DataFrame, url_col: str, n_shards: int, n_buckets: int
    ) -> DataFrame:
        _require_pow2(n_shards, "n_shards")
        nb = n_buckets

        def _build(key, pdf):
            ck = CuckooFilter(nb)
            ck.add_many(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy())
            return pd.DataFrame(
                {"bucket": [key[0]], "count": [ck.count], "table": [ck.table.tobytes()]}
            )

        hashed = with_bloom_hashes(df, url_col).withColumn(
            "_bucket", _cuckoo_shard_col(F.col("_h1"), n_shards)
        )
        return hashed.groupBy("_bucket").applyInPandas(_build, CUCKOO_SHARD_SCHEMA)

    def delta_df(self, inserts: DataFrame, url_col: str = "url") -> DataFrame:
        """(bucket, _h1, _h2) rows — the merge inserts them per shard."""
        return with_bloom_hashes(inserts, url_col).select(
            _cuckoo_shard_col(F.col("_h1"), self.n_shards).alias("bucket"), "_h1", "_h2"
        )

    def merge_shards(self, existing: DataFrame, delta: DataFrame, op: str = "add") -> DataFrame:
        """Insert (or delete) delta hashes into their shards' tables."""
        nb = self.n_buckets

        def _merge(dpdf: pd.DataFrame, spdf: pd.DataFrame) -> pd.DataFrame:
            if len(spdf):
                ck = _cuckoo_from_row(
                    spdf["table"].iloc[0], nb, int(spdf["count"].iloc[0])
                )
            else:
                ck = CuckooFilter(nb)
            b = int(dpdf["bucket"].iloc[0]) if len(dpdf) else int(spdf["bucket"].iloc[0])
            if len(dpdf):
                h1, h2 = dpdf["_h1"].to_numpy(), dpdf["_h2"].to_numpy()
                ck.delete_many(h1, h2) if op == "delete" else ck.add_many(h1, h2)
            return pd.DataFrame(
                {"bucket": [b], "count": [ck.count], "table": [ck.table.tobytes()]}
            )

        return (
            delta.groupby("bucket")
            .cogroup(existing.select("bucket", "count", "table").groupby("bucket"))
            .applyInPandas(lambda left, right: _merge(left, right), CUCKOO_SHARD_SCHEMA)
        )

    def mark(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        nb = self.n_shards
        n_buckets = self.n_buckets
        out_schema = _marked_schema(df)
        helper = ["_h1", "_h2", "_bucket"]

        def _probe(cand: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
            if len(cand) == 0:
                out = cand.drop(columns=helper)
                out["_maybe_seen"] = pd.Series([], dtype=bool)
                return out
            if len(shard) == 0:
                hit = np.zeros(len(cand), dtype=bool)
            else:
                ck = _cuckoo_from_row(
                    shard["table"].iloc[0], n_buckets, int(shard["count"].iloc[0])
                )
                hit = ck.contains_many(cand["_h1"].to_numpy(), cand["_h2"].to_numpy())
            out = cand.drop(columns=helper)
            out["_maybe_seen"] = hit
            return out

        hashed = with_bloom_hashes(df, url_col).withColumn(
            "_bucket", _cuckoo_shard_col(F.col("_h1"), nb)
        )
        return (
            hashed.groupby("_bucket")
            .cogroup(self.shards_df().groupby("bucket"))
            .applyInPandas(lambda left, right: _probe(left, right), out_schema)
        )


FILL_STATS_SCHEMA = (
    "bucket int, set_bits bigint, bits bigint, fill_milli bigint, "
    "est_keys bigint, est_fp_micro bigint"
)


def bloom_fill_stats(shards: DataFrame, bits: int, k: int) -> DataFrame:
    """Per-shard Bloom saturation report — the signal the resize
    maintenance job (:meth:`frontier.store.SnapshotParquetStore.
    rebuild_seen`) acts on.

    A Bloom filter's false-positive rate is a function of its fill
    fraction X/m: ``fp = (X/m)^k``; once fill passes ~50% the filter
    stops earning its keep (every FP costs an exact-confirm anti-join
    probe downstream). At 10^10 inserts a fixed-size filter WILL
    saturate — the honest answer is to measure and rebuild, not to
    pretend the initial sizing holds forever.

    Columns (integer fixed-point so thresholds compare exactly):
    ``set_bits`` (popcount), ``fill_milli`` (1000*X/m), ``est_keys``
    (inverted fill expectation ``-(m/k) ln(1 - X/m)``, the standard
    cardinality estimate), ``est_fp_micro`` (10^6 * (X/m)^k).

    Arrow-batched numpy popcount over the shard payloads (one pass,
    executor-side, nothing collected); at 2^20 buckets the output is
    a million tiny rows — aggregate before looking at it."""
    import pandas as pd  # noqa: F811 (kernel-local, matches module deps)

    m_bits, kk = int(bits), int(k)

    def _stats(batches):
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                arr = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
                x = int(np.unpackbits(arr).sum())
                fill = x / m_bits
                est_keys = 0 if fill >= 1.0 else int(round(-(m_bits / kk) * np.log(1.0 - fill)))
                out.append(
                    {
                        "bucket": int(r["bucket"]),
                        "set_bits": x,
                        "bits": m_bits,
                        "fill_milli": (1000 * x) // m_bits,
                        "est_keys": est_keys,
                        "est_fp_micro": int(1_000_000 * fill**kk),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "bucket", "set_bits", "bits", "fill_milli", "est_keys", "est_fp_micro",
                ],
            )

    return shards.select("bucket", "payload").mapInPandas(_stats, FILL_STATS_SCHEMA)


def open_seen_table(spark: SparkSession, kind: str, paths: list[str], params: dict):
    if kind == "bloom":
        return BloomTable(spark, paths, params)
    if kind == "cuckoo":
        return CuckooTable(spark, paths, params)
    raise ValueError(f"unknown seen-table kind {kind!r}")
