"""Atomic delta-commit bookkeeping for the training-export capstones.

Both incremental exporters (``imaging/training_export.py`` — WDS tar
shards; ``crawl/text_export.py`` — packed LM-corpus parquet shards)
keep two bookkeeping tables under their output directory: the
published member ids (``_published``) and the shard manifest
(``_manifest``). Writing them as two independent appends leaves a
crash window where ids are marked published while their shards are
absent from the manifest — a retry then computes an EMPTY delta and
the documents are silently dropped from the trainer-visible corpus
forever.

This module closes that window the same way ``frontier.store.
SnapshotParquetStore`` does: every export writes its bookkeeping into
per-delta subdirectories (``_published/delta-000000/…``,
``_manifest/delta-000000/…``) that stay INVISIBLE until one pointer
file (``_COMMITTED.json``) is atomically flipped (tmp + ``os.replace``)
to list the new delta. Readers union only committed delta dirs.
Crash anywhere before the flip: the pointer is unchanged, the retry
recomputes the SAME delta (shard writing is deterministic by the
exporters' contract) and overwrites both the orphan bookkeeping dirs
and the shard files in place. No drops, no duplicates, no torn state.

Scale shape: the pointer is O(#exports) integers; bookkeeping stays
Spark-written parquet (never driver-materialized); reads are a
multi-path ``spark.read.parquet`` over committed dirs only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

POINTER = "_COMMITTED.json"


def committed_deltas(out_dir: str) -> list[int]:
    """Delta ids visible to readers (empty = nothing committed)."""
    p = os.path.join(out_dir, POINTER)
    if not os.path.isfile(p):
        return []
    with open(p, "r", encoding="utf-8") as f:
        return [int(n) for n in json.load(f)["deltas"]]


def _delta_dir(out_dir: str, sub: str, n: int) -> str:
    return os.path.join(out_dir, sub, f"delta-{n:06d}")


def read_committed(
    spark: SparkSession, out_dir: str, sub: str
) -> DataFrame | None:
    """Union of the committed delta dirs under ``out_dir/sub``
    (``None`` when nothing is committed)."""
    deltas = committed_deltas(out_dir)
    if not deltas:
        return None
    return spark.read.parquet(*[_delta_dir(out_dir, sub, n) for n in deltas])


def stage_delta(out_dir: str, sub: str, df: DataFrame, n: int) -> None:
    """Write one bookkeeping table into its (uncommitted) delta dir.
    ``overwrite`` so a crashed run's orphan dir is cleanly replaced by
    the retry."""
    df.write.mode("overwrite").parquet(_delta_dir(out_dir, sub, n))


def commit_delta(out_dir: str, n: int, *, full: bool) -> None:
    """Atomically flip the pointer to include delta ``n`` — the single
    commit point. ``full=True`` resets the pointer to just ``n`` (a
    non-incremental export replaces the corpus bookkeeping)."""
    deltas = [n] if full else sorted(set(committed_deltas(out_dir)) | {n})
    p = os.path.join(out_dir, POINTER)
    tmp = p + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"deltas": deltas}, f)
    os.replace(tmp, p)
