"""Crawl store → curated WebDataset training shards: the whole
north-rule story as ONE composition — the frontier crawls image +
caption pairs into the snapshot store; this module turns the store's
results table into the tar shards a training job mounts.

Pipeline (every stage an already-tested operator):

1. read the store's append-only ``results`` table (url, image_id,
   bytes, w, h, fmt, caption, phash, decode_ok, …) — the exact
   north-rule input shape plus crawl lineage;
2. drop undecodable / payload-less rows (``decode_ok``; the crawl
   already counted them — X6 audit semantics);
3. optional perceptual near-dup pruning
   (:func:`~.neardup.image_dedup_survivors` — banded phash Hamming,
   cluster-exact when ``transitive``);
4. the curation funnel (:func:`~.dataset.curate`: LAION-style row
   filters → exact-bytes dedup → optional temperature balance);
5. shard packing + tar materialization
   (:func:`~.wds.write_wds_shards`), then one Arrow-batched writer
   puts each shard at ``{out_dir}/shard-NNNNNN.tar`` and returns the
   manifest.

Scale shape: stages 2-4 are the funnel's narrow-projection plans
(payload bytes cross only the id-joins); packing shuffles byte
LENGTHS, not bytes; the tar bytes themselves are assembled and
written executor-side, one task per shard — the driver only ever
sees the (shard_id, n_members, sha) manifest. ``out_dir`` must be a
shared filesystem on a real cluster (same contract as any
``DataFrame.write`` path).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .dataset import curate
from .wds import write_wds_shards

MANIFEST_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("path", StringType()),
        StructField("n_samples", LongType()),
        StructField("tar_bytes", LongType()),
        StructField("tar_md5", StringType()),
    ]
)


def export_training_shards(
    spark: SparkSession,
    store,
    out_dir: str,
    *,
    budget_bytes: int,
    min_caption_tokens: int = 4,
    min_side_px: int = 16,
    max_aspect_milli: int = 3000,
    balance_col: str = "fmt",
    sample_target: int | None = None,
    phash_neardup: bool = False,
    neardup_threshold: int = 2,
    transitive: bool = False,
    range_col: str | None = None,
    version: int | None = None,
    incremental: bool = False,
) -> DataFrame:
    """Export the store's crawled image+caption rows as curated
    WebDataset tar shards under ``out_dir``; returns the shard
    manifest ``(shard_id, path, n_samples, tar_bytes, tar_md5)``.

    Deterministic end to end: the same store version produces
    byte-identical shards (curate/pack/write are all id-ordered and
    partitioning-invariant — pinned by the wds roundtrip tests), so a
    re-export is a safe retry.

    ``incremental=True`` (VERDICT r03 #8): publish a DELTA against
    what this ``out_dir`` already holds instead of re-exporting the
    full curated set. The export keeps its own bookkeeping under
    ``out_dir/_published`` (member image_ids) and ``out_dir/_manifest``
    (shard manifest rows); a delta run anti-joins the store's rows
    against the published ids, drops exact/perceptual duplicates of
    the ALREADY-PUBLISHED corpus (:func:`~.neardup.
    image_dedup_against_corpus` — the cross-set incremental dedup, so
    a re-crawl of a known image never re-ships it), curates only the
    survivors, and numbers new shards after the highest published id —
    previously delivered tar files are never rewritten. A delta with
    nothing new publishes nothing. The first incremental run (no
    bookkeeping yet) behaves like a full export and seeds the
    bookkeeping. At 10^10 scale the anti-join is an id-keyed
    equi-join and the cross-set pass is the banded-phash equi-join —
    payload bytes still never shuffle except into the tar sink."""
    from ..export_commit import (
        commit_delta,
        committed_deltas,
        read_committed,
        stage_delta,
    )

    res = store.read_results(spark, version=version)
    rows = res.filter(F.col("decode_ok") & F.col("bytes").isNotNull())
    prior = incremental and bool(committed_deltas(out_dir))
    delta_id = len(committed_deltas(out_dir)) if incremental else 0
    base_shard = 0
    if prior:
        from .neardup import image_dedup_against_corpus

        published = read_committed(spark, out_dir, "_published").select(
            "image_id"
        ).distinct()
        base_shard = (
            int(
                read_committed(spark, out_dir, "_manifest")
                .agg(F.max("shard_id"))
                .first()[0]
                or -1
            )
            + 1
        )
        corpus = rows.join(published, "image_id", "leftsemi")
        fresh = rows.join(published, "image_id", "left_anti")
        rows = image_dedup_against_corpus(fresh, corpus, threshold=neardup_threshold)
    if phash_neardup:
        from .neardup import image_dedup_survivors

        rows = image_dedup_survivors(
            rows,
            threshold=neardup_threshold,
            transitive=transitive,
        )
    curated = curate(
        rows,
        min_caption_tokens=min_caption_tokens,
        min_side_px=min_side_px,
        max_aspect_milli=max_aspect_milli,
        balance_col=balance_col,
        sample_target=sample_target,
    )
    shards = write_wds_shards(
        curated.select("image_id", "bytes", "caption"),
        budget_bytes,
        range_col=range_col,
    )
    if base_shard:
        # delta shards number after the highest published shard: the
        # already-delivered tar files are immutable
        shards = shards.withColumn(
            "shard_id", (F.col("shard_id") + F.lit(base_shard)).cast("long")
        )
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows_out = []
            for _, r in pdf.iterrows():
                data = bytes(r["tar_bytes"])
                path = os.path.join(out_dir, f"shard-{int(r['shard_id']):06d}.tar")
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, path)  # atomic publish per shard
                rows_out.append(
                    {
                        "shard_id": int(r["shard_id"]),
                        "path": path,
                        "n_samples": int(r["n_samples"]),
                        "tar_bytes": len(data),
                        "tar_md5": hashlib.md5(data).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows_out,
                columns=["shard_id", "path", "n_samples", "tar_bytes", "tar_md5"],
            )

    manifest = (
        shards.repartition("shard_id")
        .mapInPandas(_write, MANIFEST_SCHEMA)
        .orderBy("shard_id")
    )
    # materialize so the side-effecting writes happen exactly once,
    # then hand back the tiny manifest
    out = manifest.collect()
    man_df = spark.createDataFrame(out, MANIFEST_SCHEMA)
    if not out:  # empty delta publishes nothing — no dirs, no commit
        return man_df
    # bookkeeping lands AFTER the shard files, staged into an invisible
    # delta dir and made visible by ONE atomic pointer flip
    # (export_commit): a crash anywhere before the flip leaves the
    # prior corpus intact and the retry recomputes + overwrites the
    # identical delta — ids can never be marked published while their
    # shards are missing from the manifest.
    stage_delta(out_dir, "_published", curated.select("image_id"), delta_id)
    stage_delta(out_dir, "_manifest", man_df, delta_id)
    commit_delta(out_dir, delta_id, full=not incremental)
    return man_df
