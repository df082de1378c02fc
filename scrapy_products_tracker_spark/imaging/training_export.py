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
) -> DataFrame:
    """Export the store's crawled image+caption rows as curated
    WebDataset tar shards under ``out_dir``; returns the shard
    manifest ``(shard_id, path, n_samples, tar_bytes, tar_md5)``.

    Deterministic end to end: the same store version produces
    byte-identical shards (curate/pack/write are all id-ordered and
    partitioning-invariant — pinned by the wds roundtrip tests), so a
    re-export is a safe retry."""
    res = store.read_results(spark, version=version)
    rows = res.filter(F.col("decode_ok") & F.col("bytes").isNotNull())
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
    return spark.createDataFrame(out, MANIFEST_SCHEMA)
