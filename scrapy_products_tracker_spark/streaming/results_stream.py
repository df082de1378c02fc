"""Structured Streaming consumers over the frontier store's results.

The reference's result pipeline is a RabbitMQ consumer loop (item
producer pipeline -> result queue -> product_result_consumer upserts,
SURVEY.md §2.2 K1/K4/K6). The batch engine replaces the queue with
append-only results directories inside the snapshot store; since every
snapshot commit only ADDS files under ``data/results/v*/``, that
directory tree is a valid Structured Streaming file source — the
streaming twin of the reference's always-on consumers:

- ``stream_results``: readStream over the results tree (schema fixed,
  no inference — file streams require it anyway);
- ``windowed_fetch_counts``: event-time tumbling-window counts with a
  watermark on ``fetched_at`` (late rows beyond the watermark are
  dropped, the standard late-data contract the reference never had);
- ``domain_rate_stream``: per-format/round throughput aggregates;
- ``run_to_parquet``: foreachBatch parquet sink with checkpointing;
  ``Trigger.AvailableNow`` drains everything committed so far and
  stops — which is how the tests make streaming deterministic.

At cluster scale the same code points at the Iceberg results table
(Iceberg supports streaming reads of append snapshots); the file-tree
fallback keeps the identical query shape in this sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fetchers.synthetic import PAYLOAD_SCHEMA_WITH_TS


def stream_results(spark: SparkSession, store_root: str) -> DataFrame:
    """File-source stream over every committed results directory."""
    return (
        spark.readStream.schema(PAYLOAD_SCHEMA_WITH_TS)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(f"{store_root}/data/results")
    )


def windowed_fetch_counts(
    results: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """Tumbling event-time windows of fetched items (O5's streaming
    twin: processing-time sessions become event-time windows)."""
    return (
        results.withWatermark("fetched_at", watermark)
        .groupBy(F.window("fetched_at", window).alias("w"), F.col("fmt"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.octet_length("bytes")).alias("payload_bytes"),
        )
        .select(F.col("w.start").alias("window_start"), "fmt", "n_items", "payload_bytes")
    )


def domain_rate_stream(results: DataFrame) -> DataFrame:
    """Per-round item counts — the streaming analog of the per-task
    counter aggregation (A1). Exact distinct is unsupported on streams,
    so distinct image cardinality uses ``approx_count_distinct`` (HLL)."""
    return results.groupBy("round").agg(
        F.count("*").alias("n_items"),
        F.approx_count_distinct("image_id").alias("n_images_approx"),
        F.sum(F.when(F.col("decode_ok"), 1).otherwise(0)).alias("n_decode_ok"),
    )


def run_to_parquet(agg: DataFrame, out_dir: str, checkpoint_dir: str):
    """Drain the stream into parquet, Trigger.AvailableNow only:
    process everything committed so far, write the complete aggregate,
    stop. The foreachBatch overwrite is correct exactly because
    AvailableNow + complete mode makes the final batch carry the whole
    result; a continuous append-mode variant would need a watermark on
    the aggregation and per-epoch output partitions (mode('append') to
    ``out_dir/epoch=N``) — not offered here because only the drain
    semantics are used and tested."""
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(lambda batch, epoch: batch.write.mode("overwrite").parquet(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def integrity_flags_stream(results: DataFrame) -> DataFrame:
    """Streaming payload QA, per-row: the header-integrity audit
    (imaging/headers.header_integrity_flags) applied to the results
    stream. The audit is pure stateless column algebra, so it attaches
    to a stream unchanged and stays append-mode capable — route rows
    with ``ok = false`` straight to a quarantine sink while the crawl
    is still running (the reference writes bytes to disk unaudited,
    save_images_pipeline.py:27-41)."""
    from ..imaging import header_integrity_flags

    return header_integrity_flags(results)


def integrity_rate_stream(
    results: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """Windowed corruption-rate monitor: per (event-time window,
    sniffed container) row and bad-row counts over the audited stream
    — the alerting twin of integrity_flags_stream."""
    flagged = integrity_flags_stream(results)
    return (
        flagged.withWatermark("fetched_at", watermark)
        .groupBy(F.window("fetched_at", window).alias("w"), F.col("container"))
        .agg(
            F.count("*").alias("n_rows"),
            F.count_if(~F.col("ok")).alias("n_bad"),
        )
        .select(F.col("w.start").alias("window_start"), "container", "n_rows", "n_bad")
    )
