"""Structured Streaming consumers over the results store.

Determinism: the crawl commits a known item count, then AvailableNow
drains everything committed so far and stops — streaming totals must
equal the batch counters exactly.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
from scrapy_products_tracker_spark.politeness import load_robots
from scrapy_products_tracker_spark.streaming import (
    domain_rate_stream,
    run_to_parquet,
    stream_results,
    windowed_fetch_counts,
)


@pytest.fixture(scope="module")
def crawled_store(spark, t1_paths):
    tmp = tempfile.mkdtemp(prefix="stream_store_")
    store = SnapshotParquetStore(tmp + "/store")
    drv = CrawlDriver(
        spark,
        store,
        spark.read.parquet(t1_paths["pages"]),
        spark.read.parquet(t1_paths["image_caption"]),
        load_robots(spark, t1_paths["robots"]),
        CrawlConfig(chunk_size=50),
    )
    drv.seed(spark.read.parquet(t1_paths["seeds"]))
    meta = drv.run()
    return store, meta


def test_stream_drains_all_committed_items(spark, crawled_store):
    store, meta = crawled_store
    tmp = tempfile.mkdtemp(prefix="stream_out_")
    agg = domain_rate_stream(stream_results(spark, str(store.root)))
    run_to_parquet(agg, tmp + "/out", tmp + "/ckpt")
    out = spark.read.parquet(tmp + "/out")
    total = out.agg(F.sum("n_items")).collect()[0][0]
    assert total == meta["counters"]["items_emitted"]
    # every round present, all decodes ok
    rows = {r["round"]: r for r in out.collect()}
    assert all(r["n_decode_ok"] == r["n_items"] for r in rows.values())


def test_windowed_counts_with_watermark(spark, crawled_store):
    store, meta = crawled_store
    tmp = tempfile.mkdtemp(prefix="stream_win_")
    agg = windowed_fetch_counts(
        stream_results(spark, str(store.root)), window="1 hour", watermark="2 hours"
    )
    run_to_parquet(agg, tmp + "/out", tmp + "/ckpt")
    out = spark.read.parquet(tmp + "/out").collect()
    assert sum(r["n_items"] for r in out) == meta["counters"]["items_emitted"]
    assert {r["fmt"] for r in out} <= {"png", "jpeg"}
    assert all(r["payload_bytes"] > 0 for r in out)


def test_integrity_stream_equals_batch_audit(spark, crawled_store):
    """The streaming header audit must agree with the batch audit over
    the same committed results — and a healthy crawl has zero bad rows."""
    from scrapy_products_tracker_spark.imaging import header_integrity_flags
    from scrapy_products_tracker_spark.streaming import integrity_rate_stream

    store, meta = crawled_store
    tmp = tempfile.mkdtemp(prefix="stream_integrity_")
    agg = integrity_rate_stream(
        stream_results(spark, str(store.root)), window="1 hour", watermark="2 hours"
    )
    run_to_parquet(agg, tmp + "/out", tmp + "/ckpt")
    out = spark.read.parquet(tmp + "/out")
    stream_rows = out.agg(F.sum("n_rows")).collect()[0][0]
    stream_bad = out.agg(F.sum("n_bad")).collect()[0][0]

    batch = spark.read.option("recursiveFileLookup", "true").parquet(
        f"{store.root}/data/results"
    )
    flagged = header_integrity_flags(batch)
    assert stream_rows == flagged.count() == meta["counters"]["items_emitted"]
    assert stream_bad == flagged.filter(~F.col("ok")).count() == 0
    # containers observed must be exactly the payload formats committed
    stream_containers = {r["container"] for r in out.select("container").distinct().collect()}
    batch_containers = {r["container"] for r in flagged.select("container").distinct().collect()}
    assert stream_containers == batch_containers <= {"png", "lossy-png", "jpeg"}
