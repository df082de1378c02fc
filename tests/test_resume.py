"""Checkpoint/resume (north rule): kill after round k, resume from the
snapshot, final state identical to the uninterrupted run — the Spark
expression of the reference's nack-redelivery at-least-once semantics
(rpc_task_consumer.py:333-341) made effectively-once by idempotent
snapshot commits."""

import pytest

from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
from scrapy_products_tracker_spark.politeness import load_robots


def _driver(spark, t1_paths, store):
    return CrawlDriver(
        spark,
        store,
        spark.read.parquet(t1_paths["pages"]),
        spark.read.parquet(t1_paths["image_caption"]),
        load_robots(spark, t1_paths["robots"]),
        CrawlConfig(chunk_size=50),
    )


def _final_state(spark, store):
    fr = store.read_frontier(spark).collect()
    order = store.read_crawl_order(spark).collect()
    seen = sorted((r["url"], r["status"], r["attempt"], r["discovered_seq"]) for r in fr)
    co = sorted((r["round"], r["url"], r["within_round_rank"]) for r in order)
    return seen, co, store.read_manifest()["meta"]["counters"]


def test_resume_identical(spark, t1_paths, tmpdir_path):
    # uninterrupted run
    s1 = SnapshotParquetStore(tmpdir_path + "/full")
    d1 = _driver(spark, t1_paths, s1)
    d1.seed(spark.read.parquet(t1_paths["seeds"]))
    d1.run()

    # interrupted after 3 rounds; a *new* driver resumes from the snapshot
    s2 = SnapshotParquetStore(tmpdir_path + "/interrupted")
    d2 = _driver(spark, t1_paths, s2)
    d2.seed(spark.read.parquet(t1_paths["seeds"]))
    d2.run(max_rounds=3)
    d3 = _driver(spark, t1_paths, SnapshotParquetStore(tmpdir_path + "/interrupted"))
    d3.run()

    assert _final_state(spark, s1) == _final_state(spark, SnapshotParquetStore(tmpdir_path + "/interrupted"))


def test_uncommitted_round_replays_identically(spark, t1_paths, tmpdir_path):
    """Rollback to v_k and re-run: the redone round claims the same batch
    (crash-before-commit = reference nack -> redelivery, X4)."""
    store = SnapshotParquetStore(tmpdir_path)
    d = _driver(spark, t1_paths, store)
    d.seed(spark.read.parquet(t1_paths["seeds"]))
    d.run(max_rounds=2)
    v = store.latest_version()
    order_before = sorted(
        (r["round"], r["url"], r["within_round_rank"])
        for r in store.read_crawl_order(spark).collect()
    )
    d.run(max_rounds=1)  # round 3 happens...
    store.rollback(v)  # ...but "crashes" before anyone saw it
    d2 = _driver(spark, t1_paths, store)
    d2.run(max_rounds=1)  # replay round 3
    order_after = sorted(
        (r["round"], r["url"], r["within_round_rank"])
        for r in store.read_crawl_order(spark).collect()
    )
    assert len(order_after) > len(order_before)
    # ensure replayed round 3 equals what a straight run would produce
    s_ref = SnapshotParquetStore(tmpdir_path + "_ref")
    d_ref = _driver(spark, t1_paths, s_ref)
    d_ref.seed(spark.read.parquet(t1_paths["seeds"]))
    d_ref.run(max_rounds=3)
    ref = sorted(
        (r["round"], r["url"], r["within_round_rank"])
        for r in s_ref.read_crawl_order(spark).collect()
    )
    assert order_after == ref
