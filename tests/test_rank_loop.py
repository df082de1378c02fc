"""Importance-fed frontier loop: crawl-recorded link edges ->
PageRank/HITS re-prioritization -> claims follow rank order
(crawl/rank.py, CrawlConfig.record_link_edges, jobs/rank_job.py)."""

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
from scrapy_products_tracker_spark.crawl.rank import reprioritize_frontier
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
from scrapy_products_tracker_spark.politeness import load_robots
from scrapy_products_tracker_spark.schemas import PENDING
from scrapy_products_tracker_spark.synth import T1_SMOKE, generate_world, write_world

T1_COUNTERS = {
    "urls_seen": 119, "urls_fetched": 106, "urls_deduped": 13,
    "urls_skipped_robots": 7, "urls_failed_hw": 0, "urls_failed_logic": 6,
    "items_emitted": 96,
}


@pytest.fixture(scope="module")
def world_paths(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rankworld")
    return write_world(generate_world(T1_SMOKE), str(tmp))


def _driver(spark, paths, store, **cfg):
    drv = CrawlDriver(
        spark, store,
        spark.read.parquet(paths["pages"]),
        spark.read.parquet(paths["image_caption"]),
        load_robots(spark, paths["robots"]),
        CrawlConfig(chunk_size=50, **cfg),
    )
    drv.seed(spark.read.parquet(paths["seeds"]))
    return drv


def test_edge_recording_invisible_and_consistent(spark, world_paths, tmp_path_factory):
    store = SnapshotParquetStore(str(tmp_path_factory.mktemp("s1")))
    drv = _driver(spark, world_paths, store, record_link_edges=True)
    meta = drv.run()
    assert meta["counters"] == T1_COUNTERS  # recording changes nothing
    edges = store.read_link_edges(spark)
    assert edges is not None and edges.count() > 0
    # every edge endpoint is a frontier row (children were canonical
    # pre-dedup; dedup only suppressed INSERTS, not edges)
    fr_hashes = {r["url_hash"] for r in store.read_frontier(spark).collect()}
    for r in edges.select("src_url_hash", "dst_url_hash").collect():
        assert r["src_url_hash"] in fr_hashes
        assert r["dst_url_hash"] in fr_hashes
    # per-round distinctness
    n = edges.count()
    assert edges.select("src_url_hash", "dst_url_hash", "round").distinct().count() == n


def test_reprioritize_then_resume(spark, world_paths, tmp_path_factory):
    """Two rounds -> rank job -> ranked PENDING rows carry -pagerank
    as priority (unranked keep base) -> the continued crawl completes
    with the same totals."""
    from scrapy_products_tracker_spark.functions.graph import pagerank_units

    store = SnapshotParquetStore(str(tmp_path_factory.mktemp("s2")))
    drv = _driver(spark, world_paths, store, record_link_edges=True)
    drv.run_round()
    drv.run_round()
    out = reprioritize_frontier(spark, store, method="pagerank", iters=2)
    assert out is not None and out["n_edges"] > 0
    # expected ranks recomputed independently over the same edge set
    e = store.read_link_edges(spark).select(
        F.col("src_url_hash").alias("src"), F.col("dst_url_hash").alias("dst")
    ).distinct()
    want = {r["node"]: r["rank_units"] for r in pagerank_units(e, iters=2).collect()}
    fr = store.read_frontier(spark).collect()
    ranked = 0
    for r in fr:
        if r["url_hash"] in want:
            ranked += 1
            assert r["priority"] == -want[r["url_hash"]]
    assert ranked == out["n_ranked"]
    # continued crawl: importance order, identical totals
    meta = drv.run()
    assert meta["counters"] == T1_COUNTERS


def test_rank_job_cli(spark, world_paths, tmp_path_factory):
    import json
    from contextlib import redirect_stdout
    from io import StringIO

    from jobs.rank_job import main

    store_dir = str(tmp_path_factory.mktemp("s3"))
    store = SnapshotParquetStore(store_dir)
    drv = _driver(spark, world_paths, store, record_link_edges=True)
    drv.run_round()
    drv.run_round()
    buf = StringIO()
    with redirect_stdout(buf):
        main(["--store", store_dir, "--method", "hits_hub", "--iters", "2"])
    out = json.loads(buf.getvalue().strip())
    assert out["n_edges"] > 0 and out["version"] == store.latest_version()
    # hubs are tier-0 listing pages (already fetched by round 2) —
    # their frontier rows now carry negated positive hub mass; detail
    # pages have hub 0, so check the whole frontier, not just PENDING
    rows = store.read_frontier(spark).collect()
    assert any(r["priority"] < 0 for r in rows)
