"""Golden parity: the Spark engine must reproduce the pure-Python
reference-semantics oracle EXACTLY — crawl order, seen set (incl.
status/attempt per URL), counters, and emitted items (FIXTURES.md §5,
BASELINE.json north rule)."""

import numpy as np
import pytest

from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
from scrapy_products_tracker_spark.imaging import decode_image, psnr
from scrapy_products_tracker_spark.oracle import simulate_crawl
from scrapy_products_tracker_spark.politeness import load_robots

CHUNK = 50


@pytest.fixture(scope="module")
def crawl_run(spark, t1_world, t1_paths, tmp_path_factory):
    store = SnapshotParquetStore(str(tmp_path_factory.mktemp("store")))
    drv = CrawlDriver(
        spark,
        store,
        spark.read.parquet(t1_paths["pages"]),
        spark.read.parquet(t1_paths["image_caption"]),
        load_robots(spark, t1_paths["robots"]),
        CrawlConfig(chunk_size=CHUNK),
    )
    drv.seed(spark.read.parquet(t1_paths["seeds"]))
    meta = drv.run()
    sim = simulate_crawl(t1_world, chunk_size=CHUNK)
    return store, meta, sim


def test_crawl_order_exact(spark, crawl_run):
    store, meta, sim = crawl_run
    rows = store.read_crawl_order(spark).orderBy("round", "within_round_rank").collect()
    got = [(r["round"], r["url"], r["domain"], r["within_round_rank"]) for r in rows]
    assert got == sim.crawl_order


def test_seen_set_exact(spark, crawl_run):
    store, meta, sim = crawl_run
    fr = store.read_frontier(spark).collect()
    got = {
        r["url"]: (r["status"], r["attempt"], r["discovered_seq"], r["tier"], r["depth"], r["source"])
        for r in fr
    }
    want = {
        u: (r["status"], r["attempt"], r["discovered_seq"], r["tier"], r["depth"], r["source"])
        for u, r in sim.seen.items()
    }
    assert got == want


def test_counters_exact(crawl_run):
    _, meta, sim = crawl_run
    assert meta["counters"] == sim.counters


def test_items_exact_and_invariant(spark, t1_world, crawl_run):
    store, meta, sim = crawl_run
    rows = store.read_results(spark).collect()
    got = {(r["url"], r["round"], r["image_id"], r["caption"], r["position"]) for r in rows}
    assert got == set(sim.items)
    # per-row invariant (input_hint): decoded pixels PSNR>=40dB vs the
    # fixture decode (exact for png), caption equality
    src = {r["image_id"]: r for _, r in t1_world.image_caption.iterrows()}
    assert rows, "no items emitted"
    for r in rows:
        assert r["decode_ok"]
        fixture = src[r["image_id"]]
        assert r["caption"] == fixture["caption"]
        a = decode_image(bytes(fixture["bytes"]))
        b = decode_image(bytes(r["bytes"]))
        p = psnr(a, b)
        if r["fmt"] == "png":
            assert p == float("inf")
        else:
            assert p >= 40.0


def test_per_domain_lineage_recorded(crawl_run):
    store, meta, sim = crawl_run
    assert meta["lineage"]  # per-domain claim counts for the last round
    m = store.read_manifest()
    assert m["meta"]["lineage"] == meta["lineage"]
