"""P5 robots freshness (VERDICT r03 next-round #9): a mid-crawl robots
re-fetch re-tags claimable frontier rows in BOTH directions
(PENDING <-> SKIPPED_ROBOTS) and changes scheduling from the flip
round on, while AIMD budget state and parser routing survive the
refresh. The reference never reads robots.txt (ROBOTSTXT_OBEY unset);
this is the north rule's robots cache kept current over a weeks-long
10^10-URL crawl."""

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
from scrapy_products_tracker_spark.politeness import load_robots
from scrapy_products_tracker_spark.schemas import PENDING, SKIPPED_ROBOTS

CHUNK = 50


def _driver(spark, t1_paths, store, cfg=None, **kw):
    return CrawlDriver(
        spark,
        store,
        spark.read.parquet(t1_paths["pages"]),
        spark.read.parquet(t1_paths["image_caption"]),
        load_robots(spark, t1_paths["robots"]),
        cfg or CrawlConfig(chunk_size=CHUNK),
        **kw,
    )


def _bodies(spark, rows):
    return spark.createDataFrame(rows, "domain string, body string")


def test_refresh_flips_both_ways_and_changes_scheduling(spark, t1_paths, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path)
    drv = _driver(spark, t1_paths, store)
    drv.seed(spark.read.parquet(t1_paths["seeds"]))
    r1 = drv.run_round()
    flip_round = r1["round"] + 1

    fr = store.read_frontier(spark)
    domains = sorted(
        r["domain"] for r in drv.robots.select("domain").distinct().collect()
    )
    blocked_dom = "d0.example.com"
    n_skipped_before = fr.filter(F.col("status") == SKIPPED_ROBOTS).count()
    n_skipped_blocked_dom = fr.filter(
        (F.col("status") == SKIPPED_ROBOTS) & (F.col("domain") == blocked_dom)
    ).count()
    n_pend_details_blocked = fr.filter(
        (F.col("status") == PENDING)
        & (F.col("domain") == blocked_dom)
        & F.col("url").startswith(f"https://{blocked_dom}/p/")
    ).count()
    assert n_skipped_before > n_skipped_blocked_dom, "world must have /private rows outside d0"
    assert n_pend_details_blocked > 0, "world must have pending d0 details"

    # fresh fetch for EVERY domain: d0 now blocks /p/ (and keeps
    # /private); everyone else drops all rules (allow-all)
    bodies = _bodies(
        spark,
        [
            (
                d,
                "User-agent: *\nDisallow: /p/\nDisallow: /private"
                if d == blocked_dom
                else "User-agent: *\nAllow: /",
            )
            for d in domains
        ],
    )
    v_before = store.latest_version()
    info = drv.refresh_robots(bodies)
    assert store.latest_version() == v_before + 1
    assert info["flipped_to_skipped"] == n_pend_details_blocked
    assert info["flipped_to_pending"] == n_skipped_before - n_skipped_blocked_dom

    # frontier state after the flip: no d0 detail is claimable any more
    # (already-terminal rows — e.g. a detail seed fetched in round 1 —
    # keep their status: robots govern future fetches, not history)
    fr2 = store.read_frontier(spark)
    assert (
        fr2.filter(
            (F.col("domain") == blocked_dom)
            & F.col("url").startswith(f"https://{blocked_dom}/p/")
            & (F.col("status") == PENDING)
        ).count()
        == 0
    )
    assert (
        fr2.filter(
            (F.col("domain") != blocked_dom) & (F.col("status") == SKIPPED_ROBOTS)
        ).count()
        == 0
    )
    # manifest bookkeeping is exact after the flip
    meta = store.read_manifest()["meta"]
    n_pending = fr2.filter(F.col("status") == PENDING).count()
    assert meta["pending_hint"] == n_pending
    assert sum(meta["pending_per_bucket"].values()) == n_pending

    # scheduling changes from the flip round on: no d0 details are ever
    # claimed, previously-skipped /private rows now are
    drv.run()
    order = store.read_crawl_order(spark).collect()
    assert not any(
        r["url"].startswith(f"https://{blocked_dom}/p/")
        for r in order
        if r["round"] >= flip_round
    )
    assert any(
        "/private/" in r["url"] and r["domain"] != blocked_dom
        for r in order
        if r["round"] >= flip_round
    )


def test_refresh_keeps_operational_columns(spark, t1_paths, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path)
    drv = _driver(spark, t1_paths, store)
    drv.seed(spark.read.parquet(t1_paths["seeds"]))
    old = {r["domain"]: r for r in drv.robots.collect()}
    dom = "d1.example.com"
    drv.refresh_robots(
        _bodies(spark, [(dom, "User-agent: *\nDisallow: /p/\nCrawl-delay: 2")])
    )
    rows = {r["domain"]: r for r in drv.robots.collect()}
    # fresh rule columns win for the re-fetched domain
    assert rows[dom]["disallow_prefixes"] == ["/p/"]
    assert rows[dom]["crawl_delay_ms"] == 2000
    # operational columns survive (AIMD budget state, parser routing)
    assert rows[dom]["max_per_round"] == old[dom]["max_per_round"]
    assert rows[dom]["site"] == old[dom]["site"]
    # untouched domains keep their old rules entirely
    other = "d2.example.com"
    assert rows[other]["disallow_prefixes"] == old[other]["disallow_prefixes"]
    assert rows[other]["crawl_delay_ms"] == old[other]["crawl_delay_ms"]


def test_refresh_noop_commits_nothing(spark, t1_paths, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path)
    drv = _driver(spark, t1_paths, store)
    drv.seed(spark.read.parquet(t1_paths["seeds"]))
    v = store.latest_version()
    # same effective rules as the stored table -> zero flips -> no snapshot
    info = drv.refresh_robots(
        _bodies(spark, [("d2.example.com", "User-agent: *\nDisallow: /private")])
    )
    assert info == {"flipped_to_skipped": 0, "flipped_to_pending": 0}
    assert store.latest_version() == v


def test_max_age_refresh_blocks_domain_mid_crawl(spark, t1_paths, tmpdir_path):
    calls = []

    def source(s, round_no):
        calls.append(round_no)
        return _bodies(s, [("hot.example.com", "User-agent: *\nDisallow: /")])

    store = SnapshotParquetStore(tmpdir_path)
    drv = _driver(
        spark,
        t1_paths,
        store,
        cfg=CrawlConfig(chunk_size=CHUNK, robots_max_age_rounds=2),
        robots_bodies_source=source,
    )
    drv.seed(spark.read.parquet(t1_paths["seeds"]))
    drv.run()
    assert calls and calls[0] == 2, "first refresh fires when the cache ages out"
    order = store.read_crawl_order(spark).collect()
    assert any(r["domain"] == "hot.example.com" and r["round"] == 1 for r in order)
    assert not any(r["domain"] == "hot.example.com" and r["round"] >= 2 for r in order)
    # crawl still drains and commits counters for the non-blocked domains
    counters = store.read_manifest()["meta"]["counters"]
    assert counters["urls_fetched"] > 0
