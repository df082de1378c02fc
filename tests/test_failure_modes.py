"""Failure-mode matrix (FIXTURES.md §6) — mirrors the reference's test
suite scenario-per-file style (tests/rmq_new_tests/): each scenario
asserts the final frontier status + attempt and the counters, the
ack/nack analog of the batch model."""

import numpy as np
import pandas as pd
import pytest

from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
from scrapy_products_tracker_spark.imaging import encode_image, phash64
from scrapy_products_tracker_spark.oracle import simulate_crawl
from scrapy_products_tracker_spark.schemas import ERROR, HARDWARE_ERROR, PENDING, SKIPPED_ROBOTS, SUCCESS
from scrapy_products_tracker_spark.synth.world import World, WorldSpec, write_world


def _img(image_id):
    px = np.full((8, 8, 3), 77, dtype=np.uint8)
    return {
        "image_id": image_id,
        "bytes": encode_image(px, "png"),
        "w": 8,
        "h": 8,
        "fmt": "png",
        "caption": f"cap {image_id}",
        "phash": phash64(px),
    }


def _page(url, domain, tier, status=200, flaky=0, outlinks=(), next_url=None, total=None, image_id=None):
    return {
        "url": url,
        "domain": domain,
        "tier": tier,
        "status_code": status,
        "flaky_until": flaky,
        "next_url": next_url,
        "total_items": total,
        "outlinks": list(outlinks),
        "image_id": image_id,
        "latency_ms": 10,
    }


@pytest.fixture(scope="module")
def failure_world():
    d = "f.example.com"
    pages = [
        _page(f"https://{d}/cat/0", d, 0, outlinks=[
            f"https://{d}/p/ok",
            f"https://{d}/p/forbidden",
            f"https://{d}/p/timeout",
            f"https://{d}/p/flaky",
            f"https://{d}/p/gone",
            f"https://{d}/private/p/blocked",
            f"https://{d}/p/ok",  # in-page duplicate
        ]),
        _page(f"https://{d}/cat/1", d, 0, outlinks=[f"https://{d}/p/ok"]),  # cross-page duplicate
        _page(f"https://{d}/p/ok", d, 1, image_id="img_ok"),
        _page(f"https://{d}/p/forbidden", d, 1, status=403),
        _page(f"https://{d}/p/timeout", d, 1, status=-1),
        _page(f"https://{d}/p/flaky", d, 1, status=403, flaky=2, image_id="img_flaky"),
        _page(f"https://{d}/p/gone", d, 1, status=404),
    ]
    seeds = pd.DataFrame(
        [
            {"url": f"https://{d}/cat/0", "tier": 0, "seed_rank": 0},
            {"url": f"https://{d}/cat/1", "tier": 0, "seed_rank": 1},
            {"url": f"https://{d}/p/missing", "tier": 1, "seed_rank": 2},  # not in corpus
        ]
    )
    robots = pd.DataFrame(
        [{"domain": d, "disallow_prefixes": ["/private"], "crawl_delay_ms": 0, "max_per_round": 16}]
    )
    return World(
        seeds=seeds,
        pages=pd.DataFrame(pages),
        image_caption=pd.DataFrame([_img("img_ok"), _img("img_flaky")]),
        robots=robots,
        spec=WorldSpec(),
    )


@pytest.fixture(scope="module")
def run(spark, failure_world, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fw")
    paths = write_world(failure_world, str(tmp))
    store = SnapshotParquetStore(str(tmp / "store"))
    from scrapy_products_tracker_spark.politeness import load_robots

    drv = CrawlDriver(
        spark,
        store,
        spark.read.parquet(paths["pages"]),
        spark.read.parquet(paths["image_caption"]),
        load_robots(spark, paths["robots"]),
        CrawlConfig(chunk_size=100),
    )
    drv.seed(spark.read.parquet(paths["seeds"]))
    meta = drv.run()
    frontier = {r["url"]: r for r in store.read_frontier(spark).collect()}
    return store, meta, frontier


def test_success(run):
    _, _, fr = run
    r = fr["https://f.example.com/p/ok"]
    assert (r["status"], r["attempt"]) == (SUCCESS, 0)


def test_403_retries_exhausted(run):
    _, _, fr = run
    r = fr["https://f.example.com/p/forbidden"]
    assert (r["status"], r["attempt"]) == (ERROR, 5)


def test_timeout_hardware_error(run):
    _, _, fr = run
    r = fr["https://f.example.com/p/timeout"]
    assert (r["status"], r["attempt"]) == (HARDWARE_ERROR, 5)


def test_missing_page_hardware_error(run):
    _, _, fr = run
    r = fr["https://f.example.com/p/missing"]
    assert (r["status"], r["attempt"]) == (HARDWARE_ERROR, 5)


def test_flaky_retry_then_success(run):
    _, _, fr = run
    r = fr["https://f.example.com/p/flaky"]
    assert (r["status"], r["attempt"]) == (SUCCESS, 2)


def test_404_immediate_error(run):
    _, _, fr = run
    r = fr["https://f.example.com/p/gone"]
    assert (r["status"], r["attempt"]) == (ERROR, 1)


def test_robots_blocked_never_fetched(spark, run):
    store, meta, fr = run
    r = fr["https://f.example.com/private/p/blocked"]
    assert r["status"] == SKIPPED_ROBOTS
    fetched = {row["url"] for row in store.read_crawl_order(spark).collect()}
    assert "https://f.example.com/private/p/blocked" not in fetched
    assert meta["counters"]["urls_skipped_robots"] == 1


def test_duplicate_outlink_deduped(run):
    _, meta, fr = run
    # /p/ok discovered 3x (twice in cat/0, once in cat/1) -> 2 dedups
    assert meta["counters"]["urls_deduped"] == 2
    assert sum(1 for u in fr if u.endswith("/p/ok")) == 1


def test_oracle_agrees_on_failure_world(spark, failure_world, run):
    store, meta, fr = run
    sim = simulate_crawl(failure_world, chunk_size=100)
    assert meta["counters"] == sim.counters
    got = {u: (r["status"], r["attempt"]) for u, r in fr.items()}
    want = {u: (r["status"], r["attempt"]) for u, r in sim.seen.items()}
    assert got == want


def test_max_redirections_nacked(spark, tmp_path_factory):
    """Reference scenario (tests/rmq_new_tests/
    test_max_redirections_reached_nacked.py): a 301 chain within the
    budget resolves to its landing page and succeeds under the CLAIM
    url; a self-loop exhausts REDIRECT_MAX_TIMES and lands ERROR (the
    NACK analog). Off by default — the parity fixtures never follow."""
    d = "f.example.com"
    pages = [
        _page(f"https://{d}/cat/0", d, 0, outlinks=[
            f"https://{d}/p/r1", f"https://{d}/p/loop", f"https://{d}/p/ok",
        ]),
        _page(f"https://{d}/p/ok", d, 1, image_id="img_ok"),
    ]
    # chain r1 -> r2 -> ok (2 hops, cap 3) and loop -> loop (exceeds)
    for src, dst in [
        (f"https://{d}/p/r1", f"https://{d}/p/r2"),
        (f"https://{d}/p/r2", f"https://{d}/p/ok"),
        (f"https://{d}/p/loop", f"https://{d}/p/loop"),
    ]:
        row = _page(src, d, 1, status=301)
        row["redirect_to"] = dst
        pages.append(row)
    seeds = pd.DataFrame([{"url": f"https://{d}/cat/0", "tier": 0, "seed_rank": 0}])
    robots = pd.DataFrame(
        [{"domain": d, "disallow_prefixes": [], "crawl_delay_ms": 0, "max_per_round": 16}]
    )
    world = World(
        seeds=seeds,
        pages=pd.DataFrame(pages),
        image_caption=pd.DataFrame([_img("img_ok")]),
        robots=robots,
        spec=WorldSpec(),
    )
    tmp = tmp_path_factory.mktemp("redir")
    paths = write_world(world, str(tmp))
    from scrapy_products_tracker_spark.politeness import load_robots

    store = SnapshotParquetStore(str(tmp / "store"))
    drv = CrawlDriver(
        spark,
        store,
        spark.read.parquet(paths["pages"]),
        spark.read.parquet(paths["image_caption"]),
        load_robots(spark, paths["robots"]),
        CrawlConfig(chunk_size=100, max_redirect_times=3),
    )
    drv.seed(spark.read.parquet(paths["seeds"]))
    drv.run()
    frontier = {r["url"]: r for r in store.read_frontier(spark).collect()}
    assert frontier[f"https://{d}/p/r1"]["status"] == SUCCESS     # chain within cap
    assert frontier[f"https://{d}/p/loop"]["status"] == ERROR     # NACK analog
    assert frontier[f"https://{d}/p/ok"]["status"] == SUCCESS     # direct fetch untouched
    # the resolved chain produced an item attributed to the CLAIM url
    results = store.read_results(spark)
    urls = {r["url"] for r in results.select("url").collect()}
    assert f"https://{d}/p/r1" in urls


def test_redirects_off_by_default_ignores_column(spark, tmp_path_factory):
    """With max_redirect_times unset a 301 row classifies FAIL_LOGIC
    directly (no following), even though redirect_to is populated."""
    d = "f.example.com"
    pages = [
        _page(f"https://{d}/cat/0", d, 0, outlinks=[f"https://{d}/p/r1"]),
        _page(f"https://{d}/p/ok", d, 1, image_id="img_ok"),
    ]
    row = _page(f"https://{d}/p/r1", d, 1, status=301)
    row["redirect_to"] = f"https://{d}/p/ok"
    pages.append(row)
    seeds = pd.DataFrame([{"url": f"https://{d}/cat/0", "tier": 0, "seed_rank": 0}])
    robots = pd.DataFrame(
        [{"domain": d, "disallow_prefixes": [], "crawl_delay_ms": 0, "max_per_round": 16}]
    )
    world = World(
        seeds=seeds, pages=pd.DataFrame(pages),
        image_caption=pd.DataFrame([_img("img_ok")]), robots=robots, spec=WorldSpec(),
    )
    tmp = tmp_path_factory.mktemp("redir_off")
    paths = write_world(world, str(tmp))
    from scrapy_products_tracker_spark.politeness import load_robots

    store = SnapshotParquetStore(str(tmp / "store"))
    drv = CrawlDriver(
        spark, store,
        spark.read.parquet(paths["pages"]),
        spark.read.parquet(paths["image_caption"]),
        load_robots(spark, paths["robots"]),
        CrawlConfig(chunk_size=100),
    )
    drv.seed(spark.read.parquet(paths["seeds"]))
    drv.run()
    frontier = {r["url"]: r for r in store.read_frontier(spark).collect()}
    assert frontier[f"https://{d}/p/r1"]["status"] == ERROR
