"""F3 detail-request chaining: the costco 3-request item assembly
(page + inventory JSON + price JSON -> one item). The chained domain's
pages carry NO price/stock in the HTML; the engine must recover the
ground truth from the endpoint responses."""

from __future__ import annotations

import dataclasses
import tempfile

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
from scrapy_products_tracker_spark.crawl.extract import extract_product_fields
from scrapy_products_tracker_spark.fetchers.chain import resolve_detail_chain
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
from scrapy_products_tracker_spark.politeness import load_robots
from scrapy_products_tracker_spark.synth import T1_SMOKE, generate_world, write_world

CHAIN_SPEC = dataclasses.replace(T1_SMOKE, chain_endpoints=True)


@pytest.fixture(scope="module")
def chain_world_paths():
    import shutil

    tmp = tempfile.mkdtemp(prefix="chainworld_")
    paths = write_world(generate_world(CHAIN_SPEC), tmp)
    yield paths
    shutil.rmtree(tmp, ignore_errors=True)


def _with_site(spark, chain_world_paths, pages):
    """Dispatch like the driver: site key broadcast-joined from the
    domain config table (the chained domain's shape is whatever
    site_for_domain assigns — the chained-page contract must hold in
    every shape)."""
    robots = load_robots(spark, chain_world_paths["robots"])
    return pages.join(
        F.broadcast(robots.select("domain", F.col("site").alias("_site"))), "domain", "left"
    )


def test_chained_pages_have_no_inline_price(spark, chain_world_paths):
    pages = (
        spark.read.parquet(chain_world_paths["pages"])
        .filter((F.col("tier") == 1) & (F.col("domain") == "d0.example.com"))
        .select("url", "domain", "body")
    )
    parsed = extract_product_fields(
        _with_site(spark, chain_world_paths, pages), site_col="_site"
    )
    ok = parsed.filter(F.col("parse_ok"))
    assert ok.count() > 0
    # the page alone yields no price/currency (costco idiom)
    assert ok.filter(F.col("current_price_cents").isNotNull()).count() == 0
    assert ok.filter(F.col("currency").isNotNull()).count() == 0


def test_chain_resolution_restores_truth(spark, chain_world_paths):
    pages = (
        spark.read.parquet(chain_world_paths["pages"])
        .filter((F.col("tier") == 1) & (F.col("status_code") != 404))
        .select("url", "domain", "body")
    )
    endpoints = spark.read.parquet(chain_world_paths["endpoints"])
    parsed = extract_product_fields(
        _with_site(spark, chain_world_paths, pages), site_col="_site"
    ).drop("_site", "domain")
    assembled = resolve_detail_chain(parsed, endpoints)
    truth = spark.read.parquet(chain_world_paths["truth"]).filter(F.col("parse_ok"))
    j = assembled.filter(F.col("parse_ok")).join(
        truth.select(
            "url",
            F.col("current_price_cents").alias("t_cur"),
            F.col("regular_price_cents").alias("t_reg"),
            F.col("is_in_stock").alias("t_st"),
            F.col("currency").alias("t_ccy"),
        ),
        "url",
        "inner",
    )
    bad = j.filter(
        ~F.col("current_price_cents").eqNullSafe(F.col("t_cur"))
        | ~F.col("regular_price_cents").eqNullSafe(F.col("t_reg"))
        | ~F.col("is_in_stock").eqNullSafe(F.col("t_st"))
        | ~F.col("currency").eqNullSafe(F.col("t_ccy"))
    )
    assert bad.count() == 0


def test_full_crawl_with_chained_endpoints(spark, chain_world_paths, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path + "/store")
    drv = CrawlDriver(
        spark,
        store,
        spark.read.parquet(chain_world_paths["pages"]),
        spark.read.parquet(chain_world_paths["image_caption"]),
        load_robots(spark, chain_world_paths["robots"]),
        CrawlConfig(chunk_size=50),
        endpoints=spark.read.parquet(chain_world_paths["endpoints"]),
    )
    drv.seed(spark.read.parquet(chain_world_paths["seeds"]))
    drv.run()
    hist = store.read_history(spark)
    truth = spark.read.parquet(chain_world_paths["truth"])
    j = hist.join(
        truth.select("url", F.col("current_price_cents").alias("t_cur")), "url", "inner"
    )
    # chained-domain history rows carry the endpoint-sourced price
    chained = j.filter(F.col("url").startswith("https://d0.example.com/"))
    assert chained.count() > 0
    assert chained.filter(~F.col("current_price_cents").eqNullSafe(F.col("t_cur"))).count() == 0
