"""Proxy assignment (T1/T2): static injection, IN_ORDER round-robin,
RANDOMIZE stability, Basic-auth header from embedded credentials."""

import base64

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.fetchers.proxy import IN_ORDER, RANDOMIZE, with_proxy


def _batch(spark, n=10):
    return spark.range(n).select(
        F.concat(F.lit("https://d/p/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") + 1).cast("int").alias("within_round_rank"),
    )


def test_static_proxy_applies_to_all(spark):
    rows = with_proxy(_batch(spark), ["http://u:pw@p1:8080"]).collect()
    assert {r["proxy"] for r in rows} == {"http://u:pw@p1:8080"}
    expect = "Basic " + base64.b64encode(b"u:pw").decode()
    assert {r["proxy_authorization"] for r in rows} == {expect}


def test_no_proxy_noop(spark):
    rows = with_proxy(_batch(spark), None).collect()
    assert all(r["proxy"] is None and r["proxy_authorization"] is None for r in rows)


def test_in_order_round_robin(spark):
    proxies = ["http://p1", "http://p2", "http://p3"]
    rows = with_proxy(_batch(spark, 9), proxies, IN_ORDER).orderBy("within_round_rank").collect()
    assert [r["proxy"] for r in rows] == proxies * 3  # rank-driven rotation
    assert all(r["proxy_authorization"] is None for r in rows)  # no creds


def test_randomize_is_stable_per_url_and_spread(spark):
    proxies = [f"http://p{i}" for i in range(4)]
    a = {r["url"]: r["proxy"] for r in with_proxy(_batch(spark, 200), proxies, RANDOMIZE).collect()}
    b = {r["url"]: r["proxy"] for r in with_proxy(_batch(spark, 200), proxies, RANDOMIZE).collect()}
    assert a == b  # deterministic across runs (resume parity)
    counts = {}
    for p in a.values():
        counts[p] = counts.get(p, 0) + 1
    assert len(counts) == 4 and min(counts.values()) > 20  # roughly uniform


def test_unknown_mode_raises(spark):
    with pytest.raises(ValueError):
        with_proxy(_batch(spark), ["http://p1"], "shuffle")
