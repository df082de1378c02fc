"""Robots cache table helpers.

The reference never reads robots.txt (``ROBOTSTXT_OBEY`` is never set —
SURVEY.md §2.5 P5); the north rule requires a robots cache keyed by
domain with allow/disallow prefixes and crawl-delay. In production the
cache is itself crawled (one fetch per domain, refreshed on TTL) and
stored as a small table; in this sandbox it is part of the synthetic
world. This module only normalizes/validates it — the enforcement
lives in scheduler.apply_robots (broadcast join, JVM-side prefix test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import ROBOTS_SCHEMA


def load_robots(spark, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    missing = {f.name for f in ROBOTS_SCHEMA.fields} - set(df.columns)
    if missing:
        raise ValueError(f"robots table missing columns: {missing}")
    return df.select(
        "domain",
        F.coalesce("disallow_prefixes", F.array()).alias("disallow_prefixes"),
        F.coalesce("crawl_delay_ms", F.lit(0)).alias("crawl_delay_ms"),
        F.coalesce("max_per_round", F.lit(8)).alias("max_per_round"),
    )
