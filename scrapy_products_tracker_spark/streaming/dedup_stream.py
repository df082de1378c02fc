"""Streaming URL-seen dedup: the Structured Streaming twin of D1.

The batch engine dedups discoveries against the parquet-backed seen
set once per crawl round (dedup/seen_table.py). A pipeline that ingests
discovery events continuously instead wants
``dropDuplicatesWithinWatermark``: Spark keeps per-key state only for
the watermark horizon, so state is bounded by the duplicate-arrival
window rather than the full URL space — at web scale the long-horizon
exactness still comes from the downstream frontier MERGE (idempotent
by url_hash), exactly like the reference's at-least-once RabbitMQ
delivery backed by the MySQL ``UNIQUE(url)`` upsert
(reference: utils/read_csv.py:66-70, category_result_consumer.py:38-52).

Dedup keys on the 8-byte ``xxhash64(canonical url)`` — the same key the
batch anti-join uses — so stream state never stores URL strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_udf


def dedup_url_stream(
    discoveries: DataFrame,
    event_time_col: str = "discovered_at",
    watermark: str = "30 seconds",
    canonicalize: bool = True,
) -> DataFrame:
    """First occurrence per url_hash within the watermark horizon.

    ``discoveries`` is a streaming DataFrame with at least
    (url, <event_time_col>). Output carries the input columns plus
    ``url_hash``; duplicates arriving within the watermark are dropped,
    later re-arrivals (beyond the horizon) are forwarded and left to the
    idempotent frontier MERGE — the documented bounded-state contract.
    """
    out = discoveries
    if canonicalize:
        out = out.withColumn("url", canonicalize_udf(F.col("url")))
    out = out.filter(F.col("url").isNotNull()).withColumn("url_hash", F.xxhash64("url"))
    return out.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        ["url_hash"]
    )
