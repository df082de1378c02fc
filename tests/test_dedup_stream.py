"""Streaming URL dedup (dropDuplicatesWithinWatermark twin of D1):
within-watermark duplicates are dropped, first-arrival survives, and
the dedup key is the 8-byte url_hash of the canonical URL (query
variants collapse)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_products_tracker_spark.streaming import dedup_url_stream

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("discovered_at", T.TimestampType()),
        T.StructField("batch_tag", T.IntegerType()),
    ]
)


def _rows():
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + datetime.timedelta(seconds=sec)
    return [
        ("https://d0.example.com/p/1", s(0), 0),
        ("https://d0.example.com/p/1", s(1), 1),  # exact dup
        ("https://D0.example.com/p/1?utm_source=x", s(2), 2),  # canonical dup
        ("https://d0.example.com/p/2?b=2&a=1", s(3), 3),
        ("https://d0.example.com/p/2?a=1&b=2", s(4), 4),  # query-sorted dup
        ("https://d1.example.com/p/1", s(5), 5),
        ("not a url", s(6), 6),  # junk -> canonicalizes to NULL, filtered
    ]


@pytest.fixture()
def src_dir(spark, tmpdir_path):
    spark.createDataFrame(_rows(), SCHEMA).coalesce(1).write.parquet(tmpdir_path + "/in")
    return tmpdir_path


def _drain(spark, deduped, out_dir, ckpt):
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(
        T.StructType(SCHEMA.fields + [T.StructField("url_hash", T.LongType())])
    ).parquet(out_dir)


def test_stream_dedup_first_arrival_wins(spark, src_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir + "/in")
    out = _drain(
        spark,
        dedup_url_stream(stream, watermark="10 minutes"),
        src_dir + "/out",
        src_dir + "/ckpt",
    ).collect()
    urls = sorted(r["url"] for r in out)
    assert urls == [
        "https://d0.example.com/p/1",
        "https://d0.example.com/p/2?a=1&b=2",
        "https://d1.example.com/p/1",
    ]
    # url_hash equals the batch key (xxhash64 of the canonical url)
    expect = {
        r["url"]: r["h"]
        for r in spark.createDataFrame([(u,) for u in urls], ["url"])
        .select("url", F.xxhash64("url").alias("h"))
        .collect()
    }
    for r in out:
        assert r["url_hash"] == expect[r["url"]]


def test_stream_dedup_matches_batch_distinct(spark, src_dir):
    """AvailableNow drain over the same input == batch canonical
    first-per-hash distinct (row count + key set)."""
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir + "/in")
    got = {
        r["url_hash"]
        for r in _drain(
            spark,
            dedup_url_stream(stream, watermark="10 minutes"),
            src_dir + "/out2",
            src_dir + "/ckpt2",
        ).collect()
    }
    from scrapy_products_tracker_spark.functions.urls import canonicalize_udf

    batch = (
        spark.read.parquet(src_dir + "/in")
        .withColumn("url", canonicalize_udf(F.col("url")))
        .filter(F.col("url").isNotNull())
        .select(F.xxhash64("url").alias("url_hash"))
        .distinct()
    )
    assert got == {r["url_hash"] for r in batch.collect()}
