"""Banded phash Hamming near-dup: exactness vs brute force + plan shape."""

import random

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions.similarity import hamming64
from scrapy_products_tracker_spark.imaging import phash_neardup_pairs


def _table(n=40, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        ph = rng.getrandbits(64)
        rows.append((f"img{i:03d}", ph - (1 << 64) if ph >= (1 << 63) else ph))
    # planted near-dups at distances 0..7 (inside threshold) and 8/9 (outside)
    for d in range(10):
        base = rows[d][1] & ((1 << 64) - 1)
        bits = rng.sample(range(64), d)
        for b in bits:
            base ^= 1 << b
        rows.append(
            (f"img{d:03d}~v", base - (1 << 64) if base >= (1 << 63) else base)
        )
    return rows


def _brute(spark, df, threshold):
    a = df.select(F.col("image_id").alias("id_a"), F.col("phash").alias("ph_a"))
    b = df.select(F.col("image_id").alias("id_b"), F.col("phash").alias("ph_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", hamming64(F.col("ph_a"), F.col("ph_b")))
        .filter(F.col("dist") <= threshold)
        .select("id_a", "id_b", "dist")
    )


def test_banded_matches_bruteforce(spark):
    df = spark.createDataFrame(_table(), "image_id string, phash long")
    got = sorted(map(tuple, phash_neardup_pairs(df, threshold=7).collect()))
    want = sorted(map(tuple, _brute(spark, df, 7).collect()))
    assert got == want
    # the planted variants at distance <= 7 are all found, each exactly once
    found = {(a, b) for a, b, _ in got}
    for d in range(8):
        assert (f"img{d:03d}", f"img{d:03d}~v") in found
    for d in (8, 9):
        assert (f"img{d:03d}", f"img{d:03d}~v") not in found


def test_threshold_guard():
    # threshold above the pigeonhole bound must be rejected
    with pytest.raises(ValueError):
        phash_neardup_pairs(None, threshold=8, n_bands=8)


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(_table(), "image_id string, phash long")
    plan = phash_neardup_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
