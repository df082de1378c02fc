"""Image+caption dataset-curation operators (imaging/dataset.py):
LAION-style filtering, aspect bucketing, WebDataset shard packing.
Fixtures plant every rule/edge explicitly; plan tests pin the
shuffle-free / column-pruned / broadcast shapes the docstrings claim."""

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapy_products_tracker_spark.imaging import (
    aspect_bucket_assign,
    laion_filter,
    pack_shards,
)

def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("caption", T.StringType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_laion_filter_reasons_and_priority(spark):
    rows = [
        ("a", b"x", 32, 32, "one two three four"),        # keep (4 tokens, square)
        ("b", b"x", 32, 32, "one two three"),             # caption_short (3)
        ("c", b"x", 32, 32, None),                        # caption_short (NULL -> 0)
        ("d", b"x", 32, 32, "   "),                       # caption_short (blank -> 0)
        ("e", b"x", 8, 64, "one two three four"),         # small_image (min side 8)
        ("f", b"x", 16, 64, "one two three four"),        # extreme_aspect (4000 milli)
        ("g", b"x", 16, 48, "one two three four"),        # keep (3000 boundary NOT > 3000)
        ("h", b"x", 0, 32, "one two three four"),         # degenerate_dims
        ("i", b"x", None, 32, "one two three four"),      # degenerate_dims
        ("j", b"x", 8, 8, "hi"),                          # caption_short shadows small_image
    ]
    out = {
        r["id"]: r.asDict()
        for r in laion_filter(_df(spark, rows), 4, 16, 3000).collect()
    }
    assert out["a"]["keep"] and out["a"]["drop_reason"] is None
    assert out["a"]["n_cap_tokens"] == 4 and out["a"]["aspect_milli"] == 1000
    for k in "bcd":
        assert out[k]["drop_reason"] == "caption_short"
    assert out["c"]["n_cap_tokens"] == 0 and out["d"]["n_cap_tokens"] == 0
    assert out["e"]["drop_reason"] == "small_image" and out["e"]["min_side"] == 8
    assert out["f"]["drop_reason"] == "extreme_aspect" and out["f"]["aspect_milli"] == 4000
    assert out["g"]["keep"] and out["g"]["aspect_milli"] == 3000
    for k in "hi":
        assert out[k]["drop_reason"] == "degenerate_dims"
        assert out[k]["min_side"] is None and out[k]["aspect_milli"] is None
    assert out["j"]["drop_reason"] == "caption_short"  # fixed priority order
    assert not any(out[k]["keep"] for k in "bcdefhij")


def test_aspect_bucket_exact_and_ties(spark):
    rows = [
        ("sq", b"", 32, 32, "c"),      # exact 1:1 -> bucket 0
        ("tv", b"", 32, 24, "c"),      # exact 4:3 -> bucket 1
        ("wide", b"", 32, 18, "c"),    # exact 16:9 -> bucket 3
        ("tall", b"", 18, 32, "c"),    # exact 9:16 -> bucket 4
        ("pano", b"", 48, 24, "c"),    # exact 2:1 -> bucket 5
        # w=3,h=2: |3-2|=1 for 1:1 and |3-4|=1 for 2:1 -> tie, lowest idx wins
        ("tie", b"", 3, 2, "c"),
        ("degen", b"", 0, 5, "c"),     # NULL bucket
    ]
    out = {r["id"]: r.asDict() for r in aspect_bucket_assign(_df(spark, rows)).collect()}
    assert out["sq"]["bucket_idx"] == 0 and (out["sq"]["bucket_w"], out["sq"]["bucket_h"]) == (1, 1)
    assert out["tv"]["bucket_idx"] == 1
    assert out["wide"]["bucket_idx"] == 3 and out["wide"]["bucket_h"] == 9
    assert out["tall"]["bucket_idx"] == 4
    assert out["pano"]["bucket_idx"] == 5
    assert out["tie"]["bucket_idx"] == 0
    assert out["degen"]["bucket_idx"] is None and out["degen"]["bucket_w"] is None


def test_aspect_bucket_empty_buckets_raises(spark):
    with pytest.raises(ValueError):
        aspect_bucket_assign(_df(spark, []), buckets=())


def test_pack_shards_exact_assignment(spark):
    # ids a..e, 100 bytes payload each (95 binary + 5 caption), budget 250:
    # bytes-before = 0,100,200,300,400 -> shards 0,0,0,1,1
    rows = [(i, b"x" * 95, 1, 1, "abcde") for i in "abcde"]
    out = dict(
        pack_shards(_df(spark, rows), budget_bytes=250)
        .select("id", "shard_id")
        .collect()
    )
    assert out == {"a": 0, "b": 0, "c": 0, "d": 1, "e": 1}


def test_pack_shards_null_payload_and_validation(spark):
    rows = [("a", None, 1, 1, None), ("b", b"xy", 1, 1, "z")]
    got = {
        r["id"]: (r["payload_bytes"], r["shard_id"])
        for r in pack_shards(_df(spark, rows), budget_bytes=10).collect()
    }
    assert got["a"] == (0, 0) and got["b"] == (3, 0)
    with pytest.raises(ValueError):
        pack_shards(_df(spark, rows), budget_bytes=0)


def test_pack_shards_two_phase_equals_global(spark):
    """The distributed (range-keyed) prefix sum must equal the naive
    single-range one whenever range order prefixes id order."""
    rows = [
        (f"g{g}_{i:02d}", b"x" * (37 * (i + 3 * g) % 257 + 1), 1, 1, "cap")
        for g in range(4)
        for i in range(25)
    ]
    df = _df(spark, rows).withColumn("rng", F.substring("image_id", 1, 2))
    ranged = {
        r["id"]: r["shard_id"]
        for r in pack_shards(df, budget_bytes=1024, range_col="rng").collect()
    }
    single = {
        r["id"]: r["shard_id"] for r in pack_shards(df, budget_bytes=1024).collect()
    }
    assert ranged == single
    assert max(ranged.values()) >= 2  # actually spans several shards


def test_filter_and_bucket_plans_are_narrow(spark, t1_paths):
    """laion_filter / aspect_bucket_assign: no Exchange anywhere, and
    the parquet scan never reads the image bytes column."""
    img = spark.read.parquet(t1_paths["image_caption"])
    for op in (laion_filter, aspect_bucket_assign):
        plan = _formatted_plan(op(img))
        assert not re.findall(r"^\(\d+\) Exchange", plan, re.M), plan
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "bytes" not in read_schema, read_schema


def test_pack_shards_plan_broadcasts_offsets(spark, t1_paths):
    """The range-offset join must be broadcast (tiny side), never a
    shuffled sort-merge join."""
    img = spark.read.parquet(t1_paths["image_caption"]).withColumn(
        "rng", F.substring("image_id", 1, 5)
    )
    plan = _formatted_plan(pack_shards(img, budget_bytes=16384, range_col="rng"))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
