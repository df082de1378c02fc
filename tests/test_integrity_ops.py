"""Payload-integrity + caption-frequency operators.

- headers.header_integrity_flags: fixed-offset JVM binary parse of
  PNG / lossy-surrogate containers, validated against hand-built and
  world payloads (incl. truncation, garbage, NULL, fmt swaps).
- media.phash_audit: decode + recompute phash, distance vs the stored
  column (0 for png, bounded for the lossy surrogate, NULL on junk).
- dataset.caption_frequency_filter: spam captions dropped exactly,
  NULL/blank captions immune, hash-prefilter == naive full count.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.imaging import (
    caption_frequency_filter,
    encode_image,
    header_integrity_flags,
    phash64,
    phash_audit,
)

IMG_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def _px(seed, h=9, w=11):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


@pytest.fixture(scope="module")
def payloads():
    png = encode_image(_px(1), "png")
    lsy = encode_image(_px(2), "jpeg")  # sandbox surrogate: LSY1 + png
    return png, lsy


def test_header_flags_matrix(spark, payloads):
    png, lsy = payloads
    rows = [
        ("good_png", bytearray(png), 11, 9, "png"),
        ("good_jpeg", bytearray(lsy), 11, 9, "jpeg"),
        ("fmt_swap", bytearray(png), 11, 9, "jpeg"),
        ("dims_lie", bytearray(png), 12, 9, "png"),
        ("truncated", bytearray(png[:10]), 11, 9, "png"),
        ("garbage", bytearray(b"XX" + png), 11, 9, "png"),
        ("null_bytes", None, 11, 9, "png"),
        ("real_jpeg", bytearray(b"\xff\xd8\xff\xe0rest"), 11, 9, "jpeg"),
    ]
    out = {
        r["image_id"]: r.asDict()
        for r in header_integrity_flags(spark.createDataFrame(rows, IMG_SCHEMA)).collect()
    }
    g = out["good_png"]
    assert (g["container"], g["hdr_w"], g["hdr_h"], g["ok"]) == ("png", 11, 9, True)
    j = out["good_jpeg"]
    assert (j["container"], j["hdr_w"], j["hdr_h"], j["ok"]) == ("lossy-png", 11, 9, True)
    assert out["fmt_swap"]["container_ok"] is False and out["fmt_swap"]["ok"] is False
    d = out["dims_lie"]
    assert d["dims_ok"] is False and d["ok"] is False and d["hdr_w"] == 11
    t = out["truncated"]  # sig intact, IHDR gone: container known, dims unparseable
    assert (t["container"], t["hdr_w"], t["dims_ok"], t["ok"]) == ("png", None, False, False)
    assert out["garbage"]["container"] == "unknown" and out["garbage"]["ok"] is False
    n = out["null_bytes"]
    assert n["container"] is None and n["container_ok"] is False and n["ok"] is False
    r = out["real_jpeg"]  # dims unknowable at fixed offset: NULL, not a mismatch
    assert (r["container"], r["hdr_w"], r["dims_ok"], r["ok"]) == ("jpeg", None, None, True)


def test_header_parse_is_jvm_only(spark, payloads):
    png, _ = payloads
    df = header_integrity_flags(
        spark.createDataFrame([("a", bytearray(png), 11, 9, "png")], IMG_SCHEMA)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in plan
    assert "Exchange" not in plan  # narrow map, no shuffle


def test_phash_audit_distances(spark, payloads):
    png, lsy = payloads
    rows = [
        ("p", bytearray(png), 11, 9, "png"),
        ("j", bytearray(lsy), 11, 9, "jpeg"),
        ("junk", bytearray(b"notanimage"), 11, 9, "png"),
        ("nul", None, 11, 9, "png"),
    ]
    df = spark.createDataFrame(rows, IMG_SCHEMA).withColumn(
        "phash",
        F.when(F.col("image_id") == "p", F.lit(phash64(_px(1))))
        .when(F.col("image_id") == "j", F.lit(phash64(_px(2))))
        .otherwise(F.lit(0)),
    )
    out = {r["image_id"]: r.asDict() for r in phash_audit(df).collect()}
    assert out["p"]["dist"] == 0  # lossless: bit-exact recompute
    assert out["j"]["dist"] <= 16  # quantization noise on an average hash
    assert out["junk"]["phash_pixels"] is None and out["junk"]["dist"] is None
    assert out["nul"]["phash_pixels"] is None
    assert len(out) == 4  # audit reports every row, drops none


def test_phash_audit_stale_hash_detected(spark, payloads):
    png, _ = payloads
    df = spark.createDataFrame(
        [("a", bytearray(png), 11, 9, "png")], IMG_SCHEMA
    ).withColumn("phash", F.lit(phash64(_px(1)) ^ 0b111))  # 3 flipped bits
    assert phash_audit(df).collect()[0]["dist"] == 3


CAP_SCHEMA = "image_id string, caption string"


def test_caption_frequency_exact(spark):
    rows = (
        [(f"s{i}", "Stock  Photo") for i in range(4)]  # 4 > 2: spam
        + [(f"u{i}", f"unique caption {i}") for i in range(3)]
        + [("n0", None), ("n1", ""), ("n2", "   ")]  # no caption: immune
        + [("c0", "stock photo"), ("c1", " STOCK PHOTO ")]  # same after norm: spam too
    )
    out = caption_frequency_filter(
        spark.createDataFrame(rows, CAP_SCHEMA), max_count=2
    )
    kept = sorted(r["image_id"] for r in out.collect())
    assert kept == ["n0", "n1", "n2", "u0", "u1", "u2"]


def test_caption_frequency_at_threshold_survives(spark):
    rows = [(f"a{i}", "twice seen") for i in range(2)] + [("b", "solo")]
    out = caption_frequency_filter(spark.createDataFrame(rows, CAP_SCHEMA), max_count=2)
    assert out.count() == 3  # count == max_count is allowed, only > drops


def test_caption_frequency_matches_naive(spark):
    rng = np.random.default_rng(7)
    caps = [f"cap {int(x)}" for x in rng.integers(0, 12, size=200)]
    rows = [(f"d{i}", c) for i, c in enumerate(caps)]
    df = spark.createDataFrame(rows, CAP_SCHEMA)
    fast = {r["image_id"] for r in caption_frequency_filter(df, max_count=15).collect()}
    from collections import Counter

    counts = Counter(caps)
    naive = {f"d{i}" for i, c in enumerate(caps) if counts[c] <= 15}
    assert fast == naive


def test_caption_frequency_broadcast_plan(spark):
    df = spark.createDataFrame([("a", "x"), ("b", "y")], CAP_SCHEMA)
    plan = caption_frequency_filter(df)._jdf.queryExecution().executedPlan().toString()
    # the anti-join against hot captions must be broadcast, never a
    # sort-merge shuffle of the full-width table
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quality_metrics_closed_forms(spark):
    from scrapy_products_tracker_spark.imaging import encode_image, image_quality_stats

    flat = np.full((8, 8, 3), 100, dtype=np.uint8)  # flat gray: contrast/sharp/entropy 0
    grad = np.tile(np.arange(8, dtype=np.uint8) * 10, (8, 1))[:, :, None].repeat(3, axis=2)
    rows = [
        ("flat", bytearray(encode_image(flat, "png")), "png"),
        ("grad", bytearray(encode_image(grad, "png")), "png"),
        ("junk", bytearray(b"nope"), "png"),
        ("nul", None, "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {r["image_id"]: r.asDict() for r in image_quality_stats(df).collect()}
    f = out["flat"]
    assert (f["brightness_milli"], f["contrast_milli"], f["sharpness_milli"],
            f["entropy_milli"]) == (100000, 0, 0, 0)
    g = out["grad"]
    assert g["brightness_milli"] == 35000  # mean of 0..70 step 10
    assert g["sharpness_milli"] == 10000  # constant 10 gradient
    assert g["entropy_milli"] == 3000  # 8 equiprobable values = 3 bits
    assert out["junk"]["brightness_milli"] is None
    assert out["nul"]["entropy_milli"] is None
    assert len(out) == 4  # audit semantics: every row reported


def test_image_channel_stats_reports_never_drops(spark):
    """Channel means are int64-exact over decodable payloads;
    undecodable rows count in n but contribute no sums."""
    import numpy as np

    from scrapy_products_tracker_spark.imaging.codec import encode_image
    from scrapy_products_tracker_spark.imaging.quality import image_channel_stats

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:, :, 0] = 10
    px[:, :, 1] = 20
    px[:, :, 2] = 30
    rows = [
        ("a", encode_image(px, "png"), "png"),
        ("b", encode_image(px, "png"), "png"),
        ("c", b"garbage-not-an-image", "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r["fmt"]: r.asDict() for r in image_channel_stats(df).collect()}
    g = got["png"]
    assert g["n"] == 3 and g["n_ok"] == 2
    assert g["total_px"] == 32  # junk contributes nothing
    assert (g["ch0_mean_milli"], g["ch1_mean_milli"], g["ch2_mean_milli"]) == (
        10000, 20000, 30000,
    )


# --- color/saturation metrics (imaging/quality.image_color_stats) ---------


def test_color_metrics_closed_forms():
    import math

    import numpy as np

    from scrapy_products_tracker_spark.imaging.quality import color_metrics

    gray = np.full((8, 8, 3), 128, dtype=np.uint8)
    assert color_metrics(gray) == (0, 1000, 0)

    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    # rg = 255 (const), yb = 127.5 (const): stds 0, colorfulness =
    # 0.3 * sqrt(255^2 + 127.5^2); spread = 255 everywhere
    want_c = round(0.3 * math.sqrt(255.0**2 + 127.5**2) * 1000)
    assert color_metrics(red) == (want_c, 0, 255_000)

    half = np.full((8, 8, 3), 7, dtype=np.uint8)
    half[:, 4:, 0] = 9  # half the pixels neutral, half spread 2
    c, gf, sm = color_metrics(half)
    assert gf == 500 and sm == 1000

    assert color_metrics(np.full((8, 8), 5, dtype=np.uint8)) == (0, 1000, 0)


def test_image_color_stats_audit_semantics(spark):
    import numpy as np

    from scrapy_products_tracker_spark.imaging.codec import encode_image
    from scrapy_products_tracker_spark.imaging.quality import image_color_stats

    ok = bytearray(encode_image(np.full((8, 8, 3), 128, dtype=np.uint8), "png"))
    rows = [("ok", "png", ok), ("junk", "png", bytearray(b"nope")), ("null", "png", None)]
    df = spark.createDataFrame(rows, "image_id string, fmt string, bytes binary")
    got = {r.image_id: r for r in image_color_stats(df).collect()}
    assert len(got) == 3  # every row reported
    assert got["ok"].gray_frac_milli == 1000 and got["ok"].colorfulness_milli == 0
    for k in ("junk", "null"):
        assert got[k].colorfulness_milli is None and got[k].sat_mean_milli is None
