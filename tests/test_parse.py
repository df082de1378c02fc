import pyspark.sql.functions as F

from scrapy_products_tracker_spark.crawl.parse import discover_children, encode_seq, position_of


def test_encode_seq_roundtrip(spark):
    df = spark.range(1).select(
        encode_seq(F.lit(3), F.lit(7), F.lit(11)).alias("seq")
    )
    seq = df.collect()[0]["seq"]
    assert seq == (3 << 40) | (7 << 20) | 11
    assert spark.range(1).select(position_of(F.lit(seq))).collect()[0][0] == 11


def _t0(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, depth int, priority int, within_round_rank int, "
        "outlinks array<string>, next_url string, total_items int",
    )


def test_outlink_and_next_positions(spark):
    df = _t0(spark, [("https://a.com/c", 0, 0, 2, ["https://a.com/p/1", "https://a.com/p/2"], "https://a.com/c?page=2", None)])
    out = discover_children(df, round_no=4).collect()
    got = {(r["url"], r["tier"], r["depth"], r["discovered_seq"]) for r in out}
    base = (4 << 40) | (2 << 20)
    assert got == {
        ("https://a.com/p/1", 1, 1, base + 0),
        ("https://a.com/p/2", 1, 1, base + 1),
        ("https://a.com/c?page=2", 0, 1, base + 2),
    }


def test_computed_fanout_f1(spark):
    # zoro-style: total_items=30, pagination 12 -> pages 2..3 generated at once
    df = _t0(spark, [("https://z.com/c", 1, 0, 1, ["https://z.com/p/9"], None, 30)])
    out = discover_children(df, round_no=1, pagination_size=12).collect()
    urls = {r["url"] for r in out}
    assert urls == {"https://z.com/p/9", "https://z.com/c?page=2", "https://z.com/c?page=3"}
    pos = {r["url"]: r["discovered_seq"] & ((1 << 20) - 1) for r in out}
    assert pos["https://z.com/c?page=2"] == 1 and pos["https://z.com/c?page=3"] == 2


def test_no_fanout_when_single_page(spark):
    df = _t0(spark, [("https://z.com/c", 0, 0, 1, [], None, 10)])
    assert discover_children(df, 1, 12).count() == 0
