from pyspark.sql import Window
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl.traps import (
    cap_frontier_by_template,
    url_template,
    url_template_stats,
)


def test_url_template_shapes(spark):
    rows = [
        ("https://a.com/cal?y=2026&m=8&d=18", "a.com"),
        ("https://a.com/cal?m=8&d=18&y=2026", "a.com"),  # param order folds
        ("https://a.com/p/123", "a.com"),
        ("https://a.com/s/0123456789abcdef/view", "a.com"),  # hex run
        ("https://a.com/v2/p/7", "a.com"),  # digits inside segments
        ("https://a.com", "a.com"),  # empty path -> /
        ("https://a.com/about", "a.com"),
    ]
    df = spark.createDataFrame(rows, "url string, domain string")
    got = {r["url"]: r["t"] for r in df.select("url", url_template(F.col("url")).alias("t")).collect()}
    assert got["https://a.com/cal?y=2026&m=8&d=18"] == "/cal?d&m&y"
    assert got["https://a.com/cal?m=8&d=18&y=2026"] == "/cal?d&m&y"
    assert got["https://a.com/p/123"] == "/p/{d}"
    assert got["https://a.com/s/0123456789abcdef/view"] == "/s/{x}/view"
    assert got["https://a.com/v2/p/7"] == "/v{d}/p/{d}"
    assert got["https://a.com"] == "/"
    assert got["https://a.com/about"] == "/about"


def test_template_stats_share_and_cap(spark):
    rows = [(f"https://a.com/cal?y={y}&m={m}", "a.com") for y in range(3) for m in range(10)]
    rows += [("https://a.com/about", "a.com"), ("https://b.com/x", "b.com")]
    df = spark.createDataFrame(rows, "url string, domain string")
    out = {(r["domain"], r["template"]): r for r in url_template_stats(df, cap=20).collect()}
    cal = out[("a.com", "/cal?m&y")]
    assert cal["n_urls"] == 30 and cal["over_cap"] == 1
    assert cal["domain_share_milli"] == 1000 * 30 // 31
    assert out[("a.com", "/about")]["over_cap"] == 0
    assert out[("b.com", "/x")]["domain_share_milli"] == 1000


def test_cap_equals_global_rank(spark):
    # salted two-phase == single global row_number, on a skewed family
    rows = [(f"https://a.com/cal?d={i}", "a.com") for i in range(200)]
    rows += [(f"https://a.com/p/{i}", "a.com") for i in range(5)]
    rows += [(f"https://b.com/p/{i}", "b.com") for i in range(40)]
    df = spark.createDataFrame(rows, "url string, domain string")
    got = sorted(r["url"] for r in cap_frontier_by_template(df, cap=10, n_salts=4).collect())

    tpl = url_template(F.col("url"))
    w = Window.partitionBy("domain", tpl).orderBy("url")
    want = sorted(
        r["url"]
        for r in df.withColumn("rn", F.row_number().over(w)).filter("rn <= 10").collect()
    )
    assert got == want
    assert len(got) == 10 + 5 + 10  # trap rationed, benign families intact


def test_cap_guard(spark):
    import pytest

    df = spark.createDataFrame([("https://a.com/x", "a.com")], "url string, domain string")
    with pytest.raises(ValueError):
        cap_frontier_by_template(df, cap=0)
