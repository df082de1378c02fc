from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl.sitemap import (
    parse_sitemap_entries,
    sitemap_seed_candidates,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.example.com/p/1</loc>
    <lastmod>2026-08-18T09:30:00+00:00</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc> https://a.example.com/p/2?utm_source=x </loc><lastmod>2026-08-17</lastmod></url>
  <url><loc><![CDATA[https://a.example.com/p/3]]></loc><priority>9.9</priority></url>
  <url><loc>ftp://a.example.com/skip-me</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>
"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://a.example.com/sitemap-1.xml</loc><lastmod>2026-08-10</lastmod></sitemap>
  <sitemap><loc>https://a.example.com/sitemap-2.xml</loc></sitemap>
</sitemapindex>
"""


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, body string")


def test_parse_urlset_fields(spark):
    out = parse_sitemap_entries(
        _df(spark, [("https://a.example.com/sitemap.xml", URLSET)])
    ).collect()
    by_loc = {r["loc"]: r for r in out}
    # entry without <loc> and non-http loc are dropped
    assert set(by_loc) == {
        "https://a.example.com/p/1",
        "https://a.example.com/p/2?utm_source=x",
        "https://a.example.com/p/3",
    }
    r1 = by_loc["https://a.example.com/p/1"]
    assert r1["kind"] == "url"
    assert r1["lastmod_ts"] == 1787045400  # 2026-08-18T09:30:00Z
    assert r1["priority_milli"] == 800
    r2 = by_loc["https://a.example.com/p/2?utm_source=x"]
    assert r2["lastmod_ts"] == 1786924800  # 2026-08-17 midnight UTC
    assert r2["priority_milli"] is None
    r3 = by_loc["https://a.example.com/p/3"]  # CDATA unwrapped, clamped priority
    assert r3["priority_milli"] == 1000 and r3["lastmod_ts"] is None


def test_parse_index_and_hostile_bodies(spark):
    out = parse_sitemap_entries(
        _df(
            spark,
            [
                ("https://a.example.com/sitemap.xml", INDEX),
                ("https://b.example.com/junk", "\x00not xml at all <url>"),
                ("https://c.example.com/null", None),
            ],
        )
    ).collect()
    assert all(r["kind"] == "sitemap" for r in out)
    assert sorted(r["loc"] for r in out) == [
        "https://a.example.com/sitemap-1.xml",
        "https://a.example.com/sitemap-2.xml",
    ]
    assert out[0]["source_url"] == "https://a.example.com/sitemap.xml"


def test_seed_candidates_canonicalize_dedup_antijoin(spark):
    # p/2 listed twice (tracking param stripped by canonicalization):
    # keeps max lastmod; p/1 already seen -> anti-joined away
    body2 = URLSET.replace("2026-08-17", "2026-08-18")
    entries = parse_sitemap_entries(
        _df(
            spark,
            [
                ("https://a.example.com/s1.xml", URLSET),
                ("https://a.example.com/s2.xml", body2),
            ],
        )
    )
    seen = spark.createDataFrame([("https://a.example.com/p/1",)], "url string")
    out = {
        r["url"]: r
        for r in sitemap_seed_candidates(entries, seen=seen).collect()
    }
    assert set(out) == {"https://a.example.com/p/2", "https://a.example.com/p/3"}
    assert out["https://a.example.com/p/2"]["lastmod_ts"] == 1787011200  # max of the two days
    assert out["https://a.example.com/p/2"]["priority_milli"] == 500  # protocol default
    assert out["https://a.example.com/p/2"]["domain"] == "a.example.com"
    assert out["https://a.example.com/p/3"]["priority_milli"] == 1000


def test_parse_plan_is_jvm_only(spark):
    # the parse stage must stay in codegen: no Python eval nodes
    plan = parse_sitemap_entries(
        _df(spark, [("https://a.example.com/s.xml", URLSET)])
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
