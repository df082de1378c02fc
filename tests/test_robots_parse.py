"""robots.txt parsing (RFC 9309 subset) -> the scheduler's cache table.

Pure-function truth table for group selection / directives / the
'*'/'$' special characters (§2.2.3) / tied-group merging (§2.2.1),
plus the Arrow-batched (domain, body) -> ROBOTS_SCHEMA kernel, plus
end-to-end: a parsed table drives mark_robots identically to a
hand-built one, including wildcard rules.
"""

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.politeness import (
    mark_robots,
    parse_robots_body,
    robots_from_bodies,
)
from scrapy_products_tracker_spark.politeness.robots import rule_to_regex

BODY = """
# comment line
User-agent: *
Disallow: /private
Disallow: /tmp
Crawl-delay: 1.5

User-agent: sparkbot
Disallow: /only-for-us
Crawl-delay: 0.25

User-agent: otherbot
Disallow: /
"""


def test_specific_agent_group_wins():
    dis, rx, delay = parse_robots_body(BODY, agent="sparkbot")
    assert dis == ["/only-for-us"]
    assert rx == []
    assert delay == 250


def test_wildcard_fallback_group():
    dis, rx, delay = parse_robots_body(BODY, agent="someone-else")
    assert dis == ["/private", "/tmp"]
    assert delay == 1500


def test_longest_agent_prefix_precedence():
    body = "User-agent: spark\nDisallow: /a\n\nUser-agent: sparkbot\nDisallow: /b\n"
    assert parse_robots_body(body, agent="sparkbot")[0] == ["/b"]
    assert parse_robots_body(body, agent="sparkly")[0] == ["/a"]


def test_shared_group_and_empty_disallow():
    body = "User-agent: a\nUser-agent: b\nDisallow:\nDisallow: /x\n"
    assert parse_robots_body(body, agent="a") == (["/x"], [], 0)
    assert parse_robots_body(body, agent="b") == (["/x"], [], 0)


def test_untrusted_garbage_never_raises():
    for body in (None, "", "randomtext", "Disallow: /pre-group", "Crawl-delay: NaNx\n",
                 "User-agent: *\nCrawl-delay: soon\nDisallow: /ok"):
        dis, rx, delay = parse_robots_body(body)
        assert isinstance(dis, list) and isinstance(rx, list) and isinstance(delay, int)
    assert parse_robots_body("User-agent: *\nCrawl-delay: soon\nDisallow: /ok") == (["/ok"], [], 0)
    assert parse_robots_body(None) == ([], [], 0)


def test_tied_groups_merge_rules_and_max_delay():
    """RFC 9309 §2.2.1: a robots file that repeats a group for the same
    agent contributes ALL its rules, not first-wins; the largest
    crawl-delay applies."""
    body = (
        "User-agent: *\nDisallow: /a\nCrawl-delay: 1\n\n"
        "User-agent: *\nDisallow: /b\nCrawl-delay: 3\n"
    )
    dis, rx, delay = parse_robots_body(body)
    assert dis == ["/a", "/b"]
    assert delay == 3000
    # a more specific group still shadows the merged '*' groups
    body2 = body + "\nUser-agent: sparkbot\nDisallow: /c\n"
    assert parse_robots_body(body2, agent="sparkbot")[0] == ["/c"]


def test_wildcard_and_dollar_rules_become_regexes():
    body = (
        "User-agent: *\n"
        "Disallow: /*.php\n"
        "Disallow: /private*$\n"
        "Disallow: /exact$\n"
        "Disallow: /plain\n"
        "Disallow: /lit$eral\n"  # $ not at end: literal char, stays a prefix
    )
    dis, rx, delay = parse_robots_body(body)
    assert dis == ["/plain", "/lit$eral"]
    assert rx == [
        rule_to_regex("/*.php"),
        rule_to_regex("/private*$"),
        rule_to_regex("/exact$"),
    ]
    import re as _re

    assert _re.search(rx[0], "/cgi/index.php")
    assert not _re.search(rx[0], "/cgi/index.html")
    assert _re.search(rx[1], "/private/anything")
    assert _re.search(rx[2], "/exact") and not _re.search(rx[2], "/exact/sub")


def test_robots_from_bodies_kernel_and_enforcement(spark):
    bodies = spark.createDataFrame(
        [
            ("d0.example.com", BODY),
            ("d1.example.com", None),  # fetch failure -> allow all
            ("d2.example.com", "User-agent: *\nDisallow: /*.php\n"),
        ],
        "domain string, body string",
    )
    table = robots_from_bodies(bodies, agent="sparkbot")
    rows = {r["domain"]: r for r in table.collect()}
    assert rows["d0.example.com"]["disallow_prefixes"] == ["/only-for-us"]
    assert rows["d0.example.com"]["crawl_delay_ms"] == 250
    assert rows["d1.example.com"]["disallow_prefixes"] == []
    assert rows["d2.example.com"]["disallow_regexes"] == [rule_to_regex("/*.php")]

    cands = spark.createDataFrame(
        [
            ("https://d0.example.com/only-for-us/p1", "d0.example.com"),
            ("https://d0.example.com/ok/p2", "d0.example.com"),
            ("https://d1.example.com/only-for-us/p3", "d1.example.com"),
            ("https://d2.example.com/x/page.php", "d2.example.com"),
            ("https://d2.example.com/x/page.html", "d2.example.com"),
        ],
        "url string, domain string",
    )
    marked = {r["url"]: r["_robots_blocked"] for r in mark_robots(cands, table).collect()}
    assert marked == {
        "https://d0.example.com/only-for-us/p1": True,
        "https://d0.example.com/ok/p2": False,
        "https://d1.example.com/only-for-us/p3": False,
        "https://d2.example.com/x/page.php": True,
        "https://d2.example.com/x/page.html": False,
    }


def test_mark_robots_accepts_tables_without_regex_column(spark):
    """Pre-wildcard robots tables (no disallow_regexes column) still
    enforce their literal prefixes."""
    cands = spark.createDataFrame(
        [("https://a.com/private/x", "a.com"), ("https://a.com/ok", "a.com")],
        ["url", "domain"],
    )
    robots = spark.createDataFrame(
        [("a.com", ["/private"], 0, 8)],
        ["domain", "disallow_prefixes", "crawl_delay_ms", "max_per_round"],
    )
    marked = {r["url"]: r["_robots_blocked"] for r in mark_robots(cands, robots).collect()}
    assert marked == {"https://a.com/private/x": True, "https://a.com/ok": False}


def test_hostile_crawl_delay_values():
    for val, want in (("inf", 0), ("nan", 0), ("-5", 0), ("1e300", 86_400_000), ("soon", 0)):
        body = f"User-agent: *\nCrawl-delay: {val}\nDisallow: /x\n"
        dis, rx, delay = parse_robots_body(body)
        assert dis == ["/x"]
        assert delay == want, val


def test_bom_prefixed_body_still_parses():
    body = "﻿User-agent: *\nDisallow: /private\n"
    assert parse_robots_body(body) == (["/private"], [], 0)


def test_sitemap_lines_global_and_filtered():
    from scrapy_products_tracker_spark.politeness import sitemap_lines

    body = (
        "Sitemap: https://a.com/sitemap.xml\n"
        "User-agent: otherbot\n"
        "Disallow: /\n"
        "Sitemap: https://a.com/sitemap-2.xml  # trailing comment\n"
        "sitemap: HTTP://a.com/upper.xml\n"
        "Sitemap: /relative/sitemap.xml\n"
        "Sitemap: ftp://a.com/nope.xml\n"
        "Sitemap: https://a.com/sitemap.xml\n"  # duplicate
    )
    # group-independent (the otherbot group doesn't hide them), doc
    # order, dup removed, relative/non-http dropped
    assert sitemap_lines(body) == [
        "https://a.com/sitemap.xml",
        "https://a.com/sitemap-2.xml",
        "HTTP://a.com/upper.xml",
    ]
    assert sitemap_lines(None) == []
    assert sitemap_lines("\x00garbage\nSitemap:") == []


def test_robots_from_bodies_carries_sitemaps(spark):
    from scrapy_products_tracker_spark.politeness import robots_from_bodies

    bodies = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /p\nSitemap: https://a.com/s.xml\n"),
            ("b.com", "User-agent: *\nDisallow:\n"),
        ],
        ["domain", "body"],
    )
    rows = {r["domain"]: r for r in robots_from_bodies(bodies).collect()}
    assert rows["a.com"]["sitemap_urls"] == ["https://a.com/s.xml"]
    assert rows["a.com"]["disallow_prefixes"] == ["/p"]
    assert rows["b.com"]["sitemap_urls"] == []


def test_load_robots_defaults_sitemap_urls(spark, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scrapy_products_tracker_spark.politeness import load_robots

    # stored table predating the sitemap_urls column
    pdf = pd.DataFrame(
        [("a.com", ["/private"], 0, 8)],
        columns=["domain", "disallow_prefixes", "crawl_delay_ms", "max_per_round"],
    )
    schema = pa.schema(
        [
            ("domain", pa.string()),
            ("disallow_prefixes", pa.list_(pa.string())),
            ("crawl_delay_ms", pa.int64()),
            ("max_per_round", pa.int32()),
        ]
    )
    p = str(tmp_path / "robots.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), p)
    row = load_robots(spark, p).collect()[0]
    assert row["sitemap_urls"] == [] and row["site"] == "default"


def test_allow_rules_longest_match_precedence():
    """RFC 9309 §2.2.2: the most specific (longest) matching rule wins;
    Allow wins spec ties. parse_robots_rules keeps both rule kinds with
    their octet lengths."""
    from scrapy_products_tracker_spark.politeness import parse_robots_rules

    body = (
        "User-agent: *\n"
        "Disallow: /shop\n"
        "Allow: /shop/public\n"
        "Allow: /\n"
    )
    rules, delay = parse_robots_rules(body)
    assert [(r["pat"], r["allow"], r["spec"]) for r in rules] == [
        ("/shop", False, 5),
        ("/shop/public", True, 12),
        ("/", True, 1),
    ]
    assert all(r["rx"] is None for r in rules)
    assert delay == 0
    # the conservative projection still drops Allow lines
    assert parse_robots_body(body) == (["/shop"], [], 0)


def test_allow_wildcards_and_empty_values():
    from scrapy_products_tracker_spark.politeness import parse_robots_rules

    body = (
        "User-agent: *\n"
        "Allow:\n"              # empty: no-op
        "Allow: /*.html$\n"     # wildcard allow -> regex
        "Disallow: /docs\n"
    )
    rules, _ = parse_robots_rules(body)
    assert len(rules) == 2
    assert rules[0]["allow"] and rules[0]["rx"] == rule_to_regex("/*.html$")
    assert rules[0]["spec"] == len("/*.html$")
    assert not rules[1]["allow"] and rules[1]["rx"] is None


def test_mark_robots_allow_overrides_disallow(spark):
    """End-to-end §2.2.2 enforcement: /shop blocked, /shop/public
    re-allowed by the more specific Allow; a wildcard Allow re-opens
    .html files under a blocked tree; equal-spec tie goes to Allow;
    unknown domains and rule-less rows keep the legacy behavior."""
    bodies = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /shop\nAllow: /shop/public\n",
            ),
            (
                "b.com",
                "User-agent: *\nDisallow: /docs\nAllow: /*.html$\n",
            ),
            ("c.com", "User-agent: *\nDisallow: /tie\nAllow: /tie\n"),
        ],
        "domain string, body string",
    )
    table = robots_from_bodies(bodies, agent="sparkbot")
    cands = spark.createDataFrame(
        [
            ("https://a.com/shop/item1", "a.com"),
            ("https://a.com/shop/public/item2", "a.com"),
            ("https://a.com/other", "a.com"),
            ("https://b.com/docs/guide.html", "b.com"),
            ("https://b.com/docs/guide.pdf", "b.com"),
            ("https://c.com/tie/x", "c.com"),
            ("https://unknown.com/shop/x", "unknown.com"),
        ],
        "url string, domain string",
    )
    marked = {r["url"]: r["_robots_blocked"] for r in mark_robots(cands, table).collect()}
    assert marked == {
        "https://a.com/shop/item1": True,
        "https://a.com/shop/public/item2": False,
        "https://a.com/other": False,
        "https://b.com/docs/guide.html": False,
        "https://b.com/docs/guide.pdf": True,
        "https://c.com/tie/x": False,  # tie -> least restrictive (allow)
        "https://unknown.com/shop/x": False,
    }


def test_mark_robots_mixed_rules_and_legacy_rows(spark):
    """A robots table mixing full-rule rows with legacy NULL-rules rows
    routes each row to the right evaluator."""
    rules_t = (
        "array<struct<pat:string,rx:string,spec:int,allow:boolean>>"
    )
    robots = spark.createDataFrame(
        [
            (
                "new.com",
                ["/shop"],
                [("/shop", None, 5, False), ("/shop/ok", None, 8, True)],
            ),
            ("old.com", ["/private"], None),
        ],
        f"domain string, disallow_prefixes array<string>, rules {rules_t}",
    )
    cands = spark.createDataFrame(
        [
            ("https://new.com/shop/ok/x", "new.com"),
            ("https://new.com/shop/no", "new.com"),
            ("https://old.com/private/x", "old.com"),
            ("https://old.com/ok", "old.com"),
        ],
        "url string, domain string",
    )
    marked = {r["url"]: r["_robots_blocked"] for r in mark_robots(cands, robots).collect()}
    assert marked == {
        "https://new.com/shop/ok/x": False,
        "https://new.com/shop/no": True,
        "https://old.com/private/x": True,
        "https://old.com/ok": False,
    }


def test_load_robots_roundtrips_rules_column(spark, tmp_path):
    """robots_from_bodies -> parquet -> load_robots keeps the rule list
    (and absent-column tables load with NULL rules)."""
    from scrapy_products_tracker_spark.politeness import load_robots

    bodies = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /shop\nAllow: /shop/public\n")],
        "domain string, body string",
    )
    p = str(tmp_path / "robots_rules.parquet")
    robots_from_bodies(bodies).write.parquet(p)
    row = load_robots(spark, p).collect()[0]
    assert [(r["pat"], r["allow"]) for r in row["rules"]] == [
        ("/shop", False),
        ("/shop/public", True),
    ]
