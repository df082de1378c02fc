"""mark_blocklisted (UT1-style URL blocklist) + dedup_doc_lines
(intra-doc boilerplate removal): rule semantics, hostile inputs, and
broadcast-only plan shape."""

from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions import dedup_doc_lines, mark_blocklisted

RULES = [
    ("domain", "bad.com"),
    ("host", "evil.ok.com"),
    ("prefix", "https://fine.com/ads/"),
]

URLS = [
    (1, "https://www.bad.com/x"),        # domain rule: subdomain blocked
    (2, "https://bad.com/x"),            # domain rule: apex blocked
    (3, "https://evil.ok.com/x"),        # host rule
    (4, "https://good.ok.com/x"),        # same rdom, different host: clean
    (5, "https://fine.com/ads/banner"),  # prefix rule
    (6, "https://fine.com/news/1"),      # same host, other path: clean
    (7, "https://other.org/"),           # matches nothing
    (8, "not a url at all"),             # no parseable host: clean
    (9, "https://BAD.com/upper"),        # case-insensitive host match
]


def _flags(spark):
    df = spark.createDataFrame(URLS, "id int, url string")
    rules = spark.createDataFrame(RULES, "kind string, value string")
    out = mark_blocklisted(df, "url", rules)
    return {r["id"]: r.asDict() for r in out.collect()}, out


def test_blocklist_rule_semantics(spark):
    got, _ = _flags(spark)
    assert [got[i]["blocked"] for i in range(1, 10)] == [
        True, True, True, False, True, False, False, False, True
    ]
    assert got[1]["blocked_domain"] and not got[1]["blocked_host"]
    assert got[3]["blocked_host"] and not got[3]["blocked_domain"]
    assert got[5]["blocked_prefix"] and not got[5]["blocked_host"]
    # original columns survive, flags never null
    assert all(v["blocked"] is not None for v in got.values())


def test_blocklist_plan_is_broadcast_only(spark):
    _, out = _flags(spark)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the scan side never shuffles


def test_dedup_doc_lines_semantics(spark):
    rows = [
        (1, "nav\nbody one\nnav\nbody two\nnav"),   # repeated boilerplate
        (2, "a\n\nb\n\nc"),                          # blank lines dedup too
        (3, ""),                                     # empty doc unchanged
        (4, "only"),                                 # single line unchanged
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r["id"]: r["out"]
        for r in df.select("id", dedup_doc_lines(F.col("text")).alias("out")).collect()
    }
    assert got[1] == "nav\nbody one\nbody two"
    assert got[2] == "a\n\nb\nc"
    assert got[3] == "" and got[4] == "only"
    # idempotent: a second pass changes nothing
    df2 = spark.createDataFrame([(k, v) for k, v in got.items()], "id int, text string")
    again = {
        r["id"]: r["out"]
        for r in df2.select("id", dedup_doc_lines(F.col("text")).alias("out")).collect()
    }
    assert again == got
