import pyspark.sql.functions as F
from pyspark.sql import Window

from scrapy_products_tracker_spark.politeness import apply_robots, schedule_round
from scrapy_products_tracker_spark.politeness.scheduler import CLAIM_ORDER


def _candidates(spark, n_hot=900, n_cold=100):
    """Skewed frontier: one hot domain holds 90% of pending URLs."""
    rows = []
    for i in range(n_hot):
        rows.append((f"https://hot.com/p/{i}", i * 7 - 3_000, "hot.com", 1, 0, 1, 1000 + i, 0))
    for i in range(n_cold):
        rows.append((f"https://cold{i % 5}.com/p/{i}", i * 13, f"cold{i % 5}.com", 1, 0, 1, i, 0))
    return spark.createDataFrame(
        rows, ["url", "url_hash", "domain", "tier", "priority", "depth", "discovered_seq", "attempt"]
    )


def _robots(spark):
    rows = [("hot.com", [], 0, 8), ("cold0.com", [], 0, 4), ("cold1.com", [], 500, 16)]
    return spark.createDataFrame(
        rows,
        "domain string, disallow_prefixes array<string>, crawl_delay_ms long, max_per_round int",
    )


def test_budget_never_exceeded(spark):
    cands, robots = _candidates(spark), _robots(spark)
    for force in (False, True):  # fast path and salted path both enforce
        claimed = schedule_round(
            cands, robots, chunk_size=10_000, n_salts=4, force_salted=force
        )
        got = {r["domain"]: r["count"] for r in claimed.groupBy("domain").count().collect()}
        assert got["hot.com"] <= 8
        assert got["cold0.com"] <= 4
        assert got.get("cold1.com", 0) <= 2  # crawl_delay 500ms in a 1000ms round -> 2
        for d in ("cold2.com", "cold3.com", "cold4.com"):
            assert got.get(d, 0) <= 8  # unmapped default


def test_salted_equals_unsalted_window(spark):
    """Phase-1 salting must not change the selected set (exactness).
    force_salted pins the salted plan (1000 rows would otherwise skip
    phase 1 under the absolute salt_threshold)."""
    cands, robots = _candidates(spark), _robots(spark)
    for n_salts in (1, 4, 16):
        claimed = schedule_round(
            cands, robots, chunk_size=25, n_salts=n_salts, force_salted=True
        )
        got = sorted(
            (r["priority"], r["depth"], r["discovered_seq"], r["url"]) for r in claimed.collect()
        )
        if n_salts == 1:
            baseline = got
        else:
            assert got == baseline


def test_claim_is_global_topk_by_order(spark):
    cands, robots = _candidates(spark), _robots(spark)
    claimed = schedule_round(cands, robots, chunk_size=5, n_salts=4).collect()
    assert len(claimed) == 5
    ranks = sorted(r["within_round_rank"] for r in claimed)
    assert ranks == [1, 2, 3, 4, 5]
    # within the claims, rank follows the O1 key
    by_rank = sorted(claimed, key=lambda r: r["within_round_rank"])
    keys = [(r["priority"], r["depth"], r["discovered_seq"]) for r in by_rank]
    assert keys == sorted(keys)


def test_apply_robots_prefix_split(spark):
    cands = spark.createDataFrame(
        [
            ("https://a.com/private/x", "a.com"),
            ("https://a.com/public/x", "a.com"),
            ("https://b.com/private/x", "b.com"),  # b.com has no robots row
        ],
        ["url", "domain"],
    )
    robots = spark.createDataFrame(
        [("a.com", ["/private"], 0, 8)],
        ["domain", "disallow_prefixes", "crawl_delay_ms", "max_per_round"],
    )
    allowed, skipped = apply_robots(cands, robots)
    assert {r["url"] for r in skipped.collect()} == {"https://a.com/private/x"}
    assert allowed.count() == 2
