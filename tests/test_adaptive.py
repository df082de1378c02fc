import pytest

from scrapy_products_tracker_spark.politeness.adaptive import (
    adaptive_budget_step,
    round_outcome_counts,
)


def _budgets(spark, rows):
    return spark.createDataFrame(rows, "domain string, max_per_round int")


def test_aimd_branches(spark):
    outcomes = spark.createDataFrame(
        # a.com: 3/4 fail -> halve; b.com: clean -> +2;
        # c.com: exactly 1/5 = 20% -> strict > means CLEAN -> +2
        [("a.com", "timeout")] * 3
        + [("a.com", "ok")]
        + [("b.com", "ok")] * 5
        + [("c.com", "403")]
        + [("c.com", "ok")] * 4,
        "domain string, fetch_status string",
    )
    budgets = _budgets(spark, [("a.com", 16), ("b.com", 8), ("c.com", 8), ("idle.com", 7)])
    oc = round_outcome_counts(outcomes)
    out = {r["domain"]: r["max_per_round"] for r in adaptive_budget_step(budgets, oc).collect()}
    assert out == {"a.com": 8, "b.com": 10, "c.com": 10, "idle.com": 7}


def test_floor_and_cap(spark):
    outcomes = spark.createDataFrame(
        [("f.com", "timeout"), ("f.com", "timeout"), ("cap.com", "ok")],
        "domain string, fetch_status string",
    )
    budgets = _budgets(spark, [("f.com", 1), ("cap.com", 10)])
    out = {
        r["domain"]: r["max_per_round"]
        for r in adaptive_budget_step(
            budgets, round_outcome_counts(outcomes), max_budget=11
        ).collect()
    }
    assert out == {"f.com": 1, "cap.com": 11}


def test_extra_budget_columns_preserved(spark):
    outcomes = spark.createDataFrame([("a.com", "ok")], "domain string, fetch_status string")
    budgets = spark.createDataFrame(
        [("a.com", 8, ["/private"])],
        "domain string, max_per_round int, disallow_prefixes array<string>",
    )
    row = adaptive_budget_step(budgets, round_outcome_counts(outcomes)).collect()[0]
    assert row["disallow_prefixes"] == ["/private"] and row["max_per_round"] == 10


def test_guards(spark):
    b = _budgets(spark, [("a.com", 8)])
    oc = round_outcome_counts(
        spark.createDataFrame([("a.com", "ok")], "domain string, fetch_status string")
    )
    with pytest.raises(ValueError):
        adaptive_budget_step(b, oc, min_budget=0)
    with pytest.raises(ValueError):
        adaptive_budget_step(b, oc, min_budget=5, max_budget=4)


def test_driver_adaptive_wiring(spark, t1_world, t1_paths, tmpdir_path):
    """CrawlConfig(adaptive_budgets=True) applies exactly one AIMD step
    per round. Expected budgets are derived independently: the engine's
    recorded claim set (claim correctness is pinned by the static-budget
    parity suite) x a test-side outcome rule straight from the world's
    page table (missing page or non-200 at the claim's attempt = failure;
    flaky 403s clear once attempt >= flaky_until), then the AIMD
    arithmetic re-implemented here in pure Python. Two rounds so the
    trajectory covers both the distress-halving and clean-increase
    branches on the T1 world."""
    from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
    from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
    from scrapy_products_tracker_spark.politeness import load_robots

    store = SnapshotParquetStore(tmpdir_path)
    robots0 = load_robots(spark, t1_paths["robots"])
    drv = CrawlDriver(
        spark,
        store,
        spark.read.parquet(t1_paths["pages"]),
        spark.read.parquet(t1_paths["image_caption"]),
        robots0,
        CrawlConfig(chunk_size=50, adaptive_budgets=True),
    )
    drv.seed(spark.read.parquet(t1_paths["seeds"]))
    final = drv.run()
    assert final["counters"]["urls_fetched"] > 0

    pages = {r["url"]: r for _, r in t1_world.pages.iterrows()}
    order = sorted(
        store.read_crawl_order(spark).collect(),
        key=lambda r: (r["round"], r["within_round_rank"]),
    )
    budgets = {r["domain"]: r["max_per_round"] for r in robots0.collect()}
    halved = grew = False
    prior_claims: dict[str, int] = {}
    for rnd in sorted({r["round"] for r in order}):
        att: dict[str, int] = {}
        fail: dict[str, int] = {}
        for r in (x for x in order if x["round"] == rnd):
            attempt = prior_claims.get(r["url"], 0)
            prior_claims[r["url"]] = attempt + 1
            p = pages.get(r["url"])
            if p is None:
                ok = False
            else:
                sc, fu = int(p["status_code"]), int(p["flaky_until"])
                ok = sc == 200 or (sc == 403 and 0 < fu <= attempt)
            att[r["domain"]] = att.get(r["domain"], 0) + 1
            fail[r["domain"]] = fail.get(r["domain"], 0) + (0 if ok else 1)
        assert att, f"round {rnd} claimed nothing"
        for d, b in budgets.items():
            a = att.get(d, 0)
            if a == 0:
                continue  # no signal -> unchanged
            if 1000 * fail.get(d, 0) > 200 * a:
                budgets[d], halved = max(1, b // 2), True
            else:
                budgets[d], grew = b + 2, True

    got = {r["domain"]: r["max_per_round"] for r in drv.robots.collect()}
    assert got == budgets
    # the drain trajectory exercised both controller branches (the tail
    # rounds re-claim only flaky/missing URLs, an all-failure signal)
    assert halved and grew
    assert all(b >= 1 for b in got.values())


# --- largest-remainder budget apportionment (politeness/allocation.py) ----


def test_apportion_exact_proportions(spark):
    from scrapy_products_tracker_spark.politeness import apportion_budget

    w = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2)], "domain string, weight long"
    )
    got = {r.key: r.quota for r in apportion_budget(w, total=10).collect()}
    assert got == {"a": 5, "b": 3, "c": 2}


def test_apportion_remainder_tiebreak_and_exact_sum(spark):
    from scrapy_products_tracker_spark.politeness import apportion_budget

    w = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "domain string, weight long"
    )
    got = {r.key: r.quota for r in apportion_budget(w, total=10).collect()}
    # base 3 each, one leftover slot; remainders tie, weights tie ->
    # key asc gives it to 'a'; quotas sum to exactly the total
    assert got == {"a": 4, "b": 3, "c": 3}
    w2 = spark.createDataFrame(
        [(f"d{i:03d}", 7 + (i * 13) % 41) for i in range(157)],
        "domain string, weight long",
    )
    rows = apportion_budget(w2, total=1000).collect()
    assert sum(r.quota for r in rows) == 1000
    # deterministic across partitionings
    rows2 = apportion_budget(w2.repartition(13), total=1000).collect()
    assert sorted((r.key, r.quota) for r in rows) == sorted(
        (r.key, r.quota) for r in rows2
    )


def test_apportion_degenerate_weights(spark):
    import pytest

    from scrapy_products_tracker_spark.politeness import apportion_budget

    w = spark.createDataFrame(
        [("a", 0), ("b", None), ("c", -4), ("d", 9)],
        "domain string, weight long",
    )
    got = {r.key: r.quota for r in apportion_budget(w, total=5).collect()}
    assert got == {"a": 0, "b": 0, "c": 0, "d": 5}  # non-positive sit out
    allz = spark.createDataFrame([("a", 0)], "domain string, weight long")
    assert [r.quota for r in apportion_budget(allz, total=5).collect()] == [0]
    assert {r.quota for r in apportion_budget(w, total=0).collect()} == {0}
    with pytest.raises(ValueError):
        apportion_budget(w, total=-1)


def test_apportion_token_mass_weights_no_overflow(spark):
    # token-mass weights at web scale: total*weight ~10^24 >> 2^63. The
    # DECIMAL(38,0) staging must keep quotas exact (non-ANSI int64 math
    # would wrap silently and break the exact-sum invariant).
    from scrapy_products_tracker_spark.politeness import apportion_budget

    w = spark.createDataFrame(
        [("a", 3 * 10**15), ("b", 10**15), ("c", 7 * 10**14 + 3)],
        "domain string, weight long",
    )
    rows = apportion_budget(w, total=10**9).collect()
    got = {r.key: r.quota for r in rows}
    assert sum(got.values()) == 10**9
    tot_w = 3 * 10**15 + 10**15 + 7 * 10**14 + 3
    for k, wt in [("a", 3 * 10**15), ("b", 10**15), ("c", 7 * 10**14 + 3)]:
        base = (10**9 * wt) // tot_w
        assert got[k] in (base, base + 1)


def test_fetch_fairness_web_scale_counts_and_rejected_rows(spark):
    # (2i-1)*c at rank ~10^3 x count ~10^17 passes 2^63 without decimal
    # staging; NULL/negative counts must be filtered, not aggregated.
    from scrapy_products_tracker_spark.politeness import fetch_fairness

    rows = [(f"d{i:04d}", 10**13 * (i + 1)) for i in range(500)]
    rows += [("bad1", None), ("bad2", -5)]
    c = spark.createDataFrame(rows, "domain string, n long")
    r = fetch_fairness(c).collect()[0]
    n = 500
    tot = sum(10**13 * (i + 1) for i in range(n))
    wsum = sum((2 * (i + 1) - 1) * 10**13 * (i + 1) for i in range(n))
    assert tot < 2**63 < min(wsum, n * tot)  # staged intermediates overflow
    assert r.n_domains == n and r.total_fetches == tot
    assert r.gini_milli == ((wsum - n * tot) * 1000) // (n * tot)
    assert r.max_share_milli == (10**13 * n * 1000) // tot


def test_fetch_fairness_closed_forms(spark):
    from scrapy_products_tracker_spark.politeness import fetch_fairness

    even = spark.createDataFrame([("a", 5), ("b", 5)], "domain string, n long")
    r = fetch_fairness(even).collect()[0]
    assert (r.n_domains, r.total_fetches, r.gini_milli) == (2, 10, 0)
    assert r.max_share_milli == 500

    skewed = spark.createDataFrame([("a", 0), ("b", 10)], "domain string, n long")
    r = fetch_fairness(skewed).collect()[0]
    # one of two domains got everything: G = 1 - 1/n = 0.5
    assert r.gini_milli == 500 and r.max_share_milli == 1000

    # 4 domains, one hog: G = (2*1*0 + ... ) computed by hand below
    four = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0), ("d", 8)], "domain string, n long"
    )
    r = fetch_fairness(four).collect()[0]
    assert r.gini_milli == 750  # 1 - 1/4
