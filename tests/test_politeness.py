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


def test_registrable_key_subdomain_swarm_shares_one_budget(spark):
    """1,000 subdomains of one eTLD+1: under the netloc key each host
    gets its own budget (the swarm multiplies its crawl rate x1000);
    under the registrable key they share ONE rolled-up budget — the
    min effective budget over member hosts."""
    from scrapy_products_tracker_spark.functions.urls import registrable_domain
    from scrapy_products_tracker_spark.politeness.scheduler import rollup_budgets

    n_subs = 1000
    rows = [
        (f"https://s{i:04d}.swarm.com/p/{j}", i * 31 + j, f"s{i:04d}.swarm.com",
         1, 0, 1, i * 10 + j, 0)
        for i in range(n_subs)
        for j in range(3)
    ] + [
        (f"https://other{k}.com/p/{j}", 900_000 + k * 7 + j, f"other{k}.com",
         1, 0, 1, 500_000 + k * 10 + j, 0)
        for k in range(5)
        for j in range(3)
    ]
    cands = spark.createDataFrame(
        rows,
        ["url", "url_hash", "domain", "tier", "priority", "depth",
         "discovered_seq", "attempt"],
    )
    robots = cands.select("domain").distinct().select(
        "domain",
        F.array().cast("array<string>").alias("disallow_prefixes"),
        F.lit(0).cast("long").alias("crawl_delay_ms"),
        # one member host carries a tight budget of 2 — the min rollup
        # must adopt it for the whole site
        F.when(F.col("domain") == "s0000.swarm.com", 2)
        .otherwise(8)
        .cast("int")
        .alias("max_per_round"),
    )

    # netloc key (reference parity): the swarm claims ~n_subs * budget
    netloc = schedule_round(cands, robots, chunk_size=100_000, n_salts=4)
    n_swarm_netloc = netloc.filter(F.col("domain").endswith("swarm.com")).count()
    assert n_swarm_netloc > 2000  # 1000 hosts x up to 3 rows each

    # registrable key: ONE budget (min over members = 2) for the site
    pk = cands.withColumn("_pkey", registrable_domain(F.col("domain")))
    for force in (False, True):  # fast path and salted path agree
        reg = schedule_round(
            pk,
            robots,
            chunk_size=100_000,
            n_salts=4,
            key_col="_pkey",
            budgets=rollup_budgets(robots),
            force_salted=force,
        )
        by_site = {
            r["_pkey"]: r["count"]
            for r in reg.groupBy("_pkey").count().collect()
        }
        assert by_site["swarm.com"] == 2  # the whole swarm: one budget
        for k in range(5):
            assert by_site[f"other{k}.com"] == 3  # budget 8 > 3 pending


def test_registrable_key_crawl_smoke(spark, t1_paths):
    """Driver integration: a T1 crawl under politeness_key='registrable'
    (every d*.example.com host collapses into ONE example.com budget)
    still drains the frontier to the same terminal counters — tighter
    budgets stretch rounds, never drop URLs."""
    import tempfile

    import pytest

    from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
    from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
    from scrapy_products_tracker_spark.politeness import load_robots

    with pytest.raises(ValueError):
        CrawlConfig(politeness_key="bogus")

    def crawl(key):
        tmp = tempfile.mkdtemp(prefix="pkey_")
        drv = CrawlDriver(
            spark,
            SnapshotParquetStore(tmp + "/store"),
            spark.read.parquet(t1_paths["pages"]),
            spark.read.parquet(t1_paths["image_caption"]),
            load_robots(spark, t1_paths["robots"]),
            CrawlConfig(chunk_size=50, politeness_key=key),
        )
        drv.seed(spark.read.parquet(t1_paths["seeds"]))
        return drv.run()

    m_net = crawl("netloc")
    m_reg = crawl("registrable")
    assert m_reg["counters"] == m_net["counters"]
    assert m_reg["round"] >= m_net["round"]  # shared budget can only slow rounds


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


def test_aged_priority_starvation_freedom(spark):
    """Wait-queue aging: an old low-importance row eventually outranks
    a fresh high-importance one; age clamps at zero; rate 0 == base
    order scaled (pure no-op modulo the x1000 scale)."""
    from scrapy_products_tracker_spark.politeness.scheduler import aged_priority_col

    rows = [
        # url, url_hash, domain, tier, priority, depth, seq, round
        ("https://a/old", 1, "a", 0, 5, 0, 1, 0),    # poor priority, waited 10
        ("https://a/new", 2, "a", 0, 0, 0, 2, 10),   # best priority, fresh
        ("https://a/skew", 3, "a", 0, 1, 0, 3, 99),  # "future" round: age clamps to 0
    ]
    schema = (
        "url string, url_hash long, domain string, tier int, priority int, "
        "depth int, discovered_seq long, discovered_round int"
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r["url"]: r["eff"]
        for r in df.select(
            "url", aged_priority_col(10, 600).alias("eff")
        ).collect()
    }
    assert got["https://a/old"] == 5 * 1000 - 10 * 600   # -1000: now beats fresh 0
    assert got["https://a/new"] == 0
    assert got["https://a/skew"] == 1000                 # no negative-age bonus
    assert got["https://a/old"] < got["https://a/new"] < got["https://a/skew"]

    zero = {
        r["url"]: r["eff"]
        for r in df.select("url", aged_priority_col(10, 0).alias("eff")).collect()
    }
    assert zero == {u: p * 1000 for u, p in
                    [("https://a/old", 5), ("https://a/new", 0), ("https://a/skew", 1)]}


def test_driver_aging_scale_and_restore(tmpdir_path):
    """CrawlDriver(aging_milli_per_round=...) changes only ORDER, never
    totals, and claimed/persisted rows carry BASE priority units."""
    import tempfile

    from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
    from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
    from scrapy_products_tracker_spark.politeness import load_robots
    from scrapy_products_tracker_spark.session import get_spark
    from scrapy_products_tracker_spark.synth import T1_SMOKE, generate_world, write_world

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    tmp = tempfile.mkdtemp(dir=tmpdir_path)
    paths = write_world(generate_world(T1_SMOKE), tmp + "/world")

    def crawl(aging):
        store = SnapshotParquetStore(tmp + f"/store_{aging}")
        drv = CrawlDriver(
            spark,
            store,
            spark.read.parquet(paths["pages"]),
            spark.read.parquet(paths["image_caption"]),
            load_robots(spark, paths["robots"]),
            CrawlConfig(chunk_size=50, aging_milli_per_round=aging),
        )
        drv.seed(spark.read.parquet(paths["seeds"]))
        meta = drv.run()
        fr = store.read_frontier(spark)
        return meta["counters"], fr

    base_counters, base_fr = crawl(0)
    aged_counters, aged_fr = crawl(2500)
    assert aged_counters == base_counters  # totals invariant
    # persisted priorities are BASE units (restore happened): the
    # frontier never contains the x1000-scaled effective values
    mx = aged_fr.agg(F.max(F.abs(F.col("priority")))).first()[0]
    bx = base_fr.agg(F.max(F.abs(F.col("priority")))).first()[0]
    assert mx == bx
