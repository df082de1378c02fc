"""Product-targets upsert, price history, exporters, mark-sent, and
stop-tracking (K4/K6/K8/K9/O4/O6, J1-J4) — the reference's
product_result_consumer.py:40-94 transaction + base_csv_exporter.py:
42-117 bookkeeping, re-expressed as engine tables."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
from scrapy_products_tracker_spark.politeness import load_robots
from scrapy_products_tracker_spark.products import (
    export_category,
    export_history,
    run_incremental_export,
    stop_tracking,
)
from scrapy_products_tracker_spark.schemas import SUCCESS


@pytest.fixture(scope="module")
def crawled(spark, t1_paths, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("products"))
    store = SnapshotParquetStore(tmp + "/store")
    drv = CrawlDriver(
        spark,
        store,
        spark.read.parquet(t1_paths["pages"]),
        spark.read.parquet(t1_paths["image_caption"]),
        load_robots(spark, t1_paths["robots"]),
        CrawlConfig(chunk_size=50),
    )
    drv.seed(spark.read.parquet(t1_paths["seeds"]))
    drv.run()
    return store, drv, tmp


def test_targets_match_truth_and_history_appends(spark, t1_paths, crawled):
    store, drv, _ = crawled
    prods = store.read_products(spark)
    hist = store.read_history(spark)
    truth = spark.read.parquet(t1_paths["truth"]).filter(F.col("parse_ok"))
    # every successfully fetched+parsed detail page has exactly one
    # target row (upsert; K4) and one history row per crawl (K6)
    assert prods.count() == hist.count()
    assert prods.groupBy("url").count().filter(F.col("count") > 1).count() == 0
    j = prods.join(
        truth.select(
            "url",
            F.col("title").alias("t_title"),
            F.col("brand").alias("t_brand"),
            F.col("additional_info").alias("t_ai"),
            F.col("category").alias("t_cat"),
        ),
        "url",
        "inner",
    )
    assert j.count() == prods.count()  # all products exist in truth
    bad = j.filter(
        ~F.col("title").eqNullSafe(F.col("t_title"))
        | ~F.col("brand").eqNullSafe(F.col("t_brand"))
        | ~F.col("additional_info").eqNullSafe(F.col("t_ai"))
        | ~F.col("category").eqNullSafe(F.col("t_cat"))
    )
    assert bad.count() == 0
    hj = hist.join(
        truth.select(
            "url",
            F.col("current_price_cents").alias("t_cur"),
            F.col("regular_price_cents").alias("t_reg"),
            F.col("is_in_stock").alias("t_st"),
            F.col("currency").alias("t_ccy"),
        ),
        "url",
    )
    assert (
        hj.filter(
            (F.col("current_price_cents") != F.col("t_cur"))
            | (F.col("regular_price_cents") != F.col("t_reg"))
            | (F.col("is_in_stock") != F.col("t_st"))
            | (F.col("currency") != F.col("t_ccy"))
        ).count()
        == 0
    )
    # the unparseable slice was counted, not dropped silently
    assert store.read_manifest()["meta"]["products"]["unparseable"] >= 0


def test_history_export_join(spark, crawled):
    store, _, _ = crawled
    out = export_history(spark, store)
    assert out.count() == store.read_history(spark).count()
    row = out.first()
    assert row["current_price"] is not None  # DECIMAL(20,2) render
    # url filter narrows to one product's history (history_exporter --url)
    one = export_history(spark, store, url=row["url"])
    assert one.count() >= 1
    assert {r["url"] for r in one.collect()} == {row["url"]}


def test_category_export_ordering(spark, crawled):
    store, _, _ = crawled
    cat = store.read_products(spark).select("category").first()["category"]
    out = export_category(spark, store, cat).collect()
    assert len(out) >= 1
    positions = [r["position"] for r in out if r["position"] is not None]
    assert positions == sorted(positions)  # O3: ordered by position


def test_rearm_after_recrawl_updates_metadata_session(spark, t1_paths, crawled):
    store, drv, _ = crawled
    before = store.read_products(spark)
    n_before = before.count()
    drv.rearm_session(2)
    drv.run()
    after = store.read_products(spark)
    assert after.count() == n_before  # upsert, not append (UNIQUE url)
    assert after.filter(F.col("session") == 2).count() == n_before  # refreshed
    assert after.filter(F.col("first_round") <= 0).count() == 0
    # history grew: one snapshot per session (K6 append-only)
    hist = store.read_history(spark)
    assert hist.filter(F.col("session") == 2).count() == n_before


def test_incremental_export_exactly_once(spark, crawled):
    store, _, tmp = crawled
    n_unsent = (
        store.read_products(spark).filter(F.col("sent_to_customer").isNull()).count()
    )
    n1 = run_incremental_export(spark, store, tmp + "/exp", chunk=40)
    assert n1 == -(-n_unsent // 40)  # ceil
    rows = sum(
        len(open(f).readlines()) - 1
        for f in glob.glob(tmp + "/exp/run_*/chunk_*/part-*.csv")
    )
    assert rows == n_unsent
    # second run exports nothing (K9 sent_to_customer bookkeeping)
    assert run_incremental_export(spark, store, tmp + "/exp2", chunk=40) == 0
    assert glob.glob(tmp + "/exp2/run_*/chunk_*/part-*.csv") == []
    # a later NON-empty run into the SAME dir must never truncate run
    # 1's delivered files (per-run subdirs isolate overwrite-mode
    # writes): un-send one row, re-export, and recount everything
    victim = store.read_products(spark).orderBy("url").select("url_hash", "url").first()
    unsend = spark.createDataFrame(
        [(victim["url_hash"], victim["url"])], ["url_hash", "url"]
    ).withColumn("sent_to_customer", F.lit(None).cast("string"))
    store.commit(products_set=unsend, meta={})
    assert run_incremental_export(spark, store, tmp + "/exp", chunk=40) == 1
    rows_after = sum(
        len(open(f).readlines()) - 1
        for f in glob.glob(tmp + "/exp/run_*/chunk_*/part-*.csv")
    )
    assert rows_after == n_unsent + 1  # run 1 files intact + the re-export
    assert len(glob.glob(tmp + "/exp/run_*")) == 2


def test_revisit_priority_change_rates(spark):
    """O5+ policy: change counting is lag-based, NULL-safe (NULL->value
    counts, NULL->NULL doesn't, first row never does), and the interval
    buckets follow the documented thresholds."""
    from scrapy_products_tracker_spark.products import revisit_priority

    rows = [
        # url, price, session, round
        ("a", 100, 1, 1), ("a", 100, 2, 1), ("a", 100, 3, 1),   # never changed -> slow
        ("b", 100, 1, 1), ("b", 200, 2, 1), ("b", 300, 3, 1),   # every interval -> fast
        ("c", 100, 1, 1), ("c", 100, 2, 1), ("c", 200, 3, 1),   # 1/2 -> fast (>= 0.5)
        ("d", 100, 1, 1),                                         # single obs -> default
        ("e", None, 1, 1), ("e", None, 2, 1), ("e", 100, 3, 1),  # NULL->NULL no, NULL->100 yes
    ]

    class FakeStore:
        def read_history(self, s):
            return spark.createDataFrame(
                rows, "url string, current_price_cents long, session int, round int"
            )

    got = {r["url"]: r.asDict() for r in revisit_priority(spark, FakeStore()).collect()}
    assert got["a"]["n_changes"] == 0 and got["a"]["revisit_after_sessions"] == 4
    assert got["b"]["n_changes"] == 2 and got["b"]["revisit_after_sessions"] == 1
    assert got["c"]["change_rate"] == 0.5 and got["c"]["revisit_after_sessions"] == 1
    assert got["d"]["change_rate"] is None and got["d"]["revisit_after_sessions"] == 2
    # e: NULL->NULL not a change, NULL->100 is -> 1 change / 2 intervals
    # = rate 0.5 -> fast
    assert got["e"]["n_changes"] == 1 and got["e"]["revisit_after_sessions"] == 1


def test_price_change_events_set(spark):
    """price_change_events: the change SET matching revisit's counts —
    same NULL semantics, plus the delta is NULL when either side is."""
    from scrapy_products_tracker_spark.products import price_change_events

    rows = [
        ("a", 100, 1, 1), ("a", 100, 2, 1),                      # no change
        ("b", 100, 1, 1), ("b", 250, 2, 1),                      # +150
        ("e", None, 1, 1), ("e", None, 2, 1), ("e", 100, 3, 1),  # NULL->100
        ("f", 100, 1, 1), ("f", None, 2, 1),                     # 100->NULL
    ]

    class FakeStore:
        def read_history(self, s):
            return spark.createDataFrame(
                rows, "url string, current_price_cents long, session int, round int"
            )

    got = {
        (r["url"], r["session"]): (r["prev_cents"], r["new_cents"], r["delta_cents"])
        for r in price_change_events(spark, FakeStore()).collect()
    }
    assert got == {
        ("b", 2): (100, 250, 150),
        ("e", 3): (None, 100, None),
        ("f", 2): (100, None, None),
    }


def test_stop_tracking_excludes_from_rearm(spark, crawled):
    store, drv, _ = crawled
    prods = store.read_products(spark)
    victim = prods.orderBy("url").select("url").first()["url"]
    stop_tracking(spark, store, spark.createDataFrame([(victim,)], ["url"]))
    assert (
        store.read_products(spark)
        .filter(F.col("url") == victim)
        .select("is_tracked")
        .first()["is_tracked"]
        is False
    )
    drv.rearm_session(3)
    fr = store.read_frontier(spark)
    # O6: the stopped URL keeps its terminal status; everything else re-armed
    assert fr.filter(F.col("url") == victim).select("status").first()["status"] == SUCCESS
    assert fr.filter((F.col("status") == SUCCESS)).count() == 1


def test_expire_snapshots_keeps_live_bucketized_tables(spark, crawled):
    """GC must respect per-bucket references: after expiring to the
    retained window, frontier/products/history/seen reads still work
    and old unreferenced versions are gone."""
    store, _, _ = crawled
    n_fr = store.read_frontier(spark).count()
    n_pr = store.read_products(spark).count()
    n_hi = store.read_history(spark).count()
    store.expire_snapshots(keep_last=2)
    assert store.read_frontier(spark).count() == n_fr
    assert store.read_products(spark).count() == n_pr
    assert store.read_history(spark).count() == n_hi
    seen = store.read_seen(spark)
    assert seen is not None and seen.shards_df().count() > 0
    # and the manifest window shrank to the retained versions
    import glob as g

    kept = sorted(g.glob(str(store.root / "snapshots" / "v*.json")))
    assert len(kept) == 2


# --- two-phase chunk rank (VERDICT r03 #3) -----------------------------------


def test_chunk_assignments_equal_global_rank(spark):
    """Two-phase rank == the naive global row_number rank, including
    prefix-collision groups and urls shorter than the prefix."""
    from pyspark.sql import Window

    from scrapy_products_tracker_spark.products.export import _chunk_assignments

    urls = (
        [f"https://d{i % 7}.example.com/p/{i:04d}" for i in range(173)]
        + ["https://z", "https://z/a", "a", "ab"]  # short + shared-prefix edges
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(8)
    got = {
        r["url"]: r["chunk_id"]
        for r in _chunk_assignments(df, chunk=40, prefix_len=24).collect()
    }
    want = {
        r["url"]: (r["rn"] - 1) // 40
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("url"))
        ).collect()
    }
    assert got == want


def test_chunk_assignments_plan_no_full_data_single_partition(spark):
    """The row_number window over the data must be partitioned by the
    url-prefix range key; the offsets join must broadcast. The only
    permitted single-partition exchange feeds the TINY per-prefix
    offsets window (its input is an aggregate, not the base rows)."""
    import re

    from scrapy_products_tracker_spark.products.export import _chunk_assignments

    df = spark.range(1000).select(
        F.concat(F.lit("https://d"), (F.col("id") % 13).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url")
    )
    plan = _chunk_assignments(df, chunk=100)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan
    # every row_number window is range-partitioned (never global)
    for m in re.finditer(r"Window \[row_number\(\)[^\n]*", plan):
        assert "_rng" in m.group(0), m.group(0)
