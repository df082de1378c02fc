"""LSM-style frontier log commits (``frontier_commit='log'``) must be
semantically invisible: a crawl over a log-mode store — with and
without mid-crawl auto-compaction — produces byte-identical counters,
frontier, crawl order and products to the copy-on-write store; resume
and rollback behave identically; the claim scan keeps its pushed
``status = PENDING`` filter while log runs are outstanding."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
from scrapy_products_tracker_spark.politeness import load_robots
from scrapy_products_tracker_spark.schemas import PENDING


def _crawl(spark, t1_paths, store_kw=None, **cfg_kw):
    tmp = tempfile.mkdtemp(prefix="logmode_")
    store = SnapshotParquetStore(tmp + "/store", **(store_kw or {}))
    drv = CrawlDriver(
        spark,
        store,
        spark.read.parquet(t1_paths["pages"]),
        spark.read.parquet(t1_paths["image_caption"]),
        load_robots(spark, t1_paths["robots"]),
        CrawlConfig(chunk_size=50, **cfg_kw),
    )
    drv.seed(spark.read.parquet(t1_paths["seeds"]))
    meta = drv.run()
    return store, drv, meta


def _frontier_rows(spark, store):
    return sorted(
        tuple(r) for r in store.read_frontier(spark).collect()
    )


def _order_rows(spark, store):
    df = store.read_crawl_order(spark)
    return sorted(tuple(r) for r in df.collect()) if df is not None else []


COMPARE_STORES = [
    # auto-compaction every 3 runs: the fold happens mid-crawl
    {"frontier_commit": "log", "frontier_log_max_runs": 3},
    # cap 0 disables auto-compaction: the whole crawl rides the log
    {"frontier_commit": "log", "frontier_log_max_runs": 0},
]


@pytest.mark.parametrize("store_kw", COMPARE_STORES)
def test_log_mode_crawl_parity(spark, t1_paths, store_kw):
    s_cow, _, m_cow = _crawl(spark, t1_paths)
    s_log, _, m_log = _crawl(spark, t1_paths, store_kw=store_kw)
    assert m_log["counters"] == m_cow["counters"]
    assert m_log["round"] == m_cow["round"]
    assert _frontier_rows(spark, s_log) == _frontier_rows(spark, s_cow)
    assert _order_rows(spark, s_log) == _order_rows(spark, s_cow)
    pc = s_cow.read_products(spark)
    pl = s_log.read_products(spark)
    if pc is not None:
        assert sorted(map(tuple, pl.collect())) == sorted(map(tuple, pc.collect()))
    # explicit compaction after the fact is a pure layout change
    before = _frontier_rows(spark, s_log)
    res = s_log.compact_frontier_log(spark)
    if store_kw["frontier_log_max_runs"] == 0:
        assert res is not None and res["runs"] > 0
    assert s_log._frontier_log(s_log.read_manifest()) == []
    assert _frontier_rows(spark, s_log) == before
    # compacting a log-free store is a no-op
    assert s_log.compact_frontier_log(spark) is None


def test_log_mode_rollback_resume_parity(spark, t1_paths):
    s_ctl, _, m_ctl = _crawl(
        spark, t1_paths, store_kw={"frontier_commit": "log", "frontier_log_max_runs": 4}
    )
    s2, drv2, m2 = _crawl(
        spark, t1_paths, store_kw={"frontier_commit": "log", "frontier_log_max_runs": 4}
    )
    # roll back past several round commits (possibly across a
    # compaction boundary) and re-run: the at-least-once contract
    target = max(1, s2.latest_version() - 4)
    s2.rollback(target)
    m_redo = drv2.run()
    assert m_redo["counters"] == m_ctl["counters"]
    assert _frontier_rows(spark, s2) == _frontier_rows(spark, s_ctl)


def test_cow_commit_refuses_outstanding_log(spark, t1_paths):
    s_log, _, _ = _crawl(
        spark, t1_paths, store_kw={"frontier_commit": "log", "frontier_log_max_runs": 0}
    )
    assert s_log._frontier_log(s_log.read_manifest())  # runs outstanding
    reopened = SnapshotParquetStore(str(s_log.root))  # default: cow
    fr = reopened.read_frontier(spark)
    upd = fr.limit(1).select(
        "url_hash",
        "url",
        F.lit(2).alias("new_status"),
        F.lit(1).alias("new_attempt"),
    )
    with pytest.raises(ValueError, match="outstanding log"):
        reopened.commit(frontier_updates=upd)
    # compaction clears the way for COW again
    reopened.compact_frontier_log(spark)
    reopened.commit(frontier_updates=upd)


def test_log_mode_bucket_read_pruning_exact(spark, t1_paths):
    s_log, _, _ = _crawl(
        spark, t1_paths, store_kw={"frontier_commit": "log", "frontier_log_max_runs": 0}
    )
    full = s_log.read_frontier(spark)
    B = s_log.frontier_n_buckets()
    some = [0, 3, 7, 12, 31]
    got = sorted(
        tuple(r) for r in s_log.read_frontier_buckets(spark, some).collect()
    )
    want = sorted(
        tuple(r)
        for r in full.filter(
            F.col("url_hash").bitwiseAND(F.lit(B - 1)).isin(some)
        ).collect()
    )
    assert got == want


def test_log_mode_claim_scan_keeps_pushed_pending_filter(spark, t1_paths):
    s_log, _, _ = _crawl(
        spark, t1_paths, store_kw={"frontier_commit": "log", "frontier_log_max_runs": 0}
    )
    plan = (
        s_log.read_frontier(spark)
        .filter(F.col("status") == PENDING)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the PENDING branch's base scan carries the pushed status filter
    # (row-group skip survives merge-on-read); the terminal branch is
    # pruned away by the contradiction, leaving no unfiltered scan
    assert "EqualTo(status,0)" in plan


def test_log_rows_cap_triggers_compaction(spark, tmpdir_path):
    # the merge-on-read view broadcasts the latest-update aggregate, so
    # outstanding log ROWS must stay broadcast-sized whatever the chunk
    # size: a tiny rows cap must fold the log even with the run cap
    # disabled (million-row rounds hit this long before 16 runs)
    store = SnapshotParquetStore(
        tmpdir_path + "/s",
        frontier_commit="log",
        frontier_log_max_runs=0,
        frontier_log_max_rows=5,
    )
    fr = spark.range(40).selectExpr(
        "concat('https://d/p/', id) AS url",
        "xxhash64(concat('https://d/p/', id)) AS url_hash",
        "cast(0 as int) AS status",
        "cast(0 as int) AS attempt",
    )
    store.commit(fr, meta={})
    upd = fr.limit(10).selectExpr(
        "url_hash", "url", "cast(2 as int) AS new_status", "cast(1 as int) AS new_attempt"
    )
    store.commit(frontier_updates=upd, meta={})
    # 10 staged rows >= cap 5 -> auto-compacted to a log-free snapshot
    assert store._frontier_log(store.read_manifest()) == []
    got = {
        (r["url"], r["status"]) for r in store.read_frontier(spark).collect()
    }
    assert sum(1 for _, s in got if s == 2) == 10 and len(got) == 40


def test_log_mode_expire_snapshots_keeps_live_log(spark, t1_paths):
    s_log, _, m = _crawl(
        spark, t1_paths, store_kw={"frontier_commit": "log", "frontier_log_max_runs": 0}
    )
    rows_before = _frontier_rows(spark, s_log)
    s_log.expire_snapshots(keep_last=1)
    assert _frontier_rows(spark, s_log) == rows_before
