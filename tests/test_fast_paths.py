"""Equivalence tests for the performance fast paths.

Each fast path must be *semantically invisible*:
- ``schedule_round`` below ``salt_threshold`` pending rows skips the
  salted phase-1 scan but must claim exactly the same rows in the same
  order as the forced-salted plan,
- ``inline_retries=True`` resolves transient failures inside the fetch
  call instead of re-claiming across rounds; the terminal frontier
  state (seen set, per-URL status, fetch/failure counters) must match
  the re-claim model — only the round structure may differ,
- the parallel snapshot commit must produce the same manifest contents
  as the serial one (exercised implicitly by both crawls committing).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
from scrapy_products_tracker_spark.politeness import load_robots, schedule_round


def _crawl(spark, t1_paths, **cfg_kw):
    tmp = tempfile.mkdtemp(prefix="fastpath_")
    store = SnapshotParquetStore(tmp + "/store")
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
    return store, meta


def test_inline_retries_terminal_state_matches(spark, t1_paths):
    s_reclaim, m_reclaim = _crawl(spark, t1_paths, inline_retries=False)
    s_inline, m_inline = _crawl(spark, t1_paths, inline_retries=True)

    # identical seen set
    a = {r["url"] for r in s_reclaim.read_frontier(spark).select("url").collect()}
    b = {r["url"] for r in s_inline.read_frontier(spark).select("url").collect()}
    assert a == b

    # identical terminal per-URL status
    fa = {(r["url"], r["status"]) for r in s_reclaim.read_frontier(spark).select("url", "status").collect()}
    fb = {(r["url"], r["status"]) for r in s_inline.read_frontier(spark).select("url", "status").collect()}
    assert fa == fb

    # identical terminal counters (retry accounting differs only in
    # round structure, not in outcomes)
    ca, cb = m_reclaim["counters"], m_inline["counters"]
    for k in ("urls_seen", "urls_fetched", "urls_failed_hw", "urls_failed_logic",
              "urls_skipped_robots", "items_emitted"):
        assert ca[k] == cb[k], k

    # the whole point: inline mode needs fewer rounds (no retry tail)
    assert m_inline["round"] <= m_reclaim["round"]


def _hint_fixture(spark):
    import pandas as pd

    rows = []
    for d in range(6):
        for i in range(200 if d == 0 else 30):  # domain 0 is hot
            rows.append(
                {
                    "url": f"https://d{d}.example.com/p/{i}",
                    "url_hash": (d * 1_000_003 + i * 7919) - 500_000,
                    "domain": f"d{d}.example.com",
                    "tier": 1,
                    "priority": 0,
                    "depth": i % 4,
                    "discovered_seq": d * 10_000 + i,
                    "attempt": 0,
                }
            )
        # ensure deterministic input
    cands = spark.createDataFrame(pd.DataFrame(rows))
    robots = spark.createDataFrame(
        pd.DataFrame(
            {
                "domain": [f"d{d}.example.com" for d in range(6)],
                "disallow_prefixes": [["/private"]] * 6,
                "crawl_delay_ms": [0] * 6,
                "max_per_round": [7] * 6,
            }
        )
    )
    return cands, robots, len(rows)  # 350 candidate rows


def _uses_salted_phase1(df) -> bool:
    """The salted phase 1 is the only FlatMapGroupsInPandas in the claim."""
    return "FlatMapGroupsInPandas" in df._jdf.queryExecution().optimizedPlan().toString()


@pytest.mark.parametrize("chunk_size", [25, 50])
def test_schedule_round_pending_hint_branches_agree(spark, chunk_size):
    cands, robots, n_rows = _hint_fixture(spark)
    salted = schedule_round(
        cands, robots, chunk_size=chunk_size, n_salts=4, force_salted=True
    )
    hinted = schedule_round(cands, robots, chunk_size=chunk_size, n_salts=4, pending_hint=n_rows)
    # the threshold is an absolute row bound: 350 rows always skips
    # phase 1 unless forced; a hint above the bound takes it
    assert _uses_salted_phase1(salted)  # force_salted pins phase 1
    assert not _uses_salted_phase1(hinted)
    big_hint = schedule_round(
        cands, robots, chunk_size=chunk_size, n_salts=4,
        pending_hint=n_rows, salt_threshold=100,
    )
    assert _uses_salted_phase1(big_hint)  # hint above threshold -> salted
    ka = [tuple(r) for r in salted.orderBy("within_round_rank").collect()]
    kb = [tuple(r) for r in hinted.orderBy("within_round_rank").collect()]
    kc = [tuple(r) for r in big_hint.orderBy("within_round_rank").collect()]
    assert ka == kb == kc
    assert len(ka) == min(chunk_size, 6 * 7)  # 6 domains x budget 7 caps the claim


def test_cuckoo_seen_filter_matches_bloom(spark, t1_paths):
    """The cuckoo seen-set path must produce the exact same crawl as
    the Bloom path — both are pre-filters confirmed by an anti-join."""
    s_bloom, m_bloom = _crawl(spark, t1_paths, seen_filter="bloom")
    s_ck, m_ck = _crawl(spark, t1_paths, seen_filter="cuckoo")
    fa = sorted(
        (r["url"], r["status"]) for r in s_bloom.read_frontier(spark).collect()
    )
    fb = sorted((r["url"], r["status"]) for r in s_ck.read_frontier(spark).collect())
    assert fa == fb
    assert m_bloom["counters"] == m_ck["counters"]
    # cuckoo persists across snapshots and supports deletion
    ck = s_ck.read_cuckoo()
    assert ck is not None and ck.count == m_ck["counters"]["urls_seen"]


def test_confirm_prune_path_is_semantically_invisible(spark, t1_paths):
    """The bucket-pruned exact-confirm anti-join (the 10^10-scale path,
    confirm_prune_threshold=0 forces it) must produce the exact same
    crawl as the full-key-scan confirm (sandbox default)."""
    s_full, m_full = _crawl(spark, t1_paths)  # threshold 1e6 -> never prunes
    s_pruned, m_pruned = _crawl(spark, t1_paths, confirm_prune_threshold=0)
    fa = sorted(
        (r["url"], r["status"], r["attempt"]) for r in s_full.read_frontier(spark).collect()
    )
    fb = sorted(
        (r["url"], r["status"], r["attempt"]) for r in s_pruned.read_frontier(spark).collect()
    )
    assert fa == fb
    assert m_full["counters"] == m_pruned["counters"]
    oa = sorted(map(tuple, s_full.read_crawl_order(spark).collect()))
    ob = sorted(map(tuple, s_pruned.read_crawl_order(spark).collect()))
    assert oa == ob


def test_claim_bucket_pruning_is_invisible_and_counts_exact(spark, t1_paths):
    """Pending-per-bucket claim pruning must not change the crawl, and
    the incrementally maintained counts must equal a recount of the
    frontier at the end (including after a session re-arm)."""
    s_on, m_on = _crawl(spark, t1_paths)  # pruning default-on
    s_off, m_off = _crawl(spark, t1_paths, claim_bucket_pruning=False)
    oa = sorted(map(tuple, s_on.read_crawl_order(spark).collect()))
    ob = sorted(map(tuple, s_off.read_crawl_order(spark).collect()))
    assert oa == ob
    assert m_on["counters"] == m_off["counters"]

    from scrapy_products_tracker_spark.frontier import frontier_bucket_col
    from scrapy_products_tracker_spark.schemas import PENDING

    def recount(store):
        B = store.frontier_n_buckets()
        rows = (
            store.read_frontier(spark)
            .filter(F.col("status") == PENDING)
            .groupBy(frontier_bucket_col(F.col("url_hash"), B).alias("fb"))
            .count()
            .collect()
        )
        return {str(r["fb"]): r["count"] for r in rows}

    ppb = {k: v for k, v in s_on.read_manifest()["meta"]["pending_per_bucket"].items() if v > 0}
    assert ppb == recount(s_on)  # drained crawl: all zero -> both empty
