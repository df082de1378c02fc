"""Store maintenance ops: online frontier rebucketing, Bloom seen-set
resize, fill-stats. The invariant under test: maintenance commits are
INVISIBLE to crawl semantics — a crawl interrupted by rebucket+rebuild
finishes with byte-identical crawl order, counters, and frontier to an
uninterrupted control run."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
from scrapy_products_tracker_spark.dedup.seen_table import BloomTable, bloom_fill_stats
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
from scrapy_products_tracker_spark.politeness import load_robots


def _driver(spark, t1_paths, store):
    return CrawlDriver(
        spark,
        store,
        spark.read.parquet(t1_paths["pages"]),
        spark.read.parquet(t1_paths["image_caption"]),
        load_robots(spark, t1_paths["robots"]),
        CrawlConfig(chunk_size=50),
    )


def _snapshot(spark, store):
    order = sorted(
        (r["round"], r["within_round_rank"], r["url"])
        for r in store.read_crawl_order(spark).collect()
    )
    frontier = sorted(
        (r["url"], r["status"]) for r in store.read_frontier(spark).collect()
    )
    meta = store.read_manifest()["meta"]
    return order, frontier, meta["counters"]


def test_maintenance_mid_crawl_is_invisible(spark, t1_paths, tmpdir_path):
    seeds = spark.read.parquet(t1_paths["seeds"])

    control = SnapshotParquetStore(tmpdir_path + "/control")
    d = _driver(spark, t1_paths, control)
    d.seed(seeds)
    d.run()
    expected = _snapshot(spark, control)

    store = SnapshotParquetStore(tmpdir_path + "/maint")
    d = _driver(spark, t1_paths, store)
    d.seed(seeds)
    for _ in range(3):
        assert d.run_round() is not None
    # maintenance window: double frontier buckets, double bloom bits
    store.rebucket_frontier(spark, factor=2)
    assert store.frontier_n_buckets() == 64
    store.rebuild_seen(spark, scale=2)
    # per-bucket pending counts were re-keyed to the new layout
    ppb = store.read_manifest()["meta"]["pending_per_bucket"]
    assert max(int(b) for b in ppb) >= 32
    # resume through a FRESH handle (adopts committed bucket count)
    store2 = SnapshotParquetStore(tmpdir_path + "/maint")
    assert store2.n_frontier_buckets == 64
    d2 = _driver(spark, t1_paths, store2)
    d2.run()
    got = _snapshot(spark, store2)
    assert got[0] == expected[0]  # crawl order
    assert got[1] == expected[1]  # frontier (url, status)
    assert got[2] == expected[2]  # counters


def test_rebucket_guards(spark, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path)
    with pytest.raises(ValueError):
        store.rebucket_frontier(spark)
    with pytest.raises(ValueError):
        SnapshotParquetStore(tmpdir_path + "/x", n_frontier_buckets=3)


def test_fill_stats_and_resize(spark):
    urls = [(f"https://d{i % 7}.example.com/p/{i}",) for i in range(400)]
    df = spark.createDataFrame(urls, "url string")
    bits, k, nb = 4096, 4, 8
    shards = BloomTable.build_shards_df(df, "url", nb, bits, k)
    stats = {r["bucket"]: r for r in bloom_fill_stats(shards, bits, k).collect()}
    # actual keys per shard (hash-space split is uneven by design)
    from scrapy_products_tracker_spark.dedup.bloom import bucket_col, with_bloom_hashes

    actual = {
        r["b"]: r["count"]
        for r in with_bloom_hashes(df)
        .groupBy(bucket_col(F.col("_h1"), nb).alias("b"))
        .count()
        .collect()
    }
    # popcount ground truth, recomputed here from the shard bytes
    for r in shards.collect():
        x = int(np.unpackbits(np.frombuffer(bytes(r["payload"]), np.uint8)).sum())
        s = stats[r["bucket"]]
        assert s["set_bits"] == x
        assert s["fill_milli"] == (1000 * x) // bits
        assert 0 < s["est_fp_micro"] < 1_000_000
        # inverted-fill cardinality estimate lands near the true count
        assert abs(s["est_keys"] - actual[r["bucket"]]) <= max(5, actual[r["bucket"]] * 0.15)
    # doubling bits drops fill below ~55% of the original (collisions
    # make the relation inexact, but halving is the expected shape)
    big = BloomTable.build_shards_df(df, "url", nb, bits * 2, k)
    stats2 = bloom_fill_stats(big, bits * 2, k).collect()
    f1 = sum(s["set_bits"] for s in stats.values()) / (nb * bits)
    f2 = sum(r["set_bits"] for r in stats2) / (nb * bits * 2)
    assert f2 < 0.58 * f1
    # membership survives the resize: every inserted url still maybe-seen


def test_resize_keeps_membership(spark, tmpdir_path):
    urls = [(f"https://d{i % 7}.example.com/p/{i}",) for i in range(400)]
    df = spark.createDataFrame(urls, "url string")
    bits, k, nb = 4096, 4, 8
    big = BloomTable.build_shards_df(df, "url", nb, bits * 2, k)
    big.write.parquet(tmpdir_path + "/shards")
    table = BloomTable(
        spark, [tmpdir_path + "/shards"], {"n_buckets": nb, "bits": bits * 2, "k": k}
    )
    assert table.mark(df, "url").filter(~F.col("_maybe_seen")).count() == 0


def test_snapshot_diff_accounts_for_counters(spark, t1_paths, tmpdir_path):
    """diff(v_seed -> latest) row totals reconcile with the crawl's
    own counters: inserted rows (NULL from_status) == urls_seen minus
    the seeded rows, and nothing is ever deleted (NULL to_status)."""
    from scrapy_products_tracker_spark.schemas import PENDING

    store = SnapshotParquetStore(tmpdir_path)
    d = _driver(spark, t1_paths, store)
    v1 = d.seed(spark.read.parquet(t1_paths["seeds"]))
    final = d.run()
    diff = store.snapshot_diff(spark, v1).collect()
    by = {(r["from_status"], r["to_status"]): r["n"] for r in diff}
    assert all(k[1] is not None for k in by)  # rows never deleted
    inserted = sum(n for (f, _t), n in by.items() if f is None)
    seeded = sum(n for (f, _t), n in by.items() if f is not None)
    assert seeded + inserted == final["counters"]["urls_seen"]
    # every seeded PENDING row reached a terminal/skip state (T1 drains)
    assert (PENDING, PENDING) not in by
    with pytest.raises(ValueError):
        store.snapshot_diff(spark, 999)


def test_auto_rebucket_mid_crawl(spark, t1_paths, tmpdir_path):
    """CrawlConfig(auto_rebucket_pending=...) grows the layout inline
    and stays parity-invisible."""
    seeds = spark.read.parquet(t1_paths["seeds"])
    control = SnapshotParquetStore(tmpdir_path + "/c")
    d = _driver(spark, t1_paths, control)
    d.seed(seeds)
    d.run()
    expected = _snapshot(spark, control)

    store = SnapshotParquetStore(tmpdir_path + "/a")
    d = CrawlDriver(
        spark,
        store,
        spark.read.parquet(t1_paths["pages"]),
        spark.read.parquet(t1_paths["image_caption"]),
        load_robots(spark, t1_paths["robots"]),
        CrawlConfig(chunk_size=50, auto_rebucket_pending=1, auto_rebucket_max_buckets=256),
    )
    d.seed(seeds)
    d.run()
    assert store.frontier_n_buckets() == 256  # grew and respected the cap
    got = _snapshot(spark, store)
    assert got[0] == expected[0] and got[1] == expected[1] and got[2] == expected[2]


def test_explicit_bucket_mismatch_refused(spark, t1_paths, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path, n_frontier_buckets=16)
    d = _driver(spark, t1_paths, store)
    d.seed(spark.read.parquet(t1_paths["seeds"]))
    with pytest.raises(ValueError, match="rebucket_frontier"):
        SnapshotParquetStore(tmpdir_path, n_frontier_buckets=64)
    # default adoption still works
    assert SnapshotParquetStore(tmpdir_path).n_frontier_buckets == 16


def test_compact_appendlogs_mid_crawl_is_invisible(spark, t1_paths, tmpdir_path):
    from scrapy_products_tracker_spark.frontier.store import CommitConflictError

    seeds = spark.read.parquet(t1_paths["seeds"])
    control = SnapshotParquetStore(tmpdir_path + "/cc")
    d = _driver(spark, t1_paths, control)
    d.seed(seeds)
    d.run()
    expected = _snapshot(spark, control)

    store = SnapshotParquetStore(tmpdir_path + "/compact")
    d = _driver(spark, t1_paths, store)
    d.seed(seeds)
    for _ in range(3):
        assert d.run_round() is not None
    before = {
        k: sorted(r.asDict().items() for r in t.collect())
        for k, t in (
            ("results", store.read_results(spark)),
            ("crawl_order", store.read_crawl_order(spark)),
            ("history", store.read_history(spark)),
        )
        if t is not None
    }
    m = store.read_manifest()
    assert len(m["results"]) > 1  # one dir per round so far
    # stale OCC base refused (while there is still work to commit)
    with pytest.raises(CommitConflictError):
        store.compact_appendlogs(spark, expected_version=1)
    out = store.compact_appendlogs(spark, target_files=2)
    assert out is not None and out["compacted"]["results"]["dirs_before"] > 1
    m2 = store.read_manifest()
    assert len(m2["results"]) == 1 and len(m2["crawl_order"]) == 1
    # row sets byte-identical after compaction
    for k, want in before.items():
        got = sorted(
            r.asDict().items()
            for r in getattr(store, f"read_{k}")(spark).collect()
        )
        assert got == want, k
    # second compaction is a no-op (everything already single-dir)
    assert store.compact_appendlogs(spark) is None
    # resume and finish: crawl semantics untouched
    d2 = _driver(spark, t1_paths, SnapshotParquetStore(tmpdir_path + "/compact"))
    d2.run()
    got = _snapshot(spark, SnapshotParquetStore(tmpdir_path + "/compact"))
    assert got == expected
