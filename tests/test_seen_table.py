"""The at-scale seen-set + frontier-store contracts (VERDICT r01 #1/#2):

- seen-table build / probe / delta-merge never materialize shard state
  on the driver (no DataFrame.collect / toPandas anywhere in the path),
- a round's commit rewrites only the dirty frontier buckets and dirty
  seen shards; clean ones carry forward by file reference,
- the exact-confirm anti-join can read only the candidates' buckets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.dedup import BloomTable, CuckooTable
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore, frontier_bucket_col

PARAMS = {"n_buckets": 8, "bits": 16384, "k": 5}


def _urls(spark, prefix, n):
    return spark.createDataFrame([(f"https://d/{prefix}/{i}",) for i in range(n)], ["url"])


def test_bloom_table_never_touches_driver(spark, tmpdir_path, monkeypatch):
    """Build, probe, and delta-merge must run without any Python-side
    materialization: shard payloads live in parquet and move executor
    to executor only. (The store's dirty-bucket bookkeeping collects a
    handful of bucket *ids* — never payloads — and is tested below.)"""

    def _boom(self, *a, **k):  # pragma: no cover - should never fire
        raise AssertionError("driver materialization in seen-set path")

    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "toPandas", _boom)

    base = _urls(spark, "a", 400)
    shards = BloomTable.build_shards_df(base, "url", **PARAMS)
    shards.write.mode("overwrite").parquet(tmpdir_path + "/s1")
    table = BloomTable(spark, [tmpdir_path + "/s1"], PARAMS)

    marked = table.mark(_urls(spark, "a", 500))
    assert marked.filter(F.col("_maybe_seen")).count() >= 400  # no false negatives

    delta = table.delta_df(_urls(spark, "b", 100))
    BloomTable.merge_shards(table.shards_df(), delta).write.mode("overwrite").parquet(
        tmpdir_path + "/s2"
    )
    t2 = BloomTable(spark, [tmpdir_path + "/s2"], PARAMS)
    assert t2.mark(_urls(spark, "b", 100)).filter(F.col("_maybe_seen")).count() == 100


def test_cuckoo_table_probe_delta_delete(spark, tmpdir_path):
    params = CuckooTable.params_for_capacity(5000, n_shards=4)
    a = _urls(spark, "a", 1000)
    b = _urls(spark, "b", 300)
    CuckooTable.build_shards_df(a, "url", params["n_shards"], params["n_buckets"]).write.parquet(
        tmpdir_path + "/c1"
    )
    t1 = CuckooTable(spark, [tmpdir_path + "/c1"], params)
    assert t1.count == 1000
    assert t1.mark(a).filter(F.col("_maybe_seen")).count() == 1000  # no false negatives
    fp = t1.mark(b).filter(F.col("_maybe_seen")).count()
    assert fp / 300 < 0.05  # 16-bit fingerprints -> tiny FPR

    t1.merge_shards(t1.shards_df(), t1.delta_df(b)).write.parquet(tmpdir_path + "/c2")
    t2 = CuckooTable(spark, [tmpdir_path + "/c2"], params)
    assert t2.count == 1300
    assert t2.mark(b).filter(F.col("_maybe_seen")).count() == 300

    # deletion (the capability Bloom lacks; O5/O6 rollback semantics)
    t2.merge_shards(t2.shards_df(), t2.delta_df(b), op="delete").write.parquet(
        tmpdir_path + "/c3"
    )
    t3 = CuckooTable(spark, [tmpdir_path + "/c3"], params)
    assert t3.count == 1000
    assert t3.mark(a).filter(F.col("_maybe_seen")).count() == 1000


def _frontier_df(spark, urls_status):
    rows = spark.createDataFrame(urls_status, ["url", "status"])
    return rows.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        F.col("status").cast("int"),
        F.lit(0).cast("int").alias("attempt"),
    )


def test_dirty_bucket_commit_reuses_clean_buckets(spark, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path, n_frontier_buckets=8)
    base = _frontier_df(spark, [(f"https://d/p/{i}", 0) for i in range(200)])
    store.commit(base, meta={})
    m1 = store.read_manifest()
    assert m1["frontier"]["n_buckets"] == 8 and len(m1["frontier"]["buckets"]) == 8

    # update exactly one row -> exactly that row's bucket is rewritten
    one = base.limit(1).select(
        "url_hash", "url", F.lit(2).alias("new_status"), F.lit(1).alias("new_attempt")
    )
    store.commit(frontier_updates=one, meta={})
    m2 = store.read_manifest()
    changed = {
        b for b in m2["frontier"]["buckets"]
        if m2["frontier"]["buckets"][b] != m1["frontier"]["buckets"][b]
    }
    assert len(changed) == 1
    assert m2["meta"]["dirty_frontier_buckets"] == 1
    # content is the full MERGE result
    fr = store.read_frontier(spark)
    assert fr.count() == 200
    assert fr.filter(F.col("status") == 2).count() == 1

    # inserts land in their buckets only
    ins = _frontier_df(spark, [("https://d/new/1", 0)])
    store.commit(frontier_inserts=ins, meta={})
    m3 = store.read_manifest()
    assert store.read_frontier(spark).count() == 201
    changed3 = {
        b for b in m3["frontier"]["buckets"]
        if m3["frontier"]["buckets"][b] != m2["frontier"]["buckets"][b]
    }
    assert len(changed3) == 1


def test_read_frontier_buckets_prunes(spark, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path, n_frontier_buckets=8)
    base = _frontier_df(spark, [(f"https://d/p/{i}", 0) for i in range(64)])
    store.commit(base, meta={})
    one = base.limit(1).collect()[0]
    bucket = one["url_hash"] & 7
    sub = store.read_frontier_buckets(spark, [bucket])
    got = {r["url"] for r in sub.collect()}
    assert one["url"] in got
    full = store.read_frontier(spark).withColumn(
        "fb", frontier_bucket_col(F.col("url_hash"), 8)
    )
    expect = {r["url"] for r in full.filter(F.col("fb") == bucket).collect()}
    assert got == expect and len(got) < 64


def test_seen_state_rolls_back_with_snapshot(spark, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path, n_frontier_buckets=8)
    a = _frontier_df(spark, [(f"https://d/a/{i}", 0) for i in range(100)])
    shards = BloomTable.build_shards_df(a, "url", **PARAMS)
    v1 = store.commit(a, seen_build=("bloom", PARAMS, shards), meta={})
    b = _frontier_df(spark, [(f"https://d/b/{i}", 0) for i in range(50)])
    t = store.read_seen(spark)
    store.commit(frontier_inserts=b, seen_delta=t.delta_df(b), meta={})
    t2 = store.read_seen(spark)
    assert t2.mark(b).filter(F.col("_maybe_seen")).count() == 50
    store.rollback(v1)
    t1 = store.read_seen(spark)
    # pre-delta snapshot must not know the b-urls (minus bloom FPs)
    assert t1.mark(b).filter(F.col("_maybe_seen")).count() < 5
