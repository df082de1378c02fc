import pyspark.sql.functions as F

from scrapy_products_tracker_spark.frontier import SnapshotParquetStore


def _df(spark, vals):
    return spark.createDataFrame([(v, v * 10) for v in vals], ["k", "v"])


def test_commit_read_roundtrip(spark, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path)
    assert store.latest_version() is None
    v1 = store.commit(_df(spark, [1, 2, 3]), meta={"round": 0, "counters": {}})
    assert v1 == 1 and store.latest_version() == 1
    got = {r["k"] for r in store.read_frontier(spark).collect()}
    assert got == {1, 2, 3}


def test_results_append_across_versions(spark, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path)
    store.commit(_df(spark, [1]), new_results=_df(spark, [10]), meta={})
    store.commit(_df(spark, [1, 2]), new_results=_df(spark, [20]), meta={})
    res = {r["k"] for r in store.read_results(spark).collect()}
    assert res == {10, 20}
    # time travel: v1 sees only the first append
    res1 = {r["k"] for r in store.read_results(spark, version=1).collect()}
    assert res1 == {10}


def test_rollback_pointer(spark, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path)
    store.commit(_df(spark, [1]), meta={})
    store.commit(_df(spark, [1, 2]), meta={})
    store.rollback(1)
    assert store.latest_version() == 1
    assert store.read_frontier(spark).count() == 1
    # a new commit after rollback continues from v3 (no clobber of v2 files)
    v = store.commit(_df(spark, [9]), meta={})
    assert v == 2 or v == 3  # version = rolled-back head + 1


def test_expire_snapshots_keeps_live_data(spark, tmpdir_path):
    store = SnapshotParquetStore(tmpdir_path)
    for i in range(5):
        store.commit(_df(spark, list(range(i + 1))), new_results=_df(spark, [i]), meta={})
    store.expire_snapshots(keep_last=2)
    assert store.read_frontier(spark).count() == 5
    res = {r["k"] for r in store.read_results(spark).collect()}
    assert res == {0, 1, 2, 3, 4}  # appended files are live in the head manifest
    assert store.read_manifest(1) is None  # old manifest gone


def test_commit_optimistic_concurrency(spark, tmpdir_path):
    """Iceberg-style lost-update guard: a commit whose base snapshot is
    stale must refuse the pointer flip; the winning snapshot stays
    intact and the loser's retry (fresh base) succeeds."""
    import pytest

    from scrapy_products_tracker_spark.frontier import CommitConflictError, SnapshotParquetStore

    store = SnapshotParquetStore(tmpdir_path + "/occ")
    fr = spark.createDataFrame(
        [("https://a.com/x", 1, "a.com", "0", 0, 0, 0, 0)],
        "url string, url_hash long, domain string, tier string, "
        "priority int, depth int, discovered_seq long, status int",
    ).withColumn("attempt", F.lit(0))
    v1 = store.commit(fr, meta={"round": 0})
    base = store.read_manifest()["version"]
    v2 = store.commit(fr, meta={"round": 1}, expected_version=base)  # wins
    with pytest.raises(CommitConflictError):
        store.commit(fr, meta={"round": 1}, expected_version=base)  # stale base
    assert store.latest_version() == v2
    assert store.read_manifest()["meta"]["round"] == 1
    # retry against the fresh base succeeds; the loser consumed a
    # version number (its claim placeholder is a GC-able orphan that
    # readers skip), so versions are unique, not contiguous
    v3 = store.commit(fr, meta={"round": 2}, expected_version=v2)
    assert store.latest_version() == v3 > v2
    assert store.read_manifest(v2 + 1) is None  # placeholder, not a snapshot
