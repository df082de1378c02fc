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


def test_frontier_files_clustered_by_status(spark, tmpdir_path):
    """Frontier bucket files are physically clustered by (status,
    CLAIM_ORDER): the claim scan's `status = PENDING` filter then skips
    whole parquet row groups of finished rows via min/max stats — the
    at-scale I/O cut for a mature frontier. Pins both the full-rewrite
    and the dirty-bucket-delta write paths."""
    from pathlib import Path

    import pyarrow.parquet as pq

    def _assert_clustered(root, manifest):
        for rel in manifest["frontier"]["buckets"].values():
            for f in Path(root, rel).glob("*.parquet"):
                t = pq.read_table(
                    f, columns=["status", "priority", "depth", "discovered_seq"]
                )
                keys = list(
                    zip(
                        t["status"].to_pylist(),
                        t["priority"].to_pylist(),
                        t["depth"].to_pylist(),
                        t["discovered_seq"].to_pylist(),
                    )
                )
                assert keys == sorted(keys), f"{f} not status/claim-key clustered"

    store = SnapshotParquetStore(tmpdir_path, n_frontier_buckets=4)
    n = 400
    rows = [
        (
            f"https://d{i % 7}.example.com/p/{i}",
            (i * 2654435761) % (1 << 62),
            (i * 13) % 4,          # statuses deliberately interleaved
            (i * 31) % 11,         # priority
            (i * 17) % 5,          # depth
            (i * 101) % 997,       # discovered_seq
            0,
        )
        for i in range(n)
    ]
    schema = (
        "url string, url_hash long, status int, priority long, depth int, "
        "discovered_seq long, attempt int"
    )
    store.commit(spark.createDataFrame(rows, schema), meta={})
    _assert_clustered(tmpdir_path, store.read_manifest())

    # dirty-bucket delta: flip a slice of statuses; rewritten buckets
    # must come out re-clustered too
    upd = spark.createDataFrame(
        [(r[1], r[0], 3, 1) for r in rows[::5]],
        "url_hash long, url string, new_status int, new_attempt int",
    )
    store.commit(frontier_updates=upd, meta={})
    _assert_clustered(tmpdir_path, store.read_manifest())
    # and the data survived unchanged as a set
    got = store.read_frontier(spark).count()
    assert got == n


def test_frontier_clustered_row_groups_skippable(spark, tmpdir_path):
    """At-scale evidence for the clustered layout: with realistic
    multi-row-group bucket files (block size forced tiny here; 128 MB
    groups at scale), the (status, claim-key) sort makes most row
    groups status-homogeneous — their min>PENDING stats let the claim
    scan's `status = PENDING` pushed filter skip them outright."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from scrapy_products_tracker_spark.schemas import PENDING

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 4096)
    try:
        store = SnapshotParquetStore(tmpdir_path, n_frontier_buckets=2)
        n = 20000
        rows = [
            (
                f"https://d{i % 7}.example.com/p/{i}",
                (i * 2654435761) % (1 << 62),
                (i * 13) % 4,  # 1/4 PENDING(0), 3/4 terminal — a young frontier
                (i * 31) % 11,
                (i * 17) % 5,
                i,
                0,
            )
            for i in range(n)
        ]
        schema = (
            "url string, url_hash long, status int, priority long, depth int, "
            "discovered_seq long, attempt int"
        )
        store.commit(spark.createDataFrame(rows, schema), meta={})
        m = store.read_manifest()
        total = skippable = 0
        for rel in m["frontier"]["buckets"].values():
            for f in Path(tmpdir_path, rel).glob("*.parquet"):
                md = pq.ParquetFile(f).metadata
                sidx = next(
                    i for i in range(md.num_columns)
                    if md.row_group(0).column(i).path_in_schema == "status"
                )
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(sidx).statistics
                    total += 1
                    if st.min > PENDING:
                        skippable += 1
        assert total > 20  # the tiny block size really produced many groups
        # statuses are 3/4 non-pending; clustered layout must make the
        # bulk of groups skippable (boundary groups straddle runs)
        assert skippable / total > 0.5, (skippable, total)
        # and the filtered read is exact
        got = store.read_frontier(spark).filter(F.col("status") == PENDING).count()
        assert got == sum(1 for r in rows if r[2] == PENDING)
    finally:
        if old is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old)


def test_iceberg_sql_builders():
    # the production binding's SQL is pure string generation — testable
    # without the runtime jar the sandbox lacks. Semantics mirrored:
    # column-wise coalesce == frontier.merge.merge_status_updates;
    # bucket(url_hash) spec + status-leading sort == the parquet
    # store's layout (§3.4).
    from scrapy_products_tracker_spark.frontier import IcebergFrontierStore as I

    c = I.create_frontier_sql("cat.ns.frontier", n_buckets=64)
    assert "PARTITIONED BY (bucket(64, url_hash))" in c
    assert "'sort-order'='status ASC" in c
    assert "url_hash bigint" in c and "discovered_seq bigint" in c

    m = I.merge_updates_sql("cat.ns.frontier", "v_upd")
    assert "MERGE INTO cat.ns.frontier t USING v_upd s" in m
    assert "t.url_hash = s.url_hash AND t.url = s.url" in m
    assert "t.status = coalesce(s.new_status, t.status)" in m
    assert "t.attempt = coalesce(s.new_attempt, t.attempt)" in m
    assert "session" not in m
    ms = I.merge_updates_sql("cat.ns.frontier", "v_upd", with_session=True)
    assert "t.session = coalesce(s.new_session, t.session)" in ms

    i = I.merge_inserts_sql("cat.ns.frontier", "v_ins")
    assert "WHEN NOT MATCHED THEN INSERT *" in i and "MATCHED THEN UPDATE" not in i

    r = I.rollback_sql("cat", "cat.ns.frontier", 12345)
    assert r == "CALL cat.system.rollback_to_snapshot('cat.ns.frontier', 12345)"
    e = I.expire_snapshots_sql("cat", "cat.ns.frontier", "2026-01-01 00:00:00")
    assert "expire_snapshots" in e and "TIMESTAMP '2026-01-01 00:00:00'" in e


def test_iceberg_store_refuses_without_catalog(spark):
    import pytest

    from scrapy_products_tracker_spark.frontier import IcebergFrontierStore

    with pytest.raises(RuntimeError, match="not configured"):
        IcebergFrontierStore(spark, "nosuchcat", "crawl")
