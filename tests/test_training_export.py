"""Crawl store -> curated WebDataset shards (imaging/training_export):
the end-to-end north-rule composition. Pins: shards on disk parse back
to exactly the curated id set with byte-identical payloads + captions,
the manifest md5s match the files, re-export is byte-identical
(deterministic retry), and near-dup pruning shrinks the member set."""

from __future__ import annotations

import glob
import hashlib

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
from scrapy_products_tracker_spark.imaging.dataset import curate
from scrapy_products_tracker_spark.imaging.training_export import export_training_shards
from scrapy_products_tracker_spark.imaging.wds import read_wds_shards
from scrapy_products_tracker_spark.politeness import load_robots


@pytest.fixture(scope="module")
def crawled(spark, t1_paths, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("texport"))
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
    return store


def test_export_roundtrips_curated_rows(spark, crawled, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards"))
    man = export_training_shards(
        spark, crawled, out, budget_bytes=64 * 1024
    ).collect()
    assert man, "no shards exported"
    files = sorted(glob.glob(out + "/shard-*.tar"))
    assert len(files) == len(man)
    # manifest md5s match the bytes on disk
    by_path = {r["path"]: r for r in man}
    for f in files:
        data = open(f, "rb").read()
        assert by_path[f]["tar_md5"] == hashlib.md5(data).hexdigest()
        assert by_path[f]["tar_bytes"] == len(data)
    # parse back and compare against the curated set computed directly
    shards_df = spark.createDataFrame(
        [(i, open(f, "rb").read()) for i, f in enumerate(files)],
        "shard_id int, tar_bytes binary",
    )
    back = read_wds_shards(shards_df).collect()
    res = crawled.read_results(spark).filter(
        F.col("decode_ok") & F.col("bytes").isNotNull()
    )
    want = {
        r["image_id"]: (bytes(r["bytes"]), r["caption"])
        for r in curate(res).select("image_id", "bytes", "caption").collect()
    }
    got = {r["image_id"]: (bytes(r["payload"]), r["caption"]) for r in back}
    assert got == want
    assert sum(r["n_samples"] for r in man) == len(want)


def test_export_is_deterministic(spark, crawled, tmp_path_factory):
    out1 = str(tmp_path_factory.mktemp("shards1"))
    out2 = str(tmp_path_factory.mktemp("shards2"))
    m1 = export_training_shards(spark, crawled, out1, budget_bytes=64 * 1024).collect()
    m2 = export_training_shards(spark, crawled, out2, budget_bytes=64 * 1024).collect()
    assert [(r["shard_id"], r["tar_md5"], r["n_samples"]) for r in m1] == [
        (r["shard_id"], r["tar_md5"], r["n_samples"]) for r in m2
    ]


def test_export_neardup_prunes(spark, crawled, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards_nd"))
    base = export_training_shards(
        spark, crawled, str(tmp_path_factory.mktemp("shards_b")), budget_bytes=64 * 1024
    ).collect()
    pruned = export_training_shards(
        spark, crawled, out, budget_bytes=64 * 1024, phash_neardup=True,
        neardup_threshold=7,  # max exact threshold for the default 8 bands
    ).collect()
    assert sum(r["n_samples"] for r in pruned) <= sum(r["n_samples"] for r in base)


def test_incremental_export_publishes_only_new_shards(spark, crawled, tmp_path_factory):
    """VERDICT r03 #8: a second incremental run over an appended store
    publishes ONLY new-shard files (numbered after the published set,
    run-1 tars byte-untouched, members disjoint), and a third run with
    nothing new publishes nothing."""
    out = str(tmp_path_factory.mktemp("inc"))
    kw = dict(budget_bytes=64 * 1024, incremental=True)
    # run 1: mid-crawl snapshot (seeds the bookkeeping = full export)
    m1 = export_training_shards(spark, crawled, out, version=4, **kw).collect()
    assert m1, "mid-crawl snapshot must already have results"
    files1 = {
        f: hashlib.md5(open(f, "rb").read()).hexdigest()
        for f in glob.glob(out + "/shard-*.tar")
    }
    # run 2: the store has appended more results since -> a delta
    m2 = export_training_shards(spark, crawled, out, **kw).collect()
    assert m2, "appended store must produce a delta"
    for f, md5 in files1.items():  # delivered tars are immutable
        assert hashlib.md5(open(f, "rb").read()).hexdigest() == md5
    ids1 = {r["shard_id"] for r in m1}
    ids2 = {r["shard_id"] for r in m2}
    assert not ids1 & ids2
    assert min(ids2) == max(ids1) + 1
    assert len(glob.glob(out + "/shard-*.tar")) == len(ids1) + len(ids2)

    def members(manifest_rows):
        df = spark.createDataFrame(
            [(int(r["shard_id"]), open(r["path"], "rb").read()) for r in manifest_rows],
            "shard_id int, tar_bytes binary",
        )
        return {
            r["image_id"]: hashlib.md5(bytes(r["payload"])).hexdigest()
            for r in read_wds_shards(df).collect()
        }

    mem1, mem2 = members(m1), members(m2)
    assert not set(mem1) & set(mem2), "a published member must never re-ship"
    # cross-set exact dedup held: no payload published twice under two ids
    assert not set(mem1.values()) & set(mem2.values())
    # run 3: nothing new appended -> empty delta, no new files
    m3 = export_training_shards(spark, crawled, out, **kw).collect()
    assert m3 == []
    assert len(glob.glob(out + "/shard-*.tar")) == len(ids1) + len(ids2)
