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
