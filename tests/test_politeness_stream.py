"""Streaming token-bucket admission (applyInPandasWithState): bucket
state (leftover tokens per domain) carries across micro-batches;
single cold batch equals the batch row-rank twin; rejected rows are
emitted, never dropped."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from scrapy_products_tracker_spark.streaming import (
    admission_stream,
    expected_admissions,
)

REQ_SCHEMA = T.StructType(
    [T.StructField("domain", T.StringType()), T.StructField("url", T.StringType())]
)


def _reqs(domain, n, start=0):
    return [(domain, f"https://{domain}/p{j:03d}") for j in range(start, start + n)]


def _drain(spark, src, out, ckpt, rate, burst):
    stream = admission_stream(
        spark.readStream.schema(REQ_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(src),
        rate=rate,
        burst=burst,
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_cold_batch_matches_rank_twin_and_reports_rejects(spark, tmpdir_path):
    src, out, ckpt = (tmpdir_path + s for s in ("/req", "/adm", "/ck"))
    rows = _reqs("d1", 5) + _reqs("d2", 2)
    spark.createDataFrame(rows, REQ_SCHEMA).coalesce(1).write.parquet(src + "/v1")
    got = _drain(spark, src, out, ckpt, rate=1, burst=3)
    assert got.count() == 7  # rejected rows are emitted too
    adm = {(r.domain, r.url): r.admitted for r in got.collect()}
    batch = spark.read.parquet(src + "/v1")
    want = {(r.domain, r.url): r.admitted for r in expected_admissions(batch, 3).collect()}
    assert adm == want
    assert sum(v for (d, _), v in adm.items() if d == "d1") == 3
    assert sum(v for (d, _), v in adm.items() if d == "d2") == 2
    # url-sorted admission: the three LOWEST d1 urls got in
    assert adm[("d1", "https://d1/p000")] == 1
    assert adm[("d1", "https://d1/p004")] == 0


def test_refill_state_across_incremental_drains(spark, tmpdir_path):
    src, out, ckpt = (tmpdir_path + s for s in ("/req2", "/adm2", "/ck2"))
    spark.createDataFrame(
        _reqs("d1", 5) + _reqs("d2", 2), REQ_SCHEMA
    ).coalesce(1).write.parquet(src + "/v1")
    _drain(spark, src, out, ckpt, rate=1, burst=3)
    # second drop: d1 exhausted (0 tokens) refills to 1 -> admits 1 of 3;
    # d2 had 1 leftover, refills to 2 -> admits both
    spark.createDataFrame(
        _reqs("d1", 3, start=10) + _reqs("d2", 2, start=10), REQ_SCHEMA
    ).coalesce(1).write.parquet(src + "/v2")
    _drain(spark, src, out, ckpt, rate=1, burst=3)
    rows = spark.read.parquet(out).collect()
    second = {
        (r.domain, r.url): (r.admitted, r.tokens_after)
        for r in rows
        if "/p01" in r.url
    }
    assert second[("d1", "https://d1/p010")] == (1, 0)
    assert second[("d1", "https://d1/p011")] == (0, 0)
    assert second[("d1", "https://d1/p012")] == (0, 0)
    assert second[("d2", "https://d2/p010")] == (1, 1)
    assert second[("d2", "https://d2/p011")] == (1, 0)


def test_admission_guards():
    with pytest.raises(ValueError):
        admission_stream(None, rate=-1, burst=3)
    with pytest.raises(ValueError):
        admission_stream(None, rate=1, burst=0)
