"""Stateful streaming price-change detector (applyInPandasWithState):
state carries the last seen price per product across micro-batches;
emitted change events must equal the batch window-lag twin."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.schemas import PRODUCT_HISTORY_SCHEMA
from scrapy_products_tracker_spark.streaming import (
    expected_price_changes,
    price_change_stream,
    stream_history,
)


def _hist_rows(session, round_no, prices):
    ts = datetime.datetime(2026, 1, 1, session, 0, 0)
    return [
        (
            pid,
            f"https://d/p/{pid}",
            cents + 100 if cents is not None else None,
            cents,
            True,
            1,
            pid % 7,
            session,
            "USD",
            "each",
            round_no,
            ts,
        )
        for pid, cents in prices
    ]


@pytest.fixture()
def history_store(spark, tmpdir_path):
    # three "commits" of history snapshots, file-layout compatible with
    # the store's append tree (data/history/v*)
    v1 = _hist_rows(1, 1, [(1, 1000), (2, 500), (3, None), (4, 250)])
    v2 = _hist_rows(2, 5, [(1, 1200), (2, 500), (3, 900), (4, None)])
    v3 = _hist_rows(3, 9, [(1, 1200), (2, 450), (3, 900), (4, 300)])
    for i, rows in enumerate((v1, v2, v3), start=1):
        spark.createDataFrame(rows, PRODUCT_HISTORY_SCHEMA).coalesce(1).write.parquet(
            f"{tmpdir_path}/data/history/v{i}"
        )
    return tmpdir_path


def test_price_changes_match_batch_twin(spark, history_store, tmpdir_path):
    stream = price_change_stream(stream_history(spark, history_store))
    out = tmpdir_path + "/changes"
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", tmpdir_path + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    batch_hist = spark.read.parquet(f"{history_store}/data/history/v*")
    want = sorted(map(tuple, expected_price_changes(batch_hist).collect()))
    assert got == want
    # semantic spot-checks: p1 1000->1200, p2 500->450, p4 250->300
    # (the None snapshot between p4's prices must not reset state)
    by_pid = {(r[0], r[2], r[3]) for r in got}
    assert (1, 1000, 1200) in by_pid
    assert (2, 500, 450) in by_pid
    assert (4, 250, 300) in by_pid
    assert len(got) == 3  # and nothing else (p3 had one priced snapshot)


def test_state_survives_across_incremental_drains(spark, history_store, tmpdir_path):
    """Two AvailableNow drains with a new commit between them: the
    second drain must compare against state from the first (the
    always-on consumer semantic), not re-emit or miss changes."""
    out = tmpdir_path + "/changes2"
    ckpt = tmpdir_path + "/ckpt2"

    def drain():
        q = (
            price_change_stream(stream_history(spark, history_store))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n_first = spark.read.parquet(out).count()
    assert n_first == 3
    # new session: p2 changes again, p1 stays
    v4 = _hist_rows(4, 12, [(1, 1200), (2, 400)])
    spark.createDataFrame(v4, PRODUCT_HISTORY_SCHEMA).coalesce(1).write.parquet(
        f"{history_store}/data/history/v4"
    )
    drain()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4  # exactly one new event
    new = [r for r in rows if r["session"] == 4]
    assert len(new) == 1 and new[0]["product_id"] == 2
    assert (new[0]["prev_cents"], new[0]["new_cents"]) == (450, 400)
