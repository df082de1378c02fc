"""WARC shard sink/source (crawl/warc.py): deterministic bytes,
Content-Length-framed parsing (bodies containing CRLFCRLF survive),
offset-accurate member index (random access), hostile-input tolerance.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl.warc import (
    _parse_warc,
    read_warc_shards,
    warc_member_index,
    write_warc_shards,
)

ROWS = [
    ("https://a.test/1", 200, b"hello world"),
    ("https://a.test/2", 404, b""),
    ("https://a.test/3", 200, b"binary\r\n\r\nWARC/1.0\r\nfake header inside body"),
    ("https://b.test/1", 200, bytes(range(256)) * 4),
    ("https://b.test/2", 500, None),
]


def _input(spark, rows=ROWS):
    return spark.createDataFrame(
        rows, "url string, status_code int, body binary"
    ).withColumn("rng", F.substring("url", 9, 6))


def test_roundtrip_bodies_and_digests(spark):
    shards = write_warc_shards(_input(spark), budget_bytes=300, range_col="rng")
    back = {r["url"]: r for r in read_warc_shards(shards).collect()}
    assert set(back) == {u for u, _, _ in ROWS}
    for url, status, body in ROWS:
        r = back[url]
        assert r["status"] == status
        assert bytes(r["body"]) == (body or b"")
        assert r["digest_ok"] == 1
        assert r["warc_date"] == "2026-01-01T00:00:00Z"
    # small budget -> multiple shards
    assert shards.count() > 1


def test_shard_bytes_deterministic_across_partitionings(spark):
    a = write_warc_shards(_input(spark), budget_bytes=300, range_col="rng")
    b = write_warc_shards(
        _input(spark, list(reversed(ROWS))).repartition(7),
        budget_bytes=300,
        range_col="rng",
    )
    da = {r["shard_id"]: hashlib.md5(bytes(r["warc_bytes"])).hexdigest() for r in a.collect()}
    db = {r["shard_id"]: hashlib.md5(bytes(r["warc_bytes"])).hexdigest() for r in b.collect()}
    assert da == db


def test_member_index_random_access(spark):
    """members offsets/lengths slice out exactly one reparseable record
    — the random-access contract a CDX-style fetcher relies on."""
    shards = write_warc_shards(_input(spark), budget_bytes=10**9)
    blob = {r["shard_id"]: bytes(r["warc_bytes"]) for r in shards.collect()}
    idx = warc_member_index(shards).collect()
    assert len(idx) == len(ROWS)
    for m in idx:
        rec = blob[m["shard_id"]][m["offset"] : m["offset"] + m["length"]]
        parsed = list(_parse_warc(rec))
        assert len(parsed) == 1
        h = parsed[0]["headers"]
        assert h["warc-target-uri"] == m["url"]
        assert h["warc-payload-digest"] == "sha1:" + m["digest"]


def test_hostile_bytes_never_raise(spark):
    shards = spark.createDataFrame(
        [
            (0, b"not a warc at all"),
            (1, None),
            (2, b"WARC/1.0\r\nContent-Length: oops\r\n\r\n"),
        ],
        "shard_id int, warc_bytes binary",
    )
    assert read_warc_shards(shards).count() == 0


def test_truncated_shard_parses_prefix(spark):
    full = write_warc_shards(_input(spark), budget_bytes=10**9)
    blob = bytes(full.collect()[0]["warc_bytes"])
    cut = spark.createDataFrame(
        [(0, blob[: len(blob) - 10])], "shard_id int, warc_bytes binary"
    )
    n = read_warc_shards(cut).count()
    assert 0 < n < len(ROWS)  # prefix records survive, tail dropped


def test_warcinfo_record_leads_and_is_skipped(spark):
    shards = write_warc_shards(_input(spark), budget_bytes=10**9)
    blob = bytes(shards.collect()[0]["warc_bytes"])
    recs = list(_parse_warc(blob))
    assert recs[0]["headers"]["warc-type"] == "warcinfo"
    assert len(recs) == len(ROWS) + 1
    # reader yields only responses
    assert read_warc_shards(shards).count() == len(ROWS)


def test_header_injection_neutralized(spark):
    """A hostile frontier URL carrying CR/LF must not inject header
    lines into the CRLF-framed record: control bytes are percent-
    encoded in both the header block and the member index, the record
    still parses, and no attacker-chosen header appears."""
    evil = "https://a.test/x\r\nWARC-Date: 1999-01-01T00:00:00Z\r\nX-Evil: 1"
    df = spark.createDataFrame(
        [(evil, 200, b"payload")], "url string, status_code int, body binary"
    )
    shards = write_warc_shards(df, budget_bytes=10**9)
    row = shards.collect()[0]
    recs = [r for r in _parse_warc(bytes(row["warc_bytes"]))
            if r["headers"]["warc-type"] == "response"]
    assert len(recs) == 1
    h = recs[0]["headers"]
    assert "x-evil" not in h
    assert h["warc-date"] == "2026-01-01T00:00:00Z"  # caller's date, not injected
    safe = "https://a.test/x%0D%0AWARC-Date: 1999-01-01T00:00:00Z%0D%0AX-Evil: 1"
    assert h["warc-target-uri"] == safe
    # member index carries the SAME sanitized url -> roundtrip consistent
    assert row["members"][0]["url"] == safe
    back = read_warc_shards(shards).collect()[0]
    assert back["url"] == safe and back["digest_ok"] == 1


def test_bad_caller_date_falls_back(spark):
    df = spark.createDataFrame(
        [("https://a.test/1", 200, b"x")], "url string, status_code int, body binary"
    )
    shards = write_warc_shards(df, budget_bytes=10**9, date="evil\r\nX-Evil: 1")
    rec = read_warc_shards(shards).collect()[0]
    assert rec["warc_date"] == "1970-01-01T00:00:00Z" and rec["digest_ok"] == 1
