"""Content-defined chunking (dedup/cdc.py).

Pins, in order: span bookkeeping (contiguous, size-bounded, byte-
complete), the sliding-window-kernel == reset-style-Gear equivalence
the module docstring argues (direct per-byte reference loop here, on
adversarial inputs), the resync property that makes CDC dedup work
(a prefix insertion only disturbs the head of the chunk stream),
content addressing (duplicate payloads -> identical chunk streams,
counted once by cdc_dedup_stats), and the map-only plan shape.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pytest

from scrapy_products_tracker_spark.dedup.cdc import (
    _chunk_spans,
    _window_hashes,
    cdc_chunks,
    cdc_dedup_stats,
    gear_table,
)

MIN, AVG, MAX = 64, 512, 2048
_M64 = (1 << 64) - 1


def _reference_spans(b: bytes, min_size=MIN, avg_size=AVG, max_size=MAX):
    """Textbook reset-style Gear CDC — the formulation the oracle
    builder also uses; the engine kernel must match it exactly."""
    gear = [int(x) for x in gear_table()]
    bits = avg_size.bit_length() - 1
    mask = ((1 << bits) - 1) << (64 - bits)
    h, start, spans = 0, 0, []
    for i, byte in enumerate(b):
        h = ((h << 1) + gear[byte]) & _M64
        ln = i - start + 1
        if (ln >= min_size and (h & mask) == 0) or ln == max_size:
            spans.append((start, ln))
            start, h = i + 1, 0
    if start < len(b):
        spans.append((start, len(b) - start))
    return spans


def _engine_spans(b: bytes, min_size=MIN, avg_size=AVG, max_size=MAX):
    arr = np.frombuffer(b, dtype=np.uint8)
    bits = avg_size.bit_length() - 1
    mask = np.uint64(((1 << bits) - 1) << (64 - bits))
    h = _window_hashes(arr, gear_table())
    cand = np.nonzero((h & mask) == np.uint64(0))[0]
    return _chunk_spans(len(b), cand, min_size, max_size)


def _payloads(n=40, seed=7):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ln = int(rng.integers(1, 9000))
        out.append(rng.integers(0, 256, size=ln, dtype=np.uint8).tobytes())
    # adversarial: short, window-edge, constant, periodic, max-run
    out += [
        b"",
        b"\x00",
        bytes(range(63)),
        bytes(range(64)),
        bytes(range(65)),
        b"\xab" * 10000,
        bytes([i % 7 for i in range(6000)]),
        b"x" * MAX * 3,
    ]
    return out


def test_kernel_equals_reset_style_gear():
    for b in _payloads():
        assert _engine_spans(b) == _reference_spans(b), len(b)


def test_span_bookkeeping():
    for b in _payloads():
        spans = _engine_spans(b)
        assert sum(ln for _, ln in spans) == len(b)
        pos = 0
        for k, (off, ln) in enumerate(spans):
            assert off == pos
            assert 1 <= ln <= MAX
            if k < len(spans) - 1:
                assert ln >= MIN  # only the tail may be short
            pos = off + ln


def test_resync_after_prefix_insertion():
    rng = np.random.default_rng(11)
    body = rng.integers(0, 256, size=20000, dtype=np.uint8).tobytes()
    shifted = b"\x01\x02\x03" + body

    def md5s(b):
        return [
            hashlib.md5(b[off : off + ln]).hexdigest()
            for off, ln in _engine_spans(b)
        ]

    a, b_ = md5s(body), md5s(shifted)
    # the first cut point downstream of the insertion is content-
    # determined, so all later chunks are byte-identical: the two
    # streams share their (long) suffix
    k = 0
    while k < min(len(a), len(b_)) and a[-1 - k] == b_[-1 - k]:
        k += 1
    assert k >= len(a) - 3, (len(a), len(b_), k)


def test_cdc_chunks_and_dedup_stats(spark):
    rng = np.random.default_rng(3)
    rows = [
        ("a", rng.integers(0, 256, size=5000, dtype=np.uint8).tobytes()),
        ("b", rng.integers(0, 256, size=700, dtype=np.uint8).tobytes()),
        ("c", None),
        ("d", b""),
    ]
    rows.append(("a2", rows[0][1]))  # exact duplicate payload
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    ch = cdc_chunks(df, min_size=MIN, avg_size=AVG, max_size=MAX)
    got = {
        r["image_id"]: r
        for r in ch.groupBy("image_id")
        .agg({"length": "sum", "*": "count"})
        .collect()
    }
    assert set(got) == {"a", "b", "a2"}  # null/empty emit nothing
    assert got["a"]["sum(length)"] == 5000
    # duplicate payload -> identical chunk stream
    a = sorted(
        (r["chunk_idx"], r["offset"], r["length"], r["chunk_md5"])
        for r in ch.where("image_id = 'a'").collect()
    )
    a2 = sorted(
        (r["chunk_idx"], r["offset"], r["length"], r["chunk_md5"])
        for r in ch.where("image_id = 'a2'").collect()
    )
    assert a == a2
    stats = cdc_dedup_stats(ch).collect()[0]
    assert stats["n_files"] == 3
    assert stats["total_bytes"] == 5000 + 700 + 5000
    assert stats["uniq_bytes"] == 5000 + 700  # a2's bytes counted once
    assert stats["dup_bytes"] == 5000


def test_chunking_is_map_only(spark):
    df = spark.createDataFrame(
        [("x", b"\x00" * 500)], "image_id string, bytes binary"
    )
    plan = cdc_chunks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_parameter_validation(spark):
    df = spark.createDataFrame([("x", b"abc")], "image_id string, bytes binary")
    with pytest.raises(ValueError):
        cdc_chunks(df, min_size=32)
    with pytest.raises(ValueError):
        cdc_chunks(df, avg_size=500)
    with pytest.raises(ValueError):
        cdc_chunks(df, min_size=4096, avg_size=512, max_size=2048)
