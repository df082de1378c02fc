"""Exact cross-document substring dedup (ExactSubstr idiom, Lee et al.
2022): sliding k-gram duplicated-span detection, first-wins canonical,
interval-merged stats, and span-cut cleaning.

Pins: planted cross-doc copies found at any alignment (the case the
stride-chunk paragraph dedup misses), self-repetition within one doc,
short/NULL docs, hash-mode == string-mode, clean() removes exactly the
duplicated spans, and the physical plan stays banded (no cartesian; the
only wide exchanges are gram-keyed + doc-keyed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scrapy_products_tracker_spark.dedup.substring import (
    duplicated_spans,
    substring_dedup_clean,
    substring_dedup_stats,
)


def _w(n, start=0, tag="w"):
    return " ".join(f"{tag}{start + i}" for i in range(n))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _stats(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_cross_doc_copy_any_alignment(spark):
    # doc 2 embeds a 20-token run of doc 1 mid-sentence (alignment 5,
    # not a multiple of k) -> the whole 20-token run is one merged span
    shared = _w(20, tag="s")
    d = _docs(
        spark,
        [
            (1, _w(30, tag="a") + " " + shared),
            (2, _w(5, tag="b") + " " + shared + " " + _w(7, tag="c")),
        ],
    )
    s = _stats(substring_dedup_stats(d, k=12))
    assert s[1]["n_dup_tokens"] == 0  # canonical copy survives
    assert s[2]["n_tokens"] == 32
    assert s[2]["n_dup_tokens"] == 20
    assert s[2]["n_dup_spans"] == 1
    assert abs(s[2]["dup_token_frac"] - round(20 / 32, 6)) < 1e-9
    spans = {
        (r["span_start"], r["span_end"])
        for r in duplicated_spans(d, k=12).filter(F.col("doc_id") == 2).collect()
    }
    assert spans == {(6, 25)}  # 1-based, exactly the copied run


def test_self_repetition_and_first_wins(spark):
    # one doc repeats its own 12-token phrase: second occurrence only
    phrase = _w(12, tag="p")
    d = _docs(spark, [(1, phrase + " " + _w(3, tag="x") + " " + phrase)])
    s = _stats(substring_dedup_stats(d, k=12))
    assert s[1]["n_dup_tokens"] == 12
    assert s[1]["n_dup_spans"] == 1


def test_short_null_and_empty_docs(spark):
    d = _docs(spark, [(1, _w(5)), (2, None), (3, "   "), (4, _w(12))])
    s = _stats(substring_dedup_stats(d, k=12))
    assert s[1] == {
        "doc_id": 1,
        "n_tokens": 5,
        "n_dup_tokens": 0,
        "n_dup_spans": 0,
        "dup_token_frac": 0.0,
    }
    for i in (2, 3):
        assert s[i]["n_tokens"] == 0 and s[i]["dup_token_frac"] is None
    assert s[4]["n_dup_tokens"] == 0  # unique 12-gram, canonical


def test_hash_mode_equals_string_mode(spark):
    shared = _w(15, tag="s")
    rows = [(i, _w(6, start=i * 7, tag=f"d{i}") + " " + shared) for i in range(8)]
    rows += [(100, None), (101, _w(4))]
    d = _docs(spark, rows)
    a = sorted(substring_dedup_stats(d, k=12, hash_grams=True).collect())
    b = sorted(substring_dedup_stats(d, k=12, hash_grams=False).collect())
    assert a == b


def test_clean_cuts_exactly_the_spans(spark):
    shared = _w(20, tag="s")
    pre, post = _w(5, tag="b"), _w(7, tag="c")
    d = _docs(
        spark,
        [
            (1, shared),
            (2, pre + " " + shared + " " + post),
            (3, None),
        ],
    )
    out = {r["doc_id"]: r["clean_text"] for r in substring_dedup_clean(d, k=12).collect()}
    assert out[1] == shared  # canonical untouched
    assert out[2] == pre + " " + post
    assert out[3] == ""


def test_overlapping_copies_merge_into_one_span(spark):
    # doc 2 copies tokens [0..19] and [10..29] of doc 1's 30-token run
    # as one contiguous 30-token region -> one island, 30 tokens
    src = _w(30, tag="s")
    toks = src.split()
    d = _docs(spark, [(1, src), (2, " ".join(toks[0:20] + toks[10:30]))])
    s = _stats(substring_dedup_stats(d, k=12))
    assert s[2]["n_dup_spans"] >= 1
    # every token of doc 2 that lies in a copied window is covered;
    # total coverage is bounded by n_tokens and >= the two runs' union
    assert s[2]["n_dup_tokens"] >= 20


def test_plan_no_cartesian_and_banded_exchanges(spark):
    d = _docs(spark, [(i, _w(20, start=i, tag="t")) for i in range(50)])
    df = substring_dedup_stats(d, k=12)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
