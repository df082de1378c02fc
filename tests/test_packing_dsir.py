"""pack_sequences (LM concat-and-chunk) + dsir_importance scoring."""

import math

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions.text import dsir_importance, pack_sequences

DOC_SCHEMA = "doc_id long, text string"


def test_pack_sequences_exact(spark):
    rows = [
        (1, "a b c"),        # 3 + eos = 4 tokens: stream [0, 4)
        (2, "d e f g h"),    # 5 + 1 = 6: [4, 10)
        (3, ""),             # 0 + 1 = 1: [10, 11)
        (4, None),           # 0 + 1 = 1: [11, 12)
        (5, "i j"),          # 2 + 1 = 3: [12, 15)
    ]
    out = {
        r["id"]: r.asDict()
        for r in pack_sequences(
            spark.createDataFrame(rows, DOC_SCHEMA), seq_len=8
        ).collect()
    }
    assert (out[1]["tok_before"], out[1]["first_seq"], out[1]["last_seq"]) == (0, 0, 0)
    # doc 2 spans the seq boundary at token 8
    assert (out[2]["tok_before"], out[2]["first_seq"], out[2]["last_seq"]) == (4, 0, 1)
    assert (out[3]["tok_before"], out[3]["n_tokens"]) == (10, 1)
    assert out[4]["n_tokens"] == 1  # NULL text = EOS only
    assert (out[5]["first_seq"], out[5]["last_seq"]) == (1, 1)


def test_pack_sequences_two_phase_equals_global(spark):
    rows = [(i, " ".join(["t"] * (i % 7 + 1))) for i in range(100)]
    df = spark.createDataFrame(rows, DOC_SCHEMA).withColumn(
        "rng", F.format_string("%02d", F.expr("div(doc_id, 10)"))
    )
    flat = pack_sequences(df, seq_len=16).orderBy("id").collect()
    ranged = pack_sequences(df, seq_len=16, range_col="rng").orderBy("id").collect()
    assert [r.asDict() for r in flat] == [r.asDict() for r in ranged]


def test_pack_sequences_guard(spark):
    df = spark.createDataFrame([(1, "x")], DOC_SCHEMA)
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)


def test_dsir_scores_match_pure_python(spark):
    rows = [
        (1, "en", "the quick brown fox jumps"),
        (2, "en", "the lazy dog sleeps"),
        (3, "xx", "zork blit quux flarp"),
        (4, "xx", "the zork returns quickly"),
        (5, "en", None),  # empty doc: score 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    B = 64
    out = {
        r["id"]: r.asDict()
        for r in dsir_importance(df, F.col("lang") == "en", n_buckets=B).collect()
    }
    # independent recompute: same pinned xxhash64, pure-Python math
    from scrapy_products_tracker_spark.functions.hashing import xxhash64_str

    toks = []
    for did, lang, text in rows:
        for t in (text or "").split():
            toks.append((did, lang == "en", xxhash64_str(t) % B))
    cr, ct = {}, {}
    for _, tgt, b in toks:
        cr[b] = cr.get(b, 0) + 1
        if tgt:
            ct[b] = ct.get(b, 0) + 1
    nr, nt = len(toks), sum(1 for _, tgt, _ in toks if tgt)
    score = {
        b: round(
            (math.log((ct.get(b, 0) + 1) / (nt + B)) - math.log((cr[b] + 1) / (nr + B)))
            * 1_000_000
        )
        for b in cr
    }
    for did, _, text in rows:
        want = sum(score[xxhash64_str(t) % B] for t in (text or "").split())
        assert out[did]["score_unats"] == want, did
    assert out[5] == {"id": 5, "n_tokens": 0, "score_unats": 0}
    # direction: pure-target vocab scores above pure-raw-only vocab
    assert out[1]["score_unats"] > out[3]["score_unats"]


def test_dsir_broadcast_plan(spark):
    df = spark.createDataFrame([(1, "en", "a b"), (2, "xx", "c")],
                               "doc_id long, lang string, text string")
    plan = (
        dsir_importance(df, F.col("lang") == "en", n_buckets=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # score table joins broadcast
    assert "CartesianProduct" not in plan


def test_perplexity_buckets_cuts_and_ties(spark):
    """CCNet 30/40/30 split on the quantized grid: exact cut semantics
    (smallest grid score whose cumulative count reaches the permille
    target), tie-never-split, per-group independence, and the scale
    shape (cuts broadcast back; no sort-merge join)."""
    from scrapy_products_tracker_spark.functions.text import perplexity_buckets

    # lang A: scores 1..10 (one doc each) -> head {1,2,3}, middle {4..7}
    # lang B: all ties at 5 -> one grid point, everything 'head'
    rows = [(i, 1000, i * 1_000_000, "A") for i in range(1, 11)]
    rows += [(100 + j, 1000, 5_000_000, "B") for j in range(4)]
    df = spark.createDataFrame(rows, "doc long, n_bigrams long, nll_unats long, lang string")
    out = perplexity_buckets(df, group_col="lang")
    got = {(r["lang"], r["doc"]): (r["score_mq"], r["bucket"]) for r in out.collect()}
    for i in range(1, 11):
        want = "head" if i <= 3 else ("middle" if i <= 7 else "tail")
        assert got[("A", i)] == (i, want), (i, got[("A", i)])
    for j in range(4):
        assert got[("B", 100 + j)] == (5, "head")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan
