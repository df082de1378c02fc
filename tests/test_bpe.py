"""BPE trainer + segmenter: hand-computable merge dynamics, the
deterministic tie-break, early stop, and the Arrow segment kernel
(incl. NULL/blank rows). The sf-scale parity vs the independent
pure-Python trainer is the `bpe_train_merges` / `bpe_segment_tokens`
oracle pair."""

from __future__ import annotations

from scrapy_products_tracker_spark.functions.bpe import bpe_segment, bpe_train, word_histogram


def test_bpe_train_hand_example(spark):
    df = spark.createDataFrame(
        [(1, "ab ab ab"), (2, "abc abc"), (3, "bc")], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train(df, n_merges=5).orderBy("rank").collect()]
    # round 0: (a,b) count 5 beats (b,c) count 3; round 1: (ab,c) count 2;
    # round 2: only (b,c)=1 < min_pair_count -> early stop
    assert got == [(0, "a", "b", 5), (1, "ab", "c", 2)]


def test_bpe_train_tie_breaks_lexicographic(spark):
    df = spark.createDataFrame([(1, "cd ab cd ab")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=1).orderBy("rank").collect()]
    assert got == [(0, "a", "b", 2)]  # (a,b) and (c,d) both 2 -> lexicographic


def test_bpe_train_nonoverlapping_rewrite(spark):
    # 'aaaa' x2: round 0 pair (a,a) counts 3 adjacencies x2 words = 6;
    # rewrite left-to-right non-overlapping -> (aa, aa);
    # round 1: (aa,aa) count 2
    df = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=2).orderBy("rank").collect()]
    assert got == [(0, "a", "a", 6), (1, "aa", "aa", 2)]


def test_word_histogram_null_blank(spark):
    df = spark.createDataFrame(
        [(1, "x y x"), (2, None), (3, "   ")], "doc_id long, text string"
    )
    got = {r["word"]: r["count"] for r in word_histogram(df).collect()}
    assert got == {"x": 2, "y": 1}


def test_bpe_segment_kernel(spark):
    df = spark.createDataFrame(
        [(1, "abc ab b"), (2, None), (3, "  "), (4, "zzz")],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["tokens"], r["n_bpe_tokens"])
        for r in bpe_segment(df, [("a", "b"), ("ab", "c")]).collect()
    }
    assert got[1] == (["abc", "ab", "b"], 3)
    assert got[2] == ([], 0)
    assert got[3] == ([], 0)
    assert got[4] == (["z", "z", "z"], 3)


def test_bpe_segment_matches_training_pieces(spark):
    """Self-consistency: tokenizing the training words with the learned
    merge table reproduces the trainer's merge dynamics (token counts
    shrink monotonically with more merges, and segmenting with ALL
    merges yields the same tokens the trainer's folds produced)."""
    rows = [(i, t) for i, t in enumerate(["low lower lowest"] * 3 + ["newest new"] * 2)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [
        (r["left"], r["right"]) for r in bpe_train(df, n_merges=6).orderBy("rank").collect()
    ]
    n_full = {r["id"]: r["n_bpe_tokens"] for r in bpe_segment(df, merges).collect()}
    n_half = {r["id"]: r["n_bpe_tokens"] for r in bpe_segment(df, merges[:3]).collect()}
    n_none = {r["id"]: r["n_bpe_tokens"] for r in bpe_segment(df, []).collect()}
    for i in n_full:
        assert n_full[i] <= n_half[i] <= n_none[i]
    assert any(n_full[i] < n_none[i] for i in n_full)


# --- WordPiece (functions/wordpiece.py) -----------------------------------


def test_wordpiece_likelihood_beats_raw_count(spark):
    from scrapy_products_tracker_spark.functions.wordpiece import wordpiece_train

    # (a,##b) count 3 but score 3e15/(3*3); (x,##z) count 2, score
    # 2e15/(2*2) — likelihood picks the rarer-but-exclusive pair first
    # (raw-count BPE would do the opposite), then (a,##b), then stops.
    df = spark.createDataFrame([(1, "ab ab ab xz xz")], "doc_id long, text string")
    got = [tuple(r) for r in wordpiece_train(df, n_merges=5).orderBy("rank").collect()]
    assert got == [
        (0, "x", "##z", 2, 500_000_000_000_000),
        (1, "a", "##b", 3, 333_333_333_333_333),
    ]


def test_wordpiece_merged_name_strips_continuation(spark):
    from scrapy_products_tracker_spark.functions.wordpiece import (
        wordpiece_train,
        wordpiece_vocab,
    )

    df = spark.createDataFrame([(1, "abc abc")], "doc_id long, text string")
    m = wordpiece_train(df, n_merges=2)
    rows = [tuple(r)[:3] for r in m.orderBy("rank").collect()]
    # round 0 ties (a,##b) vs (##b,##c) on score+count -> lexicographic
    # '##b' < 'a'; merged name '##bc' keeps the continuation prefix
    assert rows == [(0, "##b", "##c"), (1, "a", "##bc")]
    assert wordpiece_vocab(df, m) == ["##b", "##bc", "##c", "a", "abc"]


def test_wordpiece_segment_greedy_and_unk(spark):
    from scrapy_products_tracker_spark.functions.wordpiece import wordpiece_segment

    vocab = ["a", "ab", "##b", "##bc", "##c", "x", "##z", "xz"]
    df = spark.createDataFrame(
        [(1, "abc ab xz abxz q"), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    got = {r.id: (r.tokens, r.n_wp_tokens) for r in wordpiece_segment(df, vocab).collect()}
    # 'abc' -> greedy longest 'ab' + '##c' (not 'a'+'##bc');
    # 'abxz' -> 'ab' then no '##x...' piece -> whole word [UNK]
    assert got[1] == (["ab", "##c", "ab", "xz", "[UNK]", "[UNK]"], 6)
    assert got[2] == ([], 0)
    assert got[3] == ([], 0)


def test_wordpiece_early_stop_and_guards(spark):
    import pytest

    from scrapy_products_tracker_spark.functions.wordpiece import wordpiece_train

    df = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    assert wordpiece_train(df, n_merges=3).count() == 0  # all pairs count 1 < 2
    with pytest.raises(ValueError):
        wordpiece_train(df, n_merges=0)


def test_wordpiece_hapax_pair_does_not_halt_training(spark):
    # One hapax word ('qv') whose pair (q,##v) is seen once between two
    # hapax pieces — it scores the maximum 10^15 under likelihood, but
    # must be FILTERED by min_pair_count, not crowned winner and then
    # used to halt training: the frequent (a,##b) merge must still be
    # learned (the round-4 bug produced zero merges here).
    from scrapy_products_tracker_spark.functions.wordpiece import wordpiece_train

    df = spark.createDataFrame(
        [(1, "ab ab ab qv")], "doc_id long, text string"
    )
    got = [tuple(r) for r in wordpiece_train(df, n_merges=3).orderBy("rank").collect()]
    assert got == [(0, "a", "##b", 3, 333_333_333_333_333)]

    # the independent oracle trainer must agree
    import pandas as pd

    from scrapy_products_tracker_spark.oracle.builders import _py_wordpiece_train

    rows, _ = _py_wordpiece_train(pd.DataFrame({"text": ["ab ab ab qv"]}), 3)
    assert [
        (r["rank"], r["left"], r["right"], r["pair_count"], r["score_femto"])
        for r in rows
    ] == got
