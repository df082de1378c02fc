"""Unigram-LM tokenizer (functions/unigram.py): Viterbi tie rules,
training determinism under repartitioning, char-floor guarantees,
hostile inputs."""

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions.unigram import (
    UNK_SCORE,
    unigram_segment,
    unigram_train,
    viterbi_tokens,
)


def test_viterbi_prefers_higher_score():
    scores = {"a": -10, "b": -10, "ab": -5}
    assert viterbi_tokens("ab", scores, 4) == ["ab"]  # -5 beats -20


def test_viterbi_tie_prefers_fewer_tokens():
    scores = {"a": -5, "b": -5, "ab": -10}
    # "ab" sums to -10 either way; the single piece wins the tie
    assert viterbi_tokens("ab", scores, 4) == ["ab"]


def test_viterbi_tie_prefers_lexicographic():
    # two 2-token splits with equal sums: ("ab","cd") vs ("abc","d")
    scores = {"ab": -5, "cd": -5, "abc": -5, "d": -5}
    assert viterbi_tokens("abcd", scores, 4) == ["ab", "cd"]


def test_viterbi_unk_floor():
    # 'x' is out of vocab: segments as a single char at UNK_SCORE,
    # never fails, and in-vocab neighbors still win their spans
    scores = {"ab": -5}
    assert viterbi_tokens("xab", scores, 4) == ["x", "ab"]
    assert UNK_SCORE < -10_000_000


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "the cat sat on the mat " * 3) for i in range(6)] + [
        (100 + i, "a tokenizer tokenizes tokens " * 2) for i in range(6)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_deterministic_under_partitioning(spark, corpus):
    v1 = unigram_train(corpus, vocab_size=40, n_iters=2, max_piece_len=3).collect()
    v2 = unigram_train(
        corpus.repartition(7), vocab_size=40, n_iters=2, max_piece_len=3
    ).collect()
    assert sorted(map(tuple, v1)) == sorted(map(tuple, v2))
    pieces = {r["piece"] for r in v1}
    # every corpus character is in the vocab (the Viterbi floor)
    chars = set("thecatsonmarokeniz")
    assert chars <= pieces
    # something multi-char was actually learned
    assert any(len(p) > 1 for p in pieces)
    assert len(pieces) <= 40


def test_segment_roundtrip_and_hostiles(spark, corpus):
    vocab = [
        (r["piece"], r["score"])
        for r in unigram_train(corpus, vocab_size=40, n_iters=2, max_piece_len=3).collect()
    ]
    df = spark.createDataFrame(
        [(1, "the cat"), (2, None), (3, "   "), (4, "zzz unseen")],
        "doc_id long, text string",
    )
    got = {
        r["id"]: r.asDict()
        for r in unigram_segment(df, vocab, max_piece_len=3).collect()
    }
    # tokens re-join to the original words
    assert "".join(got[1]["tokens"]) == "thecat"
    assert got[1]["n_tokens"] == len(got[1]["tokens"]) > 0
    assert got[2]["tokens"] == [] and got[3]["tokens"] == []
    # unseen chars segment via the UNK floor instead of crashing
    assert "".join(got[4]["tokens"]) == "zzzunseen"


def test_train_validates(spark, corpus):
    with pytest.raises(ValueError):
        unigram_train(corpus, vocab_size=0)


def test_compression_ratio_signal(spark):
    """Deflate ratio: repeated boilerplate compresses far better than
    varied prose; empties pin to the incompressible convention."""
    from scrapy_products_tracker_spark.functions.text import compression_ratio_stats

    rows = [
        (1, "buy now " * 200),                       # spammy repetition
        (2, "The quick brown fox jumps over lazy dogs while seventeen "
            "unrelated clauses wander through different vocabulary items."),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in compression_ratio_stats(df).collect()}
    assert got[1]["ratio_milli"] < got[2]["ratio_milli"]  # spam compresses better
    assert got[1]["ratio_milli"] < 100                     # 200x repeat crushes
    assert got[3]["ratio_milli"] == 1000 and got[3]["raw_len"] == 0
    assert got[4]["ratio_milli"] == 1000
    assert got[2]["zlib_len"] > 0 and got[2]["raw_len"] > 0
