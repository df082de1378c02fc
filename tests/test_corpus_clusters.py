"""Cluster-exact (transitive) corpus dedup vs the pairwise policy.

The planted-chain corpus (oracle/builders.chain_corpus_rows) has, per
chain, X ≈ H and H ≈ Y with disjoint X/Y vocabularies — a duplicate
cluster that exists only transitively, with the hub H holding the
HIGHEST id. Pairwise greedy-by-id drops only H; cluster-exact must
keep exactly the min-id X per component (VERDICT r02 #6).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.dedup import dedup_corpus
from scrapy_products_tracker_spark.dedup.text_corpus import min_label_components
from scrapy_products_tracker_spark.oracle import builders as OB


@pytest.fixture(scope="module")
def chain_df(spark):
    import __spark_entry__ as entry

    return entry._chain_corpus(spark).persist()


def test_spark_chain_corpus_matches_python_builder(spark, chain_df):
    """The JVM-rendered chain corpus must be byte-identical to the
    oracle builder's Python rendering (they share only constants)."""
    got = {r["doc_id"]: r["text"] for r in chain_df.collect()}
    assert got == dict(OB.chain_corpus_rows())


def test_min_label_components_exact(spark):
    """CC labels on a hand-built graph: chain, star, singleton edge."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    got = {r["node"]: r["label"] for r in min_label_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_transitive_keeps_one_per_cluster_pairwise_does_not(spark, chain_df):
    trans = {
        r["doc_id"]
        for r in dedup_corpus(
            chain_df,
            threshold=OB.CHAIN_THRESHOLD,
            n_hashes=OB.CHAIN_N_HASHES,
            bands=OB.CHAIN_BANDS,
            transitive=True,
        ).collect()
    }
    pairw = {
        r["doc_id"]
        for r in dedup_corpus(
            chain_df,
            threshold=OB.CHAIN_THRESHOLD,
            n_hashes=OB.CHAIN_N_HASHES,
            bands=OB.CHAIN_BANDS,
            transitive=False,
        ).collect()
    }
    singles = {9000 + s for s in range(OB.N_CHAIN_SINGLETONS)}
    # cluster-exact: exactly min-id X per chain + all singletons
    assert trans == {c * 10 for c in range(OB.N_CHAINS)} | singles
    # pairwise greedy: the hub H (highest id of both pairs) is the only
    # loser, so Y = c*10+1 wrongly survives — the policy gap this
    # operator exists to close
    assert pairw == {c * 10 for c in range(OB.N_CHAINS)} | {
        c * 10 + 1 for c in range(OB.N_CHAINS)
    } | singles


# --- curate_corpus: the composed text funnel -------------------------------


def _funnel_corpus(spark):
    """40 wordy docs (4 sources) + one too-short doc + one exact dup."""
    import random

    rng = random.Random(11)
    vocab = ["the", "and", "cargo", "vessel", "market", "price", "of", "to",
             "report", "quarterly", "index", "value", "is", "for", "with"]
    rows = []
    for i in range(40):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(30, 60)))
        rows.append((i, text, f"src{i % 4}"))
    rows.append((100, "too short", "src0"))        # fails min_tokens
    rows.append((101, rows[0][1], "src1"))         # exact dup of doc 0
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_curate_corpus_stage_semantics(spark):
    from scrapy_products_tracker_spark.dedup import curate_corpus

    df = _funnel_corpus(spark)
    out = curate_corpus(
        df,
        min_tokens=5,
        min_quality=0.0,
        threshold=0.99,
        balance_col="source",
        sample_target=20,
        seq_len=16,
    )
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    ids = {r["doc_id"] for r in rows}
    assert 100 not in ids  # quality gate: token floor
    assert 101 not in ids  # exact dedup: higher id of the dup pair loses
    # sampling invariants: rank within quota, quota respected per group
    from collections import Counter

    per_group = Counter(r["source"] for r in rows)
    for r in rows:
        assert 1 <= r["sample_rank"] <= r["group_quota"]
        assert per_group[r["source"]] <= r["group_quota"]
    assert sum(per_group.values()) <= 20
    # packing invariants: one contiguous token stream in doc_id order
    off = 0
    for r in rows:
        assert r["tok_before"] == off
        assert r["first_seq"] == r["tok_before"] // 16
        assert r["last_seq"] == (r["tok_before"] + r["n_tokens"] - 1) // 16
        assert r["n_tokens"] == len(r["text"].split()) + 1
        off += r["n_tokens"]


def test_curate_corpus_equals_manual_composition(spark):
    """The funnel is exactly filter -> dedup -> balance -> pack chained
    (a stage-order or join-wiring bug breaks this)."""
    from pyspark.sql import functions as F

    from scrapy_products_tracker_spark.dedup import curate_corpus, dedup_corpus
    from scrapy_products_tracker_spark.functions.sampling import temperature_sample
    from scrapy_products_tracker_spark.functions.text import (
        pack_sequences,
        quality_score,
        token_count,
    )

    df = _funnel_corpus(spark)
    got = curate_corpus(
        df,
        min_tokens=5,
        min_quality=0.4,
        threshold=0.99,
        balance_col="source",
        sample_target=20,
        seq_len=16,
    )
    filt = df.filter(
        (token_count(F.col("text")) >= 5) & (quality_score(F.col("text")) >= 0.4)
    )
    surv = dedup_corpus(filt, threshold=0.99)
    picked = surv.join(
        temperature_sample(surv.select("doc_id", "source"), "source", "doc_id", 20)
        .select("doc_id", "sample_rank", "group_quota"),
        "doc_id",
    )
    want = picked.join(
        pack_sequences(picked, 16)
        .select(
            F.col("id").alias("doc_id"), "n_tokens", "tok_before", "first_seq", "last_seq"
        ),
        "doc_id",
    )
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = sorted(got.select(*cols).collect())
    b = sorted(want.select(*cols).collect())
    assert a == b


def test_curate_corpus_requires_balance_col(spark):
    import pytest

    from scrapy_products_tracker_spark.dedup import curate_corpus

    df = _funnel_corpus(spark)
    with pytest.raises(ValueError, match="balance_col"):
        curate_corpus(df, sample_target=5)


# --- dedup_against_corpus: incremental ingestion ----------------------------


def test_dedup_against_corpus_planted(spark):
    from scrapy_products_tracker_spark.dedup import dedup_against_corpus

    base = " ".join(f"tok{i}" for i in range(60))
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different words entirely " * 10)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, base),                             # exact copy of corpus 1
            (101, base + " extra"),                  # near copy of corpus 1 (LSH cross)
            (102, "unique new content here " * 12),  # genuinely new
            (103, "unique new content here " * 12),  # within-batch exact dup of 102
            (104, None),                             # NULL text passes through
            (105, "TOK0 " + base[5:]),               # case variant: normalized exact
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"] for r in dedup_against_corpus(new, corpus, threshold=0.5).collect()
    )
    assert got == [102, 104]


def test_dedup_against_corpus_never_drops_corpus_side(spark):
    """The operator returns only NEW-side survivors and never emits or
    mutates corpus rows (the corpus is read-only context)."""
    from scrapy_products_tracker_spark.dedup import dedup_against_corpus

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i} " * 20) for i in range(5)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100 + i, f"fresh doc {i} " * 20) for i in range(4)], "doc_id long, text string"
    )
    got = sorted(r["doc_id"] for r in dedup_against_corpus(new, corpus).collect())
    assert got == [100, 101, 102, 103]


def test_dedup_against_corpus_prededuped_batch(spark):
    """dedup_within=False trusts the batch: an internal dup pair
    survives (only cross-corpus dups are dropped)."""
    from scrapy_products_tracker_spark.dedup import dedup_against_corpus

    t = "some repeated batch text " * 15
    corpus = spark.createDataFrame([(1, "other corpus text " * 15)], "doc_id long, text string")
    new = spark.createDataFrame([(10, t), (11, t)], "doc_id long, text string")
    got = sorted(
        r["doc_id"]
        for r in dedup_against_corpus(new, corpus, dedup_within=False).collect()
    )
    assert got == [10, 11]


def test_curate_corpus_readability_gate(spark):
    from scrapy_products_tracker_spark.dedup import curate_corpus
    from scrapy_products_tracker_spark.functions.text import readability_scores

    rows = [
        (1, "The cat sat on the mat. The dog ran to the park. We like it here.", "a"),
        # unpunctuated polysyllabic run-on: words/sentence and
        # syllables/word both explode -> flesch far below zero
        (2, " ".join(["organizational autoregressive convolutional"] * 10), "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    scores = {r.doc_id: r.flesch_milli for r in readability_scores(df).collect()}
    assert scores[1] > 0 > scores[2]
    kept = curate_corpus(
        df, min_tokens=5, min_quality=0.0, flesch_range_milli=(0, 206_835)
    )
    assert [r.doc_id for r in kept.collect()] == [1]
    import pytest

    with pytest.raises(ValueError):
        curate_corpus(df, flesch_range_milli=(10, 0)).collect()
