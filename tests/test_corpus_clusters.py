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
