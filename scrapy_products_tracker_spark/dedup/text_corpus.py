"""End-to-end text-corpus deduplication — the composed operator a
training-data pipeline actually calls, built from the tested pieces:

1. **Exact pass**: whitespace-normalized lowercase content fingerprint
   (functions/text.fingerprint); the lowest-id doc of each fingerprint
   group survives (first-discovery-wins, the same policy as the URL
   frontier's in-batch dedup D2).
2. **Near pass**: MinHash signatures -> LSH band candidates ->
   signature Jaccard estimate >= ``threshold``; the higher id of each
   surviving pair is dropped (greedy-by-id, the standard practical
   near-dedup policy — pairwise, no transitive closure, so borderline
   chains keep one doc per *pair* rather than one per cluster; a
   cluster-exact variant would iterate min-id propagation over the
   pair graph).

Scale shape: one window per fingerprint group (shuffle on fp), the
MinHash/LSH path's one signature shuffle + band equi-join (never
all-pairs), and a final left-anti join on the 8-byte id. Nothing is
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import (
    lsh_candidate_pairs,
    minhash_jaccard_estimate,
    minhash_signature,
)
from ..functions.text import fingerprint


def dedup_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Survivors of exact + MinHash-LSH near dedup (original columns).

    Deterministic: ties always resolve to the lowest id, so the result
    is a pure function of the input set regardless of partitioning.
    NULL-text docs carry no content to compare, so they pass through
    untouched (a NULL md5 would otherwise collapse them into one
    "duplicate" group). The loser-id set is materialized eagerly so the
    expensive signature cache can be released before returning (ids are
    8 bytes/doc; signatures are n_hashes longs/doc).
    """
    no_text = df.filter(F.col(text_col).isNull())
    with_text = df.filter(F.col(text_col).isNotNull())
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    exact = (
        with_text.withColumn("_fp", fingerprint(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )
    sig = minhash_signature(exact, id_col, text_col, n_hashes=n_hashes, k=k).persist()
    pairs = lsh_candidate_pairs(sig, n_hashes=n_hashes, bands=bands)
    near = minhash_jaccard_estimate(sig, pairs, n_hashes=n_hashes).filter(
        F.col("jaccard_est") >= threshold
    )
    losers = near.select(F.col("doc_b").alias("_loser")).distinct().persist()
    losers.count()  # materialize the (narrow) loser ids, then free the signatures
    sig.unpersist()
    return exact.join(
        losers, exact[id_col] == losers["_loser"], "left_anti"
    ).unionByName(no_text)
