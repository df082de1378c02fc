"""Exact URL dedup: within-batch + against-frontier anti-join.

Reference semantics: every discovered URL is upserted with
``INSERT ... ON DUPLICATE KEY UPDATE`` so re-discoveries never create a
second row (category_result_consumer.py:38-52); in-flight request
dedup is disabled (``dont_filter=True``, rpc_task_consumer.py:470-471)
because the frontier itself is the dedup point. Here:

- within-batch: first discovery wins, deterministically by the
  discovery order key (parent rank, outlink position) — not
  ``dropDuplicates`` (which keeps an arbitrary row).
- against-frontier: the seen-table pre-filter (seen_table.BloomTable /
  CuckooTable cogroup probe) splits candidates into definitely-unseen
  (pass through, no join) and maybe-seen; only the maybe-seen slice
  pays the ``left_anti`` join against the frontier. That join keys on
  ``url_hash`` (8 bytes shuffled, not full URL strings) with an
  equality confirm on ``url`` for 64-bit collision safety, and the
  probe side can be pruned to the candidates' hash buckets when the
  frontier store is bucketized (store.read_frontier_buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import url_hash_col


def dedup_within_batch(df: DataFrame, order_cols: list[str], key: str = "url") -> DataFrame:
    """Keep the first discovery of each key by the given total order."""
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def anti_join_on_hash(candidates: DataFrame, frontier_keys: DataFrame) -> DataFrame:
    """``candidates LEFT ANTI JOIN frontier`` on (url_hash, url).

    Both sides shuffle 8-byte hashes plus the candidate rows; the
    frontier side only needs its (url_hash, url) projection — column
    pruning reaches the parquet scan. A hash collision (same hash,
    different url) fails the url-equality confirm, so the candidate
    survives — exactness does not rest on hash uniqueness.
    """
    cand = candidates
    if "url_hash" not in cand.columns:
        cand = cand.withColumn("url_hash", url_hash_col(F.col("url")))
    keys = frontier_keys.select(
        F.col("url_hash").alias("_seen_hash"), F.col("url").alias("_seen_url")
    )
    return cand.join(
        keys,
        (cand["url_hash"] == F.col("_seen_hash")) & (cand["url"] == F.col("_seen_url")),
        "left_anti",
    )


def dedup_against_frontier(
    candidates: DataFrame,
    frontier: DataFrame,
    seen=None,
    url_col: str = "url",
) -> tuple[DataFrame, int]:
    """Return (unseen candidates, n_maybe) — exact, seen-table
    accelerated.

    ``seen`` is a seen_table.BloomTable / CuckooTable (or None for the
    pure anti-join path, used by tests to compare both for exactness).
    ``n_maybe`` is -1 without a filter, -2 with one (the split is lazy;
    counting it would force an extra job).
    """
    if seen is None:
        return anti_join_on_hash(candidates, frontier), -1
    probed = seen.mark(candidates, url_col)
    unseen = probed.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe = probed.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    rescued = anti_join_on_hash(maybe, frontier)
    return unseen.unionByName(rescued), -2


def soft_dedup_weights(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Soft (weighted) exact dedup: instead of DROPPING duplicates,
    every row gets ``weight_micro = 10^6 div cluster_size`` where the
    cluster is its exact-text group — so a document repeated k times
    contributes total weight ~1 to training, the down-weighting
    alternative to hard dedup (samples stay available, loss weighting
    restores the deduplicated distribution).

    NULL-text rows are singleton clusters (weight 10^6) — the same
    pass-every-NULL contract the hard-dedup ops keep; the grouping key
    is md5 with a per-row NULL fallback so engines that fold NULL
    hashes into one group (DuckDB) cannot diverge. One shuffle on the
    16-byte key; integer weights so results are bit-identical."""
    key = F.when(
        F.col(text_col).isNull(),
        F.concat(F.lit("null:"), F.col(id_col).cast("string")),
    ).otherwise(F.md5(F.col(text_col)))
    keyed = docs.withColumn("_skey", key)
    w = Window.partitionBy("_skey")
    return (
        keyed.withColumn("cluster_size", F.count("*").over(w).cast("long"))
        .select(
            F.col(id_col),
            "cluster_size",
            F.expr("div(1000000, cluster_size)").cast("long").alias("weight_micro"),
        )
    )
