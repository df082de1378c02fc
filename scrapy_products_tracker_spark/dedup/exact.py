"""Exact URL dedup: within-batch + against-frontier anti-join.

Reference semantics: every discovered URL is upserted with
``INSERT ... ON DUPLICATE KEY UPDATE`` so re-discoveries never create a
second row (category_result_consumer.py:38-52); in-flight request
dedup is disabled (``dont_filter=True``, rpc_task_consumer.py:470-471)
because the frontier itself is the dedup point. Here:

- within-batch: first discovery wins, deterministically by the
  discovery order key (parent rank, outlink position) — not
  ``dropDuplicates`` (which keeps an arbitrary row).
- against-frontier: Bloom pre-filter (bloom.py) splits candidates into
  definitely-unseen (pass through, no join) and maybe-seen; only the
  maybe-seen slice pays the ``left_anti`` join against the frontier.
  The join keys on ``url_hash`` (64-bit) with an equality confirm on
  ``url`` to be collision-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bloom import BloomShards, bloom_filter_candidates


def dedup_within_batch(df: DataFrame, order_cols: list[str], key: str = "url") -> DataFrame:
    """Keep the first discovery of each key by the given total order."""
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def dedup_against_frontier(
    candidates: DataFrame,
    frontier: DataFrame,
    bloom: BloomShards | None,
    url_col: str = "url",
) -> tuple[DataFrame, int]:
    """Return (unseen candidates, n_maybe) — exact, Bloom-accelerated.

    ``n_maybe`` is -1 when no Bloom filter is supplied (pure anti-join
    path, used by tests to compare both paths for exactness).
    """
    seen_keys = frontier.select(F.col(url_col).alias("_seen_url"))
    if bloom is None:
        out = candidates.join(
            seen_keys, candidates[url_col] == F.col("_seen_url"), "left_anti"
        )
        return out, -1
    unseen = bloom_filter_candidates(candidates, bloom, url_col, keep="unseen")
    maybe = bloom_filter_candidates(candidates, bloom, url_col, keep="maybe")
    rescued = maybe.join(seen_keys, maybe[url_col] == F.col("_seen_url"), "left_anti")
    return unseen.unionByName(rescued), -2
