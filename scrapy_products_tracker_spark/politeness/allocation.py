"""Rank-proportional crawl-budget apportionment (largest remainder).

A 10^10-URL frontier cannot fetch everything each epoch: the round
budget is a fixed fleet-wide number (total fetches the politeness
layer will admit), and the question is how to SPLIT it across
domains. The reference splits implicitly — per-domain queues drain
round-robin under a global concurrency cap (settings.py:40-41); the
scale-first answer is explicit proportional allocation by importance
mass (e.g. PageRank/OPIC rank summed per registrable domain), which
this module computes with the **largest-remainder (Hamilton) method**:

    base(d)  = total * w(d) div W          (exact integer quota)
    rem(d)   = total * w(d) mod W
    leftover = total - Σ base               (< number of domains)
    the ``leftover`` domains with the largest remainders get +1

Quotas then sum to EXACTLY ``total`` — no fetch slot is lost to
rounding, and the allocation is a pure function of the weights
(tie-break: remainder desc, weight desc, key asc — total order).

Scale shape: W and leftover are two scalar aggregates (8-byte driver
values, same contract as the HITS renorm divisor); quotas and
remainders are row-local; the top-``leftover`` selection is a
**two-phase rank** — remainders bucket by value range (ordered
buckets), per-bucket counts make a tiny offset table, and the global
rank is local-rank + broadcast offset. No single-partition Window
anywhere (the repo-wide rule; same shape as sampling.shuffle_rank).

The output joins onto the robots/config table as ``max_per_round``
(politeness/scheduler.py budgets) or seeds the AIMD controller's
initial budgets (politeness/adaptive.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_REM_BUCKETS = 4096


def apportion_budget(
    weights: DataFrame,
    total: int,
    key_col: str = "domain",
    weight_col: str = "weight",
) -> DataFrame:
    """``(key, weight, quota)`` with int64 quotas summing to exactly
    ``total`` across rows with positive weight (NULL/non-positive
    weights get quota 0 and sit out the remainder contest). ``total``
    must be >= 0; an empty or all-zero weight table yields all-zero
    quotas."""
    if total < 0:
        raise ValueError("total budget must be >= 0")
    w = weights.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
    )
    pos = w.filter(F.col("weight") > 0)
    W = pos.agg(F.sum("weight")).first()[0] or 0
    if W == 0 or total == 0:
        return w.select("key", "weight", F.lit(0).cast("long").alias("quota"))
    base = pos.select(
        "key",
        "weight",
        F.expr(f"({int(total)} * weight) div {int(W)}").alias("_base"),
        F.expr(f"({int(total)} * weight) % {int(W)}").alias("_rem"),
    )
    leftover = total - (base.agg(F.sum("_base")).first()[0] or 0)
    if leftover > 0:
        # two-phase global rank on (rem desc, weight desc, key asc):
        # value-range buckets order WITH rem, so rank decomposes into
        # per-bucket local ranks + a running offset over the tiny
        # one-row-per-bucket count table (no single-partition Window).
        b = base.withColumn(
            "_bk",
            F.expr(f"cast((_rem * {N_REM_BUCKETS}) div {int(W)} as int)"),
        )
        counts = b.groupBy("_bk").agg(F.count("*").alias("_n"))
        w_off = Window.orderBy(F.desc("_bk")).rowsBetween(
            Window.unboundedPreceding, -1
        )  # over <= 4096 rows: bounded, not data-sized
        offsets = counts.select(
            "_bk", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
        )
        w_local = Window.partitionBy("_bk").orderBy(
            F.desc("_rem"), F.desc("weight"), F.asc("key")
        )
        ranked = (
            b.join(F.broadcast(offsets), "_bk")
            .withColumn("_rk", F.row_number().over(w_local) + F.col("_off"))
        )
        out = ranked.select(
            "key",
            "weight",
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.lit(int(leftover)), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("long").alias("quota"),
        )
    else:
        out = base.select(
            "key", "weight", F.col("_base").cast("long").alias("quota")
        )
    rest = w.join(pos.select("key"), "key", "left_anti").select(
        "key", "weight", F.lit(0).cast("long").alias("quota")
    )
    return out.unionByName(rest)


def fetch_fairness(
    counts: DataFrame,
    key_col: str = "domain",
    count_col: str = "n",
) -> DataFrame:
    """One-row crawl-fairness audit over per-domain fetch counts:
    ``(n_domains, total_fetches, max_share_milli, gini_milli)``.

    The Gini coefficient of the fetch distribution is the standard
    "is the crawl starving the tail?" observability signal — 0 =
    perfectly even, →1000 = one domain got everything (politeness
    budgets + claim aging exist to keep this down; this measures
    them). Computed exactly in integer milli via the sorted-rank
    formula ``G = Σ(2i - n - 1)·c_i / (n·Σc)`` with ties ordered
    (count, key) — deterministic on any engine.

    Scale contract: the window ranks the per-DOMAIN count table
    (politeness-key cardinality, ~10^7 at web scale — the same
    bounded-table window contract as ``latency_percentiles``), never
    the fetch log itself. NULL/negative counts are rejected rows —
    callers pass an aggregate, not a log."""
    from pyspark.sql import Window

    c = counts.select(
        F.col(key_col).alias("key"), F.col(count_col).cast("long").alias("c")
    )
    w = Window.orderBy("c", "key")
    ranked = c.withColumn("_i", F.row_number().over(w))
    return (
        ranked.agg(
            F.count("*").alias("_n"),
            F.sum("c").alias("_tot"),
            F.max("c").alias("_mx"),
            F.sum(F.expr("(2 * _i - 1) * c")).alias("_wsum"),
        )
        .select(
            F.col("_n").cast("long").alias("n_domains"),
            F.col("_tot").cast("long").alias("total_fetches"),
            F.expr("(_mx * 1000) div greatest(_tot, cast(1 as bigint))").alias(
                "max_share_milli"
            ),
            # Σ(2i-n-1)c_i = Σ(2i-1)c_i - n·Σc  (ascending ranks)
            F.expr(
                "((_wsum - _n * _tot) * 1000)"
                " div greatest(_n * _tot, cast(1 as bigint))"
            ).alias("gini_milli"),
        )
    )
