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
    # W staged in DECIMAL(38,0): token-mass weights at the module's stated
    # scale (~10^13-10^15 per domain x 10^7 domains) overflow int64 sums.
    W = int(pos.agg(F.sum(F.col("weight").cast("decimal(38,0)"))).first()[0] or 0)
    if W == 0 or total == 0:
        return w.select("key", "weight", F.lit(0).cast("long").alias("quota"))
    # total*weight can reach ~10^24 (total 10^9 x weight 10^15) — far past
    # 2^63, where non-ANSI Spark wraps silently. Stage the products in
    # DECIMAL(38,0) (same discipline as wordpiece._SCORE_EXPR); _base fits
    # int64 by construction (<= total), _rem stays decimal (< W).
    base = pos.select(
        "key",
        "weight",
        F.expr(
            f"cast((cast({int(total)} as decimal(38,0)) * weight)"
            f" div cast({int(W)} as decimal(38,0)) as long)"
        ).alias("_base"),
        F.expr(
            f"cast((cast({int(total)} as decimal(38,0)) * weight)"
            f" % cast({int(W)} as decimal(38,0)) as decimal(38,0))"
        ).alias("_rem"),
    )
    leftover = total - (base.agg(F.sum("_base")).first()[0] or 0)
    if leftover > 0:
        # two-phase global rank on (rem desc, weight desc, key asc):
        # value-range buckets order WITH rem, so rank decomposes into
        # per-bucket local ranks + a running offset over the tiny
        # one-row-per-bucket count table (no single-partition Window).
        b = base.withColumn(
            "_bk",
            F.expr(
                f"cast((_rem * {N_REM_BUCKETS})"
                f" div cast({int(W)} as decimal(38,0)) as int)"
            ),
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

    Scale contract: the rank over the per-DOMAIN count table
    (politeness-key cardinality, ~10^7 at web scale) is the same
    **two-phase bucketed rank** as ``apportion_budget`` — value-range
    buckets on ``c`` + broadcast running offsets, no single-partition
    Window. NULL/negative counts are rejected rows (filtered
    explicitly) — callers pass an aggregate, not a log. The weighted
    sum ``Σ(2i-1)·c_i`` is staged in DECIMAL(38,0): rank i ~10^7 times
    count ~10^12 overflows int64."""
    c = counts.select(
        F.col(key_col).alias("key"), F.col(count_col).cast("long").alias("c")
    ).filter(F.col("c").isNotNull() & (F.col("c") >= 0))
    # two scalar aggregates (8-byte driver values) bound the bucket map
    mm = c.agg(F.min("c").alias("mn"), F.max("c").alias("mx")).first()
    mn = 0 if mm["mn"] is None else int(mm["mn"])
    span = max(1, (0 if mm["mx"] is None else int(mm["mx"])) - mn + 1)
    b = c.withColumn(
        "_bk",
        F.expr(
            f"cast(((c - {mn}) * cast({N_REM_BUCKETS} as decimal(38,0)))"
            f" div cast({span} as decimal(38,0)) as int)"
        ),
    )
    bcounts = b.groupBy("_bk").agg(F.count("*").alias("_bn"))
    w_off = Window.orderBy(F.asc("_bk")).rowsBetween(
        Window.unboundedPreceding, -1
    )  # over <= 4096 rows: bounded, not data-sized
    offsets = bcounts.select(
        "_bk", F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off")
    )
    w_local = Window.partitionBy("_bk").orderBy(F.asc("c"), F.asc("key"))
    ranked = b.join(F.broadcast(offsets), "_bk").withColumn(
        "_i", F.row_number().over(w_local) + F.col("_off")
    )
    return (
        ranked.agg(
            F.count("*").alias("_n"),
            F.sum(F.col("c").cast("decimal(38,0)")).alias("_tot"),
            F.max("c").alias("_mx"),
            F.sum(
                F.expr("cast(2 * _i - 1 as decimal(38,0)) * c")
            ).alias("_wsum"),
        )
        .select(
            F.col("_n").cast("long").alias("n_domains"),
            F.col("_tot").cast("long").alias("total_fetches"),
            F.expr(
                "cast((_mx * 1000) div greatest(_tot, cast(1 as decimal(38,0)))"
                " as long)"
            ).alias("max_share_milli"),
            # Σ(2i-n-1)c_i = Σ(2i-1)c_i - n·Σc  (ascending ranks)
            F.expr(
                "cast(((_wsum - _n * _tot) * 1000)"
                " div greatest(_n * _tot, cast(1 as decimal(38,0))) as long)"
            ).alias("gini_milli"),
        )
    )
