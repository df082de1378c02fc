"""Adaptive re-crawl scheduling from price-change history (O5+).

The reference re-crawls every tracked product every session
(product_targets re-arm, main.py flow) — correct at 40k products,
wasteful at 10^8: most prices never move. This operator turns the
append-only price history (products/tables.py K6) into a per-URL
revisit interval — the classic change-frequency crawl policy (Cho &
Garcia-Molina, VLDB'00, public): URLs whose price changed in at least
half their observed intervals re-arm every session, ones that never
changed wait ``slow`` sessions.

Plan shape at 100 TB: ONE url-keyed window (lag over (session, round))
feeding ONE url-keyed aggregate — the window's hash partitioning is
reused by the groupBy, so the history scan shuffles once. Output is
(url, n_obs, n_changes, change_rate, revisit_after_sessions).

Change detection is NULL-safe: a malformed observation (NULL price)
followed by a real one counts as a change, NULL→NULL does not, and the
first observation never counts (row_number guard, not prev IS NULL —
a NULL-priced second row must still compare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def revisit_priority(
    spark: SparkSession,
    store,
    fast: int = 1,
    default: int = 2,
    slow: int = 4,
    price_col: str = "current_price_cents",
) -> DataFrame:
    """Per-URL revisit interval (in sessions) from the store's price
    history: >=50% change rate -> ``fast``, any change -> ``default``,
    never changed -> ``slow``, single observation -> ``default``."""
    history = store.read_history(spark)
    if history is None:
        raise ValueError("no history table committed yet")
    w = Window.partitionBy("url").orderBy("session", "round")
    obs = history.select(
        "url",
        F.col(price_col).alias("_p"),
        F.lag(price_col).over(w).alias("_prev"),
        F.row_number().over(w).alias("_rn"),
    )
    changed = (F.col("_rn") > 1) & ~F.col("_p").eqNullSafe(F.col("_prev"))
    agg = obs.groupBy("url").agg(
        F.count("*").cast("int").alias("n_obs"),
        F.sum(changed.cast("int")).cast("int").alias("n_changes"),
    )
    rate = F.col("n_changes").cast("double") / (F.col("n_obs") - 1).cast("double")
    return agg.select(
        "url",
        "n_obs",
        "n_changes",
        F.when(F.col("n_obs") > 1, F.round(rate, 6)).alias("change_rate"),
        F.when(F.col("n_obs") <= 1, F.lit(default))
        .when(rate >= 0.5, F.lit(fast))
        .when(F.col("n_changes") > 0, F.lit(default))
        .otherwise(F.lit(slow))
        .cast("int")
        .alias("revisit_after_sessions"),
    )


def price_change_events(
    spark: SparkSession,
    store,
    price_col: str = "current_price_cents",
) -> DataFrame:
    """The tracker's headline deliverable as a set, not a rate: one
    row per OBSERVED price change — (url, session, round, prev_cents,
    new_cents, delta_cents).  The reference computes this per-product
    in the exporter (``database/crud.py`` history SELECT + Python
    diff); here it's the same ONE url-keyed window the revisit policy
    uses, so both ride a single Exchange of the history table.

    NULL-safe like :func:`revisit_priority`: NULL->value and
    value->NULL are changes (a parse failure recovering, or a product
    going dark, both matter to a price alert), NULL->NULL is not, and
    the first observation is never a change.  ``delta_cents`` is NULL
    when either side is NULL (no numeric delta exists).
    """
    history = store.read_history(spark)
    if history is None:
        raise ValueError("no history table committed yet")
    w = Window.partitionBy("url").orderBy("session", "round")
    obs = history.select(
        "url",
        "session",
        "round",
        F.col(price_col).alias("new_cents"),
        F.lag(price_col).over(w).alias("prev_cents"),
        F.row_number().over(w).alias("_rn"),
    )
    changed = (F.col("_rn") > 1) & ~F.col("new_cents").eqNullSafe(F.col("prev_cents"))
    return obs.filter(changed).select(
        "url",
        "session",
        "round",
        "prev_cents",
        "new_cents",
        (F.col("new_cents") - F.col("prev_cents")).alias("delta_cents"),
    )
