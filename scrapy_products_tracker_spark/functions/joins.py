"""Time-series joins Spark lacks as built-ins: as-of join + interval
range join, both expressed as shuffle-bounded compositions of existing
DataFrame ops (no cartesian, no per-row Python).

Why they're here: the reference is a *price tracker* — its product
history table (``products/models.py`` Price/Stock rows keyed by
product + crawl session) exists precisely to answer "what was the
price as of time T" and "which snapshots fall inside this campaign
window".  The reference answers both driver-side with per-product
SELECTs (``database/crud.py`` get-latest idioms); at 10^8 products ×
10^3 sessions those become the two classic distributed time-series
joins:

**as-of join** (:func:`asof_join`): for each left probe row (key,
ts) attach the most recent right quote row (key, ts' <= ts).  The
scale-correct algorithm is the *union-tag sweep*: union probes and
quotes on the key, sort each key's timeline once, and carry quote
values forward with ``last(ignorenulls)`` over an unbounded-preceding
window.  ONE Exchange on the key, zero range explosion, linear work
per key — the same plan a sort-merge as-of (Pandas ``merge_asof``,
DuckDB ``ASOF JOIN``, kdb ``aj``) runs per partition, but expressed
relationally so Catalyst/AQE own partitioning and spill.  A broadcast
range-join would replicate quotes per probe; a theta-join
(``l.ts >= r.ts``) degenerates to BroadcastNestedLoop — both are
scale-killers the plan test pins against.

**interval range join** (:func:`range_join`): match point rows
(key, ts) to interval rows (key, [start, end)).  Equality on a
*bucket* column (``floor(ts / width)``; intervals explode the bucket
range they overlap) turns the inequality join into an equi-join +
exact residual filter — the standard bucketized interval-join trick
(Spark's own range-join hints, ClickHouse/KDB window joins use the
same decomposition).  Each (point, interval) pair meets in EXACTLY
one bucket (the point's own), so no post-join dedup is needed.
Shuffle = one Exchange per side on (key, bucket); interval rows fan
out ``ceil(span/width)+1`` ways, so ``bucket_width`` should be chosen
near the typical interval span (document-scale knob, not a
correctness knob — any width is exact).

Parity contract: timestamps are int64 epoch micros end to end
(``F.unix_micros`` / DuckDB ``epoch_us``), so ordering and bucket
arithmetic are bit-identical across engines; ties on (key, ts) are
the caller's to break (pre-aggregate quotes) — the sweep itself is
deterministic for distinct (key, ts).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_TS = "_asof_ts"
_RTS = "_asof_rts"
_LROW = "_asof_lrow"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: int | None = None,
    direction: str = "backward",
    right_ts_alias: str = "matched_ts",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` from
    the latest ``right`` row with the same key and ``right_ts`` <=
    ``left_ts`` (direction="backward"; "forward" = earliest >=).

    Timestamps must be numeric (cast timestamps to ``unix_micros``
    first); ``tolerance`` is in the same units — matches older than
    ``left_ts - tolerance`` are nulled out (the match row survives
    with NULL values, like Pandas ``merge_asof(tolerance=...)``).

    Unmatched left rows survive with NULL values (left-join
    semantics).  Equal timestamps match (quote at exactly probe time
    counts).  Output = all left columns + ``right_ts_alias`` +
    ``value_cols``.

    Plan: union → ONE Exchange on ``on`` → window sweep → filter.
    No join node at all, so no BroadcastNestedLoop/CartesianProduct
    is possible; the plan test pins it.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    vals = list(value_cols)
    bad = [v for v in vals if v in left.columns]
    if bad:
        raise ValueError(f"value_cols {bad} collide with left columns")

    # Right rows: keys + ts + values, left payload NULL.
    r_side = right.select(
        *keys,
        F.col(right_ts).cast("long").alias(_TS),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).cast("long").alias(_RTS),
        *[F.col(v) for v in vals],
        F.lit(None).alias(_LROW),
    )
    # Left rows: keys + ts + NULL values, full row tucked in a struct
    # so arbitrary left schemas ride through the union untouched.
    l_side = left.select(
        *keys,
        F.col(left_ts).cast("long").alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("long").alias(_RTS),
        *[F.lit(None).cast(right.schema[v].dataType).alias(v) for v in vals],
        F.struct(*left.columns).alias(_LROW),
    )
    u = r_side.unionByName(l_side)

    # Backward: sweep forward in time, quotes before probes at equal
    # ts (side 0 < 1) so an equal-ts quote is visible to the probe.
    # Forward: sweep backward (desc ts), same tie rule.
    order = [F.col(_TS).asc(), F.col(_SIDE).asc()] if direction == "backward" else [
        F.col(_TS).desc(),
        F.col(_SIDE).asc(),
    ]
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried = u.select(
        _SIDE,
        _TS,
        _LROW,
        F.last(_RTS, ignorenulls=True).over(w).alias("_m_ts"),
        *[F.last(v, ignorenulls=True).over(w).alias(f"_m_{v}") for v in vals],
    ).filter(F.col(_SIDE) == 1)

    if tolerance is not None:
        gap = (
            (F.col(_TS) - F.col("_m_ts"))
            if direction == "backward"
            else (F.col("_m_ts") - F.col(_TS))
        )
        in_tol = F.col("_m_ts").isNotNull() & (gap <= F.lit(int(tolerance)))
        proj = [F.when(in_tol, F.col("_m_ts")).alias(right_ts_alias)] + [
            F.when(in_tol, F.col(f"_m_{v}")).alias(v) for v in vals
        ]
    else:
        proj = [F.col("_m_ts").alias(right_ts_alias)] + [
            F.col(f"_m_{v}").alias(v) for v in vals
        ]
    return carried.select(F.col(_LROW + ".*"), *proj)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | Sequence[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of point rows to every interval row with the same
    key whose half-open window ``[start, end)`` contains the point's
    timestamp.  All three ts columns must be numeric (epoch micros by
    convention); ``bucket_width`` is the equi-join bucket size in the
    same units (any positive value is exact; pick ~ the typical
    interval span so fan-out stays O(1)).

    Output = all point columns + all interval columns (names must not
    collide; alias beforehand).  Each qualifying (point, interval)
    pair appears exactly once — the pair can only meet in the point's
    own bucket, so no dedup pass exists in the plan.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    clash = set(points.columns) & set(intervals.columns) - set(keys)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")

    bw = F.lit(int(bucket_width))
    # floor-div (not truncation) so negative epochs bucket correctly
    p = points.withColumn(
        "_rj_bucket", F.floor(F.col(point_ts).cast("long") / bw).cast("long")
    )
    iv = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / bw).cast("long"),
                F.floor(F.col(end_col).cast("long") / bw).cast("long"),
            )
        ),
    )
    joined = p.join(iv, keys + ["_rj_bucket"], "inner").filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_rj_bucket")
