"""Cardinality / frequency sketches for 100 TB-scale accounting.

At 10^10 frontier URLs the bookkeeping queries a crawl operator runs
daily — "how many DISTINCT urls per registrable domain", "which
tokens dominate the corpus" — cannot afford exact ``COUNT(DISTINCT)``
(a full shuffle of every key) or an exact global token sort. The two
classic sketches solve both with bounded state:

- **HyperLogLog** (Flajolet et al. '07): per-group distinct-count
  estimate from ``m = 2^p`` 6-bit registers. The distributed shape is
  exactly a Spark aggregation: register index + rank are column
  algebra over ``xxhash64``, ``groupBy(group, bucket).max(rank)`` is
  ONE map-side-combinable exchange whose post-shuffle size is at most
  ``groups x m`` rows no matter how many input rows — followed by a
  tiny per-group fold. (The reference tracks seen URLs exactly via a
  MySQL unique key — product_targets.py:11 — which is the O(n) state
  this replaces for *accounting* reads; the authoritative seen-set
  stays the exact Bloom/cuckoo table in ``dedup/seen_table.py``.)
- **Count-Min** (Cormode & Muthukrishnan '05): ``d x w`` counter
  grid; every token increments one cell per hash row, estimate =
  min over rows. Build is one ``groupBy(row, col).sum`` whose output
  is at most ``d*w`` cells — broadcastable — so heavy-hitter probes
  never shuffle the corpus a second time.

Determinism contract (both sketches are oracled against independent
pure-Python builders): all arithmetic is int64 — fixed-point milli/
micro units, floor division, explicit shift scaling — and hashes are
``xxhash64`` seed 42 (bit-matched by ``functions/hashing.py``). The
HLL estimate uses the RAW HyperLogLog formula (no small/large-range
correction: those need ``ln``/``log`` whose libm rounding differs
across engines); the small-range regime is visible to callers via
``n_zero_registers`` and the estimate saturates (documented clamp)
above ~4e12 distinct per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

__all__ = [
    "HLL_P",
    "HLL_ALPHA_MICRO",
    "hll_registers",
    "hll_distinct",
    "hll_estimate_milli",
    "hll_overlap",
    "CMS_D",
    "CMS_W",
    "cms_cells",
    "cms_topk_estimates",
]

# ---------------------------------------------------------------- HLL

HLL_P = 10  # m = 1024 registers per group
# alpha_m for m=1024: 0.7213 / (1 + 1.079/m), in micro units. Shared
# literal with the oracle builder (builders.build_hll_expected).
HLL_ALPHA_MICRO = 720_541
# register contributions are scaled by 2^50 so the per-group sum is
# exact int64 (m * 2^50 = 2^60 max); the estimate divides the scale
# back out in two guarded steps (see hll_estimate_milli).
_HLL_UNIT_SHIFT = 50


def _hll_bucket_rank(h: Column, p: int) -> tuple[Column, Column]:
    """(register index, rank) for one 64-bit hash.

    bucket = top ``p`` bits (unsigned shift); rank = 1 + number of
    leading zeros in the remaining ``w = 64-p`` bits, computed
    JVM-side as ``w + 1 - bit_length(suffix)`` via ``length(bin(x))``
    (no floats — ``floor(log2(x))`` is the classic cross-engine trap:
    java.lang.Math.log(8)/log(2) = 2.9999999999999996).
    """
    w = 64 - p
    bucket = F.shiftrightunsigned(h, w).cast("int")
    suffix = h.bitwiseAND(F.lit((1 << w) - 1))
    bitlen = F.when(suffix == 0, F.lit(0)).otherwise(F.length(F.bin(suffix)))
    rank = (F.lit(w + 1) - bitlen).cast("int")
    return bucket, rank


def hll_registers(
    df: DataFrame, group_cols: list[str], value: Column, p: int = HLL_P
) -> DataFrame:
    """Register table ``(groups..., bucket, register)`` — the merge-
    able sketch state (register-wise max). ONE exchange, map-side
    combined, output bounded by ``n_groups * 2^p`` rows."""
    h = F.xxhash64(value)
    bucket, rank = _hll_bucket_rank(h, p)
    return (
        # NULLs must be dropped BEFORE hashing: Spark's xxhash64(NULL)
        # returns the seed (not NULL), so an unfiltered null would
        # silently occupy a register
        df.where(value.isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll_estimate_milli(sum_units_sql: str, m: int, alpha_micro: int = HLL_ALPHA_MICRO) -> Column:
    """Raw-HLL estimate in milli units from the scaled register sum.

    ``E = alpha * m^2 / sum(2^-M[j])`` becomes, with ``S = sum_units
    = sum((1<<50) >> M[j])`` (zero registers contribute ``1<<50``):

        q         = ((m*m) << 30) div max(S >> 20, 1)      -- ~ m^2*2^50/S
        est_milli = (min(q, 1<<42) * alpha_micro) div 1000

    staged so every intermediate fits int64 (``(m*m)<<30 = 2^50`` for
    p=10; ``q*alpha_micro <= 2^42 * 2^20``). The ``1<<42`` clamp
    (documented saturation at ~4e12 distinct per group) keeps the
    final multiply overflow-free on BOTH engines — Spark long
    arithmetic wraps silently, Python does not, so an unclamped
    overflow would *diverge* cross-engine, not just be inaccurate.
    ``sum_units_sql`` is a SQL expression string for S (floor-div
    semantics via ``div`` need the expr form).
    """
    return F.expr(
        f"(least(shiftleft(cast({m} as bigint) * {m}, 30)"
        f" div greatest(shiftright(cast(({sum_units_sql}) as bigint), 20), 1),"
        f" shiftleft(cast(1 as bigint), 42)) * {alpha_micro}) div 1000"
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    p: int = HLL_P,
    with_exact: bool = True,
) -> DataFrame:
    """Per-group HLL distinct estimate (+ optional exact twin).

    Returns ``(groups..., n_nonzero_registers, n_zero_registers,
    sum_units, est_milli[, exact_distinct, rel_err_milli])`` — all
    int64 fixed-point, cross-engine exact. ``with_exact`` adds an
    exact ``count(distinct)`` branch for accuracy accounting; at the
    100 TB scale you run the sketch alone (the exact branch is the
    full shuffle the sketch exists to avoid).
    """
    m = 1 << p
    regs = hll_registers(df, group_cols, value, p)
    per_group = regs.groupBy(*group_cols).agg(
        F.count("*").cast("int").alias("n_nonzero_registers"),
        # variable shift needs the SQL form (python F.shiftright only
        # takes a literal bit count)
        F.sum(
            F.expr(
                f"shiftright(shiftleft(cast(1 as bigint), {_HLL_UNIT_SHIFT}), register)"
            )
        ).alias("s_nonzero"),
    )
    sum_units_sql = (
        f"s_nonzero + cast({m} - n_nonzero_registers as bigint)"
        f" * shiftleft(cast(1 as bigint), {_HLL_UNIT_SHIFT})"
    )
    sum_units = F.expr(sum_units_sql)
    est_milli = hll_estimate_milli(sum_units_sql, m)
    out = per_group.select(
        *group_cols,
        F.col("n_nonzero_registers"),
        (F.lit(m) - F.col("n_nonzero_registers")).cast("int").alias("n_zero_registers"),
        sum_units.cast("long").alias("sum_units"),
        est_milli.cast("long").alias("est_milli"),
    )
    if not with_exact:
        return out
    exact = df.select(*group_cols, value.alias("_v")).groupBy(*group_cols).agg(
        F.count_distinct(F.col("_v")).alias("exact_distinct")
    )
    joined = out.join(exact, on=group_cols, how="left").na.fill({"exact_distinct": 0})
    return joined.select(
        *group_cols,
        "n_nonzero_registers",
        "n_zero_registers",
        "sum_units",
        "est_milli",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        # integer floor-div (never float /) so the milli relative
        # error is bit-identical on both engines
        F.expr(
            "abs(est_milli - exact_distinct * 1000)"
            " div greatest(exact_distinct, cast(1 as bigint))"
        ).cast("long").alias("rel_err_milli"),
    )


# ---------------------------------------------------------- Count-Min

CMS_D = 4
CMS_W = 1024


def _cms_col(tok: Column, row: int, w: int) -> Column:
    """Column index of ``tok`` in hash row ``row`` (single-string
    xxhash64 so the pure-Python twin is ``xxhash64_str(f'cms{r}:{t}')
    % w`` — pmod == Python %)."""
    return F.pmod(F.xxhash64(F.concat(F.lit(f"cms{row}:"), tok)), F.lit(w)).cast("int")


def cms_cells(
    token_counts: DataFrame, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Counter grid ``(row, col, cnt)`` from a ``(token, cnt)`` table.

    Output is at most ``d*w`` rows regardless of vocabulary size —
    the whole sketch broadcasts. Build is one small exchange over the
    already-aggregated token histogram (never the raw corpus)."""
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _cms_col(F.col("token"), r, w).alias("col"))
            for r in range(d)
        ]
    )
    return (
        token_counts.select(F.explode(rows).alias("rc"), F.col("cnt"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_topk_estimates(
    docs: DataFrame,
    text_col: str = "text",
    d: int = CMS_D,
    w: int = CMS_W,
    k: int = 40,
) -> DataFrame:
    """Heavy hitters with their Count-Min estimates.

    ``(token, exact_cnt, cms_est, overcount)`` for the exact top-k
    tokens (cnt desc, token asc — total order). ``cms_est >=
    exact_cnt`` always (one-sided error); ``overcount`` is the
    collision inflation. Exact counts come from the same single
    token histogram the sketch is built from, so the corpus is
    tokenized and shuffled exactly once; the probe join broadcasts
    the <=``d*w``-cell grid."""
    toks = docs.select(F.explode(tokens_col(F.col(text_col))).alias("token")).where(
        F.col("token") != ""
    )
    hist = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    cells = cms_cells(hist, d, w)
    probes = hist.orderBy(F.col("cnt").desc(), F.col("token")).limit(k)
    est = None
    probe_cells = probes
    for r in range(d):
        cells_r = (
            cells.where(F.col("row") == r)
            .select(F.col("col").alias(f"_c{r}"), F.col("cnt").alias(f"_e{r}"))
        )
        probe_cells = probe_cells.join(
            F.broadcast(cells_r),
            _cms_col(F.col("token"), r, w) == F.col(f"_c{r}"),
            "left",
        ).drop(f"_c{r}")
    est = F.least(*[F.coalesce(F.col(f"_e{r}"), F.lit(0)) for r in range(d)])
    return probe_cells.select(
        "token",
        F.col("cnt").cast("long").alias("exact_cnt"),
        est.cast("long").alias("cms_est"),
        (est - F.col("cnt")).cast("long").alias("overcount"),
    ).orderBy(F.col("exact_cnt").desc(), "token")


def _sum_units_sql(nz_col: str, s_col: str, m: int) -> str:
    return (
        f"coalesce({s_col}, cast(0 as bigint))"
        f" + cast({m} - {nz_col} as bigint)"
        f" * shiftleft(cast(1 as bigint), {_HLL_UNIT_SHIFT})"
    )


def hll_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """One-row cross-corpus overlap audit from two mergeable HLL
    sketches: ``(est_a_milli, est_b_milli, est_union_milli,
    est_inter_milli, jaccard_milli)``.

    The union sketch is the register-wise max of the two sides (the
    defining property of HLL state — merging sketches IS the union
    estimate); the intersection comes from inclusion-exclusion,
    clamped at 0, and the Jaccard estimate is their integer-milli
    ratio. This answers "how much did crawl B discover that crawl A
    already has?" between two 10^10-row corpora while moving 2 x 2^p
    register rows — the sketches never see each other's data.

    Same determinism contract as :func:`hll_distinct` (staged int64,
    raw-HLL, saturation clamp); inclusion-exclusion inherits raw-HLL
    error so ``jaccard_milli`` is an audit signal, not a dedup
    decision — the exact paths (seen-set anti-join,
    dedup_against_corpus) stay authoritative."""
    m = 1 << p
    rg_a = hll_registers(df_a, [], F.col(value_col), p)
    rg_b = hll_registers(df_b, [], F.col(value_col), p)
    unit = F.expr(
        f"shiftright(shiftleft(cast(1 as bigint), {_HLL_UNIT_SHIFT}), register)"
    )
    a_agg = rg_a.agg(
        F.count("*").cast("int").alias("a_nz"), F.sum(unit).alias("a_s")
    )
    b_agg = rg_b.agg(
        F.count("*").cast("int").alias("b_nz"), F.sum(unit).alias("b_s")
    )
    u_agg = (
        rg_a.unionByName(rg_b)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
        .agg(F.count("*").cast("int").alias("u_nz"), F.sum(unit).alias("u_s"))
    )
    row = a_agg.crossJoin(b_agg).crossJoin(u_agg)
    ests = row.select(
        hll_estimate_milli(_sum_units_sql("a_nz", "a_s", m), m).alias("est_a_milli"),
        hll_estimate_milli(_sum_units_sql("b_nz", "b_s", m), m).alias("est_b_milli"),
        hll_estimate_milli(_sum_units_sql("u_nz", "u_s", m), m).alias(
            "est_union_milli"
        ),
    )
    return ests.select(
        "est_a_milli",
        "est_b_milli",
        "est_union_milli",
        F.expr(
            "greatest(est_a_milli + est_b_milli - est_union_milli,"
            " cast(0 as bigint))"
        ).alias("est_inter_milli"),
        F.expr(
            "(greatest(est_a_milli + est_b_milli - est_union_milli,"
            " cast(0 as bigint)) * 1000)"
            " div greatest(est_union_milli, cast(1 as bigint))"
        ).alias("jaccard_milli"),
    )
