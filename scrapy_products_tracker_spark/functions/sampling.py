"""Deterministic corpus re-sampling: temperature-flattened group quotas.

Web-crawled corpora are wildly imbalanced across sources (one hot
domain can be 100× the median — the same skew the politeness
scheduler fights on the way in). Pre-training pipelines re-balance at
sampling time with *temperature* weighting: group g with ``n_g`` rows
gets sampling weight ``n_g^alpha`` for ``alpha in (0,1]`` — alpha=1
is natural sampling, alpha→0 is uniform-over-groups (the multilingual
T=alpha^-1 trick from mBERT/XLM-R; CC-derived corpora like Gopher/
MassiveText use the same idiom for per-source weights).

:func:`temperature_sample` turns that into an exact, deterministic,
engine-portable operator:

1. per-group counts (one map-side-combinable aggregate),
2. integer quota per group: ``quota_g = total_target * w_g // sum(w)``
   with ``w_g = floor(sqrt_milli(n_g))`` held in integer milli-units
   (alpha fixed at 0.5, the common choice) — every step integer so
   the split is bit-identical across engines and partitionings,
3. deterministic selection: rank rows in each group by
   ``md5(id)`` (a keyed uniform permutation both engines compute
   byte-identically) and keep ``rank <= quota_g``.

The md5 rank *is* the sampling randomness — stable under re-runs,
insertion order, and partitioning, so the sample is reproducible and
auditable (the property a 100 TB curation run needs: re-executing the
job selects the same rows).

Scale notes: one shuffle on the group key for the ranking window
(unavoidable for exact per-group quotas — same exchange any
per-domain top-k does); counts/quotas ride a tiny broadcast join. A
pathologically hot group serializes its own window task; at that
point switch the rank to a threshold probe (keep rows with
``md5(id) < quota/n * 2^128``, approximate but shuffle-free) — the
exact window is the right default for quota-exact splits.

Parity contract: ``sqrt`` of a BIGINT is correctly rounded IEEE
double on both engines (hardware sqrt), so ``floor`` of it is
deterministic; everything after is int64 arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _group_quotas(keyed: DataFrame, total_target: int) -> DataFrame:
    """(_gkey, _n, group_quota) — the shared integer quota arithmetic
    both sampling variants promise is identical: per-group counts,
    sqrt weights in milli-units, int64 ``div`` split of the target."""
    counts = keyed.groupBy("_gkey").agg(F.count("*").alias("_n"))
    # w = floor(sqrt(n * 1e6)): sqrt in milli-units so small groups
    # keep resolution; int64-exact thereafter
    weights = counts.withColumn(
        "_w", F.floor(F.sqrt(F.col("_n").cast("double") * F.lit(1_000_000.0))).cast("long")
    )
    total_w = weights.agg(F.sum("_w").alias("_tw"))
    return weights.crossJoin(F.broadcast(total_w)).select(
        "_gkey",
        F.col("_n"),
        # integer div, NOT float `/`: double quotients round differently
        # from DuckDB's // on large counts — div() keeps it int64-exact
        F.expr(f"div({int(total_target)} * _w, _tw)").cast("long").alias("group_quota"),
    )


def _null_safe_key(group_col: str):
    """String group key with a NULL sentinel: atomic group values map
    1:1 onto their string form, and NULL becomes its own group instead
    of vanishing through an equi-join (NULL never equals NULL)."""
    return F.coalesce(F.col(group_col).cast("string"), F.lit("\x00<null>"))


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    total_target: int,
    salt: str = "ts1",
) -> DataFrame:
    """Keep ~``total_target`` rows re-balanced across ``group_col`` by
    sqrt-temperature weights. Returns the input columns plus
    ``sample_rank`` (1-based md5 rank within the group) and
    ``group_quota``. Exact: ``sum(quota_g) <= total_target`` (floor
    division; the remainder is deliberately dropped, not
    redistributed, so quotas are a pure per-group function of the
    count table). NULL groups form ONE group of their own (the quota
    join runs on a null-safe string key, so a plain equi-join's
    silent NULL-row drop cannot happen)."""
    if total_target <= 0:
        raise ValueError("total_target must be > 0")
    keyed = df.withColumn("_gkey", _null_safe_key(group_col))
    quotas = _group_quotas(keyed, total_target).drop("_n")
    w = Window.partitionBy("_gkey").orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), id_col
    )
    ranked = keyed.join(F.broadcast(quotas), "_gkey").withColumn(
        "sample_rank", F.row_number().over(w).cast("long")
    )
    return ranked.filter(F.col("sample_rank") <= F.col("group_quota")).drop("_gkey")


def temperature_sample_threshold(
    df: DataFrame,
    group_col: str,
    id_col: str,
    total_target: int,
    salt: str = "ts1",
) -> DataFrame:
    """Shuffle-free APPROXIMATE variant of :func:`temperature_sample`
    — the hot-group scale path its docstring points to.

    Same integer quota computation, but selection keeps rows whose
    md5-derived uniform draw ``u in [0,1)`` satisfies ``u * n_g <
    quota_g`` instead of ranking: expected kept per group = quota_g,
    variance ~ binomial, and NO per-group exchange exists anywhere in
    the plan — group counts/quotas broadcast back onto the unshuffled
    scan, so a single 10^9-row hot group costs the same as a thousand
    small ones. Trade-off: per-group counts are only *expected* to hit
    quota (a quota-exact split needs the rank, hence the shuffle); the
    draw is still deterministic (same md5 key as the exact variant),
    so re-runs select identical rows.

    Use exact for quota-critical splits (eval sets, billing), this
    for statistical re-balancing at scale."""
    if total_target <= 0:
        raise ValueError("total_target must be > 0")
    keyed = df.withColumn("_gkey", _null_safe_key(group_col))
    quotas = _group_quotas(keyed, total_target)
    # u = first 13 hex chars of md5 as a fraction of 16^13 (52 bits —
    # exact in a double); deterministic, uniform, engine-portable
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 13),
        16,
        10,
    ).cast("double") / F.lit(float(16**13))
    return (
        keyed.join(F.broadcast(quotas), "_gkey")
        .withColumn("_u", u)
        .filter(F.col("_u") * F.col("_n") < F.col("group_quota"))
        .drop("_n", "_u", "_gkey")
    )


def shuffle_rank(
    df: DataFrame, id_col: str = "doc_id", salt: str = "sh1", prefix_len: int = 3
) -> DataFrame:
    """``(id, shuffle_rank)`` — a deterministic global uniform
    permutation of the corpus: rank 0..n-1 in ``md5(id || salt)``
    order. The last curation step before sharding a training set (a
    sequential scan of shards must not replay crawl/source order, or
    early epochs see one domain at a time); salting re-rolls the
    permutation per training run while keeping it reproducible and
    auditable — re-executing the job yields byte-identical order.

    Two-phase distributed rank with a twist that removes
    ``pack_shards``' caller-supplied range-key contract: the shuffle
    key is its OWN range key. Global order by ``md5`` == order by
    (md5-prefix, md5), and the prefix is uniform by construction, so
    phase 1 aggregates one count per 16^prefix_len bucket (4096 at
    the default — tiny, balanced, data-independent), phase 2 windows
    only within a bucket. No single-partition window ever sees the
    full data, and no assumption about the input's key distribution
    is needed — the hash makes it uniform."""
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    base = df.select(
        F.col(id_col).alias("id"),
        key.alias("_k"),
        F.substring(key, 1, prefix_len).alias("_rng"),
    )
    totals = base.groupBy("_rng").agg(F.count(F.lit(1)).alias("_n"))
    w_ranges = Window.orderBy("_rng").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_rng", F.coalesce(F.sum("_n").over(w_ranges), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_rng").orderBy("_k", "id")
    return base.join(F.broadcast(offsets), "_rng").select(
        "id",
        (F.col("_off") + F.row_number().over(w_in) - 1).cast("long").alias("shuffle_rank"),
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    total_target: int,
    weights: dict[str, int],
    salt: str = "mx1",
) -> DataFrame:
    """Explicit-mixture sampling — the Pile/DoReMi idiom where the
    per-source proportions are a CURATED input (e.g. ``{"wiki": 400,
    "web": 550, "code": 50}`` per-mille-style integer weights), not a
    function of the observed counts like :func:`temperature_sample`'s
    sqrt rule. Keeps min(quota_g, n_g) rows per group where
    ``quota_g = div(total_target * w_g, sum(w))`` (int64-exact, floor;
    remainder deliberately dropped so quotas are a pure function of
    the weights table); groups absent from ``weights`` get weight 0
    and are dropped — an explicit mixture IS an allowlist. Selection
    is the same deterministic md5 rank (reproducible, auditable,
    partitioning-independent). A group smaller than its quota simply
    yields all its rows (``sample_rank <= quota`` — no redistribution;
    under-filled mixtures are the caller's signal the corpus can't
    serve the recipe, not something to paper over).

    Plan: the weights dict is a broadcast literal table; one group-key
    exchange for the rank window — identical shape to
    temperature_sample."""
    if total_target <= 0:
        raise ValueError("total_target must be > 0")
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    tw = sum(weights.values())
    if tw <= 0:
        raise ValueError("weights must sum > 0")
    rows = [(k, int(total_target) * int(w) // tw) for k, w in sorted(weights.items())]
    spark = df.sparkSession
    quotas = spark.createDataFrame(rows, "_gkey string, group_quota long")
    keyed = df.withColumn("_gkey", _null_safe_key(group_col))
    w = Window.partitionBy("_gkey").orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), id_col
    )
    ranked = keyed.join(F.broadcast(quotas), "_gkey").withColumn(
        "sample_rank", F.row_number().over(w).cast("long")
    )
    return ranked.filter(F.col("sample_rank") <= F.col("group_quota")).drop("_gkey")


def epoch_repeat(
    df: DataFrame,
    group_col: str,
    id_col: str,
    repeats_milli: dict[str, int],
    salt: str = "ep1",
) -> DataFrame:
    """Fractional-epoch upsampling — the LLaMA-recipe idiom where a
    training mix prescribes REPEATS per source ("2.45 epochs of
    Wikipedia, 0.64 of Books"), not row quotas. ``repeats_milli`` maps
    group -> milli-epochs (2450 = 2.45x); every row of a group is
    emitted ``div(r, 1000)`` times (``epoch`` = 1..whole), and the
    fractional tail ``(r mod 1000)/1000`` is realized by ONE extra copy
    of exactly the rows whose keyed md5 draw falls under the fraction:
    ``md5(salt || id) < floor(frac * 2^128 / 1000)`` compared as
    fixed-width lowercase hex — both engines compute the identical
    digest string, so the picked set is bit-exact, reproducible, and
    partitioning-independent (the same md5-as-randomness contract as
    the samplers above). Groups absent from the recipe are dropped (a
    mixture is an allowlist).

    Output: input columns + ``epoch`` (1-based copy index). Exact
    expected count per group: ``n_g * whole + |{md5 < thr}|``.

    Plan shape: the recipe is a broadcast literal table; whole-copy
    fan-out is a row-local ``explode(sequence)`` (no shuffle), the
    fractional pick a row-local string compare — the whole operator is
    map-only, which is what lets it run over a 10^10-row corpus as a
    pure pass-through stage of the training-export funnel."""
    if not repeats_milli or any(int(r) < 0 for r in repeats_milli.values()):
        raise ValueError("repeats_milli must be non-empty and non-negative")
    rows = []
    for g, r in sorted(repeats_milli.items()):
        whole, frac = int(r) // 1000, int(r) % 1000
        thr = f"{(frac << 128) // 1000:032x}"
        rows.append((g, whole, thr))
    spark = df.sparkSession
    spec = spark.createDataFrame(rows, "_gkey string, _whole int, _thr string")
    keyed = df.withColumn("_gkey", _null_safe_key(group_col)).join(
        F.broadcast(spec), "_gkey"
    )
    base_cols = df.columns
    draw = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    whole_copies = (
        keyed.filter(F.col("_whole") >= 1)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_whole"))))
        .select(*base_cols, "epoch")
    )
    extra = (
        keyed.filter(draw < F.col("_thr"))
        .withColumn("epoch", F.col("_whole") + 1)
        .select(*base_cols, "epoch")
    )
    return whole_copies.unionByName(extra)
