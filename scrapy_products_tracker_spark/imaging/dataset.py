"""Training-dataset preparation operators over image+caption tables.

The north-rule input is an Iceberg table of image+caption pairs
``(image_id, bytes, w, h, fmt, caption, phash)``; these operators are
the standard curation steps a multimodal pre-training pipeline runs
over that table after the crawl lands it:

- :func:`laion_filter` — LAION/DataComp-style row filters (caption
  token minimum, minimum short side, aspect-ratio cap), the first
  pass every web-scraped image corpus makes (Schuhmann et al.,
  NeurIPS'22 datasets track, §3: "we filter samples with less than 5
  characters of text [and] images below 5KB").
- :func:`aspect_bucket_assign` — aspect-ratio bucketing for batched
  training at native-ish resolution (the SDXL appendix-B trick):
  every image maps to the fixed bucket minimizing aspect distortion.
- :func:`pack_shards` — WebDataset-style sequential shard packing:
  deterministic (shard_id) assignment by running payload-byte prefix
  sums so a downstream writer can emit size-bounded tar shards.

All three are pure column algebra (JVM-side, whole-stage codegen) —
no Python in the data path. Parity contract: every arithmetic step is
integer-exact (cross-multiplied aspect comparisons, integer ``div``,
int64 byte sums), so results are bit-identical across engines and
partitionings; the DuckDB oracles in ``__spark_entry__`` recompute
them relationally from an independently-built metadata table.

Scale notes (100 TB):

- ``laion_filter`` / ``aspect_bucket_assign`` are narrow per-row maps:
  no shuffle at all, and neither touches the ``bytes`` column (column
  pruning keeps the scan metadata-only).
- ``pack_shards`` needs a global prefix sum over the shard order. A
  single global window would serialize on one task, so it runs the
  classic two-phase distributed scan: per-range byte totals (a tiny
  aggregate, one row per range) get running offsets on the driver-side
  -sized table, then broadcast back and added to per-range windowed
  sums. The only ordered window over unbounded data partitions by
  ``range_col`` — the caller supplies a range key that is a PREFIX of
  the id order (e.g. a zero-padded id prefix, a date, a crawl bucket),
  which is what makes (range, id) order equal global id order.

Reference scope note: the reference stores fetched images untouched
(``src/python/src/pipelines/save_images_pipeline.py:27-41``) and has
no dataset-curation stage; these operators are the forward-looking
training-pipeline surface the task brief mandates on top of parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["DEFAULT_ASPECT_BUCKETS", "aspect_bucket_assign", "laion_filter", "pack_shards"]


def _caption_tokens(cap: F.Column) -> F.Column:
    """Whitespace token count; NULL/blank captions count 0 (the same
    trim-then-split convention as functions/text.py tokens_col)."""
    return (
        F.when(cap.isNull() | (F.trim(cap) == ""), F.lit(0))
        .otherwise(F.size(F.split(F.trim(cap), r"\s+")))
        .cast("int")
    )


def laion_filter(
    df: DataFrame,
    min_caption_tokens: int = 4,
    min_side_px: int = 16,
    max_aspect_milli: int = 3000,
    id_col: str = "image_id",
    caption_col: str = "caption",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Per-row keep/drop decisions for an image+caption corpus.

    Returns ``(id, n_cap_tokens, min_side, aspect_milli, keep,
    drop_reason)`` where ``drop_reason`` is the FIRST failing rule in
    fixed priority order (``degenerate_dims`` > ``caption_short`` >
    ``small_image`` > ``extreme_aspect``) and NULL for kept rows.
    ``aspect_milli`` is ``div(max(w,h)*1000, min(w,h))`` — integer
    milli-units so the threshold compare is exact on every engine
    (never a float ratio). Degenerate dimensions (NULL or <= 0) drop
    the row rather than the job — the X6 untrusted-input contract."""
    w, h = F.col(w_col).cast("long"), F.col(h_col).cast("long")
    degenerate = w.isNull() | h.isNull() | (w <= 0) | (h <= 0)
    n_tok = _caption_tokens(F.col(caption_col))
    min_side = F.when(degenerate, F.lit(None)).otherwise(F.least(w, h)).cast("int")
    aspect = F.when(degenerate, F.lit(None)).otherwise(
        F.expr(f"div(greatest(cast({w_col} as bigint), cast({h_col} as bigint)) * 1000, "
               f"least(cast({w_col} as bigint), cast({h_col} as bigint)))")
    ).cast("long")
    reason = (
        F.when(degenerate, F.lit("degenerate_dims"))
        .when(n_tok < min_caption_tokens, F.lit("caption_short"))
        .when(min_side < min_side_px, F.lit("small_image"))
        .when(aspect > max_aspect_milli, F.lit("extreme_aspect"))
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_tok.alias("n_cap_tokens"),
        min_side.alias("min_side"),
        aspect.alias("aspect_milli"),
        reason.alias("drop_reason"),
        reason.isNull().alias("keep"),
    )


# (bucket_w, bucket_h) aspect prototypes — square, classic photo both
# orientations, widescreen both orientations, 2:1 panoramas.
DEFAULT_ASPECT_BUCKETS: tuple[tuple[int, int], ...] = (
    (1, 1),
    (4, 3),
    (3, 4),
    (16, 9),
    (9, 16),
    (2, 1),
    (1, 2),
)


def aspect_bucket_assign(
    df: DataFrame,
    buckets: tuple[tuple[int, int], ...] = DEFAULT_ASPECT_BUCKETS,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Assign each image to the aspect bucket minimizing distortion.

    Distance is the cross-multiplied integer ``|w*bh - h*bw|`` — the
    sign-free comparison of ``w/h`` vs ``bw/bh`` with NO division, so
    the argmin (ties to the lowest bucket index) is integer-exact.
    The argmin itself is ``array_min`` over a literal array of
    ``(distance, index)`` structs: one linear-size expression, fully
    codegen'd, no shuffle (the same struct-min idiom as ivf_assign —
    a CASE-WHEN fold would grow exponentially). Degenerate dims (NULL
    or <= 0) get a NULL bucket. Returns ``(id, bucket_idx, bucket_w,
    bucket_h)``."""
    if not buckets:
        raise ValueError("buckets must be non-empty")
    w, h = F.col(w_col).cast("long"), F.col(h_col).cast("long")
    degenerate = w.isNull() | h.isNull() | (w <= 0) | (h <= 0)
    arr = F.array(
        *[
            F.struct(
                F.abs(w * F.lit(int(bh)) - h * F.lit(int(bw))).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, (bw, bh) in enumerate(buckets)
        ]
    )
    # NULL-ing the index BEFORE element_at trips a Spark 4.1 codegen
    # bug (element_at with a CASE-null index returns an arbitrary
    # element instead of NULL), so the argmin stays non-null and the
    # degenerate guard wraps each output column instead.
    raw_idx = F.array_min(arr)["i"].cast("int")
    bws = F.array(*[F.lit(int(bw)) for bw, _ in buckets])
    bhs = F.array(*[F.lit(int(bh)) for _, bh in buckets])

    def _guard(col: F.Column) -> F.Column:
        return F.when(degenerate, F.lit(None)).otherwise(col)

    return df.select(
        F.col(id_col).alias("id"),
        _guard(raw_idx).alias("bucket_idx"),
        _guard(F.element_at(bws, raw_idx + 1)).alias("bucket_w"),
        _guard(F.element_at(bhs, raw_idx + 1)).alias("bucket_h"),
    )


def pack_shards(
    df: DataFrame,
    budget_bytes: int,
    id_col: str = "image_id",
    payload_cols: tuple[str, ...] = ("bytes", "caption"),
    range_col: str | None = None,
) -> DataFrame:
    """Deterministic WebDataset-style shard assignment.

    Every row gets ``shard_id = div(bytes_before_row, budget_bytes)``
    where ``bytes_before_row`` is the prefix sum of payload bytes in
    ``id_col`` order — so shards are contiguous id ranges holding
    ~``budget_bytes`` each (a row may straddle a boundary by design:
    it belongs to the shard its first byte falls in, the tar-writer
    convention). Payload size is ``octet_length`` summed over
    ``payload_cols`` (NULL -> 0), an int64 so the prefix sum is exact.

    Distributed prefix sum: with ``range_col`` (REQUIRED contract: a
    range key that sorts identically to a prefix of the id order and
    has unique ids within it), phase 1 aggregates one byte-total row
    per range and computes running offsets with a window over that
    TINY table; phase 2 broadcast-joins the offsets back and windows
    only within each range. No unbounded single-partition window ever
    touches the full data. Without ``range_col`` the whole input is
    one range — correct, but the window serializes (fine for tests,
    wrong at scale; callers at scale must pass a range key).

    Returns ``(id, payload_bytes, shard_id)``."""
    if budget_bytes <= 0:
        raise ValueError("budget_bytes must be > 0")
    payload = None
    for c in payload_cols:
        term = F.coalesce(F.octet_length(F.col(c)), F.lit(0)).cast("long")
        payload = term if payload is None else payload + term
    rng = F.col(range_col) if range_col else F.lit("")
    base = df.select(
        rng.alias("_rng"), F.col(id_col).alias("id"), payload.alias("payload_bytes")
    )
    totals = base.groupBy("_rng").agg(F.sum("payload_bytes").alias("_tot"))
    w_ranges = Window.orderBy("_rng").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_rng", F.coalesce(F.sum("_tot").over(w_ranges), F.lit(0)).alias("_off")
    )
    w_in = (
        Window.partitionBy("_rng").orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(offsets), "_rng")
        .withColumn(
            "_before",
            F.col("_off") + F.coalesce(F.sum("payload_bytes").over(w_in), F.lit(0)),
        )
        .select(
            "id",
            "payload_bytes",
            F.expr(f"div(_before, {int(budget_bytes)})").cast("int").alias("shard_id"),
        )
    )


def caption_frequency_filter(
    df: DataFrame,
    max_count: int = 10,
    id_col: str = "image_id",
    caption_col: str = "caption",
) -> DataFrame:
    """Drop every row whose normalized caption occurs more than
    ``max_count`` times in the corpus — the boilerplate-caption filter
    web-scraped image datasets run early (the LAION-2B analysis found
    the most frequent alt-texts are pure spam: "image may contain...",
    SKU templates, watermark notices; a caption shared by thousands of
    images carries no supervision signal).

    Normalization is trim + whitespace-collapse + lowercase; NULL /
    blank captions are never "spam" (there is no caption to repeat)
    and always survive.

    Scale plan (the point — a naive ``Window.partitionBy(caption)``
    would shuffle the full rows, bytes column included):

    1. count by ``xxhash64(norm_caption)`` — the shuffle carries
       8-byte keys with map-side partial aggregation, nothing else;
    2. keys with count > max_count are the hot set — tiny by
       construction (heavy hitters), so it BROADCASTS;
    3. exact confirm: only candidate rows (semi-join vs the broadcast
       hot keys) are re-counted by the FULL normalized caption, so a
       64-bit hash collision can never drop an innocent row — the
       same prefilter-then-confirm shape as the Bloom seen-set;
    4. survivors = broadcast anti-join of the original df against the
       confirmed hot captions. The full-width table is scanned once,
       never shuffled.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(caption_col)), r"\s+", " "))
    has_cap = F.col(caption_col).isNotNull() & (F.trim(F.col(caption_col)) != "")
    keyed = df.filter(has_cap).select(F.xxhash64(norm).alias("_ck"), norm.alias("_cap"))
    hot_keys = (
        keyed.groupBy("_ck").count().filter(F.col("count") > max_count).select("_ck")
    )
    hot_caps = (
        keyed.join(F.broadcast(hot_keys), "_ck", "left_semi")
        .groupBy("_cap")
        .count()
        .filter(F.col("count") > max_count)
        .select("_cap")
    )
    return df.join(
        F.broadcast(hot_caps), has_cap & (norm == F.col("_cap")), "left_anti"
    )


def curate(
    df: DataFrame,
    *,
    min_caption_tokens: int = 4,
    min_side_px: int = 16,
    max_aspect_milli: int = 3000,
    balance_col: str = "fmt",
    sample_target: int | None = None,
    shard_budget_bytes: int | None = None,
    range_col: str | None = None,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    caption_col: str = "caption",
    scrub_metadata: bool = False,
    min_colorfulness_milli: int | None = None,
    drop_grayscale: bool = False,
) -> DataFrame:
    """The end-to-end curation funnel every image+caption pre-training
    corpus runs, composed from this module's operators in one lazy
    plan (no materialization between stages — Catalyst sees the whole
    funnel and prunes/pushes across stage boundaries):

    0. **scrub** (when ``scrub_metadata``) — byte-level EXIF/XMP/
       comment removal (:func:`~.metadata.scrub_image_metadata`)
       before anything reads the payload, so the exact-dedup md5 in
       stage 2 collapses variants differing only in embedded metadata
       and every published byte is already scrubbed;
    1. **filter** — :func:`laion_filter` row rules (caption length,
       min side, aspect cap; degenerate dims dropped, not fatal);
    2. **exact dedup** — lowest-id survivor per ``md5(bytes)`` group
       (the cheap content-identity pass; run
       :func:`~.neardup.image_dedup_survivors` separately when
       perceptual near-dup pruning is wanted — it needs the phash
       column and its own banding plan);
    3. **balance** — :func:`~..functions.sampling.temperature_sample`
       over ``balance_col`` when ``sample_target`` is given (sqrt
       temperature, deterministic md5-keyed selection);
    4. **pack** — :func:`pack_shards` assignment when
       ``shard_budget_bytes`` is given (pass ``range_col`` at scale —
       see pack_shards' contract).

    Returns the surviving rows with ``sample_rank``/``group_quota``
    (when sampling) and ``shard_id``/``payload_bytes`` (when packing)
    attached.

    Scale shape — the WIDE rows (payload bytes) shuffle on exactly one
    key, ``id_col``: every stage runs over a NARROW projection (ids,
    16-byte dedup keys, group labels, byte lengths — md5/octet_length
    are computed at the scan, so the bytes themselves never enter a
    stage exchange), and the narrow survivors join back onto the wide
    scan by id at the end. AQE reuses the id-partitioning across the
    stacked id-joins. NULL-``bytes`` rows are singleton dedup clusters
    (per-row key fallback — the md5-NULL-folding trap documented at
    ``dedup/exact.soft_dedup_weights``), never folded and dropped."""
    if scrub_metadata:
        from .metadata import scrub_image_metadata

        scrubbed = scrub_image_metadata(df, id_col=id_col)
        df = df.drop(bytes_col).join(
            scrubbed.select(
                F.col("image_id").alias(id_col), F.col("bytes").alias(bytes_col)
            ),
            id_col,
        )
    flags = laion_filter(
        df,
        min_caption_tokens=min_caption_tokens,
        min_side_px=min_side_px,
        max_aspect_milli=max_aspect_milli,
        id_col=id_col,
        caption_col=caption_col,
    )
    keep_ids = flags.filter(F.col("keep")).select(F.col("id").alias(id_col))
    if min_colorfulness_milli is not None or drop_grayscale:
        # 1c. pixel-level color gate (quality.image_color_stats):
        # decode ONLY the metadata-filter survivors (the expensive
        # Arrow kernel runs after the cheap row rules prune), drop
        # rows below the Hasler-Süsstrunk colorfulness floor and/or
        # exactly-neutral grayscale payloads. Undecodable rows (NULL
        # metrics) fail the gate — a curation funnel cannot train on
        # them (contrast the standalone audit, which only reports).
        from .quality import image_color_stats

        cm_in = df.join(keep_ids, id_col).select(
            F.col(id_col).alias("image_id"),
            F.lit("").alias("fmt"),
            F.col(bytes_col).alias("bytes"),
        )
        cond = F.lit(True)
        if min_colorfulness_milli is not None:
            cond = cond & (
                F.col("colorfulness_milli") >= F.lit(int(min_colorfulness_milli))
            )
        if drop_grayscale:
            cond = cond & (F.col("gray_frac_milli") < F.lit(1000))
        keep_ids = (
            image_color_stats(cm_in)
            .filter(cond)
            .select(F.col("image_id").alias(id_col))
        )
    dkey = F.when(
        F.col(bytes_col).isNull(),
        F.concat(F.lit("null:"), F.col(id_col).cast("string")),
    ).otherwise(F.md5(F.col(bytes_col)))
    w_dup = Window.partitionBy("_dk").orderBy(id_col)
    survivors = (
        df.select(F.col(id_col), dkey.alias("_dk"))
        .join(keep_ids, id_col)
        .withColumn("_rn", F.row_number().over(w_dup))
        .filter(F.col("_rn") == 1)
        .select(id_col)
    )
    if sample_target is not None:
        from ..functions.sampling import temperature_sample

        survivors = temperature_sample(
            df.select(id_col, balance_col).join(survivors, id_col),
            balance_col,
            id_col,
            sample_target,
        ).select(id_col, "sample_rank", "group_quota")
    out = df.join(survivors, id_col)
    if shard_budget_bytes is not None:
        # pack_shards projects narrow (range, id, byte-length) itself;
        # only its tiny assignment joins back onto the wide rows
        assign = pack_shards(
            out,
            shard_budget_bytes,
            id_col=id_col,
            payload_cols=(bytes_col, caption_col),
            range_col=range_col,
        )
        out = out.join(
            assign.select(F.col("id").alias(id_col), "payload_bytes", "shard_id"),
            id_col,
        )
    return out


def caption_blocklist_filter(
    df: DataFrame,
    terms: list[str],
    id_col: str = "image_id",
    caption_col: str = "caption",
) -> DataFrame:
    """Safety-term blocklist over captions — the NSFW/unsafe-content
    screening pass LAION/DataComp run before training (Schuhmann et
    al. §3 run a word-list + classifier stage; this is the word-list
    half, the classifier being a model-dependent plug-in).

    Returns ``(id, n_hits, keep)``: ``n_hits`` counts how many
    DISTINCT blocklist terms occur (word-boundary, case-insensitive),
    ``keep = n_hits == 0``. Counting distinct terms rather than
    reporting "the" matching term keeps the output order-free and
    engine-exact (regex alternation tie-breaks differ across engines;
    a per-term boolean sum cannot).

    Plan shape: one row-local expression per term (codegen'd
    alternation of ``rlike``s), zero shuffle, NULL caption -> 0 hits.
    Contract: term lists up to O(100); a 10^4-term lexicon should
    instead tokenize captions and broadcast-join the term set (the
    ``caption_frequency_filter`` shape)."""
    if not terms:
        raise ValueError("terms must be non-empty")
    import re as _re

    hits = None
    for t in terms:
        # \b only binds between a word char and a non-word char: a term
        # whose edge is non-word ("c++", "18+") would make \b...\b
        # unmatchable, so anchor each edge conditionally
        lead = r"\b" if _re.match(r"\w", t) else r"(?<!\w)"
        tail = r"\b" if _re.search(r"\w$", t) else r"(?!\w)"
        pat = "(?i)" + lead + _re.escape(t.lower()) + tail
        h = F.when(F.col(caption_col).rlike(pat), 1).otherwise(0)
        hits = h if hits is None else hits + h
    n_hits = F.coalesce(hits, F.lit(0)).cast("int")
    return df.select(
        F.col(id_col).alias("id"),
        n_hits.alias("n_hits"),
        (n_hits == 0).alias("keep"),
    )
