"""Near-duplicate image detection over 64-bit perceptual hashes.

The reference derives image identity from the download filename alone
(e.g. zoro_products_spider.py:94-96, save_images_pipeline.py:27-41), so
the same product photo re-hosted under two URLs counts as two images.
The engine's payload table carries a content ``phash`` (imaging/codec.py
:phash64) instead; this module finds near-duplicate *pairs* by Hamming
distance over that column.

Scale shape — banded equi-join, never all-pairs: each 64-bit phash is
split into ``n_bands`` contiguous bit-bands and exploded to one row per
band; candidates are pairs agreeing exactly on at least one band
(equi-join on ``(band, band_value)``), then confirmed with a JVM-side
``bit_count(xor)``. By pigeonhole, any pair with Hamming distance
``d <= n_bands - 1`` must agree on some band, so for
``threshold <= n_bands - 1`` the result is EXACT, not approximate —
the same guarantee-by-banding idea as the MinHash-LSH text path
(functions/similarity.py:102), but lossless because the band key is the
raw bits. Cost is one explode (n_bands rows/image), one shuffle on the
band key, and a distinct over surviving pairs; a 10^10-image table
never sees a cartesian product. Skewed bands (e.g. all-zero band from
flat images) behave like any hot join key and are handled by AQE
skew-join splitting.

Everything is built-in column algebra (shift/mask/xor/bit_count) —
whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import hamming64


def phash_band_cols(phash, n_bands: int = 8):
    """List of ``n_bands`` band-value columns (contiguous bit slices)."""
    if 64 % n_bands != 0:
        raise ValueError("n_bands must divide 64")
    width = 64 // n_bands
    mask = (1 << width) - 1
    return [
        F.shiftrightunsigned(phash, i * width).bitwiseAND(F.lit(mask))
        for i in range(n_bands)
    ]


def phash_neardup_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    threshold: int = 7,
    n_bands: int = 8,
) -> DataFrame:
    """Exact (id_a, id_b, dist) pairs with Hamming(phash) <= threshold.

    Requires ``threshold <= n_bands - 1`` (the pigeonhole bound that
    makes banding lossless). Returns id_a < id_b, each pair once.
    """
    if threshold > n_bands - 1:
        raise ValueError(
            f"threshold={threshold} breaks the pigeonhole exactness bound "
            f"for n_bands={n_bands}; raise n_bands or lower threshold"
        )
    bands = df.select(
        F.col(id_col).alias("_id"),
        F.col(phash_col).alias("_ph"),
        F.posexplode(F.array(*phash_band_cols(F.col(phash_col), n_bands))).alias(
            "band", "bv"
        ),
    )
    left = bands.select(
        F.col("_id").alias("id_a"), F.col("_ph").alias("ph_a"), "band", "bv"
    )
    right = bands.select(
        F.col("_id").alias("id_b"), F.col("_ph").alias("ph_b"), "band", "bv"
    )
    return (
        left.join(right, ["band", "bv"])  # equi-join: shuffle-hash/SMJ, no cartesian
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", hamming64(F.col("ph_a"), F.col("ph_b")))
        .filter(F.col("dist") <= threshold)
        .select("id_a", "id_b", "dist")
        .distinct()  # a close pair can agree on several bands
    )


def image_dedup_survivors(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    phash_col: str = "phash",
    threshold: int = 2,
    n_bands: int = 8,
    transitive: bool = False,
    max_iters: int = 50,
    prefer: Column | None = None,
) -> DataFrame:
    """Composed image dedup — the image-payload twin of
    dedup/text_corpus.dedup_corpus: exact byte-identity dedup first
    (first-wins by lowest id per md5(bytes) group — the cheap pass
    that kills re-hosted identical files), then perceptual near-dup
    pruning among the exact survivors via the banded-exact
    :func:`phash_neardup_pairs` (lowest-id keeper). The reference
    counts the same photo under two URLs as two images
    (save_images_pipeline.py:27-41); this is the content-identity
    pass a training corpus needs instead.

    ``transitive=False`` (default) drops the GREATER id of every
    near-dup pair — cheap, one anti-join, but a chain A≈B≈C keeps
    only A while B is dropped for being A's pair and C for being B's
    even if A!≈C. ``transitive=True`` runs min-label connected
    components over the pair graph (O(diameter) join rounds, 8-byte
    rows) and keeps exactly one lowest-id image per CLUSTER — the
    same semantics/flag as dedup_corpus.

    ``prefer`` (requires ``transitive=True``) replaces the lowest-id
    keeper with an explicit ranking: the row that sorts FIRST by
    ``(prefer ASC, id ASC)`` survives each exact-byte group and each
    near-dup cluster. The LAION-style use is keeping the
    best-captioned copy of a re-hosted image —
    ``prefer=-F.size(F.split("caption", " "))`` keeps the longest
    caption. Pairwise mode has no per-cluster keeper to rank (it drops
    the greater id of every pair), so ``prefer`` there is a ValueError.

    NULL-``bytes`` rows carry no content to compare and pass through
    untouched (the dedup_corpus NULL-text contract; a NULL md5 would
    otherwise collapse them into one group). Returns the surviving
    rows with their original columns. Scale: one md5-keyed shuffle +
    the banded phash equi-join — no all-pairs anywhere."""
    from pyspark.sql import Window

    if prefer is not None and not transitive:
        raise ValueError("prefer= needs cluster semantics: pass transitive=True")
    order = ([prefer] if prefer is not None else []) + [F.col(id_col)]
    no_bytes = df.filter(F.col(bytes_col).isNull())
    with_bytes = df.filter(F.col(bytes_col).isNotNull())
    w = Window.partitionBy("_fp").orderBy(*order)
    exact = (
        with_bytes.withColumn("_fp", F.md5(F.col(bytes_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )
    pairs = phash_neardup_pairs(
        exact, id_col=id_col, phash_col=phash_col, threshold=threshold, n_bands=n_bands
    )
    if transitive:
        from ..dedup.text_corpus import min_label_components

        labels = min_label_components(pairs, a_col="id_a", b_col="id_b", max_iters=max_iters)
        if prefer is not None:
            # rank inside each component (singletons = their own id)
            clustered = exact.join(
                labels.withColumnRenamed("node", id_col), id_col, "left"
            ).withColumn("_cluster", F.coalesce(F.col("label"), F.col(id_col)))
            cw = Window.partitionBy("_cluster").orderBy(*order)
            return (
                clustered.withColumn("_rn", F.row_number().over(cw))
                .filter(F.col("_rn") == 1)
                .drop("_cluster", "label", "_rn")
                .unionByName(no_bytes)
            )
        losers = labels.filter(F.col("node") != F.col("label")).select(
            F.col("node").alias(id_col)
        )
    else:
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return exact.join(losers, id_col, "left_anti").unionByName(no_bytes)


def image_caption_dedup(
    df: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    caption_col: str = "caption",
    threshold: int = 2,
    n_bands: int = 8,
    max_iters: int = 50,
) -> DataFrame:
    """Joint multimodal dedup: two rows are duplicates if their IMAGES
    near-dup (banded phash Hamming <= threshold) OR their CAPTIONS are
    exact after normalization (trim + whitespace-collapse + lowercase)
    — the both-signals policy web image+caption corpora need, since a
    re-hosted image usually changes either the pixels (recompress) or
    the alt-text (site template) but rarely both.

    Clustering is over the UNION of the two edge sets (min-label
    connected components, same machinery as image_dedup_survivors
    ``transitive=True``), so a chain linked alternately by image and
    caption edges still collapses to one survivor — the lowest id.
    NULL/blank captions contribute no caption edges; NULL phash rows
    contribute no image edges (a row with neither signal always
    survives).

    Scale: image edges come from the pigeonhole-exact banded equi-join
    (no all-pairs); caption edges are built as a STAR to each group's
    min id (one window over caption groups), never the quadratic
    within-group pair set — a 10^6-row spam-caption group contributes
    10^6-1 edges, not 10^12."""
    from pyspark.sql import Window

    from ..dedup.text_corpus import min_label_components

    img_edges = phash_neardup_pairs(
        df.filter(F.col(phash_col).isNotNull()),
        id_col=id_col,
        phash_col=phash_col,
        threshold=threshold,
        n_bands=n_bands,
    ).select("id_a", "id_b")
    norm = F.lower(F.regexp_replace(F.trim(F.col(caption_col)), r"\s+", " "))
    capped = df.filter(
        F.col(caption_col).isNotNull() & (F.trim(F.col(caption_col)) != "")
    ).select(F.col(id_col).alias("_id"), norm.alias("_cap"))
    w = Window.partitionBy("_cap")
    cap_edges = (
        capped.withColumn("_root", F.min("_id").over(w))
        .filter(F.col("_id") != F.col("_root"))
        .select(F.col("_root").alias("id_a"), F.col("_id").alias("id_b"))
    )
    edges = img_edges.unionByName(cap_edges)
    labels = min_label_components(edges, a_col="id_a", b_col="id_b", max_iters=max_iters)
    losers = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def image_dedup_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    phash_col: str = "phash",
    threshold: int = 7,
    n_bands: int = 8,
    dedup_within: bool = True,
) -> DataFrame:
    """Incremental image ingestion dedup — the image twin of
    ``dedup/text_corpus.dedup_against_corpus``: survivors of a NEW
    image batch that duplicate neither each other nor the EXISTING
    corpus, by exact byte identity (md5 anti-join) then perceptual
    near-identity (cross-set banded phash Hamming, pigeonhole-EXACT
    for ``threshold <= n_bands - 1``; within-set pairs never emitted).

    NULL-``bytes`` rows pass through (nothing to compare — same
    contract as :func:`image_dedup_survivors`); a NULL phash skips
    only the perceptual pass. The corpus side is read-only context:
    dedup IT with :func:`image_dedup_survivors` separately.

    Scale shape: md5/band keys are computed at the scan, so payload
    bytes never enter an exchange; the exact pass anti-joins 16-byte
    keys, the perceptual pass is the same (band, bits) equi-join as
    :func:`phash_neardup_pairs` — a 10^10-image corpus never sees a
    cartesian product."""
    if threshold > n_bands - 1:
        raise ValueError(
            f"threshold={threshold} breaks the pigeonhole exactness bound "
            f"for n_bands={n_bands}; raise n_bands or lower threshold"
        )
    base = (
        image_dedup_survivors(
            new_df, id_col=id_col, bytes_col=bytes_col, phash_col=phash_col,
            threshold=threshold, n_bands=n_bands,
        )
        if dedup_within
        else new_df
    )
    no_bytes = base.filter(F.col(bytes_col).isNull())
    cand = base.filter(F.col(bytes_col).isNotNull())
    corpus_live = corpus_df.filter(F.col(bytes_col).isNotNull())
    corpus_md5 = corpus_live.select(F.md5(F.col(bytes_col)).alias("_k")).distinct()
    ex = (
        cand.withColumn("_k", F.md5(F.col(bytes_col)))
        .join(corpus_md5, "_k", "left_anti")
        .drop("_k")
    )

    def _bands(df, idc):
        return df.filter(F.col(phash_col).isNotNull()).select(
            F.col(id_col).alias(idc),
            F.col(phash_col).alias(f"_ph_{idc}"),
            F.posexplode(
                F.array(*phash_band_cols(F.col(phash_col), n_bands))
            ).alias("band", "bv"),
        )

    nb = _bands(ex, "id_new")
    cb = _bands(corpus_live, "id_old")
    losers = (
        nb.join(cb, ["band", "bv"])
        .withColumn("dist", hamming64(F.col("_ph_id_new"), F.col("_ph_id_old")))
        .filter(F.col("dist") <= threshold)
        .select(F.col("id_new").alias("_loser"))
        .distinct()
    )
    return ex.join(losers, ex[id_col] == losers["_loser"], "left_anti").unionByName(
        no_bytes
    )
