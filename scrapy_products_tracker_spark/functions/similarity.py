"""Similarity / near-dup operators: MinHash+LSH, SimHash, cosine ANN.

Built for 100 TB corpora, so every stage is declarative DataFrame
algebra that shuffles only narrow keys:

- **MinHash**: word-k-shingles built JVM-side with higher-order
  functions (``transform`` over a ``sequence`` of token offsets — no
  UDF, no explode of raw text), hashed with ``xxhash64``; the n
  permutations are affine maps (a_i*x+b_i mod p) evaluated as column
  expressions; signatures reduce with one ``groupBy(doc).agg(n mins)``
  (map-side partial aggregation keeps the shuffle at n longs/doc).
- **LSH banding**: signature -> b bands of r rows; band hash joins
  band-to-band (equi-join, AQE-skew-safe) to emit candidate pairs;
  exact Jaccard verification only on candidates.
- **SimHash**: 64 per-bit weighted sums via bit tests on the token
  hash — again one groupBy.agg.
- **ANN cosine**: brute-force top-k via ``zip_with``/``aggregate``
  (JVM), the correct baseline; LSH-bucketed variant (deterministic
  random hyperplanes) as the scale path — buckets co-partition the
  corpus so each query probes one bucket's partitions.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne-31 keeps a_i * x below 2^62 — safe under ANSI long arithmetic
_MERSENNE31 = (1 << 31) - 1


def _perm_params(n_hashes: int, seed: int) -> tuple[list[int], list[int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE31, n_hashes, dtype=np.int64).tolist()
    b = rng.integers(0, _MERSENNE31, n_hashes, dtype=np.int64).tolist()
    return a, b


def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-shingles as an array<string>, built with higher-order
    functions (no UDF). Docs shorter than k tokens get one shingle =
    the whole text."""
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.transform(idx, lambda i: F.concat_ws(" ", *[
        F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)
    ]))).otherwise(F.array(F.concat_ws(" ", F.trim(text))))


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 32, k: int = 3, seed: int = 42
) -> DataFrame:
    """(id, sig_0..sig_{n-1}) MinHash signature table.

    Shingle hashes are built with posexplode + window ``lead`` over
    per-token hashes (all whole-stage-codegen operators) rather than
    array higher-order functions — Spark evaluates HOF lambdas in
    interpreted mode, which was ~10x slower on real text. The window's
    hash partitioning by doc is reused by the final groupBy (one
    shuffle total). Docs shorter than k tokens contribute one shingle
    (the whole text), matching ``shingles_col`` semantics.
    """
    from pyspark.sql import Window

    a, b = _perm_params(n_hashes, seed)
    M = F.lit(_MERSENNE31)
    # per-offset combine coefficients (deterministic, coprime with M)
    coefs = [pow(1315423911, j + 1, _MERSENNE31) for j in range(k)]

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col).alias("doc"), F.trim(F.col(text_col)).alias("_t"), toks.alias("_toks"))

    long_docs = base.filter(F.size("_toks") >= k).select(
        "doc", F.posexplode("_toks").alias("pos", "tok")
    ).select("doc", "pos", F.pmod(F.xxhash64("tok"), M).alias("h"))
    w = Window.partitionBy("doc").orderBy("pos")
    # rolling combine of k consecutive token hashes (each term < 2^31,
    # products reduced mod M before the k-term sum -> no long overflow)
    terms = [F.pmod(F.col("h") * F.lit(coefs[0]), M)] + [
        F.pmod(F.lead("h", j).over(w) * F.lit(coefs[j]), M) for j in range(1, k)
    ]
    combined = terms[0]
    for t in terms[1:]:
        combined = combined + t
    sh_long = long_docs.select("doc", F.pmod(combined, M).alias("x")).filter(
        F.col("x").isNotNull()
    )

    sh_short = base.filter(F.size("_toks") < k).select(
        "doc", F.pmod(F.xxhash64("_t"), M).alias("x")
    )
    sh = sh_long.unionByName(sh_short)
    aggs = [
        F.min(F.pmod(F.col("x") * F.lit(a[i]) + F.lit(b[i]), F.lit(_MERSENNE31))).alias(f"sig_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, n_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """Docs sharing any LSH band -> (doc_a, doc_b) candidate pairs.

    Bands are emitted in ONE pass over the signature table with
    ``explode(array(struct...))`` — a union of per-band selects would
    re-execute the (expensive) signature subtree once per band. Callers
    should persist ``sig`` if they also verify candidates against it.
    """
    bands_df = _band_table(sig, n_hashes, bands)
    left = bands_df.select(F.col("doc").alias("doc_a"), "band", "bh")
    right = bands_df.select(F.col("doc").alias("doc_b"), "band", "bh")
    return (
        left.join(right, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _band_table(sig: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """(doc, band, bh) LSH band rows — one explode pass, xxhash64 of
    the band's signature slice (shared by the within-set and cross-set
    candidate generators)."""
    r = n_hashes // bands
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(
                F.concat_ws("_", *[F.col(f"sig_{bi * r + j}").cast("string") for j in range(r)])
            ).alias("bh"),
        )
        for bi in range(bands)
    ]
    return sig.select(
        "doc", F.explode(F.array(*band_structs)).alias("_b")
    ).select("doc", F.col("_b.band").alias("band"), F.col("_b.bh").alias("bh"))


def lsh_cross_candidates(
    sig_a: DataFrame, sig_b: DataFrame, n_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """Cross-set LSH candidates: (doc_a from ``sig_a``, doc_b from
    ``sig_b``) sharing any band — the incremental-ingestion shape
    (new batch vs existing corpus) where within-set pairs are
    deliberately NOT emitted. Same banded equi-join scale contract as
    :func:`lsh_candidate_pairs`: never all-pairs, candidates bounded
    by band-bucket occupancy."""
    ba = _band_table(sig_a, n_hashes, bands).select(
        F.col("doc").alias("doc_a"), "band", "bh"
    )
    bb = _band_table(sig_b, n_hashes, bands).select(
        F.col("doc").alias("doc_b"), "band", "bh"
    )
    return ba.join(bb, ["band", "bh"]).select("doc_a", "doc_b").distinct()


def minhash_jaccard_estimate(sig: DataFrame, pairs: DataFrame, n_hashes: int = 32) -> DataFrame:
    """Estimated Jaccard = fraction of matching signature slots."""
    a = sig.select(F.col("doc").alias("doc_a"), *[F.col(f"sig_{i}").alias(f"a_{i}") for i in range(n_hashes)])
    b = sig.select(F.col("doc").alias("doc_b"), *[F.col(f"sig_{i}").alias(f"b_{i}") for i in range(n_hashes)])
    j = pairs.join(a, "doc_a").join(b, "doc_b")
    matches = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0) for i in range(n_hashes)
    )
    return j.select(
        "doc_a", "doc_b", (matches.cast("double") / F.lit(float(n_hashes))).alias("jaccard_est")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens (near-dup fingerprint)."""
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("t"),
    ).select("doc", F.xxhash64("t").alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b_{i}")
        for i in range(64)
    ]
    agg = tok.groupBy("doc").agg(*bit_sums)
    # assemble sign bits into one signed int64 (bit 63 via subtraction)
    val = sum(
        (F.when(F.col(f"b_{i}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << i)).cast("long")
        for i in range(63)
    )
    # bit 63: subtract 2^63 as two in-range 2^62 steps (ANSI-safe)
    top = F.when(F.col("b_63") > 0, F.lit(1 << 62)).otherwise(F.lit(0)).cast("long")
    val = val - top - top
    return agg.select("doc", val.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: int = 7,
    n_bands: int = 8,
) -> DataFrame:
    """(id_a, id_b, dist) text pairs with Hamming(simhash) <= threshold
    — SimHash fingerprints paired by the generic banded int64 Hamming
    join (imaging/neardup.py): EXACT for threshold <= n_bands - 1 by
    pigeonhole, equi-join only, never all-pairs."""
    from ..imaging.neardup import phash_neardup_pairs

    sig = simhash64(df, id_col, text_col)
    return phash_neardup_pairs(
        sig, id_col="doc", phash_col="simhash", threshold=threshold, n_bands=n_bands
    )


# --- cosine ANN ----------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_topk_bruteforce(
    corpus: DataFrame, query_vec: list[float], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k by cosine (TakeOrderedAndProject — no full sort).
    The correctness baseline every approximate variant is judged by."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = corpus.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col).cast("array<double>"), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def random_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection LSH bucket id (random hyperplane hashing,
    Charikar'02 — public). Bucket co-partitions the corpus; a query
    probes only its own bucket (and optionally neighbors)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        h = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec.cast("array<double>"), h) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("long")
    return bucket


def ann_topk_lsh(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only the query's LSH bucket."""
    dim = len(query_vec)
    planes = random_hyperplanes(n_planes, dim, seed)
    qb = int(
        sum(
            (1 << i)
            for i, p in enumerate(planes)
            if float(np.dot(np.asarray(p), np.asarray(query_vec))) >= 0
        )
    )
    bucketed = corpus.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
    return ann_topk_bruteforce(
        bucketed.filter(F.col("_bucket") == qb), query_vec, k, id_col, vec_col
    )


def lsh_band_buckets(
    corpus: DataFrame,
    dim: int,
    n_bands: int = 4,
    planes_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket) rows: per band, the sign-pattern bucket over
    that band's hyperplanes — the banded variant of ``lsh_bucket_col``
    (same AND-OR amplification as MinHash banding: all signs in one
    band must agree, any band may match). Emitted in ONE pass with
    ``explode`` so the corpus is scanned once."""
    planes = random_hyperplanes(n_bands * planes_per_band, dim, seed)
    structs = []
    for b in range(n_bands):
        sub = planes[b * planes_per_band : (b + 1) * planes_per_band]
        structs.append(
            F.struct(
                F.lit(b).alias("band"),
                lsh_bucket_col(F.col(vec_col), sub).alias("bucket"),
            )
        )
    return corpus.select(
        F.col(id_col), F.explode(F.array(*structs)).alias("_b")
    ).select(id_col, F.col("_b.band").alias("band"), F.col("_b.bucket").alias("bucket"))


def embedding_neardup_lsh(
    corpus: DataFrame,
    threshold: float = 0.2,
    n_bands: int = 4,
    planes_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, the 100-TB path: banded
    hyperplane-LSH candidates via (band, bucket) equi-join — never an
    all-pairs or modulo-banded self-join — then exact cosine
    verification on candidates only. The structural twin of the
    MinHash-LSH text path (sign-LSH per Charikar'02); candidate volume
    is governed by n_bands x planes_per_band exactly like (b, r) in
    MinHash banding.

    ``dim`` inference runs one tiny job (first non-null vector); pass it
    explicitly to keep plan construction lazy. An empty/all-null corpus
    returns an empty pair frame."""
    if dim is None:
        row = corpus.select(vec_col).filter(F.col(vec_col).isNotNull()).head()
        if row is None:
            return corpus.select(
                F.col(id_col).alias("vec_a"),
                F.col(id_col).alias("vec_b"),
                F.lit(0.0).alias("cosine"),
            ).limit(0)
        dim = len(row[0])
    bb = lsh_band_buckets(corpus, dim, n_bands, planes_per_band, seed, id_col, vec_col)
    left = bb.select(F.col(id_col).alias("_ida"), "band", "bucket")
    right = bb.select(F.col(id_col).alias("_idb"), "band", "bucket")
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb")
        .distinct()
    )
    v = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    a = v.select(F.col(id_col).alias("_ida"), F.col("_v").alias("_va"))
    b = v.select(F.col(id_col).alias("_idb"), F.col("_v").alias("_vb"))
    return (
        cand.join(a, "_ida")
        .join(b, "_idb")
        .select(
            F.col("_ida").alias("vec_a"),
            F.col("_idb").alias("vec_b"),
            F.round(cosine_sim(F.col("_va"), F.col("_vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# --- IVF (inverted-file) ANN ---------------------------------------------


def ivf_centroids_first(
    corpus: DataFrame, n_cells: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic coarse quantizer: the ``n_cells`` lowest-id corpus
    vectors serve as cell centroids. (A k-means refinement would iterate
    from exactly this seed set; the IVF *operator contract* — broadcast
    centroids, argmax-cosine assignment, cell-pruned probe — is
    identical, and determinism is what the cross-engine oracle needs.)
    The result is tiny (n_cells × dim doubles) and always broadcast."""
    return (
        corpus.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.col(id_col).alias("cell_id"),
            F.col(vec_col).cast("array<double>").alias("cvec"),
        )
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell_id) inverted-file assignment, shuffle-free: the tiny
    centroid table (n_cells × dim doubles, well under a megabyte by
    contract — see ivf_centroids_first) is collected into literal column
    expressions, and each vector's max-cosine cell (ties → lowest
    cell_id) is a row-local fold over n_cells CASE branches. The argmax
    over ≤n_cells candidates needs no join and no window, so the
    assignment subtree contains NO Exchange at any corpus size (plan-
    tested) — at scale it is written once into the index table
    (partitioned BY cell_id) and reused by every query."""
    rows = centroids.select("cell_id", "cvec").collect()
    return corpus.select(F.col(id_col), _ivf_cell_expr(rows, vec_col).alias("cell_id"))


def _ivf_cell_expr(centroid_rows, vec_col: str):
    """Row-local argmax-cosine cell id as a pure column expression (the
    form shared by ivf_assign and ann_topk_ivf): ``array_min`` over
    structs of (-cosine, cell_id) — max cosine, ties to the LOWEST
    cell_id, in ONE linear-size expression. (A CASE-WHEN fold here is a
    trap: each step embeds the accumulator ~4x, an exponentially-sized
    tree that OOMs the driver while *constructing* the plan at 16
    cells.) NaN cosines (zero-norm vectors) sort last, so a degenerate
    vector lands in its lowest-id cell."""
    if not centroid_rows:
        raise ValueError("empty centroid table")
    vec = F.col(vec_col).cast("array<double>")
    cands = [
        F.struct(
            (-F.round(cosine_sim(vec, F.array(*[F.lit(float(x)) for x in r["cvec"]])), 6)).alias(
                "nc"
            ),
            F.lit(r["cell_id"]).alias("cell"),
        )
        for r in centroid_rows
    ]
    return F.array_min(F.array(*cands))["cell"]


def kmeans_refine(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
):
    """Lloyd's k-means refinement of the IVF coarse quantizer (public
    textbook algorithm; FAISS trains IVF cells the same way): start
    from the deterministic ``ivf_centroids_first`` seed, then repeat —
    assign every vector to its max-cosine cell (ties → lowest cell_id),
    recompute each cell's centroid as the member mean. Returns
    ``(centroids, assign_df)``: the refined centroid dict
    {cell_id: [floats]} and the final assignment DataFrame
    (id_col, cell_id) computed against it.

    Scale shape: each iteration is ONE row-local assignment pass (the
    literal-centroid argmax fold of ``_ivf_cell_expr`` — zero Exchange,
    same plan as ivf_assign) plus ONE (cell,dim)-keyed mean aggregate
    whose result is k x dim rows — the only driver materialization, by
    the same tiny-table contract as ivf_assign's centroid collect.
    Centroid components are rounded to ``round_to`` decimals each
    iteration so the fixpoint is engine-independent (float mean order
    differences live below the rounding)."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    seed = ivf_centroids_first(corpus, n_cells, id_col, vec_col).collect()
    cents = {r["cell_id"]: [float(x) for x in r["cvec"]] for r in seed}
    if not cents:
        raise ValueError("kmeans_refine: empty corpus (no seed centroids)")
    dim = len(next(iter(cents.values())))
    vecs = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    for _ in range(iters):
        rows = [{"cell_id": c, "cvec": v} for c, v in sorted(cents.items())]
        assign = vecs.select(
            F.col(id_col), _ivf_cell_expr(rows, "_v").alias("cell_id"), "_v"
        )
        means = (
            assign.select("cell_id", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cell_id", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()  # <= n_cells x dim rows (tiny, by contract)
        )
        upd: dict[int, dict[int, float]] = {}
        for r in means:
            upd.setdefault(r["cell_id"], {})[r["pos"]] = round(r["m"], round_to)
        # empty cells keep their previous centroid (standard Lloyd's)
        cents = {
            c: ([upd[c][p] for p in range(dim)] if c in upd else v)
            for c, v in cents.items()
        }
    rows = [{"cell_id": c, "cvec": v} for c, v in sorted(cents.items())]
    final = vecs.select(F.col(id_col), _ivf_cell_expr(rows, "_v").alias("cell_id"))
    return cents, final


def _centroid_df(
    centroids, corpus: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> DataFrame:
    """Resolve the coarse quantizer for the IVF probe paths: ``None``
    -> the deterministic lowest-id seed (oracle-stable default); a dict
    ``{cell_id: [floats]}`` (what :func:`kmeans_refine` returns) or a
    ``(cell_id, cvec)`` DataFrame -> used as-is. Either way the table
    is tiny by the ivf_assign contract (n_cells x dim doubles)."""
    if centroids is None:
        return ivf_centroids_first(corpus, n_cells, id_col, vec_col)
    if isinstance(centroids, dict):
        if not centroids:
            raise ValueError("empty centroid dict")
        return corpus.sparkSession.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in sorted(centroids.items())],
            "cell_id bigint, cvec array<double>",
        )
    return centroids.select(
        F.col("cell_id"), F.col("cvec").cast("array<double>").alias("cvec")
    )


def ann_topk_ivf(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """IVF approximate top-k: probe only the query's ``n_probe`` nearest
    cells, brute-force inside them — the classic inverted-file ANN
    (Sivic/Zisserman'03 video-google vocabularies; FAISS IVF-Flat is the
    same public structure). Complements ``ann_topk_lsh``: IVF prunes by
    data-adaptive cells, LSH by data-oblivious hyperplanes. Scales as
    ~n_probe/n_cells of the corpus scored per query.

    ``centroids`` plugs a TRAINED quantizer into the probe path — pass
    :func:`kmeans_refine`'s centroid dict (or any ``(cell_id, cvec)``
    DataFrame); ``n_cells`` is then ignored. Default stays the
    deterministic lowest-id seed set.

    Plan shape: cell assignment is the row-local ``_ivf_cell_expr``
    fold (no self-join of the corpus on id, no window — zero Exchange),
    the probe set is a broadcast semi-side, and the tail is
    TakeOrderedAndProject — unchanged whichever quantizer is passed."""
    cdf = _centroid_df(centroids, corpus, n_cells, id_col, vec_col)
    rows = cdf.collect()
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    probed = (
        cdf.select(
            "cell_id", F.round(cosine_sim(F.col("cvec"), q), 6).alias("_qc")
        )
        .orderBy(F.desc("_qc"), "cell_id")
        .limit(n_probe)
        .select("cell_id")
    )
    assigned = corpus.withColumn("cell_id", _ivf_cell_expr(rows, vec_col))
    cand = assigned.join(F.broadcast(probed), "cell_id")
    return ann_topk_bruteforce(cand, query_vec, k, id_col, vec_col)


def paired_alignment(
    emb: DataFrame,
    threshold_micro: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """CLIP-score-style image↔caption alignment over paired embeddings.

    LAION/DataComp's single most important curation filter is the CLIP
    score: cosine(image_embedding, text_embedding) per pair, dropping
    rows below a threshold (LAION-400M kept cos >= 0.3). This is that
    filter as a Spark operator over a table where pair members share a
    pair id — here the conventional layout of one embeddings table
    holding both modalities, image rows at even ids and caption rows
    at odd ids, pair p = rows (2p, 2p+1).

    Returns ``(pair_id, img_id, txt_id, cosine, keep)`` with cosine
    rounded to 6 dp (the established cross-engine float contract —
    both engines compute the same correctly-rounded double sum over
    the same element order, and 6 dp absorbs the final-ulp wiggle) and
    ``keep = cosine >= threshold_micro/1e6``.

    Plan shape / scale: splitting even/odd rows is a narrow filter on
    the SAME scan (Catalyst reuses it); the pair join is an equi-join
    on ``pair_id`` — with the table written bucketed/sorted by
    ``div(id,2)`` (the natural layout for paired modalities) it is a
    zero-shuffle zip; unbucketed it is one co-partitioned exchange of
    each side, the floor for re-pairing. No driver state, no Python.
    Unpaired rows (an even id with no odd sibling, or vice versa) drop
    via the inner join; a NULL vector yields NULL cosine and NULL
    keep — report-don't-crash, filter on ``keep`` explicitly."""
    # integer div, not float `/`: double division loses low bits for
    # ids >= 2^53 (hash/snowflake ids), collapsing adjacent pairs
    half = F.expr(f"`{id_col}` div 2").cast("long").alias("pair_id")
    img = emb.filter(F.col(id_col) % 2 == 0).select(
        half, F.col(id_col).alias("img_id"), F.col(vec_col).cast("array<double>").alias("_iv")
    )
    txt = emb.filter(F.col(id_col) % 2 == 1).select(
        half, F.col(id_col).alias("txt_id"), F.col(vec_col).cast("array<double>").alias("_tv")
    )
    cos = F.round(cosine_sim(F.col("_iv"), F.col("_tv")), 6)
    return (
        img.join(txt, "pair_id")
        .select(
            "pair_id",
            "img_id",
            "txt_id",
            cos.alias("cosine"),
            (cos >= F.lit(threshold_micro) / F.lit(1_000_000.0)).alias("keep"),
        )
    )


def hard_negative_mine(
    emb: DataFrame,
    k: int = 3,
    batch_size: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """In-batch hard-negative mining over the paired image/caption
    embeddings layout (see :func:`paired_alignment`: image rows at even
    ids, caption rows at odd ids, pair p = rows (2p, 2p+1)).

    Contrastive training (CLIP, Radford et al.'21; SigLIP) learns from
    each image's hardest *wrong* captions. The standard, scale-sane
    formulation is IN-BATCH mining: partition pairs into deterministic
    training batches (``batch_id = pair_id div batch_size``), and for
    each image anchor rank only the OTHER captions of its own batch by
    cosine — exactly what the in-batch softmax denominator sees. For
    each anchor the top-``k`` negatives (cosine desc, then neg pair id
    — a total order) are returned as
    ``(pair_id, neg_pair_id, batch_id, cosine, rank)``.

    Scale shape: the cross product is bounded to ``batch_size²`` per
    batch, so total work is ``N × batch_size`` — linear in corpus size
    for a fixed batch, never the O(N²) all-pairs blowup a naive "most
    similar caption anywhere" mine would be (that global variant is
    what the ANN path — ann_topk_ivfpq over caption vectors — is for).
    One equi-join shuffle on ``batch_id``; the per-anchor top-k window
    partitions on the anchor pair id (cardinality = N, no skew: every
    partition is exactly ``batch_size - 1`` rows). Cosine is rounded
    to 6 dp (the cross-engine float contract) and ranked AFTER
    rounding, so the order the oracle sees is the order ranked."""
    if k < 1 or batch_size < 2:
        raise ValueError("k >= 1 and batch_size >= 2 required")
    half = F.expr(f"`{id_col}` div 2").cast("long").alias("pair_id")
    batch = F.expr(f"(`{id_col}` div 2) div {int(batch_size)}").cast("long")
    img = emb.filter(F.col(id_col) % 2 == 0).select(
        half, batch.alias("batch_id"),
        F.col(vec_col).cast("array<double>").alias("_iv"),
    )
    txt = emb.filter(F.col(id_col) % 2 == 1).select(
        half.alias("neg_pair_id"), batch.alias("batch_id"),
        F.col(vec_col).cast("array<double>").alias("_tv"),
    )
    scored = (
        img.join(txt, "batch_id")
        .filter(F.col("pair_id") != F.col("neg_pair_id"))
        .select(
            "pair_id", "neg_pair_id", "batch_id",
            F.round(cosine_sim(F.col("_iv"), F.col("_tv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("pair_id").orderBy(F.desc("cosine"), "neg_pair_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("pair_id", "neg_pair_id", "batch_id", "cosine", "rank")
    )


def retrieval_recall_at_k(
    emb: DataFrame,
    ks: tuple = (1, 5, 10),
    batch_size: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Image→caption retrieval recall@k over the paired layout (see
    :func:`paired_alignment`) — THE standard evaluation of a
    CLIP-style model and of the curation pipeline feeding it (LAION/
    DataComp report exactly this number): within each deterministic
    batch (``pair_id div batch_size`` — the in-batch candidate set, as
    in training), rank ALL captions of the batch against each image
    anchor by cosine and ask whether the TRUE caption lands in the
    top k. Returns one row per k: ``(k, n_anchors, n_hits,
    recall_milli)`` with recall in integer milli units (floor), so the
    result is engine-exact.

    Rank definition: the true caption's rank = 1 + count of OTHER
    captions with strictly higher rounded cosine, or equal cosine and
    lower pair id (the same 6-dp-then-tiebreak total order the miner
    uses) — a COUNT, not a window, so the plan is one equi-join on
    ``batch_id`` + one groupBy per anchor; no per-batch sort.

    Scale shape: work is N × batch_size rows of narrow doubles —
    linear in corpus size, embarrassingly parallel, same contract as
    :func:`hard_negative_mine`."""
    if batch_size < 2:
        raise ValueError("batch_size >= 2 required")
    ks = sorted(set(int(k) for k in ks))
    if not ks or ks[0] < 1:
        raise ValueError("ks must be positive")
    half = F.expr(f"`{id_col}` div 2").cast("long").alias("pair_id")
    batch = F.expr(f"(`{id_col}` div 2) div {int(batch_size)}").cast("long")
    img = emb.filter(F.col(id_col) % 2 == 0).select(
        half, batch.alias("batch_id"),
        F.col(vec_col).cast("array<double>").alias("_iv"),
    )
    txt = emb.filter(F.col(id_col) % 2 == 1).select(
        half.alias("cand_pair_id"), batch.alias("batch_id"),
        F.col(vec_col).cast("array<double>").alias("_tv"),
    )
    scored = img.join(txt, "batch_id").select(
        "pair_id",
        "cand_pair_id",
        F.round(cosine_sim(F.col("_iv"), F.col("_tv")), 6).alias("cos"),
    )
    true_cos = scored.filter(F.col("pair_id") == F.col("cand_pair_id")).select(
        "pair_id", F.col("cos").alias("_true_cos")
    )
    ranks = (
        scored.join(true_cos, "pair_id")
        .groupBy("pair_id")
        .agg(
            (
                F.lit(1)
                + F.sum(
                    (
                        (F.col("cos") > F.col("_true_cos"))
                        | (
                            (F.col("cos") == F.col("_true_cos"))
                            & (F.col("cand_pair_id") < F.col("pair_id"))
                        )
                    ).cast("long")
                )
            ).alias("_rank")
        )
    )
    n = ranks.count()
    rows = []
    for k in ks:
        hits = ranks.filter(F.col("_rank") <= k).count()
        rows.append((k, n, hits, hits * 1000 // max(n, 1)))
    return emb.sparkSession.createDataFrame(
        rows, "k int, n_anchors long, n_hits long, recall_milli long"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — IVF's standard companion at 10^10-vector
# scale (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
# Search"; the FAISS IVFPQ building block)
# ---------------------------------------------------------------------------


def _pq_int_vec(vec_col, scale: int = 1000):
    """Element-wise int64 quantization (``round(x * scale)``): all PQ
    arithmetic below runs on these ints, so distances are EXACT and
    order-free — the determinism trick every oracle-exact operator in
    this repo uses (micro-unit integers instead of float folds)."""
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * scale).cast("long"),
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> list[list[list[int]]]:
    """Deterministic seed codebooks: the first ``k`` vectors by id
    donate their sub-vectors as centroids for each of the ``m`` equal
    subspaces (codebooks[s][code] = int sub-vector). Production
    refinement would run ``kmeans_refine`` per subspace; the seed is
    the oracle-stable baseline (same contract as
    ``ivf_centroids_first``). Driver materialization is m*k*(dim/m)
    ints — tiny by the ivf_assign collect contract."""
    rows = (
        corpus.select(F.col(id_col).alias("_id"), _pq_int_vec(vec_col, scale).alias("_iv"))
        .orderBy("_id")
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("pq_codebooks: empty corpus")
    dim = len(rows[0]["_iv"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    return [
        [[int(x) for x in r["_iv"][s * ds : (s + 1) * ds]] for r in rows]
        for s in range(m)
    ]


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(id, codes) — each vector compressed to ``m`` small ints (the
    64-float row becomes m bytes at scale). Row-local argmin-L2 per
    subspace via the struct/array_min fold (``_ivf_cell_expr``'s shape
    — never a CASE-WHEN accumulator fold, see its docstring), zero
    Exchange, plan-pinned in tests."""
    m = len(codebooks)
    ds = len(codebooks[0][0])
    iv = _pq_int_vec(vec_col, scale)
    code_cols = []
    for s in range(m):
        sub = F.slice(iv, s * ds + 1, ds)
        cands = [
            F.struct(
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(*[F.lit(int(c)) for c in cvec]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d2"),
                F.lit(code).alias("code"),
            )
            for code, cvec in enumerate(codebooks[s])
        ]
        code_cols.append(F.array_min(F.array(*cands))["code"].alias(f"c{s}"))
    enc = corpus.select(F.col(id_col), *code_cols)
    return enc.select(
        id_col, F.array(*[F.col(f"c{s}") for s in range(m)]).alias("codes")
    )


def pq_ann_topk(
    corpus: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[int]]],
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    exact, each corpus vector is its codes; distance = sum over
    subspaces of the precomputed (subspace, code) -> L2 lookup table.
    The LUT is m*k ints built driver-side from the query and shipped
    as literal maps — the scan never touches the original vectors, the
    tail is TakeOrderedAndProject. Distances are int64 (exact), ties
    break on id."""
    m = len(codebooks)
    ds = len(codebooks[0][0])
    # half-away-from-zero, matching Spark round (HALF_UP) and DuckDB
    # round — Python's round() is banker's and would diverge on ties
    qi = [
        int(math.floor(x * scale + 0.5)) if x >= 0 else int(math.ceil(x * scale - 0.5))
        for x in query_vec
    ]
    if len(qi) != m * ds:
        raise ValueError("query dim mismatch")
    luts = []
    for s in range(m):
        qsub = qi[s * ds : (s + 1) * ds]
        pairs = []
        for code, cvec in enumerate(codebooks[s]):
            d2 = sum((a - b) * (a - b) for a, b in zip(qsub, cvec))
            pairs += [F.lit(code), F.lit(int(d2))]
        luts.append(F.create_map(*pairs))
    enc = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col, scale=scale)
    adc = None
    for s in range(m):
        term = F.element_at(luts[s], F.col("codes")[s])
        adc = term if adc is None else adc + term
    return (
        enc.select(id_col, adc.cast("long").alias("adc_units"))
        .orderBy("adc_units", id_col)
        .limit(topk)
    )


def ann_topk_ivfpq(
    corpus: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[int]]],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    centroids=None,
) -> DataFrame:
    """IVF + PQ composed — the FAISS-IVFPQ shape, THE public structure
    for 10^10-vector search: the coarse quantizer prunes the corpus to
    the query's ``n_probe`` cells (row-local argmax-cosine fold, zero
    Exchange), then PQ asymmetric distance ranks only the survivors
    against the int64 LUT. Per query this scores ~n_probe/n_cells of
    the corpus and reads codes, not vectors. Coarse stage is cosine
    (matching ann_topk_ivf), fine stage is quantized L2 (matching
    pq_ann_topk) — each reuses its already-oracled building block, and
    the composition itself is oracled end-to-end (pq_ivf_ann_topk).
    ``centroids`` accepts a trained coarse quantizer exactly like
    :func:`ann_topk_ivf` (kmeans_refine dict or (cell_id, cvec) DF)."""
    cdf = _centroid_df(centroids, corpus, n_cells, id_col, vec_col)
    rows = cdf.collect()
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    probed = (
        cdf.select(
            "cell_id", F.round(cosine_sim(F.col("cvec"), q), 6).alias("_qc")
        )
        .orderBy(F.desc("_qc"), "cell_id")
        .limit(n_probe)
        .select("cell_id")
    )
    cand = corpus.withColumn("cell_id", _ivf_cell_expr(rows, vec_col)).join(
        F.broadcast(probed), "cell_id"
    )
    return pq_ann_topk(
        cand, query_vec, codebooks, topk=k, id_col=id_col, vec_col=vec_col, scale=scale
    )


def lsh_precision_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_milli: int = 800,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    sample_milli: int = 1000,
    salt: str = "a1",
) -> DataFrame:
    """One-row quality audit of the MinHash-LSH candidate generator:
    ``(n_candidates, n_sampled, n_true_pos, precision_milli,
    avg_abs_est_err_milli)``.

    At 10^10 docs nobody can verify every LSH candidate pair exactly —
    but a deterministic md5 SAMPLE of them can be checked against the
    EXACT word-shingle Jaccard, giving a measured precision for the
    banding configuration (the knob the dedup funnel's recall/cost
    trade rides on) plus the MinHash estimator's mean absolute error.
    The sample is ``md5(doc_a|doc_b|salt) % 1000 < sample_milli`` —
    a pure function of the pair, so re-audits and engines agree.

    All integer milli: exact = ``1000·|∩| div |∪]`` over distinct
    shingle sets, estimate = ``matches·1000 div n_hashes`` over
    signature slots, true positive = exact >= ``threshold_milli``.

    Scale shape: candidates come from the banded equi-join (never
    all-pairs); only the sampled pairs join the shingle-set table, so
    exact-verification cost is ``sample_milli/1000`` of candidate
    volume with full-width shingle arrays touched only there."""
    if not 0 < sample_milli <= 1000:
        raise ValueError("sample_milli must be in (0, 1000]")
    sig = minhash_signature(df, id_col, text_col, n_hashes=n_hashes, k=k).persist()
    cand = lsh_candidate_pairs(sig, n_hashes=n_hashes, bands=bands).persist()
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    key = F.concat(
        F.col("doc_a").cast("string"), F.lit("|"),
        F.col("doc_b").cast("string"), F.lit(salt),
    )
    bucket = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long") % 1000
    sampled = cand.filter(bucket < F.lit(int(sample_milli)))
    a = sig.select(
        F.col("doc").alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"_a{i}") for i in range(n_hashes)],
    )
    b = sig.select(
        F.col("doc").alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"_b{i}") for i in range(n_hashes)],
    )
    matches = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    est = sampled.join(a, "doc_a").join(b, "doc_b").select(
        "doc_a",
        "doc_b",
        # matches*1000 <= 32000: exact in double, cast truncates = div
        ((matches * 1000) / n_hashes).cast("long").alias("est_milli"),
    )
    sh = df.select(
        F.col(id_col).alias("_d"),
        F.array_distinct(shingles_col(F.col(text_col), k)).alias("_sh"),
    )
    ex = (
        est.join(sh.select(F.col("_d").alias("doc_a"), F.col("_sh").alias("_sha")), "doc_a")
        .join(sh.select(F.col("_d").alias("doc_b"), F.col("_sh").alias("_shb")), "doc_b")
        .withColumn(
            "exact_milli",
            F.expr(
                "(1000 * size(array_intersect(_sha, _shb)))"
                " div greatest(size(array_union(_sha, _shb)), 1)"
            ),
        )
    )
    rep = ex.agg(
        F.count("*").alias("n_sampled"),
        F.sum(
            (F.col("exact_milli") >= F.lit(int(threshold_milli))).cast("long")
        ).alias("n_true_pos"),
        F.sum(F.abs(F.col("est_milli") - F.col("exact_milli"))).alias("_errsum"),
    )
    out = n_cand.crossJoin(rep).select(
        F.col("n_candidates").cast("long"),
        F.col("n_sampled").cast("long"),
        F.coalesce(F.col("n_true_pos"), F.lit(0)).cast("long").alias("n_true_pos"),
        F.expr(
            "(coalesce(n_true_pos, 0) * 1000)"
            " div greatest(n_sampled, cast(1 as bigint))"
        ).alias("precision_milli"),
        F.expr(
            "coalesce(_errsum, 0) div greatest(n_sampled, cast(1 as bigint))"
        ).alias("avg_abs_est_err_milli"),
    )
    return out


def label_centroid_drift(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Pairwise cosine between per-group embedding centroids:
    ``(label_a, label_b, n_a, n_b, cos)`` for label_a < label_b —
    the distribution-shift / cluster-separation audit over an
    embedding corpus (are two crawl batches drifting together? are
    the class clusters still separable?).

    Determinism: vectors quantize to int64 milli components
    (round(x*scale) — the repo-wide trick), per-(group, dim) sums are
    exact order-free int64, the centroid component is ``sum div n``
    (floor), and only the final cosine is a double, rounded to 6 dp
    on both engines.

    Scale shape: ONE (group, dim)-keyed map-side-combinable sum —
    post-shuffle size is groups x dims rows no matter the corpus row
    count — then a groups²-sized broadcast self-join (groups =
    labels/sources/batches: small by construction)."""
    iv = df.select(
        F.col(label_col).alias("_lb"), _pq_int_vec(vec_col, scale).alias("_v")
    )
    per_dim = (
        iv.select("_lb", F.posexplode("_v").alias("dim", "x"))
        .groupBy("_lb", "dim")
        .agg(F.sum("x").alias("_s"), F.count("*").alias("_n"))
        .select("_lb", "dim", F.expr("_s div _n").alias("_c"), "_n")
    )
    cents = per_dim.groupBy("_lb").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "_c"))), lambda s: s["_c"]
        ).alias("_cv"),
        F.first("_n").alias("_n"),
    )
    a = cents.select(
        F.col("_lb").alias("label_a"), F.col("_cv").alias("_ca"), F.col("_n").alias("n_a")
    )
    b = cents.select(
        F.col("_lb").alias("label_b"), F.col("_cv").alias("_cb"), F.col("_n").alias("n_b")
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.col("n_a").cast("long"),
            F.col("n_b").cast("long"),
            F.round(cosine_sim(F.col("_ca"), F.col("_cb")), 6).alias("cos"),
        )
    )
