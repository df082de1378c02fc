"""SemDeDup: semantic (embedding-space) corpus deduplication.

The exact/MinHash family (``text_corpus.py``) removes documents whose
*text* overlaps; web-scale training corpora also carry documents that
say the same thing in different words. SemDeDup (Abbas et al., 2023,
public — "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication") prunes those: cluster the embedding space with
k-means, then inside each cluster drop every vector that has a
sufficiently-cosine-similar neighbor, keeping one representative.
Clustering first is what makes the pairwise step tractable — pairs are
only formed WITHIN a cell, never across the corpus.

Keeper rule here: lowest id wins (a row is dropped iff some lower-id
row in its cell has cosine >= tau with it). Like ``dedup_corpus``'s
default this is pairwise-greedy, not transitive-closure — chains
A~B~C with cos(A,C) < tau keep A only if B also loses to A; the
cluster-exact variant for text lives in ``dedup_corpus(transitive=
True)`` and the same label-propagation could be layered here if a
use-case needs it.

Scale shape (10^9 vectors): k-means training/assignment is the
zero-Exchange literal-centroid fold of ``kmeans_refine`` (tiny-table
contract: k x dim centroids on the driver); the pairwise step is ONE
cell-keyed self-equi-join whose per-task work is bounded by the cell
size — n_cells is chosen to scale with the corpus (SemDeDup's paper
setting: ~sqrt(N) cells keeps cells ~sqrt(N)), so no task ever sees
the whole corpus and no cartesian/all-pairs operator appears in the
plan. Embedding arrays enter exactly two shuffles (the id-keyed
assignment join and the cell-keyed pair join); scores are computed
JVM-side (``cosine_sim`` higher-order fold, no Python).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_sim, kmeans_refine

_RANK_BUCKETS = 4096


def bounded_cells(
    embeddings: DataFrame,
    n_cells: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_rows: int | None = None,
    max_split_depth: int = 4,
) -> DataFrame:
    """K-means cell assignment ``(id, cell_id)`` with an ENFORCED cell
    size bound (the SemDeDup hot-cell guard): the within-cell pair join
    is O(cell²) per task, so one dense cluster holding 10% of 10^9
    vectors would otherwise produce a 10^15-pair task. Cells above
    ``max_cell_rows`` are recursively re-split with ``kmeans_refine``
    (locality-preserving — near-duplicates stay co-celled); any cell
    k-means cannot split within ``max_split_depth`` (e.g. identical
    vectors: every reassignment ties to one sub-cell) is finally
    **rank-split** — a two-phase hash-bucketed rank inside the cell
    (no single-partition Window) cut into exact ``max_cell_rows``
    chunks — so the returned assignment PROVABLY respects the bound.
    Splitting only ever removes cross-sub-cell pairs from
    consideration, the same approximation class as clustering itself
    (Abbas et al. 2023 §3: pairs are only formed within a cell).

    Scale shape: per depth, one tiny per-cell count collect (#cells
    rows) + one ``kmeans_refine`` job per still-oversized cell — by
    construction skew means FEW hot cells; the rank-split fallback is
    one pass whatever the count. A warning (never a silent cap) names
    the rank-split cells."""
    _, assign = kmeans_refine(
        embeddings, n_cells=n_cells, iters=iters, id_col=id_col, vec_col=vec_col
    )
    if max_cell_rows is None:
        return assign
    if max_cell_rows < 1:
        raise ValueError("max_cell_rows must be >= 1")
    next_id = None
    for _depth in range(max_split_depth):
        counts = {
            int(r["cell_id"]): int(r["n"])
            for r in assign.groupBy("cell_id").agg(F.count("*").alias("n")).collect()
        }
        oversized = sorted(c for c, n in counts.items() if n > max_cell_rows)
        if not oversized:
            return assign
        if next_id is None:
            next_id = max(counts) + 1
        parts = [assign.filter(~F.col("cell_id").isin([int(c) for c in oversized]))]
        for c in oversized:
            sub_ids = assign.filter(F.col("cell_id") == int(c)).select(id_col)
            sub = embeddings.join(sub_ids, id_col, "leftsemi")
            k_sub = max(2, -(-counts[c] // max_cell_rows))
            _, suba = kmeans_refine(
                sub, n_cells=k_sub, iters=1, id_col=id_col, vec_col=vec_col
            )
            # kmeans cell ids are seed vec ids — remap to a fresh
            # contiguous block so child ids never collide with kept
            # cells (deterministic: children ordered by raw id)
            raw = sorted(
                int(r["cell_id"])
                for r in suba.select("cell_id").distinct().collect()
            )
            remap = {r: next_id + i for i, r in enumerate(raw)}
            next_id += len(raw)
            mexpr = F.create_map(
                *[F.lit(x) for kv in remap.items() for x in kv]
            )
            parts.append(
                suba.select(id_col, mexpr[F.col("cell_id")].alias("cell_id"))
            )
        assign = parts[0]
        for p in parts[1:]:
            assign = assign.unionByName(p)
        assign = assign.localCheckpoint()  # iterative: cut lineage per depth
    # final guarantee: rank-split anything k-means could not separate
    counts = {
        int(r["cell_id"]): int(r["n"])
        for r in assign.groupBy("cell_id").agg(F.count("*").alias("n")).collect()
    }
    oversized = sorted(c for c, n in counts.items() if n > max_cell_rows)
    if not oversized:
        return assign
    warnings.warn(
        f"semdedup: {len(oversized)} cell(s) still above max_cell_rows="
        f"{max_cell_rows} after {max_split_depth} k-means split depths "
        f"(degenerate/identical vectors); rank-splitting cells {oversized[:8]}"
        + ("…" if len(oversized) > 8 else "")
    )
    if next_id is None:
        next_id = max(counts) + 1
    keep = assign.filter(~F.col("cell_id").isin([int(c) for c in oversized]))
    hot = assign.filter(F.col("cell_id").isin([int(c) for c in oversized]))
    # two-phase exact rank inside each hot cell: hash buckets + tiny
    # broadcast running offsets + bucket-local row_number (the repo's
    # standard no-single-partition-Window rank; order is arbitrary-but-
    # deterministic — rank-split is load-balancing, not semantics)
    b = hot.withColumn(
        "_bk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(_RANK_BUCKETS)).cast("int")
    )
    bcounts = b.groupBy("cell_id", "_bk").agg(F.count("*").alias("_bn"))
    w_off = (
        Window.partitionBy("cell_id")
        .orderBy(F.asc("_bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # over <= _RANK_BUCKETS rows per cell: bounded, not data-sized
    offsets = bcounts.select(
        "cell_id", "_bk", F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off")
    )
    w_local = Window.partitionBy("cell_id", "_bk").orderBy(F.asc(id_col))
    base_ids = {c: next_id + i for i, c in enumerate(oversized)}
    # chunk index = rank div max_cell_rows; new id = dense per-cell
    # block keyed by (cell, chunk). Block stride = worst-case chunks.
    stride = max(-(-counts[c] // max_cell_rows) for c in oversized)
    cmap = F.create_map(*[F.lit(x) for kv in base_ids.items() for x in kv])
    split = (
        b.join(F.broadcast(offsets), ["cell_id", "_bk"])
        .withColumn("_rk", F.row_number().over(w_local) + F.col("_off") - 1)
        .select(
            id_col,
            (
                cmap[F.col("cell_id")] * F.lit(int(stride))
                + F.expr(f"_rk div {int(max_cell_rows)}")
            ).cast("long").alias("cell_id"),
        )
    )
    return keep.unionByName(split)


def semdedup(
    embeddings: DataFrame,
    n_cells: int = 16,
    iters: int = 1,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_rows: int | None = None,
    max_split_depth: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """(survivors, losers) of semantic dedup over ``embeddings``.

    survivors = rows kept (id column only); losers = (loser_id,
    cell_id) for every dropped row. ``tau`` is the cosine threshold:
    the paper tunes it per corpus (aggressive settings drop ~50%);
    callers pick tau by the dedup budget, not by a universal constant.
    ``max_cell_rows`` enforces the hot-cell bound via
    :func:`bounded_cells` — at web scale ALWAYS set it (e.g. ~sqrt(N));
    the None default preserves the raw paper clustering for
    small/audited corpora."""
    if not -1.0 <= tau <= 1.0:
        raise ValueError("tau must be a cosine in [-1, 1]")
    assign = bounded_cells(
        embeddings,
        n_cells=n_cells,
        iters=iters,
        id_col=id_col,
        vec_col=vec_col,
        max_cell_rows=max_cell_rows,
        max_split_depth=max_split_depth,
    )
    vecs = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    cells = assign.select(F.col(id_col).alias("_id"), "cell_id").join(vecs, "_id")
    a = cells.select(
        F.col("cell_id"), F.col("_id").alias("_ida"), F.col("_v").alias("_va")
    )
    b = cells.select(
        F.col("cell_id"), F.col("_id").alias("_idb"), F.col("_v").alias("_vb")
    )
    # cell-keyed equi-join; id inequality picks the lower-id keeper
    losers = (
        a.join(b, "cell_id")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(F.round(cosine_sim(F.col("_va"), F.col("_vb")), 6) >= F.lit(tau))
        .select(F.col("_idb").alias(id_col), "cell_id")
        .distinct()
    )
    survivors = embeddings.select(id_col).join(
        losers.select(id_col), id_col, "left_anti"
    )
    return survivors, losers
