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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine_sim, kmeans_refine


def semdedup(
    embeddings: DataFrame,
    n_cells: int = 16,
    iters: int = 1,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(survivors, losers) of semantic dedup over ``embeddings``.

    survivors = rows kept (id column only); losers = (loser_id,
    cell_id) for every dropped row. ``tau`` is the cosine threshold:
    the paper tunes it per corpus (aggressive settings drop ~50%);
    callers pick tau by the dedup budget, not by a universal constant.
    """
    if not -1.0 <= tau <= 1.0:
        raise ValueError("tau must be a cosine in [-1, 1]")
    _, assign = kmeans_refine(
        embeddings, n_cells=n_cells, iters=iters, id_col=id_col, vec_col=vec_col
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
