"""Canonical-alias resolution over recorded redirect edges.

When URL A 301s to B, the frontier holds two names for one resource:
fetch accounting lands on A (the claim URL — fetchers/synthetic.py
follow_redirects keeps claim identity, mirroring the reference's
Scrapy redirect semantics), but dedup, seen-set membership and
importance mass belong to the landing URL. This module turns the
crawl's recorded redirect map into a canonical-alias table
``src -> terminal`` that the frontier/seen-set can dedup against.

Algorithm: **pointer jumping / path doubling** — the successor map
``f(u)`` composes with itself each round (``f <- f∘f``), so a chain
of length L resolves in ``ceil(log2 L)`` rounds, each ONE equi-join
of 16-byte rows. At 10^10 recorded redirects a 64-hop chain costs 6
narrow shuffles, not 64 (the linear-walk shape the per-fetch
``follow_redirects`` uses is right for its bounded ``max_redirects``,
wrong for frontier-wide resolution). The same O(log) contraction
family as ``dedup/text_corpus.min_label_components``, with the same
``localCheckpoint`` lineage discipline.

Semantics: rows whose walk leaves the source set are **resolved** to
that terminal URL; rows still inside it after ``2^max_doubling`` hops
(a cycle, or a chain beyond the cap) report ``canonical = NULL,
resolved = 0`` — the same bounded-cap honesty as the fetch path's
``max-redirections`` error class. A duplicate src (two recorded
targets for one URL — possible across sessions) deterministically
keeps the smallest dst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_aliases(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_doubling: int = 6,
) -> DataFrame:
    """``(src, canonical, hops_bound, resolved)`` for every source of
    a redirect edge. ``hops_bound = 2^max_doubling`` is the chain cap;
    ``resolved = 0`` rows (cycles / over-cap chains) carry NULL
    canonical."""
    if max_doubling < 0:
        raise ValueError("max_doubling must be >= 0")
    f = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("nxt"))
        .groupBy("src")
        .agg(F.min("nxt").alias("nxt"))  # deterministic on duplicate srcs
        .localCheckpoint()
    )
    for _ in range(max_doubling):
        hop = f.select(F.col("src").alias("_m"), F.col("nxt").alias("_n"))
        f = (
            f.join(hop, f["nxt"] == hop["_m"], "left")
            .select("src", F.coalesce("_n", "nxt").alias("nxt"))
            .localCheckpoint()
        )
    srcs = f.select(F.col("src").alias("_s"))
    out = f.join(srcs, f["nxt"] == srcs["_s"], "left").select(
        "src",
        F.when(F.col("_s").isNull(), F.col("nxt")).alias("canonical"),
        F.lit(1 << max_doubling).cast("int").alias("hops_bound"),
        F.col("_s").isNull().cast("int").alias("resolved"),
    )
    return out
