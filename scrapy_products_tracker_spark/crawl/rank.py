"""Importance-fed frontier: re-prioritize PENDING work from the
recorded link graph.

The reference schedules strictly FIFO (``ORDER BY id ASC LIMIT chunk``,
rmq/commands/producer.py:196-211) with ``priority`` dormant
(mixins/mysql_priority_attempt.py:6-8). The north rule's frontier keys
claims on (priority, depth, discovered_seq) — this module is what FEEDS
that priority column mid-crawl: PageRank (global importance) or HITS
hubs (listing pages whose fetch discovers the most detail pages — the
focused-product-crawl choice) over the edges the crawl itself recorded
(``CrawlConfig(record_link_edges=True)`` → ``store.read_link_edges``),
joined back onto the frontier as ``-rank`` (CLAIM_ORDER sorts
ascending; ranked rows go first, best first).

The cycle is: crawl rounds append edges → ``reprioritize_frontier``
commits one full-frontier rewrite snapshot (statuses untouched, so all
pending bookkeeping stays exact) → subsequent claims follow importance
order. Run it between sessions or every K rounds, like compaction
(jobs/rank_job.py is the spark-submit wrapper).

Scale shape: rank computation is the iterative int64 fixed-point
engine of functions/graph.py (two narrow shuffles per iteration,
map-side-combined int sums, overflow-safe renorm for HITS); the
write-back is one left join on the 8-byte ``url_hash`` key + the
bucket-partitioned frontier rewrite — the same full-pass shape as
``refresh_robots``, amortized over the rounds between runs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

METHODS = ("pagerank", "hits_hub", "hits_auth", "opic")


def reprioritize_frontier(
    spark: SparkSession,
    store,
    method: str = "pagerank",
    iters: int = 3,
    expected_version: int | None = None,
) -> dict | None:
    """Compute ranks over the recorded link graph and commit a
    re-prioritized frontier snapshot. Returns a summary dict, or None
    when no edges were recorded. Unranked rows (URLs not yet in the
    graph) keep their existing base priority — importance ordering
    applies where evidence exists, FIFO tails elsewhere."""
    if method not in METHODS:
        raise ValueError(f"method must be one of {METHODS}")
    edges = store.read_link_edges(spark)
    if edges is None:
        return None
    e = edges.select(
        F.col("src_url_hash").alias("src"), F.col("dst_url_hash").alias("dst")
    ).distinct()
    if method == "pagerank":
        from ..functions.graph import pagerank_units

        ranks = pagerank_units(e, iters=iters).select(
            "node", F.col("rank_units").alias("_rank")
        )
    elif method == "opic":
        from ..functions.graph import opic_units

        ranks = opic_units(e, iters=iters).select(
            "node", F.col("opic_units").alias("_rank")
        )
    else:
        from ..functions.graph import hits_units

        col = "hub_units" if method == "hits_hub" else "auth_units"
        ranks = hits_units(e, iters=iters).select("node", F.col(col).alias("_rank"))
    manifest = store.read_manifest()
    if manifest is None:
        raise RuntimeError("no committed snapshot to re-prioritize")
    fr = store.read_frontier(spark)
    new_fr = (
        fr.join(ranks.withColumnRenamed("node", "_rk_hash"),
                fr["url_hash"] == F.col("_rk_hash"), "left")
        .withColumn(
            # priority widens to int64 here: rank units exceed int32
            # range by design (unit = 1e6 fixed point). Later insert
            # rounds still write int32 base priorities; the union
            # path widens them to long against this snapshot.
            "priority",
            F.coalesce(-F.col("_rank"), F.col("priority").cast("long")).cast("long"),
        )
        .drop("_rk_hash", "_rank")
    )
    n_edges = e.count()
    n_ranked = ranks.count()
    version = store.commit(
        new_fr,
        meta={"reprioritized": {"method": method, "iters": iters,
                                "n_edges": n_edges, "n_ranked": n_ranked}},
        expected_version=(
            expected_version if expected_version is not None else manifest["version"]
        ),
    )
    return {
        "method": method,
        "iters": iters,
        "n_edges": n_edges,
        "n_ranked": n_ranked,
        "version": version,
    }
