"""Parse stage: frontier expansion from fetched listing pages (F1-F5).

The reference's spiders expand the frontier three ways (SURVEY.md §2.6):
- F1 computed fan-out: zoro reads ``total_products`` from page 1 and
  yields every remaining page at once (zoro_category_spider.py:144-170),
- F2 sequential next-page chains (costco/viking/quill/customink),
- F4 category->detail handoff: every outlink becomes a tier-1 URL.

All three are declarative column ops here (``posexplode`` /
``sequence``); no UDFs. Position lineage (F5, running index within a
category page) is carried in the child's discovery key instead of
mutable ``response.meta``.

Discovery order is encoded arithmetically into ``discovered_seq``::

    seq = (round << 40) | (parent_within_round_rank << 20) | position

which is exactly the order the reference's autoincrement id would
record (parents are processed in claim order; a parser yields outlinks
in page order, then the next-page request — quill_category_spider.py
yields products at :63-89 then ``next`` at :92-101). Encoding the key
instead of materializing a global counter removes the only
serialization point frontier growth would otherwise have at 10^10 URLs
(no global window / zipWithIndex pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..synth.world import PAGINATION_SIZE

ROUND_SHIFT = 40
RANK_SHIFT = 20
POS_MASK = (1 << RANK_SHIFT) - 1


def encode_seq(round_col, rank_col, pos_col):
    return (
        (round_col.cast("long") * F.lit(1 << ROUND_SHIFT))
        + (rank_col.cast("long") * F.lit(1 << RANK_SHIFT))
        + pos_col.cast("long")
    )


def position_of(seq_col):
    return F.pmod(seq_col, F.lit(1 << RANK_SHIFT)).cast("int")


def discover_children(ok_tier0: DataFrame, round_no: int, pagination_size: int = PAGINATION_SIZE) -> DataFrame:
    """Children of successfully fetched listing pages.

    Input needs: url, domain, depth, priority, within_round_rank,
    outlinks, next_url, total_items. Output: candidate child rows
    (url, tier, depth, priority, discovered_seq, discovered_round) —
    pre-canonicalization, pre-dedup.
    """
    base = ok_tier0.select(
        "url",
        "depth",
        "priority",
        "within_round_rank",
        "outlinks",
        "next_url",
        "total_items",
    )

    # F4: outlinks -> tier-1 detail URLs, position = index on page
    details = base.select(
        F.col("url").alias("parent_url"),
        F.posexplode("outlinks").alias("position", "child_url"),
        F.lit(1).alias("tier"),
        (F.col("depth") + 1).alias("depth"),
        F.col("priority"),
        F.col("within_round_rank"),
    )

    n_out = F.size("outlinks")

    # F2: sequential next page, yielded after the products
    seq_pages = base.filter(F.col("next_url").isNotNull()).select(
        F.col("url").alias("parent_url"),
        n_out.alias("position"),
        F.col("next_url").alias("child_url"),
        F.lit(0).alias("tier"),
        (F.col("depth") + 1).alias("depth"),
        F.col("priority"),
        F.col("within_round_rank"),
    )

    # F1: computed fan-out from total_items (page 1 only carries it)
    pages_needed = F.ceil(F.col("total_items") / F.lit(pagination_size)).cast("int")
    fan_pages = (
        base.filter(F.col("total_items").isNotNull() & (pages_needed >= 2))
        .select(
            "url",
            "depth",
            "priority",
            "within_round_rank",
            n_out.alias("_n_out"),
            F.explode(F.sequence(F.lit(2), pages_needed)).alias("_page"),
        )
        .select(
            F.col("url").alias("parent_url"),
            (F.col("_n_out") + F.col("_page") - 2).alias("position"),
            F.concat(F.col("url"), F.lit("?page="), F.col("_page")).alias("child_url"),
            F.lit(0).alias("tier"),
            (F.col("depth") + 1).alias("depth"),
            F.col("priority"),
            F.col("within_round_rank"),
        )
    )

    children = details.unionByName(seq_pages).unionByName(fan_pages)
    return children.select(
        # discovery edge source: feeds the recorded link graph
        # (CrawlConfig.record_link_edges) and nothing else — every
        # other consumer selects explicit columns past it
        "parent_url",
        F.col("child_url").alias("url"),
        "tier",
        "depth",
        "priority",
        encode_seq(F.lit(round_no), F.col("within_round_rank"), F.col("position")).alias(
            "discovered_seq"
        ),
        F.lit(round_no).alias("discovered_round"),
    )
