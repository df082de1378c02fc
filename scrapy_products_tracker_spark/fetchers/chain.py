"""Detail-request chaining (F3): multi-endpoint item assembly.

Reference behavior: Costco's detail spider issues THREE requests per
product — the HTML page, then ``AjaxGetInventoryDetail`` (stock JSON),
then ``AjaxGetContractPrice`` (price JSON) — accumulating one item
through ``response.meta['item']``
(spiders/costco_detail_page_spider.py:64-177). The page alone does not
carry the price/stock; the chained endpoints do.

Spark expression: the sub-endpoint responses are rows of an
``endpoints`` table ``(url, endpoint, payload)`` fetched by the same
fetch layer; item assembly is a JOIN, not mutable meta: page-parsed
fields LEFT JOIN the endpoint JSON (``from_json`` on typed schemas),
endpoint values overriding page values where present (the reference
overwrites item fields from each later response). The endpoint corpus
is pruned with the same semi-join pushdown the page fetch uses —
the round's items broadcast into the big table, survivors broadcast
back, so no full-corpus shuffle at 10^10 scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INVENTORY_SCHEMA = "in_stock boolean, stock int"
PRICE_SCHEMA = "current_cents long, regular_cents long, currency string"


def resolve_detail_chain(parsed: DataFrame, endpoints: DataFrame) -> DataFrame:
    """parsed (extract.py output incl. url) + endpoint responses ->
    assembled items. Pages without endpoint rows pass through unchanged
    (non-chained domains)."""
    keys = parsed.select("url")
    hit = endpoints.join(F.broadcast(keys), "url", "leftsemi")
    inv = hit.filter(F.col("endpoint") == "inventory").select(
        "url", F.from_json("payload", INVENTORY_SCHEMA).alias("_inv")
    )
    pr = hit.filter(F.col("endpoint") == "price").select(
        "url", F.from_json("payload", PRICE_SCHEMA).alias("_pr")
    )
    out = parsed.join(F.broadcast(inv), "url", "left").join(F.broadcast(pr), "url", "left")
    # endpoint wins where present (costco overwrites item fields per
    # response); page value is the fallback for non-chained domains
    out = (
        out.withColumn("is_in_stock", F.coalesce(F.col("_inv.in_stock"), F.col("is_in_stock")))
        .withColumn("stock", F.coalesce(F.col("_inv.stock"), F.col("stock")))
        .withColumn(
            "current_price_cents",
            F.coalesce(F.col("_pr.current_cents"), F.col("current_price_cents")),
        )
        .withColumn(
            "regular_price_cents",
            F.coalesce(F.col("_pr.regular_cents"), F.col("regular_price_cents")),
        )
        .withColumn("currency", F.coalesce(F.col("_pr.currency"), F.col("currency")))
    )
    return out.drop("_inv", "_pr")
