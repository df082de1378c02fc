"""Product-targets upsert + append-only price history (K4/K6).

The reference's result consumer runs a 3-statement transaction per item
(commands/product_result_consumer.py:40-94):

1. ``INSERT INTO product_targets ... ON DUPLICATE KEY UPDATE`` of the
   metadata fields (title, description, brand, image_url, image_file,
   additional_info, session) keyed by the UNIQUE url;
2. ``SELECT id WHERE url=?`` to resolve the product id;
3. ``INSERT INTO product_history (product_id, prices, stock, position,
   session, currency, units)`` — an append-only time series
   (database/models/product_history.py:8-24).

Spark expression: one MERGE per round over the bucketized products
table (same dirty-bucket copy-on-write as the frontier) plus a history
append. The id-resolution SELECT disappears: ``product_id`` is the
content-derived ``url_hash`` (stable across distributed recomputes,
unlike autoincrement — SURVEY §1.2), so history rows join targets
without a lookup round-trip (J4).

Prices are integer cents end-to-end; exporters render DECIMAL(20,2)
like the MySQL schema (product_history.py:14-15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metadata columns the upsert refreshes on every re-crawl (the
# reference's on_duplicate_key_update list + category/currency which it
# keeps on the separate category_targets path)
REFRESH_COLS = [
    "title",
    "description",
    "brand",
    "image_url",
    "image_file",
    "additional_info",
    "category",
    "session",
    "updated_round",
]
# columns preserved from the first-ever upsert of a url
KEEP_COLS = ["is_tracked", "sent_to_customer", "first_round"]
PRODUCT_TARGET_COLS = ["url_hash", "url"] + REFRESH_COLS + KEEP_COLS

HISTORY_COLS = [
    "product_id",
    "url",
    "regular_price_cents",
    "current_price_cents",
    "is_in_stock",
    "stock",
    "position",
    "session",
    "currency",
    "units",
    "round",
    "created_at",
]


def build_target_rows(parsed: DataFrame, session: int, round_no: int) -> DataFrame:
    """Parsed+extracted detail rows -> product_targets batch. Input
    needs url, url_hash and the extract.py columns with parse_ok=true
    (the X7 guard filtered unparseable pages before this point)."""
    return parsed.select(
        "url_hash",
        "url",
        "title",
        "description",
        "brand",
        "image_url",
        "image_file",
        "additional_info",
        "category",
        F.lit(session).cast("int").alias("session"),
        F.lit(round_no).cast("int").alias("updated_round"),
        F.lit(True).alias("is_tracked"),
        F.lit(None).cast("string").alias("sent_to_customer"),
        F.lit(round_no).cast("int").alias("first_round"),
    )


def build_history_rows(parsed: DataFrame, session: int, round_no: int) -> DataFrame:
    return parsed.select(
        F.col("url_hash").alias("product_id"),
        "url",
        "regular_price_cents",
        "current_price_cents",
        "is_in_stock",
        "stock",
        F.col("position").cast("int"),
        F.lit(session).cast("int").alias("session"),
        "currency",
        "units",
        F.lit(round_no).cast("int").alias("round"),
        F.current_timestamp().alias("created_at"),
    )


def upsert_products(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """MERGE: refresh metadata for matched urls, insert new urls,
    preserve first-seen bookkeeping (is_tracked / sent_to_customer /
    first_round). ``existing`` is the dirty-bucket slice when called
    from the store's delta commit, so cost ∝ batch, not table."""
    b = batch.select(*PRODUCT_TARGET_COLS)
    keys = b.select(
        F.col("url_hash").alias("_b_hash"), F.col("url").alias("_b_url")
    )
    untouched = existing.join(
        F.broadcast(keys),
        (existing["url_hash"] == F.col("_b_hash")) & (existing["url"] == F.col("_b_url")),
        "left_anti",
    )
    prev = existing.select(
        F.col("url_hash").alias("_e_hash"),
        F.col("url").alias("_e_url"),
        *[F.col(c).alias(f"_e_{c}") for c in KEEP_COLS],
    )
    refreshed = b.join(
        prev,
        (b["url_hash"] == F.col("_e_hash")) & (b["url"] == F.col("_e_url")),
        "left",
    )
    for c in KEEP_COLS:
        refreshed = refreshed.withColumn(c, F.coalesce(F.col(f"_e_{c}"), F.col(c)))
    refreshed = refreshed.select(*PRODUCT_TARGET_COLS)
    return untouched.select(*PRODUCT_TARGET_COLS).unionByName(refreshed)


def merge_set_columns(existing: DataFrame, updates: DataFrame) -> DataFrame:
    """``MERGE ... WHEN MATCHED THEN SET col=...`` — updates carries
    (url_hash, url) plus the columns to overwrite on matched rows.
    Backs mark-sent (K9, base_csv_exporter.py:108-117) and
    stop-tracking (O6, stop_tracking.py:109-146)."""
    set_cols = [c for c in updates.columns if c not in ("url_hash", "url")]
    u = updates.select(
        F.col("url_hash").alias("_u_hash"),
        F.col("url").alias("_u_url"),
        *[F.col(c).alias(f"_u_{c}") for c in set_cols],
    )
    joined = existing.join(
        F.broadcast(u),
        (existing["url_hash"] == F.col("_u_hash")) & (existing["url"] == F.col("_u_url")),
        "left",
    )
    matched = F.col("_u_hash").isNotNull()
    for c in set_cols:
        joined = joined.withColumn(c, F.when(matched, F.col(f"_u_{c}")).otherwise(F.col(c)))
    return joined.drop("_u_hash", "_u_url", *[f"_u_{c}" for c in set_cols])
