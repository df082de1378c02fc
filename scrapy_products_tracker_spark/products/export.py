"""CSV exporters + mark-sent bookkeeping + stop-tracking (K8/K9/O3/O4/O6, J1-J3).

Reference behavior being re-expressed:
- ``history_exporter --url=...``: inner join product_history ⋈
  product_targets projecting the 16 export columns, optional url
  filter, ordered by created_at (commands/exporter/history_exporter.py:
  79-98) — J1.
- ``session_exporter --session=...``: same join filtered to one crawl
  session (session_exporter.py:82-99) — J2.
- ``category_exporter --category=...``: targets filtered by category,
  ordered by position (category_exporter.py:83-85) — J3/O3.
- chunked CSV export with exactly-once bookkeeping: repeatedly
  ``SELECT ... WHERE sent_to_customer IS NULL LIMIT chunk``, write the
  chunk, then ``UPDATE ... SET sent_to_customer=today``
  (commands/base/base_csv_exporter.py:42-117) — K8/K9/O4. A re-run
  exports nothing that was already sent.

Join strategy: history rows join targets on the content-derived
``product_id == url_hash`` (J4's id-resolution lookup is free). At
scale targets is the smaller side only per-bucket; the join keys are
co-bucketized by construction (both tables hash on url_hash), so on
Iceberg this is a storage-partitioned join; here Catalyst picks
broadcast/SMJ by stats. Prices render as DECIMAL(20,2) like the MySQL
schema (product_history.py:14-15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXPORT_ORDER = ["created_at", "product_id", "round"]  # history_exporter.py:98 + tiebreak


def _dec(cents_col):
    return (cents_col / F.lit(100)).cast("decimal(20,2)")


def export_history(
    spark: SparkSession,
    store,
    url: str | None = None,
    session: int | None = None,
    cents: bool = False,
) -> DataFrame:
    """J1/J2: the reference's 16-column history⋈targets export.
    ``cents=True`` keeps the exact integer-cents price columns
    (oracle-comparable) instead of the DECIMAL(20,2) render."""
    targets = store.read_products(spark)
    history = store.read_history(spark)
    if targets is None or history is None:
        raise ValueError("no products/history tables committed yet")
    h = history
    if url is not None:
        h = h.filter(F.col("url") == url)
    if session is not None:
        h = h.filter(F.col("session") == session)
    t = targets.select(
        F.col("url_hash").alias("product_id"),
        F.col("url").alias("target_url"),
        "title",
        "description",
        "brand",
        "image_url",
        "image_file",
        "additional_info",
        "category",
    )
    price_cols = (
        [F.col("regular_price_cents"), F.col("current_price_cents")]
        if cents
        else [
            _dec(F.col("regular_price_cents")).alias("regular_price"),
            _dec(F.col("current_price_cents")).alias("current_price"),
        ]
    )
    return (
        h.join(t, "product_id", "inner")
        .select(
            "product_id",
            F.col("target_url").alias("url"),
            "title",
            "description",
            "brand",
            "image_url",
            "image_file",
            "additional_info",
            "category",
            *price_cols,
            "is_in_stock",
            "stock",
            "position",
            "currency",
            "units",
            "session",
            "round",
            "created_at",
        )
        .orderBy(*EXPORT_ORDER)
    )


def export_session(spark: SparkSession, store, session: int) -> DataFrame:
    return export_history(spark, store, session=session)


def export_category(spark: SparkSession, store, category: str) -> DataFrame:
    """J3/O3: targets of one category ordered by last-seen position."""
    targets = store.read_products(spark)
    history = store.read_history(spark)
    if targets is None:
        raise ValueError("no products table committed yet")
    pos = (
        history.groupBy(F.col("product_id").alias("url_hash"))
        .agg(F.max_by("position", "round").alias("position"))
        if history is not None
        else None
    )
    t = targets.filter(F.col("category") == category)
    if pos is not None:
        t = t.join(pos, "url_hash", "left")
    else:
        t = t.withColumn("position", F.lit(None).cast("int"))
    return t.select(
        "url", "title", "brand", "category", "position", "session"
    ).orderBy(F.asc_nulls_last("position"), "url")


def write_csv(df: DataFrame, out_path: str) -> None:
    """K8: single CSV with header (reference DictWriter append,
    csv_exporter.py:82-94). coalesce(1) is an export-sink choice, not a
    compute bottleneck: the plan upstream stays parallel."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(out_path)


def _chunk_assignments(
    unsent: DataFrame, chunk: int, prefix_len: int = 24
) -> DataFrame:
    """``(url, chunk_id)`` via a two-phase distributed rank — the same
    prefix-sum shape as ``imaging.dataset.pack_shards``, counting rows
    instead of bytes.

    Range key: ``substring(url, 1, prefix_len)``. A string's order is
    consistent with its prefix's order (UTF-8 binary == code-point
    order), so ordering by (prefix, url) == ordering by url, and the
    global rank decomposes into per-prefix local ranks plus a running
    offset computed on the TINY one-row-per-prefix table. No window
    ever sees the full data in one partition; at 10^8 unsent rows the
    only single-partition step is the offsets window over ~|distinct
    prefixes| rows (url prefixes carry scheme+host, so real frontiers
    have thousands of ranges)."""
    from pyspark.sql import Window

    base = unsent.select(F.substring("url", 1, prefix_len).alias("_rng"), "url")
    totals = base.groupBy("_rng").agg(F.count(F.lit(1)).alias("_n"))
    w_ranges = Window.orderBy("_rng").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_rng", F.coalesce(F.sum("_n").over(w_ranges), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_rng").orderBy("url")
    return (
        base.join(F.broadcast(offsets), "_rng")
        .withColumn("_rank", F.col("_off") + F.row_number().over(w_in) - 1)
        .select("url", F.expr(f"div(_rank, {int(chunk)})").cast("int").alias("chunk_id"))
    )


def run_incremental_export(
    spark: SparkSession, store, out_dir: str, chunk: int = 1000
) -> int:
    """K9/O4: chunked unsent-only export with mark-sent MERGE — ONE pass.

    The reference loops ``SELECT ... WHERE sent IS NULL LIMIT chunk`` /
    write / ``UPDATE`` per chunk (base_csv_exporter.py:42-117); at 10^8
    unsent rows that is O(n²/chunk) scan work and O(n/chunk) snapshot
    commits. Here chunk membership is assigned in one pass — a
    two-phase distributed rank over the deterministic url order
    (:func:`_chunk_assignments`: per-url-prefix local rank + broadcast
    running offsets; no single-partition window touches the full data),
    computed on the NARROW (url) projection and joined back on the
    UNIQUE url key — every chunk file is written by ONE distributed job
    (``partitionBy(chunk_id)``), and the sent-markers commit in ONE
    MERGE.

    Exactly-once across completed runs is unchanged: re-running exports
    nothing. The crash window widens from one chunk to one run — the
    same at-least-once re-export contract the reference has per chunk,
    traded for O(n) total scan work and a single snapshot commit.

    Each run writes under ``out_dir/run_<store version>/`` — the
    overwrite-mode chunk write must never truncate a PREVIOUS run's
    delivered files (those rows are already marked sent and would not
    re-export)."""
    import os

    targets = store.read_products(spark)
    if targets is None:
        return 0
    run_dir = os.path.join(out_dir, f"run_{store.latest_version() or 0}")
    unsent = targets.filter(F.col("sent_to_customer").isNull())
    chunk_map = _chunk_assignments(unsent, chunk)
    chunked = unsent.join(chunk_map, "url").persist()
    max_chunk = chunked.agg(F.max("chunk_id").alias("m")).first()["m"]
    if max_chunk is None:
        chunked.unpersist()
        return 0
    (
        chunked.repartition("chunk_id")
        .sortWithinPartitions("url")
        .select("chunk_id", "url", "title", "brand", "category", "session")
        .write.mode("overwrite")
        .option("header", True)
        .partitionBy("chunk_id")
        .csv(run_dir)
    )
    marks = chunked.select(
        "url_hash", "url", F.current_date().cast("string").alias("sent_to_customer")
    )
    store.commit(products_set=marks, meta={"export_chunks": int(max_chunk) + 1})
    chunked.unpersist()
    return int(max_chunk) + 1


def stop_tracking(spark: SparkSession, store, urls: DataFrame) -> int:
    """O6: CSV of URLs -> ``is_tracked=0`` (stop_tracking.py:109-146).
    Stopped products are excluded from session re-arming
    (CrawlDriver.rearm_session consults is_tracked) and from incremental
    exports of tracked rows."""
    targets = store.read_products(spark)
    if targets is None:
        raise ValueError("no products table committed yet")
    keyed = urls.select("url").join(
        targets.select("url_hash", "url"), "url", "inner"
    )
    marks = keyed.select("url_hash", "url", F.lit(False).alias("is_tracked"))
    return store.commit(products_set=marks, meta={"stop_tracking": True})
