"""Frontier MERGE: status updates + new-row inserts (K2/K4/K5/K7).

The reference mutates its frontier with per-row upserts
(``INSERT ... ON DUPLICATE KEY UPDATE``, read_csv.py:66-70;
``UPDATE targets SET status=? WHERE id=?``, category_reply_consumer.py:
27-47). The Spark expression of the same state machine is one MERGE
per round:

    MERGE INTO frontier USING round_updates ON url_hash/url
      WHEN MATCHED THEN UPDATE status/attempt/session
      WHEN NOT MATCHED THEN INSERT (new canonical rows)

With Iceberg that is literal SQL; on the Parquet fallback it is the
equivalent copy-on-write plan below: left-join the (tiny, broadcast)
update set onto the frontier, coalesce the changed columns, union the
inserts. Join key is ``url_hash`` with a ``url`` equality confirm —
collision-safe at 64-bit scale without hashing strings twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_status_updates(frontier: DataFrame, updates: DataFrame) -> DataFrame:
    """updates: (url_hash, url, new_status, new_attempt, new_session?).

    The update set is bounded by the round's claim chunk -> broadcast.
    """
    upd_cols = ["new_status", "new_attempt"] + (
        ["new_session"] if "new_session" in updates.columns else []
    )
    u = updates.select(
        F.col("url_hash").alias("_u_hash"), F.col("url").alias("_u_url"), *upd_cols
    )
    joined = frontier.join(
        F.broadcast(u),
        (frontier["url_hash"] == F.col("_u_hash")) & (frontier["url"] == F.col("_u_url")),
        "left",
    )
    out = (
        joined.withColumn("status", F.coalesce(F.col("new_status"), F.col("status")))
        .withColumn("attempt", F.coalesce(F.col("new_attempt"), F.col("attempt")))
    )
    if "new_session" in updates.columns:
        out = out.withColumn("session", F.coalesce(F.col("new_session"), F.col("session")))
    return out.drop("_u_hash", "_u_url", *upd_cols)


def merge_inserts(frontier: DataFrame, new_rows: DataFrame) -> DataFrame:
    """Append already-deduplicated new canonical rows (same schema)."""
    return frontier.unionByName(new_rows.select(*frontier.columns))
