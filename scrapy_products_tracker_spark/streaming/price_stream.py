"""Stateful price-change detection over the streaming history table.

The reference appends a price/stock snapshot per crawl session
(product_result_consumer.py:72-94); the question its users actually ask
— "which tracked products changed price?" — is answered offline by
joining exports. Streaming twin: the append-only ``data/history/v*``
tree is a file-source stream, and a **custom stateful operator**
(``applyInPandasWithState``) keeps one tiny state cell per product
(last seen price) and emits a change event the moment a new history
snapshot disagrees with it — the Structured Streaming shape the north
rule's training-pipeline axis calls for where no built-in aggregate
fits (the comparison is against all-time state, not a window).

Scale shape: state is per-product (8-byte price + key), partitioned by
``product_id`` — the same hash space as every other product table, so
no skew beyond product-count skew; batches arrive sorted per group by
(session, round) inside the kernel, not globally.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import PRODUCT_HISTORY_SCHEMA

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("prev_cents", T.LongType()),
        T.StructField("new_cents", T.LongType()),
        T.StructField("session", T.IntegerType()),
        T.StructField("round", T.IntegerType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("last_cents", T.LongType())])


def stream_history(spark: SparkSession, store_root: str) -> DataFrame:
    """File-source stream over every committed history directory."""
    return (
        spark.readStream.schema(PRODUCT_HISTORY_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(f"{store_root}/data/history")
    )


def price_change_stream(history: DataFrame) -> DataFrame:
    """(product_id, url, prev_cents, new_cents, session, round) events
    whenever a product's current price differs from the last one seen —
    state carried across micro-batches per product."""

    def _detect(key, pdf_iter, state: GroupState):
        last = state.get[0] if state.exists else None
        out = []
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            rows = pd.concat(chunks).sort_values(["session", "round"])
            for r in rows.itertuples():
                c = r.current_price_cents
                if pd.isna(c):
                    continue  # chained/unpriced snapshot: no comparison
                c = int(c)
                if last is not None and c != last:
                    out.append(
                        (int(r.product_id), r.url, last, c, int(r.session), int(r.round))
                    )
                last = c
        if last is not None:
            state.update((last,))
        yield pd.DataFrame(
            out,
            columns=["product_id", "url", "prev_cents", "new_cents", "session", "round"],
        )

    return history.groupBy("product_id").applyInPandasWithState(
        _detect, CHANGE_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def expected_price_changes(history: DataFrame) -> DataFrame:
    """Batch twin (window lag) the streaming operator is tested against."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("product_id").orderBy("session", "round")
    priced = history.filter(F.col("current_price_cents").isNotNull())
    lagged = priced.withColumn("prev_cents", F.lag("current_price_cents").over(w))
    return lagged.filter(
        F.col("prev_cents").isNotNull()
        & (F.col("prev_cents") != F.col("current_price_cents"))
    ).select(
        "product_id",
        "url",
        "prev_cents",
        F.col("current_price_cents").alias("new_cents"),
        "session",
        "round",
    )
