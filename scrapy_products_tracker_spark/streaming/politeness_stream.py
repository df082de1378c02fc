"""Streaming politeness: per-domain token-bucket admission control.

The batch crawl enforces per-domain budgets inside each scheduling
round (politeness/scheduler.py — the salted claim rank). A streaming
deployment (URL discoveries arriving continuously, e.g. from the
results stream feeding re-crawl candidates) needs the same budget as
a **stateful streaming operator**: the token bucket the north star
names, carried across micro-batches per domain.

Semantics (deterministic, cross-batch): each domain's bucket starts
FULL (``burst`` tokens); at every micro-batch IN WHICH THE DOMAIN HAS
TRAFFIC it refills by ``rate`` (capped at ``burst``) and then admits
that batch's rows in url-sorted order while tokens remain — an idle
domain's bucket neither refills nor drains (the stateful operator is
only invoked for keys present in the batch), which is exactly the
conservative reading: absence can't mint extra credit. Leftover tokens are the
``applyInPandasWithState`` state cell — one int64 per domain, the
same per-key state scale as the price-change detector. Rows are never
dropped: rejected ones are EMITTED with ``admitted = 0`` so the
caller can defer them (re-queue = the backpressure loop), keeping the
report-never-drop audit contract.

Scale shape: state is per-domain (the politeness key space —
registrable domains, ~10^7 at web scale, hash-partitioned like every
other domain-keyed stage); batches sort only within (domain, batch) —
no global order anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMIT_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("admitted", T.IntegerType()),
        T.StructField("tokens_after", T.LongType()),
    ]
)
TOKEN_STATE_SCHEMA = T.StructType([T.StructField("tokens", T.LongType())])


def admission_stream(requests: DataFrame, rate: int, burst: int) -> DataFrame:
    """(domain, url, admitted, tokens_after) per request row; bucket
    state carried across micro-batches per domain. ``requests`` is a
    streaming DataFrame with (domain, url) columns."""
    if rate < 0 or burst < 1:
        raise ValueError("rate must be >= 0 and burst >= 1")

    def _admit(key, pdf_iter, state: GroupState):
        tokens = min(state.get[0] + rate, burst) if state.exists else burst
        out = []
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            rows = pd.concat(chunks).sort_values("url")
            for r in rows.itertuples():
                ok = 1 if tokens > 0 else 0
                tokens -= ok
                out.append((key[0], r.url, ok, tokens))
        state.update((tokens,))
        yield pd.DataFrame(
            out, columns=["domain", "url", "admitted", "tokens_after"]
        )

    return requests.groupBy("domain").applyInPandasWithState(
        _admit, ADMIT_SCHEMA, TOKEN_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def expected_admissions(requests: DataFrame, burst: int) -> DataFrame:
    """Batch twin for a SINGLE micro-batch from cold state: url-rank
    per domain <= burst. The cross-batch refill semantics are what
    the streaming tests pin incrementally."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("domain").orderBy("url")
    return requests.select(
        "domain",
        "url",
        (F.row_number().over(w) <= burst).cast("int").alias("admitted"),
    )
