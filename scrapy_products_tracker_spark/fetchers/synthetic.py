"""Fetch stage: claimed batch -> page responses + decoded image payloads.

The reference's fetch layer is Scrapy's downloader (proxies:
middlewares/http_proxy_middleware.py; retry: retry_middleware.py:29-38;
images: pipelines/save_images_pipeline.py:13-25). This sandbox has no
network, so — exactly like the reference's own tests, which fake the
network at the downloader boundary with a canned-200 middleware
(tests/rmq_new_tests/conftest.py:15-17) — the fetcher resolves URLs
against the synthetic ``pages`` table. The interface is pluggable: a
production fetcher is the same ``mapInPandas`` shape doing real HTTP
inside the Arrow batch.

Scale notes:
- the claimed batch is tiny relative to the page corpus, so the lookup
  is a broadcast **semi-join pushdown**: pages ⋉ broadcast(claimed)
  first (prunes the big scan), then broadcast the survivors back onto
  the claimed rows. No large shuffle, no full-corpus pass after AQE
  prunes; claimed rows missing from the corpus behave like DNS
  failures (hardware-error class X3).
- image payload bytes are joined **late** (only for tier-1 rows that
  fetched OK) and never shuffled with the frontier (SURVEY.md §4).
- decode -> invariant-check -> re-encode runs in ``mapInPandas`` over
  Arrow batches (codec work per image inside the batch; no
  row-at-a-time Python UDFs).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..imaging import decode_image, encode_image, phash64
from ..schemas import MAX_ATTEMPTS

# outcome classes for a claimed URL after one fetch attempt
OK = "ok"
RETRY = "retry"  # retryable failure, attempts remain (403 / timeout)
FAIL_HW = "fail_hw"  # timeout/tunnel class exhausted (X3 -> 41)
FAIL_LOGIC = "fail_logic"  # 4xx/5xx non-retryable or 403 exhausted (-> 4)


def resolve_pages(claimed: DataFrame, pages: DataFrame) -> DataFrame:
    """Left-join page metadata onto the claimed batch without shuffling
    the page corpus: semi-join pushdown then broadcast-back."""
    keys = claimed.select("url")
    hit = pages.join(F.broadcast(keys), "url", "leftsemi")
    return claimed.join(F.broadcast(hit.drop("domain", "tier")), "url", "left")


def with_simulated_latency(resolved: DataFrame, scale: float) -> DataFrame:
    """Charge each page's ``latency_ms`` as real wall time, serially per
    partition — i.e. each executor core behaves as one HTTP connection
    working through its share of the claimed batch (the reference holds
    16 concurrent connections per spider process, settings.py:40).
    Under this model crawl throughput scales with total cores exactly
    the way a fetch-bound crawl scales with concurrent connections,
    which is what the N -> 4N scaling benchmark measures. ``scale``
    multiplies the stored latencies (0 disables)."""
    if scale <= 0:
        return resolved
    schema = resolved.schema

    def _sleep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        for pdf in batches:
            time.sleep(float(pdf["latency_ms"].fillna(0).sum()) * scale / 1000.0)
            yield pdf

    return resolved.mapInPandas(_sleep, schema)


def follow_redirects(
    claimed: DataFrame,
    redirects: DataFrame,
    max_hops: int = 3,
    url_col: str = "url",
) -> DataFrame:
    """Resolve 3xx chains before the page fetch: ``max_hops`` bounded
    left joins against the redirect map — the fetch-layer twin of
    Scrapy's RedirectMiddleware with ``REDIRECT_MAX_TIMES``; a chain
    (or loop) still unresolved after the budget is the reference's
    max-redirections-reached NACK
    (tests/rmq_new_tests/test_max_redirections_reached_nacked.py: a
    301 pointing at itself must exhaust the budget and nack → here
    ``redirect_exceeded = 1``, which the crawl driver maps to the
    FAIL_LOGIC/ERROR class).

    ``redirects`` is (url, redirect_to) — the 3xx slice of the page
    corpus. Adds ``final_url`` (the landing URL the fetch should
    resolve), ``n_redirects`` (hops actually taken, ≤ max_hops) and
    ``redirect_exceeded`` (0/1). Loops never hang: each hop is one
    bounded join, a cycle simply consumes its budget and exceeds.

    Scale shape: ``max_hops`` equi-joins keyed on the current landing
    URL (sort-merge at 10^10; the redirect slice of a web corpus is
    too large to assume broadcastable — Catalyst/AQE will still
    broadcast it when it measures small). Claims are chunk-bounded, so
    each hop shuffles only the round's claim, not the corpus."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    r = redirects.select(
        F.col(redirects.columns[0]).alias("_r_src"),
        F.col(redirects.columns[1]).alias("_r_dst"),
    )
    out = claimed.withColumn("final_url", F.col(url_col)).withColumn(
        "n_redirects", F.lit(0)
    )
    for _ in range(max_hops):
        out = (
            out.join(r, out["final_url"] == r["_r_src"], "left")
            .withColumn(
                "n_redirects",
                F.when(
                    F.col("_r_dst").isNotNull(), F.col("n_redirects") + 1
                ).otherwise(F.col("n_redirects")),
            )
            .withColumn("final_url", F.coalesce(F.col("_r_dst"), F.col("final_url")))
            .drop("_r_src", "_r_dst")
        )
    return (
        out.join(r, out["final_url"] == r["_r_src"], "left")
        .withColumn("redirect_exceeded", F.col("_r_dst").isNotNull().cast("int"))
        .drop("_r_src", "_r_dst")
    )


def classify_fetch(resolved: DataFrame, inline_retries: bool = False) -> DataFrame:
    """Add ``eff_status`` (flaky 403s clear after ``flaky_until``
    attempts — the retry-then-success path, X1) and ``outcome``.

    ``inline_retries=False`` (parity model): one attempt per claim;
    transient failures come back ``RETRY`` and re-enter the frontier for
    a later round (the reference's reply-consumer path).

    ``inline_retries=True`` (fetch-layer model): retries happen INSIDE
    the fetch call, the way the reference's retry middleware immediately
    re-schedules a copied request in the same crawl
    (middlewares/retry_middleware.py:29-38, budget RETRY_TIMES=5). A
    real HTTP fetcher loops in the UDF; the synthetic fetcher resolves
    the loop in closed form (a flaky 403 clears at attempt
    ``flaky_until``; everything else exhausts the budget), so each URL
    reaches its final outcome in one pass, with ``attempt`` recording
    the attempts actually consumed. No ``RETRY`` rows are emitted.
    """
    if inline_retries:
        raw = F.coalesce(F.col("status_code"), F.lit(-1))
        clears = (
            (raw == 403) & (F.col("flaky_until") > 0) & (F.col("flaky_until") <= MAX_ATTEMPTS - 1)
        )
        eff = F.when(clears, F.lit(200)).otherwise(raw)
        outcome = (
            F.when(eff == 200, F.lit(OK))
            .when(eff == -1, F.lit(FAIL_HW))
            .otherwise(F.lit(FAIL_LOGIC))
        )
        attempt = (
            F.when(clears, F.greatest(F.col("attempt"), F.col("flaky_until")))
            .when(eff.isin(403, -1), F.lit(MAX_ATTEMPTS - 1))  # exhausted the budget
            .otherwise(F.col("attempt"))
        )
        return (
            resolved.withColumn("eff_status", eff)
            .withColumn("outcome", outcome)
            .withColumn("attempt", attempt)
        )
    eff = (
        F.when(F.col("status_code").isNull(), F.lit(-1))  # unresolvable = hardware class
        .when(
            (F.col("status_code") == 403)
            & (F.col("flaky_until") > 0)
            & (F.col("attempt") >= F.col("flaky_until")),
            F.lit(200),
        )
        .otherwise(F.col("status_code"))
    )
    retryable = eff.isin(403, -1)
    exhausted = F.col("attempt") + 1 >= F.lit(MAX_ATTEMPTS)
    outcome = (
        F.when(eff == 200, F.lit(OK))
        .when(retryable & ~exhausted, F.lit(RETRY))
        .when(eff == -1, F.lit(FAIL_HW))
        .otherwise(F.lit(FAIL_LOGIC))
    )
    return resolved.withColumn("eff_status", eff).withColumn("outcome", outcome)


_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("round", T.IntegerType()),
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("position", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)

# event-time column appended JVM-side after decode (streaming consumers
# watermark on it; excluded from deterministic parity comparisons)
PAYLOAD_SCHEMA_WITH_TS = T.StructType(
    _PAYLOAD_SCHEMA.fields + [T.StructField("fetched_at", T.TimestampType())]
)


def fetch_payloads(
    ok_tier1: DataFrame, image_caption: DataFrame, round_no: int, reencode: bool = True
) -> DataFrame:
    """Emit item rows for successfully fetched detail pages (K1/K3).

    Joins the payload table late (semi-join pushdown, broadcast-back),
    then decodes each image inside Arrow batches, recomputes the
    perceptual hash from decoded pixels, and (optionally) re-encodes —
    simulating the download+store transcode the reference's image
    pipeline performs. The emitted bytes must still satisfy the
    PSNR>=40dB invariant vs the source pixels (lossless for PNG).
    """
    keys = ok_tier1.select(F.col("image_id").alias("_iid")).where(F.col("_iid").isNotNull())
    payload = image_caption.join(
        F.broadcast(keys), image_caption["image_id"] == F.col("_iid"), "leftsemi"
    )
    joined = ok_tier1.select("url", "image_id", "position").join(
        F.broadcast(payload), "image_id", "inner"
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes, out_phash, ok_flags = [], [], []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(data))
                    out_phash.append(phash64(px))
                    out_bytes.append(encode_image(px, fmt) if reencode else bytes(data))
                    ok_flags.append(True)
                except Exception:
                    out_phash.append(0)
                    out_bytes.append(b"")
                    ok_flags.append(False)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "round": round_no,
                    "image_id": pdf["image_id"],
                    "bytes": out_bytes,
                    "w": pdf["w"],
                    "h": pdf["h"],
                    "fmt": pdf["fmt"],
                    "caption": pdf["caption"],
                    "phash": out_phash,
                    "position": pdf["position"],
                    "decode_ok": ok_flags,
                }
            )

    return joined.mapInPandas(_decode, _PAYLOAD_SCHEMA).withColumn(
        "fetched_at", F.current_timestamp()
    )
