"""Real-socket HTTP fetcher (S7/X1-X3 over sockets).

The synthetic fetcher fakes the network at the downloader boundary —
exactly like the reference's own tests (tests/rmq_new_tests/
conftest.py:15-17 cans every response). This module is the production
half of that pluggable seam: the SAME ``mapInPandas`` shape doing real
HTTP with ``urllib.request`` inside the Arrow batch, one connection
per executor slot working through its share of the claimed batch (the
reference holds 16 concurrent connections per spider process,
settings.py:40).

Retry semantics mirror the reference's retry middleware
(middlewares/retry_middleware.py:29-38, RETRY_TIMES budget) in the
fetch-layer model (``classify_fetch(inline_retries=True)``): 403 and
network-level failures (timeout / refused / reset — the Tunnel class)
retry INSIDE the fetch call up to ``max_attempts``; everything else is
terminal on first response. Outcome classes and the ``attempt``
bookkeeping are bit-identical to the synthetic classifier, which is
what lets the loopback parity test (tests/test_http_fetch.py) pin the
whole crawl byte-for-byte against the table-resolved run.

Scale notes: the kernel is Arrow-batched (no row-at-a-time Python
UDFs in the plan); each batch row costs one-or-more blocking socket
round-trips, so fetch parallelism == executor cores == concurrent
connections — throughput scales with cores exactly like a fetch-bound
crawl scales with connections (the N -> 4N scaling bench's model).
Per-request proxy columns (``proxy`` / ``proxy_authorization``,
fetchers/proxy.py T1/T2) are honored when present.

Connection reuse: non-proxied requests run over a per-worker-process
keep-alive pool (one ``http.client`` connection per (scheme, host),
module-global so it survives across Arrow batches AND across rounds
in reused Python workers) — at real scale TCP+TLS setup dominates
small fetches, so connects must be ≪ requests. A connection-level
failure on a connection that already served a request retries ONCE on
a fresh connection (stale keep-alive is a client-side artifact, not a
server signal) — invisibly to the attempt bookkeeping; fresh-
connection failures and timeouts surface as the genuine hardware
class. Python workers are single-threaded (one task at a time), so
the pool needs no locking. Proxied requests keep the one-shot urllib
path (CONNECT tunneling / absolute-form targets).
"""

from __future__ import annotations

import json
from typing import Iterator
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..schemas import MAX_ATTEMPTS
from .synthetic import FAIL_HW, FAIL_LOGIC, OK

_PAGE_FIELDS = [
    T.StructField("status_code", T.IntegerType()),
    T.StructField("flaky_until", T.IntegerType()),
    T.StructField("next_url", T.StringType()),
    T.StructField("total_items", T.IntegerType()),
    T.StructField("outlinks", T.ArrayType(T.StringType())),
    T.StructField("image_id", T.StringType()),
    T.StructField("latency_ms", T.IntegerType()),
    T.StructField("category", T.StringType()),
    T.StructField("body", T.StringType()),
    T.StructField("eff_status", T.IntegerType()),
    T.StructField("outcome", T.StringType()),
]


# per-worker-process keep-alive pool: (scheme, netloc) -> {conn, served}.
# One Spark Python worker runs one task at a time, so no lock is needed;
# with spark.python.worker.reuse (default) connections persist across
# tasks and crawl rounds.
_POOL: dict = {}


def _pooled_fetch(url: str, headers: dict, timeout_s: float):
    """One GET over the keep-alive pool; returns ``(status,
    headers_dict, body)``. Stale-keep-alive retry policy: a
    connection-level error on a connection that has already served a
    request retries once on a fresh connection; timeouts and
    fresh-connection failures propagate (the real X3 hardware class)."""
    import http.client

    p = urlsplit(url)
    key = (p.scheme, p.netloc)
    path = p.path or "/"
    if p.query:
        path += "?" + p.query
    stale_retry = False
    while True:
        entry = _POOL.get(key)
        if entry is None:
            cls = (
                http.client.HTTPSConnection
                if p.scheme == "https"
                else http.client.HTTPConnection
            )
            entry = {"conn": cls(p.netloc, timeout=timeout_s), "served": 0}
            _POOL[key] = entry
        conn = entry["conn"]
        try:
            conn.request("GET", path, headers=headers)
            resp = conn.getresponse()
            body = resp.read()
        except Exception as e:
            conn.close()
            _POOL.pop(key, None)
            if isinstance(e, TimeoutError) or entry["served"] == 0 or stale_retry:
                raise
            stale_retry = True  # stale keep-alive: one silent fresh retry
            continue
        entry["served"] += 1
        if resp.will_close:
            conn.close()
            _POOL.pop(key, None)
        return resp.status, dict(resp.headers), body


def _rewrite(url: str, base_url: str | None) -> str:
    """Map the canonical public URL onto a loopback base:
    https://{host}{path}?{q} -> {base_url}/{host}{path}?{q}.
    ``base_url=None`` fetches the URL as-is (production)."""
    if not base_url:
        return url
    p = urlsplit(url)
    out = f"{base_url}/{p.netloc}{p.path or '/'}"
    if p.query:
        out += f"?{p.query}"
    return out


def fetch_http(
    claimed: DataFrame,
    *,
    base_url: str | None = None,
    timeout_s: float = 10.0,
    max_attempts: int = MAX_ATTEMPTS,
    user_agent: str = "sparkbot",
    max_redirects: int | None = None,
) -> DataFrame:
    """Claimed batch -> fetched + classified rows over real sockets.

    Output schema = claimed columns + the page envelope columns +
    ``eff_status``/``outcome``, with ``attempt`` rewritten to the
    attempts actually consumed — the same contract as
    ``resolve_pages`` |> ``classify_fetch(inline_retries=True)``, so
    the crawl driver's downstream (expansion, extraction, stats,
    status state machine) is fetcher-agnostic.

    ``max_redirects``: follow real 3xx Location chains up to this many
    hops INSIDE the fetch (urllib's own auto-follow is disabled so the
    budget is ours, like Scrapy's REDIRECT_MAX_TIMES); a chain/loop
    still 3xx after the budget is terminal FAIL_LOGIC — the
    reference's max-redirections-reached NACK over genuine sockets,
    byte-identical to the synthetic
    ``follow_redirects`` |> ``classify_fetch`` model. Location is
    interpreted in the canonical public URL space and re-mapped onto
    ``base_url`` exactly like claim URLs. None (default) = first 3xx
    terminal (parity with redirect-free crawls).
    """
    out_fields = [f for f in claimed.schema.fields] + [
        f for f in _PAGE_FIELDS if f.name not in claimed.columns
    ]
    schema = T.StructType(out_fields)
    claimed_cols = list(claimed.columns)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.error
        import urllib.request
        from urllib.parse import urljoin

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            # 3xx must surface as HTTPError so OUR budget decides —
            # urllib's silent auto-follow (its own cap of 10) would
            # diverge from the synthetic classifier's 3xx semantics
            def redirect_request(self, req, fp, code, msg, headers, newurl):
                return None

        def _one(url: str, attempt0: int, proxy: str | None, proxy_auth: str | None):
            # one HTTP exchange: (status, location_or_None, body). Non-
            # proxied requests ride the keep-alive pool; proxied ones
            # keep the one-shot urllib path (absolute-form/CONNECT).
            if proxy:
                # strip embedded credentials (they ride the explicit
                # Proxy-Authorization header, like the reference's
                # middleware) so urllib doesn't double-handle them
                bare = proxy.split("://", 1)
                host = bare[1].split("@", 1)[-1] if len(bare) == 2 else proxy
                scheme = bare[0] if len(bare) == 2 else "http"
                opener = urllib.request.build_opener(
                    _NoRedirect(),
                    urllib.request.ProxyHandler(
                        {"http": f"{scheme}://{host}", "https": f"{scheme}://{host}"}
                    ),
                )

                def exchange(cur: str):
                    req = urllib.request.Request(
                        _rewrite(cur, base_url), headers={"User-Agent": user_agent}
                    )
                    if proxy_auth:
                        req.add_header("Proxy-Authorization", proxy_auth)
                    try:
                        with opener.open(req, timeout=timeout_s) as resp:
                            return int(resp.status), None, resp.read()
                    except urllib.error.HTTPError as e:
                        loc = e.headers.get("Location") if e.headers else None
                        return int(e.code), loc, b""

            else:

                def exchange(cur: str):
                    hdrs = {"User-Agent": user_agent}
                    if proxy_auth:
                        hdrs["Proxy-Authorization"] = proxy_auth
                    st, rh, raw = _pooled_fetch(
                        _rewrite(cur, base_url), hdrs, timeout_s
                    )
                    return int(st), rh.get("Location"), raw

            eff, env = -1, {}
            tries = 0
            while tries < max_attempts:
                tries += 1
                cur, hops = url, 0  # each attempt re-walks from the claim url
                while True:
                    try:
                        eff, loc, raw = exchange(cur)
                        if eff == 200:
                            try:
                                env = json.loads(raw.decode("utf-8"))
                            except Exception:
                                env = {}  # malformed body: fetched but empty (X6)
                        elif (
                            max_redirects is not None
                            and 300 <= eff < 400
                            and hops < max_redirects
                            and loc
                        ):  # follow in canonical space; budget is ours
                            hops += 1
                            cur = urljoin(cur, loc)
                            continue
                    except Exception:
                        eff = -1  # timeout / refused / reset: hardware class
                    break
                if eff == 200:
                    break
                if eff not in (403, -1):
                    break  # non-retryable logic error: terminal first response
            # attempt bookkeeping == classify_fetch(inline_retries=True)
            if eff == 200:
                outcome, attempt = OK, max(attempt0, tries - 1)
            elif eff == -1:
                outcome, attempt = FAIL_HW, max_attempts - 1
            elif eff == 403:
                outcome, attempt = FAIL_LOGIC, max_attempts - 1
            else:
                outcome, attempt = FAIL_LOGIC, attempt0
            return eff, outcome, attempt, env

        for pdf in batches:
            n = len(pdf)
            cols: dict[str, list] = {f.name: [] for f in _PAGE_FIELDS}
            attempts = []
            proxies = pdf["proxy"] if "proxy" in pdf.columns else [None] * n
            auths = (
                pdf["proxy_authorization"]
                if "proxy_authorization" in pdf.columns
                else [None] * n
            )
            for url, attempt0, proxy, auth in zip(pdf["url"], pdf["attempt"], proxies, auths):
                eff, outcome, attempt, env = _one(
                    str(url),
                    int(attempt0),
                    None if proxy is None or (isinstance(proxy, float) and pd.isna(proxy)) else str(proxy),
                    None if auth is None or (isinstance(auth, float) and pd.isna(auth)) else str(auth),
                )
                attempts.append(attempt)
                cols["status_code"].append(eff if eff != -1 else None)
                cols["flaky_until"].append(None)  # server-side state, unknown here
                cols["eff_status"].append(eff)
                cols["outcome"].append(outcome)
                for k in ("next_url", "image_id", "category", "body"):
                    cols[k].append(env.get(k))
                for k in ("total_items", "latency_ms"):
                    v = env.get(k)
                    cols[k].append(None if v is None else int(v))
                ol = env.get("outlinks")
                cols["outlinks"].append(list(ol) if ol else [])
            out = {c: pdf[c] for c in claimed_cols}
            out["attempt"] = pd.Series(attempts, dtype="object")
            for f in _PAGE_FIELDS:
                if f.name not in claimed_cols:
                    out[f.name] = pd.Series(cols[f.name], dtype="object")
            yield pd.DataFrame(out)

    return claimed.mapInPandas(_kernel, schema)
