"""Serve a synthetic world over real loopback HTTP sockets.

The synthetic fetcher resolves URLs against the world's ``pages``
table in-process; this server exposes the SAME world through
``http.server`` so the real-socket fetcher (``fetchers/http.py``) can
be driven end-to-end: every fetch is a genuine TCP connect + HTTP
request/response, 403-flaky pages return real 403s until their
``flaky_until`` hit count clears (the reference's retry middleware
scenario, middlewares/retry_middleware.py:29-38), logic errors return
their real status codes, and URLs missing from the world abort the
connection without a response (the DNS/timeout hardware class X3).

URL mapping: the crawl's canonical ``https://{domain}{path}`` is
served at ``http://127.0.0.1:{port}/{domain}{path}`` — the engine's
URL space stays the public one; only the socket layer is loopback
(the fetcher's ``base_url`` rewrite). 200 responses carry a JSON
envelope of the page row's structured fields (the API-response model:
listing pages in the synthetic world are structured rows, not HTML;
detail pages carry their rendered HTML in ``body``).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd

_ENVELOPE_FIELDS = (
    "next_url",
    "total_items",
    "outlinks",
    "image_id",
    "latency_ms",
    "category",
    "body",
)


class WorldHTTPServer:
    """Threaded loopback server over a world's ``pages`` table.

    ``latency_scale`` > 0 sleeps ``latency_ms * scale / 1000`` per
    request before responding — real wall-clock latency over a real
    socket (the socket twin of ``with_simulated_latency``).
    """

    def __init__(self, pages: pd.DataFrame, latency_scale: float = 0.0):
        self._rows: dict[str, dict] = {}
        for _, r in pages.iterrows():
            d = {k: r[k] for k in ("status_code", "flaky_until", *_ENVELOPE_FIELDS)}
            ol = d.get("outlinks")
            d["outlinks"] = [str(u) for u in ol] if ol is not None else []
            # 3xx rows serve a REAL Location header (canonical URL
            # space — like a production server; the client re-maps it
            # onto its loopback base exactly as it maps claim URLs)
            d["redirect_to"] = (
                str(r["redirect_to"])
                if "redirect_to" in pages.columns and pd.notna(r["redirect_to"])
                else None
            )
            self._rows[str(r["url"])] = d
        self.latency_scale = latency_scale
        self.hits: dict[str, int] = {}
        # keep-alive observability: TCP connections accepted vs HTTP
        # requests served — the client's connection pool is working iff
        # n_connections << n_requests (BENCH_HTTP reports both)
        self.n_connections = 0
        self.n_requests = 0
        # absolute-form request targets (RFC 9112 §3.2.2 — how a client
        # speaks to an HTTP proxy): (canonical_url, Proxy-Authorization)
        # per proxied request, so tests can pin T1/T2 over real sockets
        self.proxied: list[tuple[str, str | None]] = []
        self._lock = threading.Lock()
        self._srv: ThreadingHTTPServer | None = None

    # -- lifecycle -----------------------------------------------------
    def start(self) -> str:
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # tests must stay quiet
                pass

            def setup(self):
                super().setup()
                with outer._lock:
                    outer.n_connections += 1

            def do_GET(self):
                with outer._lock:
                    outer.n_requests += 1
                outer._handle(self)

        class _Server(ThreadingHTTPServer):
            daemon_threads = True

            def handle_error(self, request, client_address):
                # a timed-out client (the X3 timeout class) closes its
                # socket mid-response; the resulting BrokenPipe is
                # expected traffic, not a server bug — stay quiet
                pass

        self._srv = _Server(("127.0.0.1", 0), _Handler)
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return f"http://127.0.0.1:{self._srv.server_port}"

    def stop(self):
        if self._srv is not None:
            self._srv.shutdown()
            self._srv.server_close()
            self._srv = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- request handling ----------------------------------------------
    def _canonical_url(self, path: str) -> str:
        # /{domain}{path}?{query} -> https://{domain}{path}?{query};
        # absolute-form targets (a client talking to us as its HTTP
        # proxy, RFC 9112 §3.2.2) strip their own scheme://netloc first
        if path.startswith(("http://", "https://")):
            from urllib.parse import urlsplit

            p = urlsplit(path)
            rest = (p.path or "/").lstrip("/")
            out = f"https://{rest}"
            if p.query:
                out += f"?{p.query}"
            return out
        rest = path.lstrip("/")
        return f"https://{rest}"

    def _handle(self, h: BaseHTTPRequestHandler):
        url = self._canonical_url(h.path)
        if h.path.startswith(("http://", "https://")):
            with self._lock:
                self.proxied.append((url, h.headers.get("Proxy-Authorization")))
        row = self._rows.get(url)
        if row is None:
            # hardware class: abort without an HTTP response (the
            # client sees RemoteDisconnected — a real network failure)
            h.close_connection = True
            return
        with self._lock:
            n_prior = self.hits.get(url, 0)
            self.hits[url] = n_prior + 1
        lat = row.get("latency_ms")
        if self.latency_scale > 0 and lat is not None and not pd.isna(lat):
            time.sleep(float(lat) * self.latency_scale / 1000.0)
        status = int(row["status_code"]) if not pd.isna(row["status_code"]) else None
        if status is None:
            h.close_connection = True
            return
        flaky = int(row["flaky_until"]) if not pd.isna(row["flaky_until"]) else 0
        if status == 403 and flaky > 0 and n_prior >= flaky:
            status = 200  # flaky 403 cleared after `flaky_until` hits (X1)
        if row["redirect_to"] is not None and 300 <= status < 400:
            h.send_response(status)
            h.send_header("Location", row["redirect_to"])
            h.send_header("Content-Length", "0")
            h.end_headers()
            return
        if status != 200:
            body = b"{}"
            h.send_response(status)
            h.send_header("Content-Type", "application/json")
            h.send_header("Content-Length", str(len(body)))
            h.end_headers()
            h.wfile.write(body)
            return
        env = {}
        for k in _ENVELOPE_FIELDS:
            v = row.get(k)
            if v is None or (not isinstance(v, (list, str)) and pd.isna(v)):
                env[k] = None
            elif k in ("total_items", "latency_ms"):
                env[k] = int(v)
            else:
                env[k] = v
        body = json.dumps(env).encode("utf-8")
        h.send_response(200)
        h.send_header("Content-Type", "application/json")
        h.send_header("Content-Length", str(len(body)))
        h.end_headers()
        h.wfile.write(body)
