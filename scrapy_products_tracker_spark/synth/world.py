"""Deterministic synthetic crawl world (seeds, pages, payload, robots).

Replaces the network for tests and benchmarks (the reference's tests do
the same thing at the downloader boundary with a canned-200 middleware,
tests/rmq_new_tests/conftest.py:15-17). Everything is a pure function
of the integer seed; schemas match FIXTURES.md and schemas.py.

The graph models the reference's two-tier crawl (category/listing ->
product/detail, SURVEY.md §2.6):

- some domains paginate via a *sequential* next_url chain (costco /
  viking / quill / customink style, F2),
- others expose ``total_items`` on page 1 for *computed* fan-out
  (zoro ``pages_needed = ceil(total/36)``, F1),
- ~``dup_frac`` of detail URLs appear in two categories (exercises the
  seen-set), a slice of outlinks lands under robots-disallowed
  prefixes, some detail pages 403/timeout (retry path), and one "hot"
  domain holds most URLs (skew knob for the salted scheduler).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..imaging import encode_image, phash64
from .html import _CODE, product_meta, render_detail_html_site, site_for_domain

PAGINATION_SIZE = 12  # detail links per listing page (reference zoro: 36)
WORLD_VERSION = 3  # bump when generated schemas/content change (cache key)
# v3: multi-site detail rendering (per-domain site shapes, html.py) +
#     robots table carries the per-domain parser `site` key


@dataclass(frozen=True)
class WorldSpec:
    seed: int = 42
    n_domains: int = 8
    cats_per_domain: int = 2
    hot_domain_cats: int = 8  # extra categories on the hot domain (skew)
    chain_len_max: int = 5  # listing pages per category
    items_per_page: int = PAGINATION_SIZE
    dup_frac: float = 0.10
    err_403_frac: float = 0.03  # permanently forbidden details
    err_timeout_frac: float = 0.02  # hardware-error details
    err_404_frac: float = 0.02
    flaky_frac: float = 0.03  # 403 that clears after 2 attempts
    robots_block_frac: float = 0.05
    img_px_min: int = 8
    img_px_max: int = 48
    jpeg_frac: float = 0.5
    crawl_delays_ms: tuple = (0, 0, 100, 250)
    budgets: tuple = (4, 8, 16)
    compress_level: int = 1
    latency_ms: tuple = (10, 200)  # simulated fetch latency range per page
    # F3: first domain's detail pages omit price/stock from the HTML;
    # chained endpoint responses (inventory/price JSON) carry them
    chain_endpoints: bool = False


def _rng_for(spec_seed: int, *parts) -> np.random.Generator:
    h = hashlib.sha256(("|".join(map(str, parts)) + f"|{spec_seed}").encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "big"))


def _source_pixels(rng: np.random.Generator, spec: WorldSpec) -> tuple[np.ndarray, str]:
    """Ground-truth source pixels + chosen format for one image.

    Consumes the rng draws in the exact order ``_image_row`` always has,
    so worlds stay byte-identical. Exposed separately so the oracle
    builders can recompute expected decoded pixels from the generator's
    ground truth without going through the codec round-trip."""
    w = int(rng.integers(spec.img_px_min, spec.img_px_max + 1))
    h = int(rng.integers(spec.img_px_min, spec.img_px_max + 1))
    # low-frequency content so PNG compresses and phash is non-degenerate
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 96 * np.sin(xx / max(2, w / 4) + rng.uniform(0, 6.28))
        + 64 * np.cos(yy / max(2, h / 4) + rng.uniform(0, 6.28))
    )
    noise = rng.integers(-24, 25, size=(h, w, 3))
    pixels = np.clip(base[:, :, None] + noise, 0, 255).astype(np.uint8)
    fmt = "jpeg" if rng.random() < spec.jpeg_frac else "png"
    return pixels, fmt


def _image_row(spec: WorldSpec, image_id: str) -> dict:
    rng = _rng_for(spec.seed, "img", image_id)
    pixels, fmt = _source_pixels(rng, spec)
    h, w = pixels.shape[0], pixels.shape[1]
    data = encode_image(pixels, fmt)
    words = rng.choice(
        ["ridge", "lamp", "copper", "harbor", "granite", "fern", "signal", "meadow", "prism", "atlas"],
        size=4,
        replace=True,
    )
    caption = f"{image_id}: " + " ".join(words)
    return {
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": phash64(pixels),
    }


@dataclass
class World:
    seeds: pd.DataFrame
    pages: pd.DataFrame
    image_caption: pd.DataFrame
    robots: pd.DataFrame
    truth: pd.DataFrame = field(default=None)  # ground-truth product fields
    endpoints: pd.DataFrame = field(default=None)  # F3 chained responses
    spec: WorldSpec = field(default=None)


def generate_world(spec: WorldSpec) -> World:
    rng = _rng_for(spec.seed, "world")
    domains = [f"d{i}.example.com" for i in range(spec.n_domains - 1)] + ["hot.example.com"]

    robots_rows = []
    for d in domains:
        r = _rng_for(spec.seed, "robots", d)
        robots_rows.append(
            {
                "domain": d,
                "disallow_prefixes": ["/private"],
                "crawl_delay_ms": int(r.choice(spec.crawl_delays_ms)),
                "max_per_round": int(r.choice(spec.budgets)),
                # per-domain parser key (the reference's per-site spider
                # classes): rides the domain config table so the crawl
                # driver can broadcast-join it onto fetched rows
                "site": site_for_domain(d),
            }
        )

    seeds, pages, detail_urls_by_domain = [], [], {}
    detail_category: dict[str, str] = {}  # first-discovery category path
    pid_counter = 0
    for d in domains:
        n_cats = spec.cats_per_domain + (spec.hot_domain_cats if d.startswith("hot.") else 0)
        detail_urls_by_domain[d] = []
        for c in range(n_cats):
            r = _rng_for(spec.seed, "cat", d, c)
            cat_base = f"https://{d}/cat/{c}"
            chain_len = int(r.integers(1, spec.chain_len_max + 1))
            computed = bool(r.random() < 0.5)  # F1 vs F2 pagination style
            seeds.append({"url": cat_base, "tier": 0, "seed_rank": len(seeds)})
            page_urls = [cat_base] + [f"{cat_base}?page={p}" for p in range(2, chain_len + 1)]
            for pi, purl in enumerate(page_urls):
                outlinks = []
                for s in range(spec.items_per_page):
                    rr = r.random()
                    if rr < spec.robots_block_frac:
                        outlinks.append(f"https://{d}/private/p/{pid_counter}")
                        pid_counter += 1
                    elif rr < spec.robots_block_frac + spec.dup_frac and detail_urls_by_domain[d]:
                        # re-discovery of an existing detail URL (dedup
                        # path). Index with r.integers, NOT r.choice(list):
                        # Generator.choice converts the whole list to an
                        # ndarray per call — O(len) — which turns this loop
                        # quadratic on the hot domain at big --big-scale
                        # worlds (measured ~71 ms/draw at 400k URLs; hours
                        # at 30x). integers() consumes the identical RNG
                        # stream (choice delegates to it for the uniform
                        # no-p case), so generated worlds are byte-identical.
                        pool = detail_urls_by_domain[d]
                        outlinks.append(pool[int(r.integers(0, len(pool)))])
                    else:
                        u = f"https://{d}/p/{pid_counter}"
                        pid_counter += 1
                        outlinks.append(u)
                        detail_urls_by_domain[d].append(u)
                        detail_category[u] = f"/cat/{c}"
                pages.append(
                    {
                        "url": purl,
                        "domain": d,
                        "tier": 0,
                        "status_code": 200,
                        "flaky_until": 0,
                        "next_url": (
                            None
                            if computed or pi == len(page_urls) - 1
                            else page_urls[pi + 1]
                        ),
                        "total_items": (
                            chain_len * spec.items_per_page if computed and pi == 0 else None
                        ),
                        "outlinks": outlinks,
                        "image_id": None,
                        "latency_ms": int(r.integers(*spec.latency_ms)),
                        "category": f"/cat/{c}",
                        "body": None,  # listing responses are the JSON-API
                        # style already modeled by outlinks/total_items (E1)
                    }
                )

    # detail pages + payload + ground-truth product fields
    image_rows, seen_imgs, truth_rows, endpoint_rows = [], set(), [], []
    for d in domains:
        chained_domain = spec.chain_endpoints and d == domains[0]
        for u in detail_urls_by_domain[d]:
            r = _rng_for(spec.seed, "detail", u)
            x = r.random()
            status, flaky = 200, 0
            if x < spec.err_403_frac:
                status = 403
            elif x < spec.err_403_frac + spec.err_timeout_frac:
                status = -1
            elif x < spec.err_403_frac + spec.err_timeout_frac + spec.err_404_frac:
                status = 404
            elif x < spec.err_403_frac + spec.err_timeout_frac + spec.err_404_frac + spec.flaky_frac:
                status, flaky = 403, 2  # clears after 2 attempts (X1 retry-success)
            image_id = "img_" + u.rsplit("/", 1)[1]
            cat = detail_category.get(u, "/cat/0")
            meta = product_meta(_rng_for(spec.seed, "meta", u), u, d, cat)
            meta["chained"] = chained_domain
            body = render_detail_html_site(
                meta, u, variant=int(r.integers(0, 4)), site=site_for_domain(d)
            )
            if chained_domain:
                cur_code = _CODE[meta["currency_sym"]]
                endpoint_rows.append(
                    {
                        "url": u,
                        "endpoint": "inventory",
                        "payload": json.dumps(
                            {"in_stock": meta["in_stock"], "stock": 1 if meta["in_stock"] else 0}
                        ),
                    }
                )
                endpoint_rows.append(
                    {
                        "url": u,
                        "endpoint": "price",
                        "payload": json.dumps(
                            {
                                "current_cents": meta["current_price_cents"],
                                "regular_cents": meta["regular_price_cents"],
                                "currency": cur_code,
                            }
                        ),
                    }
                )
            truth_rows.append(
                {
                    "url": u,
                    "title": None if meta["malformed"] else meta["title"],
                    "description": None if meta["malformed"] else meta["description"],
                    "brand": None if meta["malformed"] else meta["brand"],
                    "image_url": None if meta["malformed"] else meta["image_url"],
                    "additional_info": (
                        None
                        if meta["malformed"] or not meta["additional_info"]
                        else json.dumps(meta["additional_info"], sort_keys=True)
                    ),
                    "regular_price_cents": None if meta["malformed"] else meta["regular_price_cents"],
                    "current_price_cents": None if meta["malformed"] else meta["current_price_cents"],
                    "currency": (
                        None
                        if meta["malformed"]
                        else _CODE[meta["currency_sym"]]
                    ),
                    "is_in_stock": None if meta["malformed"] else meta["in_stock"],
                    "stock": None if meta["malformed"] else (1 if meta["in_stock"] else 0),
                    "units": None if meta["malformed"] else meta["units"],
                    "category": None if meta["malformed"] else f"https://{d}{cat}",
                    "parse_ok": not meta["malformed"],
                }
            )
            pages.append(
                {
                    "url": u,
                    "domain": d,
                    "tier": 1,
                    "status_code": status,
                    "flaky_until": flaky,
                    "next_url": None,
                    "total_items": None,
                    "outlinks": [],
                    "image_id": image_id,
                    "latency_ms": int(r.integers(*spec.latency_ms)),
                    "category": cat,
                    "body": body if status != 404 else "<html><body>not found</body></html>",
                }
            )
            if image_id not in seen_imgs:
                seen_imgs.add(image_id)
                image_rows.append(_image_row(spec, image_id))

    # a couple of detail seeds too (reference has separate product CSVs)
    for d in domains[:2]:
        if detail_urls_by_domain[d]:
            seeds.append({"url": detail_urls_by_domain[d][0], "tier": 1, "seed_rank": len(seeds)})

    return World(
        seeds=pd.DataFrame(seeds),
        pages=pd.DataFrame(pages),
        image_caption=pd.DataFrame(image_rows),
        robots=pd.DataFrame(robots_rows),
        truth=pd.DataFrame(truth_rows),
        endpoints=pd.DataFrame(endpoint_rows, columns=["url", "endpoint", "payload"]),
        spec=spec,
    )


def _arrow_schemas():
    """Explicit arrow schemas — pyarrow must not type-infer (an all-None
    next_url column would otherwise land as int and poison unions)."""
    import pyarrow as pa

    return {
        "seeds": pa.schema(
            [("url", pa.string()), ("tier", pa.int32()), ("seed_rank", pa.int64())]
        ),
        "pages": pa.schema(
            [
                ("url", pa.string()),
                ("domain", pa.string()),
                ("tier", pa.int32()),
                ("status_code", pa.int32()),
                ("flaky_until", pa.int32()),
                ("next_url", pa.string()),
                ("total_items", pa.int32()),
                ("outlinks", pa.list_(pa.string())),
                ("image_id", pa.string()),
                ("latency_ms", pa.int32()),
                ("category", pa.string()),
                ("body", pa.string()),
                # 3xx landing target (None = not a redirect); consumed
                # only when CrawlConfig(max_redirect_times=...) is set
                ("redirect_to", pa.string()),
            ]
        ),
        "endpoints": pa.schema(
            [("url", pa.string()), ("endpoint", pa.string()), ("payload", pa.string())]
        ),
        "truth": pa.schema(
            [
                ("url", pa.string()),
                ("title", pa.string()),
                ("description", pa.string()),
                ("brand", pa.string()),
                ("image_url", pa.string()),
                ("additional_info", pa.string()),
                ("regular_price_cents", pa.int64()),
                ("current_price_cents", pa.int64()),
                ("currency", pa.string()),
                ("is_in_stock", pa.bool_()),
                ("stock", pa.int32()),
                ("units", pa.string()),
                ("category", pa.string()),
                ("parse_ok", pa.bool_()),
            ]
        ),
        "image_caption": pa.schema(
            [
                ("image_id", pa.string()),
                ("bytes", pa.binary()),
                ("w", pa.int32()),
                ("h", pa.int32()),
                ("fmt", pa.string()),
                ("caption", pa.string()),
                ("phash", pa.int64()),
            ]
        ),
        "robots": pa.schema(
            [
                ("domain", pa.string()),
                ("disallow_prefixes", pa.list_(pa.string())),
                ("crawl_delay_ms", pa.int64()),
                ("max_per_round", pa.int32()),
                # per-domain extraction parser key (multi-site E3)
                ("site", pa.string()),
            ]
        ),
    }


def write_world(world: World, out_dir: str) -> dict[str, str]:
    """Write the four world tables as parquet; returns name->path."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pathlib import Path

    schemas = _arrow_schemas()
    out = {}
    p = Path(out_dir)
    p.mkdir(parents=True, exist_ok=True)
    for name, df in [
        ("seeds", world.seeds),
        ("pages", world.pages),
        ("image_caption", world.image_caption),
        ("robots", world.robots),
        ("truth", world.truth),
        ("endpoints", world.endpoints),
    ]:
        if df is None:  # hand-built worlds (tests) may omit truth
            continue
        missing = [f for f in schemas[name].names if f not in df.columns]
        if missing:  # hand-built worlds predating optional columns
            df = df.copy()
            for f in missing:
                df[f] = None
        path = str(p / f"{name}.parquet")
        # bounded row groups (pyarrow's default is 1M rows/group, which
        # at --big-scale worlds makes ~1.1 GB groups of binary payloads
        # — Spark's vectored parquet read fetches a whole consecutive
        # part per task and hits its 300 s range-read time limit, and a
        # 1 GB group is also the wrong split granularity for any
        # parallel scan). 64k rows ≈ 25-70 MB groups here.
        pq.write_table(
            pa.Table.from_pandas(df, schema=schemas[name], preserve_index=False),
            path,
            row_group_size=65_536,
        )
        out[name] = path
    return out


# FIXTURES.md §7 scale presets
T1_SMOKE = WorldSpec(seed=42, n_domains=4, cats_per_domain=1, hot_domain_cats=2, chain_len_max=3)
T2_CORRECTNESS = WorldSpec(seed=42, n_domains=8, cats_per_domain=4, hot_domain_cats=24, chain_len_max=6)
BENCH = WorldSpec(
    seed=42,
    n_domains=24,
    cats_per_domain=24,
    hot_domain_cats=600,
    chain_len_max=8,
    img_px_max=32,
    # the reference's politeness envelope is 8 concurrent fetches per
    # domain with DOWNLOAD_DELAY=0 (settings.py:40-42) — a concurrency
    # cap, not a rate cap, so per-round quotas scale with round length:
    # 8 concurrent x (round_s / latency_s) fetches fit per domain.
    # Parity fixtures (T1/T2) keep small strict budgets; the throughput
    # bench uses the equivalent large-round quotas.
    budgets=(1024, 2048, 4096),
    crawl_delays_ms=(0, 0, 0, 0),
)
# Scaling-efficiency world: wide and shallow (2 content rounds), so the
# crawl is dominated by parallelizable per-URL work (simulated fetch
# latency + decode) rather than per-round fixed overhead — the sandbox
# proxy for the 10^10-URL regime, where a round is millions of URLs and
# the fixed cost amortizes to zero. Throughput then scales with cores
# the way a fetch-bound crawl scales with concurrent connections.
SCALING = WorldSpec(
    seed=42,
    n_domains=32,
    cats_per_domain=30,
    hot_domain_cats=250,
    chain_len_max=1,
    items_per_page=30,
    img_px_min=8,
    img_px_max=24,
    budgets=(1 << 20,),
    crawl_delays_ms=(0,),
    # 160-240 ms/page: realistic e-commerce fetch latency. Round 2 added
    # real per-URL work to every round (HTML field extraction, product
    # MERGE + history append); the latency budget must stay the dominant
    # term for the N->4N efficiency to measure fetch concurrency rather
    # than per-round fixed costs (BASELINE.md §2 protocol note).
    latency_ms=(160, 240),
)
