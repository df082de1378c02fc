"""Deterministic product metadata + raw-HTML renderer for detail pages.

The reference's detail spiders each scrape ~80-140 LoC of XPath/regex/
JSON-LD field extraction from real product pages
(quill_products_spider.py:78-137, costco_detail_page_spider.py:77-96,
viking_detail_page_spider.py:73-134, customink_products_spider.py:82-98).
The synthetic world mirrors that: every detail URL gets ground-truth
product fields and a rendered HTML body containing them in the idioms
those spiders face — an <h1> title, a JSON-LD <script> block, a priced
<span> with currency symbol and thousands separators, an optional
struck-through regular price, an attribute table, a stock flag, an
image tag, a breadcrumb, and an inline JS pricing object. The
extraction kernel (crawl/extract.py) must *invert* this rendering; it
shares no code with it, and parity is oracle-checked field by field.

Template variance (whitespace, attribute order, single vs double
quotes, optional blocks) is a deterministic function of the URL, and a
``malformed_frac`` slice drops the <h1> entirely — the unparseable-page
guard path (X7: costco_detail_page_spider.py:78-80 returns on a
missing title).
"""

from __future__ import annotations

import json

import numpy as np

BRANDS = ["Acme", "Zenith", "Orbit", "Nimbus", "Vector", "Quanta"]
UNITS = ["each", "pack of 6", "dozen", "case", "box"]
ADJ = ["ergonomic", "compact", "durable", "premium", "recycled", "modular"]
NOUN = ["stapler", "lamp", "binder", "chair", "keyboard", "easel", "shredder"]
ATTR_KEYS = ["Color", "Material", "Weight", "Origin", "Warranty"]
ATTR_VALS = ["blue", "steel", "1.2kg", "USA", "2y", "oak", "matte", "green"]

MALFORMED_FRAC = 0.04


def product_meta(rng: np.random.Generator, url: str, domain: str, category: str) -> dict:
    """Ground-truth fields for a detail URL (pure function of the rng)."""
    title = f"{str(rng.choice(ADJ)).capitalize()} {rng.choice(NOUN)} {int(rng.integers(100, 999))}"
    current_cents = int(rng.integers(199, 2_000_000))
    has_discount = bool(rng.random() < 0.3)
    regular_cents = current_cents + int(rng.integers(100, 50_000)) if has_discount else current_cents
    currency_sym = "$" if rng.random() < 0.8 else "£"
    in_stock = bool(rng.random() < 0.85)
    n_attrs = int(rng.integers(0, 4))
    attrs = {
        str(k): str(rng.choice(ATTR_VALS))
        for k in rng.choice(ATTR_KEYS, size=n_attrs, replace=False)
    }
    slug = url.rsplit("/", 1)[1]
    return {
        "title": title,
        "description": f"A {title.lower()} for the {rng.choice(ADJ)} workspace." if rng.random() < 0.9 else None,
        "brand": str(rng.choice(BRANDS)),
        "image_url": f"https://{domain}/img/img_{slug}.jpg",
        "current_price_cents": current_cents,
        "regular_price_cents": regular_cents,
        "has_discount": has_discount,
        "currency_sym": currency_sym,
        "in_stock": in_stock,
        "units": str(rng.choice(UNITS)),
        "additional_info": attrs,
        "category": category,
        "malformed": bool(rng.random() < MALFORMED_FRAC),
    }


def _fmt_price(cents: int, sym: str) -> str:
    return f"{sym}{cents // 100:,}.{cents % 100:02d}"


def render_detail_html(meta: dict, url: str, variant: int) -> str:
    """Render the ground truth into HTML; variant varies formatting the
    way different sites / site revisions do."""
    ws = ["", " ", "\n  ", "\n\t"][variant % 4]
    q = '"' if variant % 2 == 0 else "'"
    jsonld = json.dumps(
        {"@type": "Product", "name": meta["title"], "brand": {"name": meta["brand"]}}
    )
    parts = [f"<html><head><title>{meta['brand']} store</title>"]
    parts.append(
        f'<script type={q}application/ld+json{q} id={q}pc-jsonld{q}>{jsonld}</script></head><body>'
    )
    parts.append(
        f'<nav class={q}breadcrumb{q}><a href={q}{meta["category"]}{q}>back</a></nav>'
    )
    if not meta["malformed"]:
        parts.append(f'<h1 class={q}m-sku-title{q}>{ws}{meta["title"]}{ws}</h1>')
    if meta["description"] is not None:
        parts.append(
            f'<div class={q}skuDescription{q}><span>{meta["description"]}</span></div>'
        )
    parts.append(f'<div class={q}brand-row{q}><span>Brand</span><div>{ws}{meta["brand"]}{ws}</div></div>')
    parts.append(f'<img class={q}sku-image{q} src={q}{meta["image_url"]}{q}/>')
    if meta.get("chained"):
        # F3 costco idiom: the page carries NO price/stock — the chained
        # AjaxGetInventoryDetail / AjaxGetContractPrice endpoint
        # responses supply them (costco_detail_page_spider.py:64-177)
        price_bits = [f'<span class={q}selling-uom{q}>/ {meta["units"]}</span>']
        parts.append(f'<div class={q}pricing-wrap{q}>{"".join(price_bits)}</div>')
    else:
        cur = _fmt_price(meta["current_price_cents"], meta["currency_sym"])
        price_bits = [f'<span class={q}price-size{q}>{ws}{cur}{ws}</span>']
        price_bits.append(f'<span class={q}selling-uom{q}>/ {meta["units"]}</span>')
        if meta["has_discount"]:
            reg = _fmt_price(meta["regular_price_cents"], meta["currency_sym"])
            price_bits.append(f'<del class={q}elp-percentage{q}>{ws}{reg}{ws}</del>')
        parts.append(f'<div class={q}pricing-wrap{q}>{"".join(price_bits)}</div>')
        parts.append(
            f'<div class={q}promo-flag{q}>{"In stock" if meta["in_stock"] else "Out of stock"}</div>'
        )
    if meta["additional_info"]:
        rows = "".join(
            f"<tr><td>{k}</td><td>{v}</td></tr>" for k, v in meta["additional_info"].items()
        )
        parts.append(f'<table class={q}skuSpecification{q}>{rows}</table>')
    js = json.dumps({"itemPrice": meta["current_price_cents"] / 100.0})
    parts.append(f"<script>var pricingData = {js};</script>")
    parts.append("</body></html>")
    return "".join(parts)
