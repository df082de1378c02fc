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


SITE_KEYS = ["default", "zipspec", "jsprice", "ldjson", "kvtable"]


def site_for_domain(domain: str) -> str:
    """Deterministic per-domain site shape (the synthetic analog of the
    reference's five distinct real sites — quill/zoro/viking/customink/
    costco idioms): a stable hash of the domain picks one of the five
    shipped shapes. The crawler's per-domain config table (robots.site)
    carries this key — the parser registry never imports this module."""
    return SITE_KEYS[sum(domain.encode()) % len(SITE_KEYS)]


def render_detail_html_site(meta: dict, url: str, variant: int, site: str) -> str:
    """Dispatch ground-truth rendering to the site shape's renderer."""
    if site == "zipspec":
        return render_detail_html_zipspec(meta, url, variant)
    if site == "jsprice":
        return render_detail_html_jsprice(meta, url, variant)
    if site == "ldjson":
        return render_detail_html_ldjson(meta, url, variant)
    if site == "kvtable":
        return render_detail_html_kvtable(meta, url, variant)
    return render_detail_html(meta, url, variant)


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


def _dec(cents: int) -> str:
    """Plain decimal price string for data-* attributes / JSON strings
    (no thousands separators, no symbol): 123456 -> '1234.56'."""
    return f"{cents // 100}.{cents % 100:02d}"


_CODE = {"$": "USD", "£": "GBP"}


def render_detail_html_zipspec(meta: dict, url: str, variant: int) -> str:
    """'zipspec' site shape (zoro-like): itemprop-tagged title, data-*
    priced div carrying ISO currency codes and an optional
    data-original-price, availability span, and the spec table as TWO
    zipped <ul> lists (the zoro_products_spider zip(keys, values)
    idiom). The extraction kernel's parse_detail_page_zipspec must
    invert this rendering; no code is shared."""
    ws = ["", " ", "\n  ", "\n\t"][variant % 4]
    q = '"' if variant % 2 == 0 else "'"
    parts = [f"<html><head><title>{meta['brand']} catalog</title></head><body>"]
    parts.append(f'<a class={q}category-link{q} href={q}{meta["category"]}{q}>up</a>')
    if not meta["malformed"]:
        parts.append(
            f'<span class={q}product-title{q} itemprop={q}name{q}>{ws}{meta["title"]}{ws}</span>'
        )
    if meta["description"] is not None:
        parts.append(f'<p class={q}product-desc{q}>{meta["description"]}</p>')
    parts.append(f'<a class={q}brand-link{q} data-brand={q}{meta["brand"]}{q}>{meta["brand"]}</a>')
    parts.append(f'<img itemprop={q}image{q} src={q}{meta["image_url"]}{q}/>')
    if meta.get("chained"):
        # F3: the page carries NO price/stock — chained endpoints do
        parts.append(f'<span class={q}uom{q}>per {meta["units"]}</span>')
    else:
        orig = (
            f' data-original-price={q}{_dec(meta["regular_price_cents"])}{q}'
            if meta["has_discount"]
            else ""
        )
        parts.append(
            f'<div class={q}product-price{q} data-price={q}{_dec(meta["current_price_cents"])}{q}'
            f' data-currency={q}{_CODE[meta["currency_sym"]]}{q}{orig}></div>'
        )
        parts.append(f'<span class={q}uom{q}>per {meta["units"]}</span>')
        parts.append(
            f'<span class={q}availability{q}>{"In Stock" if meta["in_stock"] else "Out of Stock"}</span>'
        )
    if meta["additional_info"]:
        keys = "".join(f"<li>{k}</li>" for k in meta["additional_info"])
        vals = "".join(f"<li>{v}</li>" for v in meta["additional_info"].values())
        parts.append(f'<ul class={q}spec-keys{q}>{keys}</ul><ul class={q}spec-vals{q}>{vals}</ul>')
    parts.append("</body></html>")
    return "".join(parts)


def render_detail_html_jsprice(meta: dict, url: str, variant: int) -> str:
    """'jsprice' site shape (viking-like): price/stock/currency/units
    exist ONLY inside an inline ``var productData = {...}`` JSON object
    (prices as exact decimal strings); brand only via the JSON-LD
    block; attributes as a <dl>. parse_detail_page_jsprice inverts."""
    ws = ["", " ", "\n  ", "\n\t"][variant % 4]
    q = '"' if variant % 2 == 0 else "'"
    jsonld = json.dumps(
        {"@type": "Product", "name": meta["title"], "brand": {"name": meta["brand"]}}
    )
    parts = [f"<html><head><title>shop</title>"]
    parts.append(
        f'<script type={q}application/ld+json{q} id={q}pc-jsonld{q}>{jsonld}</script></head><body>'
    )
    parts.append(f'<a rel={q}category{q} href={q}{meta["category"]}{q}>cat</a>')
    if not meta["malformed"]:
        parts.append(f'<h2 id={q}product-name{q}>{ws}{meta["title"]}{ws}</h2>')
    if meta["description"] is not None:
        parts.append(f'<div id={q}product-desc{q}>{meta["description"]}</div>')
    parts.append(f'<img id={q}main-image{q} src={q}{meta["image_url"]}{q}/>')
    if meta.get("chained"):
        pd_obj = {"unit": meta["units"]}
    else:
        pd_obj = {
            "price": _dec(meta["current_price_cents"]),
            "currency": _CODE[meta["currency_sym"]],
            "stock": 1 if meta["in_stock"] else 0,
            "unit": meta["units"],
        }
        if meta["has_discount"]:
            pd_obj["listPrice"] = _dec(meta["regular_price_cents"])
    parts.append(f"<script>var productData = {json.dumps(pd_obj)};</script>")
    if meta["additional_info"]:
        rows = "".join(
            f"<dt>{k}</dt><dd>{v}</dd>" for k, v in meta["additional_info"].items()
        )
        parts.append(f'<dl class={q}specs{q}>{rows}</dl>')
    parts.append("</body></html>")
    return "".join(parts)


def render_detail_html_ldjson(meta: dict, url: str, variant: int) -> str:
    """'ldjson' site shape (customink-like): the page body is a JS-app
    shell — EVERY product field lives in one schema.org Product JSON-LD
    block (customink_products_spider.py:82-98 parses exactly such a
    block): name/description/brand/image/category at the top level,
    price/currency/availability/listPrice/unitText in ``offers``,
    attributes as an ``additionalProperty`` PropertyValue list. A
    malformed page omits ``name`` (X7). parse_detail_page_ldjson
    inverts; no code shared."""
    q = '"' if variant % 2 == 0 else "'"
    ld: dict = {"@context": "https://schema.org", "@type": "Product"}
    if not meta["malformed"]:
        ld["name"] = meta["title"]
    if meta["description"] is not None:
        ld["description"] = meta["description"]
    ld["brand"] = {"@type": "Brand", "name": meta["brand"]}
    ld["image"] = meta["image_url"]
    ld["category"] = meta["category"]
    if meta.get("chained"):
        # F3: no price/stock on the page — chained endpoints supply them
        offers: dict = {"@type": "Offer", "eligibleQuantity": {"unitText": meta["units"]}}
    else:
        offers = {
            "@type": "Offer",
            "price": _dec(meta["current_price_cents"]),
            "priceCurrency": _CODE[meta["currency_sym"]],
            "availability": "https://schema.org/"
            + ("InStock" if meta["in_stock"] else "OutOfStock"),
            "eligibleQuantity": {"unitText": meta["units"]},
        }
        if meta["has_discount"]:
            offers["listPrice"] = _dec(meta["regular_price_cents"])
    ld["offers"] = offers
    if meta["additional_info"]:
        ld["additionalProperty"] = [
            {"@type": "PropertyValue", "name": k, "value": v}
            for k, v in meta["additional_info"].items()
        ]
    blob = json.dumps(ld, indent=2 if variant % 4 == 3 else None)
    return (
        f"<html><head><title>designs</title>"
        f'<script type={q}application/ld+json{q} id={q}pc-jsonld{q}>{blob}</script>'
        f'</head><body><div id={q}app{q}>Loading…</div></body></html>'
    )


def render_detail_html_kvtable(meta: dict, url: str, variant: int) -> str:
    """'kvtable' site shape (costco-like): automation-id attributes, a
    'Brand:'-prefixed brand line, symbol-priced span with a 'was $X'
    struck former price, an out-of-stock OVERLAY div (absence == in
    stock — costco_detail_page_spider.py:77-96 keys off such markers),
    and the spec table as <th>/<td> K/V ROWS (vs default's <td>/<td>
    and zipspec's zipped lists). parse_detail_page_kvtable inverts."""
    ws = ["", " ", "\n  ", "\n\t"][variant % 4]
    q = '"' if variant % 2 == 0 else "'"
    parts = [f"<html><head><title>wholesale</title></head><body>"]
    parts.append(
        f'<a class={q}crumb{q} itemprop={q}breadcrumb{q} href={q}{meta["category"]}{q}>category</a>'
    )
    if not meta["malformed"]:
        parts.append(f'<h1 automation-id={q}productName{q}>{ws}{meta["title"]}{ws}</h1>')
    if meta["description"] is not None:
        parts.append(f'<p automation-id={q}productDescription{q}>{meta["description"]}</p>')
    parts.append(
        f'<div automation-id={q}productBrand{q}>Brand:{ws} {meta["brand"]}{ws}</div>'
    )
    parts.append(f'<img class={q}img-responsive{q} src={q}{meta["image_url"]}{q}/>')
    if meta.get("chained"):
        # F3: no price/stock markup — chained endpoints supply them
        parts.append(f'<span class={q}unit-price{q}>/ {meta["units"]}</span>')
    else:
        cur = _fmt_price(meta["current_price_cents"], meta["currency_sym"])
        parts.append(
            f'<span automation-id={q}productPriceOutput{q}>{ws}{cur}{ws}</span>'
        )
        parts.append(f'<span class={q}unit-price{q}>/ {meta["units"]}</span>')
        if meta["has_discount"]:
            was = _fmt_price(meta["regular_price_cents"], meta["currency_sym"])
            parts.append(f'<s automation-id={q}was-price{q}>was {was}</s>')
        if not meta["in_stock"]:
            parts.append(f'<div class={q}oos-overlay{q}>Out of Stock</div>')
    if meta["additional_info"]:
        rows = "".join(
            f"<tr><th>{k}</th><td>{v}</td></tr>" for k, v in meta["additional_info"].items()
        )
        parts.append(f'<table automation-id={q}productInfoTable{q}>{rows}</table>')
    parts.append("</body></html>")
    return "".join(parts)
