"""Product-field extraction from raw HTML/JSON bodies (E3/E4/E7 family).

This is the Spark expression of the reference's largest operator
family: per-site detail spiders extracting the 16-field ProductItem
(items/product_item.py:6-23) with XPath/regex/JSON-LD —
- title/description/brand/attribute-table/stock via XPath
  (quill_products_spider.py:78-137, viking_detail_page_spider.py:73-118),
- embedded JSON-LD blocks (customink_products_spider.py:82-98) and
  regex-harvested inline JSON (viking_detail_page_spider.py:120-134),
- price-string -> number + currency-symbol map
  (quill_products_spider.py:96-116, E5/E6),
- image filename derivation by URL surgery
  (quill_products_spider.py:93, E8),
- relative-URL join for breadcrumb/category links (E10),
- the unparseable-page guard: a missing title aborts the item
  (costco_detail_page_spider.py:78-80, X7) -> ``parse_ok = false``.

Spark SQL has no XPath-over-HTML, so the kernel is an Arrow-batched
``mapInPandas`` over compiled regexes + ``json.loads`` — Python runs
once per fetched page inside a columnar batch (the SURVEY §2.12
``parse_page`` shape), never as a row-at-a-time UDF, and the hot
frontier path never shuffles bodies: extraction runs on the already-
claimed fetch output and emits narrow typed columns.

Multi-site dispatch (the reference ships 5 sites × 2 tiers of distinct
hand-written spiders — quill/costco/viking/customink/zoro): parsers
live in the ``SITE_PARSERS`` registry, keyed by a per-domain *site
key*. The key reaches the kernel as a COLUMN (callers broadcast-join
it from the per-domain config table — crawl/driver.py joins
``robots.site``), so dispatch is executor-side row data: no driver-
resident domain→parser dict at 10^7 domains, and one Arrow batch can
mix domains. Five site shapes ship (one per reference site):

- ``default``: the quill-like shape (class-named blocks, symbol-priced
  span, struck-through regular price, <tr><td> attribute table);
- ``zipspec``: the zoro-like shape (itemprop title, data-* priced div
  with ISO currency codes, ZIPPED <ul> key/value spec lists — the
  zoro_products_spider.py:85-139 zip(keys, values) idiom);
- ``jsprice``: the viking-like shape (price/stock/units present ONLY
  in an inline <script> JSON object, regex-harvested and json.loads'd
  — viking_detail_page_spider.py:120-134; brand only via JSON-LD);
- ``ldjson``: the customink-like shape (EVERY field inside one
  schema.org Product JSON-LD block with offers/additionalProperty —
  customink_products_spider.py:82-98; the body is a JS-app shell);
- ``kvtable``: the costco-like shape (automation-id selectors,
  'Brand:'-prefixed line, 'was $X' struck price, out-of-stock OVERLAY
  whose absence means in-stock, <th>/<td> spec rows —
  costco_detail_page_spider.py:77-96).

All parsers emit the same 14 EXTRACTED_FIELDS and share the X7 guard
(missing title -> parse_ok=false, all fields NULL).

Prices are parsed to integer cents (exact, order-independent sums);
exporters render DECIMAL(20,2) like the reference's MySQL schema
(product_history.py:14-15).
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_Q = "[\"']"
RX_TITLE = re.compile(rf"<h1 class={_Q}m-sku-title{_Q}>\s*(.*?)\s*</h1>", re.S)
RX_DESC = re.compile(rf"<div class={_Q}skuDescription{_Q}><span>(.*?)</span></div>", re.S)
RX_BRAND = re.compile(
    rf"<div class={_Q}brand-row{_Q}><span>Brand</span><div>\s*(.*?)\s*</div></div>", re.S
)
RX_JSONLD = re.compile(
    rf"<script type={_Q}application/ld\+json{_Q}[^>]*>(.*?)</script>", re.S
)
RX_IMG = re.compile(rf"<img class={_Q}sku-image{_Q} src={_Q}(.*?){_Q}\s*/>")
RX_PRICE = re.compile(rf"<span class={_Q}price-size{_Q}>\s*(.*?)\s*</span>", re.S)
RX_REGULAR = re.compile(rf"<del class={_Q}elp-percentage{_Q}>\s*(.*?)\s*</del>", re.S)
RX_UNITS = re.compile(rf"<span class={_Q}selling-uom{_Q}>/ (.*?)</span>")
RX_STOCK = re.compile(rf"<div class={_Q}promo-flag{_Q}>(.*?)</div>")
RX_ATTR_ROW = re.compile(r"<tr><td>(.*?)</td><td>(.*?)</td></tr>")
RX_ATTR_TABLE = re.compile(rf"<table class={_Q}skuSpecification{_Q}>(.*?)</table>", re.S)
RX_BREADCRUMB = re.compile(rf"<nav class={_Q}breadcrumb{_Q}><a href={_Q}(.*?){_Q}>")

CURRENCY_MAP = {"$": "USD", "£": "GBP"}  # quill_products_spider.py:101-102 idiom

# --- site shape 'zipspec' (zoro-like: data-* attrs, zipped spec lists) -----
RX_B_TITLE = re.compile(rf"<span class={_Q}product-title{_Q} itemprop={_Q}name{_Q}>\s*(.*?)\s*</span>", re.S)
RX_B_DESC = re.compile(rf"<p class={_Q}product-desc{_Q}>(.*?)</p>", re.S)
RX_B_BRAND = re.compile(rf"<a class={_Q}brand-link{_Q} data-brand={_Q}(.*?){_Q}>")
RX_B_IMG = re.compile(rf"<img itemprop={_Q}image{_Q} src={_Q}(.*?){_Q}\s*/?>")
RX_B_PRICE = re.compile(
    rf"<div class={_Q}product-price{_Q} data-price={_Q}(.*?){_Q} data-currency={_Q}(.*?){_Q}"
    rf"(?: data-original-price={_Q}(.*?){_Q})?>"
)
RX_B_UOM = re.compile(rf"<span class={_Q}uom{_Q}>per (.*?)</span>")
RX_B_STOCK = re.compile(rf"<span class={_Q}availability{_Q}>(.*?)</span>")
RX_B_KEYS = re.compile(rf"<ul class={_Q}spec-keys{_Q}>(.*?)</ul>", re.S)
RX_B_VALS = re.compile(rf"<ul class={_Q}spec-vals{_Q}>(.*?)</ul>", re.S)
RX_B_LI = re.compile(r"<li>(.*?)</li>", re.S)
RX_B_CAT = re.compile(rf"<a class={_Q}category-link{_Q} href={_Q}(.*?){_Q}>")

# --- site shape 'kvtable' (costco-like: automation-ids, th/td spec rows) ---
RX_D_TITLE = re.compile(rf"<h1 automation-id={_Q}productName{_Q}>\s*(.*?)\s*</h1>", re.S)
RX_D_DESC = re.compile(rf"<p automation-id={_Q}productDescription{_Q}>(.*?)</p>", re.S)
RX_D_BRAND = re.compile(
    rf"<div automation-id={_Q}productBrand{_Q}>Brand:\s*(.*?)\s*</div>", re.S
)
RX_D_IMG = re.compile(rf"<img class={_Q}img-responsive{_Q} src={_Q}(.*?){_Q}\s*/?>")
RX_D_PRICE = re.compile(
    rf"<span automation-id={_Q}productPriceOutput{_Q}>\s*(.*?)\s*</span>", re.S
)
RX_D_WAS = re.compile(rf"<s automation-id={_Q}was-price{_Q}>was (.*?)</s>", re.S)
RX_D_UOM = re.compile(rf"<span class={_Q}unit-price{_Q}>/ (.*?)</span>")
RX_D_OOS = re.compile(rf"<div class={_Q}oos-overlay{_Q}>")
RX_D_TABLE = re.compile(rf"<table automation-id={_Q}productInfoTable{_Q}>(.*?)</table>", re.S)
# [^<]* (not .*?) so a mangled row can't splice into its neighbor
RX_D_ROW = re.compile(r"<tr><th>([^<]*)</th><td>([^<]*)</td></tr>")
RX_D_CAT = re.compile(rf"<a class={_Q}crumb{_Q} itemprop={_Q}breadcrumb{_Q} href={_Q}(.*?){_Q}>")

# --- site shape 'jsprice' (viking-like: inline-JS pricing object) ----------
RX_C_TITLE = re.compile(rf"<h2 id={_Q}product-name{_Q}>\s*(.*?)\s*</h2>", re.S)
RX_C_DESC = re.compile(rf"<div id={_Q}product-desc{_Q}>(.*?)</div>", re.S)
RX_C_IMG = re.compile(rf"<img id={_Q}main-image{_Q} src={_Q}(.*?){_Q}\s*/?>")
RX_C_JS = re.compile(r"var productData\s*=\s*(\{.*?\});", re.S)
RX_C_DT_DD = re.compile(r"<dt>(.*?)</dt>\s*<dd>(.*?)</dd>", re.S)
RX_C_DL = re.compile(rf"<dl class={_Q}specs{_Q}>(.*?)</dl>", re.S)
RX_C_CAT = re.compile(rf"<a rel={_Q}category{_Q} href={_Q}(.*?){_Q}>")

EXTRACTED_FIELDS = [
    T.StructField("title", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("brand", T.StringType()),
    T.StructField("image_url", T.StringType()),
    T.StructField("image_file", T.StringType()),
    T.StructField("additional_info", T.StringType()),
    T.StructField("regular_price_cents", T.LongType()),
    T.StructField("current_price_cents", T.LongType()),
    T.StructField("currency", T.StringType()),
    T.StructField("is_in_stock", T.BooleanType()),
    T.StructField("stock", T.IntegerType()),
    T.StructField("units", T.StringType()),
    T.StructField("category", T.StringType()),
    T.StructField("parse_ok", T.BooleanType()),
]
EXTRACTED_COLS = [f.name for f in EXTRACTED_FIELDS]


# max whole-currency digits accepted by the price parsers: 10^17 cents
# fits int64; anything longer is hostile input (X6) and degrades to NULL
# rather than overflowing Arrow's int64 at kernel-output time.
_MAX_PRICE_DIGITS = 15


def parse_price_cents(s: str | None) -> tuple[int | None, str | None]:
    """'$1,234.56' -> (123456, 'USD'); E5/E6 exact-integer form of the
    reference's ``float(s.replace('$','').replace(',',''))``. Hostile
    oversized numbers (> 10^15 whole units) return NULL, never raise or
    overflow the int64 output column (X6)."""
    if not s:
        return None, None
    s = s.strip()
    currency = CURRENCY_MAP.get(s[0])
    digits = re.sub(r"[^\d.]", "", s)
    if not digits:
        return None, currency
    whole, _, frac = digits.partition(".")
    if len(whole) > _MAX_PRICE_DIGITS:
        return None, currency
    cents = int(whole or 0) * 100 + int((frac + "00")[:2] or 0)
    return cents, currency


def image_file_of(url: str) -> str:
    """E8 filename surgery (quill_products_spider.py:93):
    first domain label + '_' + url slug + '.jpg'."""
    try:
        host = url.split("/")[2]
        name = url.rsplit("/", 1)[1]
        stem = name.rsplit(".", 1)[0] if "." in name else name  # drop extension
        return f"{host.split('.')[0]}_{stem}.jpg"
    except IndexError:
        return ""


def _urljoin(page_url: str, href: str | None) -> str | None:
    """E10: response.urljoin for the absolute/relative split we face."""
    if href is None:
        return None
    if href.startswith("http"):
        return href
    host = "/".join(page_url.split("/")[:3])
    return host + href if href.startswith("/") else f"{host}/{href}"


def parse_detail_page(url: str, body: str | None) -> dict:
    """One page -> field dict (the per-row core the batched kernel maps).
    Returns parse_ok=False (all fields None) when the title is missing —
    the X7 guard; callers count these as skips, never crash."""
    out: dict = {c: None for c in EXTRACTED_COLS}
    out["parse_ok"] = False
    if not body:
        return out
    m = RX_TITLE.search(body)
    if not m:  # unparseable page: reference returns without an item
        return out
    out["title"] = m.group(1)
    out["parse_ok"] = True
    m = RX_DESC.search(body)
    out["description"] = m.group(1) if m else None
    m = RX_BRAND.search(body)
    if m:
        out["brand"] = m.group(1)
    else:  # JSON-LD fallback (customink idiom, E2)
        m = RX_JSONLD.search(body)
        if m:
            try:
                ld = json.loads(m.group(1))
                out["brand"] = (ld.get("brand") or {}).get("name")
            except (json.JSONDecodeError, AttributeError):
                out["brand"] = None
    m = RX_IMG.search(body)
    out["image_url"] = m.group(1) if m else None
    out["image_file"] = image_file_of(out["image_url"] or url)
    cur_cents, currency = parse_price_cents(
        RX_PRICE.search(body).group(1) if RX_PRICE.search(body) else None
    )
    out["current_price_cents"] = cur_cents
    out["currency"] = currency
    m = RX_REGULAR.search(body)
    if m:
        out["regular_price_cents"] = parse_price_cents(m.group(1))[0]
    else:  # no struck-through price -> regular = current (quill :112-116)
        out["regular_price_cents"] = cur_cents
    m = RX_UNITS.search(body)
    out["units"] = m.group(1) if m else None
    m = RX_STOCK.search(body)
    if m:  # absent flag (chained page) -> NULL, the chain layer decides
        out["is_in_stock"] = m.group(1).strip() != "Out of stock"
        out["stock"] = 1 if out["is_in_stock"] else 0
    m = RX_ATTR_TABLE.search(body)
    if m:
        attrs = dict(RX_ATTR_ROW.findall(m.group(1)))
        out["additional_info"] = json.dumps(attrs, sort_keys=True) if attrs else None
    m = RX_BREADCRUMB.search(body)
    out["category"] = _urljoin(url, m.group(1)) if m else None
    return out


def _decimal_str_cents(s: str | None) -> int | None:
    """Exact decimal-string -> integer cents ('1234.56' -> 123456); the
    data-attribute / JSON-string price form (no float round-trip).
    Oversized hostile values degrade to NULL (int64-safe, X6)."""
    if not s:
        return None
    s = s.strip()
    if not re.fullmatch(r"\d+(\.\d{1,2})?", s):
        return None
    whole, _, frac = s.partition(".")
    if len(whole) > _MAX_PRICE_DIGITS:
        return None
    return int(whole) * 100 + int((frac + "00")[:2])


def parse_detail_page_zipspec(url: str, body: str | None) -> dict:
    """'zipspec' site shape: itemprop-tagged title, data-* priced div
    (ISO currency code, optional data-original-price), zipped <ul>
    key/value spec lists (zoro_products_spider.py:85-139 zips the two
    node lists; zip truncates to the shorter — hostile-input safe)."""
    out: dict = {c: None for c in EXTRACTED_COLS}
    out["parse_ok"] = False
    if not body:
        return out
    m = RX_B_TITLE.search(body)
    if not m:  # X7
        return out
    out["title"] = m.group(1)
    out["parse_ok"] = True
    m = RX_B_DESC.search(body)
    out["description"] = m.group(1) if m else None
    m = RX_B_BRAND.search(body)
    out["brand"] = m.group(1) if m else None
    m = RX_B_IMG.search(body)
    out["image_url"] = m.group(1) if m else None
    out["image_file"] = image_file_of(out["image_url"] or url)
    m = RX_B_PRICE.search(body)
    if m:
        out["current_price_cents"] = _decimal_str_cents(m.group(1))
        out["currency"] = m.group(2) or None
        reg = _decimal_str_cents(m.group(3))
        out["regular_price_cents"] = reg if reg is not None else out["current_price_cents"]
    m = RX_B_UOM.search(body)
    out["units"] = m.group(1) if m else None
    m = RX_B_STOCK.search(body)
    if m:  # absent availability span (chained page) -> NULL, not False
        out["is_in_stock"] = m.group(1).strip() != "Out of Stock"
        out["stock"] = 1 if out["is_in_stock"] else 0
    mk, mv = RX_B_KEYS.search(body), RX_B_VALS.search(body)
    if mk and mv:
        keys = RX_B_LI.findall(mk.group(1))
        vals = RX_B_LI.findall(mv.group(1))
        attrs = dict(zip(keys, vals))  # truncates to shorter list
        out["additional_info"] = json.dumps(attrs, sort_keys=True) if attrs else None
    m = RX_B_CAT.search(body)
    out["category"] = _urljoin(url, m.group(1)) if m else None
    return out


def parse_detail_page_jsprice(url: str, body: str | None) -> dict:
    """'jsprice' site shape: the page carries NO priced markup — price,
    stock, currency, and units live only in an inline ``var productData
    = {...}`` JSON object (viking_detail_page_spider.py:120-134 regex-
    harvests and json.loads it); brand comes only from the JSON-LD
    block; attributes are a <dl> list. Prices are JSON STRINGS parsed
    exactly to integer cents. Corrupt JSON degrades those fields to
    NULL, never raises (X6)."""
    out: dict = {c: None for c in EXTRACTED_COLS}
    out["parse_ok"] = False
    if not body:
        return out
    m = RX_C_TITLE.search(body)
    if not m:  # X7
        return out
    out["title"] = m.group(1)
    out["parse_ok"] = True
    m = RX_C_DESC.search(body)
    out["description"] = m.group(1) if m else None
    m = RX_JSONLD.search(body)
    if m:
        try:
            ld = json.loads(m.group(1))
            out["brand"] = (ld.get("brand") or {}).get("name")
        except (json.JSONDecodeError, AttributeError):
            out["brand"] = None
    m = RX_C_IMG.search(body)
    out["image_url"] = m.group(1) if m else None
    out["image_file"] = image_file_of(out["image_url"] or url)
    m = RX_C_JS.search(body)
    if m:
        try:
            js = json.loads(m.group(1))
        except json.JSONDecodeError:
            js = {}
        if isinstance(js, dict):
            cur = _decimal_str_cents(js.get("price") if isinstance(js.get("price"), str) else None)
            out["current_price_cents"] = cur
            lp = js.get("listPrice")
            reg = _decimal_str_cents(lp if isinstance(lp, str) else None)
            out["regular_price_cents"] = reg if reg is not None else cur
            out["currency"] = js.get("currency") if isinstance(js.get("currency"), str) else None
            stock = js.get("stock")
            if isinstance(stock, int) and not isinstance(stock, bool) and stock >= 0:
                out["stock"] = stock
                out["is_in_stock"] = stock > 0
            out["units"] = js.get("unit") if isinstance(js.get("unit"), str) else None
    m = RX_C_DL.search(body)
    if m:
        attrs = dict(RX_C_DT_DD.findall(m.group(1)))
        out["additional_info"] = json.dumps(attrs, sort_keys=True) if attrs else None
    m = RX_C_CAT.search(body)
    out["category"] = _urljoin(url, m.group(1)) if m else None
    return out


def parse_detail_page_ldjson(url: str, body: str | None) -> dict:
    """'ldjson' site shape (customink_products_spider.py:82-98 idiom):
    EVERY field comes from one schema.org Product JSON-LD block — the
    page body is a JS-app shell with no scrapeable markup. Offers carry
    price/currency/availability/listPrice (exact decimal strings) and
    the unit; attributes are an additionalProperty PropertyValue list.
    Corrupt JSON, a non-dict payload, or a missing ``name`` are all the
    X7 guard (parse_ok=False); wrong-typed members degrade their field
    to NULL, never raise (X6)."""
    out: dict = {c: None for c in EXTRACTED_COLS}
    out["parse_ok"] = False
    if not body:
        return out
    m = RX_JSONLD.search(body)
    if not m:
        return out
    try:
        ld = json.loads(m.group(1))
    except json.JSONDecodeError:
        return out
    if not isinstance(ld, dict):
        return out
    name = ld.get("name")
    if not isinstance(name, str) or not name:  # X7: no title, no item
        return out
    out["title"] = name
    out["parse_ok"] = True
    desc = ld.get("description")
    out["description"] = desc if isinstance(desc, str) else None
    brand = ld.get("brand")
    if isinstance(brand, dict) and isinstance(brand.get("name"), str):
        out["brand"] = brand["name"]
    img = ld.get("image")
    out["image_url"] = img if isinstance(img, str) else None
    out["image_file"] = image_file_of(out["image_url"] or url)
    offers = ld.get("offers")
    offers = offers if isinstance(offers, dict) else {}
    cur = _decimal_str_cents(offers.get("price") if isinstance(offers.get("price"), str) else None)
    out["current_price_cents"] = cur
    lp = offers.get("listPrice")
    reg = _decimal_str_cents(lp if isinstance(lp, str) else None)
    out["regular_price_cents"] = reg if reg is not None else cur
    pc = offers.get("priceCurrency")
    out["currency"] = pc if isinstance(pc, str) else None
    av = offers.get("availability")
    if isinstance(av, str) and av:
        out["is_in_stock"] = av.rsplit("/", 1)[-1] == "InStock"
        out["stock"] = 1 if out["is_in_stock"] else 0
    eq = offers.get("eligibleQuantity")
    if isinstance(eq, dict) and isinstance(eq.get("unitText"), str):
        out["units"] = eq["unitText"]
    ap = ld.get("additionalProperty")
    if isinstance(ap, list):
        attrs = {
            p["name"]: p["value"]
            for p in ap
            if isinstance(p, dict)
            and isinstance(p.get("name"), str)
            and isinstance(p.get("value"), str)
        }
        out["additional_info"] = json.dumps(attrs, sort_keys=True) if attrs else None
    cat = ld.get("category")
    out["category"] = _urljoin(url, cat) if isinstance(cat, str) else None
    return out


def parse_detail_page_kvtable(url: str, body: str | None) -> dict:
    """'kvtable' site shape (costco_detail_page_spider.py:77-96 idioms):
    automation-id selectors, a 'Brand:'-prefixed brand line, a symbol-
    priced span plus a struck 'was $X' former price, stock keyed off the
    ABSENCE of an out-of-stock overlay, and the spec table as <th>/<td>
    K/V rows. Missing title -> X7 guard."""
    out: dict = {c: None for c in EXTRACTED_COLS}
    out["parse_ok"] = False
    if not body:
        return out
    m = RX_D_TITLE.search(body)
    if not m:  # X7
        return out
    out["title"] = m.group(1)
    out["parse_ok"] = True
    m = RX_D_DESC.search(body)
    out["description"] = m.group(1) if m else None
    m = RX_D_BRAND.search(body)
    out["brand"] = m.group(1) if m else None
    m = RX_D_IMG.search(body)
    out["image_url"] = m.group(1) if m else None
    out["image_file"] = image_file_of(out["image_url"] or url)
    m = RX_D_PRICE.search(body)
    cur_cents, currency = parse_price_cents(m.group(1) if m else None)
    out["current_price_cents"] = cur_cents
    out["currency"] = currency
    m = RX_D_WAS.search(body)
    if m:
        out["regular_price_cents"] = parse_price_cents(m.group(1))[0]
    else:  # no struck former price -> regular = current
        out["regular_price_cents"] = cur_cents
    m = RX_D_UOM.search(body)
    out["units"] = m.group(1) if m else None
    # overlay-absence means in-stock ONLY on a page that actually carries
    # pricing markup; a chained page (no price, no overlay) stays NULL so
    # the endpoint layer decides — never fabricate stock=1 (F3/X6)
    if RX_D_OOS.search(body) is not None:
        out["is_in_stock"] = False
        out["stock"] = 0
    elif RX_D_PRICE.search(body) is not None:
        out["is_in_stock"] = True
        out["stock"] = 1
    m = RX_D_TABLE.search(body)
    if m:
        attrs = dict(RX_D_ROW.findall(m.group(1)))
        out["additional_info"] = json.dumps(attrs, sort_keys=True) if attrs else None
    m = RX_D_CAT.search(body)
    out["category"] = _urljoin(url, m.group(1)) if m else None
    return out


# per-domain dispatch registry: site key -> parser. The key is carried
# as row data (broadcast-joined from the domain config table), so an
# Arrow batch can mix sites and no domain map ever lives on the driver.
SITE_PARSERS = {
    "default": parse_detail_page,
    "zipspec": parse_detail_page_zipspec,
    "jsprice": parse_detail_page_jsprice,
    "ldjson": parse_detail_page_ldjson,
    "kvtable": parse_detail_page_kvtable,
}


def register_site_parser(site: str, parser) -> None:
    """Add a custom site parser (the extension point a new target site
    needs — the reference adds a spider class per site). ``parser`` is
    ``(url: str, body: str | None) -> dict`` and must honor the shared
    contract: emit every EXTRACTED_COLS key, parse_ok=False + all-None
    on an unusable page (X7), and never raise on hostile bytes (X6).
    Registration is driver-side module state: call it before building
    the extraction plan (the kernel closure captures the registry when
    the plan is serialized to executors)."""
    if not callable(parser):
        raise TypeError("parser must be callable (url, body) -> dict")
    probe = parser("https://example.com/p/1", None)
    missing = set(EXTRACTED_COLS) - set(probe)
    if probe.get("parse_ok") is not False or missing:
        raise ValueError(
            f"parser contract: parse_ok must be False for empty body and all "
            f"EXTRACTED_COLS emitted (missing: {sorted(missing)})"
        )
    SITE_PARSERS[site] = parser


def extract_product_fields(
    df: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    site_col: str | None = None,
) -> DataFrame:
    """df + the 14 extracted columns; drops the body (items are narrow
    past this point — bodies never enter a shuffle again).

    ``site_col``: optional column holding each row's site key (see
    SITE_PARSERS); rows with a NULL/unknown key fall back to the
    'default' parser — an unknown site parses like the reference would
    with no spider registered for it: usually X7 (parse_ok=false),
    counted, never fatal. Omitted -> every row uses 'default'."""
    passthrough = [f for f in df.schema.fields if f.name != body_col]
    schema = T.StructType(passthrough + EXTRACTED_FIELDS)
    pass_names = [f.name for f in passthrough]

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if site_col is not None:
                parsed = [
                    SITE_PARSERS.get(s, parse_detail_page)(u, b)
                    for u, b, s in zip(pdf[url_col], pdf[body_col], pdf[site_col])
                ]
            else:
                parsed = [
                    parse_detail_page(u, b) for u, b in zip(pdf[url_col], pdf[body_col])
                ]
            out = pdf[pass_names].copy()
            for c in EXTRACTED_COLS:
                out[c] = [p[c] for p in parsed]
            yield out

    return df.mapInPandas(_kernel, schema)
