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


def parse_price_cents(s: str | None) -> tuple[int | None, str | None]:
    """'$1,234.56' -> (123456, 'USD'); E5/E6 exact-integer form of the
    reference's ``float(s.replace('$','').replace(',',''))``."""
    if not s:
        return None, None
    s = s.strip()
    currency = CURRENCY_MAP.get(s[0])
    digits = re.sub(r"[^\d.]", "", s)
    if not digits:
        return None, currency
    whole, _, frac = digits.partition(".")
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
    stock_txt = m.group(1).strip() if m else "No"
    out["is_in_stock"] = stock_txt != "Out of stock"
    out["stock"] = 1 if out["is_in_stock"] else 0
    m = RX_ATTR_TABLE.search(body)
    if m:
        attrs = dict(RX_ATTR_ROW.findall(m.group(1)))
        out["additional_info"] = json.dumps(attrs, sort_keys=True) if attrs else None
    m = RX_BREADCRUMB.search(body)
    out["category"] = _urljoin(url, m.group(1)) if m else None
    return out


def extract_product_fields(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """df + the 14 extracted columns; drops the body (items are narrow
    past this point — bodies never enter a shuffle again)."""
    passthrough = [f for f in df.schema.fields if f.name != body_col]
    schema = T.StructType(passthrough + EXTRACTED_FIELDS)
    pass_names = [f.name for f in passthrough]

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [
                parse_detail_page(u, b) for u, b in zip(pdf[url_col], pdf[body_col])
            ]
            out = pdf[pass_names].copy()
            for c in EXTRACTED_COLS:
                out[c] = [p[c] for p in parsed]
            yield out

    return df.mapInPandas(_kernel, schema)
