"""HTML/JSON product-field extraction (E3-E12) against world ground
truth, including the malformed-page guard (X7) and price/currency
idioms (E5/E6). The world renderer and the extraction kernel share no
code — a pass means the parser genuinely inverts the page format."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl.extract import (
    EXTRACTED_COLS,
    SITE_PARSERS,
    extract_product_fields,
    image_file_of,
    parse_detail_page,
    parse_detail_page_jsprice,
    parse_detail_page_zipspec,
    parse_price_cents,
)


def test_price_parse_idioms():
    # E5: strip symbol + thousands separators; E6: currency map
    assert parse_price_cents("$1,234.56") == (123456, "USD")
    assert parse_price_cents("£99.00") == (9900, "GBP")
    assert parse_price_cents("$0.99") == (99, "USD")
    assert parse_price_cents("  $7.5  ") == (750, "USD")  # '.5' -> 50 cents
    assert parse_price_cents(None) == (None, None)
    assert parse_price_cents("") == (None, None)


def test_image_file_derivation():
    # E8: first domain label + slug (quill_products_spider.py:93 idiom)
    assert image_file_of("https://d0.example.com/p/123") == "d0_123.jpg"
    assert image_file_of("https://hot.example.com/img/img_p9.jpg") == "hot_img_p9.jpg"


def test_malformed_page_guard():
    # X7: missing <h1> title -> parse_ok False, no crash, fields null
    out = parse_detail_page("https://d/p/1", "<html><body>garbage</body></html>")
    assert out["parse_ok"] is False and out["title"] is None
    out = parse_detail_page("https://d/p/1", None)
    assert out["parse_ok"] is False
    out = parse_detail_page("https://d/p/1", "")
    assert out["parse_ok"] is False


def test_jsonld_brand_fallback():
    body = (
        '<script type="application/ld+json">{"@type":"Product","name":"X",'
        '"brand":{"name":"Acme"}}</script>'
        '<h1 class="m-sku-title">X</h1>'
    )
    out = parse_detail_page("https://d/p/1", body)
    assert out["parse_ok"] and out["brand"] == "Acme"
    # corrupt JSON-LD must not crash (E4 guard, JSONDecodeError catch)
    bad = body.replace('{"@type"', "{oops")
    out = parse_detail_page("https://d/p/1", bad)
    assert out["parse_ok"] and out["brand"] is None


def test_extraction_matches_world_truth(spark, t1_paths):
    """Every fetchable detail page of the MULTI-SITE world parses back
    to the generator's ground-truth fields, bit-exact, through the
    distributed kernel with per-domain parser dispatch (site key
    broadcast-joined from the domain config table)."""
    from scrapy_products_tracker_spark.politeness import load_robots

    robots = load_robots(spark, t1_paths["robots"])
    # the world genuinely exercises several distinct shapes (T1's domain
    # set is small; the full 5-shape registry is grid-tested below)
    assert len({r["site"] for r in robots.select("site").distinct().collect()}) >= 3
    pages = (
        spark.read.parquet(t1_paths["pages"])
        .filter((F.col("tier") == 1) & (F.col("status_code") != 404))
        .select("url", "domain", "body")
        .join(F.broadcast(robots.select("domain", F.col("site").alias("_site"))), "domain", "left")
    )
    got = extract_product_fields(pages, site_col="_site")
    truth = spark.read.parquet(t1_paths["truth"])
    cmp_cols = [c for c in EXTRACTED_COLS if c not in ("image_file",)]
    g = {r["url"]: tuple(r[c] for c in cmp_cols) for r in got.collect()}
    t = {r["url"]: tuple(r[c] for c in cmp_cols) for r in truth.collect() if r["url"] in g}
    assert g == t
    assert any(not r[-1] for r in g.values())  # some malformed pages exist


@pytest.mark.parametrize("site", sorted(SITE_PARSERS))
def test_site_parsers_invert_their_renderers(site):
    """Each registered parser inverts its own synthetic site shape for
    a grid of metas (discount on/off, stock on/off, attrs, quote/ws
    variants) — renderer and parser share no code."""
    import json as _json

    from scrapy_products_tracker_spark.synth.html import render_detail_html_site

    parser = SITE_PARSERS[site]
    cases = []
    for disc in (False, True):
        for stock in (False, True):
            for attrs in ({}, {"Color": "blue", "Weight": "1.2kg"}):
                for variant in range(4):
                    cases.append((disc, stock, attrs, variant))
    for disc, stock, attrs, variant in cases:
        meta = {
            "title": "Ergonomic stapler 123",
            "description": "A fine stapler.",
            "brand": "Acme",
            "image_url": "https://d0.example.com/img/img_p1.jpg",
            "current_price_cents": 123456,
            "regular_price_cents": 123456 + (5000 if disc else 0),
            "has_discount": disc,
            "currency_sym": "$",
            "in_stock": stock,
            "units": "dozen",
            "additional_info": attrs,
            "category": "https://d0.example.com/cat/3",
            "malformed": False,
        }
        url = "https://d0.example.com/p/1"
        out = parser(url, render_detail_html_site(meta, url, variant, site))
        assert out["parse_ok"], (site, variant)
        assert out["title"] == meta["title"]
        assert out["description"] == meta["description"]
        assert out["brand"] == "Acme"
        assert out["image_url"] == meta["image_url"]
        assert out["current_price_cents"] == 123456
        assert out["regular_price_cents"] == meta["regular_price_cents"]
        assert out["currency"] == "USD"
        assert out["is_in_stock"] is stock and out["stock"] == (1 if stock else 0)
        assert out["units"] == "dozen"
        expect_info = _json.dumps(attrs, sort_keys=True) if attrs else None
        assert out["additional_info"] == expect_info
        assert out["category"] == meta["category"]


@pytest.mark.parametrize("site", sorted(SITE_PARSERS))
def test_site_parsers_x7_guard(site):
    """X7 for every site shape: a missing title (malformed render) and
    hostile bodies all yield parse_ok=False, never an exception."""
    from scrapy_products_tracker_spark.synth.html import render_detail_html_site

    parser = SITE_PARSERS[site]
    meta = {
        "title": "T",
        "description": None,
        "brand": "Acme",
        "image_url": "https://d/img/i.jpg",
        "current_price_cents": 100,
        "regular_price_cents": 100,
        "has_discount": False,
        "currency_sym": "$",
        "in_stock": True,
        "units": "each",
        "additional_info": {},
        "category": "/cat/0",
        "malformed": True,  # renderer omits the title node
    }
    out = parser("https://d/p/1", render_detail_html_site(meta, "https://d/p/1", 0, site))
    assert out["parse_ok"] is False and all(out[c] is None for c in EXTRACTED_COLS[:-1])
    for hostile in (None, "", "<html>", "\x00\x01garbage", "<h1>almost</h1>"):
        out = parser("https://d/p/1", hostile)
        assert out["parse_ok"] is False


def test_register_site_parser_contract(spark):
    """The public extension point: a registered custom parser is
    dispatched by its site key through the distributed kernel; contract
    violations are rejected at registration time."""
    from scrapy_products_tracker_spark.crawl.extract import register_site_parser

    def myparser(url, body):
        out = {c: None for c in EXTRACTED_COLS}
        out["parse_ok"] = False
        if body and "MYTITLE:" in body:
            out["title"] = body.split("MYTITLE:", 1)[1]
            out["parse_ok"] = True
        return out

    register_site_parser("mysite", myparser)
    try:
        df = spark.createDataFrame(
            [("https://m/p/1", "mysite", "MYTITLE:hello"), ("https://m/p/2", "mysite", "junk")],
            "url string, _site string, body string",
        )
        rows = {r["url"]: (r["title"], r["parse_ok"])
                for r in extract_product_fields(df, site_col="_site").collect()}
        assert rows == {"https://m/p/1": ("hello", True), "https://m/p/2": (None, False)}
    finally:
        SITE_PARSERS.pop("mysite", None)
    with pytest.raises(ValueError):
        register_site_parser("bad", lambda url, body: {"parse_ok": False})
    with pytest.raises(TypeError):
        register_site_parser("bad", "not-callable")


def test_zipspec_hostile_details():
    """zipspec-specific hostile inputs: mismatched zip lists truncate,
    garbage data-price degrades to NULL (never raises)."""
    body = (
        '<span class="product-title" itemprop="name">T</span>'
        '<div class="product-price" data-price="12x.34" data-currency="USD"></div>'
        '<ul class="spec-keys"><li>A</li><li>B</li><li>C</li></ul>'
        '<ul class="spec-vals"><li>1</li></ul>'
    )
    out = parse_detail_page_zipspec("https://d/p/1", body)
    assert out["parse_ok"] and out["current_price_cents"] is None
    assert out["additional_info"] == '{"A": "1"}'  # zip truncates, no crash


def test_jsprice_hostile_details():
    """jsprice-specific hostile inputs: corrupt / non-dict / wrong-typed
    productData degrades those fields to NULL (E4/X6 guard)."""
    t = '<h2 id="product-name">T</h2>'
    for js in (
        "var productData = {oops};",
        "var productData = [1,2];",
        'var productData = {"price": 12.34, "stock": "many", "unit": 7};',
    ):
        out = parse_detail_page_jsprice("https://d/p/1", t + f"<script>{js}</script>")
        assert out["parse_ok"], js
        assert out["current_price_cents"] is None
        assert out["stock"] is None and out["units"] is None


def test_ldjson_hostile_details():
    """ldjson-specific hostile inputs: corrupt JSON / non-dict payload /
    missing name are the X7 guard; wrong-typed members degrade their
    field to NULL (X6), never raise."""
    from scrapy_products_tracker_spark.crawl.extract import parse_detail_page_ldjson

    def page(blob):
        return f'<script type="application/ld+json" id="pc-jsonld">{blob}</script>'

    for blob in ("{oops}", "[1,2]", '{"@type":"Product"}', '{"name": 7}'):
        out = parse_detail_page_ldjson("https://d/p/1", page(blob))
        assert out["parse_ok"] is False, blob
    # wrong-typed members: title ok, everything else NULL-degrades
    out = parse_detail_page_ldjson(
        "https://d/p/1",
        page(
            '{"name":"T","brand":"flat-string","image":7,"category":[],'
            '"offers":{"price":12.34,"priceCurrency":9,"availability":4,'
            '"eligibleQuantity":"each"},"additionalProperty":[{"name":"A"},"x"]}'
        ),
    )
    assert out["parse_ok"] and out["title"] == "T"
    for c in ("brand", "image_url", "current_price_cents", "currency",
              "is_in_stock", "stock", "units", "additional_info", "category"):
        assert out[c] is None, c


def test_oversized_prices_degrade_to_null(spark):
    """Hostile oversized price strings must NULL-degrade, not overflow
    Arrow's int64 at kernel-output time and kill the task (X6)."""
    from scrapy_products_tracker_spark.crawl.extract import _decimal_str_cents

    big = "9" * 22
    assert parse_price_cents(f"${big}.99") == (None, "USD")
    assert _decimal_str_cents(f"{big}.99") is None
    assert _decimal_str_cents("999999999999999.99") == 99999999999999999  # 15 digits ok
    # end-to-end through the distributed kernel: row survives, field NULL
    body = (
        '<span class="product-title" itemprop="name">T</span>'
        f'<div class="product-price" data-price="{big}" data-currency="USD"></div>'
    )
    df = spark.createDataFrame([("https://d/p/1", "zipspec", body)],
                               "url string, _site string, body string")
    row = extract_product_fields(df, site_col="_site").collect()[0]
    assert row["parse_ok"] is True and row["current_price_cents"] is None


def test_chained_pages_leave_stock_null():
    """A page with no stock markup (F3 chained shape) must leave
    is_in_stock/stock NULL for the endpoint layer — never fabricate
    in-stock=True (kvtable/default) or False (zipspec)."""
    from scrapy_products_tracker_spark.crawl.extract import parse_detail_page_kvtable

    kv = '<h1 automation-id="productName">T</h1><span class="unit-price">/ each</span>'
    out = parse_detail_page_kvtable("https://d/p/1", kv)
    assert out["parse_ok"] and out["is_in_stock"] is None and out["stock"] is None
    zp = '<span class="product-title" itemprop="name">T</span><span class="uom">per each</span>'
    out = parse_detail_page_zipspec("https://d/p/1", zp)
    assert out["parse_ok"] and out["is_in_stock"] is None and out["stock"] is None
    df = '<h1 class="m-sku-title">T</h1><span class="selling-uom">/ each</span>'
    out = parse_detail_page("https://d/p/1", df)
    assert out["parse_ok"] and out["is_in_stock"] is None and out["stock"] is None


def test_kvtable_hostile_details():
    """kvtable-specific hostile inputs: garbage price text degrades to
    NULL; a lone out-of-stock overlay flips stock; mangled spec rows
    are skipped by the row regex, never raise."""
    from scrapy_products_tracker_spark.crawl.extract import parse_detail_page_kvtable

    body = (
        '<h1 automation-id="productName">T</h1>'
        '<span automation-id="productPriceOutput">call for price</span>'
        '<div class="oos-overlay">Out of Stock</div>'
        '<table automation-id="productInfoTable"><tr><th>A</th></tr>'
        "<tr><th>B</th><td>2</td></tr></table>"
    )
    out = parse_detail_page_kvtable("https://d/p/1", body)
    assert out["parse_ok"] and out["current_price_cents"] is None
    assert out["is_in_stock"] is False and out["stock"] == 0
    assert out["additional_info"] == '{"B": "2"}'  # mangled row skipped


def test_extraction_plan_is_arrow_batched(spark, t1_paths):
    """The kernel must compile to a single MapInPandas over the scan —
    no per-row Python UDF, no extra shuffle."""
    pages = spark.read.parquet(t1_paths["pages"]).filter(F.col("tier") == 1).select("url", "body")
    plan = extract_product_fields(pages)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan  # extraction adds no shuffle
