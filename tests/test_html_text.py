"""HTML -> corpus text (functions/html.py): boilerplate strip, entity
decode, link density, hostile fragments, and the zero-Python /
zero-Exchange plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions.html import html_text_stats


def _stats(spark, body):
    df = spark.createDataFrame([("u", body)], "url string, body string")
    return html_text_stats(df).collect()[0]


def test_strip_scripts_styles_comments_tags(spark):
    r = _stats(
        spark,
        "<html><head><script>var x = '<b>not text</b>';</script>"
        "<style>.a{color:red}</style><!-- hidden --></head>"
        "<body><h1>Title</h1><p>Hello <b>world</b></p></body></html>",
    )
    assert r["text"] == "Title Hello world"
    assert r["text_len"] == len("Title Hello world")
    assert r["n_links"] == 0 and r["link_density"] == 0.0


def test_entities_and_whitespace(spark):
    r = _stats(spark, "<p>a&nbsp;&amp;&nbsp;b &amp;lt; &lt;tag&gt;</p>\n\t <p>c</p>")
    # &amp; decodes LAST, so &amp;lt; yields the literal text '&lt;'
    # (correct HTML semantics) while a bare &lt; becomes '<'
    assert r["text"] == "a & b &lt; <tag> c"


def test_link_density(spark):
    body = '<p>intro text here</p><a href="/x">click</a><a href="/y">me</a>'
    r = _stats(spark, body)
    text = "intro text here click me"
    assert r["text"] == text
    assert r["n_links"] == 2
    assert abs(r["link_density"] - round((len("click") + len("me")) / len(text), 6)) < 1e-9
    # nav-like page: almost all anchor text
    nav = "".join(f'<a href="/{i}">item {i}</a>' for i in range(10)) + "<p>x</p>"
    assert _stats(spark, nav)["link_density"] > 0.8


def test_hostile_fragments_never_raise(spark):
    cases = [
        None,
        "",
        "<script>never closed",
        "<a href='/x'>unclosed anchor",
        "<<<>>>",
        "plain text no tags",
        "<style>html{<!--</style>ok",
    ]
    df = spark.createDataFrame(
        [(str(i), c) for i, c in enumerate(cases)], "url string, body string"
    )
    rows = {r["url"]: r for r in html_text_stats(df).collect()}
    assert rows["0"]["text"] == "" and rows["0"]["text_len"] == 0
    assert rows["0"]["link_density"] is None
    assert rows["2"]["text"] == ""  # unterminated script swallows to EOF
    assert rows["3"]["n_links"] == 1 and rows["3"]["link_density"] == 0.0
    assert rows["5"]["text"] == "plain text no tags"
    assert rows["6"]["text"] == "ok"


def test_plan_zero_python_zero_exchange(spark):
    df = spark.createDataFrame([("u", "<p>x</p>")], "url string, body string")
    plan = html_text_stats(df)._jdf.queryExecution().executedPlan().toString()
    for banned in ("Exchange", "Python", "FlatMap", "Arrow"):
        assert banned not in plan, banned


def test_anchor_text_index(spark):
    from scrapy_products_tracker_spark.functions.html import anchor_text_index

    rows = [
        ("https://a.test/1", '<a href="/t">Buy Now</a><a href="/t">Buy Now</a>'
                              '<a href="https://b.test/x">ext</a>'),
        ("https://a.test/2", "<a href='/t'>buy <b>now</b></a>"
                              '<a href="//cdn.test/asset">proto-rel dropped</a>'
                              '<a href="javascript:void(0)">js dropped</a>'
                              '<a href="rel/path">dot-rel dropped</a>'),
        ("https://b.test/1", '<a href="https://a.test/t">Other Anchor</a>'),
        ("https://c.test/1", None),
    ]
    df = spark.createDataFrame(rows, "url string, body string")
    out = {r["target_url"]: r for r in anchor_text_index(df).collect()}
    t = out["https://a.test/t"]
    # 2x "Buy Now" (page 1) + 1x "buy now" (page 2, tags stripped) +
    # 1x "Other Anchor" (absolute href from b.test)
    assert t["n_refs"] == 4
    assert t["top_anchor"] == "Buy Now" and t["top_anchor_refs"] == 2
    assert out["https://b.test/x"]["n_refs"] == 1
    assert "https://cdn.test/asset" not in out
    assert not any("javascript" in k or "rel/path" in k for k in out)


def test_anchor_index_plan_no_cartesian(spark):
    from scrapy_products_tracker_spark.functions.html import anchor_text_index

    df = spark.createDataFrame([("https://a.test/1", "<a href='/t'>x</a>")],
                               "url string, body string")
    plan = anchor_text_index(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "Python" not in plan


# --- focused-crawl priority boost -------------------------------------------


def test_focused_priority_boost_exact(spark):
    from scrapy_products_tracker_spark.functions.graph import focused_priority_boost

    pages = spark.createDataFrame(
        [
            (
                "https://a.com/p1",
                '<a href="https://t.com/x">great cat pics</a>'
                '<a href="https://t.com/x">CAT again</a>'       # same term twice -> 1 hit
                '<a href="https://t.com/y">category page</a>',   # 'cat' must NOT match
            ),
            (
                "https://b.com/p2",
                '<a href="/local">dog shop</a>'                  # root-relative resolve
                '<a href="https://t.com/y">the shop</a>',
            ),
        ],
        "url string, body string",
    )
    frontier = spark.createDataFrame(
        [
            ("https://t.com/x", 100),
            ("https://t.com/y", 100),
            ("https://b.com/local", 50),
            ("https://nowhere.com/z", 7),                        # no backlinks
        ],
        "url string, priority int",
    )
    got = {
        r["url"]: (r["n_term_hits"], r["boost"], r["boosted_priority"])
        for r in focused_priority_boost(
            frontier, pages, ["cat", "category", "shop"]
        ).collect()
    }
    assert got["https://t.com/x"] == (1, 333, 433)       # cat only (distinct terms)
    assert got["https://t.com/y"] == (2, 666, 766)       # category + shop
    assert got["https://b.com/local"] == (1, 333, 383)   # shop via root-relative link
    assert got["https://nowhere.com/z"] == (0, 0, 7)     # untouched


def test_focused_priority_boost_validates(spark):
    import pytest

    from scrapy_products_tracker_spark.functions.graph import focused_priority_boost

    df = spark.createDataFrame([("u", 1)], "url string, priority int")
    with pytest.raises(ValueError):
        focused_priority_boost(df, df.withColumnRenamed("priority", "body"), [])
    with pytest.raises(ValueError):
        focused_priority_boost(
            df, df.withColumnRenamed("priority", "body"), ["cat"], boost_milli=-1
        )


def test_focused_priority_boost_rerun_on_boosted_frontier(spark):
    """Frontier already carrying n_term_hits (e.g. a prior boost's
    output fed back in) must not trip an ambiguous-column analysis
    error — the join-side hits column is bound, not name-resolved."""
    from scrapy_products_tracker_spark.functions.graph import focused_priority_boost

    pages = spark.createDataFrame(
        [("https://a.com/p", '<a href="https://t.com/x">cat</a>')],
        "url string, body string",
    )
    frontier = spark.createDataFrame(
        [("https://t.com/x", 100, 9), ("https://t.com/y", 10, 9)],
        "url string, priority int, n_term_hits int",
    )
    got = {
        r["url"]: (r["n_term_hits"], r["boosted_priority"])
        for r in focused_priority_boost(frontier, pages, ["cat"]).collect()
    }
    # hits come from THIS run's backlinks, not the stale input column
    assert got["https://t.com/x"] == (1, 1100)
    assert got["https://t.com/y"] == (0, 10)


def test_main_content_keeps_content_drops_nav(spark):
    """jusText-style block scoring: the anchor-dense nav and footer
    blocks vanish, long link-sparse prose survives, and a block whose
    single anchor dominates its text is dropped by the integer
    density rule."""
    from scrapy_products_tracker_spark.functions.html import main_content_col

    body = (
        "<html><head><title>shop</title>"
        "<script>var x = '<div>not content</div>';</script></head><body>"
        "<nav><a href='/a'>Home</a> <a href='/b'>Products</a> <a href='/c'>About us</a></nav>"
        "<div>This paragraph is long enough and has no links at all in it.</div>"
        "<p>Another real paragraph with one <a href='/x'>small link</a> inside a lot of prose text.</p>"
        "<div><a href='/spam'>click here for amazing deals right now</a></div>"
        "<footer><a href='/t'>Terms</a> <a href='/p'>Privacy</a></footer>"
        "</body></html>"
    )
    df = spark.createDataFrame([(body,)], "body string")
    out = df.select(main_content_col(F.col("body")).alias("c")).collect()[0]["c"]
    lines = out.split("\n")
    assert any("long enough and has no links" in l for l in lines)
    assert any("Another real paragraph" in l for l in lines)
    assert not any("Home" in l or "Terms" in l for l in lines)       # nav/footer gone
    assert not any("amazing deals" in l for l in lines)              # link-only block gone
    assert not any("not content" in l for l in lines)                # script innards killed


def test_main_content_plan_zero_python_zero_exchange(spark):
    from scrapy_products_tracker_spark.functions.html import main_content_stats

    df = spark.createDataFrame([("u", "<p>x</p>")], "url string, body string")
    plan = main_content_stats(df)._jdf.queryExecution().executedPlan().toString()
    for banned in ("Exchange", "Python", "FlatMap", "Arrow"):
        assert banned not in plan, banned


def test_main_content_hostile_inputs(spark):
    from scrapy_products_tracker_spark.functions.html import main_content_stats

    rows = [
        ("a", None),
        ("b", ""),
        ("c", "<div><a href='x'>"),          # unclosed anchor
        ("d", "<script>" + "y" * 50),          # unterminated script swallows all
        ("e", "plain text long enough to be kept as a single block"),
    ]
    got = {
        r["url"]: r.asDict()
        for r in main_content_stats(
            spark.createDataFrame(rows, "url string, body string")
        ).collect()
    }
    assert got["a"]["content"] == "" and got["a"]["n_kept_blocks"] == 0
    assert got["b"]["content"] == "" and got["d"]["content"] == ""
    assert got["c"]["n_kept_blocks"] == 0
    assert got["e"]["n_kept_blocks"] == 1 and "kept" in got["e"]["content"]
