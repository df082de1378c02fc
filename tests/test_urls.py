import pandas as pd
from pyspark.sql import functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy_products_tracker_spark.functions import (
    canonicalize_series,
    canonicalize_url,
    domain_of_str,
    path_of_str,
)

CASES = {
    "HTTP://Example.COM:80/a/b?utm_source=x&z=1&a=2#frag": "http://example.com/a/b?a=2&z=1",
    "https://site.com:443": "https://site.com/",
    "https://site.com/path/?b=2&a=1": "https://site.com/path/?a=1&b=2",
    " https://h.com/x?utm_campaign=1 ": "https://h.com/x",
    "https://h.com/x?": "https://h.com/x",
    "https://h.com/x?fbclid=abc&q=1": "https://h.com/x?q=1",
    "notaurl": None,
    "": None,
}


def test_scalar_cases():
    for raw, want in CASES.items():
        assert canonicalize_url(raw) == want, raw


def test_idempotent():
    for raw, want in CASES.items():
        if want is not None:
            assert canonicalize_url(want) == want


_url_alphabet = st.text(
    alphabet="abcXYZ019-._~/?&=#:%", min_size=0, max_size=30
)


@given(st.lists(_url_alphabet, min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_vector_matches_scalar(suffixes):
    urls = [f"https://Ex.com{('/' + s) if not s.startswith('/') else s}" for s in suffixes]
    urls += ["junk", "HTTP://A.B:80/?z=1&a=2"]
    got = list(canonicalize_series(pd.Series(urls, dtype=object)))
    want = [canonicalize_url(u) for u in urls]
    assert got == want


def test_domain_and_path_helpers():
    assert domain_of_str("https://a.b.c:8080/x/y?q=1") == "a.b.c"
    assert path_of_str("https://a.b.c/x/y?q=1") == "/x/y"
    assert path_of_str("https://a.b.c") == "/"


def test_query_param_get_set_next_page(spark):
    """E12/F2: the furl get/set-query-param idiom as column algebra —
    read page, rebuild next-page URL, append when absent."""
    from pyspark.sql import functions as F

    from scrapy_products_tracker_spark.functions.urls import (
        get_query_param,
        next_page_url,
        with_query_param,
    )

    rows = [
        ("https://s.com/cat?page=3",),
        ("https://s.com/cat?a=1&page=9&b=2",),
        ("https://s.com/cat",),
        ("https://s.com/cat?a=1",),
    ]
    df = spark.createDataFrame(rows, ["url"])
    out = df.select(
        "url",
        get_query_param(F.col("url"), "page").alias("cur"),
        with_query_param(F.col("url"), "page", F.lit(7)).alias("set7"),
        next_page_url(F.col("url")).alias("nxt"),
    )
    got = {r["url"]: r for r in out.collect()}
    assert got["https://s.com/cat?page=3"]["cur"] == "3"
    assert got["https://s.com/cat?page=3"]["set7"] == "https://s.com/cat?page=7"
    assert got["https://s.com/cat?page=3"]["nxt"] == "https://s.com/cat?page=4"
    assert got["https://s.com/cat?a=1&page=9&b=2"]["nxt"] == "https://s.com/cat?a=1&page=10&b=2"
    assert got["https://s.com/cat"]["cur"] is None
    assert got["https://s.com/cat"]["nxt"] == "https://s.com/cat?page=2"
    assert got["https://s.com/cat?a=1"]["nxt"] == "https://s.com/cat?a=1&page=2"


def test_query_param_hostile_values(spark):
    """Review regressions: $/backslash in the VALUE must not hit Java's
    group-reference machinery; metachar NAMES are rejected; an
    overflowing ?page restarts at `first` instead of throwing (ANSI)."""
    import pytest
    from pyspark.sql import functions as F

    from scrapy_products_tracker_spark.functions.urls import (
        next_page_url,
        with_query_param,
    )

    df = spark.createDataFrame(
        [("https://s.com/cat?q=old",), ("https://s.com/cat",)], ["url"]
    )
    got = {
        r["url"]: r["out"]
        for r in df.select(
            "url", with_query_param(F.col("url"), "q", F.lit(r"5$ and \2")).alias("out")
        ).collect()
    }
    assert got["https://s.com/cat?q=old"] == r"https://s.com/cat?q=5$ and \2"
    assert got["https://s.com/cat"] == r"https://s.com/cat?q=5$ and \2"

    with pytest.raises(ValueError):
        with_query_param(F.col("url"), "price[min]", F.lit(1))

    big = spark.createDataFrame(
        [("https://s.com/cat?page=99999999999",), ("https://s.com/cat?page=x",)], ["url"]
    )
    nxt = {
        r["url"]: r["n"] for r in big.select("url", next_page_url(F.col("url")).alias("n")).collect()
    }
    assert nxt["https://s.com/cat?page=99999999999"] == "https://s.com/cat?page=2"
    assert nxt["https://s.com/cat?page=x"] == "https://s.com/cat?page=2"


def test_registrable_domain_psl_rule(spark):
    from scrapy_products_tracker_spark.functions import registrable_domain

    cases = [
        ("shop.books.co.uk", "books.co.uk"),
        ("books.co.uk", "books.co.uk"),
        ("co.uk", "co.uk"),          # bare public suffix: unchanged
        ("a.b.example.com", "example.com"),
        ("example.com", "example.com"),
        ("WWW.EXAMPLE.COM", "example.com"),  # lowercased
        ("deep.sub.x.com.au", "x.com.au"),
        ("example.uk", "example.uk"),  # uk matches, co.uk does not
        ("internal.corp", "internal.corp"),  # no suffix match: unchanged
        ("10.0.0.1", "10.0.0.1"),
        ("mycom", "mycom"),           # suffix must match on a dot boundary
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["host"])
    got = {
        r["host"]: r["reg"]
        for r in df.select(
            F.col("host"),
            registrable_domain(F.col("host")).alias("reg"),
        ).collect()
    }
    for h, want in cases:
        assert got[h] == want, (h, got[h], want)


def test_registrable_domain_plan_row_local(spark):
    from scrapy_products_tracker_spark.functions import registrable_domain

    df = spark.createDataFrame([("a.b.com",)], ["host"])
    plan = (
        df.select(registrable_domain(F.col("host")).alias("r"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
