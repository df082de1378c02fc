"""Hypothesis fuzz for the pure-Python parser kernels (no Spark in the
loop, so hundreds of examples run in seconds): the WARC record framer/
parser and the robots.txt parser must never raise on arbitrary input
(untrusted remote content contract, X6/X7), and framing must roundtrip
arbitrary binary bodies byte-exactly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy_products_tracker_spark.crawl.warc import _parse_warc, _response_record
from scrapy_products_tracker_spark.politeness.robots import (
    parse_robots_body,
    parse_robots_rules,
)

_SETTINGS = dict(max_examples=200, deadline=None)


@given(st.binary(max_size=4096))
@settings(**_SETTINGS)
def test_parse_warc_never_raises_on_garbage(data):
    recs = list(_parse_warc(data))
    assert isinstance(recs, list)


@given(
    st.lists(
        st.tuples(
            st.from_regex(r"https://[a-z]{1,8}\.test/[a-z0-9/]{0,20}", fullmatch=True),
            st.integers(min_value=100, max_value=599),
            st.binary(max_size=512),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_warc_framing_roundtrips_arbitrary_bodies(rows):
    """Bodies may contain CRLFCRLF, WARC/ magic, anything — the
    Content-Length framing must return them byte-exact."""
    blob = b"".join(_response_record(u, s, b, "2026-01-01T00:00:00Z")[0] for u, s, b in rows)
    parsed = list(_parse_warc(blob))
    assert len(parsed) == len(rows)
    for (u, s, b), rec in zip(rows, parsed):
        assert rec["headers"]["warc-target-uri"] == u
        block = rec["block"]
        sep = block.find(b"\r\n\r\n")
        assert block[sep + 4 :] == b


@given(st.binary(max_size=2048), st.integers(min_value=0, max_value=10**6))
@settings(**_SETTINGS)
def test_parse_warc_truncation_never_raises(data, cut):
    blob = _response_record("https://a.test/x", 200, data, "2026-01-01T00:00:00Z")[0]
    assert isinstance(list(_parse_warc(blob[: cut % (len(blob) + 1)])), list)


@given(st.text(max_size=2048))
@settings(**_SETTINGS)
def test_robots_parser_never_raises_and_projection_consistent(body):
    """Arbitrary text parses without raising, and parse_robots_body is
    exactly the disallow-only projection of parse_robots_rules."""
    rules, delay = parse_robots_rules(body)
    prefixes, regexes, delay2 = parse_robots_body(body)
    assert delay == delay2 >= 0
    dis = [r for r in rules if not r["allow"]]
    assert prefixes == [r["pat"] for r in dis if r["rx"] is None]
    assert regexes == [r["rx"] for r in dis if r["rx"] is not None]
    for r in rules:
        assert r["spec"] == len(r["pat"]) > 0


@given(
    st.dictionaries(
        st.integers(0, 15), st.integers(0, 15), min_size=0, max_size=12
    ),
    st.integers(1, 5),
)
@settings(max_examples=25, deadline=None)
def test_fuzz_follow_redirects_matches_python_walker(redmap, cap):
    """Random redirect maps (chains, trees, cycles, self-loops) over a
    16-node url space: the bounded-join kernel must equal a pure-Python
    hop walker for every node — final url, hop count, exceeded flag."""
    from scrapy_products_tracker_spark.fetchers.synthetic import follow_redirects
    from scrapy_products_tracker_spark.session import get_spark

    spark = get_spark(master="local[2]", shuffle_partitions=2)
    u = lambda i: f"https://f.example.com/u/{i}"
    claimed = spark.createDataFrame([(u(i),) for i in range(16)], "url string")
    reds = spark.createDataFrame(
        [(u(a), u(b)) for a, b in sorted(redmap.items())] or [("_none_", "_none_")],
        "url string, redirect_to string",
    )
    if not redmap:
        reds = reds.limit(0)
    got = {
        r["url"]: (r["final_url"], r["n_redirects"], r["redirect_exceeded"])
        for r in follow_redirects(claimed, reds, max_hops=cap).collect()
    }

    for i in range(16):
        cur, hops = i, 0
        while hops < cap and cur in redmap:
            cur = redmap[cur]
            hops += 1
        exceeded = 1 if cur in redmap else 0
        assert got[u(i)] == (u(cur), hops, exceeded), (i, redmap, cap)
