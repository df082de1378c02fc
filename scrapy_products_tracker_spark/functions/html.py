"""HTML -> training-text extraction (boilerplate strip), pure JVM.

The CCNet/RefinedWeb-style corpus step between "crawled page" and
"document row": strip scripts/styles/comments, drop tags, decode the
common entities, collapse whitespace — plus the link-density quality
signal (anchor-text share) boilerplate filters key on. Unlike the
product-field extraction kernel (``crawl/extract.py``, Arrow batches —
it must invert site-specific structure), this is shape-agnostic and
stays entirely in Catalyst ``regexp_replace`` column algebra: zero
Python, zero Exchange, whole-stage-codegen row-local work that runs at
scan speed on 100 TB of raw HTML (plan-pinned in
tests/test_html_text.py).

Regex notes: every pattern uses constructs Java regex and RE2 (the
DuckDB oracle) implement identically — inline ``(?is)`` flags, lazy
quantifiers, no backreferences/lookarounds. Unterminated script/style
blocks are swallowed to end-of-document (the conservative reading —
half a <script> is never training text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "html_to_text_col",
    "link_density_col",
    "html_text_stats",
    "main_content_col",
    "main_content_stats",
]

# kill-regions first (their inner text is never content); unterminated
# blocks swallow to end of doc
_KILL = [
    r"(?is)<script\b[^>]*>.*?(</script>|$)",
    r"(?is)<style\b[^>]*>.*?(</style>|$)",
    r"(?s)<!--.*?(-->|$)",
]
# the entity subset that appears in real-world boilerplate hot paths;
# anything rarer survives as literal text (documented contract)
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
]


def _strip(col: Column) -> Column:
    out = col
    for pat in _KILL:
        out = F.regexp_replace(out, pat, " ")
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_to_text_col(body: Column) -> Column:
    """Visible text of an HTML body column (NULL -> empty string)."""
    return _strip(F.coalesce(body, F.lit("")))


def link_density_col(body: Column) -> Column:
    """Anchor-text length / total text length (NULL when the page has
    no text). Anchor text is the tag-stripped inner text of every
    ``<a ...>...</a>`` region; 6-decimal rounding keeps the ratio
    engine-stable."""
    b = F.coalesce(body, F.lit(""))
    anchors = F.regexp_extract_all(b, F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), F.lit(1))
    link_len = F.aggregate(
        F.transform(anchors, lambda a: F.length(_strip(a))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    total = F.length(html_to_text_col(body))
    return F.when(total > 0, F.round(link_len / total, 6))


def html_text_stats(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Per-page corpus-text row: ``(url, text, text_len, n_links,
    link_density)``. ``n_links`` counts anchor OPENS (unclosed anchors
    count as links but contribute no anchor text)."""
    body = F.col(body_col)
    text = html_to_text_col(body)
    n_links = F.size(
        F.regexp_extract_all(F.coalesce(body, F.lit("")), F.lit(r"(?i)<a\b"), F.lit(0))
    )
    return df.select(
        F.col(url_col).alias("url"),
        text.alias("text"),
        F.length(text).cast("int").alias("text_len"),
        n_links.cast("int").alias("n_links"),
        link_density_col(body).alias("link_density"),
    )


# block-level boundaries for main-content segmentation: the tag set
# jusText/Boilerpipe treat as paragraph separators (plus self-closing
# media/rule tags); inline tags (<a>, <b>, <span>...) stay inside
# their block so anchor text is attributed to the right block
_BLOCK_RE = (
    r"(?is)</?(?:p|div|section|article|ul|ol|li|table|thead|tbody|tr|td|th"
    r"|h[1-6]|header|footer|nav|aside|blockquote|br|dl|dt|dd"
    r"|html|head|body|title|img|hr|form)\b[^>]*>"
)
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"


def _kill(col: Column) -> Column:
    out = F.coalesce(col, F.lit(""))
    for pat in _KILL:
        out = F.regexp_replace(out, pat, " ")
    return out


def main_content_col(
    body: Column,
    min_block_chars: int = 15,
    ld_num: int = 1,
    ld_den: int = 3,
) -> Column:
    """Main-content extraction — the simplified jusText/Boilerpipe
    block algorithm (public: Pomikálek '11, Kohlschütter '10) that
    RefinedWeb-class pipelines run between "crawled HTML" and
    "document row": segment the page into block-level chunks, score
    each block's LINK DENSITY (anchor-text chars / text chars), and
    keep only blocks that read like content — long enough
    (``len >= min_block_chars``) and link-sparse
    (``anchor_len * ld_den <= text_len * ld_num``, i.e. density <=
    ld_num/ld_den held in INTEGER arithmetic so both engines agree
    bit-for-bit).  Nav bars, footers, tag clouds and related-links
    rails are short and anchor-dense on exactly these measures.

    Pure column algebra: kill-regions first (script/style/comment
    innards are never content and may contain block tags), split on
    block boundaries, score each chunk with higher-order lambdas
    (anchor text attribution stays per-block because anchors are
    inline tags), join survivors with newlines.  Zero Python, zero
    Exchange — runs at scan speed like :func:`html_to_text_col`
    (plan-pinned in tests)."""
    blocks = F.split(_kill(body), _BLOCK_RE)

    def _score(x: Column) -> Column:
        txt = _strip(x)
        alen = F.aggregate(
            F.transform(
                F.regexp_extract_all(x, F.lit(_ANCHOR_RE), F.lit(1)),
                lambda a: F.length(_strip(a)),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        return F.struct(txt.alias("t"), alen.alias("a"))

    scored = F.transform(blocks, _score)
    kept = F.filter(
        scored,
        lambda s: (F.length(s["t"]) >= F.lit(min_block_chars))
        & (s["a"] * F.lit(ld_den) <= F.length(s["t"]) * F.lit(ld_num)),
    )
    return F.array_join(F.transform(kept, lambda s: s["t"]), "\n")


def main_content_stats(
    df: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    min_block_chars: int = 15,
    ld_num: int = 1,
    ld_den: int = 3,
) -> DataFrame:
    """Per-page main-content row: ``(url, content, n_kept_blocks,
    content_len, content_md5)`` — md5 so a one-character divergence
    anywhere in segment/score/join fails the oracle gate."""
    content = main_content_col(
        F.col(body_col), min_block_chars=min_block_chars, ld_num=ld_num, ld_den=ld_den
    )
    n_kept = F.when(
        F.length(content) == 0, F.lit(0)
    ).otherwise(F.size(F.split(content, "\n")))
    return df.select(
        F.col(url_col).alias("url"),
        content.alias("content"),
        n_kept.cast("int").alias("n_kept_blocks"),
        F.length(content).cast("int").alias("content_len"),
        F.md5(content).alias("content_md5"),
    )


def link_edges(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(source, target, anchor) link edges extracted from page bodies —
    zero-Python regexp algebra (href + inner text via two same-pattern
    ``regexp_extract_all`` calls zipped positionally). Resolution is
    the JVM subset of urljoin: absolute http(s) hrefs kept as-is,
    root-relative ``/...`` hrefs resolved against the page's scheme +
    host; anything else (protocol-relative, dot-relative, javascript:,
    fragments) is dropped — crawl frontiers at scale only follow the
    first two forms anyway (dot-relative resolution needs the
    path-stack urljoin in ``crawl/extract.py``'s Arrow kernel).
    Shared by :func:`anchor_text_index` and
    ``functions/graph.focused_priority_boost``."""
    pat = r"(?is)<a\b[^>]*href\s*=\s*['\"]([^'\"]*)['\"][^>]*>(.*?)</a>"
    b = F.coalesce(F.col(body_col), F.lit(""))
    hrefs = F.regexp_extract_all(b, F.lit(pat), F.lit(1))
    texts = F.regexp_extract_all(b, F.lit(pat), F.lit(2))
    pairs = F.arrays_zip(hrefs.alias("href"), texts.alias("txt"))
    origin = F.concat(
        F.parse_url(F.col(url_col), F.lit("PROTOCOL")),
        F.lit("://"),
        F.parse_url(F.col(url_col), F.lit("HOST")),
    )
    return (
        df.select(F.col(url_col).alias("source"), origin.alias("_origin"), F.explode(pairs).alias("p"))
        .select(
            "source",
            F.col("p.href").alias("href"),
            _strip(F.col("p.txt")).alias("anchor"),
            "_origin",
        )
        .withColumn(
            "target",
            F.when(F.col("href").rlike(r"(?i)^https?://"), F.col("href")).when(
                F.col("href").startswith("/") & ~F.col("href").startswith("//"),
                F.concat(F.col("_origin"), F.col("href")),
            ),
        )
        .filter(F.col("target").isNotNull())
        .select("source", "target", "anchor")
    )


def anchor_text_index(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Backlink anchor-text index — the classic web-graph aggregation
    (search ranking + link-spam filters key on it): for every link
    TARGET, how many referring pages/links point at it and what anchor
    text they use most.

    Link extraction is the same zero-Python regexp algebra as
    ``html_text_stats`` (href + inner text via two same-pattern
    ``regexp_extract_all`` calls zipped positionally). Resolution is
    the JVM subset of urljoin: absolute http(s) hrefs kept as-is,
    root-relative ``/...`` hrefs resolved against the page's scheme +
    host; anything else (protocol-relative, dot-relative, javascript:,
    fragments) is dropped — crawl frontiers at scale only follow the
    first two forms anyway (dot-relative resolution needs the
    path-stack urljoin in ``crawl/extract.py``'s Arrow kernel).

    Output: ``(target_url, n_refs, n_sources, top_anchor,
    top_anchor_refs)`` where top_anchor is the modal stripped anchor
    text (ties broken lexicographically — deterministic). Plan: one
    exchange keyed on (target, anchor) for the mode, one on target for
    the rollup; link rows are narrow (two strings) because payloads
    never pass the explode."""
    links = link_edges(df, url_col=url_col, body_col=body_col)
    by_anchor = links.groupBy("target", "anchor").agg(
        F.count("*").alias("anchor_refs"),
        F.countDistinct("source").alias("anchor_sources"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("target").orderBy(F.desc("anchor_refs"), "anchor")
    return (
        by_anchor.withColumn("_rn", F.row_number().over(w))
        .groupBy("target")
        .agg(
            F.sum("anchor_refs").cast("long").alias("n_refs"),
            F.sum("anchor_sources").cast("long").alias("n_source_pairs"),
            F.max(F.when(F.col("_rn") == 1, F.col("anchor"))).alias("top_anchor"),
            F.max(F.when(F.col("_rn") == 1, F.col("anchor_refs"))).cast("long").alias(
                "top_anchor_refs"
            ),
        )
        .withColumnRenamed("target", "target_url")
    )
