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

__all__ = ["html_to_text_col", "link_density_col", "html_text_stats"]

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
