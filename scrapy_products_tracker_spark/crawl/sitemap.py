"""Sitemap ingestion: XML sitemap / sitemap-index bodies -> frontier seeds.

The reference discovers URLs only by crawling listing pages (its seed
CSVs are hand-made, utils/read_csv.py); real sites also publish
sitemaps (sitemaps.org protocol), and at 10^10-URL scale they are the
cheapest discovery channel a frontier has — one fetched XML body can
carry 50k URLs with change hints (``lastmod``) and crawl priorities.
This module turns a DataFrame of fetched sitemap bodies into typed
frontier-seed candidate rows, entirely with JVM expressions
(``regexp_extract_all`` + higher-order ``transform`` — no Python in
the hot path, nothing leaves whole-stage codegen).

Shapes handled (sitemaps.org §"XML format"):

- urlset entries: ``<url><loc>..</loc> [<lastmod>..] [<priority>..]``
  -> kind ``url``;
- sitemap-index entries: ``<sitemap><loc>..</loc> [<lastmod>..]``
  -> kind ``sitemap`` (pointers to child sitemaps: feed them back into
  the fetcher and call this parser again — recursion is a driver-side
  bounded loop exactly like the F2 next-page chain, one fetch round
  per index level, and real indexes are 1-2 levels deep);
- hostile / truncated / non-XML bodies match nothing -> zero rows for
  that body, never a failed task (X6 contract).

Field normalization (fixed-point, engine-independent):

- ``lastmod`` W3C datetime (``2026-08-18`` or
  ``2026-08-18T09:30:00+00:00``) -> epoch **seconds** (date-only means
  midnight UTC); unparseable -> NULL;
- ``priority`` (0.0-1.0 per the protocol, default 0.5) -> **milli**
  int 0-1000; absent/garbage -> NULL (the protocol default is applied
  by ``sitemap_seed_candidates``, not baked into parse output);
- ``loc`` is trimmed and CDATA-unwrapped; non-http(s) locs dropped.

Scale: one body row fans out to <=50k entry rows via explode — a pure
map-side expansion, no shuffle; the only shuffle in
``sitemap_seed_candidates`` is the max-lastmod/min-priority aggregate
on the canonical URL key, followed by the same bucket-pruned
``url_hash`` anti-join the crawl loop uses against the seen set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?s): sitemap bodies are multi-line; RE2 (DuckDB oracle) and java.util.regex
# both honor it. Non-greedy inner match keeps one <url> block per element.
_URL_BLOCK = r"(?s)<url\s*>(.*?)</url>"
_SITEMAP_BLOCK = r"(?s)<sitemap\s*>(.*?)</sitemap>"
_LOC = r"(?s)<loc\s*>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</loc>"
_LASTMOD = r"(?s)<lastmod\s*>\s*([0-9T:+.Z\-]+)\s*</lastmod>"
_PRIORITY = r"(?s)<priority\s*>\s*([0-9.]+)\s*</priority>"


def _entry_struct(block: Column, kind: str) -> Column:
    loc = F.regexp_extract(block, _LOC, 1)
    lastmod = F.regexp_extract(block, _LASTMOD, 1)
    prio = F.regexp_extract(block, _PRIORITY, 1)
    return F.struct(
        F.lit(kind).alias("kind"),
        F.nullif(loc, F.lit("")).alias("loc"),
        F.nullif(lastmod, F.lit("")).alias("lastmod_raw"),
        F.nullif(prio, F.lit("")).alias("priority_raw"),
    )


def parse_sitemap_entries(
    fetched: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """One row per ``<url>``/``<sitemap>`` element across all bodies:
    (source_url, kind, loc, lastmod_ts, priority_milli).

    ``lastmod_ts`` is epoch seconds (BIGINT, date-only = midnight UTC),
    ``priority_milli`` an INT in [0, 1000]; both NULL when absent or
    malformed. A priority outside the protocol's 0.0-1.0 range is
    clamped (the protocol says consumers should ignore such values;
    clamping keeps the row while bounding the key space). Rows whose
    ``loc`` is missing or not http(s) are dropped."""
    src = F.col(url_col).alias("source_url")
    body = F.col(body_col)
    urls = F.regexp_extract_all(body, F.lit(_URL_BLOCK), 1)
    idx = F.regexp_extract_all(body, F.lit(_SITEMAP_BLOCK), 1)
    entries = F.concat(
        F.transform(urls, lambda b: _entry_struct(b, "url")),
        F.transform(idx, lambda b: _entry_struct(b, "sitemap")),
    )
    e = (
        fetched.filter(body.isNotNull())
        .select(src, F.explode(entries).alias("e"))
        .select("source_url", "e.kind", "e.loc", "e.lastmod_raw", "e.priority_raw")
        .filter(F.col("loc").rlike(r"^https?://"))
    )
    # W3C datetime: try full timestamp first, fall back to date-only.
    # try_to_timestamp returns NULL instead of raising on junk.
    ts = F.coalesce(
        F.expr("try_to_timestamp(lastmod_raw, \"yyyy-MM-dd'T'HH:mm:ssXXX\")"),
        F.expr("try_to_timestamp(lastmod_raw, \"yyyy-MM-dd'T'HH:mmXXX\")"),
        F.expr("try_to_timestamp(lastmod_raw, 'yyyy-MM-dd')"),
    )
    # try_cast: a hostile priority like "1.5.2" matches [0-9.]+ but is
    # not a number — NULL, never an ANSI cast failure
    prio = F.col("priority_raw").try_cast("double")
    prio_milli = F.when(
        prio.isNotNull(),
        F.least(F.lit(1000), F.greatest(F.lit(0), F.round(prio * 1000).cast("int"))),
    )
    return e.select(
        "source_url",
        "kind",
        F.col("loc").alias("loc"),
        ts.cast("long").alias("lastmod_ts"),
        prio_milli.alias("priority_milli"),
    )


def sitemap_seed_candidates(
    entries: DataFrame,
    seen: DataFrame | None = None,
    seen_url_col: str = "url",
) -> DataFrame:
    """Frontier-seed candidates from parsed entries: canonicalized
    ``url`` kind rows, one per canonical URL (max lastmod, max priority
    across duplicate listings — a URL listed in two sitemaps keeps its
    freshest hint), protocol-default priority 500 applied, minus any
    already in ``seen``. Output: (url, domain, lastmod_ts,
    priority_milli) — ready for ``CrawlDriver.seed``."""
    from ..functions.urls import canonicalize_udf, domain_of

    cand = (
        entries.filter(F.col("kind") == "url")
        .withColumn("url", canonicalize_udf(F.col("loc")))
        .filter(F.col("url").isNotNull())
        .groupBy("url")
        .agg(
            F.max("lastmod_ts").alias("lastmod_ts"),
            F.coalesce(F.max("priority_milli"), F.lit(500)).alias("priority_milli"),
        )
        .withColumn("domain", domain_of(F.col("url")))
    )
    if seen is not None:
        probe = seen.select(F.col(seen_url_col).alias("url")).distinct()
        cand = cand.join(probe, "url", "left_anti")
    return cand.select("url", "domain", "lastmod_ts", "priority_milli")
