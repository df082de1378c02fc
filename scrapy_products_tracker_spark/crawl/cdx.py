"""CDX-style capture index over a fetched-page store.

Every serious crawl archive publishes a CDX index next to its payload
store (the Internet Archive / Common Crawl convention, pywb
``cdxj``): one row per capture keyed by SURT urlkey, carrying digest,
status and length, so consumers can look up / dedup / range-scan
captures without touching payload bytes. The reference keeps no
archive index at all (pages live transiently in Scrapy responses,
``spiders/*_spider.py``); at 10^10 URLs the index IS the random-access
surface over the page store.

:func:`cdx_index` derives the index relationally from a page table —
pure column algebra, zero Python, zero shuffle (a narrow projection;
the final ordering is the caller's choice). Fields follow CDXJ:

- ``urlkey`` — SURT (Sort-friendly URI Reordering Transform): host
  lowercased, dot-components reversed and comma-joined, then ``)``
  and the path+query. ``https://shop.example.com/p/1?x=2`` →
  ``com,example,shop)/p/1?x=2``. SURT collates all captures of a
  host/registrable-domain contiguously — the property that makes the
  index range-scannable per site (and the frontier's per-domain reads
  cheap) at archive scale.
- ``digest`` — payload digest for revisit/dedup records. CDX uses
  SHA1-base32; here it is hex MD5 (both engines ship it built-in;
  the *role* — content-addressed equality — is identical). NULL body
  → NULL digest (a capture with no stored payload, e.g. a redirect).
- ``status`` / ``length`` — HTTP status and stored payload octets.

Scale notes (100 TB): the projection never reads more than the body
column's lengths+hashes per row; with the body stored in a separate
parquet column, column pruning keeps everything else metadata-only.
Sorting by ``urlkey`` before writing (the caller's step) gives the
range-partitioned layout real CDX files have; Spark's range
partitioner does that with one exchange — the unavoidable one for a
globally sorted index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surt_key(url: Column) -> Column:
    """SURT urlkey as a pure column expression (assumes canonical
    lowercased http(s) URLs — the frontier's invariant)."""
    host = F.parse_url(url, F.lit("HOST"))
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))
    path = F.when(path == "", "/").otherwise(path)
    query = F.parse_url(url, F.lit("QUERY"))
    tail = F.when(query.isNull(), path).otherwise(F.concat(path, F.lit("?"), query))
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","), F.lit(")"), tail
    )


def cdx_index(
    pages: DataFrame,
    url_col: str = "url",
    status_col: str = "status_code",
    body_col: str = "body",
) -> DataFrame:
    """(urlkey, url, status, digest, length) per page row."""
    url = F.col(url_col)
    body = F.col(body_col)
    return pages.select(
        surt_key(url).alias("urlkey"),
        url.alias("url"),
        F.col(status_col).cast("int").alias("status"),
        F.md5(body.cast("binary")).alias("digest"),
        F.coalesce(F.octet_length(body), F.lit(0)).cast("long").alias("length"),
    )


def cdx_revisit_index(
    captures: DataFrame,
    url_col: str = "url",
    status_col: str = "status_code",
    body_col: str = "body",
    ts_col: str = "ts",
) -> DataFrame:
    """Multi-capture CDX with REVISIT records — the Common Crawl /
    pywb archive-dedup convention: the first capture of a given
    (urlkey, digest) is the stored ``response`` record; every later
    capture with the SAME payload digest becomes a ``revisit`` record
    that stores no payload and points at the original capture's
    timestamp (``refers_to_ts``).  At re-crawl scale this is the
    single biggest storage lever an archive has: unchanged pages —
    the common case, per the revisit-policy statistics — cost an
    index row instead of a payload copy.

    Output: ``(urlkey, ts, url, status, digest, record_type,
    refers_to_ts, stored_length)`` where ``stored_length`` is the
    payload octets for response records and 0 for revisits (the sum
    over the index is exactly the archive's payload footprint).

    Digest-less captures (NULL body — redirects, errors) never dedup:
    each stays a ``response`` with stored_length 0.

    Plan: ONE Exchange on (urlkey, digest) for the first-capture
    window — same key the archive's range layout wants anyway; no
    join, no Python."""
    from pyspark.sql import Window

    url, body, ts = F.col(url_col), F.col(body_col), F.col(ts_col)
    base = captures.select(
        surt_key(url).alias("urlkey"),
        ts.cast("long").alias("ts"),
        url.alias("url"),
        F.col(status_col).cast("int").alias("status"),
        F.md5(body.cast("binary")).alias("digest"),
        F.coalesce(F.octet_length(body), F.lit(0)).cast("long").alias("_len"),
    )
    w = Window.partitionBy("urlkey", "digest").orderBy("ts", "url")
    rn = F.row_number().over(w)
    first_ts = F.min("ts").over(Window.partitionBy("urlkey", "digest"))
    is_revisit = F.col("digest").isNotNull() & (rn > 1)
    return base.select(
        "urlkey",
        "ts",
        "url",
        "status",
        "digest",
        F.when(is_revisit, F.lit("revisit")).otherwise(F.lit("response")).alias("record_type"),
        F.when(is_revisit, first_ts).alias("refers_to_ts"),
        F.when(is_revisit, F.lit(0)).otherwise(F.col("_len")).cast("long").alias("stored_length"),
    )
