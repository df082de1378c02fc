"""URL canonicalization + domain extraction (vectorized).

The reference's canonicalization is minimal: domain via ``furl``
(utils/read_csv.py:102-108), image-URL cleanup ``split('?')[0]``
(viking_detail_page_spider.py:96-100), ``response.urljoin``
(quill_category_spider.py:87). At 10^10-URL scale the seen-set is only
as good as its canonical form, so this module defines one explicit
canonicalization used everywhere (engine, oracle, tests):

1. strip surrounding whitespace and the fragment,
2. lowercase scheme and host,
3. drop default ports (:80 http, :443 https),
4. drop tracking query params (utm_*, fbclid, gclid, ref, mc_cid,
   mc_eid) and sort the remaining params byte-wise,
5. empty path -> '/',
6. drop a trailing '?' left by an emptied query.

``canonicalize_series`` is the Arrow-batched kernel used from Spark
(pandas string vector ops; the query-param sort touches only rows that
actually contain '?'). ``canonicalize_url`` is the scalar twin for the
pure-Python oracle; both are property-tested for agreement.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TRACKING = re.compile(r"^(utm_[a-z0-9_]*|fbclid|gclid|ref|mc_cid|mc_eid)=", re.IGNORECASE)
_SPLIT = re.compile(r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]*)(?P<rest>[^#]*)")


def _canon_query(query: str) -> str:
    parts = [p for p in query.split("&") if p and not _TRACKING.match(p)]
    parts.sort()
    return "&".join(parts)


def canonicalize_url(url: str) -> str | None:
    """Scalar canonicalizer (oracle/tests). Returns None for junk."""
    m = _SPLIT.match(url.strip())
    if not m:
        return None
    scheme = m.group("scheme").lower()
    if scheme not in ("http", "https"):
        return None
    host = m.group("host").lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    rest = m.group("rest")
    if "?" in rest:
        path, _, query = rest.partition("?")
        query = _canon_query(query)
        rest = f"{path or '/'}?{query}" if query else (path or "/")
    else:
        rest = rest or "/"
    return f"{scheme}://{host}{rest}"


def canonicalize_series(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer over a pandas Series of URL strings."""
    s = urls.astype("string").str.strip()
    s = s.str.partition("#")[0]  # strip fragment
    ext = s.str.extract(_SPLIT)
    scheme = ext["scheme"].str.lower()
    scheme = scheme.where(scheme.isin(["http", "https"]))  # crawl http(s) only
    host = ext["host"].str.lower()
    host = host.mask((scheme == "http") & host.str.endswith(":80"), host.str.slice(0, -3))
    host = host.mask((scheme == "https") & host.str.endswith(":443"), host.str.slice(0, -4))
    rest = ext["rest"].fillna("")
    has_q = rest.str.contains(r"\?", regex=True, na=False)
    if has_q.any():
        # param-sort only the slice that has a query string
        qrows = rest[has_q]
        path = qrows.str.partition("?")[0].replace("", "/")
        query = qrows.str.partition("?")[2].map(_canon_query)
        fixed = path.where(query == "", path + "?" + query)
        rest = rest.copy()
        rest[has_q] = fixed
    rest = rest.replace("", "/")
    out = (scheme + "://" + host + rest).astype(object)
    return out.where(out.notna(), None)


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return canonicalize_series(urls)


def domain_of(url: Column) -> Column:
    """Host extraction, JVM-side (reference: furl(url).netloc on ingest,
    utils/read_csv.py:102-108). Assumes canonical input (lowercased)."""
    return F.parse_url(url, F.lit("HOST"))


def domain_of_str(url: str) -> str:
    m = _SPLIT.match(url)
    host = m.group("host") if m else ""
    return host.rsplit(":", 1)[0] if ":" in host else host


def path_of_str(url: str) -> str:
    m = _SPLIT.match(url)
    rest = (m.group("rest") or "/") if m else "/"
    return rest.partition("?")[0] or "/"


_PARAM_NAME_RE = re.compile(r"[A-Za-z0-9_.\-]+\Z")


def _check_param_name(name: str) -> None:
    """Param names are plain tokens: they are embedded in a regex here
    AND in parse_url's internal key regex, so metachars ('price[min]')
    would silently match the wrong thing or throw."""
    if not _PARAM_NAME_RE.match(name):
        raise ValueError(f"query param name must be a plain token, got {name!r}")


def get_query_param(url: Column, name: str) -> Column:
    """``?name=`` value as a string column (NULL if absent) — the read
    half of the reference's furl query manipulation (E12:
    costco_category_spider.py:78-95, viking_category_spider.py:77-96)."""
    _check_param_name(name)
    return F.parse_url(url, F.lit("QUERY"), F.lit(name))


def with_query_param(url: Column, name: str, value: Column) -> Column:
    """Set-or-append ``?name=value`` — the write half of the furl idiom
    (sequential pagination rebuilds ``page=N`` on the current URL).
    Pure column algebra (regexp replace / concat), no UDF. Expects
    canonical URLs (no fragment — the canonicalizer strips them).

    Contract: the value is spliced VERBATIM — no percent-encoding (and
    ``get_query_param`` does no decoding). A value containing the
    reserved characters ``& # = ?`` or whitespace would corrupt the
    query string / bleed into the next parameter. All engine callers
    pass integers (page numbers, the reference's furl idiom); callers
    with arbitrary values must url-encode before splicing."""
    _check_param_name(name)
    value = value.cast("string")
    # Java replacement-string metachars in the VALUE ($ = group ref,
    # \ = escape) must themselves be escaped or regexp_replace throws
    # "illegal group reference" / eats backslashes
    safe_value = F.regexp_replace(value, F.lit(r"([\\$])"), F.lit(r"\\$1"))
    has = get_query_param(url, name).isNotNull()
    replaced = F.regexp_replace(
        url, F.lit(f"([?&]{re.escape(name)}=)[^&]*"), F.concat(F.lit("$1"), safe_value)
    )
    appended = F.concat(
        url,
        F.when(F.instr(url, "?") > 0, F.lit("&")).otherwise(F.lit("?")),
        F.lit(name + "="),
        value,
    )
    return F.when(has, replaced).otherwise(appended)


def next_page_url(url: Column, name: str = "page", first: int = 2) -> Column:
    """The sequential next-page rebuild (F2/E12): current ``?page`` + 1,
    or ``first`` when the param is absent (page 1 is implicit on seed
    category URLs in the reference spiders). The page value comes from a
    crawled URL (untrusted): non-numeric or overflowing values restart
    at ``first`` instead of throwing under ANSI mode."""
    cur = get_query_param(url, name).try_cast("long")
    sane = cur.isNotNull() & (cur >= 0) & (cur < F.lit(1 << 31))
    nxt = F.when(sane, cur + 1).otherwise(F.lit(first))
    return with_query_param(url, name, nxt)


# a compact default public-suffix set for tests/sandbox runs; at scale
# callers pass the full Mozilla PSL (publicsuffix.org) — the algorithm
# (longest-suffix match, one extra label) is the PSL's normal rule
DEFAULT_PUBLIC_SUFFIXES = (
    "co.uk",
    "ac.uk",
    "com.au",
    "co.jp",
    "com",
    "org",
    "net",
    "io",
    "uk",
    "test",
)


def registrable_domain(
    host: Column, suffixes: tuple[str, ...] = DEFAULT_PUBLIC_SUFFIXES
) -> Column:
    """eTLD+1 of a hostname column (the public-suffix longest-match
    rule): the label immediately left of the longest matching public
    suffix, joined back to it — ``shop.books.co.uk -> books.co.uk``,
    ``a.b.example.com -> example.com``.

    Politeness at web scale groups budgets by REGISTRABLE domain, not
    hostname (ten thousand ``*.blogspot.com``-style subdomains of one
    operator must share one budget, while ``a.co.uk`` and ``b.co.uk``
    must not); feed this as the scheduler's domain key to get that.

    Pure fold over a broadcast-literal suffix array (row-local, zero
    shuffle, codegen). Hosts matching NO suffix — internal TLDs,
    IP-ish strings — return unchanged (conservative: distinct budget
    per host). A host that IS a bare public suffix also returns
    unchanged."""
    h = F.lower(host)
    best = F.aggregate(
        F.array(*[F.lit(s) for s in suffixes]),
        F.lit(""),
        lambda acc, s: F.when(
            ((h == s) | h.endswith(F.concat(F.lit("."), s)))
            & (F.length(s) > F.length(acc)),
            s,
        ).otherwise(acc),
    )
    prefix = F.substring(h, F.lit(1), F.length(h) - F.length(best) - 1)
    label = F.element_at(F.split(prefix, r"\."), -1)
    return F.when(
        (best == "") | (prefix == "") | (label == ""), h
    ).otherwise(F.concat(label, F.lit("."), best))


def mark_blocklisted(df: DataFrame, url_col: str, rules: DataFrame) -> DataFrame:
    """UT1-style URL blocklist flags (the adult/malware domain lists
    RefinedWeb/FineWeb-class pipelines apply before any content work;
    the reference has no analog — it crawls an allowlist of shops).

    ``rules`` is a tiny DataFrame ``(kind string, value string)`` with
    three rule kinds, mirroring how the UT1 lists are published:

    - ``host``   — exact hostname match,
    - ``domain`` — registrable-domain (eTLD+1) match: blocks every
      subdomain of one operator,
    - ``prefix`` — URL string prefix (a "urls" entry in UT1: one path
      subtree of an otherwise-fine host).

    Adds four columns: ``blocked_host`` / ``blocked_domain`` /
    ``blocked_prefix`` / ``blocked`` (the OR).  Rows whose URL has no
    parseable host get false flags (nothing to match on).

    Scale shape: the big side never shuffles — host and domain rules
    are broadcast equi-joins on derived key columns; prefix rules are
    grouped per host (one array row per host that has any) and
    broadcast-joined on the host key, then folded with ``exists``
    (row-local).  Blocklists are O(10^6) rows — broadcast range."""
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    rdom = registrable_domain(host)
    hosts = rules.filter(F.col("kind") == "host").select(
        F.lower("value").alias("_bl_h"), F.lit(True).alias("_hit_h")
    ).distinct()
    doms = rules.filter(F.col("kind") == "domain").select(
        F.lower("value").alias("_bl_d"), F.lit(True).alias("_hit_d")
    ).distinct()
    prefs = (
        rules.filter(F.col("kind") == "prefix")
        .select(F.col("value").alias("_p"), F.lower(F.try_parse_url(F.col("value"), F.lit("HOST"))).alias("_bl_p"))
        .groupBy("_bl_p")
        .agg(F.collect_set("_p").alias("_prefixes"))
    )
    out = (
        df.withColumn("_bl_host", host)
        .withColumn("_bl_rdom", rdom)
        .join(F.broadcast(hosts), F.col("_bl_host") == F.col("_bl_h"), "left")
        .join(F.broadcast(doms), F.col("_bl_rdom") == F.col("_bl_d"), "left")
        .join(F.broadcast(prefs), F.col("_bl_host") == F.col("_bl_p"), "left")
    )
    hit_p = F.exists("_prefixes", lambda p: F.col(url_col).startswith(p))
    return out.select(
        *df.columns,
        F.coalesce(F.col("_hit_h"), F.lit(False)).alias("blocked_host"),
        F.coalesce(F.col("_hit_d"), F.lit(False)).alias("blocked_domain"),
        F.coalesce(hit_p, F.lit(False)).alias("blocked_prefix"),
    ).withColumn(
        "blocked",
        F.col("blocked_host") | F.col("blocked_domain") | F.col("blocked_prefix"),
    )
