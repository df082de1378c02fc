"""URL-template mining + per-template frontier budgeting (trap rationing).

Crawler traps — calendars, session-id paths, faceted-search parameter
explosions — produce unbounded URL families that are indistinguishable
row-by-row (each URL is new to the seen set) but obvious in aggregate:
one *template* accounts for a runaway share of a domain's frontier.
The reference has no analog (its frontier is a hand-seeded category
list, so traps can't enter); at 10^10 discovered URLs template-level
accounting is how a frontier survives hostile link graphs.

Template = path with digit runs -> ``{d}`` and long hex runs (8+,
session ids / content hashes) -> ``{x}``, plus the SORTED query
parameter names (values dropped): ``/cal?d=9&m=2&y=2026`` and
``/cal?y=2024&m=12&d=1`` are the same family ``/cal?d&m&y``. All JVM
expressions (regexp_replace / split / array_sort) — codegen, no
Python.

Two operators:

- ``url_template_stats``: (domain, template, n_urls,
  domain_share_milli, over_cap) — the accounting view; feeds
  monitoring and the cap below.
- ``cap_frontier_by_template``: keep at most ``cap`` URLs per
  (domain, template), deterministically the lexicographically first
  (stable across runs/engines). Skew-safe by the same trick as the
  politeness scheduler's salted top-B (politeness/scheduler.py): a
  trap template with 10^8 members would make a single
  ``row_number`` partition a hot reducer, so phase 1 ranks within
  (template, salt) — any salt's local top-``cap`` is a superset of
  its members in the global top-``cap`` — and phase 2 ranks the
  <= n_salts x cap survivors exactly. Benign templates pay one extra
  narrow column; the trap pays two bounded passes instead of one
  unbounded sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_HEX_RUN = r"[0-9a-fA-F]{8,}"
_DIGIT_RUN = r"[0-9]+"


def url_template(url: Column) -> Column:
    """Template string for one URL column (see module doc). Hex runs
    collapse before digit runs (a hex run is also mostly digits);
    an empty path normalizes to ``/``; no query -> no ``?`` suffix."""
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    tpath = F.regexp_replace(
        F.regexp_replace(path, _HEX_RUN, "{x}"), _DIGIT_RUN, "{d}"
    )
    q = F.regexp_extract(url, _QUERY_RE, 1)
    names = F.array_sort(F.transform(F.split(q, "&"), lambda kv: F.split(kv, "=")[0]))
    return F.when(q == "", tpath).otherwise(
        F.concat(tpath, F.lit("?"), F.array_join(names, "&"))
    )


def url_template_stats(
    urls: DataFrame,
    cap: int = 100_000,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """(domain, template, n_urls, domain_share_milli, over_cap) per
    URL-template family. ``domain_share_milli`` is integer-exact
    (1000*n DIV total); ``over_cap`` is an INT flag (1 = the family
    exceeds ``cap`` and should be rationed). One groupBy shuffle on
    (domain, template) plus one tiny window over the aggregated rows
    (one row per template, not per URL)."""
    t = urls.select(
        F.col(domain_col).alias("domain"),
        url_template(F.col(url_col)).alias("template"),
    )
    agg = t.groupBy("domain", "template").agg(F.count("*").alias("n_urls"))
    agg = agg.withColumn(
        "_dom_total", F.sum("n_urls").over(Window.partitionBy("domain"))
    )
    return agg.select(
        "domain",
        "template",
        "n_urls",
        # integer DIV keeps the share engine-exact (no float rounding)
        F.expr("CAST((1000 * n_urls) DIV _dom_total AS INT)").alias("domain_share_milli"),
        (F.col("n_urls") > F.lit(cap)).cast("int").alias("over_cap"),
    )


def cap_frontier_by_template(
    urls: DataFrame,
    cap: int,
    url_col: str = "url",
    domain_col: str = "domain",
    n_salts: int = 16,
) -> DataFrame:
    """Input rows minus everything beyond the first ``cap`` URLs
    (lexicographic by ``url_col``) of each (domain, template) family —
    the frontier-shaping form of trap rationing. Deterministic and
    exactly equal to a single global rank; computed skew-safe in two
    bounded phases (module doc)."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    t = urls.withColumn("_tpl", url_template(F.col(url_col)))
    salt = F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_salts))
    w1 = Window.partitionBy(domain_col, "_tpl", "_salt").orderBy(url_col)
    w2 = Window.partitionBy(domain_col, "_tpl").orderBy(url_col)
    return (
        t.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= cap)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= cap)
        .drop("_tpl", "_salt", "_r1", "_r2")
    )
