"""Robots cache table: robots.txt parsing + normalization.

The reference never reads robots.txt (``ROBOTSTXT_OBEY`` is never set —
SURVEY.md §2.5 P5); the north rule requires a robots cache keyed by
domain with allow/disallow prefixes and crawl-delay. In production the
cache is itself crawled (one fetch per domain, refreshed on TTL):
``robots_from_bodies`` turns the fetched (domain, body) rows into the
cache table with an Arrow-batched kernel implementing the RFC 9309
subset the scheduler consumes (user-agent group selection with
longest-match precedence, Disallow prefixes, the de-facto Crawl-delay
extension). In this sandbox the table also ships pre-built with the
synthetic world; ``load_robots`` normalizes/validates either source.
Enforcement lives in scheduler.apply_robots (broadcast join, JVM-side
prefix test).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import ROBOTS_SCHEMA


def load_robots(spark, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    required = {f.name for f in ROBOTS_SCHEMA.fields} - {
        "disallow_regexes",
        "site",
        "sitemap_urls",
        "rules",
    }
    missing = required - set(df.columns)
    if missing:
        raise ValueError(f"robots table missing columns: {missing}")
    # disallow_regexes / site are optional in stored tables (pre-wildcard
    # and single-site worlds); absent -> empty / 'default'
    rx = (
        F.coalesce("disallow_regexes", F.array())
        if "disallow_regexes" in df.columns
        else F.array().cast("array<string>")
    )
    site = (
        F.coalesce("site", F.lit("default")) if "site" in df.columns else F.lit("default")
    )
    sm = (
        F.coalesce("sitemap_urls", F.array())
        if "sitemap_urls" in df.columns
        else F.array().cast("array<string>")
    )
    # full Allow+Disallow rule list — optional (pre-Allow tables have
    # only the conservative disallow columns); NULL rows keep NULL so
    # the scheduler can route them to the disallow-only fallback
    rules_t = ROBOTS_SCHEMA["rules"].dataType.simpleString()
    rules = (
        F.col("rules") if "rules" in df.columns else F.lit(None).cast(rules_t)
    )
    return df.select(
        "domain",
        F.coalesce("disallow_prefixes", F.array()).alias("disallow_prefixes"),
        rx.alias("disallow_regexes"),
        F.coalesce("crawl_delay_ms", F.lit(0)).alias("crawl_delay_ms"),
        F.coalesce("max_per_round", F.lit(8)).alias("max_per_round"),
        site.alias("site"),
        sm.alias("sitemap_urls"),
        rules.alias("rules"),
    )


def rule_to_regex(rule: str) -> str:
    """RFC 9309 §2.2.3 match pattern -> anchored-at-start Java regex:
    ``*`` matches any character sequence, a *trailing* ``$`` anchors the
    end (a ``$`` anywhere else is literal). The result is used with a
    find-style matcher (regexp_like), so no trailing ``$`` == prefix
    match."""
    anchored = rule.endswith("$")
    core = rule[:-1] if anchored else rule
    return "^" + ".*".join(re.escape(p) for p in core.split("*")) + ("$" if anchored else "")


def parse_robots_rules(
    body: str | None, agent: str = "sparkbot"
) -> tuple[list[dict], int]:
    """(rules, crawl_delay_ms) for ``agent`` from one robots.txt body —
    the full RFC 9309 subset. Each rule is a dict matching the
    ``ROBOTS_SCHEMA.rules`` struct: ``pat`` (original value), ``rx``
    (anchored Java regex for §2.2.3 ``*``/``$`` rules, None = literal
    prefix), ``spec`` (rule length in octets — the §2.2.2 longest-match
    key), ``allow`` (Allow vs Disallow).

    Group selection: groups whose ``User-agent`` token is the longest
    case-insensitive prefix of ``agent`` win; ``*`` is the fallback.
    ALL groups tied at the winning specificity contribute (RFC 9309
    §2.2.1 merges repeated groups for the same agent): their Disallow
    lists concatenate in document order and the largest Crawl-delay
    applies. Consecutive ``User-agent`` lines share one group.

    ``Allow:``/``Disallow:`` with an empty value are no-ops (dropped;
    an empty Disallow means allow-all per §2.2.2). ``Crawl-delay``
    (de-facto extension) is seconds, possibly fractional. Unparseable
    lines are ignored (robots.txt is untrusted remote content — never
    an exception path). An absent/empty body means allow-all, delay 0
    (RFC 9309 §2.3.1.4 fetch-failure rule).
    """
    if not body:
        return [], 0
    body = body.lstrip("\ufeff")  # UTF-8 BOM would mask the first User-agent line
    agent_l = agent.lower()
    # groups: list of (ua_tokens, rules=(allow, value), crawl_delay_s)
    groups: list[tuple[list[str], list[tuple[bool, str]], float | None]] = []
    cur_uas: list[str] = []
    in_group_body = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body or not groups:
                groups.append(([], [], None))
                cur_uas = groups[-1][0]
                in_group_body = False
            cur_uas.append(val.lower())
        elif key in ("disallow", "allow", "crawl-delay"):
            if not groups:
                continue  # directive before any user-agent line: ignore
            in_group_body = True
            uas, rls, delay = groups[-1]
            if key in ("disallow", "allow") and val:
                rls.append((key == "allow", val))
            elif key == "crawl-delay":
                try:
                    delay = float(val)
                except ValueError:
                    continue
                # hostile/garbage values: inf/nan/negative are ignored,
                # huge delays clamp to a day (never-raise contract)
                if delay == delay and 0 <= delay < float("inf"):
                    groups[-1] = (uas, rls, min(delay, 86_400.0))
    def group_score(uas: list[str]) -> int:
        score = -1
        for ua in uas:
            if ua == "*":
                score = max(score, 0)
            elif ua and agent_l.startswith(ua):
                score = max(score, len(ua))
        return score

    best = max((group_score(uas) for uas, _, _ in groups), default=-1)
    if best < 0:
        return [], 0
    # merge every group tied at the winning specificity, document order
    merged: list[tuple[bool, str]] = []
    delay_s = 0.0
    for uas, rls, delay in groups:
        if group_score(uas) == best:
            merged.extend(rls)
            if delay is not None:
                delay_s = max(delay_s, delay)
    rules = [
        {
            "pat": v,
            "rx": rule_to_regex(v) if ("*" in v or v.endswith("$")) else None,
            "spec": len(v),
            "allow": allow,
        }
        for allow, v in merged
    ]
    return rules, int(round(delay_s * 1000))


def parse_robots_body(
    body: str | None, agent: str = "sparkbot"
) -> tuple[list[str], list[str], int]:
    """(disallow_prefixes, disallow_regexes, crawl_delay_ms) — the
    conservative disallow-only projection of ``parse_robots_rules``
    (Allow lines dropped: over-blocking only, never under-blocking).
    Kept for stored tables / callers that predate the full rule list;
    the scheduler prefers the ``rules`` column when present (RFC 9309
    §2.2.2 longest-match with allow-wins-ties)."""
    rules, delay_ms = parse_robots_rules(body, agent)
    dis = [r for r in rules if not r["allow"]]
    prefixes = [r["pat"] for r in dis if r["rx"] is None]
    regexes = [r["rx"] for r in dis if r["rx"] is not None]
    return prefixes, regexes, delay_ms


def sitemap_lines(body: str | None) -> list[str]:
    """RFC 9309 §2.3 ``Sitemap:`` directives from one robots.txt body —
    GLOBAL lines (they apply regardless of user-agent group, so no
    group selection), document order, duplicates removed. Values must
    be absolute http(s) URLs per the sitemaps.org protocol; anything
    else (relative paths, garbage) is dropped — robots.txt is untrusted
    remote content, never an exception path. Feed the result to the
    fetcher and ``crawl.sitemap.parse_sitemap_entries``."""
    if not body:
        return []
    out: list[str] = []
    seen: set[str] = set()
    for raw in body.lstrip("\ufeff").splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() != "sitemap":
            continue
        val = val.strip()
        if re.match(r"^https?://", val, re.IGNORECASE) and val not in seen:
            seen.add(val)
            out.append(val)
    return out


def robots_from_bodies(
    bodies: DataFrame, agent: str = "sparkbot", default_max_per_round: int = 8
) -> DataFrame:
    """(domain, body) rows -> the ROBOTS_SCHEMA cache table, parsed in
    Arrow batches (one tiny row per domain; the output is the broadcast
    side of the scheduler's robots join, never large)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for dom, body in zip(pdf["domain"], pdf["body"]):
                rules, delay_ms = parse_robots_rules(body, agent)
                dis = [r for r in rules if not r["allow"]]
                rows.append(
                    (
                        dom,
                        [r["pat"] for r in dis if r["rx"] is None],
                        [r["rx"] for r in dis if r["rx"] is not None],
                        delay_ms,
                        default_max_per_round,
                        "default",
                        sitemap_lines(body),
                        rules,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "domain",
                    "disallow_prefixes",
                    "disallow_regexes",
                    "crawl_delay_ms",
                    "max_per_round",
                    "site",
                    "sitemap_urls",
                    "rules",
                ],
            )

    return bodies.select("domain", "body").mapInPandas(_kernel, ROBOTS_SCHEMA)
