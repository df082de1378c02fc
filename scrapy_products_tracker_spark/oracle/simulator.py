"""Pure-Python reference-semantics crawl oracle (no Spark).

Implements, row by row, the scheduling semantics the reference encodes
in SQL + queue config — FIFO-by-discovery claims (``ORDER BY id ASC
LIMIT chunk``, csv_category_producer.py:39-42), chunked release
(producer.py:29), per-domain budgets (settings.py:40-41), retry rules
(retry_middleware.py:29-38), upsert dedup (read_csv.py:66-70) — plus
the north-rule additions (robots prefixes, crawl-delay budget). The
Spark engine must reproduce this oracle's crawl order, seen set,
counters and items EXACTLY (tests/test_crawl_parity.py); SURVEY.md §8
hard part (a) defines parity at this level because Scrapy's intra-
process timing is nondeterministic.

Kept deliberately independent of the engine: plain dicts/lists/sorts,
only sharing the scalar canonicalizer and the seq encoding (the
contract both sides must agree on).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..crawl.parse import RANK_SHIFT, ROUND_SHIFT
from ..functions.urls import canonicalize_url, domain_of_str, path_of_str
from ..schemas import (
    ERROR,
    HARDWARE_ERROR,
    MAX_ATTEMPTS,
    PENDING,
    SKIPPED_ROBOTS,
    SUCCESS,
)

POS_MASK = (1 << RANK_SHIFT) - 1


def _seq(round_no: int, rank: int, pos: int) -> int:
    return (round_no << ROUND_SHIFT) | (rank << RANK_SHIFT) | pos


@dataclass
class SimResult:
    crawl_order: list = field(default_factory=list)  # (round, url, domain, rank)
    seen: dict = field(default_factory=dict)  # url -> row dict
    counters: dict = field(default_factory=dict)
    items: list = field(default_factory=list)  # (url, round, image_id, caption, position)
    rounds: int = 0
    session_last_round: dict = field(default_factory=dict)  # session -> last round

    def session_of_round(self, round_no: int) -> int:
        for s in sorted(self.session_last_round):
            if round_no <= self.session_last_round[s]:
                return s
        return max(self.session_last_round, default=1)


def simulate_crawl(
    world,
    chunk_size: int = 500,
    round_ms: int = 1000,
    pagination_size: int = 12,
    session: int = 1,
    max_rounds: int = 10_000,
    _res: SimResult | None = None,
    _start_round: int = 1,
) -> SimResult:
    pages = {r["url"]: r for _, r in world.pages.iterrows()}
    payload = {r["image_id"]: r for _, r in world.image_caption.iterrows()}
    robots = {r["domain"]: r for _, r in world.robots.iterrows()}

    def budget(domain: str) -> float:
        r = robots.get(domain)
        if r is None:
            return 8  # unmapped-domain default
        b = int(r["max_per_round"])
        delay = int(r["crawl_delay_ms"])
        if delay > 0:
            b = min(b, max(1, round_ms // delay))
        return b

    def blocked(url: str, domain: str) -> bool:
        r = robots.get(domain)
        if r is None:
            return False
        path = path_of_str(url)
        return any(path.startswith(p) for p in r["disallow_prefixes"])

    res = _res or SimResult(
        counters={
            "urls_seen": 0,
            "urls_fetched": 0,
            "urls_deduped": 0,
            "urls_skipped_robots": 0,
            "urls_failed_hw": 0,
            "urls_failed_logic": 0,
            "items_emitted": 0,
        }
    )
    seen = res.seen

    def insert(url, tier, priority, depth, seq, round_no, source):
        domain = domain_of_str(url)
        is_blocked = blocked(url, domain)
        seen[url] = {
            "url": url,
            "domain": domain,
            "tier": tier,
            "priority": priority,
            "depth": depth,
            "discovered_seq": seq,
            "discovered_round": round_no,
            "status": SKIPPED_ROBOTS if is_blocked else PENDING,
            "attempt": 0,
            "session": session,
            "source": source,
        }
        res.counters["urls_seen"] += 1
        if is_blocked:
            res.counters["urls_skipped_robots"] += 1

    # --- seeding (S1-S4): canonicalize, first-rank-wins dedup ------------
    if _res is None:
        for _, s in world.seeds.sort_values("seed_rank").iterrows():
            cu = canonicalize_url(s["url"])
            if cu is None or cu in seen:
                continue
            insert(cu, int(s["tier"]), 0, 0, _seq(0, 0, int(s["seed_rank"])), 0, "seed")

    # --- rounds -----------------------------------------------------------
    order_key = lambda r: (r["priority"], r["depth"], r["discovered_seq"])
    for round_no in range(_start_round, _start_round + max_rounds):
        pending = [r for r in seen.values() if r["status"] == PENDING]
        # per-domain budget (politeness), then global chunk (O1/P3)
        by_domain: dict[str, list] = {}
        for r in pending:
            by_domain.setdefault(r["domain"], []).append(r)
        claimable = []
        for d, rows in by_domain.items():
            rows.sort(key=order_key)
            claimable.extend(rows[: int(budget(d))])
        claimable.sort(key=order_key)
        claimed = claimable[:chunk_size]
        if not claimed:
            break
        res.rounds = round_no

        discovered_batch: dict[str, dict] = {}
        for rank, row in enumerate(claimed, start=1):
            res.crawl_order.append((round_no, row["url"], row["domain"], rank))
            page = pages.get(row["url"])
            # effective status (flaky 403 clears after flaky_until attempts)
            if page is None:
                eff = -1
            else:
                eff = int(page["status_code"])
                if (
                    eff == 403
                    and int(page["flaky_until"]) > 0
                    and row["attempt"] >= int(page["flaky_until"])
                ):
                    eff = 200
            if eff == 200:
                res.counters["urls_fetched"] += 1
                row["status"] = SUCCESS
                if int(page["tier"]) == 0:
                    n_out = len(page["outlinks"])
                    children = [
                        (pos, u, 1) for pos, u in enumerate(page["outlinks"])
                    ]
                    if page["next_url"] is not None and not _isnan(page["next_url"]):
                        children.append((n_out, page["next_url"], 0))
                    ti = page["total_items"]
                    if ti is not None and not _isnan(ti):
                        needed = math.ceil(float(ti) / pagination_size)
                        for p in range(2, needed + 1):
                            children.append((n_out + p - 2, f"{row['url']}?page={p}", 0))
                    for pos, cu_raw, tier in children:
                        cu = canonicalize_url(cu_raw)
                        if cu is None:
                            continue
                        seq = _seq(round_no, rank, pos)
                        if cu in seen or cu in discovered_batch:
                            res.counters["urls_deduped"] += 1
                            continue
                        discovered_batch[cu] = {
                            "tier": tier,
                            "depth": row["depth"] + 1,
                            "priority": row["priority"],
                            "seq": seq,
                        }
                else:  # tier 1: emit item (K1/K3)
                    iid = page["image_id"]
                    if iid is not None and iid in payload:
                        res.items.append(
                            (
                                row["url"],
                                round_no,
                                iid,
                                payload[iid]["caption"],
                                row["discovered_seq"] & POS_MASK,
                            )
                        )
                        res.counters["items_emitted"] += 1
            elif eff in (403, -1) and row["attempt"] + 1 < MAX_ATTEMPTS:
                row["attempt"] += 1
                row["status"] = PENDING  # re-claimed in a later round (X1/X2)
            elif eff == -1:
                row["attempt"] += 1
                row["status"] = HARDWARE_ERROR
                res.counters["urls_failed_hw"] += 1
            else:
                row["attempt"] += 1
                row["status"] = ERROR
                res.counters["urls_failed_logic"] += 1

        for cu, info in discovered_batch.items():
            insert(cu, info["tier"], info["priority"], info["depth"], info["seq"], round_no, "outlink")

    res.session_last_round[session] = res.rounds
    return res


def simulate_sessions(world, n_sessions: int = 2, **kw) -> SimResult:
    """O5 multi-epoch oracle: crawl, re-arm, re-crawl — mirroring
    CrawlDriver.rearm_session (terminal rows -> PENDING / attempt=0 /
    session=k; robots-skipped rows stay skipped; counters untouched by
    the re-arm itself). Round numbering continues across sessions like
    the engine's manifest round counter."""
    res = simulate_crawl(world, **kw)
    for s in range(2, n_sessions + 1):
        for row in res.seen.values():
            if row["status"] in (SUCCESS, ERROR, HARDWARE_ERROR):
                row["status"] = PENDING
                row["attempt"] = 0
                row["session"] = s
        res = simulate_crawl(
            world, session=s, _res=res, _start_round=res.rounds + 1, **kw
        )
    return res


def _isnan(x) -> bool:
    try:
        return math.isnan(float(x))
    except (TypeError, ValueError):
        return False
