"""Crawl round loop: claim -> fetch -> parse -> dedup -> merge -> commit.

One round is the Spark expression of the reference's full message cycle
(SURVEY.md §3.4): producer claims a chunk (producer.py:196-211), spiders
fetch/parse, result consumers upsert discoveries
(category_result_consumer.py:38-52), reply consumers write statuses
(category_reply_consumer.py:27-47), all made durable by queue acks —
here by one atomic snapshot commit per round. Crash recovery is the
reference's nack-redelivery semantic for free: a round that never
committed leaves the frontier unchanged, so its rows are re-claimed
identically on resume (X4/X5).

Scale shape of one round (every step bounded by the chunk, never the
frontier):
- claim: frontier scan filtered to PENDING (columnar, narrow columns),
  salted per-domain top-k, global top-``chunk``;
- dedup: parquet-backed seen-table probe (bucket-co-partitioned
  cogroup, dedup/seen_table.py), then an exact anti-join keyed on
  ``url_hash`` against ONLY the candidates' hash buckets of the
  frontier (store.read_frontier_buckets);
- commit: dirty-bucket frontier rewrite + dirty-shard seen-set delta —
  both bounded by the round's updates/inserts (store.py).
The driver holds plans, counters, and the manifest; no shard payload,
frontier slice, or URL list is ever materialized driver-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..dedup.exact import anti_join_on_hash
from ..dedup.seen_table import BloomTable, CuckooTable
from ..fetchers.synthetic import (
    FAIL_HW,
    FAIL_LOGIC,
    OK,
    RETRY,
    classify_fetch,
    fetch_payloads,
    resolve_pages,
    with_simulated_latency,
)
from ..frontier.store import frontier_bucket_col
from ..functions.hashing import url_hash_col
from ..functions.urls import canonicalize_udf, domain_of
from ..politeness.scheduler import (
    CLAIM_ORDER,
    aged_priority_col,
    mark_robots,
    max_effective_budget,
    schedule_round,
)
from ..schemas import ERROR, HARDWARE_ERROR, PENDING, SKIPPED_ROBOTS, SUCCESS
from ..synth.world import PAGINATION_SIZE
from .parse import discover_children, encode_seq, position_of

COUNTER_KEYS = [
    "urls_seen",
    "urls_fetched",
    "urls_deduped",
    "urls_skipped_robots",
    "urls_failed_hw",
    "urls_failed_logic",
    "items_emitted",
]


@dataclass
class CrawlConfig:
    chunk_size: int = 500  # reference pm2 production chunk (pm2.config.js)
    n_salts: int = 8
    # partitions for the post-claim fetch/parse/decode stages. The claim
    # itself ends in a single-partition top-k (TakeOrderedAndProject +
    # rank window over <= chunk_size rows); without an explicit
    # repartition every downstream stage would inherit that single
    # partition and run serially. 0 = spark.sparkContext.defaultParallelism.
    fetch_partitions: int = 0
    round_ms: int = 1000
    session: int = 1
    pagination_size: int = PAGINATION_SIZE
    bloom_buckets: int = 32  # power of two
    bloom_bits_per_bucket: int = 1 << 20
    bloom_k: int = 5
    max_rounds: int = 10_000
    reencode_payload: bool = True
    # resolve transient failures (403/timeout) by re-fetching INSIDE the
    # round's plan (unrolled to MAX_ATTEMPTS) instead of re-claiming in
    # later rounds. This is the reference's retry-middleware semantic
    # (middlewares/retry_middleware.py:29-38 re-schedules the copied
    # request in the SAME crawl immediately); the re-claim-next-round
    # model matches its reply-consumer path (status reset -> later
    # producer cycle). Parity fixtures use the re-claim model (off);
    # the throughput bench turns it on to avoid near-empty retry-tail
    # rounds that cost a full round's fixed overhead for a few URLs.
    inline_retries: bool = False
    # multiply the synthetic world's per-page latency_ms into real wall
    # time inside the fetch stage (one serial connection per core) —
    # models a fetch-bound crawl for the scaling benchmark; 0 = off
    simulate_latency_scale: float = 0.0
    # URL-seen pre-filter: "bloom" (default; union-mergeable, no
    # deletion) or "cuckoo" (supports deletion — the right choice when
    # snapshot rollbacks must also retract seen-set entries, O5/O6).
    # Both are exact end-to-end: the filter only pre-screens, and the
    # anti-join confirms every maybe-seen candidate.
    seen_filter: str = "bloom"
    cuckoo_capacity: int = 1 << 20  # keys the cuckoo table is sized for
    cuckoo_shards: int = 16  # power of two
    # fetch-layer proxy config (T1/T2): list of proxy URLs + rotation
    # mode ("in_order" | "randomize"); empty = direct connections
    proxies: tuple = ()
    proxy_mode: str = "in_order"
    # bucket-prune the exact-confirm anti-join's frontier read once the
    # seen-set exceeds this many URLs. Below it, scanning all (url_hash,
    # url) keys is cheaper than the extra candidate-bucket collect
    # round-trip; above it (the 10^10 regime) the pruned read is what
    # keeps the confirm sub-linear in frontier size. 0 = always prune.
    confirm_prune_threshold: int = 1_000_000
    # skip frontier buckets with zero PENDING rows at claim time, using
    # per-bucket pending counts maintained exactly in the manifest
    # (updated from the same stats job that tracks dirty buckets). Late
    # in a crawl most buckets are fully terminal; at 10^10 rows the
    # claim scan then touches only the live slice. Provably invisible:
    # skipped buckets contain no claimable row (equivalence-tested).
    claim_bucket_pruning: bool = True
    # record the discovered link graph: one append-only
    # (src_url_hash, dst_url_hash, round) table per round (store.
    # read_link_edges), distinct per round, 17-byte rows — the input
    # of jobs/rank_job.py's PageRank/HITS frontier re-prioritization.
    # Edges to already-seen URLs are recorded too (later backlinks add
    # rank mass); only the frontier INSERT dedups. Off by default
    # (parity fixtures carry no edge table).
    record_link_edges: bool = False
    # redirect following (fetchers/synthetic.follow_redirects):
    # Scrapy's RedirectMiddleware semantic — 3xx chains resolve to
    # their landing page inside the fetch, bounded by this many hops;
    # a chain/loop still unresolved after the budget lands on a 3xx
    # row and classifies FAIL_LOGIC/ERROR (the reference's
    # max-redirections-reached NACK, tests/rmq_new_tests/
    # test_max_redirections_reached_nacked.py). None = off (parity
    # default; also off when the page table has no redirect_to
    # column). Claimed rows keep their CLAIM url for lineage/dedup
    # (request-url semantics); final_url rides along in fx.
    max_redirect_times: int | None = None
    # starvation-free claim aging (politeness/scheduler.
    # aged_priority_col): effective priority improves by this many
    # milli-levels per waited round, applied scale-and-restore around
    # the claim (children always inherit BASE priority through parse
    # lineage). 0 = off (parity default — the fixtures pin pure
    # (priority, depth, seq) claim order). On an importance-fed
    # 10^10-URL frontier this bounds every URL's wait to
    # Δpriority*1000/rate rounds instead of forever.
    aging_milli_per_round: int = 0
    # adaptive politeness (politeness/adaptive.py): one AIMD budget step
    # per round from fetch outcomes. Opt-in — the parity fixtures pin
    # the reference's STATIC budgets; turning this on legitimately
    # changes claim counts (budgets grow on clean rounds).
    adaptive_budgets: bool = False
    adaptive_distress_milli: int = 200
    adaptive_increase: int = 2
    adaptive_min_budget: int = 1
    # auto-maintenance (frontier/store.rebucket_frontier): after a
    # round's commit, double the frontier bucket count whenever any
    # bucket's PENDING count exceeds this threshold — the epoch-
    # doubling growth policy, inline. Opt-in; invisible to crawl
    # semantics (tests/test_maintenance.py). At 10^10 scale pick
    # threshold ~= target bucket row count (e.g. 10^7).
    auto_rebucket_pending: int | None = None
    auto_rebucket_max_buckets: int = 1 << 20
    # robots freshness (P5 at 10^10 scale: politeness inputs must not
    # go stale over a weeks-long crawl). Every N rounds the driver
    # re-fetches robots.txt bodies through its robots_bodies_source
    # seam, re-parses the cache, and re-tags claimable frontier rows
    # against the NEW rules (PENDING <-> SKIPPED_ROBOTS both ways).
    # None = static cache for the whole session (parity default — the
    # fixtures pin static robots).
    robots_max_age_rounds: int | None = None
    # politeness grouping key: "netloc" (reference parity — the
    # per-domain queues of settings.py:79-81 are host-keyed) or
    # "registrable" (eTLD+1 rollup, functions/urls.registrable_domain):
    # all subdomains of one operator share ONE budget — the min
    # effective budget over member hosts (politeness/scheduler.
    # rollup_budgets) — so a subdomain swarm cannot multiply its crawl
    # rate at 10^10 scale. Robots RULE matching stays host-scoped
    # either way (RFC 9309 is per-origin).
    politeness_key: str = "netloc"
    extra_meta: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.politeness_key not in ("netloc", "registrable"):
            raise ValueError("politeness_key must be 'netloc' or 'registrable'")


class CrawlDriver:
    def __init__(
        self,
        spark: SparkSession,
        store,
        pages: DataFrame,
        image_caption: DataFrame,
        robots: DataFrame,
        config: CrawlConfig | None = None,
        endpoints: DataFrame | None = None,
        robots_bodies_source=None,
        fetch_fn=None,
    ):
        self.spark = spark
        self.store = store
        self.pages = pages
        self.image_caption = image_caption
        self.robots = robots
        # F3 chained sub-endpoint responses (url, endpoint, payload);
        # None = no chained domains in this world
        self.endpoints = endpoints
        # robots freshness seam: callable (spark, round_no) ->
        # (domain, body) DataFrame of freshly fetched robots.txt bodies
        # — in production this is the tier-0 robots.txt fetch through
        # the same fetch stack as pages; required when
        # cfg.robots_max_age_rounds is set
        self.robots_bodies_source = robots_bodies_source
        # round of the last robots fetch (the initial cache counts as
        # round 0); a resumed driver re-fetches on its first stale
        # round, which is idempotent
        self._robots_round = 0
        # fetch seam: callable (claimed DataFrame, round_no) -> fx
        # DataFrame with the resolve+classify contract (claimed columns
        # + page envelope + eff_status/outcome, attempt rewritten).
        # None = resolve against the synthetic pages table; the
        # real-socket fetcher is fetchers.http.fetch_http. With a
        # fetch_fn, `pages` may be None — the driver never reads it.
        self.fetch_fn = fetch_fn
        self.cfg = config or CrawlConfig()
        # robots is static for a session: derive the scalar phase-1
        # budget cap once (ONE one-row agg). No per-domain driver state:
        # phase 1 of the scheduler only needs an upper bound on any
        # domain's budget, and phase 2's broadcast join enforces the
        # exact per-domain cap — so a 10^7-domain robots table never
        # materializes anywhere off the executors.
        self._max_budget = max_effective_budget(robots, self.cfg.round_ms)
        # registrable-key mode: rolled-up (eTLD+1, min-budget) table,
        # derived lazily per robots set (invalidated wherever
        # _max_budget is recomputed). Budget-table-sized; broadcast by
        # the scheduler — never a driver dict.
        self._pkey_budgets = None

    def _politeness_budgets(self):
        if self._pkey_budgets is None:
            from ..politeness.scheduler import rollup_budgets

            self._pkey_budgets = rollup_budgets(self.robots, self.cfg.round_ms)
        return self._pkey_budgets

    # ------------------------------------------------------------------
    def _frontier_row_select(self, df: DataFrame, *, status_col, source: str, round_no: int):
        url_hash = (
            F.col("url_hash") if "url_hash" in df.columns else url_hash_col(F.col("url"))
        )
        return df.select(
            "url",
            url_hash.alias("url_hash"),
            domain_of(F.col("url")).alias("domain"),
            F.col("tier").cast("int"),
            F.col("priority").cast("int"),
            F.col("depth").cast("int"),
            F.col("discovered_seq").cast("long"),
            F.lit(round_no).cast("int").alias("discovered_round"),
            status_col.cast("int").alias("status"),
            F.lit(0).alias("attempt"),
            F.lit(self.cfg.session).alias("session"),
            F.lit(source).alias("source"),
        )

    def _robots_status(self, df: DataFrame) -> DataFrame:
        """Tag rows PENDING or SKIPPED_ROBOTS at insert time (P5): the
        reference would enqueue and crawl them; the north rule counts
        and never fetches them. Single-pass mark (no branch-and-union:
        that would execute the upstream dedup subtree twice per job)."""
        marked = mark_robots(df.withColumn("domain", domain_of(F.col("url"))), self.robots)
        return marked.withColumn(
            "_st",
            F.when(F.col("_robots_blocked"), F.lit(SKIPPED_ROBOTS)).otherwise(F.lit(PENDING)),
        ).drop("_robots_blocked")

    # --- seen-filter plumbing (bloom default, cuckoo fallback) ---------
    def _seen_build_spec(self, frontier: DataFrame) -> tuple[str, dict, DataFrame]:
        """(kind, params, shards_df) for the initial seen-table build —
        a distributed applyInPandas whose output the store writes as
        the parquet shard table (nothing collected)."""
        if self.cfg.seen_filter == "cuckoo":
            params = CuckooTable.params_for_capacity(
                self.cfg.cuckoo_capacity, self.cfg.cuckoo_shards
            )
            df = CuckooTable.build_shards_df(
                frontier, "url", params["n_shards"], params["n_buckets"]
            )
            return "cuckoo", params, df
        params = {
            "n_buckets": self.cfg.bloom_buckets,
            "bits": self.cfg.bloom_bits_per_bucket,
            "k": self.cfg.bloom_k,
        }
        df = BloomTable.build_shards_df(
            frontier, "url", params["n_buckets"], params["bits"], params["k"]
        )
        return "bloom", params, df

    def seed(self, seeds: DataFrame) -> int:
        """Ingest the seed list (S1-S4): canonicalize, dedup, robots-tag,
        commit frontier v1. Idempotent re-seeding = re-running produces
        the same v1 (reference: upsert with status reset, read_csv.py)."""
        canon = (
            seeds.withColumn("url", canonicalize_udf(F.col("url")))
            .filter(F.col("url").isNotNull())
            .withColumn("priority", F.lit(0))
            .withColumn("depth", F.lit(0))
            .withColumn(
                "discovered_seq", encode_seq(F.lit(0), F.lit(0), F.col("seed_rank"))
            )
        )
        w = Window.partitionBy("url").orderBy("discovered_seq")
        canon = canon.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        tagged = self._robots_status(canon)
        frontier = self._frontier_row_select(
            tagged, status_col=F.col("_st"), source="seed", round_no=0
        )
        # one job for all tallies, grouped by frontier bucket so the
        # per-bucket PENDING counts (claim-scan pruning) start exact
        B = self.store.n_frontier_buckets
        rows = (
            frontier.groupBy(frontier_bucket_col(F.col("url_hash"), B).alias("fb"))
            .agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("status") == SKIPPED_ROBOTS, 1).otherwise(0)).alias(
                    "n_skip"
                ),
            )
            .collect()
        )
        counters = dict.fromkeys(COUNTER_KEYS, 0)
        counters["urls_skipped_robots"] = int(sum(r["n_skip"] or 0 for r in rows))
        counters["urls_seen"] = int(sum(r["n"] for r in rows))
        pending_per_bucket = {
            str(r["fb"]): int(r["n"] - (r["n_skip"] or 0)) for r in rows
        }
        return self.store.commit(
            frontier,
            seen_build=self._seen_build_spec(frontier),
            meta={
                "round": 0,
                "session": self.cfg.session,
                "counters": counters,
                "lineage": {},
                "pending_hint": counters["urls_seen"] - counters["urls_skipped_robots"],
                "pending_per_bucket": pending_per_bucket,
                **self.cfg.extra_meta,
            },
        )

    # ------------------------------------------------------------------
    def refresh_robots(self, bodies: DataFrame) -> dict:
        """P5 freshness: re-parse freshly fetched robots.txt bodies,
        swap the in-session cache, and re-tag claimable frontier rows
        (PENDING <-> SKIPPED_ROBOTS, both directions) so a rule flip
        changes scheduling from the next claim on.

        Merge semantics: rule columns (prefixes / regexes / crawl-delay
        / sitemaps / the full RFC 9309 rule list) come from the FRESH
        parse for every re-fetched domain; operational columns
        (``max_per_round`` — which carries AIMD adaptive-budget state —
        and the ``site`` parser key) stay from the old table, so a
        robots re-fetch never resets adaptive budgets or parser
        routing. Domains absent from the fresh fetch keep their old
        rules (their TTL has not expired at the fetch layer); brand-new
        domains enter with the parse defaults.

        Why a full-frontier rewrite and not the dirty-bucket delta:
        frontier buckets key on url_hash, so one flipped domain's rows
        spread uniformly over ALL buckets — a delta would dirty every
        bucket anyway AND broadcast an unbounded update set (a
        mega-domain flipping = millions of rows on the broadcast side
        of merge_status_updates). The map-shaped rewrite touches each
        row exactly once (broadcast join against the tiny robots table,
        no shuffle beyond the bucket-partitioned write), costs
        O(frontier) per refresh, and amortizes over
        ``cfg.robots_max_age_rounds`` rounds of crawling. When nothing
        flips, no snapshot is committed at all — the cache swap is
        driver-side only.

        Reference analog: none (``ROBOTSTXT_OBEY`` is never set —
        SURVEY §2.5 P5); this is the north rule's robots cache kept
        current over a weeks-long 10^10-URL crawl.
        """
        from ..politeness.robots import robots_from_bodies

        manifest = self.store.read_manifest()
        if manifest is None:
            raise RuntimeError("seed() first")
        fresh = robots_from_bodies(bodies)
        old = self.robots
        rules_t = "array<struct<pat:string,rx:string,spec:int,allow:boolean>>"
        for c, t in (
            ("disallow_regexes", "array<string>"),
            ("site", "string"),
            ("sitemap_urls", "array<string>"),
            ("rules", rules_t),
        ):
            if c not in old.columns:
                old = old.withColumn(c, F.lit(None).cast(t))
        rule_cols = (
            "disallow_prefixes",
            "disallow_regexes",
            "crawl_delay_ms",
            "sitemap_urls",
            "rules",
        )
        keep_cols = ("max_per_round", "site")
        extra = [
            c
            for c in old.columns
            if c != "domain" and c not in rule_cols and c not in keep_cols
        ]
        f = fresh.select(
            "domain", *[F.col(c).alias(f"_f_{c}") for c in (*rule_cols, *keep_cols)]
        )
        merged = old.join(f, "domain", "full_outer").select(
            "domain",
            *[F.coalesce(F.col(f"_f_{c}"), F.col(c)).alias(c) for c in rule_cols],
            *[F.coalesce(F.col(c), F.col(f"_f_{c}")).alias(c) for c in keep_cols],
            *extra,
        )
        # tiny (one row per domain) table: checkpoint so repeated
        # refreshes never grow the broadcast side's plan (the same
        # iterative-plan discipline as the AIMD step)
        self.robots = merged.localCheckpoint()
        self._max_budget = max_effective_budget(self.robots, self.cfg.round_ms)
        self._pkey_budgets = None  # rolled budgets follow the new rules

        # re-tag claimable rows against the NEW rules; terminal rows
        # (SUCCESS/ERROR/...) are history and never change status
        fr = self.store.read_frontier(self.spark)
        claimable = F.col("status").isin(PENDING, SKIPPED_ROBOTS)
        marked = mark_robots(fr, self.robots)
        retagged = marked.withColumn(
            "_new_status",
            F.when(~claimable, F.col("status"))
            .when(F.col("_robots_blocked"), F.lit(SKIPPED_ROBOTS))
            .otherwise(F.lit(PENDING)),
        ).drop("_robots_blocked")
        B = self.store.frontier_n_buckets() or self.store.n_frontier_buckets
        rows = (
            retagged.groupBy(frontier_bucket_col(F.col("url_hash"), B).alias("fb"))
            .agg(
                F.sum((F.col("_new_status") == PENDING).cast("long")).alias("n_pend"),
                F.sum(
                    (
                        (F.col("status") == PENDING)
                        & (F.col("_new_status") == SKIPPED_ROBOTS)
                    ).cast("long")
                ).alias("n_skip"),
                F.sum(
                    (
                        (F.col("status") == SKIPPED_ROBOTS)
                        & (F.col("_new_status") == PENDING)
                    ).cast("long")
                ).alias("n_unskip"),
            )
            .collect()
        )
        n_to_skip = int(sum(r["n_skip"] or 0 for r in rows))
        n_to_pend = int(sum(r["n_unskip"] or 0 for r in rows))
        info = {"flipped_to_skipped": n_to_skip, "flipped_to_pending": n_to_pend}
        if n_to_skip == 0 and n_to_pend == 0:
            return info  # rules unchanged for every claimable row

        new_fr = retagged.withColumn("status", F.col("_new_status")).drop("_new_status")
        counters = dict(manifest["meta"]["counters"])
        counters["urls_skipped_robots"] = max(
            0, counters["urls_skipped_robots"] + n_to_skip - n_to_pend
        )
        self.store.commit(
            new_fr,
            meta={
                "counters": counters,
                # exact recount — the flip supersedes the incremental hint
                "pending_hint": int(sum(r["n_pend"] or 0 for r in rows)),
                "pending_per_bucket": {
                    str(r["fb"]): int(r["n_pend"] or 0) for r in rows
                },
                "robots_refresh": info,
            },
            expected_version=manifest["version"],
        )
        return info

    # ------------------------------------------------------------------
    def run_round(self) -> dict | None:
        """Execute one scheduling round; returns round meta, or None when
        no claimable work remains (frontier drained).

        Job economy: one round costs one *stats* job (a union of tagged
        1-column projections over the persisted claim/fetch/expand/item
        frames, aggregated in a single pass — replaces six separate
        count()/collect() actions), one tiny bucket-id collect for the
        anti-join pruning, plus the snapshot writes (dirty buckets/
        shards only). At 10^10-URL scale the per-round fixed cost is
        what bounds scheduler throughput, so the loop is designed
        around action count, not row count.
        """
        manifest = self.store.read_manifest()
        if manifest is None:
            raise RuntimeError("seed() first")
        round_no = manifest["meta"]["round"] + 1
        # robots freshness (P5): when the cache is older than max-age,
        # re-fetch bodies through the source seam, re-parse, and re-tag
        # claimable rows BEFORE this round claims anything — the flip
        # changes scheduling from this round on
        if (
            self.cfg.robots_max_age_rounds
            and self.robots_bodies_source is not None
            and round_no - self._robots_round >= self.cfg.robots_max_age_rounds
        ):
            self.refresh_robots(self.robots_bodies_source(self.spark, round_no))
            self._robots_round = round_no
            manifest = self.store.read_manifest()  # refresh may have committed
        counters = dict(manifest["meta"]["counters"])
        seen = self.store.read_seen(self.spark)

        frontier = self.store.read_frontier(self.spark)
        # claim-scan pruning: skip buckets with zero PENDING rows (counts
        # maintained exactly below; None = unknown -> full scan)
        ppb = manifest["meta"].get("pending_per_bucket")
        if self.cfg.claim_bucket_pruning and ppb is not None:
            live = [int(b) for b, v in ppb.items() if v > 0]
            claim_scan = self.store.read_frontier_buckets(self.spark, live)
        else:
            claim_scan = frontier
        pending = claim_scan.filter(F.col("status") == PENDING)
        _narrow_cols = [
            "url", "url_hash", "domain", "tier", "priority", "depth", "discovered_seq", "attempt"
        ]
        if self.cfg.aging_milli_per_round:
            # scale-and-restore: the aged value is what schedule_round
            # sorts on; _base_priority rides along and is restored after
            # the claim so lineage inheritance sees base units
            narrow = (
                pending.select(
                    *_narrow_cols,
                    F.col("priority").alias("_base_priority"),
                    "discovered_round",
                )
                .withColumn(
                    "priority",
                    aged_priority_col(round_no, self.cfg.aging_milli_per_round),
                )
                .drop("discovered_round")
            )
        else:
            narrow = pending.select(*_narrow_cols)
        # upper bound on PENDING rows, maintained incrementally in the
        # manifest meta (seed sets it; each round subtracts terminal
        # resolutions and adds pending inserts; rearm_session resets it
        # to the re-armed count — so large re-crawl sessions still take
        # the salted hot-domain path). None = unknown -> salted path.
        pending_hint = manifest["meta"].get("pending_hint")
        claim_kw = {}
        if self.cfg.politeness_key == "registrable":
            from ..functions.urls import registrable_domain

            narrow = narrow.withColumn(
                "_pkey", registrable_domain(F.col("domain"))
            )
            claim_kw = {"key_col": "_pkey", "budgets": self._politeness_budgets()}
        claimed = schedule_round(
            narrow,
            self.robots,
            self.cfg.chunk_size,
            self.cfg.n_salts,
            self.cfg.round_ms,
            max_budget=self._max_budget,
            pending_hint=pending_hint,
            **claim_kw,
        )
        if claim_kw:
            claimed = claimed.drop("_pkey")
        if self.cfg.aging_milli_per_round:
            claimed = claimed.withColumn(
                "priority", F.col("_base_priority").cast("int")
            ).drop("_base_priority")
        # spread the claimed batch back across the cluster: the claim's
        # final top-k is single-partition, and fetch/parse/decode must
        # not inherit that (hash on url_hash keeps domains mixed, which
        # is what we want for fetch parallelism — politeness was already
        # enforced at claim time)
        n_fetch_parts = self.cfg.fetch_partitions or self.spark.sparkContext.defaultParallelism
        claimed = claimed.repartition(n_fetch_parts, F.col("url_hash"))
        if self.cfg.proxies:  # T1/T2: per-request proxy + auth header
            from ..fetchers.proxy import with_proxy

            claimed = with_proxy(claimed, list(self.cfg.proxies), self.cfg.proxy_mode)

        # fetch + classify (S6/S7, X1-X3); fx carries every claimed row.
        # inline_retries resolves transient failures inside the fetch
        # call (fetch-layer retry, see classify_fetch) — no RETRY rows,
        # no near-empty retry-tail rounds.
        if self.fetch_fn is not None:
            fx = self.fetch_fn(claimed, round_no).persist()
        else:
            to_fetch = claimed
            follow = (
                self.cfg.max_redirect_times is not None
                and "redirect_to" in self.pages.columns
            )
            if follow:
                from ..fetchers.synthetic import follow_redirects

                reds = self.pages.filter(
                    F.col("redirect_to").isNotNull()
                ).select("url", "redirect_to")
                to_fetch = (
                    follow_redirects(claimed, reds, self.cfg.max_redirect_times)
                    .withColumn("_claim_url", F.col("url"))
                    .withColumn("url", F.col("final_url"))
                )
            resolved = resolve_pages(to_fetch, self.pages)
            if self.cfg.simulate_latency_scale > 0:
                resolved = with_simulated_latency(resolved, self.cfg.simulate_latency_scale)
            fx = classify_fetch(resolved, inline_retries=self.cfg.inline_retries)
            if follow:
                # exceeded chains landed on a 3xx row -> classify_fetch
                # already produced the FAIL_LOGIC/ERROR class; restore
                # the claim url for lineage/dedup/MERGE identity
                fx = fx.withColumn("url", F.col("_claim_url")).drop("_claim_url")
            fx = fx.persist()
        cached: list[DataFrame] = [fx]

        # --- frontier expansion (F1-F5) --------------------------------
        ok_t0 = fx.filter((F.col("outcome") == OK) & (F.col("tier") == 0))
        children_raw = (
            discover_children(ok_t0, round_no, self.cfg.pagination_size)
            .withColumn("url", canonicalize_udf(F.col("url")))
            .filter(F.col("url").isNotNull())
            .persist()
        )
        link_edges = None
        if self.cfg.record_link_edges:
            link_edges = (
                children_raw.select(
                    url_hash_col(F.col("parent_url")).alias("src_url_hash"),
                    url_hash_col(F.col("url")).alias("dst_url_hash"),
                )
                .distinct()
                .withColumn("round", F.lit(round_no))
            )
        # within-batch first-discovery-wins (D2)
        w = Window.partitionBy("url").orderBy("discovered_seq")
        children = (
            children_raw.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("url_hash", url_hash_col(F.col("url")))
        )
        # against-frontier dedup (D1): seen-table pre-filter (cogroup
        # probe over the parquet shards) + exact anti-join confirm on
        # url_hash, probing ONLY the candidates' hash buckets of the
        # frontier store (partition pruning; at 10^10 rows the pruned
        # read is what keeps the confirm sub-linear in frontier size)
        if seen is not None:
            # probe once, filter twice (a probe per branch would run the
            # canonicalize+window subtree and the probe kernel 2x)
            probed = seen.mark(children).persist()
            cached.append(probed)
            unseen = probed.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
            maybe = probed.filter(F.col("_maybe_seen")).drop("_maybe_seen")
            n_buckets = self.store.frontier_n_buckets()
            if n_buckets and counters["urls_seen"] >= self.cfg.confirm_prune_threshold:
                cand_buckets = [
                    r["fb"]
                    for r in maybe.select(
                        frontier_bucket_col(F.col("url_hash"), n_buckets).alias("fb")
                    )
                    .distinct()
                    .collect()
                ]
                confirm_keys = self.store.read_frontier_buckets(self.spark, cand_buckets)
            else:
                confirm_keys = frontier
            rescued = anti_join_on_hash(maybe, confirm_keys.select("url_hash", "url"))
            new_urls = unseen.unionByName(rescued)
        else:
            new_urls = anti_join_on_hash(children, frontier.select("url_hash", "url"))
        tagged = self._robots_status(new_urls)
        inserts = self._frontier_row_select(
            tagged, status_col=F.col("_st"), source="outlink", round_no=round_no
        ).persist()
        cached.append(inserts)

        # --- items (K1/K3/K6): payload join + decode, late and narrow ---
        ok_t1 = fx.filter((F.col("outcome") == OK) & (F.col("tier") == 1)).withColumn(
            "position", position_of(F.col("discovered_seq"))
        )
        items = fetch_payloads(
            ok_t1, self.image_caption, round_no, self.cfg.reencode_payload
        ).persist()
        cached.append(items)

        # --- product-field extraction (E3-E12) + targets/history (K4/K6)
        # when the fetch layer returns raw bodies: parse inside Arrow
        # batches, upsert the 16-field metadata keyed by url, append the
        # price-history snapshot. Unparseable pages (X7) are counted,
        # never fatal.
        parsed = products_batch = history_batch = None
        if "body" in fx.columns:
            from ..products.tables import build_history_rows, build_target_rows
            from .extract import extract_product_fields

            # per-domain parser dispatch (multi-site E3): the site key is
            # broadcast-joined from the domain config table and rides the
            # row into the kernel — never a driver-side domain->parser map
            detail = ok_t1.select("url", "url_hash", "domain", "position", "body")
            site_col = None
            if "site" in self.robots.columns:
                detail = detail.join(
                    F.broadcast(
                        self.robots.select("domain", F.col("site").alias("_site"))
                    ),
                    "domain",
                    "left",
                )
                site_col = "_site"
            parsed = extract_product_fields(detail, "url", "body", site_col=site_col).drop(
                "_site", "domain"
            )
            if self.endpoints is not None:  # F3: multi-endpoint assembly
                from ..fetchers.chain import resolve_detail_chain

                parsed = resolve_detail_chain(parsed, self.endpoints)
            parsed = parsed.persist()
            cached.append(parsed)
            parsed_ok = parsed.filter(F.col("parse_ok"))
            products_batch = build_target_rows(parsed_ok, self.cfg.session, round_no)
            history_batch = build_history_rows(parsed_ok, self.cfg.session, round_no)

        # --- ONE stats job: counters (A1-A4) + per-domain lineage -------
        def _tag(df, key_col):
            return df.select(key_col.alias("k"))

        stats_df = (
            # coalesce: concat_ws silently DROPS null columns, and a null
            # domain (arbitrary seed URL through parse_url) would shift
            # the 3-part key to 2 parts and crash the unpack below
            _tag(
                fx,
                F.concat_ws(
                    "|", F.lit("fx"), F.col("outcome"), F.coalesce(F.col("domain"), F.lit(""))
                ),
            )
            .unionAll(_tag(children_raw, F.lit("raw")))
            .unionAll(
                _tag(
                    inserts,
                    F.when(F.col("status") == SKIPPED_ROBOTS, F.lit("ins_skip")).otherwise(
                        F.lit("ins")
                    ),
                )
            )
            .unionAll(_tag(items, F.lit("item")))
        )
        # piggyback dirty-bucket detection for the delta commit on this
        # same job (a dedicated distinct+collect per table would add two
        # driver round-trips per round): every fx row is a status update
        # -> its frontier bucket is dirty; every insert dirties its
        # frontier bucket AND its seen shard
        n_buckets = self.store.frontier_n_buckets()
        if n_buckets:
            fb = lambda c: frontier_bucket_col(c, n_buckets).cast("string")
            stats_df = stats_df.unionAll(
                _tag(fx, F.concat(F.lit("fb|"), fb(F.col("url_hash"))))
            ).unionAll(_tag(inserts, F.concat(F.lit("fb|"), fb(F.col("url_hash")))))
            # exact pending-count deltas per bucket: terminal resolutions
            # decrement, PENDING inserts increment (RETRY rows stay
            # PENDING -> no change; robots-skipped inserts never pend)
            stats_df = stats_df.unionAll(
                _tag(
                    fx.filter(F.col("outcome") != RETRY),
                    F.concat(F.lit("fbt|"), fb(F.col("url_hash"))),
                )
            ).unionAll(
                _tag(
                    inserts.filter(F.col("status") == PENDING),
                    F.concat(F.lit("fbi|"), fb(F.col("url_hash"))),
                )
            )
        if seen is not None:
            stats_df = stats_df.unionAll(
                _tag(
                    inserts,
                    F.concat(
                        F.lit("sb|"),
                        seen.shard_of_hash_col(F.col("url_hash")).cast("string"),
                    ),
                )
            )
        if parsed is not None:
            stats_df = stats_df.unionAll(
                _tag(
                    parsed,
                    F.when(F.col("parse_ok"), F.lit("prod")).otherwise(F.lit("prod_bad")),
                )
            )
        import time as _time

        _t0 = _time.monotonic()
        tallies = {r["k"]: r["count"] for r in stats_df.groupBy("k").count().collect()}
        t_stats = _time.monotonic() - _t0

        by_outcome: dict[str, int] = {}
        lineage: dict[str, int] = {}
        frontier_dirty: set[int] = set()
        seen_dirty: set[int] = set()
        for k, n in tallies.items():
            if k.startswith("fx|"):
                _, outcome, domain = k.split("|", 2)
                by_outcome[outcome] = by_outcome.get(outcome, 0) + n
                lineage[domain] = lineage.get(domain, 0) + n
            elif k.startswith("fb|"):
                frontier_dirty.add(int(k[3:]))
            elif k.startswith("sb|"):
                seen_dirty.add(int(k[3:]))
            elif k.startswith("fbt|"):
                if ppb is not None:
                    ppb[k[4:]] = max(0, ppb.get(k[4:], 0) - n)
            elif k.startswith("fbi|"):
                if ppb is not None:
                    ppb[k[4:]] = ppb.get(k[4:], 0) + n
        n_claimed = sum(by_outcome.values())
        if n_claimed == 0:
            for df in cached:
                df.unpersist()
            return None
        n_children_raw = tallies.get("raw", 0)
        n_inserted = tallies.get("ins", 0) + tallies.get("ins_skip", 0)
        n_skipped = tallies.get("ins_skip", 0)
        n_items = tallies.get("item", 0)
        n_products = tallies.get("prod", 0)
        n_unparseable = tallies.get("prod_bad", 0)

        # --- status state machine (A3/K2/K7) ----------------------------
        new_status = (
            F.when(F.col("outcome") == OK, F.lit(SUCCESS))
            .when(F.col("outcome") == RETRY, F.lit(PENDING))
            .when(F.col("outcome") == FAIL_HW, F.lit(HARDWARE_ERROR))
            .otherwise(F.lit(ERROR))
        )
        updates = fx.select(
            "url_hash",
            "url",
            new_status.alias("new_status"),
            F.when(F.col("outcome") == OK, F.col("attempt"))
            .otherwise(F.col("attempt") + 1)
            .alias("new_attempt"),
        )

        counters["urls_fetched"] += by_outcome.get(OK, 0)
        counters["urls_failed_hw"] += by_outcome.get(FAIL_HW, 0)
        counters["urls_failed_logic"] += by_outcome.get(FAIL_LOGIC, 0)
        counters["urls_deduped"] += n_children_raw - n_inserted
        counters["urls_skipped_robots"] += n_skipped
        counters["items_emitted"] += n_items
        counters["urls_seen"] += n_inserted

        n_terminal = (
            by_outcome.get(OK, 0) + by_outcome.get(FAIL_HW, 0) + by_outcome.get(FAIL_LOGIC, 0)
        )
        if pending_hint is None:  # older manifest without the field
            pending_hint = max(
                0,
                counters["urls_seen"]
                - counters["urls_fetched"]
                - counters["urls_failed_hw"]
                - counters["urls_failed_logic"]
                - counters["urls_skipped_robots"],
            )
        else:
            pending_hint = max(0, pending_hint - n_terminal + (n_inserted - n_skipped))

        crawl_order = fx.select(
            F.lit(round_no).cast("int").alias("round"),
            "url",
            "domain",
            F.col("within_round_rank").cast("int").alias("within_round_rank"),
        )

        # --- adaptive politeness (opt-in): one AIMD step per round over
        # this round's fetch outcomes. RETRY rows count as distress (a
        # 403/timeout burst is the back-off signal even when attempts
        # remain). localCheckpoint keeps the tiny config table's plan
        # from growing round-over-round (iterative-plan trap); the
        # phase-1 scalar cap stays a valid upper bound by advancing it
        # with the additive increment instead of re-aggregating.
        if self.cfg.adaptive_budgets:
            from ..politeness.adaptive import adaptive_budget_step, round_outcome_counts

            oc = round_outcome_counts(
                fx,
                status_col="outcome",
                hw_statuses=(FAIL_HW, RETRY),
                logic_statuses=(FAIL_LOGIC,),
            )
            self.robots = adaptive_budget_step(
                self.robots,
                oc,
                distress_milli=self.cfg.adaptive_distress_milli,
                increase=self.cfg.adaptive_increase,
                min_budget=self.cfg.adaptive_min_budget,
            ).localCheckpoint()
            # phase-1 scalar cap: recompute from the (tiny, checkpointed)
            # budget table rather than advancing a never-shrinking scalar
            # — after thousands of distress-halved rounds a drifting cap
            # would make phase 1 over-claim by the whole drift
            self._max_budget = max_effective_budget(self.robots, self.cfg.round_ms)
            self._pkey_budgets = None  # AIMD moved the budgets

        meta = {
            "round": round_no,
            "session": self.cfg.session,
            "counters": counters,
            "lineage": lineage,
            "claimed": by_outcome,
            "pending_hint": pending_hint,
            "pending_per_bucket": ppb,
            "products": {"upserted": n_products, "unparseable": n_unparseable},
            **self.cfg.extra_meta,
        }
        # --- commit: dirty-bucket frontier MERGE + dirty-shard seen
        # delta, all computed executor-side inside the store ------------
        _t0 = _time.monotonic()
        self.store.commit(
            frontier_updates=updates,
            frontier_inserts=inserts if n_inserted else None,
            new_results=items if n_items else None,
            new_crawl_order=crawl_order,
            new_link_edges=link_edges,
            new_history=history_batch if n_products else None,
            products_upsert=products_batch if n_products else None,
            seen_delta=(seen.delta_df(inserts) if (seen is not None and n_inserted) else None),
            frontier_dirty=sorted(frontier_dirty) if frontier_dirty else None,
            seen_dirty=sorted(seen_dirty) if seen_dirty else None,
            meta=meta,
            # optimistic concurrency: this round's deltas were computed
            # against the manifest read at round start — refuse the flip
            # if another writer advanced the store since (lost-update
            # guard; the loser re-reads and re-runs the round)
            expected_version=manifest["version"],
        )
        meta["timings"] = {
            "stats_s": round(t_stats, 2),
            "commit_s": round(_time.monotonic() - _t0, 2),
        }
        for df in cached:
            df.unpersist()
        # opt-in auto-maintenance: grow the bucket layout when the just-
        # committed pending counts show a bucket past the target size
        # (one doubling per round bounds maintenance cost; the store
        # re-keys the pending counts so the next claim prunes correctly)
        if (
            self.cfg.auto_rebucket_pending
            and ppb
            and max(ppb.values()) > self.cfg.auto_rebucket_pending
            and (self.store.frontier_n_buckets() or 0) * 2
            <= self.cfg.auto_rebucket_max_buckets
        ):
            self.store.rebucket_frontier(self.spark, 2)
            meta["rebucketed_to"] = self.store.frontier_n_buckets()
        return meta

    def run(self, max_rounds: int | None = None) -> dict:
        """Loop rounds until the frontier drains (reference: producer
        polls until no status=0 rows). Returns the final meta."""
        last = self.store.read_manifest()["meta"]
        limit = max_rounds if max_rounds is not None else self.cfg.max_rounds
        for _ in range(limit):
            meta = self.run_round()
            if meta is None:
                break
            last = meta
        return last

    def rearm_session(self, new_session: int) -> int:
        """Session rotation (O5): re-arm every finally-resolved row for a
        fresh crawl epoch (reference start_tracking.py:176-193 flips
        status=0, session=cur WHERE is_tracked=1). Products stopped via
        stop_tracking (O6, products/export.py) are excluded: their
        frontier rows keep their terminal status and are never
        re-claimed."""
        frontier = self.store.read_frontier(self.spark)
        products = self.store.read_products(self.spark)
        tracked = F.lit(True)
        if products is not None:
            untracked = products.filter(~F.col("is_tracked")).select(
                F.col("url").alias("_untracked_url")
            )
            frontier = frontier.join(
                untracked, frontier["url"] == F.col("_untracked_url"), "left"
            )
            tracked = F.col("_untracked_url").isNull()
        rearm = F.col("status").isin(SUCCESS, ERROR, HARDWARE_ERROR) & tracked
        rearmed = (
            frontier.withColumn(
                "attempt", F.when(rearm, F.lit(0)).otherwise(F.col("attempt"))
            )
            .withColumn(
                "session", F.when(rearm, F.lit(new_session)).otherwise(F.col("session"))
            )
            .withColumn(
                "status", F.when(rearm, F.lit(PENDING)).otherwise(F.col("status"))
            )
            .drop("_untracked_url")
        )
        self.cfg.session = new_session
        manifest = self.store.read_manifest()
        counters = dict(manifest["meta"]["counters"])
        # re-armed rows become PENDING again without touching counters;
        # reset the hint to the re-armed (= previously resolved) count
        # so the first rounds of a big re-crawl still take the salted
        # hot-domain path (no extra count job: counters already know it)
        rearmed_count = (
            counters["urls_fetched"]
            + counters["urls_failed_hw"]
            + counters["urls_failed_logic"]
        )
        prev_hint = manifest["meta"].get("pending_hint") or 0
        # per-bucket pending counts change wholesale on re-arm: recompute
        # exactly with one small agg (rare operation; <= B result rows)
        B = self.store.frontier_n_buckets() or self.store.n_frontier_buckets
        ppb = {
            str(r["fb"]): int(r["n"])
            for r in rearmed.filter(F.col("status") == PENDING)
            .groupBy(frontier_bucket_col(F.col("url_hash"), B).alias("fb"))
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        return self.store.commit(
            rearmed,
            meta={
                "round": manifest["meta"]["round"],
                "session": new_session,
                "counters": counters,
                "lineage": {},
                "pending_hint": prev_hint + rearmed_count,
                "pending_per_bucket": ppb,
            },
        )
