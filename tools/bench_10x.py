"""10x-world amortization evidence (VERDICT r02 next-round #10).

Runs the full crawl loop on BENCH10 — the BENCH throughput world with
10x the category count (~575k pages vs ~57k) — and records the
per-round stage split (stats job vs snapshot commit) so the question
"where does the commit's fixed share go as rounds carry more URLs?"
has a measured answer instead of the 2x-world extrapolation in
BASELINE.md §3.1c.

The hypothesis being tested: per-round commit cost is dominated by a
fixed snapshot overhead (manifest + dirty-bucket rewrite of a small
frontier), so at 10x input the commit share per URL falls ~10x and
total throughput rises — the signature that the design amortizes
toward the 10^10-URL regime, where a round is millions of URLs.

Usage: python tools/bench_10x.py [--cpus 32] [--out BENCH_10X.json]
Single JVM, one run (the world is ~25 min of crawl; variance evidence
lives in BENCH_SCALING.json's repeated runs).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_10X.json"))
    ap.add_argument(
        "--big-scale",
        type=int,
        default=None,
        help="extra curve point at N x BENCH categories (VERDICT r03 #6: "
        "the biggest world the sandbox fits, ~50x ≈ 2.9M pages); skips "
        "the 1x/10x points and appends bench_{N}x to an existing --out",
    )
    ap.add_argument(
        "--breadth-scale",
        type=int,
        default=None,
        help="BREADTH curve point: N x BENCH *domain count* at constant "
        "per-domain categories (VERDICT r04 #3 — the politeness-"
        "uncapped growth axis a real 10^10 crawl follows; the depth "
        "curve's 50x point saturated on politeness because it scaled "
        "URLs-per-domain on a fixed 24-domain set). Appends "
        "bench_breadth_{N}x to --out.",
    )
    ap.add_argument(
        "--frontier-commit",
        choices=["cow", "log"],
        default="cow",
        help="frontier delta-commit strategy for the measured store "
        "(log = LSM append runs + periodic compaction); result keys "
        "get a _log suffix so both strategies can live in one curve",
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(args.cpus))
    if args.frontier_commit == "log":
        os.environ["SPARK_GRAFT_STORE_KW"] = '{"frontier_commit": "log"}'
    suffix = "_log" if args.frontier_commit == "log" else ""
    if (args.big_scale and args.big_scale >= 20) or (
        args.breadth_scale and args.breadth_scale >= 10
    ):
        # a >=20x world's image table is multi-GB; 32 concurrent
        # vectored-parquet readers OOM the 8g default heap (measured at
        # 50x: ~72 MB row groups x 32 tasks x decode buffers > 8g).
        # Size the single local JVM to the world, still env-overridable.
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    import bench
    from scrapy_products_tracker_spark.session import get_spark
    from scrapy_products_tracker_spark.synth import BENCH

    # 10x the category count (both uniform and hot-domain skew scale
    # together, so the skew *ratio* the salted scheduler faces is
    # unchanged); everything else — budgets, latency, page shapes —
    # identical to BENCH so the comparison isolates input volume.
    bench10 = dataclasses.replace(BENCH, cats_per_domain=240, hot_domain_cats=6000)

    spark = get_spark(
        app_name="bench10x", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _append_point(key: str, res: dict) -> None:
        cur = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                cur = json.load(f)
        cur[key] = res
        s = cur.setdefault("summary", {})
        s[f"urls_per_s_{key.removeprefix('bench_')}"] = res["urls_per_s"]
        s[f"commit_s_per_1k_urls_{key.removeprefix('bench_')}"] = round(
            1000 * res["stage_s"]["commit_s"] / max(res["counters"]["urls_fetched"], 1), 3
        )
        s[f"commit_s_per_round_{key.removeprefix('bench_')}"] = round(
            res["stage_s"]["commit_s"] / max(res["rounds"], 1), 2
        )
        with open(args.out, "w") as f:
            json.dump(cur, f, indent=1)
        print("WROTE " + args.out)
        print(json.dumps({k: v for k, v in s.items() if key.removeprefix("bench_") in k}))

    if args.breadth_scale:
        n = args.breadth_scale
        # breadth axis: N x the domain COUNT at constant per-domain
        # categories (one hot domain regardless — the skew stays one
        # domain's share, like the real web). Politeness budgets are
        # per-domain, so round capacity grows with breadth; the engine
        # claim is that per-round commit cost does NOT.
        spec = dataclasses.replace(BENCH, n_domains=24 * n)
        res = bench.bench_crawl(spark, world_spec=spec, chunk_size=25_000 * n)
        _append_point(f"bench_breadth_{n}x{suffix}", res)
        return

    if args.big_scale:
        n = args.big_scale
        spec = dataclasses.replace(
            BENCH, cats_per_domain=24 * n, hot_domain_cats=600 * n
        )
        # chunk scales with the world so rounds stay claim-bound (same
        # ratio as the 1x/10x points: 25k per BENCH-unit of categories)
        big_n = bench.bench_crawl(spark, world_spec=spec, chunk_size=25_000 * n)
        _append_point(f"bench_{n}x{suffix}", big_n)
        return

    base = bench.bench_crawl(spark, world_spec=BENCH)
    if suffix:  # log-mode curve points append next to the cow ones
        _append_point(f"bench_1x{suffix}", base)
        big = bench.bench_crawl(spark, world_spec=bench10, chunk_size=250_000)
        _append_point(f"bench_10x{suffix}", big)
        return
    # chunk_size scales with the world (25k -> 250k) so the round
    # structure stays claim-bound, not cap-bound — same ratio as the
    # 1x bench; otherwise the 10x world would just run 10x the rounds
    # and the amortization question would be assumed, not measured.
    big = bench.bench_crawl(spark, world_spec=bench10, chunk_size=250_000)

    def commit_share(r):
        tot = r["stage_s"]["stats_s"] + r["stage_s"]["commit_s"]
        return round(r["stage_s"]["commit_s"] / tot, 4) if tot else None

    out = {
        "world": "BENCH vs BENCH10 (10x categories, same skew ratio/budgets/latency)",
        "cpus": args.cpus,
        "bench_1x": base,
        "bench_10x": big,
        "summary": {
            "urls_per_s_1x": base["urls_per_s"],
            "urls_per_s_10x": big["urls_per_s"],
            "speedup_10x_over_1x": round(big["urls_per_s"] / base["urls_per_s"], 3),
            "commit_share_1x": commit_share(base),
            "commit_share_10x": commit_share(big),
            "commit_s_per_1k_urls_1x": round(
                1000 * base["stage_s"]["commit_s"] / max(base["counters"]["urls_fetched"], 1), 3
            ),
            "commit_s_per_1k_urls_10x": round(
                1000 * big["stage_s"]["commit_s"] / max(big["counters"]["urls_fetched"], 1), 3
            ),
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE " + args.out)
    print(json.dumps(out["summary"]))


if __name__ == "__main__":
    main()
