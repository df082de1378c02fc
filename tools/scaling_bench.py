"""Scaling-efficiency evidence for the north rule (N vs 4N cores).

BASELINE.json requires throughput scaling efficiency >= 0.8 from N to
4N executors. No real cluster exists in this sandbox, so per the
driver protocol we run the SAME crawl job on the SAME input at two
parallelism levels (local[8] and local[32]) in separate JVMs and
report URLs/s at both plus efficiency = t32 / (4 * t8).

Host qualification (VERDICT r03 #1): a shared sandbox can hand the
bench a degraded host (CPU steal, throttled disk) and turn an engine
PASS into an artifact FAIL — round 3's last driver re-run recorded
0.76 under 2.9-4.1% steal plus a disk-throttled commit while three
clean-host runs measured 0.87-0.88. Every measured run now carries its
own /proc/stat delta and a before/after disk probe, is REJECTED when
``steal_frac > 0.01`` or the probe drops below half the session-start
write rate, and rejected runs are auto-retried (up to 3x the requested
count). Rejected runs stay in the report (``rejected``) so the
artifact shows WHY a number was excluded instead of silently averaging
contention into the gate.

Usage: python tools/scaling_bench.py [--runs 3] [--out BENCH_SCALING.json]
Each measurement is the median of N qualified runs of the full crawl
loop on the deterministic BENCH world (seed=42).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

MAX_STEAL_FRAC = 0.01
MIN_DISK_RATIO = 0.5

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from scrapy_products_tracker_spark.session import get_spark
from scrapy_products_tracker_spark.synth import SCALING
import bench

spark = get_spark(app_name="scaling", master="local[{cpus}]", shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
# The scaling job is the fetch-bound regime (see synth.world.SCALING):
# simulated per-page latency is charged as wall time, one serial
# connection per core, so throughput measures scheduling + fetch
# concurrency — the quantity the north rule scales N -> 4N.
kw = dict(world_spec=SCALING, simulate_latency_scale=1.0, chunk_size=1 << 20)
probe0 = bench.disk_probe(64)
# warm-up crawl (JVM/codegen warm; measured runs follow)
bench.bench_crawl(spark, **kw)
need, qualified, rejected, attempts = {runs}, [], [], 0
while len(qualified) < need and attempts < need * 3:
    attempts += 1
    v = bench.bench_crawl(spark, **kw)
    probe = bench.disk_probe(64)
    h = v.get("host") or {{}}
    steal_ok = h.get("steal_frac", 1.0) <= {max_steal}
    disk_ok = probe["write_mb_s"] >= {min_disk_ratio} * probe0["write_mb_s"]
    v["disk_probe"] = probe
    v["qualified"] = bool(steal_ok and disk_ok)
    v["reject_reasons"] = (
        ([] if steal_ok else ["steal_frac>{max_steal}"])
        + ([] if disk_ok else ["disk_probe<{min_disk_ratio}x_session_start"])
    )
    (qualified if v["qualified"] else rejected).append(v)
print("RESULT " + json.dumps(
    {{"qualified": qualified, "rejected": rejected, "attempts": attempts,
      "disk_probe_session_start": probe0}}))
"""


def run_level(repo: str, cpus: int, runs: int) -> dict:
    code = CHILD.format(
        repo=repo, cpus=cpus, runs=runs,
        max_steal=MAX_STEAL_FRAC, min_disk_ratio=MIN_DISK_RATIO,
    )
    env = dict(os.environ, SPARK_GRAFT_SHUFFLE_PARTITIONS=str(cpus))
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, cwd=repo
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"local[{cpus}] run failed:\n{p.stdout[-2000:]}\n{p.stderr[-4000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--out", default="BENCH_SCALING.json")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    report = {
        "runs": args.runs,
        "world": "SCALING (seed=42, fetch-latency-bound)",
        "qualification": {
            "max_steal_frac": MAX_STEAL_FRAC,
            "min_disk_ratio_vs_session_start": MIN_DISK_RATIO,
            "policy": "runs failing either check are rejected and retried (<=3x)",
        },
    }
    tp, all_levels_qualified = {}, True
    for cpus in (args.low, args.high):
        res = run_level(repo, cpus, args.runs)
        vals = res["qualified"]
        level_qualified = len(vals) >= 1
        if not level_qualified:
            # host never settled: fall back to the rejected runs but say so
            vals = res["rejected"]
            all_levels_qualified = False
        urls = statistics.median(v["urls_per_s"] for v in vals)
        wall = statistics.median(v["crawl_wall_s"] for v in vals)
        tp[cpus] = urls
        report[f"local[{cpus}]"] = {
            "urls_per_s_median": urls,
            "wall_s_median": wall,
            "n_qualified": len(res["qualified"]),
            "n_rejected": len(res["rejected"]),
            "attempts": res["attempts"],
            "level_qualified": level_qualified,
            "disk_probe_session_start": res["disk_probe_session_start"],
            "all": res["qualified"],
            "rejected": res["rejected"],
        }
        print(
            f"local[{cpus}]: {urls:.1f} urls/s (median of {len(vals)} qualified,"
            f" {len(res['rejected'])} rejected)",
            file=sys.stderr,
        )

    factor = args.high / args.low
    report["scaling_efficiency"] = round(tp[args.high] / (factor * tp[args.low]), 4)
    report["host_qualified"] = all_levels_qualified
    report["pass_0.8"] = report["scaling_efficiency"] >= 0.8
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
