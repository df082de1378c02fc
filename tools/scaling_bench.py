"""Scaling-efficiency evidence for the north rule (N vs 4N cores).

BASELINE.json requires throughput scaling efficiency >= 0.8 from N to
4N executors. No real cluster exists in this sandbox, so per the
driver protocol we run the SAME crawl job on the SAME input at two
parallelism levels (local[8] and local[32]) in separate JVMs and
report URLs/s at both plus efficiency = t32 / (4 * t8).

Usage: python tools/scaling_bench.py [--runs 3] [--out BENCH_SCALING.json]
Each measurement is the median of N runs of the full crawl loop on the
deterministic BENCH world (seed=42).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

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
# warm-up crawl (JVM/codegen warm; measured runs follow)
bench.bench_crawl(spark, **kw)
vals = []
for _ in range({runs}):
    vals.append(bench.bench_crawl(spark, **kw))
print("RESULT " + json.dumps(vals))
"""


def run_level(repo: str, cpus: int, runs: int) -> list[dict]:
    code = CHILD.format(repo=repo, cpus=cpus, runs=runs)
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

    report = {"runs": args.runs, "world": "SCALING (seed=42, fetch-latency-bound)"}
    tp = {}
    for cpus in (args.low, args.high):
        vals = run_level(repo, cpus, args.runs)
        urls = statistics.median(v["urls_per_s"] for v in vals)
        wall = statistics.median(v["crawl_wall_s"] for v in vals)
        tp[cpus] = urls
        report[f"local[{cpus}]"] = {
            "urls_per_s_median": urls,
            "wall_s_median": wall,
            "all": vals,
        }
        print(f"local[{cpus}]: {urls:.1f} urls/s (median of {args.runs})", file=sys.stderr)

    factor = args.high / args.low
    report["scaling_efficiency"] = round(tp[args.high] / (factor * tp[args.low]), 4)
    report["pass_0.8"] = report["scaling_efficiency"] >= 0.8
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
