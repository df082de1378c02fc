"""Same-hour worktree A/B of the headline crawl (VERDICT r04 #2).

Cross-round URLs/s readings are only comparable when both sides share
the host window (BASELINE.md §3.1d/§3.1e: CPU steal and /tmp disk
throttling move the absolute number 2x). This tool measures every side
in its OWN fresh JVM subprocess running that side's OWN checkout
(worktree), interleaved A,B,C,...,A,B,C so each side's repetitions
bracket the others' — the like-for-like protocol rounds 2 and 3
established, automated.

Host qualification (same policy as tools/scaling_bench.py): a run
whose crawl-section steal fraction exceeds 1% or whose post-run disk
probe drops below 0.5x the session-start write rate is recorded as
rejected (with its readings and reason) and retried, up to 2 retries.

Usage:  python tools/bench_ab.py [out.json]
Sides are configured in SIDES below; worktrees are created on demand.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import disk_probe  # noqa: E402  (host telemetry helpers)

# (label, git ref or None for the working tree, extra env)
SIDES = [
    ("r3_head", "a1147dc", {}),
    ("r4_head", "f0a1ea5", {}),
    ("r5_head", None, {}),
    ("r5_layout_off", None, {"SPARK_GRAFT_STORE_KW": '{"cluster_frontier_files": false}'}),
    ("r5_log_commit", None, {"SPARK_GRAFT_STORE_KW": '{"frontier_commit": "log"}'}),
]
RUNS_PER_SIDE = 2
MAX_RETRIES_PER_RUN = 2

RUNNER = r"""
import json, os, sys
sys.path.insert(0, os.getcwd())
from scrapy_products_tracker_spark.session import get_spark
import bench
spark = get_spark(app_name="bench_ab", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
out = bench.bench_crawl(spark)
res = {k: out.get(k) for k in (
    "urls_per_s", "work_units_per_s", "crawl_wall_s", "rounds",
    "counters", "stage_s", "host")}
print("ABRESULT " + json.dumps(res), flush=True)
"""


def _worktree(ref: str) -> str:
    path = f"/tmp/ab_{ref}"
    if not os.path.isdir(os.path.join(path, ".git")) and not os.path.isfile(
        os.path.join(path, ".git")
    ):
        subprocess.run(
            ["git", "worktree", "add", "--detach", "-f", path, ref],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    return path


def _one_run(workdir: str, env_extra: dict) -> dict:
    env = dict(os.environ, **env_extra)
    p = subprocess.run(
        [sys.executable, "-c", RUNNER],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"no ABRESULT from {workdir} (rc={p.returncode}):\n{p.stderr[-3000:]}"
    )


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_AB.json")
    base_disk = disk_probe()
    sides = []
    for label, ref, env in SIDES:
        workdir = _worktree(ref) if ref else REPO
        sides.append({"label": label, "ref": ref or "WORKTREE", "dir": workdir, "env": env,
                      "runs": [], "rejected": []})
    t0 = time.time()
    for rep in range(RUNS_PER_SIDE):
        for s in sides:
            attempt = 0
            while True:
                attempt += 1
                res = _one_run(s["dir"], s["env"])
                probe = disk_probe()
                res["disk_probe"] = probe
                steal = (res.get("host") or {}).get("steal_frac", 0.0) or 0.0
                disk_ok = probe["write_mb_s"] >= 0.5 * base_disk["write_mb_s"]
                if steal <= 0.01 and disk_ok:
                    s["runs"].append(res)
                    break
                reason = []
                if steal > 0.01:
                    reason.append(f"steal {steal:.3f} > 0.01")
                if not disk_ok:
                    reason.append(
                        f"disk probe {probe['write_mb_s']:.0f} < 0.5x session start "
                        f"{base_disk['write_mb_s']:.0f} MB/s"
                    )
                res["reject_reason"] = "; ".join(reason)
                s["rejected"].append(res)
                if attempt > MAX_RETRIES_PER_RUN:
                    s["runs"].append(res)  # keep the last attempt, flagged
                    break
            print(
                f"[{time.strftime('%H:%M:%S')}] {s['label']} rep{rep}: "
                f"{s['runs'][-1]['urls_per_s']} URLs/s "
                f"(steal {(s['runs'][-1].get('host') or {}).get('steal_frac')})",
                flush=True,
            )
    report = {
        "protocol": (
            "interleaved same-hour A/B, one fresh JVM per run, each side its own "
            "checkout; qualified at steal<=1% and disk probe >=0.5x session start"
        ),
        "started_at": t0,
        "wall_s": round(time.time() - t0, 1),
        "base_disk_probe": base_disk,
        "sides": [
            {
                "label": s["label"],
                "ref": s["ref"],
                "env": s["env"],
                "urls_per_s": [r["urls_per_s"] for r in s["runs"]],
                "median_urls_per_s": sorted(r["urls_per_s"] for r in s["runs"])[
                    len(s["runs"]) // 2
                ],
                "work_units_per_s": [r.get("work_units_per_s") for r in s["runs"]],
                "stage_s": [r.get("stage_s") for r in s["runs"]],
                "steal": [
                    (r.get("host") or {}).get("steal_frac") for r in s["runs"]
                ],
                "n_rejected": len(s["rejected"]),
                "rejected": [
                    {"urls_per_s": r["urls_per_s"], "reason": r["reject_reason"]}
                    for r in s["rejected"]
                ],
            }
            for s in sides
        ],
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({s["label"]: [r["urls_per_s"] for r in s["runs"]] for s in sides}))


if __name__ == "__main__":
    main()
