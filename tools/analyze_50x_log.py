"""Post-process the 50x log-commit run (BENCH_10X.json bench_50x_log):
per-round commit/stats distributions with suspension-outlier handling.

The round-5 session SIGSTOPped the running benchmark for ~45 min to
keep the N->4N scaling measurement's host window clean (two heavy
benches must not overlap); the suspension lands inside ONE round's
stage timing and the run's wall clock. This script reports both the
raw aggregates and the corrected view that excludes rounds whose
stats+commit time exceeds 10x the median (the suspension artifact),
so the flatness claim rests on the unpolluted 382+ rounds. Honest
disclosure lives in BASELINE.md §3.1n.
"""

from __future__ import annotations

import json
import statistics
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_10X.json"
key = sys.argv[2] if len(sys.argv) > 2 else "bench_50x_log"
d = json.load(open(path))
b = d[key]
rd = b["rounds_detail"]
per_round = [(r["stats_s"], r["commit_s"], r["urls_fetched"]) for r in rd]
tot = [s + c for s, c, _ in per_round]
med = statistics.median(tot)
outliers = [i for i, t in enumerate(tot) if t > 10 * med]
clean = [i for i in range(len(tot)) if i not in outliers]

def agg(idx):
    st = sum(per_round[i][0] for i in idx)
    co = sum(per_round[i][1] for i in idx)
    uf = sum(per_round[i][2] for i in idx)
    return st, co, uf

st, co, uf = agg(clean)
n = len(clean)
commits = sorted(per_round[i][1] for i in clean)
halves = (
    statistics.median(per_round[i][1] for i in clean[: n // 2]),
    statistics.median(per_round[i][1] for i in clean[n // 2 :]),
)
out = {
    "rounds_total": len(rd),
    "suspension_outlier_rounds": [
        {"idx": i, "stats_s": per_round[i][0], "commit_s": per_round[i][1]}
        for i in outliers
    ],
    "clean_rounds": n,
    "commit_s_per_round_median": round(statistics.median(commits), 2),
    "commit_s_per_round_p90": round(commits[int(0.9 * n)], 2),
    "commit_s_per_round_first_half_median": round(halves[0], 2),
    "commit_s_per_round_second_half_median": round(halves[1], 2),
    "stats_s_per_round_median": round(
        statistics.median(per_round[i][0] for i in clean), 2
    ),
    "commit_s_per_1k_urls_clean": round(1000 * co / max(uf, 1), 3),
    "clean_stage_wall_s": round(st + co, 1),
    "urls_fetched_clean": uf,
    "counters": b["counters"],
    "host": b.get("host"),
}
print(json.dumps(out, indent=1))
