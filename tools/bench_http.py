"""Real-socket throughput evidence (round 4): the BENCH-world crawl
driven through ``fetchers.http.fetch_http`` against a loopback
``WorldHTTPServer``, side by side with the in-process synthetic
fetcher on the SAME world and config.

What this proves beyond tests/test_http_fetch.py's byte-parity at
smoke scale: the engine's headline crawl loop sustains its throughput
shape when every fetch is a genuine TCP connect + HTTP round-trip —
i.e. the north metric does not depend on the fetch being a table
join. The loopback server is a single threaded Python process, so at
32 concurrent connections IT (GIL + one JSON encode per request) is
the expected ceiling, not the engine; the report records both rates
plus the counter-equality check so the comparison is honest about
where the bottleneck sits.

Usage: python tools/bench_http.py [--cpus 32] [--out BENCH_HTTP.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_HTTP.json"))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(args.cpus))
    import pandas as pd

    import bench
    from scrapy_products_tracker_spark.fetchers.http import fetch_http
    from scrapy_products_tracker_spark.session import get_spark
    from scrapy_products_tracker_spark.synth import BENCH, WorldHTTPServer

    spark = get_spark(
        app_name="bench_http", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    syn = bench.bench_crawl(spark, world_spec=BENCH)

    paths = bench._cached_world(BENCH)
    srv = WorldHTTPServer(pd.read_parquet(paths["pages"]))
    base = srv.start()
    try:
        http = bench.bench_crawl(
            spark,
            world_spec=BENCH,
            fetch_fn=lambda claimed, rnd: fetch_http(
                claimed, base_url=base, timeout_s=60.0
            ),
        )
    finally:
        srv.stop()

    out = {
        "world": "BENCH (same world/config both modes)",
        "cpus": args.cpus,
        "synthetic": syn,
        "http_loopback": http,
        "summary": {
            "urls_per_s_synthetic": syn["urls_per_s"],
            "urls_per_s_http": http["urls_per_s"],
            "counters_equal": syn["counters"] == http["counters"],
            "http_requests_served": int(sum(srv.hits.values())),
            "note": "loopback server is one Python process; at 32 "
            "connections the server is the expected ceiling, not the engine",
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE " + args.out)
    print(json.dumps(out["summary"]))


if __name__ == "__main__":
    main()
