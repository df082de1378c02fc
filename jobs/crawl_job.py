"""spark-submit entry point for the crawl engine.

The north rule requires the pipeline to run via
``spark-submit --py-files`` on a multi-executor cluster. Build the
package zip with ``python tools/make_dist.py``, then:

    spark-submit --master <cluster-master> \
        --py-files dist/scrapy_products_tracker_spark.zip \
        jobs/crawl_job.py \
        --world /path/to/world_dir \
        --store /path/to/store_dir \
        --chunk-size 25000 --inline-retries

``--world`` points at a directory holding the four world tables
(``seeds/pages/image_caption/robots`` parquet — generate one with
``--generate-world BENCH|SCALING|T1|T2``). On a real deployment the
pages table is replaced by an HTTP fetcher with the same ``mapInPandas``
shape (fetchers/synthetic.py docstring). Master/parallelism come from
spark-submit, not from this script — it builds on the active session.

Resume: rerunning with the same ``--store`` continues from the last
committed snapshot (seed() is skipped if the store already has one).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--world", required=True, help="dir with seeds/pages/image_caption/robots parquet")
    ap.add_argument("--store", required=True, help="frontier snapshot store directory")
    ap.add_argument("--generate-world", choices=["T1", "T2", "BENCH", "SCALING"], default=None,
                    help="generate this preset world into --world first")
    ap.add_argument("--chunk-size", type=int, default=25_000)
    ap.add_argument("--n-salts", type=int, default=8)
    ap.add_argument("--max-rounds", type=int, default=None)
    ap.add_argument("--session", type=int, default=1)
    ap.add_argument("--inline-retries", action="store_true")
    ap.add_argument("--reencode-payload", action="store_true")
    ap.add_argument("--simulate-latency-scale", type=float, default=0.0)
    ap.add_argument(
        "--fetch-http",
        metavar="BASE_URL",
        default=None,
        help="fetch over real sockets via fetchers.http.fetch_http; BASE_URL "
        "rewrites https://{host}{path} under it ('direct' = fetch URLs as-is "
        "— the production path)",
    )
    ap.add_argument(
        "--serve-world",
        action="store_true",
        help="serve the world's pages table over a loopback WorldHTTPServer "
        "and crawl through it over real sockets (implies --fetch-http)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
    from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
    from scrapy_products_tracker_spark.politeness import load_robots

    spark = SparkSession.builder.appName("crawl-frontier").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.generate_world:
        from scrapy_products_tracker_spark.synth import (
            BENCH, SCALING, T1_SMOKE, T2_CORRECTNESS, generate_world, write_world,
        )

        spec = {"T1": T1_SMOKE, "T2": T2_CORRECTNESS, "BENCH": BENCH, "SCALING": SCALING}[
            args.generate_world
        ]
        write_world(generate_world(spec), args.world)

    store = SnapshotParquetStore(args.store)
    cfg = CrawlConfig(
        chunk_size=args.chunk_size,
        n_salts=args.n_salts,
        session=args.session,
        inline_retries=args.inline_retries,
        reencode_payload=args.reencode_payload,
        simulate_latency_scale=args.simulate_latency_scale,
    )
    srv = None
    fetch_fn = None
    if args.serve_world:
        import pandas as pd

        from scrapy_products_tracker_spark.synth import WorldHTTPServer

        srv = WorldHTTPServer(pd.read_parquet(f"{args.world}/pages.parquet"))
        args.fetch_http = srv.start()
    if args.fetch_http:
        from scrapy_products_tracker_spark.fetchers.http import fetch_http

        base = None if args.fetch_http == "direct" else args.fetch_http
        fetch_fn = lambda claimed, rnd: fetch_http(claimed, base_url=base)  # noqa: E731

    drv = CrawlDriver(
        spark,
        store,
        # with a socket fetcher the pages table is only the server's
        # corpus, never the driver's — pass None to prove it
        None if fetch_fn is not None else spark.read.parquet(f"{args.world}/pages.parquet"),
        spark.read.parquet(f"{args.world}/image_caption.parquet"),
        load_robots(spark, f"{args.world}/robots.parquet"),
        cfg,
        fetch_fn=fetch_fn,
    )
    if store.latest_version() is None:
        drv.seed(spark.read.parquet(f"{args.world}/seeds.parquet"))

    t0 = time.monotonic()
    try:
        meta = drv.run(max_rounds=args.max_rounds)
    finally:
        if srv is not None:
            srv.stop()
    wall = time.monotonic() - t0
    c = meta["counters"]
    fetched = c["urls_fetched"] + c["urls_failed_hw"] + c["urls_failed_logic"]
    print(json.dumps({
        "rounds": meta["round"],
        "wall_s": round(wall, 2),
        "urls_per_s": round(fetched / wall, 2) if wall > 0 else None,
        "counters": c,
        "snapshot": store.latest_version(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
