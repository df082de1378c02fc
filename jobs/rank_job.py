"""spark-submit entry point for importance re-prioritization: PageRank
or HITS over the crawl-recorded link graph, written back onto the
frontier's ``priority`` claim key.

    spark-submit --master <cluster-master> \
        --py-files dist/scrapy_products_tracker_spark.zip \
        jobs/rank_job.py --store /path/to/store_dir \
        [--method pagerank|hits_hub|hits_auth] [--iters 3]

Requires a store crawled with ``CrawlConfig(record_link_edges=True)``
(the edge table is append-only; this job may run while no crawl round
is committing — it uses optimistic concurrency like every commit).
Run it between sessions or every K rounds, like compaction; the next
claim follows importance order (crawl/rank.py).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", required=True)
    ap.add_argument("--method", default="pagerank",
                    choices=["pagerank", "hits_hub", "hits_auth"])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from scrapy_products_tracker_spark.crawl.rank import reprioritize_frontier
    from scrapy_products_tracker_spark.frontier import SnapshotParquetStore

    spark = SparkSession.builder.getOrCreate()
    store = SnapshotParquetStore(args.store)
    out = reprioritize_frontier(spark, store, method=args.method, iters=args.iters)
    if out is None:
        out = {"method": args.method, "n_edges": 0,
               "skipped": "no link_edges recorded (CrawlConfig.record_link_edges)"}
    out["store"] = args.store
    print(json.dumps(out))


if __name__ == "__main__":
    main()
