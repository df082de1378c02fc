"""spark-submit entry point for store maintenance (Iceberg
table-maintenance analog): frontier rebucketing, Bloom seen-set
resize, saturation report, snapshot GC.

    spark-submit --master <cluster-master> \
        --py-files dist/scrapy_products_tracker_spark.zip \
        jobs/maintain_job.py --store /path/to/store_dir \
        [--fill-stats] [--rebucket-factor 2] [--rebuild-seen-scale 2] \
        [--expire-keep 3]

Run it between crawl sessions (like Iceberg compaction): every action
commits a normal snapshot, so an interrupted maintenance run leaves
the previous state fully intact, and in-flight crawls resume on
either side of the pointer flip (tests/test_maintenance.py pins that
maintenance is invisible to crawl semantics). ``--fill-stats`` prints
a JSON saturation summary you alert on; the two mutating flags apply
only when given.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", required=True)
    ap.add_argument("--fill-stats", action="store_true", help="print Bloom saturation summary")
    ap.add_argument("--rebucket-factor", type=int, default=None)
    ap.add_argument("--rebuild-seen-scale", type=int, default=None)
    ap.add_argument("--expire-keep", type=int, default=None, help="GC, keep last N snapshots")
    ap.add_argument(
        "--compact-appendlogs", action="store_true",
        help="rewrite multi-dir append logs (results/crawl_order/history/link_edges) as one dir each",
    )
    ap.add_argument("--compact-target-files", type=int, default=32)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from scrapy_products_tracker_spark.dedup.seen_table import bloom_fill_stats
    from scrapy_products_tracker_spark.frontier import SnapshotParquetStore

    spark = SparkSession.builder.getOrCreate()
    store = SnapshotParquetStore(args.store)
    out: dict = {"store": args.store, "version": store.latest_version()}

    if args.fill_stats:
        m = store.read_manifest()
        seen = m.get("seen") if m else None
        if seen and seen["kind"] == "bloom":
            p = seen["params"]
            shards = spark.read.parquet(
                *[str(store.root / f) for f in seen["files"].values()]
            )
            agg = (
                bloom_fill_stats(shards, int(p["bits"]), int(p["k"]))
                .agg(
                    F.count("*").alias("shards"),
                    F.max("fill_milli").alias("max_fill_milli"),
                    F.avg("fill_milli").alias("avg_fill_milli"),
                    F.max("est_fp_micro").alias("max_est_fp_micro"),
                    F.sum("est_keys").alias("est_keys_total"),
                )
                .collect()[0]
            )
            out["fill_stats"] = {k: (float(v) if v is not None else None) for k, v in agg.asDict().items()}
        else:
            out["fill_stats"] = None

    if args.rebucket_factor:
        out["rebucket_version"] = store.rebucket_frontier(spark, args.rebucket_factor)
        out["n_buckets"] = store.frontier_n_buckets()
    if args.rebuild_seen_scale:
        out["rebuild_seen_version"] = store.rebuild_seen(spark, scale=args.rebuild_seen_scale)
    if args.compact_appendlogs:
        out["compact"] = store.compact_appendlogs(
            spark, target_files=args.compact_target_files
        )
    if args.expire_keep is not None:
        store.expire_snapshots(keep_last=args.expire_keep)
        out["expired_to_keep"] = args.expire_keep

    print(json.dumps(out))


if __name__ == "__main__":
    main()
