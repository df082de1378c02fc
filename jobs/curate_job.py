"""spark-submit entry point for the curation funnels: run the image
or text curation pipeline over parquet in / parquet out.

    spark-submit --master <cluster-master> \
        --py-files dist/scrapy_products_tracker_spark.zip \
        jobs/curate_job.py --mode image --input pairs.parquet \
        --output curated/ [--sample-target N] [--shard-budget-bytes B]

    spark-submit ... jobs/curate_job.py --mode text \
        --input documents.parquet --output curated/ \
        [--min-tokens 30] [--min-quality 0.7] [--lang en] \
        [--threshold 0.8] [--transitive] [--balance-col source] \
        [--sample-target N] [--seq-len 2048] [--range-col crawl_bucket] \
        [--classifier-target-lang en [--classifier-margin-unats M]] \
        [--nfc] [--scrub-pii] [--dedup-lines] [--min-zratio-milli R]

``--mode image`` expects the north-rule input table
``(image_id, bytes, w, h, fmt, caption, phash)`` and runs
``imaging/dataset.curate`` (LAION filters -> exact-bytes dedup ->
temperature balance -> shard packing); ``--mode text`` expects
``(doc_id, text, …)`` and runs ``dedup/text_corpus.curate_corpus``
(quality filter -> exact+MinHash-LSH dedup -> temperature balance ->
sequence packing). Both write the surviving rows (plus the funnel's
verdict columns) as parquet and print one JSON summary line —
the same one-process-per-job deployment shape as jobs/crawl_job.py.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("image", "text"), required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-tokens", type=int, default=30)
    ap.add_argument("--min-quality", type=float, default=0.7)
    ap.add_argument("--lang", default=None)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--transitive", action="store_true")
    ap.add_argument("--balance-col", default=None)
    ap.add_argument("--sample-target", type=int, default=None)
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--range-col", default=None)
    ap.add_argument(
        "--classifier-target-lang",
        default=None,
        help="enable the learned NB quality gate (text mode): train "
        "target-vs-background with rows whose lang column equals this "
        "value as the target class",
    )
    ap.add_argument("--classifier-margin-unats", type=int, default=0)
    ap.add_argument("--scrub-pii", action="store_true")
    ap.add_argument("--nfc", action="store_true")
    ap.add_argument("--dedup-lines", action="store_true")
    ap.add_argument("--min-zratio-milli", type=int, default=None)
    ap.add_argument("--scrub-metadata", action="store_true")
    ap.add_argument("--ppl-drop-tail", action="store_true")
    ap.add_argument("--ppl-group-col", default=None)
    ap.add_argument("--min-caption-tokens", type=int, default=4)
    ap.add_argument("--min-side-px", type=int, default=16)
    ap.add_argument("--max-aspect-milli", type=int, default=3000)
    ap.add_argument("--shard-budget-bytes", type=int, default=None)
    ap.add_argument("--min-colorfulness-milli", type=int, default=None)
    ap.add_argument("--drop-grayscale", action="store_true")
    ap.add_argument("--flesch-lo-milli", type=int, default=None)
    ap.add_argument("--flesch-hi-milli", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    df = spark.read.parquet(args.input)
    n_in = df.count()

    if args.mode == "image":
        from scrapy_products_tracker_spark.imaging.dataset import curate

        out = curate(
            df,
            min_caption_tokens=args.min_caption_tokens,
            min_side_px=args.min_side_px,
            max_aspect_milli=args.max_aspect_milli,
            balance_col=args.balance_col or "fmt",
            sample_target=args.sample_target,
            shard_budget_bytes=args.shard_budget_bytes,
            range_col=args.range_col,
            scrub_metadata=args.scrub_metadata,
            min_colorfulness_milli=args.min_colorfulness_milli,
            drop_grayscale=args.drop_grayscale,
        )
    else:
        from pyspark.sql import functions as F

        from scrapy_products_tracker_spark.dedup import curate_corpus

        out = curate_corpus(
            df,
            min_tokens=args.min_tokens,
            min_quality=args.min_quality,
            lang=args.lang,
            threshold=args.threshold,
            transitive=args.transitive,
            balance_col=args.balance_col,
            sample_target=args.sample_target,
            seq_len=args.seq_len,
            range_col=args.range_col,
            classifier_target=(
                F.col("lang") == F.lit(args.classifier_target_lang)
                if args.classifier_target_lang is not None
                else None
            ),
            classifier_margin_unats=args.classifier_margin_unats,
            scrub_pii=args.scrub_pii,
            nfc=args.nfc,
            dedup_lines=args.dedup_lines,
            min_zratio_milli=args.min_zratio_milli,
            flesch_range_milli=(
                (args.flesch_lo_milli, args.flesch_hi_milli)
                if args.flesch_lo_milli is not None
                and args.flesch_hi_milli is not None
                else None
            ),
            ppl_drop_tail=args.ppl_drop_tail,
            ppl_group_col=args.ppl_group_col,
        )

    out.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "mode": args.mode,
                "input": args.input,
                "output": args.output,
                "rows_in": n_in,
                "rows_out": n_out,
                "kept_frac_milli": (1000 * n_out) // n_in if n_in else None,
            }
        )
    )


if __name__ == "__main__":
    main()
