"""spark-submit entry point for tokenizer training + corpus
tokenization — the step between the curated corpus and packed
training sequences:

    spark-submit --master <cluster-master> \
        --py-files dist/scrapy_products_tracker_spark.zip \
        jobs/tokenize_job.py --family bpe --input documents.parquet \
        --output toks/ --n-merges 200

    spark-submit ... jobs/tokenize_job.py --family unigram \
        --input documents.parquet --output toks/ \
        --vocab-size 8000 [--n-iters 2] [--max-piece-len 4]

    spark-submit ... jobs/tokenize_job.py --family wordpiece \
        --input documents.parquet --output toks/ --n-merges 200

Trains the chosen tokenizer family over the input corpus
(``functions/bpe.py`` merge rounds or ``functions/unigram.py`` EM),
writes the learned model table (``<output>/model/`` — the merge table
or the scored vocab) and the tokenized corpus
(``<output>/tokens/`` — id, tokens, n_tokens), and prints one JSON
summary line, the same one-process-per-job shape as jobs/crawl_job.py.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--family", choices=("bpe", "unigram", "wordpiece"), required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n-merges", type=int, default=100)
    ap.add_argument("--vocab-size", type=int, default=4000)
    ap.add_argument("--n-iters", type=int, default=2)
    ap.add_argument("--max-piece-len", type=int, default=4)
    ap.add_argument("--min-count", type=int, default=2)
    args = ap.parse_args(argv)

    from scrapy_products_tracker_spark.session import get_spark

    spark = get_spark(app_name="tokenize_job")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    docs = spark.read.parquet(args.input)

    if args.family == "bpe":
        from scrapy_products_tracker_spark.functions.bpe import bpe_segment, bpe_train

        model = bpe_train(docs, n_merges=args.n_merges, text_col=args.text_col,
                          min_pair_count=args.min_count)
        model.write.mode("overwrite").parquet(args.output + "/model")
        merges = [(r["left"], r["right"]) for r in model.orderBy("rank").collect()]
        toks = bpe_segment(docs, merges, id_col=args.id_col, text_col=args.text_col)
        toks = toks.withColumnRenamed("n_bpe_tokens", "n_tokens")
        model_rows = len(merges)
    elif args.family == "wordpiece":
        from scrapy_products_tracker_spark.functions.wordpiece import (
            wordpiece_segment,
            wordpiece_train,
            wordpiece_vocab,
        )

        model = wordpiece_train(docs, n_merges=args.n_merges,
                                text_col=args.text_col,
                                min_pair_count=args.min_count)
        model.write.mode("overwrite").parquet(args.output + "/model")
        vocab = wordpiece_vocab(docs, model, text_col=args.text_col)
        toks = wordpiece_segment(docs, vocab, id_col=args.id_col,
                                 text_col=args.text_col)
        toks = toks.withColumnRenamed("n_wp_tokens", "n_tokens")
        model_rows = model.count()
    else:
        from scrapy_products_tracker_spark.functions.unigram import (
            unigram_segment,
            unigram_train,
        )

        model = unigram_train(
            docs,
            vocab_size=args.vocab_size,
            n_iters=args.n_iters,
            max_piece_len=args.max_piece_len,
            min_count=args.min_count,
            text_col=args.text_col,
        )
        model.write.mode("overwrite").parquet(args.output + "/model")
        vocab = [(r["piece"], r["score"]) for r in model.collect()]
        toks = unigram_segment(
            docs, vocab, id_col=args.id_col, text_col=args.text_col,
            max_piece_len=args.max_piece_len,
        )
        model_rows = len(vocab)

    toks.write.mode("overwrite").parquet(args.output + "/tokens")
    agg = spark.read.parquet(args.output + "/tokens").agg(
        {"n_tokens": "sum", "id": "count"}
    ).collect()[0]
    print(json.dumps({
        "family": args.family,
        "model_rows": model_rows,
        "docs": int(agg["count(id)"]),
        "total_tokens": int(agg["sum(n_tokens)"] or 0),
        "wall_s": round(time.time() - t0, 3),
    }))


if __name__ == "__main__":
    main()
