"""Distributed BPE tokenizer training + segmentation.

A training-data pipeline at 100 TB doesn't just COUNT tokens — it
trains the tokenizer (GPT-2/Sennrich et al. 2016 byte-pair encoding)
over the corpus it curated. The classic trainer is a driver-side
heap over a word histogram; the distributed shape here keeps the
histogram a DataFrame and makes each merge round one narrow
aggregation:

1. **word histogram** — one groupBy over whitespace words (the
   standard BPE-training reduction: merges never cross word
   boundaries, so the corpus collapses to ``(word, count)`` — ~10^8
   distinct words at web scale, trivially partitioned);
2. **merge rounds** — per round, explode each word's adjacent piece
   pairs weighted by word count, aggregate ``(left, right) -> total``
   (8-byte-ish rows, map-side combinable), take the argmax (count
   desc, then lexicographic — fully deterministic), and rewrite the
   piece arrays with a row-local left-to-right non-overlapping fold
   (`F.aggregate`, no Python). ``localCheckpoint`` cuts the growing
   lineage each round (same discipline as
   ``dedup/text_corpus.min_label_components``).

Each round costs one narrow shuffle + one 1-row collect; n_merges
rounds is the honest distributed trainer (real single-node trainers
amortize with heap delta-updates, which do not distribute; at fleet
scale the histogram agg dominates and rounds pipeline through AQE).

Segmentation (:func:`bpe_segment`) applies a learned merge table to
new text as ONE Arrow-batched kernel (the merge list broadcasts;
applying R merges as R chained column folds would build an R-deep
plan — the kernel applies them in rank order per word in Python,
vectorized over Arrow batches).

Reference scope note: the reference has no tokenizer (it ships
product rows to MySQL); this operator family exists for the
north-rule training-data pipeline, next to token counting
(functions/text.token_count, bpe_token_count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MERGE_SCHEMA = StructType(
    [
        StructField("rank", LongType()),
        StructField("left", StringType()),
        StructField("right", StringType()),
        StructField("pair_count", LongType()),
    ]
)


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over whitespace tokens — the BPE training
    reduction. NULL/blank text contributes nothing."""
    words = df.select(
        F.explode(
            F.when(
                F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""),
                F.split(F.trim(F.col(text_col)), r"\s+"),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").alias("count"))


def _merge_fold(pieces_col, left: str, right: str, merged: str | None = None):
    """Left-to-right non-overlapping rewrite of adjacent (left, right)
    piece pairs into one merged piece — the BPE merge application as a
    row-local fold (no Python, no shuffle). ``merged`` defaults to the
    BPE concatenation; WordPiece passes its ##-stripped join."""
    if merged is None:
        merged = left + right
    return F.aggregate(
        pieces_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over ``df[text_col]``; returns the
    merge table ``(rank, left, right, pair_count)`` in learned order.

    Deterministic: the argmax tie-breaks by (count desc, left asc,
    right asc), so the merge table is a pure function of the corpus —
    partitioning, insertion order, and parallelism cannot change it.
    Training stops early when no pair reaches ``min_pair_count``.

    Simplification vs GPT-2: plain character alphabet (no byte
    fallback, no end-of-word marker) — the merge DYNAMICS (histogram,
    argmax, non-overlapping rewrite) are the real thing; alphabet
    choices are orthogonal plumbing."""
    if n_merges <= 0:
        raise ValueError("n_merges must be > 0")
    spark = df.sparkSession
    pieces = (
        word_histogram(df, text_col)
        .select(F.split("word", "").alias("pieces"), "count")
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            pieces.filter(F.size("pieces") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("pieces") - 1),
                        lambda i: F.struct(
                            F.element_at("pieces", i).alias("l"),
                            F.element_at("pieces", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
                "count",
            )
            .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
            .agg(F.sum("count").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.col("pair_count").desc(), F.col("left"), F.col("right")
        ).head(1)
        if not best or best[0]["pair_count"] < min_pair_count:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], int(best[0]["pair_count"])
        merges.append((rank, left, right, cnt))
        pieces = pieces.select(
            _merge_fold(F.col("pieces"), left, right).alias("pieces"), "count"
        ).localCheckpoint()
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word, apply
    every merge in rank order (left-to-right non-overlapping — the
    exact inverse-dynamics of :func:`bpe_train`'s fold). Returns
    ``(id, tokens array<string>, n_bpe_tokens)``.

    One Arrow-batched ``mapInPandas`` kernel; the merge table is a
    plain Python list captured in the closure (broadcast with the
    task — merge tables are O(vocab), tiny). NULL/blank text ->
    empty tokens."""
    ranked = list(merges)
    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType),
            StructField("tokens", ArrayType(StringType())),
            StructField("n_bpe_tokens", LongType()),
        ]
    )

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        ps = list(word)
        for left, right in ranked:
            if len(ps) < 2:
                break
            out, i = [], 0
            while i < len(ps):
                if i + 1 < len(ps) and ps[i] == left and ps[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(ps[i])
                    i += 1
            ps = out
        cache[word] = ps
        return ps

    def kernel(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                if t is None or not str(t).strip():
                    toks.append([])
                    continue
                row: list[str] = []
                for w in str(t).split():
                    row.extend(encode_word(w, cache))
                toks.append(row)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "tokens": toks,
                    "n_bpe_tokens": [len(x) for x in toks],
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)
