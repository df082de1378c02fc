"""Distributed WordPiece tokenizer training + greedy segmentation.

The third tokenizer family next to BPE (functions/bpe.py) and
Unigram-LM (functions/unigram.py): WordPiece (Schuster & Nakajima,
ICASSP'12 — the BERT tokenizer) runs the same merge loop as BPE but
scores candidate merges by *likelihood gain* rather than raw count:

    score(l, r) = count(l,r) / (count(l) * count(r))

— a pair of individually-rare pieces that almost always co-occur
merges before a pair of ubiquitous pieces that merely collide often.
Segmentation is NOT merge-replay: BERT tokenizes each word by greedy
longest-match-first against the final vocab, with continuation pieces
prefixed ``##`` and whole-word ``[UNK]`` on any miss.

Distributed shape (same skeleton as bpe_train, one extra narrow agg):
per round (1) explode adjacent piece pairs weighted by word count and
aggregate ``(left, right) -> pair_count``; (2) explode pieces and
aggregate ``piece -> count`` (both map-side combinable, 8-byte-ish
rows); (3) join the two (pair rows ⋈ tiny piece-count table) and take
the deterministic argmax. The rewrite is the row-local non-overlapping
fold shared with BPE.

Determinism contract: the score is fixed-point **femto units**
``score_femto = pair_count * 10^15 div (count(l) * count(r))``
computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB oracle) so the
intermediate products are exact up to 10^38 — no float anywhere, and
``pair_count <= min(count(l), count(r))`` bounds the result under
10^15, comfortably int64. Argmax tie-break: (score desc, pair_count
desc, left asc, right asc) — a pure function of the corpus.

Reference scope note: like BPE/Unigram this exists for the north-rule
training-data pipeline; the reference has no tokenizer.
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

from .bpe import _merge_fold, word_histogram

WP_MERGE_SCHEMA = StructType(
    [
        StructField("rank", LongType()),
        StructField("left", StringType()),
        StructField("right", StringType()),
        StructField("pair_count", LongType()),
        StructField("score_femto", LongType()),
    ]
)

CONT = "##"


def wp_merged_name(left: str, right: str) -> str:
    """The merged piece keeps the left's prefix status; the right's
    continuation marker is consumed by the join."""
    return left + (right[len(CONT):] if right.startswith(CONT) else right)


def _wp_init_pieces(word_col):
    """word -> [c0, ##c1, ##c2, ...] (WordPiece initial alphabet)."""
    chars = F.split(word_col, "")
    return F.concat(
        F.slice(chars, 1, 1),
        F.transform(
            F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0))),
            lambda c: F.concat(F.lit(CONT), c),
        ),
    )


_SCORE_EXPR = (
    "CAST(CAST(pair_count AS DECIMAL(38,0)) * 1000000000000000 div "
    "(CAST(_lc AS DECIMAL(38,0)) * CAST(_rc AS DECIMAL(38,0))) AS LONG)"
)


def wordpiece_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` WordPiece merges; returns ``(rank, left,
    right, pair_count, score_femto)`` in learned order. Stops early
    when no pair reaches ``min_pair_count``."""
    if n_merges <= 0:
        raise ValueError("n_merges must be > 0")
    spark = df.sparkSession
    pieces = (
        word_histogram(df, text_col)
        .select(_wp_init_pieces(F.col("word")).alias("pieces"), "count")
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int, int]] = []
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
        piece_counts = (
            pieces.select(F.explode("pieces").alias("_pc"), "count")
            .groupBy("_pc")
            .agg(F.sum("count").alias("_n"))
        )
        scored = (
            pairs.join(
                piece_counts.select(
                    F.col("_pc").alias("left"), F.col("_n").alias("_lc")
                ),
                "left",
            )
            .join(
                piece_counts.select(
                    F.col("_pc").alias("right"), F.col("_n").alias("_rc")
                ),
                "right",
            )
            .withColumn("score_femto", F.expr(_SCORE_EXPR))
        )
        # the count floor filters the CANDIDATE set, not the winner:
        # likelihood scoring maximizes exactly the rare pairs (two hapax
        # pieces that co-occur once score the full 10^15), so a winner-
        # side check would halt training on a count-1 pair while
        # frequent mergeable pairs still exist. Stop only when no pair
        # survives the floor.
        best = (
            scored.filter(F.col("pair_count") >= min_pair_count)
            .orderBy(
                F.col("score_femto").desc(),
                F.col("pair_count").desc(),
                F.col("left"),
                F.col("right"),
            )
            .head(1)
        )
        if not best:
            break
        left, right = best[0]["left"], best[0]["right"]
        merges.append(
            (rank, left, right, int(best[0]["pair_count"]), int(best[0]["score_femto"]))
        )
        pieces = pieces.select(
            _merge_fold(
                F.col("pieces"), left, right, wp_merged_name(left, right)
            ).alias("pieces"),
            "count",
        ).localCheckpoint()
    return spark.createDataFrame(merges, WP_MERGE_SCHEMA)


def wordpiece_vocab(df: DataFrame, merges, text_col: str = "text") -> list[str]:
    """Final vocab = corpus alphabet (first-char + ##continuation
    forms) + the merged pieces, sorted. ``merges`` is the trained
    table (DataFrame or (left, right) iterable). The alphabet agg is
    one narrow distinct; the returned list is O(vocab) — the same
    documented tiny-collect contract as the BPE/Unigram merge tables."""
    alpha = {
        r["p"]
        for r in word_histogram(df, text_col)
        .select(F.explode(_wp_init_pieces(F.col("word"))).alias("p"))
        .distinct()
        .collect()
    }
    if isinstance(merges, DataFrame):
        merges = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    vocab = set(alpha)
    for left, right in merges:
        vocab.add(wp_merged_name(left, right))
    return sorted(vocab)


def wordpiece_segment(
    df: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    unk: str = "[UNK]",
) -> DataFrame:
    """BERT greedy longest-match-first tokenization against ``vocab``:
    per word, take the longest vocab prefix, continue with ``##``
    pieces; ANY miss makes the whole word ``[UNK]`` (BERT semantics).
    Returns ``(id, tokens, n_wp_tokens)`` via one Arrow-batched
    kernel (vocab is a closure set — O(vocab), broadcast with the
    task). NULL/blank text -> empty tokens."""
    vs = frozenset(vocab)
    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType),
            StructField("tokens", ArrayType(StringType())),
            StructField("n_wp_tokens", LongType()),
        ]
    )

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        out: list[str] = []
        i, first = 0, True
        while i < len(word):
            for j in range(len(word), i, -1):
                cand = word[i:j] if first else CONT + word[i:j]
                if cand in vs:
                    out.append(cand)
                    i = j
                    first = False
                    break
            else:
                out = [unk]
                break
        cache[word] = out
        return out

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
                    "n_wp_tokens": [len(x) for x in toks],
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)
