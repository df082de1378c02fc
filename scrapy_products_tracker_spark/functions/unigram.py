"""Distributed Unigram-LM tokenizer training + segmentation
(SentencePiece's unigram model, Kudo '18 — public) — the second
tokenizer family next to BPE (functions/bpe.py): instead of greedy
merges, a vocabulary of substring pieces with log-prob scores, EM-
refined, applied by Viterbi best-segmentation.

Deterministic, engine-portable spec (every tie broken totally):

1. **word histogram** — the same ``(word, count)`` reduction BPE
   trains on (one groupBy; merges/pieces never cross whitespace).
2. **candidate init** — every substring of every distinct word with
   ``1 <= len <= max_piece_len``; each START POSITION counts once,
   weighted by the word's corpus count (pure column algebra: nested
   ``transform`` over index sequences + ``substr``, one piece-keyed
   aggregate).  Single characters are always vocabulary members (so
   Viterbi can never fail); multi-char candidates below ``min_count``
   drop.
3. **scores** — integer micro-nats: ``floor(ln(count / total) * 1e6)``
   computed in Python (the engine's kernel and the oracle builder run
   the identical computation on identical int64 counts — the
   fixed-point discipline every cross-engine op here uses).
4. **EM rounds** — E-step: Viterbi-segment each DISTINCT WORD with
   the current scores (one Arrow-batched kernel over the word
   histogram; the vocab table is collected and closure-broadcast —
   size-capped at ``vocab_size``, the same documented contract as the
   IVF centroid tables).  Viterbi maximizes total score; ties prefer
   FEWER tokens, then the lexicographically smallest token tuple.
   M-step: piece counts = segmentation occurrences weighted by word
   count (one piece-keyed aggregate), rescore.  Unseen single chars
   segment at ``UNK_SCORE``.
5. **prune** — keep all single chars plus the top
   ``vocab_size - n_chars`` multi-char pieces by (count desc, piece
   asc); rescore once more.  (Real SentencePiece prunes by EM loss
   delta; frequency pruning keeps the spec integer-exact — the EM
   DYNAMICS are the real thing, the pruning criterion is orthogonal.)

Scale notes: per EM round = one Arrow kernel pass over the word
histogram (10^8 distinct words at web scale, partition-parallel) +
one narrow piece-keyed aggregate + one vocab-sized collect; the same
honest distributed shape as ``bpe_train``'s per-merge round, with the
round count FIXED (2-3 EM iterations) instead of O(vocab).

Reference scope note: the reference has no tokenizer; this family
exists for the north-rule training-data pipeline.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .bpe import word_histogram

UNK_SCORE = -20_000_000  # micro-nats; any in-vocab piece beats it

VOCAB_SCHEMA = StructType(
    [
        StructField("piece", StringType()),
        StructField("count", LongType()),
        StructField("score", LongType()),
    ]
)


def _rescore(counts: dict[str, int]) -> dict[str, int]:
    """piece -> micro-nat log-prob from int64 counts (identical
    arithmetic in the oracle builder)."""
    total = sum(counts.values())
    return {
        p: math.floor(math.log(c / total) * 1_000_000) for p, c in counts.items() if c > 0
    }


def viterbi_tokens(word: str, scores: dict[str, int], max_piece_len: int) -> list[str]:
    """Best segmentation of one word under integer piece scores.
    Maximize score sum; ties -> fewer tokens -> lexicographically
    smallest token tuple. Out-of-vocab single chars cost UNK_SCORE."""
    n = len(word)
    # state: (sum, -n_tokens, tokens tuple) — compare in that order
    best: list[tuple[int, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (0, 0, ())
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            prev = best[j]
            if prev is None:
                continue
            piece = word[j:i]
            s = scores.get(piece)
            if s is None:
                if len(piece) > 1:
                    continue
                s = UNK_SCORE
            cand = (prev[0] + s, prev[1] - 1, prev[2] + (piece,))
            cur = best[i]
            if (
                cur is None
                or cand[0] > cur[0]
                or (cand[0] == cur[0] and cand[1] > cur[1])
                or (cand[0] == cur[0] and cand[1] == cur[1] and cand[2] < cur[2])
            ):
                best[i] = cand
    assert best[n] is not None  # single chars always segmentable
    return list(best[n][2])


def _candidate_counts(hist: DataFrame, max_piece_len: int) -> DataFrame:
    """(piece, count): every start position of every substring with
    len <= max_piece_len, weighted by word count — pure column
    algebra, one piece-keyed aggregate."""
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda s: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_piece_len), F.length(w) - s + 1)),
                lambda l: w.substr(s, l),
            ),
        )
    )
    return (
        hist.select(F.explode(subs).alias("piece"), "count")
        .groupBy("piece")
        .agg(F.sum("count").alias("count"))
    )


def _estep_counts(
    hist: DataFrame, scores: dict[str, int], max_piece_len: int
) -> DataFrame:
    """M-step input: Viterbi-segment each distinct word, emit piece
    occurrences weighted by word count. One Arrow kernel + one
    piece-keyed aggregate."""
    out_schema = StructType(
        [StructField("piece", StringType()), StructField("count", LongType())]
    )

    def kernel(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            pieces: list[str] = []
            counts: list[int] = []
            for word, cnt in zip(pdf["word"], pdf["count"]):
                toks = cache.get(word)
                if toks is None:
                    toks = viterbi_tokens(str(word), scores, max_piece_len)
                    cache[word] = toks
                for t in toks:
                    pieces.append(t)
                    counts.append(int(cnt))
            yield pd.DataFrame({"piece": pieces, "count": counts})

    return (
        hist.mapInPandas(kernel, out_schema)
        .groupBy("piece")
        .agg(F.sum("count").alias("count"))
    )


def unigram_train(
    df: DataFrame,
    vocab_size: int,
    n_iters: int = 2,
    max_piece_len: int = 4,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Learn a unigram-LM vocabulary over ``df[text_col]``; returns
    ``(piece, count, score)`` (score in micro-nats), a pure function
    of the corpus — partitioning/parallelism cannot change it."""
    if vocab_size <= 0:
        raise ValueError("vocab_size must be > 0")
    spark = df.sparkSession
    hist = word_histogram(df, text_col).localCheckpoint()

    cand = _candidate_counts(hist, max_piece_len)
    keep = cand.filter((F.length("piece") == 1) | (F.col("count") >= F.lit(min_count)))
    counts = {r["piece"]: int(r["count"]) for r in keep.collect()}
    scores = _rescore(counts)

    chars = {p for p in counts if len(p) == 1}
    for _ in range(n_iters):
        em = _estep_counts(hist, scores, max_piece_len)
        new_counts = {r["piece"]: int(r["count"]) for r in em.collect()}
        # single chars never leave the vocabulary (Viterbi's floor);
        # chars unused this round survive at count 1
        for c in chars:
            new_counts.setdefault(c, 1)
        counts = new_counts
        scores = _rescore(counts)

    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )
    n_multi = max(0, vocab_size - len(chars))
    final = {p: counts.get(p, 1) for p in chars}
    final.update(dict(multi[:n_multi]))
    fscores = _rescore(final)
    rows = sorted(
        (p, final[p], fscores[p]) for p in final
    )
    return spark.createDataFrame(rows, VOCAB_SCHEMA)


def unigram_segment(
    df: DataFrame,
    vocab: list[tuple[str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 4,
) -> DataFrame:
    """Tokenize ``text_col`` by per-word Viterbi under a learned
    ``(piece, score)`` vocab (closure-broadcast, O(vocab) — tiny).
    Returns ``(id, tokens, n_tokens)``; NULL/blank text -> empty."""
    scores = {p: int(s) for p, s in vocab}
    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType),
            StructField("tokens", ArrayType(StringType())),
            StructField("n_tokens", LongType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col = []
            for t in pdf[text_col]:
                if t is None or not str(t).strip():
                    toks_col.append([])
                    continue
                row: list[str] = []
                for w in str(t).split():
                    toks = cache.get(w)
                    if toks is None:
                        toks = viterbi_tokens(w, scores, max_piece_len)
                        cache[w] = toks
                    row.extend(toks)
                toks_col.append(row)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "tokens": toks_col,
                    "n_tokens": [len(t) for t in toks_col],
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)
