"""Cross-document exact substring dedup (ExactSubstr idiom).

Removes/marks *sliding-window* duplicated token spans across the whole
corpus — the training-data dedup family of Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better"), distinct
from the stride-chunk paragraph dedup in ``functions/text.py``
(paragraph_dedup_stats): here every k-token window at every position is
a candidate, so a phrase copied mid-sentence between two documents is
found even when chunk boundaries disagree.

Semantics (first-wins, deterministic):

- tokens = whitespace split of ``lower(trim(text))`` (same tokenizer as
  the paragraph/Gopher operators);
- every position ``p`` in ``1..n-k+1`` yields the k-gram
  ``tokens[p:p+k-1]``;
- an occurrence ``(doc, p)`` is DUPLICATED iff the same k-gram occurs
  earlier in global ``(doc_id, pos)`` order (row_number > 1 over the
  gram key) — the first occurrence anywhere in the corpus is canonical
  and survives, all later copies (cross-doc or self-repetition) are
  marked;
- duplicated occurrences cover token interval ``[p, p+k-1]``;
  overlapping intervals per doc are merged (gaps-and-islands) before
  counting, so stats are in tokens-of-text, not in overlapping windows.

Scale notes (100 TB):
- one exchange keyed on the gram, one keyed on doc_id — no all-pairs
  operator anywhere (plan-pinned in tests/test_substring_dedup.py);
- ``hash_grams=True`` (default) shuffles 8-byte ``xxhash64`` keys
  instead of ~100-byte gram strings — the narrow-shuffle mode, same
  trick as ``winnow_fingerprints``. ``hash_grams=False`` groups on the
  gram text itself (collision-free; the DuckDB oracle twin uses this
  mode). Both modes are property-tested equal.
- the interval merge is pure window algebra over (doc, start) — the
  running-max-end island trick — so the per-doc state is O(1), not
  O(spans).

Reference behavior note: the reference has no corpus dedup at all (its
dedup is MySQL UNIQUE(url) — ``src/python/src/utils/read_csv.py:67-70``);
this operator is part of the training-data pipeline family layered on
top of the crawl (documents table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_col

__all__ = ["substring_dedup_stats", "substring_dedup_clean", "duplicated_spans"]


def _tokenized(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("_id"),
        F.coalesce(
            tokens_col(F.lower(F.col(text_col))), F.array().cast("array<string>")
        ).alias("_w"),
    ).withColumn("_n", F.size("_w"))


def duplicated_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    hash_grams: bool = True,
) -> DataFrame:
    """Merged duplicated-token intervals per document.

    Returns ``(id_col, span_start, span_end)`` — 1-based inclusive token
    positions of every maximal duplicated run (non-canonical sliding
    k-gram occurrences, overlap-merged). Plan: ONE gram-keyed exchange
    (8-byte key by default) + ONE doc-keyed exchange for the merge.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    toks = _tokenized(docs, id_col, text_col)
    gram = F.concat_ws(" ", F.slice("_w", F.col("_p"), k))
    occ = (
        toks.filter(F.col("_n") >= k)
        .select(
            "_id",
            F.explode(F.sequence(F.lit(1), F.col("_n") - k + 1)).alias("_p"),
            "_w",
        )
        .select(
            "_id",
            "_p",
            (F.xxhash64(gram) if hash_grams else gram).alias("_g"),
        )
    )
    # first occurrence in global (doc, pos) order is canonical; rest dup
    rn = F.row_number().over(Window.partitionBy("_g").orderBy("_id", "_p"))
    dup = occ.withColumn("_rn", rn).filter(F.col("_rn") > 1)
    spans = dup.select("_id", F.col("_p").alias("_s"), (F.col("_p") + k - 1).alias("_e"))
    # gaps-and-islands: a span opens a new island iff it starts past the
    # running max end of all earlier spans of the doc (starts are unique
    # per doc, so the order is total and both engines agree)
    w_doc = Window.partitionBy("_id").orderBy("_s")
    prev_max = F.max("_e").over(w_doc.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(prev_max.isNull() | (F.col("_s") > prev_max), 1).otherwise(0)
    islands = (
        spans.withColumn("_ni", new_island)
        .withColumn(
            "_isl",
            F.sum("_ni").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("_id", "_isl")
        .agg(F.min("_s").alias("span_start"), F.max("_e").alias("span_end"))
    )
    return islands.select(
        F.col("_id").alias(id_col),
        F.col("span_start").cast("int"),
        F.col("span_end").cast("int"),
    )


def substring_dedup_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    hash_grams: bool = True,
) -> DataFrame:
    """Per-doc duplicated-substring stats.

    ``(id_col, n_tokens, n_dup_tokens, n_dup_spans, dup_token_frac)``;
    ``dup_token_frac`` is NULL for empty docs, rounded to 6 places (the
    oracle-stable convention every frac column in this repo uses).
    """
    toks = _tokenized(docs, id_col, text_col)
    spans = duplicated_spans(
        docs, id_col=id_col, text_col=text_col, k=k, hash_grams=hash_grams
    )
    per_doc = spans.groupBy(F.col(id_col).alias("_id")).agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("_dup"),
        F.count("*").alias("_spans"),
    )
    joined = toks.select("_id", "_n").join(per_doc, "_id", "left")
    return joined.select(
        F.col("_id").alias(id_col),
        F.col("_n").cast("int").alias("n_tokens"),
        F.coalesce("_dup", F.lit(0)).cast("int").alias("n_dup_tokens"),
        F.coalesce("_spans", F.lit(0)).cast("int").alias("n_dup_spans"),
        F.when(
            F.col("_n") > 0,
            F.round(F.coalesce("_dup", F.lit(0)) / F.col("_n"), 6),
        ).alias("dup_token_frac"),
    )


def substring_dedup_clean(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    hash_grams: bool = True,
) -> DataFrame:
    """Rewrite each doc with its duplicated spans cut out.

    ``(id_col, clean_text)``: tokens covered by any merged duplicated
    span are dropped; canonical (first) occurrences survive untouched,
    so exactly one copy of every duplicated passage remains in the
    corpus. NULL/empty docs pass through as empty text. The span filter
    is row-local array algebra (transform index + exists over the doc's
    own islands) — no extra shuffle beyond ``duplicated_spans``.
    """
    toks = _tokenized(docs, id_col, text_col)
    isl = (
        duplicated_spans(docs, id_col=id_col, text_col=text_col, k=k, hash_grams=hash_grams)
        .groupBy(F.col(id_col).alias("_id"))
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("_isl"),
        )
    )
    joined = toks.join(isl, "_id", "left").withColumn(
        "_isl", F.coalesce("_isl", F.array())
    )
    # (token, 1-based pos) pairs, keep those outside every island
    pairs = F.transform(
        "_w", lambda t, i: F.struct(t.alias("t"), (i + 1).alias("p"))
    )
    kept = F.filter(
        pairs,
        lambda s: ~F.exists(
            F.col("_isl"),
            lambda iv: (s["p"] >= iv["span_start"]) & (s["p"] <= iv["span_end"]),
        ),
    )
    return joined.select(
        F.col("_id").alias(id_col),
        F.concat_ws(" ", F.transform(kept, lambda s: s["t"])).alias("clean_text"),
    )
