"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own extraction ops (SURVEY.md §2.7), a 100 TB
document pipeline needs language-ID, quality scoring, token counting
and fingerprinting. Everything here is pure ``pyspark.sql.functions``
column algebra — JVM-side, whole-stage-codegen'd, no Python UDFs —
so each op has an exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_STOPWORD_RE = r"\b(the|and|of|to|in|is|for|with|that|this)\b"
_PUNCT_RE = r"[.,!?;:]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (empty string -> empty array)."""
    t = F.trim(text)
    return F.when(t == "", F.array()).otherwise(F.split(t, r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


# GPT-2-style pre-tokenizer shape (public), simplified to the
# lookahead-free subset so the identical pattern runs on Java regex
# (Spark) and RE2 (DuckDB oracle): contractions, space-prefixed letter
# runs, digit runs, punctuation runs.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(text: Column) -> Column:
    """Sub-word-merge input units per doc — the BPE-ish twin of
    ``token_count`` (whitespace): what a GPT-2-family pre-tokenizer
    would hand to the merge table (the merge table itself is
    model-specific and out of scope). Pure column expression."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    n = F.length(text)
    p = n - F.length(F.regexp_replace(text, _PUNCT_RE, ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_hits(text: Column) -> Column:
    """Count of common-English stopword occurrences (lang-ID feature)."""
    return F.regexp_count(F.lower(text), F.lit(_STOPWORD_RE))


def avg_word_len(text: Column) -> Column:
    nt = token_count(text)
    total = F.length(F.regexp_replace(F.trim(text), r"\s+", ""))
    return F.when(nt > 0, total.cast("double") / nt.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane word
    length, low punctuation density, some stopwords (C4-style filters,
    public heuristics)."""
    nt = token_count(text).cast("double")
    len_ok = F.least(nt / F.lit(50.0), F.lit(1.0))
    wl = avg_word_len(text)
    wl_ok = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_ok = F.when(
        nt > 0, F.least(stopword_hits(text).cast("double") * F.lit(10.0) / nt, F.lit(1.0))
    ).otherwise(F.lit(0.0))
    return F.round((len_ok + wl_ok + punct_ok + stop_ok) / F.lit(4.0), 6)


def lang_guess(text: Column) -> Column:
    """N-gram-free language heuristic: English iff stopword density
    exceeds 2%. (A real pipeline plugs fastText here; the operator
    shape — pure column expr per doc — is what scales.)"""
    nt = token_count(text)
    dens = F.when(nt > 0, stopword_hits(text).cast("double") / nt.cast("double")).otherwise(
        F.lit(0.0)
    )
    return F.when(dens > 0.02, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(text: Column) -> Column:
    """Whitespace-normalized lowercase MD5 content fingerprint (exact
    dedup key; the reference's UNIQUE(url) analog for documents)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def winnow_fingerprints(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    prefix: int | None = None,
    hash_mode: str = "md5",
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the public MOSS algorithm): hash every char k-gram,
    slide a window of ``w`` consecutive gram hashes, keep each window's
    minimum, and return the distinct minima per doc. Guarantees any
    shared substring of length >= k+w-1 yields a shared fingerprint,
    at ~2/(w+1) selection density — the rolling-hash partial-overlap
    dedup key that exact ``fingerprint`` can't provide.

    All stages are codegen DataFrame algebra: explode positions, window
    ``min``, ``distinct`` — one shuffle keyed by doc (the window's hash
    partitioning is reused by the distinct). ``hash_mode`` picks the
    gram hash: ``'md5'`` (hex string; lexicographic order is
    engine-independent, so the DuckDB oracle is a pure SQL twin) or
    ``'xxhash64'`` (signed 8-byte longs compared JVM-side — the 100-TB
    path: 4x narrower shuffle rows and no string comparisons; pinned
    against the pure-Python xxhash64 winnower in tests).

    Docs shorter than k+w-1 chars emit one fingerprint = hash of the
    whole normalized text. ``prefix`` caps the scanned chars per doc.
    Returns distinct ``(doc, fp)`` rows.
    """
    from pyspark.sql import Window

    if hash_mode == "md5":
        _h = F.md5
    elif hash_mode == "xxhash64":
        _h = F.xxhash64
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    t = F.lower(F.col(text_col)) if prefix is None else F.lower(F.substring(text_col, 1, prefix))
    base = df.select(F.col(id_col).alias("doc"), t.alias("_t"), F.length(t).alias("_n"))
    min_len = k + w - 1
    ng = F.col("_n") - (k - 1)  # number of k-grams
    grams = (
        base.filter(F.col("_n") >= min_len)
        .select("doc", "_t", ng.alias("_ng"))
        .select("doc", "_ng", "_t", F.explode(F.sequence(F.lit(1), F.col("_ng"))).alias("pos"))
        .select(
            "doc", "_ng", "pos",
            _h(F.col("_t").substr(F.col("pos"), F.lit(k))).alias("h"),
        )
    )
    win = Window.partitionBy("doc").orderBy("pos").rowsBetween(Window.currentRow, w - 1)
    selected = (
        grams.withColumn("fp", F.min("h").over(win))
        .filter(F.col("pos") <= F.col("_ng") - (w - 1))  # full windows only
        .select("doc", "fp")
        .distinct()
    )
    short = base.filter(F.col("_n") < min_len).select("doc", _h(F.col("_t")).alias("fp"))
    return selected.unionByName(short)
