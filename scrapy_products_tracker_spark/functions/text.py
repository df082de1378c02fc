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
