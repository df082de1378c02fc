"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own extraction ops (SURVEY.md §2.7), a 100 TB
document pipeline needs language-ID, quality scoring, token counting
and fingerprinting. Everything here is pure ``pyspark.sql.functions``
column algebra — JVM-side, whole-stage-codegen'd, no Python UDFs —
so each op has an exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
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


def _ngrams_col(words: Column, n: int) -> Column:
    """Word n-grams as a row-local array expression (no explode, no
    shuffle): slice a sliding window out of the token array."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _max_run_len(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — i.e.
    the count of the most frequent element — as one linear
    ``F.aggregate`` fold (constant expression size; see the IVF
    CASE-WHEN-fold trap note in functions/similarity.py)."""
    init = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best"))

    def merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + F.lit(1)).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best"))

    return F.aggregate(sorted_arr, init, merge, lambda acc: acc["best"])


def ngram_repetition_stats(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_bigram_max: float = 0.4,
    top_bigram_max: float = 0.2,
):
    """Within-document repetition filters (the Gopher/MassiveText repo
    rules, Rae et al. 2021 §A1.1, public): fraction of duplicate word
    bigrams/trigrams and the share of the single most frequent bigram.
    Highly repetitive documents (boilerplate, keyword stuffing, decode
    loops) are the classic LLM-training-data rejects.

    Everything is ROW-LOCAL column algebra — token split, sliding-window
    n-grams, ``array_distinct`` for the duplicate fraction, and a sorted
    linear fold for the mode count — so the operator adds ZERO shuffles
    at any corpus size: it pipelines inside the scan's codegen stage.

    Emits per doc: n_words, dup_bigram_frac, dup_trigram_frac,
    top_bigram_frac (NULL when the doc has no such n-grams), and a
    ``repetitive`` verdict vs the two thresholds."""
    words = tokens_col(F.lower(F.col(text_col)))
    out = df.select(F.col(id_col), words.alias("_w"))
    for n, name in ((2, "bigram"), (3, "trigram")):
        g = _ngrams_col(F.col("_w"), n)
        total = F.size(g)
        frac = F.when(
            total > 0,
            F.round(
                F.lit(1.0) - F.size(F.array_distinct(g)).cast("double") / total.cast("double"),
                6,
            ),
        )
        out = out.withColumn(f"dup_{name}_frac", frac)
    bi = _ngrams_col(F.col("_w"), 2)
    top = F.when(
        F.size(bi) > 0,
        F.round(_max_run_len(F.array_sort(bi)).cast("double") / F.size(bi).cast("double"), 6),
    )
    return out.select(
        F.col(id_col),
        F.coalesce(F.size("_w"), F.lit(0)).alias("n_words"),
        "dup_bigram_frac",
        "dup_trigram_frac",
        top.alias("top_bigram_frac"),
        (
            (F.coalesce(F.col("dup_bigram_frac"), F.lit(0.0)) > dup_bigram_max)
            | (F.coalesce(top, F.lit(0.0)) > top_bigram_max)
        ).alias("repetitive"),
    )


def paragraph_dedup(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    paras_col: str | None = None,
    sep: str = r"\n{2,}",
):
    """Corpus-wide exact PARAGRAPH dedup (the CCNet / RefinedWeb idiom:
    boilerplate repeats across pages at paragraph granularity long
    before whole documents collide). Splits each doc on ``sep`` (or
    takes a pre-split ``paras_col`` array), fingerprints each trimmed
    lowercased paragraph, and keeps only the globally FIRST occurrence
    — first-wins by (doc, position), deterministic.

    Returns (doc, pos, fp, is_dup) — one row per non-empty paragraph.
    Plan shape at 100 TB: one explode (no shuffle), ONE exchange keyed
    by the paragraph fingerprint for the first-wins window — the same
    shape as exact document dedup, just more rows; no driver state."""
    from pyspark.sql import Window

    if paras_col is not None:
        paras = F.col(paras_col)
    else:
        paras = F.split(F.col(text_col), sep)
    exploded = (
        df.select(F.col(id_col).alias("doc"), F.posexplode(paras).alias("pos", "_p"))
        .select("doc", "pos", F.trim(F.lower(F.col("_p"))).alias("_p"))
        .filter(F.col("_p") != "")
        .select("doc", "pos", F.md5("_p").alias("fp"))
    )
    w = Window.partitionBy("fp").orderBy("doc", "pos")
    return exploded.withColumn("is_dup", F.row_number().over(w) > 1)


def paragraph_dedup_stats(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    paras_col: str | None = None,
    sep: str = r"\n{2,}",
):
    """Per-document rollup of ``paragraph_dedup``: paragraph count,
    duplicate count, duplicate fraction (NULL for docs with no
    paragraphs — those still appear, with n_paras=0). Adds one
    doc-keyed aggregation after the fp-keyed window."""
    marked = paragraph_dedup(df, id_col, text_col, paras_col, sep)
    agg = marked.groupBy(F.col("doc").alias(id_col)).agg(
        F.count("*").alias("n_paras"),
        F.sum(F.col("is_dup").cast("int")).alias("n_dup_paras"),
    )
    base = df.select(F.col(id_col)).distinct()
    return base.join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_paras", F.lit(0)).cast("int").alias("n_paras"),
        F.coalesce("n_dup_paras", F.lit(0)).cast("int").alias("n_dup_paras"),
        F.when(
            F.col("n_paras").isNotNull(),
            F.round(F.col("n_dup_paras").cast("double") / F.col("n_paras").cast("double"), 6),
        ).alias("dup_para_frac"),
    )


def hash_split(
    df,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "v1",
    buckets: int = 10_000,
):
    """Deterministic stratified corpus split (train/valid/test): bucket
    = integer of the first 15 hex chars of md5(id || salt) mod
    ``buckets``, mapped to splits by cumulative weight. Pure row-local
    column algebra — zero shuffles, reproducible across engines and
    runs (the property a training pipeline needs so no document ever
    migrates between train and eval when the corpus grows; salting
    re-rolls the assignment). md5 (not xxhash64) so the DuckDB oracle
    computes the identical bucket."""
    weights = weights or {"train": 0.98, "valid": 0.01, "test": 0.01}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 15), 16, 10)
        .cast("long")
        % buckets
    )
    expr = None
    acc = 0.0
    for name, wgt in weights.items():
        acc += wgt
        hi = int(round(acc * buckets))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def bm25_topk(
    df,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 top-k document scoring for a bag-of-terms query
    (Robertson/Spärck Jones, public): idf(t) = ln(1 + (N - df + 0.5) /
    (df + 0.5)), tf saturation k1, length normalization b. The retrieval
    primitive a training-data pipeline uses for targeted corpus audits
    ("which documents match this eval probe?").

    Plan shape at 100 TB: term frequencies come from ONE row-local pass
    (no explode of non-matching tokens — the token array is filtered to
    the query terms before any shuffle), doc-frequency and avgdl are
    two tiny scalar/row aggregates cross-joined back as broadcasts, and
    the tail is TakeOrderedAndProject. Zero wide shuffles of the corpus.
    """
    if not terms:
        raise ValueError("empty query")
    terms = [t.lower() for t in terms]
    words = tokens_col(F.lower(F.col(text_col)))

    def _tf(term):
        # NB: a two-param lambda would make Spark bind (element, INDEX)
        return F.size(F.filter(words, lambda x: x == F.lit(term)))

    base = df.select(
        F.col(id_col).alias("doc"),
        F.coalesce(F.size(words), F.lit(0)).alias("dl"),
        *[_tf(t).alias(f"_tf{i}") for i, t in enumerate(terms)],
    )
    # corpus stats: N and avgdl (one tiny row, broadcast back)
    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}") for i in range(len(terms))],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"_df{i}") + F.lit(0.5)) / (F.col(f"_df{i}") + F.lit(0.5))
        )
        part = idf * tf * (F.lit(k1) + 1.0) / (
            tf + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
        score = part if score is None else score + part
    return (
        scored.select("doc", F.round(score, 6).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc")
        .limit(k)
    )


def decontaminate_ngram_overlap(
    train,
    eval_df,
    n: int = 8,
    min_shared: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Train/eval contamination scan (the GPT-3 §C / PaLM n-gram-overlap
    filter, public): find (train_doc, eval_doc) pairs sharing at least
    ``min_shared`` distinct word ``n``-grams. Returns (train_doc,
    eval_doc, n_shared).

    Plan shape at 100 TB: the EVAL side is small by construction (an
    eval suite, not a corpus) — its distinct gram hashes are broadcast;
    the training corpus's grams are generated row-locally (sliding
    window over the token array, then one explode) and joined MAP-SIDE
    against the broadcast, so no training-side gram ever shuffles: the
    only exchange is the tiny (train,eval) pair count aggregate."""
    def grams(df):
        words = tokens_col(F.lower(F.col(text_col)))
        g = _ngrams_col(words, n)
        return df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.array_distinct(g)).alias("g"),
        ).select("doc", F.xxhash64("g").alias("gh"))

    ev = grams(eval_df).select(F.col("doc").alias("eval_doc"), "gh").distinct()
    tr = grams(train).select(F.col("doc").alias("train_doc"), "gh")
    pairs = (
        tr.join(F.broadcast(ev), "gh")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count_distinct("gh").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs


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


def lm_bigram_scores(
    df,
    vocab_size: int = 64,
    unit: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Self-trained add-½ bigram language-model scoring — the CCNet /
    RefinedWeb quality idiom (Wenzek et al., LREC'20 filter web text by
    LM perplexity; here the LM is trained on the corpus itself in the
    same job, so the whole thing is one engine-independent relational
    program). Returns (doc, n_bigrams, nll_unats, avg_nll): the total
    negative log-likelihood in integer MICRO-NATS and the per-bigram
    average in nats. High avg_nll = improbable word sequences = low
    quality.

    Determinism contract: each bigram's cost is rounded ONCE to an
    int64 micro-nat count (``round(ln(p)*unit)``) and the per-document
    total is an int64 sum — integer addition is order-free, so the
    score is bit-identical under any partitioning (the float-sum-order
    trap that a naive ``sum(ln(p))`` would hit). The only float op is
    one ``ln`` per scored row, computed from exact integer counts —
    the same parity contract bm25_topk relies on.

    Model: vocabulary = top ``vocab_size`` tokens by (count desc,
    token); everything else maps to '<unk>'; each document's token
    stream is prefixed with '<s>'. p(w|prev) = (c(prev,w) + 0.5) /
    (c(prev) + 0.5*(vocab_size+1)). Counts come from this corpus, so
    every scored bigram was observed (c12 >= 1) and the smoothing only
    shapes the distribution.

    Plan shape at 100 TB: token stream = one explode; the '<s>'-
    prefixed previous token is a lag window over (doc, pos) — ONE
    doc-keyed exchange that the per-doc sum REUSES (no second
    shuffle); unigram/bigram count tables are bounded by the capped
    vocabulary (<= V and <= (V+2)^2 rows) and broadcast back, so the
    corpus-side stream never shuffles again. Vocabulary selection is a
    top-V TakeOrderedAndProject over the unigram aggregate."""
    from pyspark.sql import Window

    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    words = tokens_col(F.lower(F.col(text_col)))
    toks = (
        df.select(F.col(id_col).alias("doc"), words.alias("_w"))
        .filter(F.size("_w") > 0)
        .select("doc", F.posexplode("_w").alias("pos", "tok"))
    )
    uni = toks.groupBy("tok").agg(F.count("*").alias("_c"))
    vocab = uni.orderBy(F.desc("_c"), "tok").limit(vocab_size).select(
        "tok", F.lit(True).alias("_in_v")
    )
    mapped = toks.join(F.broadcast(vocab), "tok", "left").select(
        "doc",
        "pos",
        F.when(F.col("_in_v"), F.col("tok")).otherwise(F.lit("<unk>")).alias("m"),
    )
    w = Window.partitionBy("doc").orderBy("pos")
    bg = mapped.select(
        "doc", F.coalesce(F.lag("m").over(w), F.lit("<s>")).alias("p"), "m"
    )
    c12 = bg.groupBy("p", "m").agg(F.count("*").alias("_c12"))
    c1 = bg.groupBy("p").agg(F.count("*").alias("_c1"))
    denom_k = 0.5 * (vocab_size + 1)
    cost = F.round(
        F.log((F.col("_c12") + F.lit(0.5)) / (F.col("_c1") + F.lit(denom_k)))
        * F.lit(int(unit))
    ).cast("long")
    scored = (
        bg.join(F.broadcast(c12), ["p", "m"])
        .join(F.broadcast(c1), "p")
        .select("doc", cost.alias("_u"))
    )
    per_doc = scored.groupBy("doc").agg(
        F.count("*").alias("n_bigrams"), (-F.sum("_u")).alias("nll_unats")
    )
    return per_doc.select(
        "doc",
        "n_bigrams",
        "nll_unats",
        F.round(
            F.col("nll_unats") / F.lit(float(unit)) / F.col("n_bigrams"), 6
        ).alias("avg_nll"),
    )


def perplexity_buckets(
    scored: DataFrame,
    group_col: str | None = None,
    id_col: str = "doc",
    nll_col: str = "nll_unats",
    n_col: str = "n_bigrams",
    head_permille: int = 300,
    mid_permille: int = 700,
    quant_milli: int = 1000,
    unit: int = 1_000_000,
) -> DataFrame:
    """CCNet head/middle/tail perplexity split (Wenzek et al. LREC'20
    §4.3): per ``group_col`` (language), the lowest-perplexity
    ``head_permille``‰ of documents are 'head', the next slice up to
    ``mid_permille``‰ 'middle', the rest 'tail'. Input is
    :func:`lm_bigram_scores` output (or anything with integer
    ``nll_col``/``n_col``).

    Scale design — the percentile is computed on a QUANTIZED score
    grid, not on rows: ``score_mq = div(nll * quant_milli, n * unit)``
    (milli-nats per bigram — a finite grid of ~0..20k values however
    big the corpus is). The histogram ``(group, score_mq) → count`` is
    one map-side-combinable aggregate whose size is bounded by
    |groups|·|grid|, the cumulative window runs over THAT tiny table,
    and the two cut scores per group broadcast back for a row-local
    bucket label. No per-group window ever touches the full data — the
    hot-language skew that a naive ``percent_rank() OVER (PARTITION BY
    lang)`` would hit (one partition = 90% of a 100 TB corpus) never
    materializes. The trade is explicit and deterministic: documents
    sharing a quantized score share a bucket (a tie on the grid is
    never split), so bucket boundaries land on grid edges — the same
    rounding CCNet's binned perplexity thresholds make.

    Cut semantics (exact, integer-only): ``head_cut`` = smallest grid
    score whose cumulative count reaches ``ceil(head_permille/1000 ·
    n_group)`` (``cum·1000 >= head_permille·total``); same for
    ``mid_cut``. Returns the input columns plus ``score_mq`` and
    ``bucket``. NULL group values form their own group."""
    if not (0 < head_permille < mid_permille < 1000):
        raise ValueError("need 0 < head_permille < mid_permille < 1000")
    from pyspark.sql import Window

    g = (
        F.coalesce(F.col(group_col).cast("string"), F.lit("<null>"))
        if group_col
        else F.lit("")
    )
    q = F.expr(f"div({nll_col} * {int(quant_milli)}, {n_col} * {int(unit)})")
    base = scored.withColumn("_g", g).withColumn("score_mq", q)
    hist = base.groupBy("_g", "score_mq").agg(F.count(F.lit(1)).alias("_n"))
    w_cum = (
        Window.partitionBy("_g")
        .orderBy("score_mq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("_g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "_g",
        "score_mq",
        F.sum("_n").over(w_cum).alias("_cum"),
        F.sum("_n").over(w_all).alias("_tot"),
    )
    cuts = cum.groupBy("_g").agg(
        F.min(
            F.when(
                F.col("_cum") * 1000 >= F.lit(int(head_permille)) * F.col("_tot"),
                F.col("score_mq"),
            )
        ).alias("_head_cut"),
        F.min(
            F.when(
                F.col("_cum") * 1000 >= F.lit(int(mid_permille)) * F.col("_tot"),
                F.col("score_mq"),
            )
        ).alias("_mid_cut"),
    )
    return (
        base.join(F.broadcast(cuts), "_g")
        .withColumn(
            "bucket",
            F.when(F.col("score_mq") <= F.col("_head_cut"), F.lit("head"))
            .when(F.col("score_mq") <= F.col("_mid_cut"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .drop("_g", "_head_cut", "_mid_cut")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    eos_tokens: int = 1,
    range_col: str | None = None,
) -> DataFrame:
    """LM-pretraining sequence packing: concatenate every document (in
    ``id_col`` order, ``eos_tokens`` separator tokens appended to each)
    into one token stream and chunk it into fixed ``seq_len`` training
    sequences — the standard GPT-style "concat and chunk" batcher.
    Each doc reports the sequence range it lands in:

    ``(id, n_tokens, tok_before, first_seq, last_seq)``

    where ``n_tokens`` includes the EOS pad, ``tok_before`` is the
    exact number of stream tokens before the doc's first token,
    ``first_seq = div(tok_before, seq_len)`` and ``last_seq`` is the
    sequence holding its final token. All integer arithmetic over
    whitespace token counts (NULL/blank text = 0 content tokens), so
    results are bit-identical across engines and partitionings.

    Distributed prefix sum: the same two-phase scan as
    imaging/dataset.pack_shards — per-range token totals (one tiny row
    per range) get running offsets via a window over that tiny table,
    then broadcast back and combined with a within-range window.
    ``range_col`` must sort identically to a prefix of the id order
    (zero-padded id prefix, date, crawl bucket); without it the whole
    input is one range — correct, but the window serializes (test-only;
    callers at scale pass a range key)."""
    from pyspark.sql import Window

    if seq_len <= 0:
        raise ValueError("seq_len must be > 0")
    n_tok = (
        F.coalesce(token_count(F.col(text_col)), F.lit(0)) + F.lit(int(eos_tokens))
    ).cast("long")
    rng = F.col(range_col) if range_col else F.lit("")
    base = df.select(rng.alias("_rng"), F.col(id_col).alias("id"), n_tok.alias("n_tokens"))
    totals = base.groupBy("_rng").agg(F.sum("n_tokens").alias("_tot"))
    w_ranges = Window.orderBy("_rng").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_rng", F.coalesce(F.sum("_tot").over(w_ranges), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_rng").orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    return (
        base.join(F.broadcast(offsets), "_rng")
        .withColumn(
            "tok_before",
            F.col("_off") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)),
        )
        .select(
            "id",
            "n_tokens",
            "tok_before",
            F.expr(f"div(tok_before, {int(seq_len)})").cast("int").alias("first_seq"),
            F.expr(f"div(tok_before + n_tokens - 1, {int(seq_len)})")
            .cast("int")
            .alias("last_seq"),
        )
    )


def dsir_importance(
    df: DataFrame,
    is_target: Column,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    unit: int = 1_000_000,
) -> DataFrame:
    """DSIR-style hashed n-gram importance scores (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    per-document log-likelihood ratio of a TARGET token distribution
    vs the RAW corpus distribution, estimated over hashed unigram
    buckets — the standard cheap scorer for "select web documents that
    look like the high-quality target set".

    ``is_target`` is a boolean Column marking the in-table target
    subset (e.g. ``F.col("lang") == "en"``). Per bucket ``b``:
    ``score(b) = round(unit * ln( ((ct+1)/(Nt+B)) / ((cr+1)/(Nr+B)) ))``
    (Laplace-smoothed; ct/cr = target/raw token counts in ``b``) — the
    log is taken ONCE per bucket on a tiny table and fixed-pointed to
    integer micro-nats (the bigram-LM determinism trick above), so the
    per-doc aggregation is an integer sum: exact, order-independent,
    engine-independent. Returns ``(id, n_tokens, score_unats)`` with
    ``score_unats = sum(score(bucket(tok)))`` over the doc's token
    instances; docs with no tokens score 0.

    Scale: one explode pass; both histograms come from the SAME
    ``groupBy(bucket)`` (a conditional count — no second scan); the
    score table is ``n_buckets`` rows, broadcast; the per-doc sum
    shuffles (id, int64) pairs with map-side partial aggregation.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        is_target.alias("_t"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    ).withColumn("_b", F.pmod(F.xxhash64("tok"), F.lit(int(n_buckets))))
    hist = toks.groupBy("_b").agg(
        F.count("*").alias("_cr"),
        F.count_if(F.col("_t")).alias("_ct"),
    )
    tot = hist.agg(F.sum("_cr").alias("_nr"), F.sum("_ct").alias("_nt"))
    scores = hist.crossJoin(F.broadcast(tot)).select(
        "_b",
        F.round(
            (
                F.log((F.col("_ct") + 1) / (F.col("_nt") + F.lit(int(n_buckets))))
                - F.log((F.col("_cr") + 1) / (F.col("_nr") + F.lit(int(n_buckets))))
            )
            * F.lit(int(unit))
        )
        .cast("long")
        .alias("_s"),
    )
    per_doc = (
        toks.join(F.broadcast(scores), "_b")
        .groupBy("id")
        .agg(F.count("*").alias("n_tokens"), F.sum("_s").alias("score_unats"))
    )
    # empty docs never reach the explode; restore them with score 0
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    return all_ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("score_unats", F.lit(0)).cast("long").alias("score_unats"),
    )


# --- Unicode script profiling (the codepoint-range half of language ID) ----

# (name, literal char-class body). Literal codepoint ranges work
# identically in Java regex (UTF-16) and DuckDB's RE2 (UTF-8) for BMP
# ranges, so one table drives both engines.
SCRIPT_CLASSES: list[tuple[str, str]] = [
    ("latin", "A-Za-zÀ-ɏ"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("arabic", "؀-ۿ"),
    ("cjk", "一-鿿぀-ヿ가-힯"),
]


def script_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc Unicode script histogram + dominant script — the
    codepoint-range complement to :func:`lang_guess` (a stopword
    heuristic can only say "en vs other"; script counting is how real
    pipelines pre-route docs to per-script models, cf. CLD3/fastText
    feature sets). Returns

    ``(id, latin_chars, cyrillic_chars, greek_chars, arabic_chars,
    cjk_chars, dominant_script, script_conf_milli)``

    where ``dominant_script`` is the class with the most codepoints
    (ties -> the earlier class in ``SCRIPT_CLASSES``; NULL when no
    scripted codepoint occurs, incl. NULL text) and
    ``script_conf_milli = 1000 * max_count // total_count`` (integer —
    engine-exact).

    Plan: one ``regexp_count`` per class, pure row-local codegen, zero
    shuffle, zero Python — a 100 TB corpus pays one scan."""
    cnts = [
        F.coalesce(F.regexp_count(F.col(text_col), F.lit(f"[{body}]")), F.lit(0))
        .cast("long")
        .alias(f"{name}_chars")
        for name, body in SCRIPT_CLASSES
    ]
    out = df.select(F.col(id_col).alias("id"), *cnts)
    names = [n for n, _ in SCRIPT_CLASSES]
    total = None
    for n in names:
        c = F.col(f"{n}_chars")
        total = c if total is None else total + c
    # argmax with first-listed tie-winner: max (count, -index) struct
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"{n}_chars").alias("c"), F.lit(-i).alias("ni")
                )
                for i, n in enumerate(names)
            ]
        )
    )
    name_arr = F.array(*[F.lit(n) for n in names])
    staged = out.withColumn("_total", total).withColumn("_best", best)
    return staged.select(
        *(["id"] + [f"{n}_chars" for n in names]),
        F.when(
            F.col("_total") > 0,
            F.element_at(name_arr, (-F.col("_best.ni") + 1).cast("int")),
        ).alias("dominant_script"),
        F.when(F.col("_total") > 0, F.expr("div(1000 * _best.c, _total)"))
        .cast("long")
        .alias("script_conf_milli"),
    )


# PII patterns — the lookbehind-free subset that evaluates identically
# on Java regex (Spark codegen) and RE2 (DuckDB oracle). A production
# pipeline swaps in jurisdiction-specific pattern packs; the operator
# shape (pure row-local column algebra, zero Python, zero shuffle) is
# what has to survive 100 TB, and it does trivially.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """Per-doc counts of (emails, ipv4s, phones) on the RAW text —
    computed before scrubbing so redaction placeholders never
    self-count. Three ``regexp_count`` calls, whole-stage codegen."""
    return (
        F.regexp_count(text, F.lit(PII_EMAIL_RE)),
        F.regexp_count(text, F.lit(PII_IPV4_RE)),
        F.regexp_count(text, F.lit(PII_PHONE_RE)),
    )


def pii_scrub(text: Column) -> Column:
    """Redact emails → ``<EMAIL>``, IPv4s → ``<IP>``, then phone
    numbers → ``<PHONE>`` (email first: its local part may contain
    digit runs a later pass would mangle; IP before phone so dotted
    quads are never half-eaten by the phone pattern). Every training
    corpus ships a pass like this (C4/CCNet scrub stage); nested
    ``regexp_replace`` keeps it inside one codegen stage."""
    scrubbed = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(scrubbed, PII_PHONE_RE, "<PHONE>")


def pii_scrub_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, n_emails, n_ips, n_phones, scrub_md5)`` — the audit row a
    scrub stage emits per document: what was found, and a fingerprint
    of the redacted text (md5, engine-portable) so the oracle checks
    the actual replacement bytes, not just the counts."""
    t = F.col(text_col)
    ne, ni, np_ = pii_counts(t)
    return df.select(
        F.col(id_col),
        ne.cast("long").alias("n_emails"),
        ni.cast("long").alias("n_ips"),
        np_.cast("long").alias("n_phones"),
        F.md5(pii_scrub(t)).alias("scrub_md5"),
    )


def chunk_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    win: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding token-window chunking — the context-window splitter that
    feeds long documents to a fixed-window model (win tokens, stride
    < win ⇒ overlap): ``(id, chunk_idx, chunk_tokens, chunk_text)``.

    Row-local column algebra: tokenize once, generate start offsets
    with ``sequence(0, n-1, stride)`` (so the final window always
    carries ≥1 token and a short tail is kept, never padded), slice
    the token array per start, ``posexplode``. The only row-count
    growth is the explode itself — no shuffle, no Python; at 100 TB
    this is a map-only stage whose output feeds ``pack_sequences``.

    Empty/NULL docs produce zero chunks (explode of an empty array)."""
    if stride <= 0 or win <= 0:
        raise ValueError("win and stride must be positive")
    toks = tokens_col(F.col(text_col))
    starts = F.when(
        F.size(toks) > 0, F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(F.col(id_col), toks.alias("_toks"), starts.alias("_starts"))
        .select(id_col, "_toks", F.posexplode("_starts").alias("chunk_idx", "_start"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.least(F.lit(win), F.size("_toks") - F.col("_start"))
            .cast("long")
            .alias("chunk_tokens"),
            F.array_join(
                F.slice("_toks", F.col("_start") + 1, F.lit(win)), " "
            ).alias("chunk_text"),
        )
    )


def corpus_stats(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("source",),
    text_col: str = "text",
) -> DataFrame:
    """ROLLUP corpus accounting — the one-scan summary every curation
    run reports (docs / tokens / chars / quality mass per group plus
    subtotal and grand-total rows): ``rollup(*group_cols)`` with

    ``(… group cols …, n_docs, total_tokens, total_chars,
    sum_quality_micro)``

    Quality is summed in integer micro-units of the 6-dp-rounded
    :func:`quality_score` so the aggregate is bit-identical across
    engines and partitionings (float sums are order-dependent; integer
    sums are not). NULL text contributes 0 tokens/chars/quality.

    ``gid`` is the grouping-set bitmask (``grouping_id``): it
    disambiguates a subtotal row from a genuine NULL group value —
    without it ``(src, NULL-as-subtotal)`` and ``(src, NULL-lang)``
    rows are indistinguishable.

    Plan: one map-side-combinable aggregate; ROLLUP expands to
    len(group_cols)+1 grouping sets in the same exchange."""
    return df.rollup(*group_cols).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count("*").alias("n_docs"),
        F.sum(F.coalesce(token_count(F.col(text_col)), F.lit(0)))
        .cast("long")
        .alias("total_tokens"),
        F.sum(F.coalesce(F.length(F.col(text_col)), F.lit(0)))
        .cast("long")
        .alias("total_chars"),
        F.sum(
            F.coalesce(
                F.round(quality_score(F.col(text_col)) * F.lit(1_000_000.0)), F.lit(0.0)
            ).cast("long")
        )
        .cast("long")
        .alias("sum_quality_micro"),
    )


def dedup_doc_lines(text: Column) -> Column:
    """Intra-document line dedup (the CCNet/Dolma boilerplate pass):
    drop every repeat of a line already seen earlier in the SAME
    document — nav bars, cookie banners, and footer blocks repeat
    verbatim inside scraped pages, and Gopher's repetition *filters*
    (ngram_repetition_stats above) only flag them; this transform
    removes them.

    Pure column algebra, zero shuffle: split on newline, keep the
    first occurrence of each line (`array_position` = first index,
    compared against the element's own index via the indexed `filter`
    lambda), re-join.  Per-row cost is O(lines^2) with tiny constants
    — web documents are O(10^2) lines; a pathological doc is bounded
    by the upstream length filters.  Empty lines dedup like any other
    (a doc of many blank separators keeps one), which matches the
    CCNet reference behavior of hashing raw lines."""
    lines = F.split(text, "\n")
    kept = F.filter(lines, lambda x, i: F.array_position(lines, x) == i + F.lit(1))
    return F.array_join(kept, "\n")


def line_dedup_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc evidence row for :func:`dedup_doc_lines`: line counts
    before/after and an md5 of the deduped text (cross-engine
    comparable)."""
    lines = F.split(F.col(text_col), "\n")
    deduped = dedup_doc_lines(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines_in"),
        F.size(F.split(deduped, "\n")).alias("n_lines_kept"),
        F.md5(deduped).alias("dedup_md5"),
    )


def compression_ratio_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deflate compression ratio per document — the classic
    low-information/boilerplate/spam signal (Gopher-class quality
    stacks flag pages whose text compresses too well: repeated
    templates, keyword stuffing, generated spam all have low
    Kolmogorov-ish content).  Returns ``(id, raw_len, zlib_len,
    ratio_milli)`` with ``ratio_milli = zlib_len * 1000 // raw_len``
    (integer milli-units; empty/NULL text -> ratio 1000, the
    incompressible convention, so downstream "too compressible"
    filters never select empties).

    One Arrow-batched kernel (compression is inherently byte-level
    Python work), map-only — zero shuffle, partition-parallel.

    Determinism contract: zlib level 6 on UTF-8 bytes; the engine
    kernel and the oracle builder run the SAME zlib build in this
    container, which is what the gate compares.  Across zlib builds
    the BYTES may differ (DEFLATE encoders are not canonical), so the
    ratio is a quality SIGNAL, not a stable fingerprint — use
    fingerprint()/md5 for identity."""
    import zlib

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType),
            StructField("raw_len", LongType()),
            StructField("zlib_len", LongType()),
            StructField("ratio_milli", LongType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            raw, comp, ratio = [], [], []
            for t in pdf[text_col]:
                b = ("" if t is None else str(t)).encode("utf-8")
                n = len(b)
                z = len(zlib.compress(b, 6)) if n else 0
                raw.append(n)
                comp.append(z)
                ratio.append(z * 1000 // n if n else 1000)
            yield pd.DataFrame(
                {"id": pdf[id_col], "raw_len": raw, "zlib_len": comp, "ratio_milli": ratio}
            )

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)


def nfc_normalize_col(text: Column) -> Column:
    """Unicode NFC normalization as an Arrow-batched pandas UDF —
    the canonical-composition pass every multilingual training corpus
    runs before tokenization/dedup (combining sequences like
    ``e + U+0301`` and precomposed ``é`` must fingerprint identically,
    or the exact-dedup pass silently treats byte-different renderings
    of the same text as distinct documents).

    Python's ``unicodedata.normalize("NFC", ...)`` implements the
    Unicode standard's algorithm; the oracle checks it against
    DuckDB's INDEPENDENT ``nfc_normalize`` implementation — two
    codebases, one spec. NULL in -> NULL out. The UDF is the
    vectorized slow path by design (JVM Spark has no built-in NFC);
    at 10^10 docs it is one map-only Arrow stage, no shuffle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc(text)


def nfc_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc NFC audit: ``(id, changed, len_before, len_after, fp)``
    with fp = md5 of the normalized text — the compact oracle surface
    for the normalization pass (lengths in code points, which both
    engines' ``length`` counts)."""
    norm = nfc_normalize_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        (F.col(text_col) != norm).cast("int").alias("changed"),
        F.length(text_col).cast("long").alias("len_before"),
        F.length(norm).cast("long").alias("len_after"),
        F.md5(norm.cast("binary")).alias("fp"),
    )


def readability_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch Reading Ease + Flesch-Kincaid grade per doc in integer
    milli-units — the classic readability gates (Kincaid et al. '75)
    used as corpus quality signals next to ``quality_score``.

    Counts are exact integers: words = whitespace tokens, sentences =
    runs of ``[.!?]`` (min 1), syllables = per-word vowel-group count
    ``[aeiouy]+`` with a floor of 1 (the standard heuristic — no
    dictionary). Scores use integer ``div`` so the result is a pure
    function of the counts on any engine:

        flesch_milli = 206835 - (1015*W) div S - (84600*Y) div W
        fk_grade_milli = (390*W) div S + (11800*Y) div W - 15590

    Zero Python, zero Exchange: one regexp pass + a row-local fold
    inside the scan stage. NULL/blank docs report NULL counts/scores
    (audit semantics)."""
    t = F.col(text_col)
    valid = t.isNotNull() & (F.trim(t) != "")
    words = F.split(F.trim(F.lower(t)), r"\s+")
    n_words = F.when(valid, F.size(words).cast("long"))
    n_sentences = F.when(
        valid,
        F.greatest(
            F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), F.lit(0))), F.lit(1)
        ).cast("long"),
    )
    n_syll = F.when(
        valid,
        F.aggregate(
            words,
            F.lit(0).cast("long"),
            lambda acc, w: acc
            + F.greatest(
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
                F.lit(1),
            ).cast("long"),
        ),
    )
    base = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syll.alias("n_syllables"),
    )
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "206835 - (1015 * n_words) div n_sentences"
            " - (84600 * n_syllables) div n_words"
        ).alias("flesch_milli"),
        F.expr(
            "(390 * n_words) div n_sentences"
            " + (11800 * n_syllables) div n_words - 15590"
        ).alias("fk_grade_milli"),
    )
