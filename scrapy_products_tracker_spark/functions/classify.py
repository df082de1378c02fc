"""Distributed multinomial Naive-Bayes text classification.

The cheap-linear-classifier idiom of CCNet / GPT-3-era data pipelines:
train on a small labeled seed set (target-domain pages vs random crawl,
or per-language samples), then score every document in the crawl to
keep the ones that "look like" the target. The reference has no
classifier (its quality gate is per-site extraction success,
``spiders/*.py``); this is part of the training-data-pipeline family
this engine adds on top.

Design: everything is ``pyspark.sql.functions`` column algebra over
hashed token buckets — no Python UDFs — so the op has an exact ANSI-SQL
twin for the DuckDB oracle gate. All log-probabilities are fixed-pointed
to integer micro-nats (``round(unit * ln(p))``, the same determinism
trick as :func:`scrapy_products_tracker_spark.functions.text.dsir_importance`
and the bigram LM): the log is taken ONCE per (class, bucket) cell on a
tiny table, and every per-document score is an exact integer sum —
order-independent, partitioning-independent, engine-independent.

Scale shape (the 100 TB story):
- training is ONE explode pass over the labeled set; the (class, bucket)
  histogram aggregates with map-side partial combine; the model is a
  DENSE ``n_classes x n_buckets`` table (512 buckets x a handful of
  classes = KBs) — broadcast, never shuffled;
- scoring is ONE explode pass over the corpus; each token instance
  broadcast-joins the model (fan-out = n_classes, bounded by the label
  cardinality the caller trained on), then ONE ``(doc, class)``-keyed
  aggregation and ONE ``doc``-keyed arg-max — a plain ``min(struct)``
  aggregation, not a global window;
- no collect, no driver state, no iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

__all__ = [
    "nb_train",
    "nb_score",
    "nb_classify",
    "prototype_direction",
    "prototype_score",
]


def _bucket(tok: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(tok), F.lit(int(n_buckets))).cast("int")


def nb_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 512,
    unit: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial NB model on labeled documents.

    Returns ``(weights, priors)``:

    - ``weights``: ``(label, _b, w_unats)`` — DENSE over every trained
      label x bucket 0..n_buckets-1, ``w_unats =
      round(unit * ln((count(label, b) + 1) / (n_tokens(label) + n_buckets)))``
      (Laplace-smoothed class-conditional token log-likelihood, integer
      micro-nats). Dense so scoring needs no "unseen bucket" special
      case: a bucket never observed for a class still carries its
      smoothed weight.
    - ``priors``: ``(label, prior_unats, n_docs)`` —
      ``round(unit * ln(n_docs(label) / n_docs_total))``.

    Both outputs are tiny (``n_classes x n_buckets`` and ``n_classes``
    rows) and lazy — no driver action is taken here.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    spark = df.sparkSession
    lbl = F.col(label_col).alias("label")

    classes = df.groupBy(lbl).agg(F.count("*").alias("n_docs"))
    toks = df.select(
        lbl, F.explode(tokens_col(F.col(text_col))).alias("tok")
    ).select("label", _bucket(F.col("tok"), n_buckets).alias("_b"))
    hist = toks.groupBy("label", "_b").agg(F.count("*").alias("_c"))
    # per-class token totals; a class whose docs are all empty still
    # needs a row (n = 0) so its smoothed weights exist
    ntok = (
        classes.select("label")
        .join(hist.groupBy("label").agg(F.sum("_c").alias("_n")), "label", "left")
        .select("label", F.coalesce("_n", F.lit(0)).alias("_n"))
    )
    buckets = spark.range(int(n_buckets)).select(F.col("id").cast("int").alias("_b"))
    weights = (
        classes.select("label")
        .crossJoin(buckets)  # n_classes x n_buckets: the dense model grid
        .join(hist, ["label", "_b"], "left")
        .join(ntok, "label")
        .select(
            "label",
            "_b",
            F.round(
                F.log(
                    (F.coalesce(F.col("_c"), F.lit(0)) + F.lit(1))
                    / (F.col("_n") + F.lit(int(n_buckets)))
                )
                * F.lit(int(unit))
            )
            .cast("long")
            .alias("w_unats"),
        )
    )
    tot = classes.agg(F.sum("n_docs").alias("_nd"))
    priors = classes.crossJoin(F.broadcast(tot)).select(
        "label",
        F.round(
            F.log(F.col("n_docs").cast("double") / F.col("_nd").cast("double"))
            * F.lit(int(unit))
        )
        .cast("long")
        .alias("prior_unats"),
        "n_docs",
    )
    return weights, priors


def nb_score(
    df: DataFrame,
    weights: DataFrame,
    priors: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    all_scores: bool = False,
) -> DataFrame:
    """Score documents against a trained model; returns
    ``(id, pred_label, score_unats)`` — the arg-max class and its
    posterior log-score ``prior + sum(token weights)`` in micro-nats.
    With ``all_scores=True`` returns the full ``(id, label,
    score_unats)`` grid instead (one row per document per trained
    class) — the input for margin/log-odds filters.

    Ties break to the lexicographically smallest label (exact on both
    engines: the arg-max is ``min(struct(-score, label))``, a plain
    aggregation — no global window, no collect). Documents with no
    tokens (empty/NULL text) score ``prior_unats`` alone and therefore
    predict the max-prior class.

    The ``docs x priors`` cross join that restores token-less documents
    is a broadcast fan-out of ``n_classes`` rows per document — strictly
    smaller than the scoring join itself (which fans every token
    instance by ``n_classes``), so it does not change the plan's
    asymptotics.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    ).select("id", _bucket(F.col("tok"), n_buckets).alias("_b"))
    sums = (
        toks.join(F.broadcast(weights), "_b")
        .groupBy("id", "label")
        .agg(F.sum("w_unats").alias("_s"))
    )
    cells = (
        df.select(F.col(id_col).alias("id"))
        .crossJoin(F.broadcast(priors.select("label", "prior_unats")))
        .join(sums, ["id", "label"], "left")
        .select(
            "id",
            "label",
            (F.coalesce(F.col("_s"), F.lit(0)) + F.col("prior_unats")).alias("_score"),
        )
    )
    if all_scores:
        return cells.select("id", "label", F.col("_score").cast("long").alias("score_unats"))
    best = cells.groupBy("id").agg(
        F.min(F.struct((-F.col("_score")).alias("_neg"), F.col("label"))).alias("_m")
    )
    return best.select(
        "id",
        F.col("_m.label").alias("pred_label"),
        (-F.col("_m._neg")).cast("long").alias("score_unats"),
    )


def _fixed_vec(vec: Column, unit: int) -> Column:
    """array<float> -> array<long> fixed-point: round(x * unit).
    float->double element casts are exact, the multiply and HALF_UP
    round are deterministic on both engines — after this, every sum
    is integer arithmetic: order- and partitioning-independent."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * F.lit(float(unit))).cast("long")
    )


def prototype_direction(
    df: DataFrame,
    is_pos: Column,
    vec_col: str = "embedding",
    unit: int = 100_000,
) -> DataFrame:
    """Train a prototype (class-mean-difference) direction over an
    embedding column — the LAION/CLIP-filter idiom: aesthetic, NSFW
    and relevance filters are a dot product against one learned
    direction, thresholded. Returns ``(pos, w)``: per-dimension
    integer weight ``round(mean_pos[d] - mean_neg[d])`` in the same
    fixed-point ``unit`` as the embeddings.

    Determinism + scale: per-dim sums are exact int64 (one posexplode
    pass, map-side combine; the per-class vector counts fall out of
    the same groupBy); the ONLY float op is one division + round per
    dimension on the ``dim``-row result — so ``|w| <= unit * max|x|``
    is bounded regardless of corpus size (no overflow at 10^10 rows),
    and scoring sums stay exact integers. A single-class training set
    degrades gracefully (missing class mean = 0)."""
    e = df.select(
        is_pos.alias("_p"),
        F.posexplode(_fixed_vec(F.col(vec_col), unit)).alias("pos", "v"),
    )
    sums = e.groupBy("pos").agg(
        F.sum(F.when(F.col("_p"), F.col("v")).otherwise(F.lit(0))).alias("_sp"),
        F.sum(F.when(~F.col("_p"), F.col("v")).otherwise(F.lit(0))).alias("_sn"),
        F.count_if(F.col("_p")).alias("_np"),
        F.count_if(~F.col("_p")).alias("_nn"),
    )

    def _mean(s: Column, n: Column) -> Column:
        return F.when(n > 0, s.cast("double") / n.cast("double")).otherwise(F.lit(0.0))

    return sums.select(
        "pos",
        F.round(_mean(F.col("_sp"), F.col("_np")) - _mean(F.col("_sn"), F.col("_nn")))
        .cast("long")
        .alias("w"),
    )


def prototype_score(
    df: DataFrame,
    direction: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    unit: int = 100_000,
) -> DataFrame:
    """Score every vector against a trained prototype direction;
    returns ``(id, score_fixed)`` with ``score_fixed = sum_d
    round(x[d] * unit) * w[d]`` — an exact integer dot product
    (classify with ``score_fixed > threshold``). One posexplode pass,
    the ``dim``-row direction broadcast, one id-keyed aggregation."""
    e = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(_fixed_vec(F.col(vec_col), unit)).alias("pos", "v"),
    )
    scores = (
        e.join(F.broadcast(direction), "pos")
        .groupBy("id")
        .agg(F.sum(F.col("v") * F.col("w")).alias("score_fixed"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scores, "id", "left")
        .select("id", F.coalesce("score_fixed", F.lit(0)).cast("long").alias("score_fixed"))
    )


def nb_classify(
    df: DataFrame,
    train_filter: Column,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    unit: int = 1_000_000,
) -> DataFrame:
    """Train on the ``train_filter`` subset, score EVERY row; returns
    ``(id, pred_label, score_unats)``. The one-call composition for the
    standard split-train-score-all evaluation loop."""
    weights, priors = nb_train(
        df.filter(train_filter),
        label_col,
        text_col=text_col,
        n_buckets=n_buckets,
        unit=unit,
    )
    return nb_score(
        df, weights, priors, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )


# ------------------------------------------------ Cavnar-Trenkle n-grams

def _ct_ngrams(text: Column, n: int) -> Column:
    """Char n-grams over lowercased text with whitespace runs collapsed
    to '_' (the Cavnar-Trenkle '94 normalization). Docs shorter than
    ``n`` emit no grams."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+", "_")
    # sequence(1, 0) would generate a DESCENDING [1, 0] (phantom empty
    # grams for docs shorter than n) — guard the short case explicitly
    return F.when(
        F.length(norm) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - (n - 1)),
            lambda i: F.substring(norm, i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ct_train(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 100,
) -> DataFrame:
    """Cavnar-Trenkle ('94) language profiles: ``(label, gram, rank)``
    — each label's ``top_k`` char n-grams ranked by (count desc, gram
    asc). The third lang-ID family next to the stopword heuristic
    (text.lang_guess) and the learned NB gate (nb_classify): CT
    profiles need no stopword list and no smoothing, just rank order.

    Scale shape: one explode + ONE (label, gram)-keyed map-side-
    combinable count, then a per-label window over the label's GRAM
    VOCABULARY (alphabet^n-bounded rows, not corpus rows — a
    10^10-doc corpus and a 10^6-doc one rank the same table size)."""
    if top_k < 1 or n < 1:
        raise ValueError("top_k and n must be >= 1")
    from pyspark.sql import Window

    grams = df.select(
        F.col(label_col).alias("label"),
        F.explode(_ct_ngrams(F.col(text_col), n)).alias("gram"),
    )
    counts = grams.groupBy("label", "gram").agg(F.count("*").alias("_c"))
    w = Window.partitionBy("label").orderBy(F.desc("_c"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("label", "gram", F.col("rank").cast("int").alias("rank"))
    )


def ct_classify(
    df: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 100,
) -> DataFrame:
    """(id, label, distance) per doc: the label minimizing the CT
    out-of-place distance between the doc's own top-``top_k`` gram
    ranking and each profile — ``Σ |doc_rank − profile_rank|`` over
    the doc's grams, with the standard maximum penalty ``top_k`` for
    grams absent from a profile. Ties break by label asc. Docs with
    no grams have an empty sum — distance 0 against every label, so
    they classify as the lexicographically-lowest label (degenerate
    rows; gate on token count upstream, as the funnels do).

    Scale shape: per-doc ranking is a window over ONE doc's gram set
    (doc-length-bounded); candidates fan out over the label list (a
    broadcast of O(languages) rows — intended semantics, every doc
    scores every label) and join the broadcast profile table; one
    (id, label) aggregate + one id-keyed argmin."""
    from pyspark.sql import Window

    doc_grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(_ct_ngrams(F.col(text_col), n)).alias("gram"),
    )
    counts = doc_grams.groupBy("id", "gram").agg(F.count("*").alias("_c"))
    wd = Window.partitionBy("id").orderBy(F.desc("_c"), F.asc("gram"))
    ranked = (
        counts.withColumn("drank", F.row_number().over(wd))
        .filter(F.col("drank") <= top_k)
        .select("id", "gram", "drank")
    )
    labels = profiles.select("label").distinct()
    cand = ranked.crossJoin(F.broadcast(labels))
    joined = cand.join(F.broadcast(profiles), ["label", "gram"], "left")
    per = joined.groupBy("id", "label").agg(
        F.sum(
            F.coalesce(
                F.abs(F.col("drank") - F.col("rank")).cast("long"),
                F.lit(int(top_k)).cast("long"),
            )
        ).alias("distance")
    )
    # docs with no grams never reach `per`; re-attach with the
    # all-penalty distance against the lexicographically-lowest label
    best = per.groupBy("id").agg(
        F.min(F.struct("distance", "label")).alias("_b")
    ).select("id", F.col("_b.label").alias("label"), F.col("_b.distance").alias("distance"))
    empty = (
        df.select(F.col(id_col).alias("id"))
        .join(best.select("id"), "id", "left_anti")
        .crossJoin(F.broadcast(labels.agg(F.min("label").alias("label"))))
        .withColumn("distance", F.lit(0).cast("long"))
    )
    return best.unionByName(empty)
