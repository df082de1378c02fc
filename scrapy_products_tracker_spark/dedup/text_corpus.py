"""End-to-end text-corpus deduplication — the composed operator a
training-data pipeline actually calls, built from the tested pieces:

1. **Exact pass**: whitespace-normalized lowercase content fingerprint
   (functions/text.fingerprint); the lowest-id doc of each fingerprint
   group survives (first-discovery-wins, the same policy as the URL
   frontier's in-batch dedup D2).
2. **Near pass**: MinHash signatures -> LSH band candidates ->
   signature Jaccard estimate >= ``threshold``; then one of two loser
   policies:
   - ``transitive=False`` (default): the higher id of each surviving
     pair is dropped (greedy-by-id, the standard practical near-dedup
     policy — pairwise, so a doc that only appears as the LOWER id of
     its pairs survives even when its cluster has a smaller member);
   - ``transitive=True``: cluster-exact — connected components of the
     pair graph by iterative min-id label propagation
     (``min_label_components``); exactly the lowest-id doc of each
     component survives. This is what a duplicate CHAIN (A≈H, H≈B,
     A≉B) needs to keep one doc per cluster.

Scale shape: one window per fingerprint group (shuffle on fp), the
MinHash/LSH path's one signature shuffle + band equi-join (never
all-pairs), and a final left-anti join on the 8-byte id. The
transitive pass adds O(component diameter) join+agg rounds over the
(node, label) table — near-dup components are shallow (duplicates of
a common source), so this is a handful of rounds, each shuffling only
8-byte ids, never text. Nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import (
    lsh_candidate_pairs,
    minhash_jaccard_estimate,
    minhash_signature,
)
from ..functions.text import fingerprint


def min_label_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 50,
) -> DataFrame:
    """(node, label) connected-component labels of an undirected edge
    list: label = the component's minimum node id, computed by
    iterative min-label propagation (each round every node takes the
    min of its own label and its neighbors'; converges in O(diameter)
    rounds — the classic large-graph CC, e.g. GraphX/Pregel's
    ConnectedComponents, here as plain DataFrame joins).

    Deterministic and partitioning-independent. Each round shuffles
    only (8-byte id, 8-byte label) rows. Raises if ``max_iters`` rounds
    don't converge (a duplicate graph with diameter 50 means the
    threshold is far too loose, not that more rounds would help).

    Lineage discipline: every iterative DataFrame is cut with
    ``localCheckpoint`` — without it each round's plan embeds the whole
    upstream operator tree (here: the MinHash/LSH pipeline) one level
    deeper, and Catalyst re-analyzes that growing plan every round
    (measured ~20x the actual execution time by round 3). Local (non-
    reliable) checkpoints are the right tradeoff for an iterative op
    whose input is recomputable; a reliable ``checkpoint()`` dir swaps
    in transparently where executor loss must be survivable."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        # convergence rides the SAME aggregation as the label fold: the
        # node's own row carries its previous label as ``_old`` (message
        # rows carry NULL), so min(label) is the new label and max(_old)
        # recovers the old one — no per-round old⋈new join+count. The
        # probe after the checkpoint is a scan of already-materialized
        # 16-byte rows, not a job over the join.
        lbl_t = labels.schema["label"].dataType  # ids may be long OR string
        msgs = edges.join(
            labels, edges["src"] == labels["node"], "inner"
        ).select(
            F.col("dst").alias("node"), "label", F.lit(None).cast(lbl_t).alias("_old")
        )
        new_labels = (
            labels.select("node", "label", F.col("label").alias("_old"))
            .unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("_old").alias("_old"))
            .withColumn(
                "_changed", (F.col("label") != F.col("_old")).cast("int")
            )
            .localCheckpoint()
        )
        any_changed = new_labels.agg(F.max("_changed")).first()[0]
        labels = new_labels.select("node", "label")
        if not any_changed:
            return labels
    raise RuntimeError(f"min_label_components did not converge in {max_iters} rounds")


def dedup_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    transitive: bool = False,
    max_iters: int = 50,
) -> DataFrame:
    """Survivors of exact + MinHash-LSH near dedup (original columns).

    ``max_iters`` bounds the transitive min-label propagation (component
    DIAMETER, not size — 50 covers a 50-hop revision chain; raise it for
    longer chains rather than letting the job abort).

    Deterministic: ties always resolve to the lowest id, so the result
    is a pure function of the input set regardless of partitioning.
    NULL-text docs carry no content to compare, so they pass through
    untouched (a NULL md5 would otherwise collapse them into one
    "duplicate" group). The loser-id set is materialized eagerly so the
    expensive signature cache can be released before returning (ids are
    8 bytes/doc; signatures are n_hashes longs/doc).
    """
    no_text = df.filter(F.col(text_col).isNull())
    with_text = df.filter(F.col(text_col).isNotNull())
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    exact = (
        with_text.withColumn("_fp", fingerprint(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )
    sig = minhash_signature(exact, id_col, text_col, n_hashes=n_hashes, k=k).persist()
    pairs = lsh_candidate_pairs(sig, n_hashes=n_hashes, bands=bands)
    near = minhash_jaccard_estimate(sig, pairs, n_hashes=n_hashes).filter(
        F.col("jaccard_est") >= threshold
    )
    if transitive:
        # cluster-exact: every non-minimum member of each connected
        # component loses (min-id propagation over the pair graph)
        comp = min_label_components(near, "doc_a", "doc_b", max_iters=max_iters)
        losers = (
            comp.filter(F.col("node") != F.col("label"))
            .select(F.col("node").alias("_loser"))
            .persist()
        )
    else:
        losers = near.select(F.col("doc_b").alias("_loser")).distinct().persist()
    losers.count()  # materialize the (narrow) loser ids, then free the signatures
    sig.unpersist()
    return exact.join(
        losers, exact[id_col] == losers["_loser"], "left_anti"
    ).unionByName(no_text)


def curate_corpus(
    df: DataFrame,
    *,
    min_tokens: int = 10,
    min_quality: float = 0.5,
    lang: str | None = None,
    threshold: float = 0.8,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    transitive: bool = False,
    max_iters: int = 50,
    balance_col: str | None = None,
    sample_target: int | None = None,
    salt: str = "ts1",
    seq_len: int | None = None,
    range_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    classifier_target: Column | None = None,
    classifier_margin_unats: int = 0,
    classifier_buckets: int = 512,
    scrub_pii: bool = False,
    nfc: bool = False,
    dedup_lines: bool = False,
    min_zratio_milli: int | None = None,
    flesch_range_milli: tuple[int, int] | None = None,
    ppl_drop_tail: bool = False,
    ppl_group_col: str | None = None,
    ppl_vocab_size: int = 64,
) -> DataFrame:
    """The end-to-end TEXT curation funnel an LM pre-training corpus
    runs — the documents-table twin of ``imaging/dataset.curate`` —
    composed from this package's tested operators in one lazy plan:

    0a. **NFC normalize** (when ``nfc``) — Unicode canonical
       composition (:func:`~..functions.text.nfc_normalize_col`)
       BEFORE anything fingerprints the text, so byte-different
       renderings of identical text dedup together;
    0. **scrub** (when ``scrub_pii``) — email/IPv4/phone redaction
       (:func:`~..functions.text.pii_scrub`) applied to ``text_col``
       before anything reads it, so quality scores, dedup
       fingerprints and packed spans all see the redacted bytes;
    0b. **boilerplate removal** (when ``dedup_lines``) — intra-doc
       repeated-line dedup (:func:`~..functions.text.dedup_doc_lines`)
       so pages differing only in nav/footer boilerplate collapse
       onto one content fingerprint;
    1. **filter** — C4-style row rules at the scan: whitespace token
       count ``>= min_tokens``, composite ``quality_score >=
       min_quality``, and (when ``lang`` is given) the stopword-density
       ``lang_guess`` must equal it. NULL/blank text fails the token
       floor, so contentless docs exit here (contrast
       :func:`dedup_corpus` standalone, which passes NULL text through
       — a curation funnel's quality gate IS the place they drop);
    1a. **compressibility gate** (when ``min_zratio_milli``) — deflate
       ratio floor (:func:`~..functions.text.compression_ratio_stats`):
       template spam / keyword stuffing drops here;
    1b. **learned gate** (when ``classifier_target`` is given) — a
       binary Naive-Bayes gate (CCNet idiom,
       :mod:`~..functions.classify`): train target-vs-background on
       the rule-labeled survivors themselves, keep rows whose
       target log-odds margin ``>= classifier_margin_unats``;
    1c. **perplexity gate** (when ``ppl_drop_tail``) — the CCNet
       head/middle/tail split (:func:`~..functions.text
       .perplexity_buckets` over a self-trained
       :func:`~..functions.text.lm_bigram_scores` LM, grouped by
       ``ppl_group_col``): the worst-30% 'tail' slice is dropped;
    2. **dedup** — :func:`dedup_corpus` (exact fingerprint first-wins +
       MinHash-LSH near-dup; ``transitive=True`` for cluster-exact
       min-label components);
    3. **balance** — sqrt-temperature per-``balance_col`` re-sampling
       (:func:`~..functions.sampling.temperature_sample`) when
       ``sample_target`` is given, attaching ``sample_rank`` /
       ``group_quota``;
    4. **pack** — GPT-style concat-and-chunk sequence spans
       (:func:`~..functions.text.pack_sequences`) when ``seq_len`` is
       given, attaching ``n_tokens``/``tok_before``/``first_seq``/
       ``last_seq`` (pass ``range_col`` at scale — see its contract).

    Reference parity: this is the batch analog of the reference's
    whole pipeline-after-fetch (spider parse → dupefilter → pipeline
    export, ``src/python/src/pipelines/``), generalized to the
    training-data curation idiom the north rule targets.

    Scale shape: stage 1 is row-local codegen fused into the scan
    (filters push down; no Python); stage 2 shuffles one fingerprint
    window + the banded signature equi-join (never all-pairs); stages
    3-4 each run over a NARROW (id, group/token-count) projection with
    one group/range-keyed exchange, then join their tiny verdict
    columns back on the 8-byte id. The wide text column crosses
    exactly the exchanges dedup itself needs; everything downstream of
    the id-joins reuses AQE's id partitioning."""
    from ..functions.text import lang_guess, quality_score, token_count

    if nfc:
        # 0a. canonical composition first — the scrub regexes and all
        # fingerprints downstream must see one rendering per text
        from ..functions.text import nfc_normalize_col

        df = df.withColumn(text_col, nfc_normalize_col(F.col(text_col)))
    if scrub_pii:
        # 0. redaction — every downstream stage (quality, dedup keys,
        # packing) sees the scrubbed bytes, so near-dup pairs that
        # differ only in PII spans collapse onto the same placeholder
        # text. Row-local regexp algebra fused into the scan.
        from ..functions.text import pii_scrub

        df = df.withColumn(text_col, pii_scrub(F.col(text_col)))
    if dedup_lines:
        # 0b. intra-doc boilerplate removal (CCNet/Dolma line pass,
        # functions/text.dedup_doc_lines): repeated nav/footer lines
        # vanish BEFORE quality scoring and dedup fingerprinting, so
        # two pages that differ only in boilerplate collapse onto the
        # same content fingerprint. Row-local column algebra.
        from ..functions.text import dedup_doc_lines

        df = df.withColumn(text_col, dedup_doc_lines(F.col(text_col)))
    cond = (token_count(F.col(text_col)) >= F.lit(int(min_tokens))) & (
        quality_score(F.col(text_col)) >= F.lit(float(min_quality))
    )
    if lang is not None:
        cond = cond & (lang_guess(F.col(text_col)) == F.lit(lang))
    kept = df.filter(cond)
    if min_zratio_milli is not None:
        # 1a. compressibility gate (Gopher-class spam signal,
        # functions/text.compression_ratio_stats): drop docs whose
        # deflate ratio is below the floor — template spam and
        # keyword stuffing compress far better than prose. Map-only
        # Arrow kernel over a narrow (id, text) projection; the tiny
        # verdict joins back on the 8-byte id like the other gates.
        from ..functions.text import compression_ratio_stats

        zr = compression_ratio_stats(kept, id_col=id_col, text_col=text_col)
        kept = kept.join(
            zr.filter(F.col("ratio_milli") >= F.lit(int(min_zratio_milli))).select(
                F.col("id").alias(id_col)
            ),
            id_col,
        )
    if flesch_range_milli is not None:
        # 1a'. readability band (functions/text.readability_scores):
        # keep docs whose Flesch Reading Ease lands inside
        # [lo, hi] milli — the standard both-tails gate (word salad
        # scores implausibly high; boilerplate/legalese implausibly
        # low). Zero-shuffle column algebra; the narrow verdict joins
        # back on the 8-byte id like the other gates.
        from ..functions.text import readability_scores

        lo, hi = flesch_range_milli
        if lo > hi:
            raise ValueError("flesch_range_milli must be (lo, hi) with lo <= hi")
        rs = readability_scores(kept, id_col=id_col, text_col=text_col)
        kept = kept.join(
            rs.filter(
                F.col("flesch_milli").between(F.lit(int(lo)), F.lit(int(hi)))
            ).select(id_col),
            id_col,
        )
    if classifier_target is not None:
        # 1b. learned quality gate (CCNet idiom): train a binary NB on
        # the rule-labeled rows themselves (target vs background),
        # keep rows whose target-vs-background log-odds margin clears
        # classifier_margin_unats — the classifier generalizes the
        # rule through token statistics, so borderline rows are kept
        # or dropped by what they SAY, not only by the rule. Model is
        # a broadcast n_buckets x 2 table; scoring is one explode pass
        # (functions/classify.py scale notes).
        from ..functions.classify import nb_score, nb_train

        labeled = kept.withColumn(
            "_cls", F.when(classifier_target, F.lit("t")).otherwise(F.lit("b"))
        )
        w, pr = nb_train(labeled, "_cls", text_col=text_col, n_buckets=classifier_buckets)
        grid = nb_score(
            kept, w, pr, id_col=id_col, text_col=text_col,
            n_buckets=classifier_buckets, all_scores=True,
        )
        # degenerate training sets: no background examples -> nothing
        # to contrast against, keep everything (margin +big); no
        # target examples -> nothing is target-like, drop everything
        _floor = F.lit(-(1 << 62))
        margins = grid.groupBy("id").agg(
            (
                F.coalesce(
                    F.max(F.when(F.col("label") == "t", F.col("score_unats"))), _floor
                )
                - F.coalesce(
                    F.max(F.when(F.col("label") == "b", F.col("score_unats"))), _floor
                )
            ).alias("_margin")
        )
        kept = kept.join(
            margins.filter(
                F.col("_margin") >= F.lit(int(classifier_margin_unats))
            ).select(F.col("id").alias(id_col)),
            id_col,
        )
    if ppl_drop_tail:
        # 1c. perplexity gate (the other half of the CCNet recipe):
        # self-train the bigram LM on the survivors, split per
        # ppl_group_col (language) into head/middle/tail on the
        # quantized score grid, and drop the worst-30% tail. Both
        # operators keep their own scale contracts (broadcast LM
        # count tables; histogram+broadcast-cuts split — no
        # per-language window over the data).
        from ..functions.text import lm_bigram_scores, perplexity_buckets

        scores = lm_bigram_scores(
            kept, vocab_size=ppl_vocab_size, id_col=id_col, text_col=text_col
        )
        if ppl_group_col is not None:
            scores = scores.join(
                kept.select(F.col(id_col).alias("doc"), ppl_group_col), "doc"
            )
        buckets = perplexity_buckets(scores, group_col=ppl_group_col)
        kept = kept.join(
            buckets.filter(F.col("bucket") != "tail").select(
                F.col("doc").alias(id_col)
            ),
            id_col,
        )
    out = dedup_corpus(
        kept,
        id_col,
        text_col,
        threshold=threshold,
        n_hashes=n_hashes,
        bands=bands,
        k=k,
        transitive=transitive,
        max_iters=max_iters,
    )
    if sample_target is not None:
        if balance_col is None:
            raise ValueError("sample_target requires balance_col")
        from ..functions.sampling import temperature_sample

        picked = temperature_sample(
            out.select(id_col, balance_col), balance_col, id_col, sample_target, salt=salt
        )
        out = out.join(
            picked.select(id_col, "sample_rank", "group_quota"), id_col
        )
    if seq_len is not None:
        from ..functions.text import pack_sequences

        spans = pack_sequences(
            out, seq_len, id_col=id_col, text_col=text_col, range_col=range_col
        )
        out = out.join(
            spans.select(
                F.col("id").alias(id_col),
                "n_tokens",
                "tok_before",
                "first_seq",
                "last_seq",
            ),
            id_col,
        )
    return out


def dedup_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    dedup_within: bool = True,
) -> DataFrame:
    """Incremental-ingestion dedup: survivors of a NEW batch that
    duplicate neither each other nor the EXISTING corpus — how a
    production corpus actually grows (each crawl round's documents are
    deduped against everything already ingested, the text twin of the
    URL frontier's seen-set anti-join J5).

    Three passes, all narrow:

    1. within-batch :func:`dedup_corpus` (skippable via
       ``dedup_within=False`` when the batch is pre-deduped);
    2. exact cross: anti-join on the content fingerprint against the
       corpus's DISTINCT fingerprint set (16-byte keys — at 10^10 docs
       this is the persisted fingerprint table, not a recompute);
    3. near cross: MinHash signatures for both sides,
       :func:`~..functions.similarity.lsh_cross_candidates` band
       equi-join (within-set pairs never emitted), signature Jaccard
       ``>= threshold`` drops the NEW doc.

    Requires globally unique ids across both inputs (true of any real
    ingest pipeline; the Jaccard verify joins a union signature
    table). NULL-text new docs pass through (no content to compare).
    The corpus side is taken as-is — deduping IT is a separate
    :func:`dedup_corpus` run, not this operator's job."""
    from ..functions.similarity import lsh_cross_candidates

    base = (
        dedup_corpus(
            new_df, id_col, text_col,
            threshold=threshold, n_hashes=n_hashes, bands=bands, k=k,
        )
        if dedup_within
        else new_df
    )
    no_text = base.filter(F.col(text_col).isNull())
    cand = base.filter(F.col(text_col).isNotNull())
    corpus_live = corpus_df.filter(F.col(text_col).isNotNull())
    corpus_fp = corpus_live.select(fingerprint(F.col(text_col)).alias("_fp")).distinct()
    ex = (
        cand.withColumn("_fp", fingerprint(F.col(text_col)))
        .join(corpus_fp, "_fp", "left_anti")
        .drop("_fp")
    )
    # Persist BOTH signature sides: each feeds two consumers (the band
    # candidate join and the Jaccard verify union), and the corpus side
    # is the expensive subtree at 10^10 docs — without the persist it
    # would be shingled+hashed twice.
    sig_new = minhash_signature(ex, id_col, text_col, n_hashes=n_hashes, k=k).persist()
    sig_old = minhash_signature(corpus_live, id_col, text_col, n_hashes=n_hashes, k=k).persist()
    pairs = lsh_cross_candidates(sig_new, sig_old, n_hashes=n_hashes, bands=bands)
    near = minhash_jaccard_estimate(
        sig_new.unionByName(sig_old), pairs, n_hashes=n_hashes
    ).filter(F.col("jaccard_est") >= threshold)
    losers = near.select(F.col("doc_a").alias("_loser")).distinct().persist()
    losers.count()  # materialize narrow loser ids, then free the signatures
    sig_new.unpersist()
    sig_old.unpersist()
    # `losers` stays persisted until the survivors DataFrame is
    # materialized by the caller: it is a narrow (8-byte id) set sized
    # by the duplicate count, and releasing it here would recompute the
    # whole signature pipeline on first action. Callers that loop over
    # many ingest rounds should checkpoint/write the survivors and then
    # spark.catalog.clearCache() (the funnel entrypoints do).
    return ex.join(losers, ex[id_col] == losers["_loser"], "left_anti").unionByName(
        no_text
    )
