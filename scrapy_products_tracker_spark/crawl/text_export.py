"""WARC archive → curated, packed LM-corpus parquet shards: the text
twin of ``imaging/training_export.py`` and the Common-Crawl→C4/
RefinedWeb story run over the engine's OWN archive surface — the
crawl writes WARC shards (``crawl/warc.py``); this module re-processes
them into the token-packed corpus a language-model trainer mounts.

Pipeline (every stage an already-tested operator):

1. parse the WARC shards back to response records
   (:func:`~.warc.read_warc_shards`), keep status-200 rows with
   verified payload digests;
2. HTML → document text (:func:`~..functions.html.main_content_col` —
   jusText-style block + link-density extraction; or the plain
   boilerplate strip when ``main_content=False``), ``doc_id =
   xxhash64(url)``, ``source`` = registrable domain (the politeness /
   mixture key);
3. ``incremental=True``: exact + cross-set MinHash-LSH dedup against
   everything already published (:func:`~..dedup.text_corpus.
   dedup_against_corpus`) — the published corpus is RE-DERIVED from
   the archive by semi-join on the published id bookkeeping, so no
   second copy of the text is ever stored (same trick as the image
   twin's store re-read);
4. the text curation funnel (:func:`~..dedup.text_corpus.
   curate_corpus`: quality gates → dedup → balance → GPT-style
   sequence packing);
5. shard the packed stream by token offset (``shard_id = tok_before
   div budget_tokens``) and materialize ONE deterministic parquet
   file per shard executor-side (atomic rename publish, md5
   manifest) — delta shards number after the highest published one,
   delivered files are immutable.

Scale shape: WARC payload bytes live only inside the parse kernel's
partition; stages 2-4 are the funnel's narrow-projection plans; the
shard writer shuffles each row exactly once on ``shard_id``. The
driver sees only the (shard_id, n_docs, n_tokens, md5) manifest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

TEXT_MANIFEST_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("path", StringType()),
        StructField("n_docs", LongType()),
        StructField("n_tokens", LongType()),
        StructField("parquet_md5", StringType()),
    ]
)

_SHARD_COLS = ["doc_id", "url", "source", "text", "n_tokens", "tok_before"]


def export_text_corpus(
    spark: SparkSession,
    warc_shards: DataFrame,
    out_dir: str,
    *,
    budget_tokens: int,
    seq_len: int = 1024,
    main_content: bool = True,
    min_tokens: int = 10,
    min_quality: float = 0.0,
    threshold: float = 0.8,
    balance_col: str | None = None,
    sample_target: int | None = None,
    incremental: bool = False,
    curate_kwargs: dict | None = None,
) -> DataFrame:
    """Export ``warc_shards`` (``shard_id, warc_bytes`` rows) as
    curated, token-packed parquet corpus shards under ``out_dir``;
    returns the manifest ``(shard_id, path, n_docs, n_tokens,
    parquet_md5)``.

    Deterministic end to end: the same archive produces byte-identical
    shard files (extraction, funnel, packing and the shard writer are
    all id-ordered and partitioning-invariant; re-crawled bodies for
    one url keep the min-``md5(text)`` row, not an arbitrary
    partition's), so a re-export is a safe retry. ``incremental=True``
    publishes a DELTA: bookkeeping under ``out_dir/_published`` (doc
    ids) + ``out_dir/_manifest``, committed ATOMICALLY by one pointer
    flip (``export_commit`` — a crash mid-publish leaves the pointer
    unflipped, so the retry recomputes and overwrites the identical
    delta; no doc is ever silently dropped); re-crawled pages and
    near-duplicates of already-published docs never re-ship; each
    delta is its own packed token stream (documented: ``tok_before``
    restarts per export — a trainer concatenates shards in manifest
    order). An empty delta publishes nothing."""
    from pyspark.sql import Window

    from ..dedup.text_corpus import curate_corpus, dedup_against_corpus
    from ..export_commit import (
        commit_delta,
        committed_deltas,
        read_committed,
        stage_delta,
    )
    from ..functions.html import html_to_text_col, main_content_col
    from ..functions.urls import registrable_domain
    from .warc import read_warc_shards

    if budget_tokens < seq_len:
        raise ValueError("budget_tokens must be >= seq_len")
    recs = read_warc_shards(warc_shards).filter(
        (F.col("status") == 200) & (F.col("digest_ok") == 1) & F.col("body").isNotNull()
    )
    body_txt = F.decode(F.col("body"), "UTF-8")
    text = main_content_col(body_txt) if main_content else html_to_text_col(body_txt)
    docs = recs.select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        registrable_domain(F.col("url")).alias("source"),
        text.alias("text"),
    )
    # deterministic keeper across re-crawls of one url: min md5(text)
    # per doc_id (dropDuplicates keeps a partitioning-dependent row,
    # breaking the byte-identical-shards contract when the archive
    # holds multiple 200s for the same url with different bodies)
    w_keep = Window.partitionBy("doc_id").orderBy(F.md5(F.col("text")).asc_nulls_first())
    docs = (
        docs.withColumn("_rn", F.row_number().over(w_keep))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    prior = incremental and bool(committed_deltas(out_dir))
    delta_id = len(committed_deltas(out_dir)) if incremental else 0
    base_shard = 0
    if prior:
        published = read_committed(spark, out_dir, "_published").select(
            "doc_id"
        ).distinct()
        base_shard = (
            int(
                read_committed(spark, out_dir, "_manifest")
                .agg(F.max("shard_id"))
                .first()[0]
                or -1
            )
            + 1
        )
        corpus = docs.join(published, "doc_id", "leftsemi")
        fresh = docs.join(published, "doc_id", "left_anti")
        # cut the cross-set dedup lineage before the funnel stacks its
        # own plan on top — without this the composed tree (WARC parse
        # -> extraction -> MinHash cross-set -> funnel -> packing)
        # re-analyzes and re-executes wholesale for every downstream
        # action (the driver-heap growth mode the dedup cluster loop
        # documents)
        docs = dedup_against_corpus(fresh, corpus, threshold=threshold).localCheckpoint()

    curated = curate_corpus(
        docs,
        min_tokens=min_tokens,
        min_quality=min_quality,
        threshold=threshold,
        balance_col=balance_col,
        sample_target=sample_target,
        seq_len=seq_len,
        **(curate_kwargs or {}),
    ).localCheckpoint()  # consumed twice (shard writer + bookkeeping):
    # checkpointing computes the funnel ONCE and frees its plan tree
    assign = curated.select(
        *_SHARD_COLS,
        F.expr(f"tok_before div {int(budget_tokens)}").alias("shard_id"),
    )
    if base_shard:
        assign = assign.withColumn(
            "shard_id", (F.col("shard_id") + F.lit(base_shard)).cast("long")
        )
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches):
        import hashlib
        import io

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        pending: dict = {}
        for pdf in batches:
            for sid, grp in pdf.groupby("shard_id"):
                pending.setdefault(int(sid), []).append(grp)
        rows_out = []
        for sid, parts in pending.items():
            grp = pd.concat(parts).sort_values("tok_before")[_SHARD_COLS]
            table = pa.Table.from_pandas(
                grp.reset_index(drop=True), preserve_index=False
            )
            buf = io.BytesIO()
            # fixed writer settings -> byte-deterministic shard files
            pq.write_table(table, buf, compression="zstd", write_statistics=False)
            data = buf.getvalue()
            path = os.path.join(out_dir, f"corpus-{sid:06d}.parquet")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)  # atomic publish per shard
            rows_out.append(
                {
                    "shard_id": sid,
                    "path": path,
                    "n_docs": int(len(grp)),
                    "n_tokens": int(grp["n_tokens"].sum()),
                    "parquet_md5": hashlib.md5(data).hexdigest(),
                }
            )
        yield pd.DataFrame(
            rows_out,
            columns=["shard_id", "path", "n_docs", "n_tokens", "parquet_md5"],
        )

    manifest = (
        assign.repartition("shard_id")
        .mapInPandas(_write, TEXT_MANIFEST_SCHEMA)
        .orderBy("shard_id")
    )
    out = manifest.collect()
    man_df = spark.createDataFrame(out, TEXT_MANIFEST_SCHEMA)
    if not out:  # empty delta publishes nothing — no dirs, no commit
        return man_df
    # bookkeeping lands AFTER the shard files, staged into an invisible
    # delta dir and made visible by ONE atomic pointer flip: a crash at
    # any point before the flip leaves prior state intact and the retry
    # recomputes + overwrites the identical delta (determinism contract
    # above) — no doc can be marked published without its shards
    # reaching the manifest
    stage_delta(out_dir, "_published", curated.select("doc_id"), delta_id)
    stage_delta(out_dir, "_manifest", man_df, delta_id)
    commit_delta(out_dir, delta_id, full=not incremental)
    return man_df
