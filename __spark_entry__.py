"""Driver contract: flagship entry + per-operator queries + DuckDB oracles.

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
(or a training-data-pipeline op) over the driver-generated tables; the
matching ``oracle_sql()`` is the exact ANSI-SQL twin DuckDB runs on the
same parquet. Column names/types are aligned on both sides (the driver
hashes values after sorting columns by name).

Crawl-engine ops that are not SQL-expressible (full crawl loop, MinHash
LSH, SimHash, hyperplane-LSH ANN) have no oracle entry -> the driver
records the weaker rows-only check; their exact-parity coverage lives
in tests/ against the pure-Python scheduling oracle instead.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions import text as TX
from scrapy_products_tracker_spark.functions import similarity as SIM


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _doc_urls(docs: DataFrame) -> DataFrame:
    """Derive a URL frontier from the documents table (urls collide on
    doc_id % 100 -> exercises the seen-set path)."""
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            (F.col("doc_id") % 100).cast("string"),
        ).alias("url"),
        "doc_id",
    )


# ---------------------------------------------------------------------------
# flagship: seed-ingest -> dedup -> per-domain politeness rank -> claim (S1-S5/O1)
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    sf_dir = "/root/testdata/sf0.001"
    urls = _doc_urls(_t(spark, sf_dir, "documents"))
    seen_once = urls.groupBy("url").agg(F.min("doc_id").alias("discovered_seq"))
    frontier = seen_once.withColumn(
        "domain", F.regexp_extract("url", r"^https://([^/]+)/", 1)
    )
    w = Window.partitionBy("domain").orderBy("discovered_seq", "url")
    claimed = (
        frontier.withColumn("rank_in_domain", F.row_number().over(w))
        .filter(F.col("rank_in_domain") <= 8)  # per-domain budget (R3)
        .orderBy("discovered_seq", "url")
        .limit(100)  # chunked claim (P3/O1)
    )
    return claimed.select("url", "domain", "discovered_seq", "rank_in_domain")


# ---------------------------------------------------------------------------
# operator queries (spark side)
# ---------------------------------------------------------------------------

def q_frontier_claim_topk(spark, sf):  # S5/O1: ORDER BY ... LIMIT chunk
    o = _t(spark, sf, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )


def q_politeness_budget_rank(spark, sf):  # R3/P1: per-key budget via rank
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


def q_seed_ingest_dedup(spark, sf):  # S1-S3/D1/D3: seen-set first-wins
    urls = _doc_urls(_t(spark, sf, "documents"))
    return urls.groupBy("url").agg(F.min("doc_id").alias("first_doc")).select(
        "url",
        F.regexp_extract("url", r"^https://([^/]+)/", 1).alias("domain"),
        "first_doc",
    )


def q_domain_routing_counts(spark, sf):  # R1/A7: per-queue depth
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def q_pagination_fanout(spark, sf):  # F1: computed fan-out via sequence
    p = _t(spark, sf, "part")
    pages = F.ceil(F.col("p_size") / F.lit(10.0)).cast("int")
    return (
        p.filter(pages >= 2)
        .select("p_partkey", F.explode(F.sequence(F.lit(2), pages)).alias("page"))
    )


def q_position_ranking(spark, sf):  # F5/O2: position lineage as window
    li = _t(spark, sf, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_partkey", "l_linenumber")
    return li.select(
        "l_orderkey", "l_partkey", "l_linenumber", F.row_number().over(w).alias("pos")
    )


def q_status_derivation(spark, sf):  # A2/A3: SUCCESS/PARTIAL/HW truth table
    e = _t(spark, sf, "events")
    agg = e.groupBy("user_id").agg(
        F.count("*").alias("scheduled"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("long").alias("failed"),
    )
    status = (
        F.when(F.col("failed") == F.col("scheduled"), 41)
        .when(F.col("failed") == 0, 2)
        .otherwise(21)
    )
    return agg.select("user_id", "scheduled", "failed", status.alias("status"))


def q_task_counters(spark, sf):  # A1: per-task counter aggregation
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("users"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def q_retry_escalation(spark, sf):  # X1: attempt budget arithmetic
    e = _t(spark, sf, "events")
    attempt = (F.col("event_id") % 7).cast("int")
    return e.groupBy("event_type").agg(
        F.sum(F.when(attempt < 5, 1).otherwise(0)).cast("long").alias("n_retryable"),
        F.sum(F.when(attempt >= 5, 1).otherwise(0)).cast("long").alias("n_gave_up"),
    )


def q_history_export_join(spark, sf):  # J1/S9: 3-way export join
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            # integer cents (floor) so the sum is order-independent and
            # bit-exact across engines (double sums are not associative)
            F.sum(F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100))
            .cast("long")
            .alias("revenue_cents"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


def q_session_export_join(spark, sf):  # J2: epoch-filtered export
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    sess = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        sess.join(li, sess["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
    )


def q_category_export(spark, sf):  # J3/O3: filter + order + limit export
    p = _t(spark, sf, "part")
    return (
        p.filter(F.col("p_size") >= 25)
        .orderBy(F.desc("p_retailprice"), "p_partkey")
        .limit(50)
        .select("p_partkey", "p_name", F.round("p_retailprice", 2).alias("price"))
    )


def q_export_bookkeeping(spark, sf):  # K9: unsent-only incremental export
    e = _t(spark, sf, "events")
    unsent = e.filter((F.col("event_id") % 10) >= 7)
    return unsent.groupBy("event_type").agg(F.count("*").alias("n_unsent"))


def q_json_projection(spark, sf):  # E1/E2: JSON field plucking
    e = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"), F.max(k).alias("max_k")
    )


def q_price_parse(spark, sf):  # E5/E6: price-string -> number (int-exact)
    li = _t(spark, sf, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    price_str = F.concat(F.lit("$"), cents.cast("string"))
    parsed = F.regexp_replace(price_str, r"[$,]", "").cast("long")
    return li.groupBy("l_returnflag").agg(F.sum(parsed).alias("total_cents"))


def q_timestamp_conversion(spark, sf):  # E11: datetime -> unix seconds
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.min(F.unix_timestamp("ts")).alias("min_ts"),
        F.max(F.unix_timestamp("ts")).alias("max_ts"),
    )


def q_sessionization_hourly(spark, sf):  # O5/O7: tumbling-window epochs
    e = _t(spark, sf, "events")
    return e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count("*").alias("n"))


def q_dedup_exact_text(spark, sf):  # exact dedup via content fingerprint
    d = _t(spark, sf, "documents")
    return d.groupBy(TX.fingerprint(F.col("text")).alias("fp")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc")
    )


def q_token_count_stats(spark, sf):  # token counting per language
    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.sum(TX.token_count(F.col("text"))).cast("long").alias("total_tokens"),
        F.round(F.avg(TX.token_count(F.col("text"))), 4).alias("avg_tokens"),
    )


def q_quality_scores(spark, sf):  # quality scoring heuristic per doc
    d = _t(spark, sf, "documents")
    return d.select("doc_id", TX.quality_score(F.col("text")).alias("quality"))


def q_lang_id_heuristic(spark, sf):  # stopword-density language ID
    d = _t(spark, sf, "documents")
    return d.select("doc_id", TX.lang_guess(F.col("text")).alias("lang_guess"))


def q_binary_payload_stats(spark, sf):  # opaque-binary column plumbing
    d = _t(spark, sf, "documents")
    return d.groupBy("source").agg(
        F.sum(F.octet_length(F.col("text"))).cast("long").alias("total_bytes"),
        F.max(F.octet_length(F.col("text"))).alias("max_bytes"),
    )


def q_currency_inference(spark, sf):  # E6/E9: currency map + stock normalization
    o = _t(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    sym = F.when(F.col("o_orderkey") % 2 == 0, F.lit("$")).otherwise(F.lit("£"))
    price_str = F.concat(sym, cents.cast("string"))
    currency = F.element_at(
        F.create_map(F.lit("$"), F.lit("USD"), F.lit("£"), F.lit("GBP")),
        F.substring(price_str, 1, 1),
    )
    in_stock = F.when(F.col("o_orderstatus") == "F", F.lit(0)).otherwise(F.lit(1))
    return o.groupBy(currency.alias("currency"), in_stock.alias("in_stock")).agg(
        F.count("*").alias("n"), F.sum(cents).alias("total_cents")
    )


def q_embedding_neardup_pairs(spark, sf):  # embedding-cosine near-dup (banded)
    emb = _t(spark, sf, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        (F.col("vec_id") % 20).alias("band"),
    )
    a, b = emb.alias("a"), emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = SIM.cosine_sim(F.col("a.v"), F.col("b.v"))
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.2)
    )


def q_ngram_jaccard_pairs(spark, sf):  # exact char-3-gram Jaccard (banded pairs)
    d = _t(spark, sf, "documents").select(
        "doc_id", "source", F.lower(F.substring("text", 1, 200)).alias("t")
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("t") - 2, F.lit(1))),
            lambda i: F.substr(F.col("t"), i, F.lit(3)),
        )
    )
    g = d.select("doc_id", "source", grams.alias("g"))
    a, b = g.alias("a"), g.alias("b")
    pairs = a.join(
        b,
        (F.col("a.source") == F.col("b.source"))
        & (F.col("b.doc_id") > F.col("a.doc_id"))
        & (F.col("b.doc_id") <= F.col("a.doc_id") + 40),
    )
    inter = F.size(F.array_intersect(F.col("a.g"), F.col("b.g")))
    union = F.size(F.array_union(F.col("a.g"), F.col("b.g")))
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(inter / union, 6).alias("jaccard"),
    )


def q_ann_cosine_topk(spark, sf):  # brute-force cosine top-k (exact ANN baseline)
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    return SIM.ann_topk_bruteforce(emb.filter(F.col("vec_id") > 0), qvec, k=10)


def q_embedding_norms(spark, sf):  # vectorized norm via aggregate/zip_with
    emb = _t(spark, sf, "embeddings")
    return emb.select(
        "vec_id",
        F.round(SIM._norm(F.col("embedding").cast("array<double>")), 6).alias("l2_norm"),
    )


# --- rows-only queries (non-SQL-expressible; exact parity lives in tests/) --

def q_minhash_lsh_neardup(spark, sf):
    d = _t(spark, sf, "documents")
    # persist the signature: banding reads it once (single-pass explode)
    # and the verification join reads it twice more
    sig = SIM.minhash_signature(d, "doc_id", "text", n_hashes=32, k=3).persist()
    pairs = SIM.lsh_candidate_pairs(sig, n_hashes=32, bands=8)
    est = SIM.minhash_jaccard_estimate(sig, pairs, n_hashes=32)
    return est.filter(F.col("jaccard_est") >= 0.5).orderBy("doc_a", "doc_b")


def q_simhash_neardup(spark, sf):
    d = _t(spark, sf, "documents")
    return SIM.simhash64(d, "doc_id", "text").orderBy("doc")


def q_ann_lsh_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    return SIM.ann_topk_lsh(emb.filter(F.col("vec_id") > 0), qvec, k=10, n_planes=8)


def q_multimodal_decode_stats(spark, sf):
    """Binary image column -> decode/inspect inside Arrow batches
    (mapInPandas): per-format counts, pixel stats, decode success.
    Exercises the opaque-binary + typed-metadata multimodal path on the
    deterministic t1 payload table; rows-only check (the codec is not
    SQL-expressible)."""
    import pandas as pd

    from pyspark.sql import types as T
    from scrapy_products_tracker_spark.imaging import decode_image
    from scrapy_products_tracker_spark.synth import T1_SMOKE, generate_world, write_world

    tmp = tempfile.mkdtemp(prefix="mm_decode_")
    paths = write_world(generate_world(T1_SMOKE), tmp)
    img = spark.read.parquet(paths["image_caption"])

    schema = T.StructType(
        [
            T.StructField("fmt", T.StringType()),
            T.StructField("decode_ok", T.BooleanType()),
            T.StructField("px", T.LongType()),
            T.StructField("mean_intensity", T.DoubleType()),
        ]
    )

    def _inspect(batches):
        for pdf in batches:
            rows = []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(data))
                    rows.append((fmt, True, int(px.shape[0] * px.shape[1]), float(px.mean())))
                except Exception:
                    rows.append((fmt, False, 0, 0.0))
            yield pd.DataFrame(rows, columns=["fmt", "decode_ok", "px", "mean_intensity"])

    return (
        img.mapInPandas(_inspect, schema)
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("decode_ok"), 1).otherwise(0)).alias("n_ok"),
            F.sum("px").alias("total_px"),
            F.round(F.avg("mean_intensity"), 2).alias("avg_intensity"),
        )
        .orderBy("fmt")
    )


def q_crawl_end_to_end(spark, sf):
    """Full crawl loop on the deterministic t1 world: returns the crawl
    order (the north-rule artifact). Exact parity vs the pure-Python
    oracle is asserted in tests/test_crawl_parity.py."""
    from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
    from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
    from scrapy_products_tracker_spark.politeness import load_robots
    from scrapy_products_tracker_spark.synth import T1_SMOKE, generate_world, write_world

    tmp = tempfile.mkdtemp(prefix="crawl_e2e_")
    paths = write_world(generate_world(T1_SMOKE), tmp + "/world")
    store = SnapshotParquetStore(tmp + "/store")
    drv = CrawlDriver(
        spark,
        store,
        spark.read.parquet(paths["pages"]),
        spark.read.parquet(paths["image_caption"]),
        load_robots(spark, paths["robots"]),
        CrawlConfig(chunk_size=50),
    )
    drv.seed(spark.read.parquet(paths["seeds"]))
    drv.run()
    return store.read_crawl_order(spark).orderBy("round", "within_round_rank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "frontier_claim_topk": q_frontier_claim_topk,
        "politeness_budget_rank": q_politeness_budget_rank,
        "seed_ingest_dedup": q_seed_ingest_dedup,
        "domain_routing_counts": q_domain_routing_counts,
        "pagination_fanout": q_pagination_fanout,
        "position_ranking": q_position_ranking,
        "status_derivation": q_status_derivation,
        "task_counters": q_task_counters,
        "retry_escalation": q_retry_escalation,
        "history_export_join": q_history_export_join,
        "session_export_join": q_session_export_join,
        "category_export": q_category_export,
        "export_bookkeeping": q_export_bookkeeping,
        "json_projection": q_json_projection,
        "price_parse": q_price_parse,
        "timestamp_conversion": q_timestamp_conversion,
        "sessionization_hourly": q_sessionization_hourly,
        "dedup_exact_text": q_dedup_exact_text,
        "token_count_stats": q_token_count_stats,
        "quality_scores": q_quality_scores,
        "lang_id_heuristic": q_lang_id_heuristic,
        "binary_payload_stats": q_binary_payload_stats,
        "ann_cosine_topk": q_ann_cosine_topk,
        "embedding_norms": q_embedding_norms,
        "currency_inference": q_currency_inference,
        "embedding_neardup_pairs": q_embedding_neardup_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_lsh_neardup": q_minhash_lsh_neardup,
        "simhash_neardup": q_simhash_neardup,
        "ann_lsh_topk": q_ann_lsh_topk,
        "multimodal_decode_stats": q_multimodal_decode_stats,
        "crawl_end_to_end": q_crawl_end_to_end,
    }


_STOP_RE = r"\b(the|and|of|to|in|is|for|with|that|this)\b"
_NT = r"CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END"
_URL = "concat('https://', source, '.example.com/doc/', CAST(doc_id % 100 AS VARCHAR))"


def oracle_sql() -> dict[str, str]:
    return {
        "frontier_claim_topk": """
            SELECT o_orderkey, o_custkey, o_orderdate FROM orders
            WHERE o_orderstatus = 'O' ORDER BY o_orderdate, o_orderkey LIMIT 100
        """,
        "politeness_budget_rank": """
            SELECT o_custkey, o_orderkey, rnk FROM (
              SELECT o_custkey, o_orderkey,
                     CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS rnk
              FROM orders) WHERE rnk <= 3
        """,
        "seed_ingest_dedup": f"""
            SELECT url, regexp_extract(url, '^https://([^/]+)/', 1) AS domain,
                   min(doc_id) AS first_doc
            FROM (SELECT {_URL} AS url, doc_id FROM documents)
            GROUP BY url
        """,
        "domain_routing_counts": """
            SELECT o_orderpriority, count(*) AS n,
                   round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
            FROM orders GROUP BY o_orderpriority
        """,
        "pagination_fanout": """
            SELECT p_partkey, CAST(unnest(generate_series(2, pages)) AS INT) AS page
            FROM (SELECT p_partkey, CAST(ceil(p_size / 10.0) AS INT) AS pages FROM part)
            WHERE pages >= 2
        """,
        "position_ranking": """
            SELECT l_orderkey, l_partkey, l_linenumber,
                   CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_partkey, l_linenumber) AS INT) AS pos
            FROM lineitem
        """,
        "status_derivation": """
            SELECT user_id, scheduled, failed,
                   CASE WHEN failed = scheduled THEN 41 WHEN failed = 0 THEN 2 ELSE 21 END AS status
            FROM (SELECT user_id, count(*) AS scheduled,
                         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS failed
                  FROM events GROUP BY user_id)
        """,
        "task_counters": """
            SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users,
                   round(CAST(sum(value) AS DOUBLE), 2) AS total_value
            FROM events GROUP BY event_type
        """,
        "retry_escalation": """
            SELECT event_type,
                   CAST(sum(CASE WHEN event_id % 7 < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_retryable,
                   CAST(sum(CASE WHEN event_id % 7 >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_gave_up
            FROM events GROUP BY event_type
        """,
        "history_export_join": """
            SELECT c.c_custkey, c.c_name,
                   CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(DISTINCT o.o_orderkey) AS n_orders
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY c.c_custkey, c.c_name
        """,
        "session_export_join": """
            SELECT o_orderpriority, count(*) AS n_lines,
                   round(CAST(avg(l_quantity) AS DOUBLE), 4) AS avg_qty
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY o_orderpriority
        """,
        "category_export": """
            SELECT p_partkey, p_name, round(CAST(p_retailprice AS DOUBLE), 2) AS price
            FROM part WHERE p_size >= 25
            ORDER BY p_retailprice DESC, p_partkey LIMIT 50
        """,
        "export_bookkeeping": """
            SELECT event_type, count(*) AS n_unsent FROM events
            WHERE event_id % 10 >= 7 GROUP BY event_type
        """,
        "json_projection": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
                   max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
            FROM events GROUP BY event_type
        """,
        "price_parse": """
            SELECT l_returnflag,
                   CAST(sum(CAST(regexp_replace(concat('$', CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)), '[$,]', '', 'g') AS BIGINT)) AS BIGINT) AS total_cents
            FROM lineitem GROUP BY l_returnflag
        """,
        "timestamp_conversion": """
            SELECT event_type,
                   CAST(floor(epoch(min(ts))) AS BIGINT) AS min_ts,
                   CAST(floor(epoch(max(ts))) AS BIGINT) AS max_ts
            FROM events GROUP BY event_type
        """,
        "sessionization_hourly": """
            SELECT user_id, date_trunc('hour', ts) AS bucket, count(*) AS n
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        """,
        "dedup_exact_text": r"""
            SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
                   count(*) AS n_docs, min(doc_id) AS first_doc
            FROM documents GROUP BY 1
        """,
        "token_count_stats": f"""
            SELECT lang, CAST(sum(nt) AS BIGINT) AS total_tokens,
                   round(CAST(avg(nt) AS DOUBLE), 4) AS avg_tokens
            FROM (SELECT lang, {_NT} AS nt FROM documents) GROUP BY lang
        """,
        "quality_scores": rf"""
            SELECT doc_id, round((len_ok + wl_ok + punct_ok + stop_ok) / 4.0, 6) AS quality FROM (
              SELECT doc_id,
                     least(nt / 50.0, 1.0) AS len_ok,
                     CASE WHEN (CASE WHEN nt > 0 THEN length(regexp_replace(trim(text), '\s+', '', 'g')) * 1.0 / nt ELSE 0.0 END) >= 3.0
                           AND (CASE WHEN nt > 0 THEN length(regexp_replace(trim(text), '\s+', '', 'g')) * 1.0 / nt ELSE 0.0 END) <= 10.0
                          THEN 1.0 ELSE 0.5 END AS wl_ok,
                     1.0 - least((CASE WHEN length(text) > 0
                                       THEN (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / length(text)
                                       ELSE 0.0 END) * 5.0, 1.0) AS punct_ok,
                     CASE WHEN nt > 0 THEN least(len(regexp_extract_all(lower(text), '{_STOP_RE}')) * 10.0 / nt, 1.0) ELSE 0.0 END AS stop_ok
              FROM (SELECT doc_id, text, {_NT} AS nt FROM documents))
        """,
        "lang_id_heuristic": f"""
            SELECT doc_id,
                   CASE WHEN (CASE WHEN nt > 0 THEN len(regexp_extract_all(lower(text), '{_STOP_RE}')) * 1.0 / nt ELSE 0.0 END) > 0.02
                        THEN 'en' ELSE 'other' END AS lang_guess
            FROM (SELECT doc_id, text, {_NT} AS nt FROM documents)
        """,
        "binary_payload_stats": """
            SELECT source, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
                   CAST(max(octet_length(encode(text))) AS INT) AS max_bytes
            FROM documents GROUP BY source
        """,
        "currency_inference": """
            SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'USD' ELSE 'GBP' END AS currency,
                   CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS in_stock,
                   count(*) AS n,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM orders GROUP BY 1, 2
        """,
        "embedding_neardup_pairs": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a JOIN embeddings b
              ON a.vec_id % 20 = b.vec_id % 20 AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])), 6) >= 0.2
        """,
        "ngram_jaccard_pairs": """
            WITH g AS (
              SELECT doc_id, source,
                     list_distinct(list_transform(
                       generate_series(1, greatest(length(t) - 2, 1)),
                       i -> substring(t, CAST(i AS INT), 3))) AS grams
              FROM (SELECT doc_id, source, lower(substring(text, 1, 200)) AS t FROM documents)
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(len(list_intersect(a.grams, b.grams)) * 1.0 /
                         len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
            FROM g a JOIN g b
              ON a.source = b.source AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 40
        """,
        "ann_cosine_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS cosine
            FROM embeddings WHERE vec_id > 0
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm
            FROM embeddings
        """,
    }
