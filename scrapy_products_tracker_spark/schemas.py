"""Fixed StructType schemas for every table in the engine.

The reference manages its schema with Alembic migrations over MySQL
(frontier tables: database/models/category_targets.py:8-14,
product_targets.py:8-22; history: product_history.py:8-24). Here every
table is a fixed Spark schema; the frontier is snapshot-committed
(Iceberg when available, Parquet+manifest fallback).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- crawl status codes --------------------------------------------------
# Mirrors the reference's DB-side mixin (mixins/mysql_status.py:7-10) and
# task status taxonomy (rmq/utils/task_status_codes.py:4-11).
PENDING = 0
IN_PROGRESS = 1
SUCCESS = 2
ERROR = 4
SKIPPED_ROBOTS = 5
PARTIAL_SUCCESS = 21
HARDWARE_ERROR = 41

MAX_ATTEMPTS = 5  # reference RETRY_TIMES (middlewares/retry_middleware.py:32)

# --- seed list (reference: CSV seeds, utils/read_csv.py:40-51) ------------
SEED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("tier", T.IntegerType(), False),  # 0=listing 1=detail (R2)
        T.StructField("seed_rank", T.LongType(), False),
    ]
)

# --- synthetic web graph (replaces the network; fetch UDF looks up here) --
PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("tier", T.IntegerType(), False),
        T.StructField("status_code", T.IntegerType(), False),  # 200/403/404/500/-1
        T.StructField("flaky_until", T.IntegerType(), False),  # succeeds once attempt >= this
        T.StructField("next_url", T.StringType(), True),  # sequential pagination (F2)
        T.StructField("total_items", T.IntegerType(), True),  # computed fan-out (F1)
        T.StructField("outlinks", T.ArrayType(T.StringType()), False),
        T.StructField("image_id", T.StringType(), True),  # tier-1 payload join key
        T.StructField("latency_ms", T.IntegerType(), False),
        T.StructField("category", T.StringType(), True),  # breadcrumb/category path
        T.StructField("body", T.StringType(), True),  # tier-1 raw HTML (E3 family)
    ]
)

# --- chained sub-endpoint responses (F3, costco 3-request assembly) ---------
ENDPOINTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("endpoint", T.StringType(), False),  # 'inventory' | 'price'
        T.StructField("payload", T.StringType(), False),  # JSON body
    ]
)

# --- payload table: exact BASELINE.json input_hint schema ------------------
IMAGE_CAPTION_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

# --- robots / politeness config (north-rule addition; reference only has
# per-domain queues + CONCURRENT_REQUESTS_PER_DOMAIN=8, settings.py:40-41) --
ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        # RFC 9309 §2.2.3 '*'/'$' rules, pre-translated to anchored Java
        # regexes at parse time; optional in stored tables (older worlds)
        T.StructField("disallow_regexes", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay_ms", T.LongType(), False),
        T.StructField("max_per_round", T.IntegerType(), False),
        # per-domain extraction parser key (crawl/extract.py SITE_PARSERS)
        # — the Spark form of the reference's per-site spider classes;
        # optional in stored tables (older worlds -> 'default')
        T.StructField("site", T.StringType(), True),
        # RFC 9309 §2.3 Sitemap: directives (global, group-independent) —
        # discovery seeds for crawl/sitemap.py; optional in stored tables
        T.StructField("sitemap_urls", T.ArrayType(T.StringType()), True),
        # full RFC 9309 rule list in document order (Allow + Disallow,
        # longest-match precedence — §2.2.2): pat = original rule value,
        # rx = anchored Java regex for '*'/'$' rules (NULL = literal
        # prefix), spec = rule length in octets (the longest-match key;
        # allow wins spec ties), allow = Allow vs Disallow. Optional in
        # stored tables: rows/tables without it fall back to the
        # conservative disallow-only columns above.
        T.StructField(
            "rules",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("pat", T.StringType(), False),
                        T.StructField("rx", T.StringType(), True),
                        T.StructField("spec", T.IntegerType(), False),
                        T.StructField("allow", T.BooleanType(), False),
                    ]
                )
            ),
            True,
        ),
    ]
)

# --- frontier table (reference: category_targets/product_targets rows with
# UNIQUE(url) + status state machine; here one unified table with tier) -----
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),  # canonical form
        T.StructField("url_hash", T.LongType(), False),  # xxhash64(canonical)
        T.StructField("domain", T.StringType(), False),
        T.StructField("tier", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("discovered_seq", T.LongType(), False),  # discovery order (O1)
        T.StructField("discovered_round", T.IntegerType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("session", T.IntegerType(), False),  # crawl epoch (O5)
        T.StructField("source", T.StringType(), False),  # 'seed' | 'outlink'
    ]
)

# --- fetched item rows (reference ProductItem, items/product_item.py:6-23,
# re-expressed as image+caption rows per input_hint) -------------------------
RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("position", T.IntegerType(), False),  # F5 lineage
    ]
)

# --- product tables (reference product_targets/product_history,
# product_result_consumer.py:40-94; prices are exact integer cents,
# exporters render DECIMAL(20,2)) --------------------------------------------
PRODUCT_TARGETS_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),  # = product_id
        T.StructField("url", T.StringType(), False),  # UNIQUE key
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("brand", T.StringType(), True),
        T.StructField("image_url", T.StringType(), True),
        T.StructField("image_file", T.StringType(), True),
        T.StructField("additional_info", T.StringType(), True),  # JSON map
        T.StructField("category", T.StringType(), True),
        T.StructField("session", T.IntegerType(), False),
        T.StructField("updated_round", T.IntegerType(), False),
        T.StructField("is_tracked", T.BooleanType(), False),  # O6
        T.StructField("sent_to_customer", T.StringType(), True),  # K9
        T.StructField("first_round", T.IntegerType(), False),
    ]
)

PRODUCT_HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("regular_price_cents", T.LongType(), True),
        T.StructField("current_price_cents", T.LongType(), True),
        T.StructField("is_in_stock", T.BooleanType(), True),
        T.StructField("stock", T.IntegerType(), True),
        T.StructField("position", T.IntegerType(), True),
        T.StructField("session", T.IntegerType(), False),
        T.StructField("currency", T.StringType(), True),
        T.StructField("units", T.StringType(), True),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

# --- crawl-order log (golden-parity artifact, FIXTURES.md §5) ---------------
CRAWL_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("within_round_rank", T.IntegerType(), False),
    ]
)
