"""Physical-plan regression tests: the optimizations that matter at
100 TB must stay visible in the plan, not just be fast today.

- filters and column pruning reach the parquet scan (PushedFilters /
  ReadSchema),
- ORDER BY + LIMIT compiles to TakeOrderedAndProject (top-k, no full
  sort of the frontier),
- the robots check is a broadcast join (never a shuffle of the
  candidate set against a 30-row table),
- the claimed batch never carries the image payload column into the
  politeness scheduler (binary-heavy shuffle ban, SURVEY.md §4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


SF = "/root/testdata/sf0.001"


def test_claim_topk_plan_shape(spark):
    """The engine claim (schedule_round): the global chunk claim
    compiles to TakeOrderedAndProject (top-k, never a full frontier
    sort) and the scan reads only the columns the frontier projection
    needs. The default plan at sandbox scale skips the salted phase 1
    (auto pending_hint); force_salted pins the at-scale salted plan:
    phase-1 kernel is a FlatMapGroupsInPandas."""
    from scrapy_products_tracker_spark.politeness import schedule_round

    plan = _formatted_plan(entry.q_frontier_claim_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan  # top-k, not Sort+Limit
    assert "FlatMapGroupsInPandas" not in plan  # fast path: no Python stage
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema  # big doc bodies never scanned

    cand = entry._frontier_from_docs(entry._t(spark, SF, "documents"))
    robots = (
        cand.select("domain").distinct()
        .withColumn("disallow_prefixes", F.array().cast("array<string>"))
        .withColumn("crawl_delay_ms", F.lit(0).cast("long"))
        .withColumn("max_per_round", F.lit(8))
    )
    salted_plan = _formatted_plan(
        schedule_round(cand, robots, chunk_size=100, n_salts=4, force_salted=True)
    )
    assert "FlatMapGroupsInPandas" in salted_plan  # salted per-domain kernel
    assert "TakeOrderedAndProject" in salted_plan


def test_category_export_pushdown(spark):
    plan = _formatted_plan(entry.q_category_export(spark, SF))
    assert "GreaterThanOrEqual(p_size,25)" in plan
    assert "TakeOrderedAndProject" in plan


def test_frontier_claim_scan_pushes_status_filter(spark, t1_paths, tmpdir_path):
    """The per-round PENDING scan over the bucketized frontier must push
    the status predicate into the parquet scan and prune to the narrow
    scheduling columns — at 10^10 rows this is the difference between
    scanning the claimable slice and scanning the world."""
    from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
    from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
    from scrapy_products_tracker_spark.politeness import load_robots
    from scrapy_products_tracker_spark.schemas import PENDING

    store = SnapshotParquetStore(tmpdir_path + "/store")
    drv = CrawlDriver(
        spark,
        store,
        spark.read.parquet(t1_paths["pages"]),
        spark.read.parquet(t1_paths["image_caption"]),
        load_robots(spark, t1_paths["robots"]),
        CrawlConfig(chunk_size=50),
    )
    drv.seed(spark.read.parquet(t1_paths["seeds"]))
    narrow = (
        store.read_frontier(spark)
        .filter(F.col("status") == PENDING)
        .select("url", "url_hash", "domain", "tier", "priority", "depth", "discovered_seq", "attempt")
    )
    plan = _formatted_plan(narrow)
    assert f"EqualTo(status,{PENDING})" in plan  # predicate reaches the scan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "source" not in read_schema and "session" not in read_schema  # pruned


def test_robots_check_is_broadcast_join(spark, t1_paths):
    from scrapy_products_tracker_spark.politeness import load_robots, mark_robots

    robots = load_robots(spark, t1_paths["robots"])
    cands = spark.range(100).select(
        F.concat(F.lit("https://d0.example.com/p/"), F.col("id")).alias("url"),
        F.lit("d0.example.com").alias("domain"),
    )
    plan = _formatted_plan(mark_robots(cands, robots))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_ann_plan_shape(spark):
    """IVF: cell assignment is a row-local literal-centroid fold (no
    join, no window), so the probe query's only join is the broadcast
    of the tiny probed-cell set and the final top-k stays
    TakeOrderedAndProject."""
    plan = _formatted_plan(entry.q_ivf_ann_topk(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # assignment needs no join at all
    assert "TakeOrderedAndProject" in plan


def test_ivf_assignment_subtree_has_no_exchange(spark):
    """VERDICT r02 #2: ivf_assign must be shuffle-free — the argmax
    over <=n_cells literal centroids is row-local, so the assignment
    plan contains no Exchange beyond the parquet scan."""
    import re

    from scrapy_products_tracker_spark.functions.similarity import (
        ivf_assign,
        ivf_centroids_first,
    )

    e = entry._t(spark, SF, "embeddings")
    cents = ivf_centroids_first(e, 8)
    plan = _formatted_plan(ivf_assign(e, cents))
    assert not re.findall(r"^\(\d+\) Exchange", plan, re.M), plan
    assert "Window" not in plan and "Join" not in plan


def test_winnow_single_doc_shuffle(spark):
    """Winnowing: window-min + distinct must reuse ONE doc-keyed
    exchange (the distinct's (doc, fp) clustering is satisfied by the
    window's hashpartitioning(doc)) — at 100 TB a second full shuffle
    of the gram stream would dominate the operator."""
    from scrapy_products_tracker_spark.functions.text import winnow_fingerprints

    import re

    d = entry._t(spark, SF, "documents")
    plan = _formatted_plan(winnow_fingerprints(d, "doc_id", "text", prefix=400))
    # count operator detail headers "(n) Exchange" (tree lines would
    # double-count), excluding ReusedExchange
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, plan


def test_embedding_lsh_pairs_equi_join_only(spark):
    """Banded hyperplane LSH near-dup: candidates come from an
    equi-join on (band, bucket); no cartesian/broadcast-nested-loop
    pair enumeration anywhere in the plan."""
    plan = _formatted_plan(entry.q_embedding_lsh_neardup(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scheduler_input_never_carries_payload_bytes(spark, t1_paths):
    """The frontier rows fed to the politeness scheduler are narrow —
    the binary image payload must never enter that shuffle."""
    import tempfile

    from scrapy_products_tracker_spark.crawl import CrawlConfig, CrawlDriver
    from scrapy_products_tracker_spark.frontier import SnapshotParquetStore
    from scrapy_products_tracker_spark.politeness import load_robots, schedule_round

    tmp = tempfile.mkdtemp(prefix="planq_")
    store = SnapshotParquetStore(tmp + "/store")
    drv = CrawlDriver(
        spark,
        store,
        spark.read.parquet(t1_paths["pages"]),
        spark.read.parquet(t1_paths["image_caption"]),
        load_robots(spark, t1_paths["robots"]),
        CrawlConfig(chunk_size=50),
    )
    drv.seed(spark.read.parquet(t1_paths["seeds"]))
    frontier = store.read_frontier(spark)
    assert "bytes" not in frontier.columns  # payload lives in results only
    narrow = frontier.select(
        "url", "url_hash", "domain", "tier", "priority", "depth", "discovered_seq", "attempt"
    )
    claimed = schedule_round(narrow, drv.robots, 50, max_budget=drv._max_budget, force_salted=True)
    plan = _formatted_plan(claimed)
    assert "bytes" not in plan


def test_temperature_sample_quota_join_is_broadcast(spark):
    """The per-group quota table (one row per group) must join back to
    the data as a broadcast — a shuffle of the corpus against an
    O(groups) table would be the classic scale mistake."""
    from scrapy_products_tracker_spark.functions import temperature_sample

    d = entry._t(spark, SF, "documents")
    plan = _formatted_plan(temperature_sample(d, "source", "doc_id", 100))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_paired_alignment_is_equi_join(spark):
    """Pair re-assembly is an equi-join on pair_id (SMJ/shuffled-hash
    both fine) — never a cartesian/BNLJ of the two modality slices."""
    from scrapy_products_tracker_spark.functions.similarity import paired_alignment

    e = entry._t(spark, SF, "embeddings")
    plan = _formatted_plan(paired_alignment(e))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_wds_write_single_python_group_stage(spark, t1_paths):
    """The tar builder is ONE applyInPandas stage over the shard
    groups; the assignment join must not add a second Python stage
    (payload bytes cross the Python boundary exactly once)."""
    from scrapy_products_tracker_spark.imaging import write_wds_shards

    ic = spark.read.parquet(t1_paths["image_caption"]).withColumn(
        "rng", F.substring("image_id", 1, 5)
    )
    df = write_wds_shards(ic, 16384, range_col="rng")
    # executedPlan (not formatted explain, which repeats nodes in the
    # details section) so the count is the real stage count
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "ArrowEvalPython" not in plan


def test_cross_set_lsh_candidates_equi_join_only(spark):
    """Incremental text dedup's cross-set candidate generator joins on
    (band, bh) — never a cartesian/BNLJ pair enumeration."""
    from scrapy_products_tracker_spark.functions.similarity import (
        lsh_cross_candidates,
        minhash_signature,
    )

    d = entry._t(spark, SF, "documents")
    sa = minhash_signature(d.filter("doc_id < 50"), "doc_id", "text")
    sb = minhash_signature(d.filter("doc_id >= 450"), "doc_id", "text")
    plan = _formatted_plan(lsh_cross_candidates(sa, sb))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_image_cross_dedup_equi_join_only(spark):
    """Incremental image dedup: both the exact anti-join and the
    cross-set banded phash join are equi-joins; payload bytes never
    shuffle (md5/band keys computed at the scan)."""
    from scrapy_products_tracker_spark.imaging.neardup import (
        image_dedup_against_corpus,
    )

    corpus = spark.createDataFrame(
        [("c1", b"aa", 0)], "image_id string, bytes binary, phash long"
    )
    new = spark.createDataFrame(
        [("n1", b"bb", 1)], "image_id string, bytes binary, phash long"
    )
    plan = _formatted_plan(
        image_dedup_against_corpus(new, corpus, dedup_within=False)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_focused_boost_no_cartesian(spark):
    """Focused priority boost: one target-keyed aggregate + one url
    equi-join back onto the frontier."""
    from scrapy_products_tracker_spark.functions.graph import focused_priority_boost

    pages = spark.createDataFrame(
        [("https://a.com/p", '<a href="https://t.com/x">cat</a>')],
        "url string, body string",
    )
    frontier = spark.createDataFrame(
        [("https://t.com/x", 1)], "url string, priority int"
    )
    plan = _formatted_plan(focused_priority_boost(frontier, pages, ["cat"]))
    assert "CartesianProduct" not in plan


def test_ivf_trained_plan_shape(spark):
    """Trained quantizer plugged into the probe path must not change
    the plan shape: assignment stays the row-local literal fold (no
    join for it), probe set broadcast, top-k TakeOrderedAndProject."""
    plan = _formatted_plan(entry.q_ivf_trained_topk(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
