"""HLL distinct sketch + Count-Min heavy hitters (functions/sketches.py).

Correctness = bit-identity vs an inline pure-Python twin (the oracle
builder replicates the same math independently over sf0.01); scale =
plan shape pins (register agg is ONE exchange bounded by groups*m
rows; the CMS probe join broadcasts the cell grid, no cartesian)."""

import collections
import re

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions.hashing import xxhash64_long, xxhash64_str
from scrapy_products_tracker_spark.functions.sketches import (
    CMS_D,
    CMS_W,
    HLL_ALPHA_MICRO,
    HLL_P,
    cms_cells,
    cms_topk_estimates,
    hll_distinct,
)


def _py_hll(values_by_group, p=HLL_P):
    m, w = 1 << p, 64 - p
    out = {}
    for g, vals in values_by_group.items():
        M = [0] * m
        for hu in vals:
            hu &= (1 << 64) - 1
            b, suf = hu >> w, hu & ((1 << w) - 1)
            M[b] = max(M[b], w + 1 - suf.bit_length())
        S = sum((1 << 50) >> Mi for Mi in M)
        q = min((m * m << 30) // max(S >> 20, 1), 1 << 42)
        est = (q * HLL_ALPHA_MICRO) // 1000
        out[g] = (sum(1 for x in M if x), m - sum(1 for x in M if x), S, est)
    return out


def test_hll_matches_python_twin_and_is_accurate(spark):
    n = 8000
    df = spark.range(n).select(
        (F.col("id") % 4).cast("string").alias("g"),
        # planted duplicates: value domain is id//2 -> 4000 distinct ids
        (F.col("id") / 2).cast("long").alias("v"),
    )
    rows = hll_distinct(df, ["g"], F.col("v")).orderBy("g").collect()

    groups = collections.defaultdict(list)
    exact = collections.defaultdict(set)
    for i in range(n):
        g, v = str(i % 4), i // 2
        groups[g].append(xxhash64_long(v))
        exact[g].add(v)
    want = _py_hll(groups)
    assert len(rows) == 4
    for r in rows:
        nz, z, S, est = want[r["g"]]
        assert (r["n_nonzero_registers"], r["n_zero_registers"], r["sum_units"]) == (nz, z, S)
        assert r["est_milli"] == est
        assert r["exact_distinct"] == len(exact[r["g"]])
        # raw HLL with m=1024 at n~2000/group: sane accuracy envelope
        assert abs(r["est_milli"] - 1000 * r["exact_distinct"]) < 350 * r["exact_distinct"]


def test_hll_register_agg_is_one_bounded_exchange(spark):
    df = spark.range(20000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v")
    )
    sketch = hll_distinct(df, ["g"], F.col("v"), with_exact=False)
    plan = sketch._jdf.queryExecution().executedPlan().toString()
    # sketch-only path: exactly the register exchange + the per-group
    # rollup exchange, no join, no Python
    assert plan.count("Exchange") <= 2
    assert "CartesianProduct" not in plan and "Python" not in plan
    # post-shuffle state is bounded: <= groups * m register rows
    regs = sketch.agg(F.sum("n_nonzero_registers")).collect()[0][0]
    assert regs <= 3 * (1 << HLL_P)


def test_hll_null_and_empty_groups(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", None)], "g string, v long"
    )
    rows = {r["g"]: r for r in hll_distinct(df, ["g"], F.col("v")).collect()}
    # nulls hash to null -> dropped from registers; group b has no
    # non-null values but still reports (all-zero registers)
    assert rows["a"]["n_nonzero_registers"] == 1
    assert rows["a"]["exact_distinct"] == 1
    if "b" in rows:  # group with only nulls: zero registers
        assert rows["b"]["n_nonzero_registers"] == 0


def _py_tokens(pdf_texts):
    cnt = collections.Counter()
    for t in pdf_texts:
        if t is None or str(t).strip() == "":
            continue
        for tok in re.split(r"\s+", str(t).strip()):
            if tok:
                cnt[tok] += 1
    return cnt


def test_cms_matches_python_twin(spark):
    texts = [
        ("a b c a a b", ),
        ("c c c d e f g", ),
        ("a c x y z z", ),
        (None, ),
        ("  ", ),
    ] * 7
    docs = spark.createDataFrame(texts, "text string")
    got = cms_topk_estimates(docs, k=10).collect()

    cnt = _py_tokens([t[0] for t in texts])
    cells = collections.Counter()
    for tok, c in cnt.items():
        for r in range(CMS_D):
            cells[(r, xxhash64_str(f"cms{r}:{tok}") % CMS_W)] += c
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["token"], r["exact_cnt"]) for r in got] == top
    for r in got:
        est = min(
            cells[(rr, xxhash64_str(f"cms{rr}:{r['token']}") % CMS_W)]
            for rr in range(CMS_D)
        )
        assert r["cms_est"] == est
        assert r["overcount"] == est - r["exact_cnt"]
        assert r["cms_est"] >= r["exact_cnt"]  # one-sided error


def test_cms_grid_is_bounded_and_broadcast(spark):
    docs = spark.createDataFrame(
        [(f"tok{i} tok{i % 7} common",) for i in range(500)], "text string"
    )
    hist = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    ).groupBy("token").agg(F.count("*").alias("cnt"))
    grid = cms_cells(hist)
    assert grid.count() <= CMS_D * CMS_W
    out = cms_topk_estimates(docs, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # probe joins broadcast the grid
    rows = out.collect()
    assert rows[0]["token"] == "common" and rows[0]["exact_cnt"] == 500


# --- HLL sketch-merge overlap (sketches.hll_overlap) ----------------------


def test_hll_overlap_identical_corpora(spark):
    from scrapy_products_tracker_spark.functions.sketches import hll_overlap

    df = spark.createDataFrame([(f"u{i}",) for i in range(300)], "v string")
    r = hll_overlap(df, df, "v").collect()[0]
    # merging a sketch with itself is algebraically the same sketch:
    # union == a == b exactly, so jaccard is exactly 1000
    assert r.est_union_milli == r.est_a_milli == r.est_b_milli
    assert r.est_inter_milli == r.est_a_milli
    assert r.jaccard_milli == 1000


def test_hll_overlap_subset_and_partition_invariance(spark):
    from scrapy_products_tracker_spark.functions.sketches import hll_overlap

    a = spark.createDataFrame([(f"u{i}",) for i in range(400)], "v string")
    b = a.filter("cast(substring(v, 2) as int) < 100")  # b ⊂ a
    r = hll_overlap(a, b, "v").collect()[0]
    # union sketch of a superset IS a's sketch -> est_union == est_a,
    # intersection estimate == est_b exactly (inclusion-exclusion)
    assert r.est_union_milli == r.est_a_milli
    assert r.est_inter_milli == r.est_b_milli
    r2 = hll_overlap(a.repartition(7), b.coalesce(1), "v").collect()[0]
    assert r.asDict() == r2.asDict()


def test_hll_overlap_disjoint_is_low(spark):
    from scrapy_products_tracker_spark.functions.sketches import hll_overlap

    # past the small-range regime (n >= 2.5m) where the raw-HLL
    # estimate is unbiased enough for inclusion-exclusion to be small
    a = spark.createDataFrame([(f"a{i}",) for i in range(5000)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(5000)], "v string")
    r = hll_overlap(a, b, "v").collect()[0]
    assert r.est_union_milli >= max(r.est_a_milli, r.est_b_milli)
    assert r.jaccard_milli < 150  # raw-HLL noise, not real overlap
