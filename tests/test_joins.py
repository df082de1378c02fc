"""asof_join / range_join (functions/joins.py): brute-force parity,
edge semantics (ties, tolerance, direction, half-open bounds), and
plan shape (no BNLJ/cartesian anywhere; the as-of sweep has no join
node at all)."""

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions import asof_join, range_join


def _brute_asof(probes, quotes, tolerance=None, direction="backward"):
    """dict probe_id -> (matched_ts, value) via O(n^2) scan."""
    out = {}
    for pid, key, pts in probes:
        best = None
        for qkey, qts, qv in quotes:
            if qkey != key:
                continue
            ok = qts <= pts if direction == "backward" else qts >= pts
            if not ok:
                continue
            gap = pts - qts if direction == "backward" else qts - pts
            if tolerance is not None and gap > tolerance:
                continue
            if best is None or (qts > best[0] if direction == "backward" else qts < best[0]):
                best = (qts, qv)
        out[pid] = best
    return out


PROBES = [
    (1, "a", 100), (2, "a", 5), (3, "a", 50),   # before-any, mid
    (4, "b", 10), (5, "b", 10),                   # equal-ts quote match
    (6, "c", 999),                                # key with no quotes
]
QUOTES = [
    ("a", 10, 111), ("a", 50, 222), ("a", 90, 333),
    ("b", 10, 444), ("b", 200, 555),
]


@pytest.fixture()
def sides(spark):
    p = spark.createDataFrame(PROBES, "probe_id int, k string, ts long")
    q = spark.createDataFrame(QUOTES, "k string, qts long, v long")
    return p, q


def test_asof_backward_matches_bruteforce(spark, sides):
    p, q = sides
    got = {
        r["probe_id"]: (r["matched_ts"], r["v"])
        for r in asof_join(p, q, on="k", left_ts="ts", right_ts="qts", value_cols=["v"]).collect()
    }
    want = _brute_asof(PROBES, QUOTES)
    for pid, best in want.items():
        assert got[pid] == (best if best else (None, None))
    assert len(got) == len(PROBES)  # left-join: every probe survives


def test_asof_forward_and_tolerance(spark, sides):
    p, q = sides
    fwd = {
        r["probe_id"]: (r["matched_ts"], r["v"])
        for r in asof_join(
            p, q, on="k", left_ts="ts", right_ts="qts",
            value_cols=["v"], direction="forward",
        ).collect()
    }
    want = _brute_asof(PROBES, QUOTES, direction="forward")
    for pid, best in want.items():
        assert fwd[pid] == (best if best else (None, None))

    tol = {
        r["probe_id"]: (r["matched_ts"], r["v"])
        for r in asof_join(
            p, q, on="k", left_ts="ts", right_ts="qts",
            value_cols=["v"], tolerance=15,
        ).collect()
    }
    want_t = _brute_asof(PROBES, QUOTES, tolerance=15)
    for pid, best in want_t.items():
        assert tol[pid] == (best if best else (None, None))
    # probe 1 (ts=100): latest quote is 90 within 15 -> kept;
    # probe 3 (ts=50): equal-ts quote, gap 0 -> kept;
    # probe 2 (ts=5): nothing before -> null
    assert tol[1] == (90, 333) and tol[3] == (50, 222) and tol[2] == (None, None)


def test_asof_plan_has_no_join_and_one_exchange(spark, sides):
    p, q = sides
    plan = asof_join(
        p, q, on="k", left_ts="ts", right_ts="qts", value_cols=["v"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan  # union-tag sweep: no join node at all
    # exactly one data Exchange: the key hash-partitioning for the sweep
    n_exch = plan.count("Exchange hashpartitioning")
    assert n_exch == 1, plan


def test_asof_value_collision_raises(spark, sides):
    p, q = sides
    with pytest.raises(ValueError):
        asof_join(p.withColumn("v", F.lit(1)), q, on="k",
                  left_ts="ts", right_ts="qts", value_cols=["v"])
    with pytest.raises(ValueError):
        asof_join(p, q, on="k", left_ts="ts", right_ts="qts",
                  value_cols=["v"], direction="sideways")


POINTS = [
    (1, "a", 0), (2, "a", 10), (3, "a", 99), (4, "a", 100),
    (5, "a", 250), (6, "b", 10), (7, "a", -5),
]
IVS = [
    (100, "a", 0, 100),     # [0,100): points 1,2,3 in; 4 (ts=100) OUT
    (101, "a", 90, 260),    # spans 3 buckets at width 100
    (102, "b", 0, 50),      # other key
    (103, "a", -50, 5),     # negative start: floor-div bucketing
]


def _brute_range(points, ivs):
    return sorted(
        (pid, wid)
        for pid, pk, ts in points
        for wid, wk, s, e in ivs
        if pk == wk and s <= ts < e
    )


@pytest.fixture()
def interval_sides(spark):
    p = spark.createDataFrame(POINTS, "point_id int, k string, ts long")
    iv = spark.createDataFrame(IVS, "win_id int, k string, s long, e long")
    return p, iv


@pytest.mark.parametrize("width", [100, 7, 1000])
def test_range_join_matches_bruteforce_any_width(spark, interval_sides, width):
    p, iv = interval_sides
    got = sorted(
        (r["point_id"], r["win_id"])
        for r in range_join(
            p, iv, on="k", point_ts="ts", start_col="s", end_col="e",
            bucket_width=width,
        ).collect()
    )
    assert got == _brute_range(POINTS, IVS)
    assert len(got) == len(set(got))  # exactly-once: no dup pairs


def test_range_join_plan_is_equijoin(spark, interval_sides):
    p, iv = interval_sides
    plan = range_join(
        p, iv, on="k", point_ts="ts", start_col="s", end_col="e", bucket_width=100
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_guards(spark, interval_sides):
    p, iv = interval_sides
    with pytest.raises(ValueError):
        range_join(p, iv, on="k", point_ts="ts", start_col="s", end_col="e",
                   bucket_width=0)
    with pytest.raises(ValueError):
        range_join(p.withColumn("s", F.lit(1)), iv, on="k", point_ts="ts",
                   start_col="s", end_col="e", bucket_width=10)
