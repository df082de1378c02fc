import pytest

from scrapy_products_tracker_spark.politeness.adaptive import (
    adaptive_budget_step,
    round_outcome_counts,
)


def _budgets(spark, rows):
    return spark.createDataFrame(rows, "domain string, max_per_round int")


def test_aimd_branches(spark):
    outcomes = spark.createDataFrame(
        # a.com: 3/4 fail -> halve; b.com: clean -> +2;
        # c.com: exactly 1/5 = 20% -> strict > means CLEAN -> +2
        [("a.com", "timeout")] * 3
        + [("a.com", "ok")]
        + [("b.com", "ok")] * 5
        + [("c.com", "403")]
        + [("c.com", "ok")] * 4,
        "domain string, fetch_status string",
    )
    budgets = _budgets(spark, [("a.com", 16), ("b.com", 8), ("c.com", 8), ("idle.com", 7)])
    oc = round_outcome_counts(outcomes)
    out = {r["domain"]: r["max_per_round"] for r in adaptive_budget_step(budgets, oc).collect()}
    assert out == {"a.com": 8, "b.com": 10, "c.com": 10, "idle.com": 7}


def test_floor_and_cap(spark):
    outcomes = spark.createDataFrame(
        [("f.com", "timeout"), ("f.com", "timeout"), ("cap.com", "ok")],
        "domain string, fetch_status string",
    )
    budgets = _budgets(spark, [("f.com", 1), ("cap.com", 10)])
    out = {
        r["domain"]: r["max_per_round"]
        for r in adaptive_budget_step(
            budgets, round_outcome_counts(outcomes), max_budget=11
        ).collect()
    }
    assert out == {"f.com": 1, "cap.com": 11}


def test_extra_budget_columns_preserved(spark):
    outcomes = spark.createDataFrame([("a.com", "ok")], "domain string, fetch_status string")
    budgets = spark.createDataFrame(
        [("a.com", 8, ["/private"])],
        "domain string, max_per_round int, disallow_prefixes array<string>",
    )
    row = adaptive_budget_step(budgets, round_outcome_counts(outcomes)).collect()[0]
    assert row["disallow_prefixes"] == ["/private"] and row["max_per_round"] == 10


def test_guards(spark):
    b = _budgets(spark, [("a.com", 8)])
    oc = round_outcome_counts(
        spark.createDataFrame([("a.com", "ok")], "domain string, fetch_status string")
    )
    with pytest.raises(ValueError):
        adaptive_budget_step(b, oc, min_budget=0)
    with pytest.raises(ValueError):
        adaptive_budget_step(b, oc, min_budget=5, max_budget=4)
