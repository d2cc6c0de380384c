"""Weighted water-filling token-budget allocation
(operators/sampling.py:waterfill_allocation): hand-computed level on
a 4-source fixture, conservation (allocations sum to the budget when
unsaturated sources exist), the all-saturated degenerate case, and
weight-proportionality among unsaturated sources."""

import math

from pyspark.sql import functions as F

from dwh_spark.operators.sampling import waterfill_allocation


def _totals(spark, rows):
    return spark.createDataFrame(
        rows, "source string, available_tokens long, w long"
    )


def test_hand_computed_level(spark):
    """a=(100, 1000, 1000), w=(1, 1, 2), fraction 0.5 -> B=1050.
    Ratios ascending: s1(100), s2(500)=s3(500) (tie -> source order).
    t_0 = 1050/4 = 262.5 < 100? no crossing at s1 (100 <= 262.5, it
    saturates); t_1 = 950/3 = 316.67; s2 ratio 500 > t_1 -> level
    316.67; allocations: s1=100, s2=316.67, s3=633.33."""
    out = {
        r["source"]: r
        for r in waterfill_allocation(
            _totals(
                spark,
                [("s1", 100, 1), ("s2", 1000, 1), ("s3", 1000, 2)],
            ),
            budget_fraction=0.5,
        ).collect()
    }
    level = 950.0 / 3
    assert out["s1"]["saturated"] == 1
    assert out["s1"]["allocated_tokens"] == 100.0
    assert out["s2"]["saturated"] == 0
    assert out["s2"]["allocated_tokens"] == round(level, 6)
    assert out["s3"]["allocated_tokens"] == round(2 * level, 6)
    # conservation: allocations sum to B (within rounding)
    assert math.isclose(
        sum(r["allocated_tokens"] for r in out.values()), 1050.0, abs_tol=1e-5
    )
    # weight-proportionality among the unsaturated (6-dp rounding on
    # each allocation bounds the ratio error)
    assert math.isclose(
        out["s3"]["allocated_tokens"] / out["s2"]["allocated_tokens"],
        2.0,
        rel_tol=1e-6,
    )


def test_budget_covers_everything(spark):
    """B >= total available: no crossing, everyone taken whole."""
    out = waterfill_allocation(
        _totals(spark, [("a", 10, 1), ("b", 20, 3)]), budget_fraction=1.0
    ).collect()
    assert all(r["saturated"] == 1 for r in out)
    assert {r["source"]: r["allocated_tokens"] for r in out} == {
        "a": 10.0,
        "b": 20.0,
    }
    assert all(r["sampling_rate"] == 1.0 for r in out)


def test_single_source(spark):
    out = waterfill_allocation(
        _totals(spark, [("only", 1000, 5)]), budget_fraction=0.25
    ).collect()
    assert len(out) == 1
    assert out[0]["allocated_tokens"] == 250.0
    assert out[0]["sampling_rate"] == 0.25
    assert out[0]["saturated"] == 0


def test_uniform_case_splits_evenly(spark):
    """Equal weights, ample data everywhere: everyone gets B/n."""
    rows = [(f"u{i}", 1000, 1) for i in range(4)]
    out = waterfill_allocation(_totals(spark, rows), budget_fraction=0.5)
    vals = {r["allocated_tokens"] for r in out.collect()}
    assert vals == {500.0}
