"""Executable cap calibration (operators/caps.py — VERDICT r13
What's-wrong #2): a natural-content stats table yields a cap that
drops ~nothing, a planted degenerate table drops exactly the
degenerate values, and the coverage report is exact."""

import pytest
from pyspark.sql import functions as F

from dwh_spark.operators.caps import calibrate_cap, cap_report, df_quantile


def _stats(spark, rows):
    return spark.createDataFrame(rows, "val long, df long")


def _natural(spark):
    """A natural band: 1000 values, df 1 for most, a popular tail at
    2-3 (shared intros / common shingles)."""
    rows = [(v, 1) for v in range(960)]
    rows += [(v, 2) for v in range(960, 990)]
    rows += [(v, 3) for v in range(990, 1000)]
    return _stats(spark, rows)


def test_natural_band_drops_nothing(spark):
    stats = _natural(spark)
    cap = calibrate_cap(stats, quantile=0.99, margin=4)
    # q99 of (960x1, 30x2, 10x3) is 2 -> cap 8, above the whole band
    assert cap == 8
    rep = cap_report(stats, cap).collect()[0]
    assert rep["n_values"] == 1000
    assert rep["n_values_dropped"] == 0
    assert rep["n_postings"] == 960 + 60 + 30
    assert rep["n_postings_dropped"] == 0


def test_degenerate_values_drop_exactly(spark):
    """The silence/black-frame class: two planted hot values far above
    the natural band are the ONLY drops, and the report counts their
    postings exactly."""
    stats = _natural(spark).unionByName(
        _stats(spark, [(100000, 5000), (100001, 300)])
    )
    cap = calibrate_cap(stats, quantile=0.99, margin=4)
    # the two outliers nudge ceil-rank from 992/1000 to 992/1002 —
    # q99 moves 2 -> 3, cap 8 -> 12, still far below the degenerates
    assert cap == 12
    dropped = {
        (r["val"], r["df"])
        for r in stats.filter(F.col("df") > cap).collect()
    }
    assert dropped == {(100000, 5000), (100001, 300)}
    rep = cap_report(stats, cap).collect()[0]
    assert rep["cap"] == 12
    assert rep["n_values"] == 1002
    assert rep["n_values_dropped"] == 2
    assert rep["n_postings"] == 1050 + 5300
    assert rep["n_postings_dropped"] == 5300


def test_quantile_is_discrete_ceil_rank(spark):
    stats = _stats(spark, [(1, 1), (2, 1), (3, 1), (4, 10)])
    # n=4; q=0.75 -> k=3 -> third-smallest df = 1; q=0.76 -> k=4 -> 10
    assert df_quantile(stats, 0.75) == 1
    assert df_quantile(stats, 0.76) == 10
    assert df_quantile(stats, 1.0) == 10
    with pytest.raises(ValueError, match="quantile"):
        df_quantile(stats, 0.0)
    with pytest.raises(ValueError, match="empty"):
        df_quantile(stats.filter(F.lit(False)), 0.5)


def test_block_space_calibration(spark):
    """The 2^14 block-space shape from the round-13 video smoke: a
    natural band at df 40-250 and a black-frame value at corpus size —
    the quantile rule lands the cap between them (the recorded rule
    that df<=8 would be WRONG for this space)."""
    rows = [(v, 40 + (v * 7) % 211) for v in range(4000)]  # natural 40..250
    rows += [(0, 60000)]  # (i=0, val=0): black frames
    stats = _stats(spark, rows)
    cap = calibrate_cap(stats, quantile=0.99, margin=4)
    assert 250 <= cap <= 1200  # above ALL natural values...
    rep = cap_report(stats, cap).collect()[0]
    assert rep["n_values_dropped"] == 1  # ...dropping only the black value
    assert rep["n_postings_dropped"] == 60000
