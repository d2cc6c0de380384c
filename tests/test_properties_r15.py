"""Property-based tests for the round-15 operators (hypothesis):
water-filling allocation invariants on random source frames, the
guarded cap calibration against an independent pure-python reference,
forget_with_df == rebuild on random indexes, and cell_inertia against
numpy. Same discipline as tests/test_properties.py: one frame per
example, small max_examples."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dwh_spark.operators.caps import CapCalibrationError, calibrate_cap
from dwh_spark.operators.forget import forget_with_df
from dwh_spark.operators.sampling import waterfill_allocation

_SOURCES = st.lists(
    st.tuples(st.integers(1, 1_000_000), st.integers(1, 9)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(_SOURCES, st.sampled_from([0.15, 0.4, 0.6, 0.85, 1.0, 1.3]))
def test_waterfill_invariants_random(spark, rows, frac):
    totals = spark.createDataFrame(
        [(f"s{i}", a, w) for i, (a, w) in enumerate(rows)],
        "source string, available_tokens long, w long",
    )
    out = waterfill_allocation(totals, budget_fraction=frac).collect()
    total = sum(a for a, _ in rows)
    budget = math.floor(frac * total)
    alloc = {r["source"]: r for r in out}
    assert len(alloc) == len(rows)
    for i, (a, w) in enumerate(rows):
        r = alloc[f"s{i}"]
        assert -1e-6 <= r["allocated_tokens"] <= a + 1e-6
        if r["saturated"]:
            assert r["allocated_tokens"] == float(a)
    # conservation: allocations sum to min(B, total) within rounding
    got = sum(r["allocated_tokens"] for r in out)
    assert math.isclose(got, min(budget, total), abs_tol=1e-3 * len(rows) + 1e-6)
    # unsaturated sources share one water level (allocated/weight)
    levels = [
        r["allocated_tokens"] / alloc[f"s{i}"]["w"]
        for i, r in ((int(r["source"][1:]), r) for r in out)
        if not r["saturated"]
    ]
    if len(levels) > 1:
        assert max(levels) - min(levels) <= 1e-4 * max(levels) + 1e-6


def _ref_calibrate(hist, quantile, margin, gap_ratio):
    """Independent pure-python reference of the guarded recipe."""
    hist = sorted(hist.items())
    n = sum(c for _, c in hist)
    k = math.ceil(quantile * n)
    cum, v_q = 0, hist[-1][0]
    for v, c in hist:
        cum += c
        if cum >= k:
            v_q = v
            break
    best, top = 0.0, None
    for (lo, _), (hi, _) in zip(hist, hist[1:]):
        r = hi / max(lo, 1)
        if r > best:
            best, top = r, lo
    if best >= gap_ratio and top is not None and v_q > top:
        return None  # guard fires
    return v_q * margin


@settings(max_examples=8, deadline=None)
@given(
    st.integers(2, 12),                    # natural band top df
    st.integers(1, 40),                    # distinct natural values per df
    st.integers(0, 6),                     # degenerate distinct values
    st.sampled_from([0.5, 0.75, 0.9, 0.99]),
)
def test_calibrate_cap_matches_reference(spark, nat_top, per_df, n_degen, q):
    """The Spark calibrate_cap (raise/no-raise AND the cap value)
    matches an independently re-derived reference on random
    histograms: a contiguous natural band 1..nat_top (no >=8x internal
    gap) plus an optional degenerate band 16x above."""
    hist = {df: per_df for df in range(1, nat_top + 1)}
    if n_degen:
        for i in range(n_degen):
            hist[nat_top * 16 + i] = 1
    rows, vid = [], 0
    for df, cnt in hist.items():
        for _ in range(cnt):
            rows.append((vid, df))
            vid += 1
    stats = spark.createDataFrame(rows, "val long, df long")
    expect = _ref_calibrate(hist, q, 4, 8.0)
    if expect is None:
        with pytest.raises(CapCalibrationError):
            calibrate_cap(stats, quantile=q, margin=4)
        # the escape hatch still returns the raw recipe
        assert calibrate_cap(stats, quantile=q, margin=4, check=False) > 0
    else:
        assert calibrate_cap(stats, quantile=q, margin=4) == expect


@settings(max_examples=6, deadline=None)
@given(
    st.lists(  # (holder id, value) postings
        st.tuples(st.integers(0, 9), st.integers(0, 5)),
        min_size=1,
        max_size=30,
    ),
    st.sets(st.integers(0, 9), min_size=1, max_size=5),
)
def test_forget_with_df_equals_rebuild_random(spark, postings, fids):
    """On random (holder, value) indexes with exact stored df, forget
    == rebuild over kept holders, for ANY forget set — including sets
    covering every holder of a value (df>0 invariant) and sets with
    no index rows at all."""
    rows = [(h, i, v) for i, (h, v) in enumerate(postings)]
    plain = spark.createDataFrame(rows, "audio_id long, pos long, sub32 long")
    withdf = plain.join(
        plain.groupBy("sub32").agg(F.count("*").alias("df")), "sub32"
    ).select("audio_id", "pos", "sub32", "df").localCheckpoint()
    got = forget_with_df(withdf, sorted(fids), key="audio_id", value_col="sub32")
    kept = plain.filter(~F.col("audio_id").isin(*fids))
    rebuilt = kept.join(
        kept.groupBy("sub32").agg(F.count("*").alias("df")), "sub32"
    ).select("audio_id", "pos", "sub32", "df")
    cols = ["audio_id", "pos", "sub32", "df"]
    assert {tuple(r) for r in got.select(cols).collect()} == {
        tuple(r) for r in rebuilt.select(cols).collect()
    }
    assert got.filter(F.col("df") <= 0).count() == 0


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(-1, 1, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=3,
        max_size=10,
    )
)
def test_cell_inertia_matches_numpy(spark, vecs):
    """cell_inertia == the per-vector mean of 6-dp cosines to the
    assigned centroid, recomputed in numpy over the same assignment."""
    import numpy as np

    from dwh_spark.operators.similarity import assign_cells, cell_inertia

    # reject all-zero vectors (norm 0 -> undefined cosine)
    vecs = [v for v in vecs if any(abs(x) > 1e-3 for x in v)]
    if len(vecs) < 3:
        return
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    cents = df.limit(2)
    cells = assign_cells(df, cents)
    got = cell_inertia(cells, cents).collect()[0]
    crows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float32) for r in cents.collect()}
    coss = []
    for r in cells.collect():
        v = np.array(r["embedding"], dtype=np.float32)
        c = crows[r["cell"]]
        coss.append(
            round(float(np.dot(v.astype(np.float64), c.astype(np.float64)))
                  / (math.sqrt(float(np.dot(v.astype(np.float64), v.astype(np.float64))))
                     * math.sqrt(float(np.dot(c.astype(np.float64), c.astype(np.float64))))), 6)
        )
    assert got["n_vectors"] == len(coss)
    assert math.isclose(got["mean_cos"], sum(coss) / len(coss), abs_tol=1e-9)
