"""Property-based tests for the round-17 surface (hypothesis): the
GENERALIZED fingerprint maintenance window — composite stats keys +
derived partials (the video per-frame binding's shape) — replayed
against a pure-python model on random frame tables. Same discipline
as tests/test_properties_r16.py: one spark frame per op, small
max_examples, short sequences."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dwh_spark.streaming.ingest import ParquetAppendLog


def _ceil_rank_q(counts: list[int], q: float) -> int:
    hist = sorted(Counter(counts).items())
    k = math.ceil(q * len(counts))
    cum = 0
    for v, c in hist:
        cum += c
        if cum >= k:
            return v
    return hist[-1][0]


def _blocks(h: int) -> list[tuple[int, int]]:
    """The model's 2-block split of the 10-bit test hashes — the
    composite (i, val) key shape the video binding uses (14-bit
    blocks there). Block 0 takes the low 8 bits (0..255, sparse);
    block 1 the remaining 2 (0..3, collision-dense — the degenerate
    band the cap machinery must see)."""
    return [(0, h & 255), (1, (h >> 8) & 255)]


def _partials_fn(rows):
    """Spark twin of _blocks: per-(i, val) counts DERIVED from the
    hash column — the video_block_df shape."""
    split = F.explode(
        F.array(
            F.struct(F.lit(0).alias("i"), (F.col("h") % 256).alias("val")),
            F.struct(
                F.lit(1).alias("i"),
                (F.floor(F.col("h") / 256) % 256).alias("val"),
            ),
        )
    ).alias("b")
    return (
        rows.select(split)
        .select("b.i", "b.val")
        .groupBy("i", "val")
        .agg(F.count("*").alias("df"))
    )


_CASES = st.tuples(
    st.lists(  # frames: (video, hash) — ids 0..11, 10-bit hashes:
        # block 0 spans 0..255, block 1 only 0..3 — DELIBERATELY
        # tiny so hypothesis produces dense collisions in block 1
        # (the hot/degenerate shape) while block 0 stays sparse
        st.tuples(st.integers(0, 11), st.integers(0, 1023)),
        min_size=8,
        max_size=40,
    ),
    st.sets(st.integers(0, 11), max_size=4),  # forget manifest
    st.integers(0, 3),  # expire horizon
)


@settings(max_examples=4, deadline=None)
@given(_CASES)
def test_fp_window_composite_keys_match_model(spark, tmp_path_factory, case):
    """run_fp_maintenance_window with stats_keys=['i','val'] and a
    derived partials_fn against a pure-python model: retained index,
    exact per-(i,val) stats (== rebuild over retained), the ceil-rank
    cap from POST-forget stats, and the post-window hot TUPLE set
    must all match — the composite-key seams cannot drift from the
    single-key contract the r16 property suite pins."""
    from dwh_spark.operators.caps import CapCalibrationError, band_split
    from dwh_spark.streaming.maintenance import run_fp_maintenance_window

    frames, forget, keep_from = case
    root = tmp_path_factory.mktemp("fpw17")
    index_store = ParquetAppendLog(str(root / "idx"), write_partitions=1)
    stats_store = ParquetAppendLog(str(root / "st"), write_partitions=1)
    batches = [
        [(v, i, h) for i, (v, h) in enumerate(frames) if v % 3 == b]
        for b in range(3)
    ]
    for b, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows or [(None, None, None)], "video_id long, frame_ix long, h long"
        )
        if not rows:
            df = df.filter(F.lit(False))
        index_store.append(df, b)
        stats_store.append(_partials_fn(df), b)
    fids = spark.createDataFrame(
        [(v,) for v in sorted(forget)] or [(None,)], "video_id long"
    )
    if not forget:
        fids = fids.filter(F.lit(False))

    # the model
    surv = [(v, i, h) for rows in batches for v, i, h in rows
            if v not in forget]
    pf_stats = Counter(bk for _, _, h in surv for bk in _blocks(h))
    retained = [
        (v, i, h)
        for b, rows in enumerate(batches)
        for v, i, h in rows
        if v not in forget and b >= keep_from
    ]

    def run():
        return run_fp_maintenance_window(
            spark, index_store, stats_store,
            forgotten_ids=fids,
            key="video_id",
            value_col="h",
            stats_keys=["i", "val"],
            partials_fn=_partials_fn,
            expire_keep_from=keep_from,
        )

    if not pf_stats:
        with pytest.raises(ValueError):
            run()
        return
    pf_counts = list(pf_stats.values())
    hist = sorted(Counter(pf_counts).items())
    qv = _ceil_rank_q(pf_counts, 0.99)
    guard_top = band_split(hist)
    if guard_top is not None and qv > guard_top:
        with pytest.raises(CapCalibrationError):
            run()
        return
    rep = run()
    assert rep.cap == 4 * qv
    cur = index_store.current(spark)
    got_index = sorted(
        (r["video_id"], r["frame_ix"], r["h"]) for r in cur.collect()
    ) if cur is not None else []
    assert got_index == sorted(retained)
    model_stats = Counter(bk for _, _, h in retained for bk in _blocks(h))
    cur_stats = stats_store.current(spark)
    got_stats = {
        (r["i"], r["val"]): r["df"]
        for r in cur_stats.groupBy("i", "val")
        .agg(F.sum("df").alias("df"))
        .collect()
        if r["df"] and r["df"] > 0
    } if cur_stats is not None else {}
    assert got_stats == dict(model_stats)
    assert rep.hot_words == sorted(
        bk for bk, c in model_stats.items() if c > rep.cap
    )
    assert rep.rows_forgotten == sum(
        1 for rows in batches for v, _, _ in rows if v in forget
    )
