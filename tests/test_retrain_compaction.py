"""Centroid retrain at the compaction seam (streaming/emb_ingest.py:
retrain_cells_at_compaction — VERDICT r14 What's-missing #4 made
executable): the post-retrain stored index is pinned EQUAL to a fresh
train+assign build over corpus-minus-forgotten; nothing forgotten
survives the rewrite; and a probe demonstrates the cell boundary
actually MOVING — a pair the pre-retrain assignment separates lands
in one cell after the retrain.

Fixture geometry (2-dim unit vectors by angle, simulated offline to
pin the boundary): cluster A at 0-6 deg, cluster B at 84-90 deg, a
to-be-forgotten DRAG set at 40-46 deg that pulls the day-0 low
centroid to ~25 deg, and an indexed mate at 55 deg. Day-0 boundary
sits at ~52.9 deg; after forgetting the drag set the retrained low
centroid returns to ~17 deg and the boundary moves to ~52.2 deg — a
probe at 52.5 deg therefore lands LOW (away from its 55-deg mate,
cosine 0.999) before the retrain and HIGH (with it) after."""

import math

import pytest
from pyspark.sql import functions as F

from dwh_spark.operators.forget import ids_frame
from dwh_spark.operators.similarity import (
    assign_cells,
    cell_probe,
    train_semantic_cells,
)
from dwh_spark.streaming.emb_ingest import retrain_cells_at_compaction
from dwh_spark.streaming.ingest import ParquetAppendLog

_ANGLES = {
    1: 0.0, 2: 2.0, 3: 4.0, 4: 6.0,            # cluster A
    50: 40.0, 51: 42.0, 52: 44.0, 53: 46.0,    # drag set (forgotten)
    101: 90.0, 102: 88.0, 103: 86.0, 104: 84.0,  # cluster B
    60: 55.0, 61: 40.0,                         # mid vectors
}
_FORGET = [50, 51, 52, 53]


def _vec(deg: float) -> list[float]:
    r = math.radians(deg)
    return [math.cos(r), math.sin(r)]


def _corpus(spark):
    return spark.createDataFrame(
        [(i, _vec(a)) for i, a in _ANGLES.items()],
        "vec_id long, embedding array<float>",
    )


def _built_store(spark, tmp_path) -> ParquetAppendLog:
    """Day-0 index: trained over the FULL corpus (drag set included),
    appended as batch 0 — the state a semantic ingest would hold."""
    corpus = _corpus(spark)
    cents, n = train_semantic_cells(corpus, rows_per_cell=1000, min_cells=2)
    assert n == 2
    store = ParquetAppendLog(str(tmp_path / "index"), write_partitions=1)
    store.append(assign_cells(corpus, cents), 0)
    return store


def test_retrain_equals_fresh_build_and_forgets(spark, tmp_path):
    store = _built_store(spark, tmp_path)
    cents, n = retrain_cells_at_compaction(
        spark,
        store,
        ids_frame(spark, _FORGET, "vec_id"),
        rows_per_cell=1000,
        min_cells=2,
    )
    assert n == 2
    state = store.current(spark)
    assert state.filter(F.col("vec_id").isin(*_FORGET)).count() == 0
    survivors = _corpus(spark).filter(~F.col("vec_id").isin(*_FORGET))
    fresh_cents, _ = train_semantic_cells(
        survivors, rows_per_cell=1000, min_cells=2
    )
    rebuilt = assign_cells(survivors, fresh_cents)
    cols = ["vec_id", "embedding", "norm2", "cell"]
    assert {tuple(map(repr, r)) for r in state.select(cols).collect()} == {
        tuple(map(repr, r)) for r in rebuilt.select(cols).collect()
    }
    # the returned centroids match the rebuild's training exactly
    assert {tuple(map(repr, r)) for r in cents.collect()} == {
        tuple(map(repr, r)) for r in fresh_cents.collect()
    }


def test_probe_sees_the_boundary_move(spark, tmp_path):
    """The same probe vector (52.5 deg), probed at threshold 0.995:
    against the day-0 assignment it lands in the LOW cell away from
    its 55-deg mate (cosine 0.999) -> zero hits; against the
    retrained index the boundary has moved below it -> the mate is
    found. This is the recall the retrain buys back (and the exact
    'centroids keep reflecting forgotten data until retrain' effect
    the forget docstrings state)."""
    corpus = _corpus(spark)
    day0_cents, _ = train_semantic_cells(corpus, rows_per_cell=1000, min_cells=2)
    day0_cents = day0_cents.localCheckpoint()
    store = ParquetAppendLog(str(tmp_path / "index"), write_partitions=1)
    store.append(assign_cells(corpus, day0_cents), 0)
    probe = spark.createDataFrame(
        [(1060, _vec(52.5))], "vec_id long, embedding array<float>"
    )

    def hits(state, cents):
        return {
            r["corpus_id"]
            for r in cell_probe(
                state, assign_cells(probe, cents), 0.995
            ).collect()
        }

    # pre-retrain (even after a logical forget, centroids still
    # reflect the drag set): the mate is in the other cell
    from dwh_spark.operators.forget import forget_rows

    kept = forget_rows(store.current(spark), _FORGET, key="vec_id")
    assert hits(kept, day0_cents) == set()
    new_cents, _ = retrain_cells_at_compaction(
        spark,
        store,
        ids_frame(spark, _FORGET, "vec_id"),
        rows_per_cell=1000,
        min_cells=2,
    )
    assert hits(store.current(spark), new_cents) == {60}


def test_drift_trigger_fires_on_the_moved_boundary(spark, tmp_path):
    """cell_inertia as the retrain trigger: on the drag-set geometry
    the survivors fit the retrained centroids strictly better than
    the stale day-0 ones — the case where retrain_due = 1 (the
    registry query's synthetic corpus shows the opposite, equally
    correct outcome: no benefit, skip the rewrite)."""
    from dwh_spark.operators.similarity import cell_inertia

    corpus = _corpus(spark)
    day0, _ = train_semantic_cells(corpus, rows_per_cell=1000, min_cells=2)
    day0 = day0.localCheckpoint()
    survivors = corpus.filter(~F.col("vec_id").isin(*_FORGET))
    new_c, _ = train_semantic_cells(survivors, rows_per_cell=1000, min_cells=2)
    stale = cell_inertia(assign_cells(survivors, day0), day0).collect()[0]
    fresh = cell_inertia(assign_cells(survivors, new_c), new_c).collect()[0]
    assert stale["n_vectors"] == fresh["n_vectors"] == 10
    assert fresh["mean_cos"] > stale["mean_cos"]


def test_retrain_is_idempotent_under_replay(spark, tmp_path):
    """Crash semantics: if the maintenance window re-fires after the
    compact committed (replayed batch, crash between compact and the
    next fold), the second retrain sees a store where the forgotten
    ids are already gone, trains on the identical survivor set, and
    rewrites to the identical state — running it twice equals running
    it once."""
    store = _built_store(spark, tmp_path)
    fids = ids_frame(spark, _FORGET, "vec_id")
    retrain_cells_at_compaction(spark, store, fids, rows_per_cell=1000, min_cells=2)
    cols = ["vec_id", "embedding", "norm2", "cell"]
    first = {tuple(map(repr, r)) for r in store.current(spark).select(cols).collect()}
    retrain_cells_at_compaction(spark, store, fids, rows_per_cell=1000, min_cells=2)
    second = {tuple(map(repr, r)) for r in store.current(spark).select(cols).collect()}
    assert first == second


def test_retrain_empty_store_raises(spark, tmp_path):
    store = ParquetAppendLog(str(tmp_path / "empty"), write_partitions=1)
    with pytest.raises(ValueError, match="empty"):
        retrain_cells_at_compaction(spark, store)


def test_pq_codebook_leak_and_recode(spark, tmp_path):
    """The PQ forget case is sharper than IVF: the codebook carries
    its seed vectors' subvector slices VERBATIM. Forget a vector that
    seeded the day-0 codebook: the old trained artifact still holds
    its slices byte-for-byte (the leak, pinned), and
    pq_recode_at_compaction removes it — survivor-seeded codebook,
    store rewritten, pinned equal to a fresh encode over survivors."""
    import hashlib

    from dwh_spark.operators.similarity import pq_codebook, pq_encode
    from dwh_spark.streaming.emb_ingest import pq_recode_at_compaction

    ids = list(range(1, 21))
    vec = lambda i: [float((i * 31 + d * 7) % 97) / 97.0 for d in range(64)]  # noqa: E731
    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in ids], "vec_id long, embedding array<float>"
    )
    md5_order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    fid = md5_order[0]  # the forgotten vector IS a day-0 seed
    day0_seeds = (
        corpus.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id").limit(8)
    )
    cb0 = pq_codebook(day0_seeds)
    leaked = cb0.filter(F.col("code") == fid).orderBy("sub").collect()
    assert [r["c_sub"] for r in leaked] == [
        [pytest.approx(x) for x in vec(fid)[s * 16 : s * 16 + 16]]
        for s in range(4)
    ]
    store = ParquetAppendLog(str(tmp_path / "codes"), write_partitions=1)
    store.append(pq_encode(corpus, cb0), 0)
    survivors = corpus.filter(F.col("vec_id") != fid)
    new_cb = pq_recode_at_compaction(spark, store, survivors)
    assert new_cb.filter(F.col("code") == fid).count() == 0
    assert set(md5_order[1:9]) == {
        r["code"] for r in new_cb.select("code").distinct().collect()
    }
    state = store.current(spark)
    assert state.filter(F.col("vec_id") == fid).count() == 0
    rebuilt = pq_encode(survivors, new_cb)
    cols = ["vec_id", "sub", "code"]
    assert {tuple(r) for r in state.select(cols).collect()} == {
        tuple(r) for r in rebuilt.select(cols).collect()
    }


def test_retrain_without_forget_is_pure_recluster(spark, tmp_path):
    """No forget set: the compaction rewrite keeps every row and only
    re-derives cells from survivors==corpus — equal to the fresh
    build over the full corpus."""
    store = _built_store(spark, tmp_path)
    retrain_cells_at_compaction(spark, store, rows_per_cell=1000, min_cells=2)
    state = store.current(spark)
    corpus = _corpus(spark)
    fresh_cents, _ = train_semantic_cells(corpus, rows_per_cell=1000, min_cells=2)
    rebuilt = assign_cells(corpus, fresh_cents)
    cols = ["vec_id", "embedding", "norm2", "cell"]
    assert {tuple(map(repr, r)) for r in state.select(cols).collect()} == {
        tuple(map(repr, r)) for r in rebuilt.select(cols).collect()
    }
