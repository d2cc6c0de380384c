"""The unified maintenance window (streaming/maintenance.py — VERDICT
r15 What's-missing #4): ordering contracts, cadence invariance, the
skip path, the guard propagation, and the scoped rewrite that makes
forget-before-expire possible."""

import os

import pytest
from pyspark.sql import functions as F

from dwh_spark.operators.similarity import assign_cells, train_semantic_cells
from dwh_spark.streaming.ingest import ParquetAppendLog
from dwh_spark.streaming.maintenance import run_maintenance_window

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return (
        spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        .select("vec_id", "embedding")
    )


def _build_store(spark, tmp_path, name, cents, emb, n_segments=3):
    from pyspark.sql.window import Window

    sliced = assign_cells(emb, cents).withColumn(
        "__slice", F.ntile(n_segments).over(Window.orderBy("vec_id"))
    )
    store = ParquetAppendLog(str(tmp_path / name), write_partitions=1)
    for i in range(1, n_segments + 1):
        store.append(sliced.filter(F.col("__slice") == i).drop("__slice"), i - 1)
    return store


def _state(spark, store):
    return sorted(
        (r["vec_id"], r["cell"]) for r in store.current(spark).collect()
    )


def test_rewrite_each_preserves_ranges_and_expire_still_drops(spark, tmp_path):
    """The scoped rewrite keeps segment boundaries and batch ranges —
    unlike compact(transform), retention keeps working afterwards
    (the contract the window's forget-before-expire ordering needs)."""
    log = ParquetAppendLog(str(tmp_path / "log"), write_partitions=1)
    for b in range(3):
        log.append(spark.range(b * 10, b * 10 + 10).withColumnRenamed("id", "x"), b)
    log.rewrite_each(spark, lambda df: df.filter(F.col("x") % 10 != 5))
    man = log._read_manifest()
    assert len(man["segments"]) == 3
    assert sorted(tuple(v) for v in man["ranges"].values()) == [
        (0, 0), (1, 1), (2, 2),
    ]
    assert log.current(spark).count() == 27  # one x%10==5 row per segment
    log.expire(keep_from=1)  # NOT a straddle: seg0's range survived intact
    assert log.current(spark).count() == 18
    assert log.last_committed() == 2  # replay guard untouched


def test_window_erasure_durable_regardless_of_retention(spark, tmp_path):
    """Forget-before-expire: a manifest id living ONLY in the segment
    that is about to age out is still counted as FORGOTTEN (the
    auditor's erasure claim cannot depend on retention timing), and
    nothing forgotten survives anywhere."""
    emb = _emb(spark)
    cents, _ = train_semantic_cells(emb, rows_per_cell=64)
    cents = cents.localCheckpoint()
    store = _build_store(spark, tmp_path, "idx", cents, emb)
    # ids strictly inside segment 0 (the first ntile slice is the
    # smallest vec_ids; grab two of them) plus one retained id
    seg0_ids = [r["vec_id"] for r in spark.read.parquet(
        store.segment_dir(0)).select("vec_id").orderBy("vec_id").limit(2).collect()]
    all_ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    fids = spark.createDataFrame(
        [(i,) for i in seg0_ids + [all_ids[-1]]], "vec_id long"
    )
    rep = run_maintenance_window(
        spark, store, cents, forgotten_ids=fids,
        rows_per_cell=64, expire_keep_from=1,
    )
    assert rep.rows_forgotten == 3  # the expiring ones count as erased
    assert rep.segments_expired == 1
    survivors = {r["vec_id"] for r in store.current(spark).select("vec_id").collect()}
    assert not survivors & set(seg0_ids + [all_ids[-1]])


def test_window_cadence_invariance(spark, tmp_path):
    """Two half-windows (forget A, then forget B) land in the same
    final state as one window forgetting A ∪ B — the scheduled-runner
    guarantee: how a deployment batches its manifests must not change
    what the store converges to (both paths end on a retrain over the
    same survivor set)."""
    emb = _emb(spark)
    cents, _ = train_semantic_cells(emb, rows_per_cell=64)
    cents = cents.localCheckpoint()
    a = emb.filter(F.col("vec_id") % 10 == 3).select("vec_id")
    b = emb.filter(F.col("vec_id") % 10 == 7).select("vec_id")
    ab = a.unionByName(b)

    split = _build_store(spark, tmp_path, "split", cents, emb)
    rep1 = run_maintenance_window(spark, split, cents, forgotten_ids=a,
                                  rows_per_cell=64)
    # the FINAL window of each cadence retrains on schedule
    # (force_retrain — the trigger is a cost knob that may delay
    # convergence by one window; forcing the last one makes the
    # invariance exact): both paths train on corpus-minus-(A∪B)
    rep2 = run_maintenance_window(spark, split, rep1.centroids,
                                  forgotten_ids=b, rows_per_cell=64,
                                  force_retrain=True)

    union = _build_store(spark, tmp_path, "union", cents, emb)
    rep_u = run_maintenance_window(spark, union, cents, forgotten_ids=ab,
                                   rows_per_cell=64, force_retrain=True)
    assert rep2.retrain_due and rep_u.retrain_due
    assert rep2.n_survivors == rep_u.n_survivors
    assert _state(spark, split) == _state(spark, union)


def test_window_skip_path_leaves_assignment_untouched(spark, tmp_path):
    """Empty manifest → the candidate retrain reproduces the incumbent
    training exactly, the trigger reads equal fit, and the
    retrain-or-skip verdict is SKIP (strict >): the rewrite applies no
    re-assignment and the state is unchanged."""
    emb = _emb(spark)
    cents, _ = train_semantic_cells(emb, rows_per_cell=64)
    cents = cents.localCheckpoint()
    store = _build_store(spark, tmp_path, "idx", cents, emb)
    before = _state(spark, store)
    rep = run_maintenance_window(spark, store, cents, rows_per_cell=64)
    assert rep.rows_forgotten == 0
    assert not rep.retrain_due
    assert rep.stale_mean_cos == rep.retrained_mean_cos
    assert _state(spark, store) == before
    assert rep.centroids is cents  # incumbent handed back on skip


def test_window_propagates_cap_calibration_error(spark, tmp_path):
    """Phase 2 recalibrates from post-forget occupancy with the
    band-split guard live: a degenerate-majority occupancy
    distribution must fail the whole window loudly BEFORE any state
    is rewritten (operators/caps.py loud-contract discipline)."""
    from dwh_spark.operators.caps import CapCalibrationError

    rows = [(i, [float(i % 7)] * 4, 1.0, i) for i in range(50)]
    rows += [(1000 + i, [float(i % 7)] * 4, 1.0, 5000 + (i % 2))
             for i in range(1800)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, norm2 double, cell long"
    )
    store = ParquetAppendLog(str(tmp_path / "degen"), write_partitions=1)
    store.append(df, 0)
    cents = df.limit(4).select("vec_id", "embedding")
    before = _state(spark, store)
    with pytest.raises(CapCalibrationError):
        run_maintenance_window(spark, store, cents)
    assert _state(spark, store) == before  # nothing rewritten


def test_window_ingest_oracle_nonvacuous():
    """The mid-stream window query's oracle must differ from the
    retrain-only chain at sf0.001 — the expire-horizon arm has to
    BITE (some batch-3 probe keeps a batch-1 partner in the
    retrain-only world and loses it under the window's horizon), so a
    fixture drift can't silently reduce the binding to its neighbor."""
    import glob

    import duckdb

    import dwh_spark.plans.all  # noqa: F401  (populates the registry)
    from dwh_spark.plans.registry import ORACLES

    con = duckdb.connect()
    for p in glob.glob(os.path.join(SF, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    window_sql = ORACLES["streaming_semantic_window_ingest"]
    retrain_sql = ORACLES["streaming_semantic_retrain_ingest"]
    diff = con.execute(
        f"SELECT count(*) FROM (({retrain_sql}) EXCEPT ({window_sql}))"
    ).fetchone()[0]
    assert diff > 0, (
        "window and retrain-only oracles coincide at sf0.001 — the "
        "expired batch-1 segment contributed no cross-batch partner"
    )


def test_window_reports_hot_cells_on_post_window_boundaries(spark, tmp_path):
    """The recalibrated cap's CONSUMER input: a planted mega-vector
    (400 identical copies, all landing in one cell) must come back in
    hot_cells — computed on the POST-window state, bounded, and ready
    to feed semantic_prune_skew_split's is_hot routing. The incumbent
    is trained on the data itself, so the empty-manifest window takes
    the skip path (candidate == incumbent) and the boundaries are the
    ones we can reason about."""
    import math

    rows = []
    # ~600 naturals spread over distinct directions: occupancy stays
    # in the low single digits across the ~150 trained cells
    for i in range(600):
        e = [
            math.cos(i * 0.37),
            math.sin(i * 0.37),
            math.cos(i * 0.11 + 1.0),
            math.sin(i * 0.11 + 1.0),
        ]
        rows.append((i, e))
    # the mega-vector: 400 verbatim copies, one cell by construction
    for j in range(400):
        rows.append((10_000 + j, [5.0, 5.0, 5.0, 5.0]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, _ = train_semantic_cells(vecs, rows_per_cell=4)
    cents = cents.localCheckpoint()
    store = ParquetAppendLog(str(tmp_path / "mega"), write_partitions=1)
    store.append(assign_cells(vecs, cents), 0)
    mega_cells = {
        r["cell"]
        for r in store.current(spark)
        .filter(F.col("vec_id") >= 10_000)
        .select("cell")
        .distinct()
        .collect()
    }
    assert len(mega_cells) == 1  # verbatim copies share one cell
    rep = run_maintenance_window(spark, store, cents, rows_per_cell=4)
    assert not rep.retrain_due  # candidate reproduces the incumbent
    assert rep.cap < 400  # q99 pinned by the ~150 natural cells
    assert rep.hot_cells == sorted(mega_cells)
    assert rep.max_occupancy >= 400


def test_fp_window_stats_equal_rebuild(spark, tmp_path):
    """The fingerprint-family window (run_fp_maintenance_window):
    after forget + expire + optimize, the stats log must equal a
    partials rebuild over the post-window index (the append_with_df /
    shrink_stats exactness discipline), the index must hold exactly
    the retained survivors, and the hot-word set must be the over-cap
    rows of the post-window stats."""
    from collections import Counter

    from dwh_spark.streaming.maintenance import run_fp_maintenance_window

    # 90 clips x 12 postings; word space mixes per-clip-unique words
    # (natural, df=1) with a shared boilerplate word 999 (degenerate)
    rows = []
    for a in range(90):
        for p in range(10):
            rows.append((a, p, a * 100 + p))  # unique -> df 1
        rows.append((a, 10, 999))  # shared word
        rows.append((a, 11, 999))
    subs = spark.createDataFrame(rows, "audio_id long, pos long, sub32 long")
    index_store = ParquetAppendLog(str(tmp_path / "idx"), write_partitions=1)
    stats_store = ParquetAppendLog(str(tmp_path / "st"), write_partitions=1)
    for b in range(3):
        seg = subs.filter((F.col("audio_id") >= b * 30) & (F.col("audio_id") < (b + 1) * 30))
        index_store.append(seg, b)
        stats_store.append(seg.groupBy("sub32").agg(F.count("*").alias("df")), b)
    fids = spark.createDataFrame([(a,) for a in range(0, 90, 9)], "audio_id long")

    rep = run_fp_maintenance_window(
        spark, index_store, stats_store, forgotten_ids=fids, expire_keep_from=1
    )
    # q99 of (unique words df=1, one word at ~160) -> 1; cap 4
    assert rep.cap == 4
    assert rep.rows_forgotten == 10 * 12
    assert rep.segments_expired == 1

    retained = {
        (r["audio_id"], r["pos"], r["sub32"])
        for r in index_store.current(spark).collect()
    }
    expect = {
        (a, p, w)
        for a, p, w in rows
        if a >= 30 and a % 9 != 0  # slices 2-3, survivors
    }
    assert retained == expect

    stats = Counter()
    for a, p, w in expect:
        stats[w] += 1
    got = {
        r["sub32"]: r["df"]
        for r in stats_store.current(spark)
        .groupBy("sub32").agg(F.sum("df").alias("df")).collect()
    }
    assert got == dict(stats)  # stats == rebuild over retained
    assert rep.hot_words == [999]
    assert rep.max_df == stats[999]
    assert rep.n_postings_after == len(expect)


def test_window_erasure_lands_even_when_calibration_fails(spark, tmp_path):
    """Contract #1 under failure: a CapCalibrationError in phase 2
    must not leave forgotten rows in the store — the runner applies
    the forget-only rewrite on the way out, then re-raises, so a
    scheduler retrying a broken calibration never delays erasure."""
    from dwh_spark.operators.caps import CapCalibrationError

    rows = [(i, [float(i % 7)] * 4, 1.0, i) for i in range(50)]
    rows += [(1000 + i, [float(i % 7)] * 4, 1.0, 5000 + (i % 2))
             for i in range(1800)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, norm2 double, cell long"
    )
    store = ParquetAppendLog(str(tmp_path / "degen"), write_partitions=1)
    store.append(df, 0)
    cents = df.limit(4).select("vec_id", "embedding")
    fids = spark.createDataFrame([(3,), (1005,)], "vec_id long")
    with pytest.raises(CapCalibrationError):
        run_maintenance_window(spark, store, cents, forgotten_ids=fids)
    survivors = {
        r["vec_id"] for r in store.current(spark).select("vec_id").collect()
    }
    assert not survivors & {3, 1005}  # erased despite the failure
    assert len(survivors) == 1848  # and nothing else touched


def test_window_skip_path_skips_identity_rewrite(spark, tmp_path):
    """ADVICE r16 (medium): nothing to forget + a skip verdict means
    phase 4 has nothing to make durable — the runner must NOT run an
    identity rewrite of every segment (at 100 TB, a full-store I/O
    pass for nothing). Pinned structurally: the manifest's segment
    dirs are byte-identical after the window (optimize=False so the
    final compact doesn't mask the check)."""
    emb = _emb(spark)
    cents, _ = train_semantic_cells(emb, rows_per_cell=64)
    cents = cents.localCheckpoint()
    store = _build_store(spark, tmp_path, "idx", cents, emb)
    segs_before = list(store._read_manifest()["segments"])
    rep = run_maintenance_window(
        spark, store, cents, rows_per_cell=64, optimize=False
    )
    assert rep.rows_forgotten == 0 and not rep.retrain_due
    assert list(store._read_manifest()["segments"]) == segs_before


def test_window_rejects_noncovering_centroids(spark, tmp_path):
    """ADVICE r16: a centroid frame that misses a stored cell must
    fail loudly — the inner-join inertia would otherwise compute the
    trigger on a silently partial corpus (and n_survivors/rows_expired
    would drift). The store is untouched on the way out (no manifest —
    nothing to make durable)."""
    emb = _emb(spark)
    cents, _ = train_semantic_cells(emb, rows_per_cell=64)
    cents = cents.localCheckpoint()
    store = _build_store(spark, tmp_path, "idx", cents, emb)
    a_cell = store.current(spark).select("cell").first()["cell"]
    partial = cents.filter(F.col("vec_id") != a_cell)
    before = _state(spark, store)
    with pytest.raises(ValueError, match="does not cover"):
        run_maintenance_window(spark, store, partial, rows_per_cell=64)
    assert _state(spark, store) == before


def test_fp_window_empty_stats_store_fails_loudly(spark, tmp_path):
    """ADVICE r16: an index with no stats partials cannot calibrate
    and the phase-1 shrink would silently no-op — the FP window must
    raise the house loud-contract ValueError, not die on a None
    AttributeError mid-phase."""
    from dwh_spark.streaming.maintenance import run_fp_maintenance_window

    subs = spark.createDataFrame(
        [(1, 0, 42)], "audio_id long, pos long, sub32 long"
    )
    index_store = ParquetAppendLog(str(tmp_path / "idx"), write_partitions=1)
    stats_store = ParquetAppendLog(str(tmp_path / "st"), write_partitions=1)
    index_store.append(subs, 0)
    with pytest.raises(ValueError, match="empty stats store"):
        run_fp_maintenance_window(spark, index_store, stats_store)


def test_fp_window_ingest_oracle_nonvacuous():
    """The mid-stream FP window query's oracle must differ from its
    cap-compaction neighbor at sf0.001 in BOTH directions: the window
    removes partners (forget + the expired batch-1 segment) AND adds
    partners (the post-window stats shrink re-admits the jingle for
    batch 3), so a fixture drift can't silently reduce the binding to
    either a pure-loss or a pure-copy of the neighbor."""
    import glob

    import duckdb

    import dwh_spark.plans.all  # noqa: F401  (populates the registry)
    from dwh_spark.plans.registry import ORACLES

    con = duckdb.connect()
    for p in glob.glob(os.path.join(SF, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    window_sql = ORACLES["streaming_audio_offset_window_ingest"]
    cap_sql = ORACLES["streaming_audio_offset_cap_compaction"]
    lost = con.execute(
        f"SELECT count(*) FROM (({cap_sql}) EXCEPT ({window_sql}))"
    ).fetchone()[0]
    gained = con.execute(
        f"SELECT count(*) FROM (({window_sql}) EXCEPT ({cap_sql}))"
    ).fetchone()[0]
    assert lost > 0, "window removed no partner row vs the cap neighbor"
    assert gained > 0, (
        "window added no partner row vs the cap neighbor — the jingle "
        "re-admission arm is vacuous"
    )


def test_window_rejects_duplicate_centroid_keys(spark, tmp_path):
    """ADVICE r17: a duplicated cell key in the centroid frame fans
    the occupancy LEFT join out — df, n_survivors and n_scored all
    double together, so the coverage check cannot catch it and the cap
    calibrates on doubled occupancy. Must fail loudly, store untouched."""
    emb = _emb(spark)
    cents, _ = train_semantic_cells(emb, rows_per_cell=64)
    cents = cents.localCheckpoint()
    store = _build_store(spark, tmp_path, "idx", cents, emb)
    duped = cents.unionByName(cents.limit(1))
    before = _state(spark, store)
    with pytest.raises(ValueError, match="duplicate cell keys"):
        run_maintenance_window(spark, store, duped, rows_per_cell=64)
    assert _state(spark, store) == before


def test_fp_window_total_forget_raises_descriptively(spark, tmp_path):
    """ADVICE r17: a forget manifest covering the entire corpus shrinks
    the stats log to empty — the window must raise the descriptive
    post-shrink message (not calibrate_cap's generic 'empty stats
    table'), and the erasure must already be durable when it does."""
    from dwh_spark.streaming.maintenance import run_fp_maintenance_window

    subs = spark.createDataFrame(
        [(a, p, a * 10 + p) for a in range(4) for p in range(3)],
        "audio_id long, pos long, sub32 long",
    )
    index_store = ParquetAppendLog(str(tmp_path / "idx"), write_partitions=1)
    stats_store = ParquetAppendLog(str(tmp_path / "st"), write_partitions=1)
    index_store.append(subs, 0)
    stats_store.append(
        subs.groupBy("sub32").agg(F.count("*").alias("df")), 0
    )
    fids = spark.createDataFrame([(a,) for a in range(4)], "audio_id long")
    with pytest.raises(ValueError, match="empty after the forget shrink"):
        run_fp_maintenance_window(
            spark, index_store, stats_store, forgotten_ids=fids
        )
    assert index_store.current(spark).count() == 0  # erasure durable


def _two_store_fixture(spark, tmp_path):
    from dwh_spark.streaming.ingest import ParquetAppendLog

    idx = ParquetAppendLog(str(tmp_path / "idx2"), write_partitions=1)
    pay = ParquetAppendLog(str(tmp_path / "pay2"), write_partitions=1)
    for b in range(2):
        ids = list(range(b * 10, b * 10 + 10))
        idx.append(
            spark.createDataFrame(
                [(i, band, f"k{i}b{band}") for i in ids for band in range(4)],
                "doc_id long, band int, band_key string",
            ),
            b,
        )
        pay.append(
            spark.createDataFrame(
                [(i, f"text {i}") for i in ids], "doc_id long, text string"
            ),
            b,
        )
    return idx, pay


def test_two_store_window_crash_between_stores_is_leak_safe(spark, tmp_path):
    """THE ordering contract (VERDICT r17 What's-missing #5): a crash
    after the index rewrite but before the payload rewrite must leave
    the LEAK-SAFE intermediate state — forgotten keys gone from the
    index (no probe can form a candidate), payloads still present but
    unreachable — and a re-issued window must complete the payload
    side idempotently."""
    from dwh_spark.streaming.maintenance import run_two_store_window

    idx, pay = _two_store_fixture(spark, tmp_path)
    fids = spark.createDataFrame([(3,), (13,)], "doc_id long")
    calls = []

    def exploding_payload_forget(seg, ids):
        calls.append(1)
        raise RuntimeError("crash between the two stores")

    with pytest.raises(RuntimeError, match="between the two stores"):
        run_two_store_window(
            spark, idx, pay,
            forgotten_ids=fids,
            payload_forget_fn=exploding_payload_forget,
        )
    # leak-safe direction: index already erased, payload untouched
    idx_keys = {r["doc_id"] for r in idx.current(spark).select("doc_id").collect()}
    pay_keys = {r["doc_id"] for r in pay.current(spark).select("doc_id").collect()}
    assert not idx_keys & {3, 13}
    assert {3, 13} <= pay_keys
    # the re-issued erasure completes the payload side
    rep = run_two_store_window(spark, idx, pay, forgotten_ids=fids)
    pay_keys = {r["doc_id"] for r in pay.current(spark).select("doc_id").collect()}
    assert not pay_keys & {3, 13}
    assert rep.orphan_index_keys == 0 and rep.orphan_payload_keys == 0
    # the replay's index semi-join saw an already-clean index
    assert rep.index_rows_forgotten == 0 and rep.payload_rows_forgotten == 2


def test_two_store_window_audit_reports_orphans(spark, tmp_path):
    """The referential audit is live, not decorative: a band row whose
    payload is missing (and vice versa) surfaces in the report."""
    from dwh_spark.streaming.ingest import ParquetAppendLog
    from dwh_spark.streaming.maintenance import run_two_store_window

    idx = ParquetAppendLog(str(tmp_path / "idx3"), write_partitions=1)
    pay = ParquetAppendLog(str(tmp_path / "pay3"), write_partitions=1)
    idx.append(
        spark.createDataFrame(
            [(1, 0, "a"), (2, 0, "b"), (99, 0, "dangling")],
            "doc_id long, band int, band_key string",
        ),
        0,
    )
    pay.append(
        spark.createDataFrame(
            [(1, "t1"), (2, "t2"), (77, "unreachable")],
            "doc_id long, text string",
        ),
        0,
    )
    rep = run_two_store_window(spark, idx, pay)
    assert rep.orphan_index_keys == 1  # doc 99: band without text
    assert rep.orphan_payload_keys == 1  # doc 77: text without band


def test_window_rejects_null_centroid_key(spark, tmp_path):
    """Review r18: count_distinct ignores NULLs, so a NULL cell key
    used to read as a 'duplicate cell keys' diagnosis — but NULL never
    matches the occupancy equi-join (rows silently unreachable), a
    different disease needing its own loud message."""
    emb = _emb(spark)
    cents, _ = train_semantic_cells(emb, rows_per_cell=64)
    cents = cents.localCheckpoint()
    store = _build_store(spark, tmp_path, "idxnull", cents, emb)
    nulled = cents.unionByName(
        cents.limit(1).withColumn("vec_id", F.lit(None).cast("long"))
    )
    before = _state(spark, store)
    with pytest.raises(ValueError, match="NULL cell key"):
        run_maintenance_window(spark, store, nulled, rows_per_cell=64)
    assert _state(spark, store) == before


def test_two_store_window_empty_forget_skips_rewrites(spark, tmp_path):
    """Review r18: an erasure manifest that is legitimately EMPTY this
    cycle must not pay the two full-store rewrite passes (the window's
    dominant cost at 100 TB) for a no-op — segments stay untouched
    (same names in both manifests), counts report their exact zeros."""
    from dwh_spark.streaming.maintenance import run_two_store_window

    idx, pay = _two_store_fixture(spark, tmp_path)
    seg_i = list(idx._read_manifest()["segments"])
    seg_p = list(pay._read_manifest()["segments"])
    empty = spark.createDataFrame([], "doc_id long")
    rep = run_two_store_window(
        spark, idx, pay, forgotten_ids=empty, optimize=False
    )
    assert list(idx._read_manifest()["segments"]) == seg_i
    assert list(pay._read_manifest()["segments"]) == seg_p
    assert rep.index_rows_forgotten == 0
    assert rep.payload_rows_forgotten == 0
    assert rep.forgotten_key_sum == 0
    assert idx.current(spark).count() == 80  # 20 docs x 4 bands
    assert pay.current(spark).count() == 20


def test_two_store_window_rejects_non_numeric_key(spark, tmp_path):
    """Review r18: F.sum over a string key NULLs per row (non-ANSI)
    and the coalesce laundered it into forgotten_key_sum=0 — an
    apparently valid checksum auditing nothing (ANSI mode instead
    crashed mid-window, AFTER the index rewrite). Must raise up front,
    both stores untouched."""
    from dwh_spark.streaming.maintenance import run_two_store_window

    idx = ParquetAppendLog(str(tmp_path / "idxs"), write_partitions=1)
    pay = ParquetAppendLog(str(tmp_path / "pays"), write_partitions=1)
    idx.append(
        spark.createDataFrame(
            [("h1", 0, "b0"), ("h2", 0, "b1")],
            "content_hash string, band int, band_key string",
        ),
        0,
    )
    pay.append(
        spark.createDataFrame(
            [("h1", "t1"), ("h2", "t2")], "content_hash string, text string"
        ),
        0,
    )
    fids = spark.createDataFrame([("h1",)], "content_hash string")
    with pytest.raises(TypeError, match="numeric key"):
        run_two_store_window(
            spark, idx, pay, forgotten_ids=fids, key="content_hash"
        )
    assert pay.current(spark).count() == 2  # nothing erased pre-raise
    assert idx.current(spark).count() == 2
