"""The unified MAINTENANCE WINDOW — one runner sequencing the whole
index-lifecycle toolkit over a store (VERDICT r15 What's-missing #4 /
next #3): every phase existed and composed pairwise (calibrate →
forget → trigger → retrain → compact → expire, each driver-gated on
its own); a deployment runs them as ONE scheduled window, and the
ordering is a correctness contract, not a style choice. This module
owns that ordering:

1. **Apply the forget manifest** (durability first): every active
   segment is rewritten minus the manifest ids in one atomic
   ``rewrite_each`` swap — erasure is durable BEFORE the retention
   horizon moves, so even rows about to age out are provably erased
   (an auditor's "zero ghosts" claim cannot depend on retention
   timing). Ranges survive the rewrite, which is what lets expire
   keep working afterwards (the whole-log ``compact(transform=...)``
   shape would have manufactured a straddle).
2. **Recalibrate from POST-forget stats**: the mega-cell occupancy
   cap is re-derived from the survivor distribution — calibrating
   from pre-forget stats would bake the forgotten rows' skew into
   the next era's cap. ``CapCalibrationError`` propagates loudly
   (operators/caps.py's guard): a window that cannot trust its
   distribution must fail, not mis-calibrate.
3. **Evaluate the retrain trigger**: stale inertia (survivors on the
   incumbent centroids) vs candidate inertia (survivors on centroids
   retrained from them) — the measured benefit, not a timer
   (plans/embeddings.py:emb_retrain_drift_trigger pins the
   arithmetic). The candidate training is the only real cost and
   runs on the survivor frame or its ``train_fraction`` hash-sample.
4. **Retrain-or-skip**: if the trigger fires, the same per-segment
   rewrite that applies the forget also re-assigns every surviving
   row against the retrained centroids — ONE rewrite pass makes both
   durable; a skip leaves assignments untouched (and the anti-join
   still runs, forget never waits on the retrain verdict).
5. **Expire**: the retention horizon advances LAST, dropping
   fully-aged segments O(manifest) — by now their forgotten rows are
   already erased (contract 1) and the survivor stats already fed
   the new cap (contract 2).
6. **Optimize**: a final plain ``compact()`` merges the retained
   segments. Stated consequence: the merged range will straddle the
   NEXT window's horizon, so retention becomes the documented
   bounded over-approximation (at most one window period of extra
   visibility — streaming/ingest.py:expire); at 100 TB a partitioned
   table compacts per partition and the straddle disappears.

The runner emits a :class:`WindowReport` — the auditor's ledger of
what the window did (rows forgotten, cap set, trigger metrics,
retrain verdict, segments expired) — and the post-window centroids
for subsequent ingest folds. ``plans/embeddings.py:
emb_maintenance_window_ledger`` drives it end-to-end under a DuckDB
oracle that re-derives every phase (both trainings, both inertias,
the occupancy quantile, the retrain CASE and both resulting states)
in SQL.

Reference parity: the reference has no maintenance loop — its state
is rebuilt by replaying the chain (`x/indexer/indexer.go:173-197`
re-polls from the cursor). This window is the beyond-reference
operations layer a 100 TB training-data lake needs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_spark.operators.caps import calibrate_cap, df_quantile
from dwh_spark.streaming.ingest import ParquetAppendLog


@dataclass
class WindowReport:
    """What the maintenance window did — the auditor's artifact.
    Scalar facts only (every frame the window touched is either
    rewritten into the store or discarded); ``centroids`` is the
    post-window centroid frame (retrained if the trigger fired, the
    incumbent otherwise), localCheckpoint-ed and safe to hand to the
    next ingest fold."""

    rows_forgotten: int
    forgotten_id_sum: int
    cap: int
    cap_quantile_value: int
    hot_cells: list[int]
    max_occupancy: int
    n_survivors: int
    stale_mean_cos: float
    retrained_mean_cos: float
    retrain_due: bool
    n_cells: int
    segments_expired: int
    rows_expired: int
    segments_after: int
    centroids: DataFrame


def run_maintenance_window(
    spark: SparkSession,
    index_store: ParquetAppendLog,
    old_centroids: DataFrame,
    *,
    forgotten_ids: DataFrame | None = None,
    key: str = "vec_id",
    cap_quantile: float = 0.99,
    cap_margin: int = 4,
    cap_check: bool = True,
    rows_per_cell: int = 4096,
    n_iter: int = 1,
    train_fraction: float | None = None,
    force_retrain: bool = False,
    expire_keep_from: int | None = None,
    optimize: bool = True,
) -> WindowReport:
    """Run one maintenance window over an IVF cell index store
    (rows: ``(key, embedding, norm2, cell)`` — the
    ``assign_cells`` shape). See the module docstring for the phase
    ordering and its contracts; parameters mirror the standalone
    operators (``calibrate_cap``, ``train_semantic_cells``,
    ``retrain_cells_at_compaction``, ``expire``).

    Cost shape at 100 TB: the manifest anti-join is broadcast
    (O(forgotten + index) — operators/forget.py); recalibration and
    both inertias are one bounded aggregate each; the candidate
    training runs on the survivor frame or its hash-sample; the one
    per-segment rewrite is the compaction the store was due anyway;
    expire is O(manifest)."""
    from dwh_spark.operators.forget import forget_rows
    from dwh_spark.operators.similarity import (
        assign_cells,
        cell_inertia,
        train_semantic_cells,
    )

    state = index_store.current(spark)
    if state is None:
        raise ValueError("maintenance window on an empty index store")

    # -- phase 1 prep: the survivor frame (the rewrite itself runs in
    # -- phase 4 so forget + retrain share ONE pass; nothing below
    # -- reads pre-forget rows)
    if forgotten_ids is not None:
        forgotten_ids = forgotten_ids.localCheckpoint()
        survivors = forget_rows(state, forgotten_ids, key=key)
        fstats = (
            state.join(F.broadcast(forgotten_ids), key, "left_semi")
            .agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum(key), F.lit(0)).alias("id_sum"),
            )
            .collect()[0]
        )
        rows_forgotten, forgotten_id_sum = int(fstats["n"]), int(fstats["id_sum"])
    else:
        survivors = state
        rows_forgotten, forgotten_id_sum = 0, 0

    # -- phase 2: recalibrate the occupancy cap from POST-forget stats
    occ = (
        survivors.groupBy("cell").agg(F.count("*").alias("df")).localCheckpoint()
    )
    cap_q_value = df_quantile(occ, cap_quantile)
    cap = calibrate_cap(
        occ, quantile=cap_quantile, margin=cap_margin, check=cap_check
    )

    # -- phase 3: the retrain trigger — stale vs candidate fit
    stale = cell_inertia(survivors, old_centroids).collect()[0]
    cand_centroids, n_cells = train_semantic_cells(
        survivors.select(key, "embedding"),
        rows_per_cell=rows_per_cell,
        n_iter=n_iter,
        train_fraction=train_fraction,
    )
    cand_centroids = cand_centroids.localCheckpoint()
    retrained = cell_inertia(
        assign_cells(survivors.select(key, "embedding"), cand_centroids),
        cand_centroids,
    ).collect()[0]
    n_survivors = int(stale["n_vectors"])
    # force_retrain is the scheduled-retrain deployment mode (and the
    # cadence-invariance lever: the trigger is a cost optimization
    # that may delay convergence by one window — forcing the final
    # window's retrain makes "two half-windows == one union window"
    # exact; tests/test_maintenance_window.py pins it)
    retrain_due = force_retrain or bool(
        retrained["mean_cos"] > stale["mean_cos"]
    )

    # -- phase 4: ONE per-segment rewrite — forget always, re-assign
    # -- iff the trigger fired; ranges survive so phase 5 still works
    def transform(seg: DataFrame) -> DataFrame:
        kept = (
            forget_rows(seg, forgotten_ids, key=key)
            if forgotten_ids is not None
            else seg
        )
        if retrain_due:
            kept = assign_cells(kept.select(key, "embedding"), cand_centroids)
        return kept

    index_store.rewrite_each(spark, transform)

    # -- phase 5: retention horizon LAST (erasure already durable)
    segments_expired, rows_expired = 0, 0
    if expire_keep_from is not None:
        man = index_store._read_manifest()
        before_segments = list(man["segments"])
        index_store.expire(expire_keep_from)
        man = index_store._read_manifest()
        segments_expired = len(before_segments) - len(man["segments"])
        if segments_expired:
            # the post-rewrite store holds exactly the survivor rows,
            # so one post-expire count suffices (no pre-expire count)
            cur = index_store.current(spark)
            rows_expired = n_survivors - (
                cur.count() if cur is not None else 0
            )

    # -- phase 6: OPTIMIZE the retained segments
    if optimize:
        index_store.compact(spark)
    # -- the cap's CONSUMER input, computed on the POST-WINDOW state
    # -- (the boundaries the next era actually probes): the over-cap
    # -- (mega) cells the prune/probe routes through the block-split
    # -- path (operators/similarity.py:semantic_prune_skew_split's
    # -- is_hot set); bounded by construction — only cells above
    # -- margin x q. One bounded aggregate over the live store.
    final = index_store.current(spark)
    final_occ = (
        final.groupBy("cell").agg(F.count("*").alias("df")).collect()
        if final is not None
        else []
    )
    max_occupancy = max((int(r["df"]) for r in final_occ), default=0)
    hot_cells = sorted(
        int(r["cell"]) for r in final_occ if int(r["df"]) > cap
    )
    man = index_store._read_manifest()
    return WindowReport(
        rows_forgotten=rows_forgotten,
        forgotten_id_sum=forgotten_id_sum,
        cap=cap,
        cap_quantile_value=cap_q_value,
        hot_cells=hot_cells,
        max_occupancy=max_occupancy,
        n_survivors=n_survivors,
        stale_mean_cos=float(stale["mean_cos"]),
        retrained_mean_cos=float(retrained["mean_cos"]),
        retrain_due=retrain_due,
        n_cells=int(n_cells),
        segments_expired=segments_expired,
        rows_expired=rows_expired,
        segments_after=len(man["segments"]) if man else 0,
        centroids=cand_centroids if retrain_due else old_centroids,
    )
