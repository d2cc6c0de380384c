"""Mid-stream centroid retrain during a live semantic fold
(streaming/emb_ingest.py: the callable-centroids seam +
retrain_cells_at_compaction run from the maintenance window): batch 2
folds against the RETRAINED index with the NEW centroids, and the
difference is observable — a probe pair the day-0 boundary separates
is found only when the retrain ran.

Geometry (2-dim unit vectors, simulated offline): batch 1 carries
cluster A (0-6 deg), a drag set (40-46 deg), cluster B (84-90 deg)
and a mate at 58.5 deg. Day-0 training (drag included) puts the low
centroid at ~28 deg -> boundary ~57.7: the mate sits HIGH, a 55-deg
probe LOW. Forgetting the drag set and retraining moves the low
centroid to ~34 deg -> boundary ~61.6: mate and probe now share the
low cell (cosine cos(3.5deg)=0.99813 >= 0.995; the drag set tops
out at cos(9deg)=0.9877, safely below threshold even in the
control run where it stays in the store)."""

import math
import os

from pyspark.sql import functions as F

from dwh_spark.operators.similarity import train_semantic_cells
from dwh_spark.streaming.emb_ingest import (
    read_semantic_ingest_results,
    retrain_cells_at_compaction,
    run_semantic_ingest,
)
from dwh_spark.streaming.ingest import ParquetAppendLog

_B1 = {
    1: 0.0, 2: 2.0, 3: 4.0, 4: 6.0,            # cluster A
    5: 40.0, 6: 42.0, 7: 44.0, 8: 46.0,        # drag set (forgotten)
    9: 90.0, 10: 88.0, 11: 86.0, 12: 84.0,     # cluster B
    13: 58.5, 14: 40.0,                         # mate + a low survivor
}
_DRAG = [5, 6, 7, 8]
_PROBE_ID, _PROBE_DEG = 100, 55.0


def _vec(deg):
    r = math.radians(deg)
    return [math.cos(r), math.sin(r)]


def _stage(spark, root):
    input_dir = os.path.join(root, "input")
    os.makedirs(input_dir)
    batches = [
        [(i, _vec(a)) for i, a in _B1.items()],
        [(_PROBE_ID, _vec(_PROBE_DEG))],
    ]
    for i, rows in enumerate(batches):
        stage = os.path.join(root, f"stage{i}")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(input_dir, f"batch{i}.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return input_dir


def _run(spark, root, retrain: bool):
    input_dir = _stage(spark, root)
    b1 = spark.read.parquet(os.path.join(input_dir, "batch0.parquet"))
    day0, _ = train_semantic_cells(b1, rows_per_cell=1000, min_cells=2)
    holder = {"cents": day0.localCheckpoint()}
    store = ParquetAppendLog(os.path.join(root, "index"), write_partitions=1)

    def maintenance(batch_id: int) -> None:
        if retrain and batch_id == 0:
            holder["cents"], _ = retrain_cells_at_compaction(
                spark,
                store,
                spark.createDataFrame([(i,) for i in _DRAG], "vec_id long"),
                rows_per_cell=1000,
                min_cells=2,
            )

    out_dir = os.path.join(root, "out")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    run_semantic_ingest(
        stream,
        lambda: holder["cents"],
        store,
        out_dir,
        os.path.join(root, "ckpt"),
        threshold=0.995,
        maintenance=maintenance,
    )
    return {
        r["vec_id"]: r["n_earlier_sem_dups"]
        for r in read_semantic_ingest_results(spark, out_dir).collect()
    }, store


def test_midstream_retrain_moves_the_boundary(spark, tmp_path):
    got, store = _run(spark, str(tmp_path / "with"), retrain=True)
    # the probe pairs with its mate ONLY because batch 2 folded
    # against the retrained centroids and index
    assert got.get(_PROBE_ID) == 1
    # the forgotten drag set is gone from the rewritten store
    state = store.current(spark)
    assert state.filter(F.col("vec_id").isin(*_DRAG)).count() == 0
    # and batch 2's append landed on TOP of the compacted segment
    assert state.filter(F.col("vec_id") == _PROBE_ID).count() == 1


def test_without_retrain_the_probe_misses(spark, tmp_path):
    """Control: same stream, no maintenance — the day-0 boundary keeps
    the probe and its mate apart and nothing else in the probe's cell
    reaches cosine 0.995 — including the still-stored drag set."""
    got, store = _run(spark, str(tmp_path / "without"), retrain=False)
    assert _PROBE_ID not in got
    assert store.current(spark).filter(
        F.col("vec_id").isin(*_DRAG)
    ).count() == len(_DRAG)
