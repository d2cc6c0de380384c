"""Streaming SEMANTIC near-dup ingest — the IVF cell index as
accumulating stream state.

The embedding-space sibling of ``streaming/docs_ingest.py``: vector
batches arrive in key order; each batch assigns itself against the
FIXED broadcast centroids (trained once, before the stream — the
day-0 training shape), probes the STORED cell index for cross-batch
semantic near-dups, flags within-batch earlier mates off its own
assignment frame, then appends its assignments to the index store
under the high-water replay guard. Because batches are id-ordered,
"stored index ∪ smaller-id batch mates" is exactly "all earlier
vectors", so the drained output equals the batch within-cell
earlier-partners oracle — stream/batch parity, the repo-wide
streaming claim.

Crash semantics match the MinHash ingest: per-batch results land in a
VERSIONED output dir (``out/batch=<id>``, overwrite mode) BEFORE the
index append commits, so a crash in the window replays the batch into
the same dir idempotently; the index append is the completion marker.

At 100 TB the index store is a table PARTITIONED BY cell (each ingest
appends O(batch) rows; the probe reads only probed cells' partitions)
and the centroids are the ``train_semantic_cells`` output refreshed
offline — the fold never retrains.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_spark.operators.similarity import assign_cells, cell_probe
from dwh_spark.streaming.ingest import ParquetAppendLog


def run_semantic_ingest(
    stream: DataFrame,
    centroids: DataFrame,
    index_store: ParquetAppendLog,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.1,
    maintenance=None,
) -> None:
    """Drain the id-ordered vector stream, flagging each vector's
    earlier within-cell semantic near-dup partners. ``stream`` needs
    (vec_id, embedding); ``centroids`` is the fixed (vec_id,
    embedding) centroid frame. ``maintenance`` is the same
    housekeeping seam as the MinHash ingest (compact/expire on the
    index store after each batch commit)."""
    spark = stream.sparkSession

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # high-water replay guard (index append commits LAST = marker)
        lc = index_store.last_committed()
        if lc is not None and batch_id <= lc:
            return
        # assignment feeds three consumers (within-batch probe both
        # sides + the index probe + the store append): persist so the
        # centroid cross-score runs once per batch
        batch_cells = assign_cells(
            batch_df.select("vec_id", "embedding"), centroids
        ).persist()
        prior = index_store.current(spark)
        flagged = cell_probe(batch_cells, batch_cells, threshold).filter(
            F.col("corpus_id") < F.col("new_id")
        )
        if prior is not None:
            # cell-pruned probe: the batch's distinct cell ids (a
            # bounded literal IN list) filter the stored-index SCAN —
            # with a cell-partitioned/sorted index table this is
            # partition pruning, so the fold reads only probed cells
            probed = [
                r["cell"] for r in batch_cells.select("cell").distinct().collect()
            ]
            pruned = prior.filter(F.col("cell").isin(probed))
            flagged = flagged.unionByName(cell_probe(pruned, batch_cells, threshold))
        flagged.groupBy(F.col("new_id").alias("vec_id")).agg(
            F.count("*").alias("n_earlier_sem_dups")
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        # append-only: O(batch) index rows per ingest, history never
        # rewritten
        index_store.append(batch_cells, batch_id)
        batch_cells.unpersist()
        if maintenance is not None:
            maintenance(batch_id)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_semantic_ingest_results(spark: SparkSession, out_dir: str) -> DataFrame:
    """All drained (vec_id, n_earlier_sem_dups) rows across batches."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*")
    ).select("vec_id", "n_earlier_sem_dups")
