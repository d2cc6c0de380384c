"""Streaming PERCEPTUAL near-dup ingest — the dHash fingerprint index
as accumulating stream state.

The image-space sibling of ``streaming/docs_ingest.py`` (MinHash bands)
and ``streaming/emb_ingest.py`` (IVF cells), completing the ladder for
the third dedup family: image batches arrive in key order; each batch
is decoded ONCE (Arrow mapInPandas → 56-bit dHash), flags within-batch
earlier perceptual mates off its own fingerprint frame, probes the
STORED fingerprint index for cross-batch re-encodes/resizes/near-edits
(batch blocks BROADCAST into the index —
operators/dedup.py:simhash_blocked_probe), then appends its O(batch)
fingerprint rows under the high-water replay guard. Id-ordered batches
make "stored index ∪ smaller-id batch mates" exactly "all earlier
images", so the drained output equals the batch earlier-partners
oracle — stream/batch parity, the repo-wide streaming claim.

Crash semantics match the sibling ingests: per-batch results land in a
VERSIONED output dir (``out/batch=<id>``, overwrite) BEFORE the index
append commits; the append is the completion marker.

At 100 TB the fingerprint index is 16 bytes/image (id + hash) — a
billion images is ~16 GB, scanned once per ingest batch and never
shuffled; the decode cost lives entirely on the new batch. Reference
parity: x/imgresizer/resizer.go:137-174 asks the blob store
"exists?" per item — this is the same skip-if-seen discipline with a
perceptual key instead of a byte hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_spark.multimodal.perceptual import DHASH_BITS, dhash_frame
from dwh_spark.operators.dedup import simhash_blocked_pairs, simhash_blocked_probe
from dwh_spark.streaming.ingest import ParquetAppendLog


def run_phash_ingest(
    stream: DataFrame,
    index_store: ParquetAppendLog,
    out_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    n_blocks: int = 4,
    maintenance=None,
) -> None:
    """Drain the id-ordered image stream, flagging each image's earlier
    perceptual near-dup partners. ``stream`` needs (image_id, format,
    content); ``maintenance`` is the same housekeeping seam as the
    sibling ingests (compact/expire on the index store after each
    batch commit)."""
    spark = stream.sparkSession
    block_bits = DHASH_BITS // n_blocks

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # high-water replay guard (index append commits LAST = marker)
        lc = index_store.last_committed()
        if lc is not None and batch_id <= lc:
            return
        # one decode pass feeds three consumers (within-batch pairs,
        # the index probe, the store append): persist the slim
        # (image_id, dhash) frame, never the pixels
        batch_hashes = dhash_frame(batch_df).persist()
        sh = batch_hashes.select("image_id", F.col("dhash").alias("simhash"))
        within = simhash_blocked_pairs(
            sh, key="image_id", n_blocks=n_blocks,
            block_bits=block_bits, max_hamming=max_hamming,
        ).select(F.col("id_b").alias("image_id"))
        prior = index_store.current(spark)
        flagged = within
        if prior is not None:
            crossb = simhash_blocked_probe(
                prior.select("image_id", F.col("dhash").alias("simhash")),
                sh,
                key="image_id",
                n_blocks=n_blocks,
                block_bits=block_bits,
                max_hamming=max_hamming,
            ).select(F.col("batch_id").alias("image_id"))
            flagged = flagged.unionByName(crossb)
        flagged.groupBy("image_id").agg(
            F.count("*").alias("n_earlier_pdups")
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        # append-only: O(batch) fingerprint rows, history never
        # rewritten
        index_store.append(batch_hashes, batch_id)
        batch_hashes.unpersist()
        if maintenance is not None:
            maintenance(batch_id)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_phash_ingest_results(spark: SparkSession, out_dir: str) -> DataFrame:
    """All drained (image_id, n_earlier_pdups) rows across batches."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*")
    ).select("image_id", "n_earlier_pdups")
