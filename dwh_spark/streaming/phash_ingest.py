"""Streaming PERCEPTUAL near-dup ingest — fingerprint indexes as
accumulating stream state, one fold shared by the image and audio
modalities.

The sibling of ``streaming/docs_ingest.py`` (MinHash bands) and
``streaming/emb_ingest.py`` (IVF cells), completing the ladder for the
perceptual dedup families: media batches arrive in key order; each
batch is decoded ONCE (Arrow mapInPandas → a 56-bit fingerprint: image
dHash or audio energy hash), flags within-batch earlier mates off its
own fingerprint frame, probes the STORED fingerprint index for
cross-batch re-encodes/resizes/gain-changes/near-edits (batch blocks
BROADCAST into the index — operators/dedup.py:simhash_blocked_probe),
then appends its O(batch) fingerprint rows under the high-water replay
guard. Id-ordered batches make "stored index ∪ smaller-id batch mates"
exactly "all earlier items", so the drained output equals the batch
earlier-partners oracle — stream/batch parity, the repo-wide streaming
claim.

The fold is GENERIC over the fingerprint function (``fp_fn``: media
batch → (key, fingerprint) frame): ``run_phash_ingest`` (images) and
``run_audio_fp_ingest`` (audio clips) are thin bindings, so the crash
semantics, replay guard, and index discipline are written — and
tested — once. Crash semantics match the sibling ingests: per-batch
results land in a VERSIONED output dir (``out/batch=<id>``, overwrite)
BEFORE the index append commits; the append is the completion marker.

At 100 TB the fingerprint index is 16 bytes/item — a billion items is
~16 GB, scanned once per ingest batch and never shuffled; the decode
cost lives entirely on the new batch. Reference parity:
x/imgresizer/resizer.go:137-174 asks the blob store "exists?" per
item — this is the same skip-if-seen discipline with a perceptual key
instead of a byte hash.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_spark.multimodal.audio_fp import AUDIO_FP_BITS, audio_fp_frame
from dwh_spark.multimodal.perceptual import DHASH_BITS, dhash_frame
from dwh_spark.operators.dedup import simhash_blocked_pairs, simhash_blocked_probe
from dwh_spark.streaming.ingest import ParquetAppendLog


def run_fingerprint_ingest(
    stream: DataFrame,
    fp_fn: Callable[[DataFrame], DataFrame],
    index_store: ParquetAppendLog,
    out_dir: str,
    checkpoint_dir: str,
    key: str,
    fp_col: str,
    out_count_col: str,
    fp_bits: int = 56,
    max_hamming: int = 3,
    n_blocks: int = 4,
    maintenance=None,
) -> None:
    """Drain an id-ordered media stream, flagging each item's earlier
    perceptual near-dup partners. ``fp_fn`` maps the raw batch frame to
    (key, fp_col); ``maintenance`` is the same housekeeping seam as the
    sibling ingests (compact/expire on the index store after each batch
    commit)."""
    spark = stream.sparkSession
    block_bits = fp_bits // n_blocks

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # high-water replay guard (index append commits LAST = marker)
        lc = index_store.last_committed()
        if lc is not None and batch_id <= lc:
            return
        # one decode pass feeds three consumers (within-batch pairs,
        # the index probe, the store append): persist the slim
        # (key, fingerprint) frame, never the media bytes
        batch_fps = fp_fn(batch_df).persist()
        sh = batch_fps.select(
            F.col(key).alias("doc_id"), F.col(fp_col).alias("simhash")
        )
        within = simhash_blocked_pairs(
            sh, key="doc_id", n_blocks=n_blocks,
            block_bits=block_bits, max_hamming=max_hamming,
        ).select(F.col("id_b").alias(key))
        prior = index_store.current(spark)
        flagged = within
        if prior is not None:
            crossb = simhash_blocked_probe(
                prior.select(
                    F.col(key).alias("doc_id"), F.col(fp_col).alias("simhash")
                ),
                sh,
                key="doc_id",
                n_blocks=n_blocks,
                block_bits=block_bits,
                max_hamming=max_hamming,
            ).select(F.col("batch_id").alias(key))
            flagged = flagged.unionByName(crossb)
        flagged.groupBy(key).agg(
            F.count("*").alias(out_count_col)
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        # append-only: O(batch) fingerprint rows, history never
        # rewritten
        index_store.append(batch_fps, batch_id)
        batch_fps.unpersist()
        if maintenance is not None:
            maintenance(batch_id)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_phash_ingest(
    stream: DataFrame,
    index_store: ParquetAppendLog,
    out_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    n_blocks: int = 4,
    maintenance=None,
) -> None:
    """Image binding: (image_id, format, content) stream → dHash index
    + per-batch (image_id, n_earlier_pdups) results."""
    run_fingerprint_ingest(
        stream,
        dhash_frame,
        index_store,
        out_dir,
        checkpoint_dir,
        key="image_id",
        fp_col="dhash",
        out_count_col="n_earlier_pdups",
        fp_bits=DHASH_BITS,
        max_hamming=max_hamming,
        n_blocks=n_blocks,
        maintenance=maintenance,
    )


def read_phash_ingest_results(spark: SparkSession, out_dir: str) -> DataFrame:
    """All drained (image_id, n_earlier_pdups) rows across batches."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*")
    ).select("image_id", "n_earlier_pdups")


def run_audio_fp_ingest(
    stream: DataFrame,
    index_store: ParquetAppendLog,
    out_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    n_blocks: int = 4,
    maintenance=None,
) -> None:
    """Audio binding: (audio_id, content) WAV stream → energy-hash
    index + per-batch (audio_id, n_earlier_adups) results."""
    run_fingerprint_ingest(
        stream,
        audio_fp_frame,
        index_store,
        out_dir,
        checkpoint_dir,
        key="audio_id",
        fp_col="afp",
        out_count_col="n_earlier_adups",
        fp_bits=AUDIO_FP_BITS,
        max_hamming=max_hamming,
        n_blocks=n_blocks,
        maintenance=maintenance,
    )


def read_audio_fp_ingest_results(spark: SparkSession, out_dir: str) -> DataFrame:
    """All drained (audio_id, n_earlier_adups) rows across batches."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*")
    ).select("audio_id", "n_earlier_adups")


def run_video_phash_ingest(
    stream: DataFrame,
    index_store: ParquetAppendLog,
    out_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    n_blocks: int = 4,
    min_frames: int = 3,
    maintenance=None,
) -> None:
    """Video binding with per-frame VOTING (a video pairs when ≥
    ``min_frames`` temporally-aligned frames match): the index store
    accumulates (video_id, frame_ix, dhash) rows — 16 bytes/frame; each
    batch decodes only itself (one Arrow pass, blobs never exploded),
    votes within-batch off its own frame fingerprints, probes the
    stored per-frame index with its blocks broadcast
    (multimodal/perceptual.py:video_perceptual_incremental_ingest),
    then appends under the same high-water replay guard as the generic
    fold. Output per batch: (video_id, n_earlier_vdups)."""
    from dwh_spark.multimodal.perceptual import (
        video_dhash_frames,
        video_frame_vote_probe,
    )

    spark = stream.sparkSession

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        lc = index_store.last_committed()
        if lc is not None and batch_id <= lc:
            return
        batch_frames = video_dhash_frames(batch_df).persist()
        # within-batch earlier mates: the same vote probe with the
        # batch as BOTH sides — keep index_id < batch_id pairs (the
        # probe keeps self-pairs and both directions; earlier-mates
        # semantics filters one direction, as the cell probes do)
        within = (
            video_frame_vote_probe(
                batch_frames, batch_frames,
                max_hamming=max_hamming, n_blocks=n_blocks,
                min_frames=min_frames,
            )
            .filter(F.col("index_id") < F.col("batch_id"))
            .select(F.col("batch_id").alias("video_id"))
        )
        prior = index_store.current(spark)
        flagged = within
        if prior is not None:
            cross = video_frame_vote_probe(
                prior, batch_frames,
                max_hamming=max_hamming, n_blocks=n_blocks,
                min_frames=min_frames,
            ).select(F.col("batch_id").alias("video_id"))
            flagged = flagged.unionByName(cross)
        flagged.groupBy("video_id").agg(
            F.count("*").alias("n_earlier_vdups")
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        index_store.append(batch_frames, batch_id)
        batch_frames.unpersist()
        if maintenance is not None:
            maintenance(batch_id)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_video_phash_ingest_results(spark: SparkSession, out_dir: str) -> DataFrame:
    """All drained (video_id, n_earlier_vdups) rows across batches."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*")
    ).select("video_id", "n_earlier_vdups")


def run_audio_offset_ingest(
    stream: DataFrame,
    index_store: ParquetAppendLog,
    out_dir: str,
    checkpoint_dir: str,
    min_matches: int = 5,
    maintenance=None,
) -> None:
    """OFFSET-TOLERANT audio binding: the stored state is the
    Haitsma-Kalker subfingerprint LOOKUP TABLE ((audio_id, pos, sub32)
    — ~12 bytes/position, the audio analog of the per-frame video
    index), so the stream catches TRIMMED/time-shifted earlier copies
    the whole-clip hash misses by construction. Each batch decodes
    only itself (one Arrow pass → subfingerprints), votes within-batch
    by self-probing its own words, probes the stored table with its
    words broadcast (multimodal/audio_fp.py:audio_offset_vote_probe),
    then appends O(batch positions) rows under the same high-water
    replay guard as the generic fold. Output per batch:
    (audio_id, n_earlier_odups) — distinct earlier partners with >=
    ``min_matches`` word matches at one consistent offset."""
    from dwh_spark.multimodal.audio_fp import (
        audio_offset_vote_probe,
        audio_subfingerprint_frame,
    )

    spark = stream.sparkSession

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        lc = index_store.last_committed()
        if lc is not None and batch_id <= lc:
            return
        batch_subfps = audio_subfingerprint_frame(batch_df).persist()
        # a pair can qualify at more than one offset — count PARTNERS,
        # not qualifying (pair, offset) rows
        within = (
            audio_offset_vote_probe(
                batch_subfps, batch_subfps, min_matches=min_matches
            )
            .filter(F.col("index_id") < F.col("batch_id"))
            .select(F.col("batch_id").alias("audio_id"), "index_id")
            .distinct()
        )
        prior = index_store.current(spark)
        flagged = within
        if prior is not None:
            cross = (
                audio_offset_vote_probe(
                    prior, batch_subfps, min_matches=min_matches
                )
                .select(F.col("batch_id").alias("audio_id"), "index_id")
                .distinct()
            )
            flagged = flagged.unionByName(cross)
        flagged.groupBy("audio_id").agg(
            F.count("*").alias("n_earlier_odups")
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        index_store.append(batch_subfps, batch_id)
        batch_subfps.unpersist()
        if maintenance is not None:
            maintenance(batch_id)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_audio_offset_ingest_results(spark: SparkSession, out_dir: str) -> DataFrame:
    """All drained (audio_id, n_earlier_odups) rows across batches."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*")
    ).select("audio_id", "n_earlier_odups")


def run_video_offset_ingest(
    stream: DataFrame,
    index_store: ParquetAppendLog,
    out_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    n_blocks: int = 4,
    min_frames: int = 3,
    maintenance=None,
) -> None:
    """OFFSET-TOLERANT video binding — run_video_phash_ingest with the
    relative-offset vote probe substituted
    (multimodal/perceptual.py:video_offset_vote_probe), so the stream
    flags earlier HEAD-DROPPED / time-shifted copies the aligned fold
    misses by construction. Same index store (per-frame 16-byte rows),
    same decode-once/broadcast-probe/replay-guard discipline. Output
    per batch: (video_id, n_earlier_ovdups) — distinct earlier
    partners with >= ``min_frames`` frame matches at one consistent
    offset."""
    from dwh_spark.multimodal.perceptual import (
        video_dhash_frames,
        video_offset_vote_probe,
    )

    spark = stream.sparkSession

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        lc = index_store.last_committed()
        if lc is not None and batch_id <= lc:
            return
        batch_frames = video_dhash_frames(batch_df).persist()
        # a pair can qualify at more than one offset — count PARTNERS
        within = (
            video_offset_vote_probe(
                batch_frames, batch_frames,
                max_hamming=max_hamming, n_blocks=n_blocks,
                min_frames=min_frames,
            )
            .filter(F.col("index_id") < F.col("batch_id"))
            .select(F.col("batch_id").alias("video_id"), "index_id")
            .distinct()
        )
        prior = index_store.current(spark)
        flagged = within
        if prior is not None:
            cross = (
                video_offset_vote_probe(
                    prior, batch_frames,
                    max_hamming=max_hamming, n_blocks=n_blocks,
                    min_frames=min_frames,
                )
                .select(F.col("batch_id").alias("video_id"), "index_id")
                .distinct()
            )
            flagged = flagged.unionByName(cross)
        flagged.groupBy("video_id").agg(
            F.count("*").alias("n_earlier_ovdups")
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        index_store.append(batch_frames, batch_id)
        batch_frames.unpersist()
        if maintenance is not None:
            maintenance(batch_id)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_video_offset_ingest_results(spark: SparkSession, out_dir: str) -> DataFrame:
    """All drained (video_id, n_earlier_ovdups) rows across batches."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*")
    ).select("video_id", "n_earlier_ovdups")
