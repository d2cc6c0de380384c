"""Perceptual AUDIO near-duplicate detection (energy-difference hash).

The audio twin of ``multimodal/perceptual.py``'s image dHash, closing
the same gap for the audio modality: content-md5 dedup misses every
re-encode, container rewrap, and amplitude change of the same
recording. The fingerprint is the classic energy-difference sign hash
(the core of Haitsma & Kalker 2002's audio fingerprint, reduced to one
band): decode → 57 equal time windows → integer energy (sum of squared
samples) per window → one bit per consecutive-window comparison
(bit w = energy[w+1] > energy[w]) = 56 bits.

56 bits keeps every ``1 << w`` term inside a signed 64-bit long (the
same DuckDB-overflow reasoning as the image dHash and the 60-bit
SimHash), and the energies are EXACT int64 arithmetic — no floats
anywhere — so the fingerprint is engine-portable bit-for-bit. Exact
amplitude scaling (gain that doesn't clip) multiplies every energy by
the same constant and preserves every comparison, so a gain-changed
copy fingerprints identically; a localized edit disturbs at most the
two comparisons touching the edited window.

Scale: fingerprinting is one Arrow ``mapInPandas`` decode pass
(embarrassingly parallel); pairing reuses the permute-and-reblock
pigeonhole join (operators/dedup.py:simhash_blocked_pairs) with
4×14-bit blocks — full recall at hamming ≤ 3, never all-pairs — and
the ingest probe broadcasts the batch's blocks into the stored
fingerprint index exactly like the image path.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dwh_spark.operators.dedup import simhash_blocked_pairs

AUDIO_FP_BITS = 56
_N_WINDOWS = 57  # 56 consecutive-window comparisons

AUDIO_FP_SCHEMA = "audio_id long, afp long"


def energy_fp56(samples: np.ndarray) -> int:
    """56-bit energy-difference fingerprint of mono int16 samples:
    57 equal windows (trailing remainder samples ignored), integer
    energy per window, bit w set iff energy[w+1] > energy[w]. All
    arithmetic is exact int64 — reproducible in ANSI SQL."""
    flat = np.asarray(samples).reshape(-1).astype(np.int64)
    win = len(flat) // _N_WINDOWS
    if win == 0:
        return 0
    trimmed = flat[: win * _N_WINDOWS].reshape(_N_WINDOWS, win)
    sq = (trimmed * trimmed).sum(axis=1)
    h = 0
    for w in range(_N_WINDOWS - 1):
        if sq[w + 1] > sq[w]:
            h |= 1 << w
    return h


def audio_fp_frame(
    audio: DataFrame, key: str = "audio_id", content_col: str = "content"
) -> DataFrame:
    """(key, afp) via one Arrow mapInPandas pass over (key, content)
    WAV rows — real container/codec decode, no byte-level shortcut."""

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        from dwh_spark.multimodal.audio import wav_decode

        for pdf in batches:
            out = []
            for k, c in zip(pdf[key], pdf[content_col]):
                samples, _rate = wav_decode(bytes(c))
                out.append((int(k), energy_fp56(samples)))
            yield pd.DataFrame(out, columns=["audio_id", "afp"])

    return audio.select(key, content_col).mapInPandas(run, AUDIO_FP_SCHEMA)


def audio_fp_near_dup_pairs(
    audio: DataFrame,
    key: str = "audio_id",
    content_col: str = "content",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Audio near-dup pairs (id_a, id_b, hamming): fingerprint each
    clip, then the pigeonhole blocked join — 14-bit blocks over the
    56-bit fingerprint, full recall at hamming ≤ n_blocks-1.
    All-pairs appears nowhere; the brute-force form exists only in
    the DuckDB oracle."""
    fp = audio_fp_frame(audio, key, content_col).select(
        F.col("audio_id"), F.col("afp").alias("simhash")
    )
    return simhash_blocked_pairs(
        fp,
        key="audio_id",
        n_blocks=n_blocks,
        block_bits=AUDIO_FP_BITS // n_blocks,
        max_hamming=max_hamming,
    )


def audio_fp_incremental_ingest(
    index_fps: DataFrame,
    new_audio: DataFrame,
    key: str = "audio_id",
    content_col: str = "content",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Ingest-time audio screen: which clips of a new batch are gain
    changes / re-encodes / near-edits of something already in the
    corpus — the audio twin of
    perceptual.py:perceptual_incremental_ingest, same discipline: the
    STORED (audio_id, afp) fingerprint index (16 bytes/clip, built
    once at each clip's own ingest) is scanned once and never
    shuffled; only the NEW batch is decoded, and its blocks are
    BROADCAST into the index via the shared asymmetric probe. Returns
    (batch_id, index_id, hamming)."""
    from dwh_spark.operators.dedup import simhash_blocked_probe

    batch_fps = audio_fp_frame(new_audio, key, content_col).select(
        F.col("audio_id"), F.col("afp").alias("simhash")
    )
    return simhash_blocked_probe(
        index_fps.select(F.col(key).alias("audio_id"), F.col("afp").alias("simhash"))
        if "afp" in index_fps.columns
        else index_fps,
        batch_fps,
        key="audio_id",
        n_blocks=n_blocks,
        block_bits=AUDIO_FP_BITS // n_blocks,
        max_hamming=max_hamming,
    )
