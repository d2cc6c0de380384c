"""The streaming df-cap composed via the compaction seam
(streaming/phash_ingest.py:WordDfCapMaintenance — VERDICT r13 next
#4): a corpus-hot but HIGH-ENTROPY word passes the stateless entropy
guard, accumulates df across batches in the stats log, is dropped from
every probe/append once over the cap, and is REWRITTEN OUT of stored
history at compaction. Output is invariant to the compaction cadence
(the per-batch hot filter does the correctness work)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from dwh_spark.multimodal.audio import wav_encode
from dwh_spark.multimodal.audio_fp import (
    drop_low_entropy_words,
    subfingerprints,
)
from dwh_spark.streaming.ingest import ParquetAppendLog
from dwh_spark.streaming.phash_ingest import (
    read_audio_offset_ingest_results,
    run_audio_offset_cap_ingest,
)

J = np.arange(64, dtype=np.int64)


def _win(tag: str) -> np.ndarray:
    # md5 per (unit, window) — a linear seed progression makes every
    # clip a phase shift of ONE cyclic amplitude sequence and every
    # word a rotation of its neighbors (the fixture-decorrelation
    # trap; FIXTURES.md discipline)
    import hashlib

    a = int(hashlib.md5(tag.encode()).hexdigest()[:4], 16) % 2048
    return (a + J * 13) % 2048 - 1024


_JINGLE = np.concatenate([_win(f"tj:{w}") for w in range(40)]).astype(np.int16)


def _content(clip: int, skip: int = 0, n: int = 40) -> np.ndarray:
    return np.concatenate(
        [_win(f"tc:{clip}:{w}") for w in range(skip, skip + n)]
    ).astype(np.int16)


def _clips():
    """Six jingled clips (ids 1..6) + a jingle-FREE head-trimmed copy
    of clip 1's content (id 7) — batches [1,2], [3,4], [5,7]."""
    rows = {
        i: wav_encode(
            np.concatenate([_JINGLE, _content(i)]).astype(np.int16), 1000
        )
        for i in range(1, 7)
    }
    # 37 windows -> 36 sign bits -> 5 subfingerprint words, matching
    # clip 1's all-content words at one offset: exactly min_matches
    rows[7] = wav_encode(_content(1, skip=3, n=37), 1000)
    return rows


def test_jingle_words_pass_entropy_guard(spark):
    """The composition's premise: the planted hot words are
    structurally indistinguishable from content — the stateless guard
    keeps ALL of them."""
    subs = subfingerprints(_JINGLE)
    df = spark.createDataFrame(
        [(1, p, w) for p, w in subs], "audio_id long, pos long, sub32 long"
    )
    assert drop_low_entropy_words(df, 4).count() == len(subs)


def _run(spark, tmp_path, compact_every):
    root = str(tmp_path / f"cap_{compact_every}")
    input_dir = os.path.join(root, "input")
    os.makedirs(input_dir)
    clips = _clips()
    batches = [[1, 2], [3, 4], [5, 7]]
    for i, ids in enumerate(batches):
        spark.createDataFrame(
            [(k, bytearray(clips[k])) for k in ids],
            "audio_id long, content binary",
        ).coalesce(1).write.parquet(os.path.join(root, f"stage{i}"))
        part = next(
            f
            for f in os.listdir(os.path.join(root, f"stage{i}"))
            if f.endswith(".parquet")
        )
        dst = os.path.join(input_dir, f"batch{i}.parquet")
        os.rename(os.path.join(root, f"stage{i}", part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    index_store = ParquetAppendLog(os.path.join(root, "index"), write_partitions=1)
    stats_store = ParquetAppendLog(os.path.join(root, "stats"), write_partitions=1)
    out_dir = os.path.join(root, "out")
    stream = (
        spark.readStream.schema("audio_id long, content binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    run_audio_offset_cap_ingest(
        stream,
        index_store,
        stats_store,
        out_dir,
        os.path.join(root, "ckpt"),
        min_matches=5,
        min_word_transitions=4,
        max_word_freq=1,
        compact_every=compact_every,
    )
    out = {
        r["audio_id"]: r["n_earlier_odups"]
        for r in read_audio_offset_ingest_results(spark, out_dir).collect()
    }
    return out, index_store, stats_store


def test_cap_compaction_end_to_end(spark, tmp_path):
    out, index_store, stats_store = _run(spark, tmp_path, compact_every=2)
    # batch 1: hot set still empty — the jingle pairs clips 1,2 (the
    # stated warm-up: df must accumulate before the cap can see it)
    assert out.get(2) == 1
    # batches 2,3: jingle words are over the cap (df 2 > 1) — no
    # jingled clip pairs through them anymore
    assert 3 not in out and 4 not in out and 5 not in out
    # ...while the genuine head-trim copy still flags its earlier base
    assert out.get(7) == 1
    # compaction rewrote the hot words OUT of stored history: none of
    # the 8 all-jingle words survives anywhere in the index store
    jingle_words = {w for p, w in subfingerprints(_JINGLE) if p <= 7}
    state = index_store.current(spark)
    assert (
        state.filter(F.col("sub32").isin(*jingle_words)).count() == 0
    )
    # the stats log still REMEMBERS them over the cap (df freezes at
    # its crossing value; re-appearances stay dropped at every future
    # compaction)
    stats = (
        stats_store.current(spark)
        .groupBy("sub32")
        .agg(F.sum("df").alias("df"))
    )
    hot = {
        r["sub32"]
        for r in stats.filter(F.col("df") > 1).collect()
    }
    assert jingle_words <= hot


def test_output_invariant_to_compaction_cadence(spark, tmp_path):
    """Compaction only shrinks stored state — the drained output with
    mid-run compaction equals the never-compacted run's (the hot
    filter on the batch side is what enforces the cap)."""
    out_c, _, _ = _run(spark, tmp_path, compact_every=2)
    out_n, index_store, _ = _run(spark, tmp_path, compact_every=None)
    assert out_c == out_n
    # without compaction the warm-up rows are still stored...
    jingle_words = {w for p, w in subfingerprints(_JINGLE) if p <= 7}
    state = index_store.current(spark)
    assert state.filter(F.col("sub32").isin(*jingle_words)).count() > 0


def test_auto_cap_self_calibrates(spark, tmp_path):
    """max_word_freq='auto': the cap is read off the stats log with
    calibrate_cap at every hot-set evaluation — with 12 jingled clips
    per batch the natural band (md5-distinct content, df ~1-2) puts
    the auto cap at margin x q99 ~= 8, the jingle words land at df=12
    after batch 1 and are capped from batch 2 on, with NO hand-set
    threshold anywhere."""
    root = str(tmp_path / "auto")
    input_dir = os.path.join(root, "input")
    os.makedirs(input_dir)
    # 200 content windows per clip: the ~20 degenerate values (8
    # all-jingle words + the boundary family) must be < 1% of distinct
    # words for q99 to sit in the NATURAL band — the calibration
    # assumption, which real value spaces satisfy by orders of
    # magnitude
    clips = {
        i: wav_encode(
            np.concatenate([_JINGLE, _content(i, n=200)]).astype(np.int16),
            1000,
        )
        for i in range(1, 37)
    }
    clips[99] = wav_encode(_content(1, skip=3, n=37), 1000)  # genuine copy
    batches = [list(range(1, 13)), list(range(13, 25)), list(range(25, 37)) + [99]]
    for i, ids in enumerate(batches):
        spark.createDataFrame(
            [(k, bytearray(clips[k])) for k in ids],
            "audio_id long, content binary",
        ).coalesce(1).write.parquet(os.path.join(root, f"stage{i}"))
        part = next(
            f
            for f in os.listdir(os.path.join(root, f"stage{i}"))
            if f.endswith(".parquet")
        )
        dst = os.path.join(input_dir, f"batch{i}.parquet")
        os.rename(os.path.join(root, f"stage{i}", part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    index_store = ParquetAppendLog(os.path.join(root, "index"), write_partitions=1)
    stats_store = ParquetAppendLog(os.path.join(root, "stats"), write_partitions=1)
    out_dir = os.path.join(root, "out")
    stream = (
        spark.readStream.schema("audio_id long, content binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    run_audio_offset_cap_ingest(
        stream,
        index_store,
        stats_store,
        out_dir,
        os.path.join(root, "ckpt"),
        min_matches=5,
        min_word_transitions=4,
        max_word_freq="auto",
        compact_every=2,
    )
    out = {
        r["audio_id"]: r["n_earlier_odups"]
        for r in read_audio_offset_ingest_results(spark, out_dir).collect()
    }
    # batch 1: no stats yet — jingle all-pairs (clip k has k-1 earlier)
    assert out[2] == 1 and out[12] == 11
    # batches 2-3: the 12-df all-jingle words sit over the auto cap —
    # an UNCAPPED jingle would give every later clip >= 12 earlier
    # partners; what remains is the thin tail of boundary-family words
    # still under the cap (df ~ jingled/2^k — the cumulative-crossing
    # class), worth a couple of sporadic pairs at most
    assert all(out.get(k, 0) < 5 for k in range(13, 37)), {
        k: v for k, v in out.items() if 13 <= k <= 36
    }
    assert sum(out.get(k, 0) for k in range(13, 37)) <= 12
    # ...and the genuine copy still flags base 1
    assert out.get(99) == 1
