"""Right-to-be-forgotten for the stored modality indexes
(operators/forget.py — VERDICT r13 What's-missing #4): every forget op
is pinned EQUAL to a rebuild over corpus-minus-forgotten, including the
stored df/stats columns; probes after a forget stop matching the
forgotten item while its near-dups keep pairing with each other; and
``ParquetAppendLog.compact(transform=...)`` makes the forget durable in
storage. Plan pins: the index side is never shuffled (broadcast joins
only) and the only aggregate input is the forgotten rows themselves."""

import pytest
from pyspark.sql import functions as F

from dwh_spark.multimodal.audio_fp import attach_subfp_df, audio_offset_vote_probe
from dwh_spark.multimodal.perceptual import video_block_df
from dwh_spark.operators.dedup import (
    band_index,
    containment_posting_index,
    simhash_block_df,
)
from dwh_spark.operators.forget import (
    forget_band_index,
    forget_frame_index,
    forget_posting_index,
    forget_rows,
    forget_subfp_index,
    forget_with_df,
    ids_frame,
    shrink_block_df,
    shrink_simhash_block_df,
)


def _subfp_rows(audio_id, words, start=0):
    return [(audio_id, start + i, w) for i, w in enumerate(words)]


def _subfp_index(spark):
    """Four clips: 1 is the base, 2 and 3 are head-trim copies of 1
    (shifted content), 4 is unrelated. All share a silent run (word 0)
    so the df column is load-bearing."""
    content = [101, 102, 103, 104, 105, 106, 107, 108]
    rows = (
        _subfp_rows(1, [0] * 8 + content)
        + _subfp_rows(2, [0] * 6 + content)  # head-trim by 2
        + _subfp_rows(3, [0] * 4 + content)  # head-trim by 4
        + _subfp_rows(4, [0] * 8 + [401, 402, 403, 404, 405, 406, 407, 408])
    )
    return spark.createDataFrame(rows, "audio_id long, pos long, sub32 long")


def test_forget_subfp_index_equals_rebuild(spark):
    plain = _subfp_index(spark)
    stored = attach_subfp_df(plain).localCheckpoint()
    got = forget_subfp_index(stored, [1, 4])
    rebuilt = attach_subfp_df(plain.filter(~F.col("audio_id").isin(1, 4)))
    cols = ["audio_id", "pos", "sub32", "df"]
    assert {tuple(r) for r in got.select(cols).collect()} == {
        tuple(r) for r in rebuilt.select(cols).collect()
    }


def test_forget_subfp_plan_has_no_index_shuffle(spark):
    """The kept side reaches the output through broadcast joins only;
    the single aggregate's input is the forgotten rows (broadcast-semi
    filtered), never the corpus."""
    stored = attach_subfp_df(_subfp_index(spark)).localCheckpoint()
    plan = (
        forget_subfp_index(stored, [1])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_forget_probe_semantics(spark):
    """After forgetting clip 1: a probe carrying clip 1's content gets
    ZERO index hits, while clips 2 and 3 (its shifted near-dups) still
    pair with each other through the same content words."""
    from dwh_spark.multimodal.audio_fp import audio_offset_pairs_from_subfps

    stored = attach_subfp_df(_subfp_index(spark)).localCheckpoint()
    kept = forget_subfp_index(stored, [1]).localCheckpoint()
    ghost = _subfp_index(spark).filter(F.col("audio_id") == 1)
    hits = audio_offset_vote_probe(
        kept, ghost, min_matches=5, max_word_freq=20
    ).filter(F.col("index_id") == 1)
    assert hits.count() == 0
    survivors = {
        (r["id_a"], r["id_b"])
        for r in audio_offset_pairs_from_subfps(
            kept.drop("df"), min_matches=5
        ).collect()
    }
    assert (2, 3) in survivors


def test_forget_with_df_every_holder_of_a_value(spark):
    """Forgetting EVERY holder of a value (clips 1-3 share the content
    words; 1 and 4 share the silent run) leaves no df<=0 row — in the
    normalized layout the value's rows vanish with its holders, and the
    defensive ``df > 0`` filter guarantees the invariant regardless.
    Still equals the rebuild."""
    plain = _subfp_index(spark)
    stored = attach_subfp_df(plain).localCheckpoint()
    got = forget_subfp_index(stored, [1, 2, 3])
    assert got.filter(F.col("df") <= 0).count() == 0
    rebuilt = attach_subfp_df(plain.filter(F.col("audio_id") == 4))
    cols = ["audio_id", "pos", "sub32", "df"]
    assert {tuple(r) for r in got.select(cols).collect()} == {
        tuple(r) for r in rebuilt.select(cols).collect()
    }
    # the content words 101..108 had holders {1,2,3} only: fully gone
    assert got.filter(F.col("sub32").between(101, 108)).count() == 0


def test_forget_with_df_requires_df(spark):
    plain = _subfp_index(spark)
    with pytest.raises(ValueError, match="forget_rows"):
        forget_with_df(plain, [1], key="audio_id", value_col="sub32")


def test_forget_frame_index_and_shrink_block_df(spark):
    frames = spark.createDataFrame(
        [(v, i, h) for v in (1, 2, 3) for i, h in enumerate([0, 77, 1000 + v])],
        "video_id long, frame_ix long, dhash long",
    )
    dead = frames.filter(F.col("video_id") == 2)
    kept = forget_frame_index(frames, [2])
    stats = video_block_df(frames).localCheckpoint()
    shrunk = shrink_block_df(stats, dead)
    rebuilt = video_block_df(frames.filter(F.col("video_id") != 2))
    key = lambda df: {tuple(r) for r in df.select("i", "val", "df").collect()}
    assert key(shrunk) == key(rebuilt)
    assert kept.filter(F.col("video_id") == 2).count() == 0
    assert kept.count() == 6


def test_shrink_simhash_block_df_equals_rebuild(spark):
    sh = spark.createDataFrame(
        [(i, h) for i, h in [(1, 0), (2, 0), (3, 12345), (4, 99999)]],
        "doc_id long, simhash long",
    )
    stats = simhash_block_df(sh, n_blocks=4, block_bits=14).localCheckpoint()
    dead = sh.filter(F.col("doc_id").isin(2, 3))
    shrunk = shrink_simhash_block_df(stats, dead, n_blocks=4, block_bits=14)
    rebuilt = simhash_block_df(
        sh.filter(~F.col("doc_id").isin(2, 3)), n_blocks=4, block_bits=14
    )
    key = lambda df: {tuple(r) for r in df.select("i", "val", "df").collect()}
    assert key(shrunk) == key(rebuilt)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again"),
        (2, "the quick brown fox jumps over the lazy dog again today"),
        (3, "an entirely different document about spark joins"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_forget_posting_index_equals_rebuild(spark):
    docs = _docs(spark)
    stored = containment_posting_index(docs, with_df=True).localCheckpoint()
    got = forget_posting_index(stored, [2])
    rebuilt = containment_posting_index(
        docs.filter(F.col("doc_id") != 2), with_df=True
    )
    cols = ["h", "corpus_id", "n_c", "df"]
    assert {tuple(r) for r in got.select(cols).collect()} == {
        tuple(r) for r in rebuilt.select(cols).collect()
    }


def test_forget_band_index_equals_rebuild(spark):
    docs = _docs(spark)
    stored = band_index(docs)
    got = forget_band_index(stored, ids_frame(spark, [1, 3], "doc_id"))
    rebuilt = band_index(docs.filter(~F.col("doc_id").isin(1, 3)))
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in rebuilt.collect()
    }


def test_compact_transform_makes_forget_durable(spark, tmp_path):
    """The append-log history rewrite point: segments are immutable
    between compactions, so a forget becomes durable in storage at
    ``compact(transform=...)`` — afterwards NO segment file contains
    the forgotten id, and a second transform-compact of the single
    compacted segment still works (fresh generation name, no
    self-overwrite)."""
    import glob
    import os

    from dwh_spark.streaming.ingest import ParquetAppendLog

    log = ParquetAppendLog(str(tmp_path / "log"), write_partitions=1)
    for b in range(3):
        log.append(
            spark.range(b * 10, b * 10 + 10).select(F.col("id").alias("audio_id")),
            b,
        )
    log.compact(spark, transform=lambda df: forget_rows(df, [5, 15], "audio_id"))
    state = log.current(spark)
    assert state.count() == 28
    assert state.filter(F.col("audio_id").isin(5, 15)).count() == 0
    # every remaining parquet file is post-forget (history rewritten)
    for f in glob.glob(os.path.join(str(tmp_path / "log"), "*", "*.parquet")):
        assert spark.read.parquet(f).filter(
            F.col("audio_id").isin(5, 15)
        ).count() == 0
    man = log._read_manifest()
    assert len(man["segments"]) == 1
    # second rewrite on the single compacted segment: no name collision
    log.compact(spark, transform=lambda df: forget_rows(df, [25], "audio_id"))
    assert log.current(spark).count() == 27
    assert log.last_committed() == 2  # replay guard untouched by rewrites
