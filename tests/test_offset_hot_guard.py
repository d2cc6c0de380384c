"""Hot-value guard for the offset-tolerant perceptual family
(VERDICT r12 What's-wrong #2): real media is not uniform over the
fingerprint value space — digital silence makes every position emit
``sub32 = 0`` and a black/flat frame hashes to ``dhash = 0`` — so the
offset equi-joins funnel all degenerate positions corpus-wide into one
key (|hot|² pairs). The guard stores per-value df in the lookup table
/ block-stats artifact at index build time and drops over-cap values
map-side (filter / broadcast anti-join), never per-probe aggregates.

These tests pin (a) result semantics: planted trimmed/shifted copies
still match through their CONTENT values while degenerate cross-pairs
vanish; (b) the plan: the capped probe over a PREBUILT stored artifact
adds no aggregate (audio: map-side df filter; video: one broadcast
left-anti, zero aggregates); (c) a cap without the stored artifact is
a loud ValueError, not a silent per-batch aggregate."""

import pytest
from pyspark.sql import functions as F

from dwh_spark.multimodal.audio_fp import (
    attach_subfp_df,
    audio_offset_pairs_from_subfps,
    audio_offset_vote_probe,
)
from dwh_spark.multimodal.perceptual import (
    video_block_df,
    video_offset_pairs_from_frames,
    video_offset_vote_probe,
)


def _subfp_rows(audio_id, words, start=0):
    """(audio_id, pos, sub32) rows for a word sequence."""
    return [(audio_id, start + i, w) for i, w in enumerate(words)]


def _audio_frames(spark):
    """Three stored clips + one batch clip. Every stored clip leads
    with a SILENT run (word 0 at 8 positions — 8 same-offset votes
    between ANY two clips, a false pair at min_matches=5); content words are
    disjoint per clip except the batch clip, which is clip 1's content
    trimmed by 2 positions (the head-trim copy class)."""
    content = {
        1: [101, 102, 103, 104, 105, 106, 107, 108],
        2: [201, 202, 203, 204, 205, 206, 207, 208],
        3: [301, 302, 303, 304, 305, 306, 307, 308],
    }
    index_rows = []
    for cid, words in content.items():
        index_rows += _subfp_rows(cid, [0] * 8 + words)
    # batch: head-trim of clip 1 by 2 windows — silent run shrinks to
    # 6 positions, content words survive shifted: pos_index - pos_batch = 2
    batch_rows = _subfp_rows(10, [0] * 6 + content[1])
    schema = "audio_id long, pos long, sub32 long"
    return (
        spark.createDataFrame(index_rows, schema),
        spark.createDataFrame(batch_rows, schema),
    )


def test_audio_capped_probe_semantics(spark):
    index, batch = _audio_frames(spark)
    uncapped = {
        (r["batch_id"], r["index_id"], r["offset"]): r["n_matches"]
        for r in audio_offset_vote_probe(index, batch, min_matches=5).collect()
    }
    # the silent×silent bucket creates false pairs vs clips 2 and 3:
    # 6×8 word-0 matches per pair, 6 same-offset votes at offset 0
    assert any(k[1] == 2 for k in uncapped) and any(k[1] == 3 for k in uncapped)
    stored = attach_subfp_df(index).localCheckpoint()
    capped = {
        (r["batch_id"], r["index_id"], r["offset"]): r["n_matches"]
        for r in audio_offset_vote_probe(
            stored, batch, min_matches=5, max_word_freq=3
        ).collect()
    }
    # word 0 (df=24) dropped; the true pair survives on its 8 content
    # words (df=1 each) at the head-trim offset
    assert capped == {(10, 1, 2): 8}


def test_audio_cap_without_df_raises(spark):
    index, batch = _audio_frames(spark)
    with pytest.raises(ValueError, match="stored df"):
        audio_offset_vote_probe(index, batch, max_word_freq=3)


def test_audio_capped_probe_plan_is_map_side(spark):
    """The cap over a PREBUILT with-df lookup table must add zero
    aggregates (the df aggregate ran at index build time): same
    HashAggregate count as the uncapped probe over the plain table,
    no Window node, and the df filter visible as a Filter."""
    index, batch = _audio_frames(spark)
    stored = attach_subfp_df(index).localCheckpoint()

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p_uncapped = plan(audio_offset_vote_probe(index, batch, min_matches=5))
    p_capped = plan(
        audio_offset_vote_probe(stored, batch, min_matches=5, max_word_freq=3)
    )
    assert p_capped.count("HashAggregate") == p_uncapped.count("HashAggregate")
    assert "Window" not in p_capped
    assert "df" in p_capped  # the map-side df <= cap filter


def test_audio_uncapped_over_stored_df_drops_column(spark):
    """ADVICE r12: an uncapped probe over a with-df table must not
    carry the unused df column into the join."""
    index, batch = _audio_frames(spark)
    stored = attach_subfp_df(index).localCheckpoint()
    out = audio_offset_vote_probe(stored, batch, min_matches=5)
    plain = audio_offset_vote_probe(index, batch, min_matches=5)
    got = {tuple(r) for r in out.collect()}
    assert got == {tuple(r) for r in plain.collect()}
    # the join NODE itself must not reference df (the stored column is
    # projected away before the join; the checkpoint scan below it
    # still lists df, which is fine — column pruning does not reach
    # into a checkpoint)
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_lines = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln]
    assert join_lines and all("df#" not in ln for ln in join_lines)
    # and the vote aggregate above it must not carry df either
    agg_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert all("df#" not in ln for ln in agg_lines)


def test_audio_capped_pairs_form(spark):
    """Self-join form: df computed inline when absent (corpus-wide
    run), hot word dropped from BOTH sides."""
    index, _ = _audio_frames(spark)
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in audio_offset_pairs_from_subfps(index, min_matches=5).collect()
    }
    # 8×8 word-0 matches per pair: offset 0 gets 8 votes — every
    # cross pair is a false positive without the guard
    assert uncapped == {(1, 2), (1, 3), (2, 3)}
    capped = audio_offset_pairs_from_subfps(
        index, min_matches=5, max_word_freq=3
    ).collect()
    assert capped == []  # content words are disjoint across clips


def _video_frames(spark):
    """Two stored videos + one batch video. Stored videos lead with
    4 BLACK frames (dhash 0 — every 14-bit block hot corpus-wide);
    content frames are disjoint per video except the batch video,
    which is video 1's content head-dropped by 1 frame (3 black
    survive — 3 same-offset black votes vs ANY stored video, a false
    pair at min_frames=3)."""
    # content dhashes: distinct high-entropy values per video
    c1 = [0x0123456789ABCD, 0x23456789ABCDEF, 0x3456789ABCDEF1, 0x456789ABCDEF12]
    c2 = [0x56789ABCDEF123, 0x6789ABCDEF1234, 0x789ABCDEF12345, 0x89ABCDEF123456]
    rows = []
    for vid, content in ((1, c1), (2, c2)):
        for ix, h in enumerate([0, 0, 0, 0] + content):
            rows.append((vid, ix, h))
    batch_rows = [(10, ix, h) for ix, h in enumerate([0, 0, 0] + c1)]
    schema = "video_id long, frame_ix long, dhash long"
    return (
        spark.createDataFrame(rows, schema),
        spark.createDataFrame(batch_rows, schema),
    )


def test_video_capped_probe_semantics(spark):
    index, batch = _video_frames(spark)
    uncapped = {
        (r["batch_id"], r["index_id"], r["offset"]): r["n_frames_matched"]
        for r in video_offset_vote_probe(
            index, batch, max_hamming=3, min_frames=3
        ).collect()
    }
    # black×black: 3×4 frame matches per pair, 3 votes at offsets 0
    # and 1 — video 2 is a false pair without the guard
    assert any(k[1] == 2 for k in uncapped)
    stats = video_block_df(index).localCheckpoint()
    capped = {
        (r["batch_id"], r["index_id"], r["offset"]): r["n_frames_matched"]
        for r in video_offset_vote_probe(
            index,
            batch,
            max_hamming=3,
            min_frames=3,
            max_block_freq=3,
            block_df=stats,
        ).collect()
    }
    # every block of dhash 0 has df=8 > 3 → dropped; the true pair
    # survives on its 4 content frames at the head-drop offset
    assert capped == {(10, 1, 1): 4}


def test_video_cap_without_stats_raises(spark):
    index, batch = _video_frames(spark)
    with pytest.raises(ValueError, match="video_block_df"):
        video_offset_vote_probe(index, batch, max_block_freq=3)


def test_video_capped_probe_plan_no_aggregate(spark):
    """The cap over a PREBUILT block-stats table must add zero
    aggregates and zero shuffles to the probe: one extra
    BroadcastHashJoin (the left-anti), same HashAggregate and
    Exchange counts as uncapped."""
    index, batch = _video_frames(spark)
    stats = video_block_df(index).localCheckpoint()

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p_uncapped = plan(
        video_offset_vote_probe(index, batch, max_hamming=3, min_frames=3)
    )
    p_capped = plan(
        video_offset_vote_probe(
            index, batch, max_hamming=3, min_frames=3,
            max_block_freq=3, block_df=stats,
        )
    )
    assert p_capped.count("HashAggregate") == p_uncapped.count("HashAggregate")
    # same SHUFFLE count (the hot set itself rides a BroadcastExchange)
    assert p_capped.count("Exchange hashpartitioning") == p_uncapped.count(
        "Exchange hashpartitioning"
    )
    assert "LeftAnti" in p_capped and "LeftAnti" not in p_uncapped


def test_video_capped_pairs_form(spark):
    index, _ = _video_frames(spark)
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in video_offset_pairs_from_frames(index, max_hamming=3)
        .groupBy("id_a", "id_b", (F.col("f_a") - F.col("f_b")).alias("o"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 3)
        .collect()
    }
    assert uncapped == {(1, 2)}  # black×black false pair
    capped = (
        video_offset_pairs_from_frames(index, max_hamming=3, max_block_freq=3)
        .groupBy("id_a", "id_b", (F.col("f_a") - F.col("f_b")).alias("o"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 3)
        .collect()
    )
    assert capped == []  # content frames are disjoint across videos


def _periodic_frames(spark):
    """Planted-drift fixture for the time-banded composition: two
    20-frame videos with a 4-frame PERIODIC dhash pattern (the
    degenerate-for-banding case — every value recurs at every
    multiple of the period, so the unbanded join matches at offsets
    ..., -6, -2, 2, 6, ... corpus-wide); video 2 is video 1 drifted
    by 2 frames."""
    pattern = [
        0x0F1E2D3C4B5A69,
        0x123456789ABCDE,
        0x3C4B5A69780F1E,
        0x56789ABCDEF012,
    ]
    rows = []
    for f in range(20):
        rows.append((1, f, pattern[f % 4]))
        rows.append((2, f, pattern[(f + 2) % 4]))
    return spark.createDataFrame(rows, "video_id long, frame_ix long, dhash long")


def test_video_time_band_parity_and_shrinkage(spark):
    """The banded offset join (max_offset) must equal the unbanded
    join filtered to in-band offsets — and produce strictly fewer
    frame-pair rows on periodic content (bucket shrinkage visible at
    the result level: out-of-band periodic echoes never join)."""
    frames = _periodic_frames(spark)
    unbanded = video_offset_pairs_from_frames(frames, max_hamming=3)
    banded = video_offset_pairs_from_frames(frames, max_hamming=3, max_offset=3)
    in_band = unbanded.filter(F.abs(F.col("f_a") - F.col("f_b")) <= 3)
    got = {tuple(r) for r in banded.collect()}
    want = {tuple(r) for r in in_band.collect()}
    assert got == want and got
    # periodic echoes at |offset| in {6, 10, 14, 18} are out of band
    n_all = unbanded.count()
    assert len(got) < n_all
    # the drifted copy's true offset survives the band
    offsets = {r["f_a"] - r["f_b"] for r in banded.collect()}
    assert 2 in offsets or -2 in offsets


def test_video_time_band_is_equi_join_key(spark):
    """The band must join as an EQUI key beside (i, val) — visible in
    the join node — not as a post-join filter alone."""
    frames = _periodic_frames(spark)
    banded = video_offset_pairs_from_frames(frames, max_hamming=3, max_offset=3)
    plan = banded._jdf.queryExecution().executedPlan().toString()
    join_lines = [
        ln for ln in plan.splitlines()
        if "SortMergeJoin" in ln or "BroadcastHashJoin" in ln or "ShuffledHashJoin" in ln
    ]
    assert join_lines and any("band" in ln for ln in join_lines), plan


def test_video_time_band_composes_with_cap(spark):
    """Banding and the hot-block cap stack: planted black frames drop
    via the cap, periodic echoes drop via the band, the true drifted
    offset survives both."""
    frames = _periodic_frames(spark)
    black = spark.createDataFrame(
        [(v, 100 + k, 0) for v in (1, 2) for k in range(8)],
        "video_id long, frame_ix long, dhash long",
    )
    both = frames.unionByName(black)
    stats = video_block_df(both).localCheckpoint()
    # cap between the periodic content's df (10 per block value) and
    # the black frames' (16)
    capped_banded = video_offset_pairs_from_frames(
        both, max_hamming=3, max_offset=3, max_block_freq=12, block_df=stats
    )
    rows = capped_banded.collect()
    assert rows
    # no pair row touches the black frames (dhash 0 blocks are hot:
    # df = 16 per block value > 12)
    assert all(r["h_a"] != 0 and r["h_b"] != 0 for r in rows)
    assert all(abs(r["f_a"] - r["f_b"]) <= 3 for r in rows)


def test_word_transitions_values(spark):
    """Structural low-entropy measure: silence word 0 -> 0
    transitions; the silence-boundary word 1<<31 -> 1; alternating
    sign bits (0x55555555) -> 31; real-content-like mixed words sit
    well above the default cut of 4."""
    from dwh_spark.multimodal.audio_fp import word_transitions

    rows = spark.createDataFrame(
        [(0,), (1 << 31,), (0x55555555,), (0x0F0F0F0F,), (0b1100,)],
        "sub32 long",
    ).select("sub32", word_transitions("sub32").alias("t"))
    got = {r["sub32"]: r["t"] for r in rows.collect()}
    assert got[0] == 0
    assert got[1 << 31] == 1
    assert got[0x55555555] == 31
    assert got[0x0F0F0F0F] == 7
    assert got[0b1100] == 2


def test_drop_low_entropy_words_filters_silence(spark):
    """The streaming-form guard: silence and boundary words drop
    map-side (plan shows a Filter, no aggregate, no join), content
    words survive, and the filtered pairs-form still finds the
    planted trimmed copy."""
    from dwh_spark.multimodal.audio_fp import drop_low_entropy_words

    index, batch = _audio_frames(spark)
    filtered = drop_low_entropy_words(index)
    got = {r["sub32"] for r in filtered.select("sub32").distinct().collect()}
    # word 0 and the two sub-4-transition synthetic words (103, 207)
    # drop; the rest of the 24 content words survive
    assert 0 not in got and got == {
        w for w in range(101, 109) if w not in (103,)
    } | {w for w in range(201, 209) if w not in (207,)} | set(range(301, 309))
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan and "Join" not in plan
    # pairs over the filtered frames: silence votes gone, content
    # pairs need min_matches <= surviving content overlap (7 of clip
    # 1's 8 words pass the transition cut) — cross-clip pairs vanish
    # entirely (disjoint content words)
    pairs = audio_offset_pairs_from_subfps(
        drop_low_entropy_words(index.unionByName(batch)), min_matches=5
    ).collect()
    assert {(r["id_a"], r["id_b"], r["offset"], r["n_matches"]) for r in pairs} == {
        (1, 10, 2, 7)
    }


def test_drop_low_detail_frames_filters_black(spark):
    """Black frames (dhash popcount 0) drop map-side; the filtered
    offset vote keeps only the true head-drop pair."""
    from dwh_spark.multimodal.perceptual import drop_low_detail_frames

    index, batch = _video_frames(spark)
    both = index.unionByName(batch)
    filtered = drop_low_detail_frames(both)
    assert filtered.filter(F.col("dhash") == 0).count() == 0
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan and "Join" not in plan
    got = {
        (r["id_a"], r["id_b"], r["o"])
        for r in video_offset_pairs_from_frames(filtered, max_hamming=3)
        .groupBy("id_a", "id_b", (F.col("f_a") - F.col("f_b")).alias("o"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 3)
        .collect()
    }
    assert got == {(1, 10, 1)}


def _simhash_frames(spark):
    """Index of 2 content + 4 flat fingerprints; batch of 1 content
    re-encode (identical hash) + 1 flat."""
    index = spark.createDataFrame(
        [(1, 0x0123456789ABCD), (2, 0x23456789ABCDEF),
         (3, 0), (4, 0), (5, 0), (6, 0)],
        "doc_id long, simhash long",
    )
    batch = spark.createDataFrame(
        [(10, 0x0123456789ABCD), (11, 0)], "doc_id long, simhash long"
    )
    return index, batch


def test_simhash_capped_probe_semantics_and_plan(spark):
    """The generalized hot-block guard on the shared blocked join:
    flat batch items match nothing, content matches survive; the
    capped probe over a PREBUILT stats table adds zero aggregates and
    zero shuffles (one broadcast left-anti)."""
    from dwh_spark.operators.dedup import (
        simhash_block_df,
        simhash_blocked_probe,
    )

    index, batch = _simhash_frames(spark)
    uncapped = {
        (r["batch_id"], r["index_id"])
        for r in simhash_blocked_probe(
            index, batch, n_blocks=4, block_bits=14, max_hamming=3
        ).collect()
    }
    # flat batch 11 pairs with every stored flat without the guard
    assert {(11, 3), (11, 4), (11, 5), (11, 6), (10, 1)} <= uncapped
    stats = simhash_block_df(index, n_blocks=4, block_bits=14).localCheckpoint()
    capped_df = simhash_blocked_probe(
        index, batch, n_blocks=4, block_bits=14, max_hamming=3,
        max_block_freq=3, block_df=stats,
    )
    assert {(r["batch_id"], r["index_id"]) for r in capped_df.collect()} == {(10, 1)}
    # fresh (uncollected) frames for the plan comparison: a collected
    # DataFrame's AQE plan string appends an "Initial Plan" section
    # that double-counts every node
    p_un = simhash_blocked_probe(
        index, batch, n_blocks=4, block_bits=14, max_hamming=3
    )._jdf.queryExecution().executedPlan().toString()
    p_cap = simhash_blocked_probe(
        index, batch, n_blocks=4, block_bits=14, max_hamming=3,
        max_block_freq=3, block_df=stats,
    )._jdf.queryExecution().executedPlan().toString()
    assert p_cap.count("HashAggregate") == p_un.count("HashAggregate")
    assert p_cap.count("Exchange hashpartitioning") == p_un.count(
        "Exchange hashpartitioning"
    )
    assert "LeftAnti" in p_cap and "LeftAnti" not in p_un


def test_simhash_cap_without_stats_raises(spark):
    from dwh_spark.operators.dedup import simhash_blocked_probe

    index, batch = _simhash_frames(spark)
    with pytest.raises(ValueError, match="simhash_block_df"):
        simhash_blocked_probe(
            index, batch, n_blocks=4, block_bits=14, max_block_freq=3
        )


def test_simhash_capped_pairs_inline_stats(spark):
    """Self-join form computes the stats inline when omitted (one
    bounded aggregate, corpus-wide run): flat-flat pairs vanish,
    content pairs unaffected."""
    from dwh_spark.operators.dedup import simhash_blocked_pairs

    index, _ = _simhash_frames(spark)
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in simhash_blocked_pairs(
            index, n_blocks=4, block_bits=14, max_hamming=3
        ).collect()
    }
    assert {(3, 4), (3, 5), (5, 6)} <= uncapped
    capped = {
        (r["id_a"], r["id_b"])
        for r in simhash_blocked_pairs(
            index, n_blocks=4, block_bits=14, max_hamming=3, max_block_freq=3
        ).collect()
    }
    assert capped == set()  # content hashes 1,2 differ by ~28 bits


def test_append_with_df_equals_rebuild(spark):
    """Maintenance append must equal a full attach_subfp_df rebuild
    over the union — and its plan must contain no corpus-wide
    aggregate (every groupBy input is batch-sized or
    batch-join-filtered)."""
    from dwh_spark.multimodal.audio_fp import append_with_df

    index, batch = _audio_frames(spark)
    stored = attach_subfp_df(index).localCheckpoint()
    merged = append_with_df(stored, batch)
    rebuilt = attach_subfp_df(index.unionByName(batch))
    got = {tuple(r) for r in merged.select("audio_id", "pos", "sub32", "df").collect()}
    want = {tuple(r) for r in rebuilt.select("audio_id", "pos", "sub32", "df").collect()}
    assert got == want
    # capped probe over the MERGED table == over the rebuilt table
    probe_batch = spark.createDataFrame(
        _subfp_rows(20, [0] * 6 + [101, 102, 103, 104, 105, 106, 107, 108]),
        "audio_id long, pos long, sub32 long",
    )
    a = {
        tuple(r)
        for r in audio_offset_vote_probe(
            merged, probe_batch, min_matches=5, max_word_freq=4
        ).collect()
    }
    b = {
        tuple(r)
        for r in audio_offset_vote_probe(
            rebuilt, probe_batch, min_matches=5, max_word_freq=4
        ).collect()
    }
    assert a == b


def test_append_with_df_rejects_df_batch(spark):
    """Re-appending a slice of the STORED table (already carrying df)
    must fail the contract loudly, not with an ambiguous-column
    AnalysisException deep in the join (ADVICE r13)."""
    import pytest

    from dwh_spark.multimodal.audio_fp import append_with_df

    index, _ = _audio_frames(spark)
    stored = attach_subfp_df(index)
    with pytest.raises(ValueError, match="PLAIN"):
        append_with_df(stored, stored.limit(3))


def test_merge_block_df_equals_rebuild(spark):
    from dwh_spark.multimodal.perceptual import merge_block_df

    index, batch = _video_frames(spark)
    stored = video_block_df(index).localCheckpoint()
    merged = {
        (r["i"], r["val"]): r["df"]
        for r in merge_block_df(stored, batch).collect()
    }
    rebuilt = {
        (r["i"], r["val"]): r["df"]
        for r in video_block_df(index.unionByName(batch)).collect()
    }
    assert merged == rebuilt


def test_generic_fold_min_fp_bits(spark, tmp_path):
    """run_fingerprint_ingest's stateless guard: degenerate (near-zero
    popcount) fingerprints never reach the within/cross arms NOR the
    stored index; content matches still flag."""
    import os

    from dwh_spark.streaming.ingest import ParquetAppendLog
    from dwh_spark.streaming.phash_ingest import (
        _read_results,
        run_fingerprint_ingest,
    )

    content = 0x0123456789ABCD
    rows = [
        # batch 1: one content item, two flats
        (1, content), (2, 0), (3, 0),
        # batch 2: a re-encode of item 1 (same fp), one more flat
        (11, content), (12, 0),
    ]
    input_dir = tmp_path / "input"
    input_dir.mkdir()
    spark.createDataFrame(rows[:3], "doc_id long, fp long").coalesce(1).write.parquet(
        str(tmp_path / "b1")
    )
    spark.createDataFrame(rows[3:], "doc_id long, fp long").coalesce(1).write.parquet(
        str(tmp_path / "b2")
    )
    for i, src in enumerate(["b1", "b2"], 1):
        part = next(
            f for f in os.listdir(tmp_path / src) if f.endswith(".parquet")
        )
        dst = input_dir / f"batch{i}.parquet"
        os.rename(tmp_path / src / part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    store = ParquetAppendLog(str(tmp_path / "index"), write_partitions=1)
    stream = (
        spark.readStream.schema("doc_id long, fp long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(input_dir))
    )
    run_fingerprint_ingest(
        stream,
        lambda df: df,
        store,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        key="doc_id",
        fp_col="fp",
        out_count_col="n_earlier",
        fp_bits=56,
        max_hamming=3,
        n_blocks=4,
        min_fp_bits=4,
    )
    got = {
        (r["doc_id"], r["n_earlier"])
        for r in _read_results(
            spark, str(tmp_path / "out"), ["doc_id", "n_earlier"]
        ).collect()
    }
    # only the re-encode flags its one earlier twin; flats never pair
    assert got == {(11, 1)}
    # and the stored index never held a degenerate row
    stored = store.current(spark)
    assert stored.filter(F.col("fp") == 0).count() == 0
    assert stored.count() == 2
