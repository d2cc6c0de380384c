"""Perceptual dHash: decode-robustness and blocking properties.

The operator's value claim is invariance under re-encode and
integer-factor resize, plus pigeonhole-complete pairing — each pinned
here on real codec bytes (no fixture arithmetic shortcuts).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dwh_spark.multimodal import codecs
from dwh_spark.multimodal.perceptual import (
    area_downscale,
    dhash56,
    decode_pixels,
    perceptual_near_dup_pairs,
)


def _pattern(seed: int, w: int = 8, h: int = 8) -> np.ndarray:
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 2, (h, w), np.uint8)
    rgb = np.where(g[:, :, None] == 1, 200, 50).astype(np.uint8)
    return np.repeat(rgb, 3, axis=2)


def test_dhash_invariant_under_reencode_and_upscale():
    img = _pattern(7)
    h0 = dhash56(img)
    assert h0 == dhash56(codecs.png_decode(codecs.png_encode(img)))
    assert h0 == dhash56(codecs.bmp_decode(codecs.bmp_encode(img)))
    for k in (2, 3, 5):
        up = img.repeat(k, axis=0).repeat(k, axis=1)
        assert h0 == dhash56(up), f"{k}x upscale changed the hash"
    # cross: upscale THEN re-encode through a third codec
    up2 = img.repeat(2, axis=0).repeat(2, axis=1)
    assert h0 == dhash56(codecs.gif_decode(codecs.gif_encode(up2)))


def test_dhash_one_cell_edit_moves_at_most_two_bits():
    img = _pattern(11)
    h0 = dhash56(img)
    for r in range(8):
        for c in range(8):
            edited = img.copy()
            edited[r, c] = 250 - edited[r, c]  # 200<->50
            d = bin(h0 ^ dhash56(edited)).count("1")
            assert d <= 2, (r, c, d)


def test_area_downscale_matches_per_cell_mean_reference():
    """The r18 vectorized area_downscale (two reduceat segment-sum
    passes) against the definitional per-cell slice-mean form, over
    integer-factor, fractional-factor and odd shapes — cell sums are
    exact for the two-tone fixture class, so the comparison is
    bit-for-bit there; for arbitrary float luma the comparison bits
    (what dhash56 consumes) are additionally pinned equal."""

    def ref(gray, out_w, out_h):
        h, w = gray.shape
        re_ = [(r * h) // out_h for r in range(out_h + 1)]
        ce = [(c * w) // out_w for c in range(out_w + 1)]
        out = np.empty((out_h, out_w), np.float64)
        for r in range(out_h):
            for c in range(out_w):
                out[r, c] = gray[re_[r]: re_[r + 1], ce[c]: ce[c + 1]].mean()
        return out

    rng = np.random.default_rng(3)
    for h, w in [(8, 8), (16, 16), (24, 40), (9, 13), (8, 21), (64, 64)]:
        # exact class: two-tone fixture luma (integer-valued cells)
        two_tone = np.where(
            rng.integers(0, 2, (h, w)) == 1, 200.0, 50.0
        ).astype(np.float64)
        assert np.array_equal(ref(two_tone, 8, 8), area_downscale(two_tone, 8, 8))
        # arbitrary float luma: the dHash comparison bits must agree
        gray = rng.uniform(0, 255, (h, w))
        a, b = ref(gray, 8, 8), area_downscale(gray, 8, 8)
        assert np.array_equal(a[:, 1:] > a[:, :-1], b[:, 1:] > b[:, :-1])
        assert np.allclose(a, b, rtol=0, atol=1e-9)


def test_dhash56_matches_bit_loop_reference():
    """The vectorized bit-pack (_DHASH_POW gather) against the
    definitional per-bit loop, on random two-tone patterns (the
    fixture class) and random RGB."""
    rng = np.random.default_rng(5)

    def ref_hash(arr):
        gray = (
            0.299 * arr[:, :, 0].astype(np.float64)
            + 0.587 * arr[:, :, 1].astype(np.float64)
            + 0.114 * arr[:, :, 2].astype(np.float64)
        )
        g = area_downscale(gray, 8, 8)
        bits = g[:, 1:] > g[:, :-1]
        h = 0
        for r in range(8):
            for c in range(7):
                if bits[r, c]:
                    h |= 1 << (r * 7 + c)
        return h

    for _ in range(50):
        arr = _pattern(int(rng.integers(0, 1 << 30)))
        assert dhash56(arr) == ref_hash(arr)
        rnd = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        assert dhash56(rnd) == ref_hash(rnd)


def test_area_downscale_exact_on_integer_factors():
    gray = np.arange(64, dtype=np.float64).reshape(8, 8)
    up = gray.repeat(4, axis=0).repeat(4, axis=1)
    assert np.array_equal(area_downscale(up, 8, 8), gray)
    # fractional factor still partitions all pixels exactly once
    out = area_downscale(gray, 3, 3)
    assert out.shape == (3, 3)
    assert out[0, 0] == gray[:2, :2].mean()  # floor edges: 8*1//3 = 2


def test_area_downscale_rejects_sub_grid_input():
    # ADVICE r18 #1: reduceat's duplicate-edge semantics would silently
    # diverge from the per-cell .mean() reference on inputs smaller
    # than the output grid — reject loudly instead
    with pytest.raises(ValueError, match="area_downscale needs input"):
        area_downscale(np.ones((4, 8), dtype=np.float64), 8, 8)
    with pytest.raises(ValueError, match="area_downscale needs input"):
        area_downscale(np.ones((8, 7), dtype=np.float64), 8, 8)
    # exactly-grid-sized input is the identity partition, still fine
    g = np.arange(64, dtype=np.float64).reshape(8, 8)
    assert np.array_equal(area_downscale(g, 8, 8), g)


def test_decode_pixels_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        decode_pixels(b"\x00\x01", "h264-still")


def test_perceptual_pairs_blocked_never_all_pairs(spark):
    """Planted 2x-BMP dup found at hamming 0; unrelated images absent;
    the executed plan joins on the (i, val) block key — a cartesian /
    all-pairs shape must not appear."""
    import pandas as pd

    imgs = []
    for seed in range(6):
        arr = _pattern(seed)
        imgs.append((seed, "png", codecs.png_encode(arr)))
    dup = _pattern(3).repeat(2, axis=0).repeat(2, axis=1)
    imgs.append((100, "bmp", codecs.bmp_encode(dup)))
    df = spark.createDataFrame(
        pd.DataFrame(imgs, columns=["image_id", "format", "content"])
    )
    pairs = perceptual_near_dup_pairs(df)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got == {(3, 100): 0}
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_perceptual_incremental_probe_broadcasts_batch(spark):
    """Ingest probe: planted re-encode matches its base at hamming 0;
    the BATCH side is the broadcast build side (the stored index is
    never shuffled — no Exchange hashpartitioning on the index branch),
    matching the band/cell/hash probe discipline."""
    import pandas as pd

    from dwh_spark.multimodal.perceptual import (
        dhash_frame,
        perceptual_incremental_ingest,
    )

    corpus = [(i, "png", codecs.png_encode(_pattern(i))) for i in range(6)]
    index = dhash_frame(
        spark.createDataFrame(
            pd.DataFrame(corpus, columns=["image_id", "format", "content"])
        )
    )
    up = _pattern(4).repeat(3, axis=0).repeat(3, axis=1)
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(200, "gif", codecs.gif_encode(up))],
            columns=["image_id", "format", "content"],
        )
    )
    matches = perceptual_incremental_ingest(index, batch)
    got = {(r["batch_id"], r["index_id"]): r["hamming"] for r in matches.collect()}
    assert got == {(200, 4): 0}
    plan = matches._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the index is the STREAM side: between the join node and its
    # BroadcastExchange build (the batch) there must be no hash
    # repartition — the only exchange above the join is the distinct's,
    # which runs over collision-bounded candidate rows, not the index
    stream_side = plan.split("BroadcastHashJoin", 1)[1].split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in stream_side


def test_audio_energy_fp_gain_invariant_and_edit_local():
    """Exact gain (no clipping) preserves every window-energy
    comparison — identical fingerprint; a one-window edit flips at
    most the two comparisons touching that window. Real WAV
    round-trip included (container assembly + decode must agree)."""
    from dwh_spark.multimodal.audio import wav_decode, wav_encode
    from dwh_spark.multimodal.audio_fp import energy_fp56

    rng = np.random.default_rng(23)
    s = rng.integers(-1024, 1024, 57 * 64).astype(np.int16)
    h0 = energy_fp56(s)
    assert h0 == energy_fp56(s * 2)
    assert h0 == energy_fp56(s * 7)  # 7*1023 < 32767: still no clip
    decoded, rate = wav_decode(wav_encode(s, 8000))
    assert rate == 8000 and h0 == energy_fp56(decoded)
    for w in (0, 13, 56):
        t = s.copy()
        t[w * 64 : (w + 1) * 64] = 600
        assert bin(h0 ^ energy_fp56(t)).count("1") <= 2, w


def test_audio_fp_composes_with_blocked_probe(spark):
    """The audio fingerprint frame feeds the same asymmetric ingest
    probe as the image path: a gain-doubled batch clip matches its
    stored base at hamming 0, batch side broadcast."""
    import pandas as pd

    from dwh_spark.multimodal.audio import wav_encode
    from dwh_spark.multimodal.audio_fp import AUDIO_FP_BITS, audio_fp_frame
    from dwh_spark.operators.dedup import simhash_blocked_probe

    rng = np.random.default_rng(5)
    clips = [
        (i, wav_encode(rng.integers(-1024, 1024, 57 * 64).astype(np.int16), 8000))
        for i in range(5)
    ]
    base = np.frombuffer(clips[2][1][-57 * 64 * 2 :], dtype="<i2")
    corpus = spark.createDataFrame(
        pd.DataFrame(clips, columns=["audio_id", "content"])
    )
    index = audio_fp_frame(corpus).select(
        "audio_id", F.col("afp").alias("simhash")
    )
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(900, wav_encode((base * 2).astype(np.int16), 8000))],
            columns=["audio_id", "content"],
        )
    )
    got = {
        (r["batch_id"], r["index_id"]): r["hamming"]
        for r in simhash_blocked_probe(
            index,
            audio_fp_frame(batch).select("audio_id", F.col("afp").alias("simhash")),
            key="audio_id",
            block_bits=AUDIO_FP_BITS // 4,
        ).collect()
    }
    assert got == {(900, 2): 0}


def test_video_incremental_probe_broadcasts_batch(spark):
    """Video ingest probe: an upscaled re-encode matches its stored
    base on all frames; the BATCH side is the broadcast build side and
    the stored per-frame index reaches the join without a hash
    repartition — same discipline as the image probe."""
    import pandas as pd

    from dwh_spark.multimodal.perceptual import (
        video_dhash_frames,
        video_perceptual_incremental_ingest,
    )

    def vid(seed, scale=1, edit_frame=None):
        frames = np.stack([_pattern(seed * 10 + f) for f in range(4)])
        if edit_frame is not None:
            frames = frames.copy()
            frames[edit_frame, 0, 0] = 250 - frames[edit_frame, 0, 0]
        if scale > 1:
            frames = frames.repeat(scale, axis=1).repeat(scale, axis=2)
        return codecs.avi_encode(frames)

    corpus = spark.createDataFrame(
        pd.DataFrame(
            [(i, 4, vid(i)) for i in range(5)],
            columns=["video_id", "n_frames", "content"],
        )
    )
    index = video_dhash_frames(corpus)
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(300, 4, vid(2, scale=2)), (301, 4, vid(4, edit_frame=1))],
            columns=["video_id", "n_frames", "content"],
        )
    )
    matches = video_perceptual_incremental_ingest(index, batch, min_frames=3)
    got = {
        (r["batch_id"], r["index_id"]): (r["n_frames_matched"], r["total_hamming"])
        for r in matches.collect()
    }
    assert got[(300, 2)] == (4, 0)
    n, h = got[(301, 4)]
    assert n == 4 and 0 < h <= 2  # edited frame still within hamming budget
    plan = matches._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    stream_side = plan.split("BroadcastHashJoin", 1)[1].split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in stream_side


def test_audio_subfingerprints_offset_properties():
    """The H-K block form's value claims, on raw arrays: (a) a
    head-trim of k windows shifts every surviving subfingerprint to
    match its base twin at offset k (the whole-clip hash diverges
    wildly on the same trim — the documented limitation); (b) exact
    gain preserves every word; (c) a one-window edit only kills the
    positions whose 32-bit span touches it."""
    from dwh_spark.multimodal.audio_fp import energy_fp56, subfingerprints

    rng = np.random.default_rng(41)
    s = rng.integers(-1024, 1024, 57 * 64).astype(np.int16)
    base = dict(subfingerprints(s))
    assert len(base) == 25  # 57 windows -> 56 bits -> 25 positions

    trimmed = s[8 * 64:]
    t = dict(subfingerprints(trimmed))
    assert len(t) == 17
    assert all(t[p] == base[p + 8] for p in t)  # every word, offset 8
    # the whole-clip hash has NO such tolerance: windows re-partition
    assert bin(energy_fp56(s) ^ energy_fp56(trimmed)).count("1") > 10

    assert dict(subfingerprints((s.astype(np.int64) * 2))) == base

    e = s.copy()
    e[3 * 64 : 4 * 64] = 600  # edit window 3: comparisons 2 and 3
    ed = dict(subfingerprints(e))
    for p in base:
        if p > 3:  # span [p, p+32) misses both comparisons only if p > 3
            assert ed[p] == base[p], p


def test_audio_offset_pairs_find_trimmed_copies(spark):
    """End-to-end on real WAV bytes: head-trimmed and tail-trimmed
    +gain copies pair with their base at the right offset with full
    votes; unrelated clips never pair (planted == found)."""
    import pandas as pd

    from dwh_spark.multimodal.audio import wav_encode
    from dwh_spark.multimodal.audio_fp import audio_offset_near_dup_pairs

    rng = np.random.default_rng(59)
    clips = {i: rng.integers(-1024, 1024, 57 * 64).astype(np.int16) for i in range(6)}
    rows = [(i, wav_encode(s, 1000)) for i, s in clips.items()]
    rows.append((100, wav_encode(clips[1][8 * 64:], 1000)))          # head trim
    rows.append((101, wav_encode((clips[4][: 49 * 64] * 2), 1000)))  # tail trim + gain
    audio = spark.createDataFrame(pd.DataFrame(rows, columns=["audio_id", "content"]))
    got = {
        (r["id_a"], r["id_b"]): (r["offset"], r["n_matches"])
        for r in audio_offset_near_dup_pairs(audio, min_matches=5).collect()
    }
    assert got == {(1, 100): (8, 17), (4, 101): (0, 17)}


def test_audio_offset_probe_broadcasts_batch(spark):
    """The offset-tolerant ingest probe keeps the perceptual-ingest
    discipline: stored lookup table streamed, BATCH subfingerprints
    broadcast (BroadcastExchange feeds the sub32 join from the batch
    side), trimmed batch clip found at its offset."""
    import pandas as pd

    from dwh_spark.multimodal.audio import wav_encode
    from dwh_spark.multimodal.audio_fp import (
        audio_offset_incremental_ingest,
        audio_subfingerprint_frame,
    )

    rng = np.random.default_rng(67)
    clips = {i: rng.integers(-1024, 1024, 57 * 64).astype(np.int16) for i in range(4)}
    corpus = spark.createDataFrame(
        pd.DataFrame(
            [(i, wav_encode(s, 1000)) for i, s in clips.items()],
            columns=["audio_id", "content"],
        )
    )
    index = audio_subfingerprint_frame(corpus)
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(700, wav_encode(clips[2][8 * 64:], 1000))],
            columns=["audio_id", "content"],
        )
    )
    probe = audio_offset_incremental_ingest(index, batch, min_matches=5)
    got = {
        (r["batch_id"], r["index_id"]): (r["offset"], r["n_matches"])
        for r in probe.collect()
    }
    # offset = pos_index - pos_batch: batch position p is index p+8
    assert got == {(700, 2): (8, 17)}
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan, plan


def test_video_offset_vote_finds_head_dropped_copy(spark):
    """A head-dropped copy loses EVERY vote under the aligned form and
    matches fully under the offset vote; an edited+dropped copy still
    votes on all frames with the edit visible in total_hamming."""
    import pandas as pd

    from dwh_spark.multimodal.perceptual import (
        video_offset_near_dups,
        video_perceptual_near_dups,
    )

    def vid(seed, n=5, head_drop=False, edit_frame=None):
        frames = np.stack([_pattern(seed * 10 + f) for f in range(n)])
        if edit_frame is not None:
            frames = frames.copy()
            frames[edit_frame, 0, 0] = 250 - frames[edit_frame, 0, 0]
        if head_drop:
            frames = frames[1:]
        return len(frames), codecs.avi_encode(frames)

    rows = []
    for i in range(4):
        n, v = vid(i)
        rows.append((i, n, v))
    n, v = vid(1, head_drop=True)
    rows.append((200, n, v))
    n, v = vid(3, head_drop=True, edit_frame=2)
    rows.append((201, n, v))
    vids = spark.createDataFrame(
        pd.DataFrame(rows, columns=["video_id", "n_frames", "content"])
    )
    aligned = {
        (r["id_a"], r["id_b"])
        for r in video_perceptual_near_dups(vids, min_frames=3).collect()
    }
    assert aligned == set()  # absolute frame_ix: the drop kills every vote
    got = {
        (r["id_a"], r["id_b"]): (
            r["offset"], r["n_frames_matched"], r["total_hamming"]
        )
        for r in video_offset_near_dups(vids, min_frames=3).collect()
    }
    assert set(got) == {(1, 200), (3, 201)}
    assert got[(1, 200)] == (1, 4, 0)
    off, nm, th = got[(3, 201)]
    # the one-cell edit moves <= 2 dHash bits (possibly 0 when the
    # flipped cell's neighbor comparison keeps its sign) — the claim
    # is the edited frame STILL VOTES, i.e. all 4 frames match
    assert (off, nm) == (1, 4) and th <= 2


def test_video_offset_probe_broadcasts_batch(spark):
    """The offset-tolerant video ingest probe keeps the asymmetric
    discipline (stored per-frame index streamed, BATCH frames
    broadcast) while catching a head-dropped batch copy the aligned
    probe misses at the right offset."""
    import pandas as pd

    from dwh_spark.multimodal.perceptual import (
        video_dhash_frames,
        video_frame_vote_probe,
        video_offset_vote_probe,
    )

    def vid(seed, n=5, head_drop=False):
        frames = np.stack([_pattern(seed * 10 + f) for f in range(n)])
        if head_drop:
            frames = frames[1:]
        return len(frames), codecs.avi_encode(frames)

    rows = []
    for i in range(4):
        n, v = vid(i)
        rows.append((i, n, v))
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["video_id", "n_frames", "content"])
    )
    index = video_dhash_frames(corpus)
    n, v = vid(2, head_drop=True)
    batch_frames = video_dhash_frames(
        spark.createDataFrame(
            pd.DataFrame([(500, n, v)], columns=["video_id", "n_frames", "content"])
        )
    )
    aligned = video_frame_vote_probe(index, batch_frames, min_frames=3)
    assert aligned.count() == 0  # absolute frame_ix: every vote lost
    probe = video_offset_vote_probe(index, batch_frames, min_frames=3)
    got = {
        (r["batch_id"], r["index_id"]): (
            r["offset"], r["n_frames_matched"], r["total_hamming"]
        )
        for r in probe.collect()
    }
    assert got == {(500, 2): (1, 4, 0)}
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan, plan
