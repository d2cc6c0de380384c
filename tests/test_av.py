"""WAV header round-trip, media sniffing, and chunk boundary math."""

from pyspark.sql import functions as F

from dwh_spark.multimodal.av import (
    audio_chunks, parse_wav_header, sniff_media, wav_bytes,
)


def test_wav_header_roundtrip_and_sniff(spark):
    df = spark.createDataFrame(
        [(44100, 2, 123456), (8000, 1, 799)], "rate long, ch long, n long"
    ).select(
        "rate", "ch", "n",
        wav_bytes(F.col("rate"), F.col("ch"), F.col("n")).alias("content"),
    )
    out = df.select(
        "rate", "ch", "n",
        sniff_media(F.col("content")).alias("fmt"),
        parse_wav_header(F.col("content")).alias("h"),
    ).collect()
    for r in out:
        assert r["fmt"] == "wav"
        assert r["h"]["sample_rate"] == r["rate"]
        assert r["h"]["channels"] == r["ch"]
        assert r["h"]["n_samples"] == r["n"]
        assert r["h"]["bits"] == 16


def test_sniff_rejects_non_media(spark):
    df = spark.createDataFrame([("plain text",)], "s string")
    (row,) = df.select(sniff_media(F.col("s").cast("binary")).alias("f")).collect()
    assert row["f"] is None


def test_audio_chunks_short_final_chunk(spark):
    # 11s of audio at 8kHz in 5s chunks -> 3 chunks, last one 1s
    df = spark.createDataFrame([(1, 8000, 88000)], "doc_id long, sample_rate long, n_samples long")
    rows = sorted(
        (r["chunk_ix"], r["chunk_start"], r["chunk_end"])
        for r in audio_chunks(df, chunk_seconds=5).collect()
    )
    assert rows == [(0, 0, 40000), (1, 40000, 80000), (2, 80000, 88000)]
