"""Audio/video multimodal operators: opaque binary + typed metadata.

Extends the image pipeline (images.py, SURVEY.md §2.5) to the other
two modalities a training-data pipeline carries. Same design stance:
the *container* work — magic sniffing, header field extraction,
chunk/frame fan-out, content addressing — is pure JVM column algebra
(hex/substring/conv arithmetic, whole-stage codegen); only per-sample
decode needs Python, and the codec libraries (ffmpeg/librosa) are not
in this container, so decoding is STUBBED behind a deterministic
digest with the Arrow batch plumbing real and tested.

Scale notes:
- header parsing is O(1) bytes per row regardless of blob size —
  at 100 TB, keep media bytes in their own parquet column so column
  pruning skips them when a query touches metadata only.
- frame/chunk fan-out is an ``explode`` over a ``sequence`` — no
  shuffle; output partitioning follows the input, so size input
  partitions by expected fan-out factor.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)


def _le_hex(col: Column, n_bytes: int) -> Column:
    """Hex string of an int column encoded as ``n_bytes`` little-endian
    bytes (for assembling binary headers via one final ``unhex``)."""
    parts = [
        F.lpad(F.hex(F.shiftright(col.cast("long"), 8 * i) % 256), 2, "0")
        for i in range(n_bytes)
    ]
    return F.concat(*parts)


def _byte(content: Column, pos: int) -> Column:
    """Unsigned value of the 1-indexed ``pos``-th byte."""
    return F.conv(F.hex(F.substring(content, pos, 1)), 16, 10).cast("long")


def _le_int(content: Column, pos: int, n_bytes: int) -> Column:
    out = F.lit(0).cast("long")
    for i in range(n_bytes):
        out = out + _byte(content, pos + i) * F.lit(256**i)
    return out


_ASCII = {"RIFF": "52494646", "WAVE": "57415645", "fmt ": "666D7420", "data": "64617461"}


def wav_bytes(sample_rate: Column, channels: Column, n_samples: Column) -> Column:
    """Assemble a canonical 44-byte PCM-16 WAV header (+ no payload —
    callers may concat payload bytes). All little-endian fields built
    as hex and materialized with one ``unhex`` — pure codegen."""
    bits = 16
    block_align = channels * F.lit(bits // 8)
    data_size = n_samples * block_align
    byte_rate = sample_rate * block_align
    hex_str = F.concat(
        F.lit(_ASCII["RIFF"]), _le_hex(data_size + 36, 4), F.lit(_ASCII["WAVE"]),
        F.lit(_ASCII["fmt "]), _le_hex(F.lit(16), 4),
        _le_hex(F.lit(1), 2), _le_hex(channels, 2),
        _le_hex(sample_rate, 4), _le_hex(byte_rate, 4),
        _le_hex(block_align, 2), _le_hex(F.lit(bits), 2),
        F.lit(_ASCII["data"]), _le_hex(data_size, 4),
    )
    return F.unhex(hex_str)


def parse_wav_header(content: Column) -> Column:
    """Inverse of :func:`wav_bytes`: struct(channels, sample_rate,
    bits, n_samples) read straight off the header bytes — the
    metadata-extraction operator for audio columns."""
    channels = _le_int(content, 23, 2)
    bits = _le_int(content, 35, 2)
    data_size = _le_int(content, 41, 4)
    return F.struct(
        channels.alias("channels"),
        _le_int(content, 25, 4).alias("sample_rate"),
        bits.alias("bits"),
        (data_size / (channels * (bits / 8))).cast("long").alias("n_samples"),
    )


def sniff_media(content: Column) -> Column:
    """Container sniffing for av formats (the B1 analog): RIFF/WAVE →
    wav, RIFF/AVI → avi, ftyp box → mp4, EBML magic → webm/mkv,
    else NULL."""
    head4 = F.upper(F.hex(F.substring(content, 1, 4)))
    riff_kind = F.upper(F.hex(F.substring(content, 9, 4)))
    ftyp = F.upper(F.hex(F.substring(content, 5, 4)))
    return (
        F.when((head4 == _ASCII["RIFF"]) & (riff_kind == _ASCII["WAVE"]), "wav")
        .when((head4 == _ASCII["RIFF"]) & (riff_kind == "41564920"), "avi")  # 'AVI '
        .when(ftyp == "66747970", "mp4")          # 'ftyp'
        .when(head4 == "1A45DFA3", "webm")        # EBML
        .otherwise(F.lit(None).cast("string"))
    )


def sample_frames(
    videos: DataFrame, n_frames_col: str = "n_frames", every: int = 24
) -> DataFrame:
    """Frame-sampling fan-out: one row per sampled frame index
    (0, every, 2·every, …) — ``explode(sequence(...))``, shuffle-free."""
    return videos.withColumn(
        "frame_ix",
        F.explode(F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every))),
    )


def audio_chunks(
    audio: DataFrame,
    sample_rate_col: str = "sample_rate",
    n_samples_col: str = "n_samples",
    chunk_seconds: int = 5,
) -> DataFrame:
    """Fixed-duration chunk fan-out for audio: one row per chunk with
    sample offsets — the segmentation step before any feature
    extraction (ASR windows, embedding clips)."""
    per_chunk = F.col(sample_rate_col) * chunk_seconds
    n_chunks = F.ceil(F.col(n_samples_col) / per_chunk).cast("long")
    return (
        audio.withColumn(
            "chunk_ix", F.explode(F.sequence(F.lit(0), n_chunks - 1))
        )
        .withColumn("chunk_start", F.col("chunk_ix") * per_chunk)
        .withColumn(
            "chunk_end", F.least(F.col("chunk_start") + per_chunk, F.col(n_samples_col))
        )
    )


# ------------------------------------------------------------- frame decode

FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_ix", IntegerType()),
    StructField("frame_digest", StringType()),
])

FrameDecoder = Callable[[int, int], str]


def deterministic_frame_decoder(doc_id: int, frame_ix: int) -> str:
    """FAKE frame decode: digest of (video id, frame index). A real
    decoder returns pixel bytes; tests pin the plumbing with this."""
    import hashlib

    return hashlib.md5(f"{doc_id}:{frame_ix}".encode()).hexdigest()


def ffmpeg_frame_decoder(doc_id: int, frame_ix: int) -> str:
    """COMPRESSED video (h264/vp9/mjpeg) needs a real codec library.
    STUB: no ffmpeg/PyAV in this container. Uncompressed AVI decodes
    for real via :func:`decode_avi_frame_stats`."""
    raise NotImplementedError(
        "video codecs unavailable: use deterministic_frame_decoder for plumbing tests"
    )


def decode_avi_frame_stats(sampled: DataFrame, content_col: str = "content") -> DataFrame:
    """REAL video frame decode for uncompressed RIFF/AVI ('DIB '
    streams, multimodal/codecs.py): per sampled frame, walk the movi
    chunks, decode the raw BGR plane, and report dimensions + mean
    pixel value. Stats are computed inside the Arrow batch so pixel
    arrays never leave the executor — at 100 TB the shuffle carries
    five small columns, not frames."""
    schema = "doc_id long, frame_ix long, width int, height int, mean_gray long"

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        from dwh_spark.multimodal import codecs

        for pdf in batches:
            rows = []
            for d, ix, blob in zip(pdf["doc_id"], pdf["frame_ix"], pdf[content_col]):
                arr = codecs.avi_decode_frame(bytes(blob), int(ix))
                rows.append((
                    int(d), int(ix), int(arr.shape[1]), int(arr.shape[0]),
                    int(round(float(arr.mean()))),
                ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_ix", "width", "height", "mean_gray"]
            )

    return sampled.select("doc_id", "frame_ix", content_col).mapInPandas(run, schema)


def decode_frames(
    sampled: DataFrame, decoder: FrameDecoder = ffmpeg_frame_decoder
) -> DataFrame:
    """Run the frame decoder over Arrow batches (``mapInPandas``) —
    the same batched-Python shape as images.decode_and_resize, with
    batch size capped by arrow.maxRecordsPerBatch."""

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "frame_ix": pdf["frame_ix"],
                "frame_digest": [
                    decoder(int(d), int(i))
                    for d, i in zip(pdf["doc_id"], pdf["frame_ix"])
                ],
            })

    return sampled.select("doc_id", "frame_ix").mapInPandas(run, FRAME_SCHEMA)
