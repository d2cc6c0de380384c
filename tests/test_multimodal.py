"""Unit tests for the binary/image operators (SURVEY.md §2.5)."""

import pytest
from pyspark.sql import functions as F

from dwh_spark.multimodal.images import (
    content_address,
    decode_and_resize,
    deterministic_decoder,
    pillow_decoder,
    resize_fanout,
    sniff_format,
)

SAMPLES = [
    ("png", b"\x89PNG\r\n\x1a\n" + b"rest"),
    ("jpeg", b"\xff\xd8\xff\xe0\x00\x10JFIF"),
    ("gif", b"GIF89a\x01\x00"),
    ("bmp", b"BMxxxx"),
    ("tiff", b"II*\x00data"),
    ("tiff", b"MM\x00*data"),
    ("webp", b"RIFF\x12\x34\x56\x78WEBPVP8 "),
    ("svg", b'  <svg xmlns="http://www.w3.org/2000/svg">'),
    ("svg", b'<?xml version="1.0"?><svg/>'),
    (None, b"\x00\x01\x02\x03 not an image"),
    (None, b"RIFF\x12\x34\x56\x78WAVEfmt "),  # RIFF but not WEBP
]


def test_sniff_format_magic_table(spark):
    df = spark.createDataFrame(
        [(i, c) for i, (_, c) in enumerate(SAMPLES)], "i long, content binary"
    )
    got = {r["i"]: r["fmt"] for r in df.select("i", sniff_format(F.col("content")).alias("fmt")).collect()}
    assert got == {i: fmt for i, (fmt, _) in enumerate(SAMPLES)}


def test_resize_fanout_svg_passthrough_and_unknown_drop(spark):
    df = spark.createDataFrame(
        [("o", "t1", b"\x89PNG\r\n\x1a\nx"), ("o", "t2", b"<svg/>"), ("o", "t3", b"\x00junk")],
        "owner string, token_id string, content binary",
    )
    rows = {(r["token_id"], r["target_w"], r["target_h"]) for r in resize_fanout(df).collect()}
    assert rows == {("t1", 200, 150), ("t1", 120, 90), ("t2", 0, 0)}


def test_decode_and_resize_stub_batches(spark):
    df = spark.createDataFrame(
        [("o", "t1", b"\x89PNG\r\n\x1a\nx"), ("o", "t2", b"<svg/>")],
        "owner string, token_id string, content binary",
    )
    out = {
        (r["token_id"], r["target_w"]): (bytes(r["resized"]), r["n_bytes"])
        for r in decode_and_resize(resize_fanout(df), decoder=deterministic_decoder).collect()
    }
    # raster: tag + md5 digest, exactly reproducible driver-side
    expect = deterministic_decoder(b"\x89PNG\r\n\x1a\nx", 200, 150, "png")
    assert out[("t1", 200)] == (expect, len(expect))
    # svg passthrough keeps original bytes
    assert out[("t2", 0)] == (b"<svg/>", 6)


def test_pixel_decoder_real_png_roundtrip():
    """No PIL in this env, so this exercises the vendored codec path:
    a real 16x12 constant-color PNG decodes, bicubic-resizes to 8x6,
    and re-encodes to a PNG whose pixels are still that color."""
    import numpy as np

    from dwh_spark.multimodal import codecs

    src = codecs.png_encode(np.full((12, 16, 3), 99, np.uint8))
    resized = pillow_decoder(src, 8, 6, "png")
    arr = codecs.png_decode(resized)
    assert arr.shape == (6, 8, 3) and (arr == 99).all()


def test_pixel_decoder_real_bmp():
    import numpy as np

    from dwh_spark.multimodal import codecs

    src = codecs.bmp_encode(np.full((10, 10, 3), 42, np.uint8))
    arr = codecs.png_decode(pillow_decoder(src, 5, 4, "bmp"))
    assert arr.shape == (4, 5, 3) and (arr == 42).all()


def test_pixel_decoder_unsupported_format_raises():
    # every raster format the reference decodes is vendored as of r5;
    # a format with no vendored codec and no registry plugin raises
    with pytest.raises(NotImplementedError, match="needs an image codec"):
        pillow_decoder(b"\x00\x00\x01\x00\x01\x00", 10, 10, "ico")


def test_pixel_decoder_lossy_webp_raises():
    # lossless VP8L decodes for real; lossy VP8 is the honest gap
    lossy = b"RIFF\x14\x00\x00\x00WEBPVP8 \x08\x00\x00\x00" + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="needs a native codec"):
        pillow_decoder(lossy, 10, 10, "webp")


def test_content_address_shape(spark):
    df = spark.createDataFrame([("o", "t", b"bytes")], "owner string, token_id string, content binary")
    addr = df.select(
        content_address([F.col("owner"), F.col("token_id")], F.col("content")).alias("a")
    ).head()["a"]
    left, right = addr.split("+")
    assert len(left) == 32 and len(right) == 32
