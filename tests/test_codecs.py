"""Vendored pure-numpy image codecs: PNG/BMP roundtrips, all five PNG
scanline filters, bicubic resample properties."""

import struct
import zlib

import numpy as np
import pytest

from dwh_spark.multimodal import codecs as C


def test_png_rgb_roundtrip():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (24, 32, 3), np.uint8)
    assert np.array_equal(C.png_decode(C.png_encode(img)), img)


def test_png_gray_and_rgba_roundtrip():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (10, 7), np.uint8)
    assert np.array_equal(C.png_decode(C.png_encode(g))[:, :, 0], g)
    ra = rng.integers(0, 256, (9, 11, 4), np.uint8)
    assert np.array_equal(C.png_decode(C.png_encode(ra)), ra)


def test_bmp_roundtrip_with_row_padding():
    rng = np.random.default_rng(7)
    # width 9 -> 27-byte rows pad to 28; padding must not leak into pixels
    b = rng.integers(0, 256, (13, 9, 3), np.uint8)
    assert np.array_equal(C.bmp_decode(C.bmp_encode(b)), b)


def _manual_png(rows_filtered, w, h, ctype):
    raw = b"".join(bytes([f]) + bytes(r) for f, r in rows_filtered)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)

    def chunk(t, p):
        return (
            struct.pack(">I", len(p)) + t + p
            + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_sub_and_up_filters():
    # rows hand-filtered with Sub (1) and Up (2); decode must invert both
    target = np.array([[10, 30, 60], [15, 35, 70]], np.uint8)
    row0_sub = [10, 20, 30]
    row1_up = [5, 5, 10]
    png = _manual_png([(1, row0_sub), (2, row1_up)], 3, 2, 0)
    assert np.array_equal(C.png_decode(png)[:, :, 0], target)


def test_png_average_and_paeth_filters():
    prior = [10, 30, 60]
    row0_avg = [10, 30 - 10 // 2, 60 - 30 // 2]
    tgt = [20, 40, 80]
    row1_paeth, recon = [], []
    for x in range(3):
        a = recon[x - 1] if x >= 1 else 0
        b, c = prior[x], (prior[x - 1] if x >= 1 else 0)
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        row1_paeth.append((tgt[x] - pred) % 256)
        recon.append(tgt[x])
    png = _manual_png([(3, row0_avg), (4, row1_paeth)], 3, 2, 0)
    assert np.array_equal(
        C.png_decode(png)[:, :, 0], np.array([[10, 30, 60], [20, 40, 80]])
    )


def test_png_interlace_rejected():
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    crc = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    data = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + crc
    with pytest.raises(NotImplementedError, match="Adam7"):
        C.png_decode(data)


def test_resize_constant_exact():
    const = np.full((24, 32, 3), 137, np.uint8)
    r = C.resize_bicubic(const, 40, 30)
    assert r.shape == (30, 40, 3) and (r == 137).all()


def test_resize_linear_ramp_reproduced():
    """The Keys kernel reproduces degree-1 polynomials: a horizontal
    ramp upsampled 2x must equal the analytic ramp at the new sample
    positions (edge clamping included via np.interp's clamp)."""
    ramp = np.tile(np.linspace(0, 255, 64).astype(np.uint8), (16, 1))
    up = C.resize_bicubic(ramp, 128, 16)
    pos = (np.arange(128) + 0.5) * 0.5 - 0.5
    want = np.rint(np.interp(pos, np.arange(64), ramp[0].astype(float))).astype(int)
    assert np.abs(up[8].astype(int) - want).max() <= 1


def test_avi_roundtrip_per_frame():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (5, 12, 9, 3), np.uint8)  # width 9 -> padded rows
    avi = C.avi_encode(frames)
    for i in range(5):
        assert np.array_equal(C.avi_decode_frame(avi, i), frames[i])
    with pytest.raises(IndexError):
        C.avi_decode_frame(avi, 5)


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError, match="RIFF"):
        C.avi_decode_frame(b"RIFFxxxxWAVE", 0)
