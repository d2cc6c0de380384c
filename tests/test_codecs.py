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


def test_png_adam7_interlace_roundtrip():
    """Adam7 pass order re-assembles exactly, including dims that make
    some passes empty (1x1: six of seven passes have zero pixels)."""
    rng = np.random.default_rng(23)
    for hw in ((24, 32), (13, 9), (1, 1), (2, 3), (8, 8), (7, 17)):
        img = rng.integers(0, 256, (*hw, 3), np.uint8)
        assert np.array_equal(C.png_decode(C.png_encode(img, interlace=True)), img)
    rgba = rng.integers(0, 256, (11, 6, 4), np.uint8)
    assert np.array_equal(C.png_decode(C.png_encode(rgba, interlace=True)), rgba)


def _manual_depth_png(w, h, depth, ctype, rows_bits, palette=None):
    """Build a PNG whose rows are pre-packed sample bytes (filter 0)."""
    raw = b"".join(b"\x00" + bytes(r) for r in rows_bits)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)

    def chunk(t, p):
        return (
            struct.pack(">I", len(p)) + t + p
            + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_sub_byte_gray_depths():
    # depth 1: 10 pixels -> 2 bytes/row, MSB first; 1 scales to 255
    png = _manual_depth_png(10, 2, 1, 0, [[0b10110001, 0b01000000],
                                          [0b00000001, 0b11000000]])
    arr = C.png_decode(png)
    assert arr.shape == (2, 10, 1)
    assert arr[0, :, 0].tolist() == [255, 0, 255, 255, 0, 0, 0, 255, 0, 255]
    # depth 2: values 0..3 scale by 85
    png = _manual_depth_png(5, 1, 2, 0, [[0b00011011, 0b10000000]])
    assert C.png_decode(png)[0, :, 0].tolist() == [0, 85, 170, 255, 170]
    # depth 4: values scale by 17
    png = _manual_depth_png(3, 1, 4, 0, [[0x5F, 0xA0]])
    assert C.png_decode(png)[0, :, 0].tolist() == [5 * 17, 255, 170]


def test_png_sub_byte_palette_indices_not_scaled():
    pal = [10, 20, 30, 200, 100, 50, 0, 0, 255]  # 3 RGB entries
    # depth 4, indices 0,2,1 packed two per byte
    png = _manual_depth_png(3, 1, 4, 3, [[0x02, 0x10]], palette=pal)
    arr = C.png_decode(png)
    assert arr.shape == (1, 3, 3)
    assert arr[0].tolist() == [[10, 20, 30], [0, 0, 255], [200, 100, 50]]


def test_png_16bit_reduces_to_high_byte():
    # one RGB pixel, 16 bits/sample big-endian: 0xAB12 -> 0xAB
    row = [0xAB, 0x12, 0x00, 0xFF, 0x7F, 0x01]
    png = _manual_depth_png(1, 1, 16, 2, [row])
    arr = C.png_decode(png)
    assert arr.shape == (1, 1, 3)
    assert arr[0, 0].tolist() == [0xAB, 0x00, 0x7F]
    # 16-bit filtering offsets by bpp=6 bytes: two pixels with Sub filter
    row2 = bytes([1]) + bytes([10, 0, 20, 0, 30, 0, 5, 0, 5, 0, 5, 0])
    raw = zlib.compress(row2)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0)

    def chunk(t, p):
        return (
            struct.pack(">I", len(p)) + t + p
            + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
        )

    png2 = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", raw) + chunk(b"IEND", b"")
    )
    arr2 = C.png_decode(png2)
    assert arr2[0, 0].tolist() == [10, 20, 30]
    assert arr2[0, 1].tolist() == [15, 25, 35]


def test_png_invalid_depth_rejected():
    ihdr = struct.pack(">IIBBBBB", 1, 1, 3, 0, 0, 0, 0)
    crc = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    data = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + crc
    with pytest.raises(ValueError, match="bit depth"):
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


# ------------------------------------------------------------------- JPEG


def test_jpeg_constant_gray_exact_roundtrip():
    """quality=100 → all-ones quant tables: constant gray round-trips
    EXACTLY under both subsamplings (the identity the oracle-pinned
    imgs_jpeg_pixel_stats query relies on)."""
    from dwh_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    for sub in ("4:2:0", "4:4:4"):
        for g in (0, 7, 128, 254, 255):
            a = np.full((24, 32, 3), g, np.uint8)
            dec = jpeg_decode(jpeg_encode(a, quality=100, subsampling=sub))
            assert dec.shape == (24, 32, 3)
            assert (dec == g).all(), (sub, g)


def test_jpeg_random_gray_bounded_error():
    """Non-constant content exercises the AC Huffman path; at q100 the
    only loss is DCT round-off, bounded to ±3 grey levels."""
    from dwh_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(42)
    for sub in ("4:2:0", "4:4:4"):
        gray = rng.integers(0, 256, (40, 56), np.uint8)
        a = np.repeat(gray[:, :, None], 3, 2)
        dec = jpeg_decode(jpeg_encode(a, quality=100, subsampling=sub))
        assert np.abs(dec.astype(int) - a.astype(int)).max() <= 3


def test_jpeg_odd_dimensions_crop():
    """Dims not multiples of 8/16 pad to whole MCUs internally and crop
    back on decode."""
    from dwh_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(7)
    for hw in ((17, 23), (9, 33), (1, 1), (5, 64)):
        a = rng.integers(0, 256, (*hw, 3), np.uint8)
        assert jpeg_decode(jpeg_encode(a, quality=95)).shape == (*hw, 3)


def test_jpeg_single_component_gray():
    from dwh_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (20, 30), np.uint8)
    dec = jpeg_decode(jpeg_encode(g, quality=100))
    assert dec.shape == (20, 30, 3)
    assert (dec[:, :, 0] == dec[:, :, 1]).all() and (dec[:, :, 1] == dec[:, :, 2]).all()
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 2


def test_jpeg_color_quality_loss_bounded():
    """Block-aligned two-color image at q90: quantization + chroma
    subsampling loss stays visually small (≤12 levels)."""
    from dwh_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    a = np.zeros((32, 32, 3), np.uint8)
    a[:16] = (200, 30, 60)
    a[16:] = (10, 180, 220)
    for sub in ("4:2:0", "4:4:4"):
        dec = jpeg_decode(jpeg_encode(a, quality=90, subsampling=sub))
        assert np.abs(dec.astype(int) - a.astype(int)).max() <= 12


def test_jpeg_rejects_arithmetic_and_garbage():
    import pytest

    from dwh_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01not a jpeg")
    # flip SOF0 (0xC0) to SOF9 (arithmetic sequential) in a real stream
    blob = bytearray(jpeg_encode(np.zeros((8, 8, 3), np.uint8)))
    ix = bytes(blob).find(b"\xff\xc0")
    blob[ix + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(blob))


def test_jpeg_progressive_equals_baseline_decode():
    """The progressive encoder writes the SAME quantized coefficients as
    the baseline encoder — only the entropy layer differs — so decoding
    both must give bit-identical pixels. This cross-checks the four
    progressive scan decoders (DC/AC x first/refine, EOB runs,
    correction bits) against the independent sequential path."""
    from dwh_spark.multimodal.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(7)
    cases = [
        ((16, 16, 3), "4:2:0", 75),
        ((17, 23, 3), "4:2:0", 90),   # non-MCU-aligned: padding blocks
        ((33, 41, 3), "4:4:4", 50),
        ((8, 8, 3), "4:4:4", 100),
    ]
    for shape, sub, q in cases:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = jpeg_decode(jpeg_encode(img, quality=q, subsampling=sub))
        prog = jpeg_decode(jpeg_encode_progressive(img, quality=q, subsampling=sub))
        assert np.array_equal(base, prog), (shape, sub, q)
    # smooth gradient: long EOB runs spanning many blocks, with buffered
    # correction bits in the refinement scans
    g = np.tile(np.linspace(0, 255, 56, dtype=np.uint8), (24, 1))
    assert np.array_equal(
        jpeg_decode(jpeg_encode(g, quality=90)),
        jpeg_decode(jpeg_encode_progressive(g, quality=90)),
    )
    # constant image: maximal EOB runs in every scan
    c3 = np.full((40, 40, 3), 180, np.uint8)
    assert np.array_equal(
        jpeg_decode(jpeg_encode(c3, 90)),
        jpeg_decode(jpeg_encode_progressive(c3, 90)),
    )


def test_jpeg_all_four_subsamplings_cross_decode():
    """4:2:2 and 4:4:0 (single-axis chroma halving — ubiquitous in real
    camera files) must decode identically through the sequential and
    progressive entropy paths."""
    from dwh_spark.multimodal.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (21, 35, 3), dtype=np.uint8)
    for sub in ("4:2:0", "4:2:2", "4:4:0", "4:4:4"):
        base = jpeg_decode(jpeg_encode(img, quality=85, subsampling=sub))
        prog = jpeg_decode(jpeg_encode_progressive(img, quality=85, subsampling=sub))
        assert np.array_equal(base, prog), sub
        assert base.shape == img.shape


def test_jpeg_malformed_scan_headers_raise():
    """A progressive stream whose SOS claims an interleaved AC scan or
    a DC band with Se>0 must raise, not silently mis-decode."""
    import struct

    import pytest

    from dwh_spark.multimodal.jpeg import jpeg_decode, jpeg_encode_progressive

    blob = jpeg_encode_progressive(np.zeros((16, 16, 3), np.uint8))

    def patch_first_sos(mutate):
        out = bytearray(blob)
        pos = 2
        while pos + 4 <= len(out):
            marker = out[pos + 1]
            (ln,) = struct.unpack(">H", bytes(out[pos + 2 : pos + 4]))
            if marker == 0xDA:
                mutate(out, pos)
                return bytes(out)
            pos += 2 + ln
        raise AssertionError("no SOS found")

    def make_dc_se_nonzero(buf, pos):
        ns = buf[pos + 4]
        buf[pos + 4 + 2 + 2 * ns] = 5  # Se on the (DC) first scan

    with pytest.raises(ValueError, match="DC scan"):
        jpeg_decode(patch_first_sos(make_dc_se_nonzero))

    def make_interleaved_ac(buf, pos):
        ns = buf[pos + 4]
        buf[pos + 4 + 1 + 2 * ns] = 1   # Ss=1 on the interleaved DC scan
        buf[pos + 4 + 2 + 2 * ns] = 63  # Se=63 (valid band, invalid ns)

    with pytest.raises(ValueError, match="single-component"):
        jpeg_decode(patch_first_sos(make_interleaved_ac))


def test_jpeg_truncated_stream_raises_value_error():
    """Truncated uploads are routine; the codec must raise its
    ValueError contract, not leak IndexError from the bit reader."""
    import pytest

    from dwh_spark.multimodal.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    for blob in (jpeg_encode(img, 90), jpeg_encode_progressive(img, 90)):
        cut = blob[: int(len(blob) * 0.7)]
        with pytest.raises(ValueError):
            jpeg_decode(cut)


def test_jpeg_restart_markers_both_coders():
    """DRI/RSTn resync (pervasive in camera output): baseline and
    progressive encodes with restart intervals 1/2/5 must decode
    identically to the unrestarted stream — covers byte-align, marker
    consumption, DC-prediction and EOB-run resets in every scan kind."""
    from dwh_spark.multimodal.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(17)
    for shape, sub in [((33, 41, 3), "4:2:0"), ((17, 23, 3), "4:4:4")]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        ref = jpeg_decode(jpeg_encode(img, quality=85, subsampling=sub))
        for ri in (1, 2, 5):
            b = jpeg_encode(img, quality=85, subsampling=sub, restart_interval=ri)
            p = jpeg_encode_progressive(
                img, quality=85, subsampling=sub, restart_interval=ri
            )
            assert b"\xff\xdd" in b and b"\xff\xd0" in b
            assert np.array_equal(ref, jpeg_decode(b))
            assert np.array_equal(ref, jpeg_decode(p))
    g = rng.integers(0, 256, (40, 8), dtype=np.uint8)
    assert np.array_equal(
        jpeg_decode(jpeg_encode(g, quality=85)),
        jpeg_decode(jpeg_encode_progressive(g, quality=85, restart_interval=3)),
    )


def test_jpeg_progressive_nonzero_table_ids():
    """Real encoders put chroma AC coefficients in table id 1. Our
    fixture writer uses id 0 everywhere, so rewrite one by byte
    surgery — duplicate the AC DHT as id 1 and point the chroma AC
    scans at it — and require identical decode: proves the per-scan
    table-id dispatch, not just the single-table happy path."""
    import struct

    from dwh_spark.multimodal import jpeg as J

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)
    blob = J.jpeg_encode_progressive(img, quality=80)
    want = J.jpeg_decode(blob)

    out = bytearray()
    pos = 0
    out += blob[:2]
    pos = 2
    while pos + 4 <= len(blob):
        marker = blob[pos + 1]
        if marker == 0xD9:
            out += blob[pos:]
            break
        (ln,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        seg = blob[pos : pos + 2 + ln]
        if marker == 0xC4 and seg[4] == 0x10:  # the AC DHT: emit + a copy as id 1
            out += seg
            out += seg[:4] + bytes([0x11]) + seg[5:]
        elif marker == 0xDA:
            ns = seg[4]
            scan_hdr = bytearray(seg)
            ss = seg[5 + 2 * ns]
            if ns == 1 and seg[5] != 1 and ss > 0:  # chroma AC scan
                scan_hdr[6] = 0x01  # Td=0, Ta=1
            out += bytes(scan_hdr)
            # copy this scan's entropy bytes verbatim up to the next marker
            end = J._next_marker(blob, pos + 2 + ln)
            out += blob[pos + 2 + ln : end]
            pos = end
            continue
        else:
            out += seg
        pos += 2 + ln
    got = J.jpeg_decode(bytes(out))
    assert np.array_equal(got, want)


def test_jpeg_progressive_marker_shape():
    """SOF2 frame, multiple SOS scans, EOB-run-capable AC table."""
    from dwh_spark.multimodal.jpeg import jpeg_encode_progressive

    blob = jpeg_encode_progressive(
        np.random.default_rng(3).integers(0, 256, (20, 20, 3), np.uint8)
    )
    assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
    assert blob.count(b"\xff\xda") == 10  # the 10-scan 3-component script


def test_jpeg_deterministic_bytes():
    from dwh_spark.multimodal.jpeg import jpeg_encode

    a = np.arange(24 * 32 * 3, dtype=np.uint8).reshape(24, 32, 3)
    assert jpeg_encode(a, quality=85) == jpeg_encode(a, quality=85)


# -------------------------------------------------------------------- GIF


def test_gif_lossless_roundtrip():
    from dwh_spark.multimodal.codecs import gif_decode, gif_encode

    rng = np.random.default_rng(11)
    for hw in ((24, 32), (17, 23), (1, 1), (64, 5)):
        pal = rng.integers(0, 256, (13, 3), np.uint8)
        a = pal[rng.integers(0, 13, hw)]
        dec = gif_decode(gif_encode(a))
        assert dec.shape == (*hw, 3)
        assert (dec == a).all()


def test_gif_256_colors_code_growth():
    """Full 256-color palette forces LZW code width growth toward 12
    bits and dictionary resets."""
    from dwh_spark.multimodal.codecs import gif_decode, gif_encode

    rng = np.random.default_rng(5)
    pal = np.array([[i, (i * 7) % 256, (i * 13) % 256] for i in range(256)], np.uint8)
    a = pal[rng.integers(0, 256, (80, 90))]
    assert (gif_decode(gif_encode(a)) == a).all()


def test_gif_rejects_garbage_and_too_many_colors():
    import pytest

    from dwh_spark.multimodal.codecs import gif_decode, gif_encode

    with pytest.raises(ValueError):
        gif_decode(b"NOTAGIF00")
    rng = np.random.default_rng(1)
    rainbow = rng.integers(0, 256, (32, 32, 3), np.uint8)
    while len(np.unique(rainbow.reshape(-1, 3), axis=0)) <= 256:
        rainbow = rng.integers(0, 256, (32, 32, 3), np.uint8)
    with pytest.raises(ValueError):
        gif_encode(rainbow)


def test_pixel_decoder_covers_jpeg_and_gif():
    """decode_and_resize's real decoder now takes jpeg and gif bytes
    end-to-end (decode → bicubic → PNG re-encode)."""
    from dwh_spark.multimodal.codecs import gif_encode, png_decode
    from dwh_spark.multimodal.images import pixel_decoder
    from dwh_spark.multimodal.jpeg import jpeg_encode

    a = np.full((24, 32, 3), 77, np.uint8)
    for blob, fmt in ((jpeg_encode(a, quality=100), "jpeg"), (gif_encode(a), "gif")):
        out = png_decode(pixel_decoder(blob, 16, 12, fmt))
        assert out.shape == (12, 16, 3)
        assert (out == 77).all()


# --------------------------------------------------------- decoder seam


def test_registry_image_decoder_seam():
    """A registered decoder for a format the vendored codecs lack
    (jp2) carries the full pixel path end-to-end; unregistered
    formats still raise."""
    import pytest

    from dwh_spark.multimodal import registry
    from dwh_spark.multimodal.codecs import png_decode
    from dwh_spark.multimodal.images import pixel_decoder

    registry._reset_for_tests()
    try:
        registry.register_image_decoder(
            "jp2", lambda data: np.full((8, 10, 3), data[0], np.uint8)
        )
        out = png_decode(pixel_decoder(b"\x63fake-jp2-bytes", 5, 4, "jp2"))
        assert out.shape == (4, 5, 3)
        assert (out == 0x63).all()
        with pytest.raises(NotImplementedError, match="ico"):
            pixel_decoder(b"who knows", 5, 4, "ico")
    finally:
        registry._reset_for_tests()


def test_registry_seam_reached_for_lossy_webp():
    """The lossy-VP8 won't-do rests on this: a registered 'webp'
    decoder must take over when the VENDORED webp codec raises
    NotImplementedError for a variant it can't decode — and the
    vendored path must still win for variants it can (VP8L)."""
    import struct

    import pytest

    from dwh_spark.multimodal import registry
    from dwh_spark.multimodal.codecs import png_decode, webp_encode
    from dwh_spark.multimodal.images import pixel_decoder
    from tests.test_codecs import _vp8_keyframe_header

    payload = _vp8_keyframe_header(16, 16) + b"\x00" * 8
    body = b"WEBPVP8 " + struct.pack("<I", len(payload)) + payload
    lossy = b"RIFF" + struct.pack("<I", len(body)) + body

    registry._reset_for_tests()
    try:
        with pytest.raises(NotImplementedError, match="VP8"):
            pixel_decoder(lossy, 4, 4, "webp")  # no plugin: honest raise
        registry.register_image_decoder(
            "webp", lambda data: np.full((8, 8, 3), 77, np.uint8)
        )
        out = png_decode(pixel_decoder(lossy, 4, 4, "webp"))
        assert out.shape == (4, 4, 3) and (out == 77).all()
        # vendored VP8L still decodes without consulting the plugin
        arr = np.full((6, 6, 3), 130, np.uint8)
        real = png_decode(pixel_decoder(webp_encode(arr), 6, 6, "webp"))
        assert (real == 130).all()
    finally:
        registry._reset_for_tests()


def test_registry_video_decoder_seam():
    """A fake fourcc ('FAKE') in biCompression routes the frame bytes
    to the registered decoder instead of raising."""
    import struct

    import pytest

    from dwh_spark.multimodal import codecs, registry

    # craft a 1-frame AVI then stamp a fake compressed fourcc into strf
    frames = np.full((1, 4, 6, 3), 9, np.uint8)
    blob = bytearray(codecs.avi_encode(frames))
    ix = bytes(blob).find(b"strf")
    # strf payload starts at ix+8; biCompression is bytes 16:20 of it
    blob[ix + 8 + 16 : ix + 8 + 20] = b"FAKE"
    registry._reset_for_tests()
    try:
        with pytest.raises(NotImplementedError, match="FAKE"):
            codecs.avi_decode_frame(bytes(blob), 0)

        def fake_decoder(frame_bytes, w, h):
            assert len(frame_bytes) > 0 and (w, h) == (6, 4)
            return np.full((h, w, 3), 42, np.uint8)

        registry.register_video_decoder("FAKE", fake_decoder)
        arr = codecs.avi_decode_frame(bytes(blob), 0)
        assert arr.shape == (4, 6, 3) and (arr == 42).all()
    finally:
        registry._reset_for_tests()


def test_registry_env_plugin_loading(tmp_path, monkeypatch):
    """$DWH_SPARK_CODEC_PLUGINS modules import (and register) on first
    lookup in a fresh process state — the executor-side pattern."""
    import sys

    from dwh_spark.multimodal import registry

    plugin = tmp_path / "fake_codec_plugin.py"
    plugin.write_text(
        "import numpy as np\n"
        "from dwh_spark.multimodal import registry\n"
        "registry.register_image_decoder('webp',"
        " lambda data: np.zeros((2, 2, 3), np.uint8))\n"
    )
    registry._reset_for_tests()
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setenv(registry.PLUGIN_ENV, "fake_codec_plugin")
    try:
        assert registry.get_image_decoder("webp") is not None
        assert registry.get_image_decoder("tiff") is None
    finally:
        registry._reset_for_tests()
        sys.modules.pop("fake_codec_plugin", None)


def test_avi_mjpeg_roundtrip():
    """MJPG AVI: '00dc' chunks are standalone baseline JPEGs decoded by
    the vendored codec; constant gray at q100 is exact, random gray is
    DCT-round-off bounded."""
    from dwh_spark.multimodal import codecs

    frames = np.empty((4, 12, 16, 3), np.uint8)
    for f in range(4):
        frames[f] = (f * 37 + 11) % 256
    blob = codecs.avi_encode_mjpeg(frames, quality=100)
    for f in range(4):
        arr = codecs.avi_decode_frame(blob, f)
        assert arr.shape == (12, 16, 3)
        assert (arr == (f * 37 + 11) % 256).all()
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (2, 24, 32), np.uint8)
    fr = np.repeat(g[:, :, :, None], 3, 3)
    blob = codecs.avi_encode_mjpeg(fr, quality=100)
    for f in range(2):
        err = np.abs(codecs.avi_decode_frame(blob, f).astype(int) - fr[f].astype(int)).max()
        assert err <= 3


def test_avi_unknown_fourcc_still_raises():
    import pytest

    from dwh_spark.multimodal import codecs, registry

    frames = np.zeros((1, 4, 6, 3), np.uint8)
    blob = bytearray(codecs.avi_encode(frames))
    ix = bytes(blob).find(b"strf")
    blob[ix + 8 + 16 : ix + 8 + 20] = b"H264"
    registry._reset_for_tests()
    try:
        with pytest.raises(NotImplementedError, match="H264"):
            codecs.avi_decode_frame(bytes(blob), 0)
    finally:
        registry._reset_for_tests()


# ------------------------------------------------------------------- TIFF


def test_tiff_roundtrip_none_and_lzw():
    from dwh_spark.multimodal.codecs import tiff_decode, tiff_encode

    rng = np.random.default_rng(17)
    for comp in ("none", "lzw"):
        a = rng.integers(0, 256, (23, 31, 3), np.uint8)
        dec = tiff_decode(tiff_encode(a, comp))
        assert dec.shape == (23, 31, 3) and (dec == a).all()
        g = rng.integers(0, 256, (9, 14), np.uint8)
        dec = tiff_decode(tiff_encode(g, comp))
        assert dec.shape == (9, 14, 1) and (dec[:, :, 0] == g).all()


def test_tiff_lzw_code_width_growth_and_reset():
    """A big random image pushes the LZW table past the 510/1022/2046
    early-change boundaries and the 4094 reset."""
    from dwh_spark.multimodal.codecs import tiff_decode, tiff_encode

    rng = np.random.default_rng(23)
    big = rng.integers(0, 256, (80, 120, 3), np.uint8)
    assert (tiff_decode(tiff_encode(big, "lzw")) == big).all()


def test_tiff_big_endian_and_packbits():
    """Hand-built MM (big-endian) gray TIFF with PackBits strips."""
    import struct as st

    from dwh_spark.multimodal.codecs import tiff_decode

    # 2x4 gray image rows: [10 10 10 10], [20 30 30 30]
    # packbits: (-3, 10) run of 4... encode: [0xFD, 10] = repeat 10 x4;
    # row2: literal 20 then repeat 30 x3: [0x00, 20, 0xFE, 30]
    payload = bytes([0xFD, 10, 0x00, 20, 0xFE, 30])
    entries = [
        (256, 3, 1, 4), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 32773),
        (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, 2),
        (279, 4, 1, len(payload)),
    ]
    ifd_size = 2 + 12 * len(entries) + 4
    data_off = 8 + ifd_size
    out = bytearray(b"MM\x00*" + st.pack(">I", 8))
    out += st.pack(">H", len(entries))
    for tag, typ, count, value in entries:
        if tag == 273:
            value = data_off
        if typ == 3:
            out += st.pack(">HHIHH", tag, typ, count, value, 0)
        else:
            out += st.pack(">HHII", tag, typ, count, value)
    out += st.pack(">I", 0)
    out += payload
    arr = tiff_decode(bytes(out))
    assert arr.shape == (2, 4, 1)
    assert arr[:, :, 0].tolist() == [[10, 10, 10, 10], [20, 30, 30, 30]]


def test_tiff_rejects_garbage_and_tiled():
    import pytest

    from dwh_spark.multimodal.codecs import tiff_decode

    with pytest.raises(ValueError):
        tiff_decode(b"NOTATIFF")


# ------------------------------------------------------------------ VP8L


def _vp8l_rt(arr, **kw):
    from dwh_spark.multimodal import vp8l

    out = vp8l.webp_decode(vp8l.webp_encode(arr, **kw))
    if arr.shape[2] == 3:
        assert out.shape == arr.shape
        assert np.array_equal(out, arr)
    else:
        assert out.shape == arr.shape
        assert np.array_equal(out, arr)


def test_vp8l_literal_lz77_cache_roundtrips():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    _vp8l_rt(arr, use_lz77=False)
    _vp8l_rt(arr)  # lz77 on
    _vp8l_rt(arr, cache_bits=6)
    # runs crossing row boundaries hit overlapping dist-1 copies
    runs = np.repeat(rng.integers(0, 256, (1, 5, 3), dtype=np.uint8), 40, 1)
    _vp8l_rt(runs.reshape(8, 25, 3), cache_bits=4)


def test_vp8l_all_predictor_modes_roundtrip():
    """Every inverse predictor (modes 0-13 incl. Select and the two
    ClampAddSubtract forms, RFC 9649 §4.2.4) reconstructs exactly."""
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (11, 19, 3), dtype=np.uint8)
    for mode in range(14):
        _vp8l_rt(arr, predictor_mode=mode, subtract_green=(mode % 2 == 0))


def test_vp8l_color_and_subtract_green_transforms():
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (9, 14, 3), dtype=np.uint8)
    _vp8l_rt(arr, subtract_green=True)
    # cross-color deltas are signed int8 multipliers
    _vp8l_rt(arr, color_transform=(34, 0xEC, 7), subtract_green=True)
    _vp8l_rt(arr, color_transform=(0x80, 0x7F, 0xFF))


def test_vp8l_palette_every_bundling_width():
    """Color-indexing at 8/4/2/1 pixels per byte (RFC 9649 §4.2.5)."""
    rng = np.random.default_rng(17)
    for ncol in (2, 4, 16, 200):
        vals = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = vals[rng.integers(0, ncol, (9, 31))]
        _vp8l_rt(img, palette=True)


def test_vp8l_alpha_and_edge_sizes():
    rng = np.random.default_rng(19)
    _vp8l_rt(rng.integers(0, 256, (8, 8, 4), dtype=np.uint8), cache_bits=4)
    _vp8l_rt(np.array([[[1, 2, 3]]], dtype=np.uint8))  # 1x1
    const = np.full((24, 32, 3), 77, np.uint8)
    data = __import__("dwh_spark.multimodal.vp8l", fromlist=["x"]).webp_encode(const)
    assert len(data) < 64  # single-symbol trees + one long copy
    _vp8l_rt(const)


def test_vp8l_distance_mapping_bijective():
    from dwh_spark.multimodal.vp8l import dist_to_plane, plane_to_dist

    for width in (5, 32, 1000):
        for dist in (1, 2, 5, 31, 32, 33, 100, 1000, 4095):
            assert plane_to_dist(dist_to_plane(dist, width), width) == dist


def test_vp8l_distance_map_pins_libwebp_table():
    """Pin the generated 2D distance map against libwebp's kCodeToPlane
    (packed (dy<<4)|(8-dx), so dx is in [-7, 8] — NOT [-8, 8]). A wrong
    lower bound self-roundtrips but mis-decodes real libwebp files at
    codes 103+."""
    from dwh_spark.multimodal.vp8l import DISTANCE_MAP

    assert len(DISTANCE_MAP) == 120
    # codes 1..16
    assert DISTANCE_MAP[:16] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    ]
    # codes 35..40 (the squared-distance-25 group)
    assert DISTANCE_MAP[34:40] == [
        (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    ]
    # codes 97..120 — the tail the -8 bound corrupted
    assert DISTANCE_MAP[96:] == [
        (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
        (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
        (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
    ]
    # every dx obeys the nibble packing bound
    assert all(-7 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in DISTANCE_MAP)


def test_webp_vp8x_wrapped_vp8l_decodes():
    """VP8X is only the extended-features header: a VP8L chunk behind it
    (libwebp output with EXIF/ICC metadata) must decode normally."""
    import struct

    import numpy as np

    from dwh_spark.multimodal.vp8l import webp_decode, webp_encode

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    plain = webp_encode(arr)
    assert plain[:4] == b"RIFF" and plain[8:12] == b"WEBP"
    chunks = plain[12:]  # the VP8L chunk (fourcc+size+payload[+pad])
    h, w = arr.shape[:2]
    vp8x_payload = bytes(10)  # no feature flags; canvas size fields
    vp8x_payload = (
        b"\x00\x00\x00\x00"
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little")
    )
    vp8x = b"VP8X" + struct.pack("<I", len(vp8x_payload)) + vp8x_payload
    body = b"WEBP" + vp8x + chunks
    wrapped = b"RIFF" + struct.pack("<I", len(body)) + body
    out = webp_decode(wrapped)
    assert np.array_equal(out, arr)


def test_vp8l_prefix_code_value_roundtrip():
    from dwh_spark.multimodal.vp8l import (
        BitReader,
        BitWriter,
        prefix_decode,
        prefix_encode,
    )

    for v in list(range(1, 70)) + [500, 4095, 4096]:
        code, extra, nbits = prefix_encode(v)
        bw = BitWriter()
        bw.write(extra, nbits)
        assert prefix_decode(code, BitReader(bw.getvalue() or b"\x00")) == v


def _vp8_keyframe_header(w: int, h: int, first_part: int = 77) -> bytes:
    """Build the 10-byte uncompressed VP8 key-frame header (RFC 6386
    §9.1): frame tag (key_frame bit 0 == 0, version 1, show 1,
    19-bit partition size), start code, 14+2-bit dims."""
    tag = (0) | (1 << 1) | (1 << 4) | (first_part << 5)
    return (
        bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        + b"\x9d\x01\x2a"
        + bytes([w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F])
    )


def test_webp_rejects_lossy_and_garbage():
    import struct

    import pytest

    from dwh_spark.multimodal.vp8l import webp_decode

    with pytest.raises(ValueError):
        webp_decode(b"not riff at all, definitely")
    payload = _vp8_keyframe_header(320, 240) + b"\x00" * 8
    body = b"WEBPVP8 " + struct.pack("<I", len(payload)) + payload
    lossy = b"RIFF" + struct.pack("<I", len(body)) + body
    # the raise carries the REAL dims parsed from the key-frame header
    with pytest.raises(NotImplementedError, match="320x240"):
        webp_decode(lossy)


def test_webp_animated_classified_as_unsupported_not_corrupt():
    """Animated WebP keeps its frames inside ANMF sub-chunks (no
    top-level image chunk), so it must raise NotImplementedError (needs
    a codec) rather than the corrupt-container ValueError."""
    import struct

    import pytest

    from dwh_spark.multimodal.vp8l import webp_decode

    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(10)
    anim = b"ANIM" + struct.pack("<I", 6) + bytes(6)
    anmf = b"ANMF" + struct.pack("<I", 16) + bytes(16)
    body = b"WEBP" + vp8x + anim + anmf
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="animated"):
        webp_decode(blob)
    # garbage container stays ValueError
    with pytest.raises(ValueError):
        webp_decode(b"RIFF\x04\x00\x00\x00WEBP")


def test_jpeg_undefined_component_and_table_ids_raise_value_error():
    """SOS naming a component absent from SOF, or a Huffman table never
    defined, must raise ValueError — not leak KeyError."""
    import struct

    import pytest

    from dwh_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    blob = jpeg_encode(np.zeros((8, 8, 3), np.uint8))

    def patched(mutate):
        out = bytearray(blob)
        pos = 2
        while pos + 4 <= len(out):
            marker = out[pos + 1]
            (ln,) = struct.unpack(">H", bytes(out[pos + 2 : pos + 4]))
            if marker == 0xDA:
                mutate(out, pos)
                return bytes(out)
            pos += 2 + ln
        raise AssertionError("no SOS")

    with pytest.raises(ValueError, match="undefined component"):
        jpeg_decode(patched(lambda b, p: b.__setitem__(p + 5, 9)))  # comp id 9
    with pytest.raises(ValueError, match="undefined DC table"):
        jpeg_decode(patched(lambda b, p: b.__setitem__(p + 6, 0x30)))  # Td=3


def test_vp8_frame_info_parses_keyframe_header():
    import pytest

    from dwh_spark.multimodal.vp8l import vp8_frame_info

    info = vp8_frame_info(_vp8_keyframe_header(1023, 77, first_part=4242))
    assert info["width"] == 1023 and info["height"] == 77
    assert info["version"] == 1 and info["show_frame"] is True
    assert info["first_part_size"] == 4242
    assert info["xscale"] == 0 and info["yscale"] == 0
    # interframe (key_frame bit set) and bad start code both reject
    bad = bytearray(_vp8_keyframe_header(8, 8))
    bad[0] |= 1
    with pytest.raises(ValueError, match="key frame"):
        vp8_frame_info(bytes(bad))
    bad2 = bytearray(_vp8_keyframe_header(8, 8))
    bad2[4] = 0x55
    with pytest.raises(ValueError, match="start code"):
        vp8_frame_info(bytes(bad2))
