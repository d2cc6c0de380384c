"""Minimal pure-Python/numpy image codecs: PNG + BMP decode, PNG + BMP
encode, bicubic resize.

The reference really decodes, bicubic-resizes, and re-encodes images
(`x/imgresizer/resizer.go:242-263`; PNG best-compression re-encode at
`resizer.go:49,184`). This container has no PIL, so the pixel path is
vendored from the public specs instead of stubbed:

- PNG per RFC 2083 / the W3C PNG spec: chunk walk, zlib inflate, all
  five scanline filters, color types 0/2/3/4/6, bit depths 1/2/4/8/16
  (16-bit reduces to the high byte), Adam7 interlace — the full
  still-image feature set.
- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed 24/32-bit,
  bottom-up or top-down.
- Resize: separable 4-tap bicubic convolution (Keys 1981, a = -0.5 —
  the same kernel family Go's resize libraries and PIL call BICUBIC),
  half-pixel center alignment, edge clamp. Fully numpy-vectorized:
  weights are computed per output coordinate and applied with fancy
  indexing — no per-pixel Python loop in the resize.

Everything here is deterministic: fixed zlib level, fixed filter
strategy (None), fixed rounding — so a re-encoded image's bytes are
reproducible across runs and partitions.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# Baseline JPEG lives in its own module (multimodal/jpeg.py) and
# WebP-lossless (VP8L) in multimodal/vp8l.py, but both are re-exported
# here so callers have one codec namespace.
from dwh_spark.multimodal.jpeg import (  # noqa: F401
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_progressive,
)
from dwh_spark.multimodal.vp8l import webp_decode, webp_encode  # noqa: F401

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type
_CTYPE_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(raw: bytes, stride: int, height: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering → (height, stride) uint8 of raw
    row bytes. ``stride`` is bytes per row, ``bpp`` the filter's
    left-neighbor offset (bytes per pixel, min 1 — so sub-byte depths
    use 1 per the spec).

    Filters None/Up are vectorized whole-row; Sub is a per-lane cumsum
    (recon[x] = raw[x] + recon[x-bpp] telescopes to a running sum);
    Average/Paeth carry a true left dependency and fall back to a
    per-column loop — our encoder always writes None, so the loop only
    runs on foreign PNGs.
    """
    rows = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    out = np.empty((height, stride), np.uint16)
    prior = np.zeros(stride, np.uint16)
    for y in range(height):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.uint16)
        if ftype == 0:  # None
            recon = line
        elif ftype == 1:  # Sub
            lanes = line.reshape(stride // bpp, bpp).astype(np.int64)
            recon = (np.cumsum(lanes, axis=0) % 256).reshape(stride).astype(np.uint16)
        elif ftype == 2:  # Up
            recon = (line + prior) % 256
        elif ftype == 3:  # Average
            recon = np.empty(stride, np.uint16)
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                recon[x] = (line[x] + (left + prior[x]) // 2) % 256
        elif ftype == 4:  # Paeth
            recon = np.empty(stride, np.uint16)
            for x in range(stride):
                a = int(recon[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                recon[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon
        prior = recon
    return out.astype(np.uint8)


def _unpack_samples(
    rowbytes: np.ndarray, pw: int, channels: int, depth: int
) -> np.ndarray:
    """Raw unfiltered row bytes (ph, stride) → samples (ph, pw,
    channels) uint8. Depth 16 keeps the high byte (the spec's sample
    reduction); sub-byte depths unpack MSB-first and scale grayscale
    later (palette indices are used raw)."""
    ph = rowbytes.shape[0]
    if depth == 8:
        return rowbytes[:, : pw * channels].reshape(ph, pw, channels)
    if depth == 16:
        return rowbytes[:, : pw * channels * 2].reshape(ph, pw, channels, 2)[
            :, :, :, 0
        ]
    # depth 1/2/4: single-channel only (gray or palette index)
    per = 8 // depth
    mask = (1 << depth) - 1
    shifts = [8 - depth * (i + 1) for i in range(per)]
    cols = [(rowbytes >> s) & mask for s in shifts]
    samples = np.stack(cols, axis=2).reshape(ph, -1)[:, :pw]
    return samples.reshape(ph, pw, 1)


def _png_stride(pw: int, channels: int, depth: int) -> int:
    return (pw * channels * depth + 7) // 8


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 array (C per source color type;
    palette images expand to RGB). Full spec coverage: color types
    0/2/3/4/6, bit depths 1/2/4/8/16 (16-bit reduces to the high
    byte), and Adam7 interlace (each pass is an independently filtered
    sub-image scattered into the output grid)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    idat: list[bytes] = []
    palette = None
    w = h = ctype = depth = interlace = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"bad PNG bit depth {depth}")
            if depth < 8 and ctype not in (0, 3):
                raise ValueError(f"depth {depth} invalid for color type {ctype}")
            if comp or filt:
                raise ValueError("bad IHDR compression/filter method")
        elif typ == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    channels = _CTYPE_CHANNELS[ctype]
    bpp = max(1, channels * depth // 8)
    buf = zlib.decompress(b"".join(idat))
    samples = np.zeros((h, w, channels), np.uint8)
    if interlace:
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            stride = _png_stride(pw, channels, depth)
            need = ph * (stride + 1)
            rowbytes = _unfilter(buf[off : off + need], stride, ph, bpp)
            off += need
            samples[y0::ys, x0::xs] = _unpack_samples(rowbytes, pw, channels, depth)
    else:
        stride = _png_stride(w, channels, depth)
        rowbytes = _unfilter(buf, stride, h, bpp)
        samples = _unpack_samples(rowbytes, w, channels, depth)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        return palette[samples[:, :, 0]]
    if depth < 8:  # grayscale: scale to full 8-bit range (255/(2^d-1))
        samples = (samples.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
    return samples


def png_encode(arr: np.ndarray, level: int = 9, interlace: bool = False) -> bytes:
    """(H, W[, C]) uint8 → PNG bytes. Filter None on every scanline and
    a fixed zlib level (9 = the reference's png.BestCompression,
    resizer.go:49) keep the output byte-deterministic. ``interlace``
    writes Adam7 pass order (depth 8 only; mostly useful to exercise
    the deinterlacing decode path with real streams)."""
    arr = np.ascontiguousarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if interlace:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = arr[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty passes carry no bytes, not even filters
            parts.extend(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0]))
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1 if interlace else 0)

    def chunk(typ: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level))
        + chunk(b"IEND", b"")
    )


def bmp_decode(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → (H, W, 3|4) uint8 RGB(A)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    (pix_offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size}")
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    h = abs(h_raw)
    nbytes = bpp // 8
    row_bytes = (w * nbytes + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        data[pix_offset : pix_offset + row_bytes * h], np.uint8
    ).reshape(h, row_bytes)[:, : w * nbytes].reshape(h, w, nbytes)
    if h_raw > 0:  # bottom-up storage
        rows = rows[::-1]
    # BGR(A) → RGB(A)
    if nbytes == 3:
        return np.ascontiguousarray(rows[:, :, ::-1])
    return np.ascontiguousarray(rows[:, :, [2, 1, 0, 3]])


def bmp_encode(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BMP bytes (fixture
    generator; the pipeline re-encodes to PNG like the reference)."""
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("bmp_encode expects RGB")
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    bgr = arr[::-1, :, ::-1]  # bottom-up, BGR
    body = b"".join(bgr[y].tobytes() + b"\x00" * pad for y in range(h))
    pix_offset = 14 + 40
    file_size = pix_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def _cubic_weights(frac: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys bicubic kernel weights for the 4 taps at offsets
    (-1, 0, +1, +2) around each sample position; frac in [0, 1)."""
    # distances from the sample position to each tap
    d = np.stack([frac + 1.0, frac, 1.0 - frac, 2.0 - frac])
    x = np.abs(d)
    w = np.where(
        x <= 1.0,
        (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0,
        np.where(x < 2.0, a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    # normalize: clamped taps at the borders would otherwise shift gain
    return w / w.sum(axis=0, keepdims=True)


def _resample_axis(arr: np.ndarray, out_n: int, axis: int) -> np.ndarray:
    in_n = arr.shape[axis]
    # half-pixel center alignment: dst center i+0.5 maps to src coord
    pos = (np.arange(out_n) + 0.5) * (in_n / out_n) - 0.5
    base = np.floor(pos).astype(np.int64)
    frac = pos - base
    weights = _cubic_weights(frac)  # (4, out_n)
    taps = np.clip(base[None, :] + np.arange(-1, 3)[:, None], 0, in_n - 1)  # (4, out_n)
    moved = np.moveaxis(arr, axis, 0).astype(np.float64)  # (in_n, ...)
    gathered = moved[taps]  # (4, out_n, ...)
    extra = (1,) * (gathered.ndim - 2)
    out = (gathered * weights.reshape(4, out_n, *extra)).sum(axis=0)
    return np.moveaxis(out, 0, axis)


def resize_bicubic(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Separable bicubic resize of (H, W[, C]) uint8 → uint8.

    Exact on constant and linear-gradient interiors (the Keys kernel
    reproduces degree-1 polynomials); deterministic rounding via
    np.rint then clip.
    """
    out = _resample_axis(arr, out_h, 0)
    out = _resample_axis(out, out_w, 1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ AVI
# Minimal RIFF/AVI support: UNCOMPRESSED ('DIB ') streams decode from
# the raw BGR planes; Motion-JPEG ('MJPG') streams decode through the
# vendored baseline JPEG codec (each '00dc' chunk is a standalone
# JPEG). Other compressed codecs (h264/vp9) genuinely need ffmpeg/PyAV
# — they route through the multimodal/registry.py plugin seam.


def _riff_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        typ = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield typ, pos + 8, ln
        pos += 8 + ln + (ln & 1)  # chunks pad to even offsets


def avi_encode(frames: np.ndarray, fps: int = 24) -> bytes:
    """(N, H, W, 3) uint8 RGB → uncompressed AVI ('DIB ' frames,
    bottom-up BGR rows padded to 4 bytes, one '00db' chunk each)."""
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError("avi_encode expects RGB frames")
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    frame_size = row_bytes * h

    def dib(f: np.ndarray) -> bytes:
        bgr = f[::-1, :, ::-1]
        return b"".join(bgr[y].tobytes() + b"\x00" * pad for y in range(h))

    movi_items = b"".join(
        b"00db" + struct.pack("<I", frame_size) + dib(f) for f in frames
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_items)) + b"movi" + movi_items
    strf_payload = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    strf = b"strf" + struct.pack("<I", len(strf_payload)) + strf_payload
    strh_payload = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strh = b"strh" + struct.pack("<I", len(strh_payload)) + strh_payload
    strl_items = strh + strf
    strl = b"LIST" + struct.pack("<I", 4 + len(strl_items)) + b"strl" + strl_items
    avih_payload = struct.pack(
        "<IIIIIIIIII", 1_000_000 // fps, frame_size * fps, 0, 0, n, 0, 1,
        frame_size, w, h,
    ) + b"\x00" * 16
    avih = b"avih" + struct.pack("<I", len(avih_payload)) + avih_payload
    hdrl_items = avih + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_items)) + b"hdrl" + hdrl_items
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode_frame(data: bytes, frame_ix: int) -> np.ndarray:
    """Decode the ``frame_ix``-th uncompressed frame of an AVI →
    (H, W, 3) uint8 RGB. Walks the RIFF tree for the stream format
    (strf = BITMAPINFOHEADER) and the movi '00db'/'00dc' chunks."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF signature")
    strf: bytes | None = None
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal strf
        for typ, start, ln in _riff_chunks(data, pos, end):
            if typ == b"LIST":
                walk(start + 4, start + ln)
            elif typ == b"strf" and strf is None:
                strf = data[start : start + ln]
            elif typ in (b"00db", b"00dc"):
                frames.append((start, ln))

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    if strf is None or not frames:
        raise ValueError("truncated AVI: missing strf/movi frames")
    _, w, h_raw = struct.unpack("<Iii", strf[:12])
    (bpp,) = struct.unpack("<H", strf[14:16])
    # Dispatch on biCompression BEFORE trusting bpp: a compressed
    # stream (e.g. MJPEG) can advertise 24 bpp and would otherwise be
    # silently mis-decoded as raw BGR garbage.
    (bi_compression,) = struct.unpack("<I", strf[16:20])
    if bi_compression != 0:
        if not 0 <= frame_ix < len(frames):
            raise IndexError(f"frame {frame_ix} of {len(frames)}")
        start, ln = frames[frame_ix]
        fourcc = strf[16:20].decode("latin1")
        if fourcc in ("MJPG", "mjpg"):
            # Motion-JPEG: every '00dc' chunk is a standalone baseline
            # JPEG — decoded by the vendored jpeg.py. (MJPEG variants
            # that omit DHT rely on default Annex-K tables the stream
            # doesn't carry; jpeg_decode raises on those honestly.)
            return jpeg_decode(data[start : start + ln])
        # other fourccs (h264/vp9/...) route through the plugin seam
        # (multimodal/registry.py): a deployment with PyAV/ffmpeg
        # registers decoders without touching this walk
        from dwh_spark.multimodal import registry

        plugged = registry.get_video_decoder(fourcc)
        if plugged is None:
            raise NotImplementedError(
                f"AVI biCompression={fourcc!r} (vendored: BI_RGB + MJPG; "
                "register others via multimodal.registry / "
                "$DWH_SPARK_CODEC_PLUGINS)"
            )
        return np.asarray(
            plugged(data[start : start + ln], w, abs(h_raw)), np.uint8
        )
    if bpp != 24:
        raise NotImplementedError(f"AVI bpp={bpp} (only uncompressed 24-bit)")
    if not 0 <= frame_ix < len(frames):
        raise IndexError(f"frame {frame_ix} of {len(frames)}")
    start, ln = frames[frame_ix]
    h = abs(h_raw)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(data[start : start + row_bytes * h], np.uint8).reshape(
        h, row_bytes
    )[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])


# ------------------------------------------------------------------- GIF
# GIF87a/89a first-frame decode + a fixture encoder, per the public
# GIF89a specification. The reference's resize pipeline accepts gif
# (x/imgresizer/resizer.go:253); first-frame decode is what its
# image.Decode call produces for animations too. GIF is palette-based
# and LOSSLESS, so fixture images round-trip bit-exactly — unlike
# JPEG, no quality caveats. LZW codes pack LSB-first (opposite of
# JPEG's bitstream).


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    # bit reader, LSB-first
    acc = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    dict_: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while n_out < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            dict_ = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = dict_[code]
        elif code < len(dict_):
            entry = dict_[code]
            dict_.append(prev + entry[:1])
        elif code == len(dict_):  # KwKwK case
            entry = prev + prev[:1]
            dict_.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, np.uint8)
        n_out += len(entry)
        prev = entry
        if len(dict_) == (1 << code_size) and code_size < 12:
            code_size += 1
    return out[:n_pixels]


def gif_decode(data: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 RGB of the FIRST frame (composited
    onto the logical screen is out of scope: frame 0 at its own size,
    like image/gif's Decode of the first image)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        introducer = data[pos]
        if introducer == 0x3B:  # trailer
            break
        if introducer == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if introducer != 0x2C:
            raise ValueError(f"unexpected GIF block {introducer:#x}")
        _left, _top, w, h, ipacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        palette = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image without a color table")
        min_code_size = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(b"".join(chunks), min_code_size, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: 4-pass row order
            deinter = np.empty_like(idx)
            rows = np.concatenate([
                np.arange(0, h, 8), np.arange(4, h, 8),
                np.arange(2, h, 4), np.arange(1, h, 2),
            ])
            deinter[rows] = idx
            idx = deinter
        return np.ascontiguousarray(palette[idx])
    raise ValueError("truncated GIF: no image descriptor")


def _gif_lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    buf = b""
    for px in indices.tolist():
        cand = buf + bytes([px])
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        # decoder widens after SEEING the code that fills the width
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code > 4095:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        buf = bytes([px])
    if buf:
        emit(table[buf])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB with ≤256 distinct colors → GIF89a bytes
    (fixture generator; lossless, single frame, global color table)."""
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("gif_encode expects RGB")
    flat = arr.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"gif_encode: {len(palette)} colors (max 256)")
    # color table size must be a power of two ≥ 2
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), np.uint8)
    table[: len(palette)] = palette
    min_code_size = max(2, bits)
    lzw = _gif_lzw_encode(idx.astype(np.uint8), min_code_size)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([min_code_size])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def avi_encode_mjpeg(frames: np.ndarray, quality: int = 100, fps: int = 24) -> bytes:
    """(N, H, W, 3) uint8 RGB → Motion-JPEG AVI: one standalone
    baseline JPEG (multimodal/jpeg.py) per '00dc' chunk,
    biCompression='MJPG'. The compressed-codec fixture generator —
    at quality=100 a constant-GRAY frame round-trips exactly (the
    jpeg.py identity), which the oracle-pinned query exploits."""
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError("avi_encode_mjpeg expects RGB frames")
    blobs = [jpeg_encode(f, quality=quality, subsampling="4:2:0") for f in frames]
    movi_items = b"".join(
        b"00dc" + struct.pack("<I", len(b)) + b + (b"\x00" if len(b) & 1 else b"")
        for b in blobs
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_items)) + b"movi" + movi_items
    max_size = max(len(b) for b in blobs)
    strf_payload = struct.pack(
        "<Iii HH 4s IiiII".replace(" ", ""),
        40, w, h, 1, 24, b"MJPG", max_size, 0, 0, 0, 0,
    )
    strf = b"strf" + struct.pack("<I", len(strf_payload)) + strf_payload
    strh_payload = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_size, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strh = b"strh" + struct.pack("<I", len(strh_payload)) + strh_payload
    strl_items = strh + strf
    strl = b"LIST" + struct.pack("<I", 4 + len(strl_items)) + b"strl" + strl_items
    avih_payload = struct.pack(
        "<IIIIIIIIII", 1_000_000 // fps, max_size * fps, 0, 0, n, 0, 1,
        max_size, w, h,
    ) + b"\x00" * 16
    avih = b"avih" + struct.pack("<I", len(avih_payload)) + avih_payload
    hdrl_items = avih + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_items)) + b"hdrl" + hdrl_items
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------------- TIFF
# Baseline TIFF 6.0 decode (x/imgresizer/resizer.go:252's format):
# both byte orders, chunky planar config, strip-organized, 8-bit
# samples, Compression = none / LZW (TIFF variant: MSB-first packing,
# early code-width change) / PackBits, Photometric = gray (0/1), RGB,
# palette. Tiled TIFFs, 16-bit samples and planar=2 raise honestly.


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW: MSB-first bit order, codes 256=Clear 257=EOI,
    width bumps EARLY (at table sizes 510/1022/2046, one code before
    the GIF convention)."""
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expected and bitpos + width <= nbits:
        code = 0
        for _ in range(width):
            code = (code << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        if code == 256:
            reset()
            continue
        if code == 257:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW code")
        out += entry
        prev = entry
        if len(table) in (510, 1022, 2046):  # early change
            width += 1
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    accbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            out.append((acc >> (accbits - 8)) & 0xFF)
            accbits -= 8
        acc &= (1 << accbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256)  # Clear
    buf = b""
    for byte in data:
        cand = buf + bytes([byte])
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code in (511, 1023, 2047):  # early change, encoder side
            width += 1
        if next_code >= 4094:
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        buf = bytes([byte])
    if buf:
        emit(table[buf])
    emit(257)  # EOI
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < expected and pos < len(data):
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out[:expected])


def tiff_decode(data: bytes) -> np.ndarray:
    """TIFF bytes (first IFD) → (H, W, C) uint8 (C=1 gray, 3 RGB)."""
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order signature")

    def u16(pos: int) -> int:
        return struct.unpack(bo + "H", data[pos : pos + 2])[0]

    def u32(pos: int) -> int:
        return struct.unpack(bo + "I", data[pos : pos + 4])[0]

    ifd = u32(4)
    n_entries = u16(ifd)
    tags: dict[int, list[int]] = {}
    _SZ = {1: 1, 3: 2, 4: 4}
    for e in range(n_entries):
        p = ifd + 2 + 12 * e
        tag, typ = u16(p), u16(p + 2)
        count = u32(p + 4)
        if typ not in _SZ:
            continue  # RATIONAL resolutions etc. — not needed
        size = _SZ[typ] * count
        vp = p + 8 if size <= 4 else u32(p + 8)
        rd = {1: lambda q: data[q], 3: u16, 4: u32}[typ]
        tags[tag] = [rd(vp + _SZ[typ] * i) for i in range(count)]

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w, h = one(256), one(257)
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    planar = one(284, 1)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} (only 8)")
    if planar != 1:
        raise NotImplementedError("TIFF planar configuration 2")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts:
        raise ValueError("TIFF missing strip offsets/byte counts")
    rows_per_strip = one(278, h)

    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = bytes(data[off : off + cnt])
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        expected = n_rows * w * spp
        if compression == 1:
            raw += strip[:expected]
        elif compression == 5:
            raw += _tiff_lzw_decode(strip, expected)
        elif compression == 32773:
            raw += _packbits_decode(strip, expected)
        else:
            raise NotImplementedError(f"TIFF compression {compression}")
    arr = np.frombuffer(bytes(raw), np.uint8)
    if len(arr) < h * w * spp:
        raise ValueError("truncated TIFF strip data")
    arr = arr[: h * w * spp].reshape(h, w, spp)
    if photometric == 0:  # white-is-zero gray
        return (255 - arr[:, :, :1]).astype(np.uint8)
    if photometric == 1:  # black-is-zero gray
        return arr[:, :, :1]
    if photometric == 2:  # RGB (ignore any extra/alpha samples)
        return np.ascontiguousarray(arr[:, :, :3])
    if photometric == 3:  # palette: ColorMap is 16-bit per channel
        cmap = tags.get(320)
        if not cmap:
            raise ValueError("palette TIFF without ColorMap")
        n = len(cmap) // 3
        pal = (np.array(cmap, np.uint16).reshape(3, n).T >> 8).astype(np.uint8)
        return pal[arr[:, :, 0]]
    raise NotImplementedError(f"TIFF photometric {photometric}")


def tiff_encode(arr: np.ndarray, compression: str = "none") -> bytes:
    """(H, W, 3) RGB or (H, W) gray uint8 → little-endian chunky TIFF,
    one strip, Compression none|lzw (fixture generator)."""
    arr = np.ascontiguousarray(arr, np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else arr.shape[2]
    if not gray and spp != 3:
        raise ValueError("tiff_encode expects RGB or gray")
    payload = arr.tobytes()
    comp_tag = {"none": 1, "lzw": 5}[compression]
    if compression == "lzw":
        payload = _tiff_lzw_encode(payload)

    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value
    header_size = 8
    n_tags = 9 if gray else 10
    ifd_size = 2 + 12 * n_tags + 4
    bps_off = header_size + ifd_size  # BitsPerSample array for RGB
    data_off = bps_off + (6 if not gray else 0)
    entries.append((256, 3, 1, w))
    entries.append((257, 3, 1, h))
    if gray:
        entries.append((258, 3, 1, 8))
    else:
        entries.append((258, 3, 3, bps_off))
    entries.append((259, 3, 1, comp_tag))
    entries.append((262, 3, 1, 1 if gray else 2))
    entries.append((273, 4, 1, data_off))
    entries.append((277, 3, 1, spp))
    entries.append((278, 3, 1, h))
    entries.append((279, 4, 1, len(payload)))
    if not gray:
        entries.append((284, 3, 1, 1))
    entries.sort()
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        if typ == 3 and count == 1:
            out += struct.pack("<HHIHH", tag, typ, count, value, 0)
        else:
            out += struct.pack("<HHII", tag, typ, count, value)
    out += struct.pack("<I", 0)  # no next IFD
    if not gray:
        out += struct.pack("<HHH", 8, 8, 8)
    out += payload
    return bytes(out)
