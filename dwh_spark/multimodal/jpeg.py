"""Pure-numpy baseline-sequential JPEG (ITU-T T.81) codec.

The reference decodes JPEG in its image-resize pipeline
(`x/imgresizer/resizer.go:244-255`; its e2e test exercises jpeg among
7 formats, `x/imgresizer/resizer_test.go:10-27`). This container has
no PIL/libjpeg, so — like the PNG/BMP codecs in codecs.py — the format
is vendored from the public spec:

- **Decode** (the product path): baseline DCT (SOF0/SOF1) AND
  progressive (SOF2) — multi-scan spectral selection + successive
  approximation per T.81 G.2 (DC/AC × first/refinement scans, EOB-run
  coding, correction bits, non-interleaved component block grids).
  Huffman and quant tables are read from the file's own DHT/DQT
  segments (so real-world JPEGs with Annex-K or optimized tables
  decode, not just our own output), any sampling factors in
  {1,2}×{1,2} (covers 4:4:4, 4:2:0, 4:2:2, 4:4:0), 1- or 3-component
  scans, restart markers (DRI/RSTn). Arithmetic coding, hierarchical
  and 12-bit precision raise NotImplementedError honestly.
- **Encode** (fixture generator): interchange-format JFIF writer with
  IJG-style quality scaling of the Annex-K-shaped quant tables
  (quality=100 → all-ones tables), flat canonical Huffman tables
  (4-bit DC / 8-bit AC codes — spec-valid, self-described in DHT,
  chosen over memorized Annex-K tables so a transcription slip can't
  corrupt the bitstream), 4:2:0 or 4:4:4 subsampling; plus a
  progressive writer (jpeg_encode_progressive) emitting the standard
  10-scan script, coefficient-identical to the baseline writer so
  cross-decode equality is a meaningful test.

Determinism: every rounding site uses np.rint (ties-to-even) and the
bit-writer pads with 1-bits per spec, so encode bytes are reproducible
across runs and partitions.

Entropy coding is per-block Python (inherently sequential bitstream);
DCT/IDCT, color transform, subsample/upsample are batched numpy over
all blocks of a plane at once. At pipeline level parallelism comes
from Arrow-batched mapInPandas over rows, not from inside one image.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

# Zigzag scan: raster index of each zigzag position (T.81 Figure 5).
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

# Annex-K-shaped base quantization tables (luminance / chrominance),
# natural (raster) order; scaled by IJG quality before use.
_BASE_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.float64)
_BASE_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.float64)

# Orthonormal 8-point DCT-II matrix: forward F = C·b·Cᵀ, inverse b = Cᵀ·F·C.
_k = np.arange(8)
_DCT = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16)
_DCT[0] = np.sqrt(1.0 / 8.0)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling; quality=100 → all-ones (lossless-DC) tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    out = []
    for base in (_BASE_Q_LUMA, _BASE_Q_CHROMA):
        out.append(np.clip(np.floor((base * scale + 50.0) / 100.0), 1, 255))
    return out[0], out[1]


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _plane_to_blocks(plane: np.ndarray) -> np.ndarray:
    """(BV·8, BH·8) → (BV·BH, 8, 8) in MCU-friendly raster block order."""
    bv, bh = plane.shape[0] // 8, plane.shape[1] // 8
    return plane.reshape(bv, 8, bh, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def _blocks_to_plane(blocks: np.ndarray, bv: int, bh: int) -> np.ndarray:
    return blocks.reshape(bv, bh, 8, 8).transpose(0, 2, 1, 3).reshape(bv * 8, bh * 8)


# ------------------------------------------------------------------ bit I/O


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


class _MarkerReached(Exception):
    pass


class _BitReader:
    """MSB-first bit reader over entropy-coded data; unstuffs 0xFF 0x00,
    stops (raises _MarkerReached) at any real marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise _MarkerReached
            self.pos += 2
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, index: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.acc = 0
        self.n = 0
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + (index % 8):
            raise ValueError("missing expected JPEG restart marker")
        self.pos += 2


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical (length, code) → symbol map from a DHT BITS/HUFFVAL spec."""
    table: dict = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol → (code, length) from the same canonical construction."""
    table: dict = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return table


# Encoder Huffman specs: flat canonical codes — every DC category is a
# 4-bit code, every AC (run,size) symbol an 8-bit code. Spec-valid
# (all-ones code unused: 12 ≤ 15 and 162 ≤ 255) and fully described by
# the DHT segment we emit, so any conformant decoder reads them.
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = (
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_ENC_AC_BITS = [0] * 7 + [len(_ENC_AC_VALS)] + [0] * 8


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (category, appended bits)."""
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ------------------------------------------------------------------- encode


@dataclass
class _Comp:
    cid: int
    h: int
    v: int
    tq: int  # quant table id


def _encode_prep(
    arr: np.ndarray, quality: int, subsampling: str
) -> tuple[int, int, list[_Comp], dict[int, np.ndarray], list[np.ndarray], int, int]:
    """Shared encoder front half: color transform, subsample, pad,
    batched DCT, quantize. Returns (h, w, comps, qtables, per-comp
    quantized-zigzag block arrays shaped (mcu_rows*v, mcu_cols*h, 64),
    mcu_rows, mcu_cols)."""
    arr = np.asarray(arr, np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qluma, qchroma = _quality_tables(quality)
    if gray:
        comps = [_Comp(1, 1, 1, 0)]
        planes = [arr.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        if subsampling == "4:2:0":
            comps = [_Comp(1, 2, 2, 0), _Comp(2, 1, 1, 1), _Comp(3, 1, 1, 1)]
        elif subsampling == "4:4:4":
            comps = [_Comp(1, 1, 1, 0), _Comp(2, 1, 1, 1), _Comp(3, 1, 1, 1)]
        elif subsampling == "4:2:2":  # chroma halved horizontally only
            comps = [_Comp(1, 2, 1, 0), _Comp(2, 1, 1, 1), _Comp(3, 1, 1, 1)]
        elif subsampling == "4:4:0":  # chroma halved vertically only
            comps = [_Comp(1, 1, 2, 0), _Comp(2, 1, 1, 1), _Comp(3, 1, 1, 1)]
        else:
            raise ValueError(
                f"subsampling {subsampling!r} (4:2:0, 4:2:2, 4:4:0 or 4:4:4)"
            )
        planes = []
        max_h = max(c.h for c in comps)
        max_v = max(c.v for c in comps)
        for ci, c in enumerate(comps):
            p = ycc[:, :, ci]
            if (c.h, c.v) != (max_h, max_v):
                # box-average downsample (pad to even with edge rows first)
                fy, fx = max_v // c.v, max_h // c.h
                ph = p if h % fy == 0 else np.pad(p, ((0, fy - h % fy), (0, 0)), "edge")
                ph = ph if w % fx == 0 else np.pad(ph, ((0, 0), (0, fx - w % fx)), "edge")
                p = ph.reshape(ph.shape[0] // fy, fy, ph.shape[1] // fx, fx).mean((1, 3))
                p = np.rint(p)
            planes.append(p)
    max_h = max(c.h for c in comps)
    max_v = max(c.v for c in comps)
    mcu_cols = -(-w // (8 * max_h))
    mcu_rows = -(-h // (8 * max_v))
    qtables = {0: qluma, 1: qchroma}

    # per-component quantized zigzag blocks, vectorized DCT per plane
    comp_blocks: list[np.ndarray] = []
    for c, p in zip(comps, planes):
        th, tw = mcu_rows * c.v * 8, mcu_cols * c.h * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), "edge")
        blocks = _plane_to_blocks(p - 128.0)  # level shift
        coefs = _DCT @ blocks @ _DCT.T
        q = np.rint(coefs / qtables[c.tq].reshape(8, 8)).astype(np.int64)
        zz = q.reshape(-1, 64)[:, ZIGZAG]
        comp_blocks.append(zz.reshape(mcu_rows * c.v, mcu_cols * c.h, 64))
    return h, w, comps, qtables, comp_blocks, mcu_rows, mcu_cols


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _emit_headers(
    h: int,
    w: int,
    comps: list[_Comp],
    qtables: dict[int, np.ndarray],
    sof_marker: int,
    dht_specs: list[tuple[int, list[int], list[int]]],
) -> bytearray:
    """SOI + JFIF + DQT + SOFn + DHT segments (shared marker prologue)."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq in sorted({c.tq for c in comps}):
        zz_q = qtables[tq][ZIGZAG].astype(np.uint8)  # DQT is zigzag order
        out += _seg(0xFFDB, bytes([tq]) + zz_q.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += bytes([c.cid, (c.h << 4) | c.v, c.tq])
    out += _seg(sof_marker, sof)
    for tc_th, bits, vals in dht_specs:
        out += _seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    return out


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) uint8 gray → baseline JFIF bytes.

    quality=100 gives all-ones quant tables: constant-gray input then
    round-trips EXACTLY (DC is integral, AC zero, chroma 128) — the
    property the oracle-pinned fixture query relies on.

    restart_interval > 0 emits a DRI segment and RSTn markers every
    that many MCUs (camera output uses this pervasively) so the
    decoder's resync path gets real coverage.
    """
    h, w, comps, qtables, comp_blocks, mcu_rows, mcu_cols = _encode_prep(
        arr, quality, subsampling
    )
    dc_enc = _huff_encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _huff_encode_table(_ENC_AC_BITS, _ENC_AC_VALS)
    bw = _BitWriter()
    dc_pred = [0] * len(comps)
    mcu_index = 0
    for mr in range(mcu_rows):
        for mc in range(mcu_cols):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + (mcu_index // restart_interval - 1) % 8]
                )
                dc_pred = [0] * len(comps)
            mcu_index += 1
            for ci, c in enumerate(comps):
                for bv in range(c.v):
                    for bh in range(c.h):
                        zz = comp_blocks[ci][mr * c.v + bv, mc * c.h + bh]
                        diff = int(zz[0]) - dc_pred[ci]
                        dc_pred[ci] = int(zz[0])
                        size, bits = _magnitude(diff)
                        code, ln = dc_enc[size]
                        bw.write(code, ln)
                        bw.write(bits, size)
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                        for i in range(1, last_nz + 1):
                            v = int(zz[i])
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                code, ln = ac_enc[0xF0]  # ZRL
                                bw.write(code, ln)
                                run -= 16
                            size, bits = _magnitude(v)
                            code, ln = ac_enc[(run << 4) | size]
                            bw.write(code, ln)
                            bw.write(bits, size)
                            run = 0
                        if last_nz < 63:
                            code, ln = ac_enc[0x00]  # EOB
                            bw.write(code, ln)
    bw.flush()

    out = _emit_headers(
        h, w, comps, qtables, 0xFFC0,
        [(0x00, _ENC_DC_BITS, _ENC_DC_VALS), (0x10, _ENC_AC_BITS, _ENC_AC_VALS)],
    )
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c.cid, 0x00])  # DC table 0, AC table 0 for all comps
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += _seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -------------------------------------------------- progressive encode
#
# Fixture generator for the progressive decode path. Uses the standard
# spectral-selection + successive-approximation script (the shape
# libjpeg's jpeg_simple_progression emits), so the decoder's four scan
# kinds — DC first, DC refine, AC first (EOB-run coded), AC refine
# (correction bits) — are all exercised, including EOB runs spanning
# blocks with buffered correction bits.

# Progressive AC table: the sequential flat table lacks the EOBn
# symbols (r<<4)|0 for r in 1..14 that EOB-run coding emits. 176
# symbols still fit 8-bit flat codes (176 <= 255, all-ones unused).
_ENC_ACP_VALS = (
    [r << 4 for r in range(15)]  # EOB0..EOB14 (0x00 is EOB0)
    + [0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_ENC_ACP_BITS = [0] * 7 + [len(_ENC_ACP_VALS)] + [0] * 8


class _ProgScanWriter:
    """Entropy writer for one progressive scan: wraps _BitWriter with
    EOB-run accounting and (for refinement scans) the correction-bit
    buffer that must flush right after the next emitted symbol."""

    def __init__(self, dc_enc: dict, ac_enc: dict) -> None:
        self.bw = _BitWriter()
        self.dc_enc = dc_enc
        self.ac_enc = ac_enc
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits owed to older blocks

    def sym_ac(self, rs: int) -> None:
        code, ln = self.ac_enc[rs]
        self.bw.write(code, ln)

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym_ac(r << 4)
            self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for bit in self.pending:
            self.bw.write(bit, 1)
        self.pending = []

    def restart(self, idx: int) -> None:
        """Byte-align and emit RSTn (raw, unstuffed) between restart
        intervals; pending EOB runs must flush first per T.81."""
        self.emit_eobrun()
        self.bw.flush()
        self.bw.out += bytes([0xFF, 0xD0 + idx % 8])

    def finish(self) -> bytes:
        self.emit_eobrun()
        self.bw.flush()
        return bytes(self.bw.out)


def _enc_dc_first(w: _ProgScanWriter, dc: int, pred: int, al: int) -> int:
    v = dc >> al  # arithmetic shift (point transform, T.81 G.1.2.1)
    size, bits = _magnitude(v - pred)
    code, ln = w.dc_enc[size]
    w.bw.write(code, ln)
    w.bw.write(bits, size)
    return v


def _enc_dc_refine(w: _ProgScanWriter, dc: int, al: int) -> None:
    w.bw.write((dc >> al) & 1, 1)


def _enc_ac_first(w: _ProgScanWriter, zz: np.ndarray, ss: int, se: int, al: int) -> None:
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        v = v >> al if v >= 0 else -((-v) >> al)  # toward-zero point transform
        if v == 0:
            run += 1
            continue
        w.emit_eobrun()
        while run > 15:
            w.sym_ac(0xF0)
            run -= 16
        size, bits = _magnitude(v)
        w.sym_ac((run << 4) | size)
        w.bw.write(bits, size)
        run = 0
    if run > 0:
        w.eobrun += 1
        if w.eobrun == 0x7FFF:
            w.emit_eobrun()


def _enc_ac_refine(w: _ProgScanWriter, zz: np.ndarray, ss: int, se: int, al: int) -> None:
    absv = {}
    last_new = ss - 1  # position of last newly-nonzero coefficient
    for k in range(ss, se + 1):
        a = abs(int(zz[k])) >> al
        absv[k] = a
        if a == 1:
            last_new = k
    run = 0
    mine: list[int] = []  # correction bits accrued inside this block
    for k in range(ss, se + 1):
        a = absv[k]
        if a == 0:
            run += 1
            continue
        while run > 15 and k <= last_new:
            w.emit_eobrun()
            w.sym_ac(0xF0)
            run -= 16
            for bit in mine:
                w.bw.write(bit, 1)
            mine = []
        if a > 1:  # previously nonzero: just owes its next magnitude bit
            mine.append((abs(int(zz[k])) >> al) & 1)
            continue
        w.emit_eobrun()
        w.sym_ac((run << 4) | 1)
        w.bw.write(1 if int(zz[k]) >= 0 else 0, 1)
        for bit in mine:
            w.bw.write(bit, 1)
        mine = []
        run = 0
    if run > 0 or mine:
        w.eobrun += 1
        w.pending.extend(mine)
        if w.eobrun == 0x7FFF or len(w.pending) > 937:  # libjpeg's MAX_CORR_BITS margin
            w.emit_eobrun()


def jpeg_encode_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) gray → progressive (SOF2) JFIF.

    Coefficients are identical to jpeg_encode's at the same quality and
    subsampling — only the entropy layer differs — so progressive decode
    must equal baseline decode EXACTLY (the cross-check the tests pin).
    restart_interval > 0 emits DRI + RSTn every that many MCUs/blocks
    within EVERY scan (resetting DC prediction and EOB runs per T.81).
    """
    h, w, comps, qtables, comp_blocks, mcu_rows, mcu_cols = _encode_prep(
        arr, quality, subsampling
    )
    max_h = max(c.h for c in comps)
    max_v = max(c.v for c in comps)
    dc_enc = _huff_encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _huff_encode_table(_ENC_ACP_BITS, _ENC_ACP_VALS)

    # (comp indices, Ss, Se, Ah, Al) — jpeg_simple_progression's shape
    if len(comps) == 3:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, ], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]

    out = _emit_headers(
        h, w, comps, qtables, 0xFFC2,
        [(0x00, _ENC_DC_BITS, _ENC_DC_VALS), (0x10, _ENC_ACP_BITS, _ENC_ACP_VALS)],
    )
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    for comp_idx, ss, se, ah, al in script:
        sw = _ProgScanWriter(dc_enc, ac_enc)
        preds = {ci: 0 for ci in comp_idx}

        def scan_units(comp_idx=comp_idx, ss=ss):
            # interleaved MCU order for multi-comp DC scans; component
            # block-grid raster order otherwise (mirrors the decoder)
            if ss == 0 and len(comp_idx) > 1:
                for mr in range(mcu_rows):
                    for mc in range(mcu_cols):
                        mcu = []
                        for ci in comp_idx:
                            c = comps[ci]
                            for bv in range(c.v):
                                for bh in range(c.h):
                                    mcu.append((ci, mr * c.v + bv, mc * c.h + bh))
                        yield mcu
            else:
                ci = comp_idx[0]
                hb, wb = _comp_block_grid(h, w, comps[ci], max_h, max_v)
                for by in range(hb):
                    for bx in range(wb):
                        yield [(ci, by, bx)]

        unit_index = 0
        for unit in scan_units():
            if restart_interval and unit_index and unit_index % restart_interval == 0:
                sw.restart(unit_index // restart_interval - 1)
                preds = {ci: 0 for ci in comp_idx}
            unit_index += 1
            for ci, by, bx in unit:
                zz = comp_blocks[ci][by, bx]
                if ss == 0:
                    if ah == 0:
                        preds[ci] = _enc_dc_first(sw, int(zz[0]), preds[ci], al)
                    else:
                        _enc_dc_refine(sw, int(zz[0]), al)
                elif ah == 0:
                    _enc_ac_first(sw, zz, ss, se, al)
                else:
                    _enc_ac_refine(sw, zz, ss, se, al)
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            sos += bytes([comps[ci].cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, sos)
        out += sw.finish()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _comp_block_grid(
    fh: int, fw: int, c: _Comp, max_h: int, max_v: int
) -> tuple[int, int]:
    """Non-interleaved scans traverse ceil(comp_dim/8) blocks (T.81
    A.2.2), NOT the MCU-padded grid."""
    ch = -(-fh * c.v // max_v)
    cw = -(-fw * c.h // max_h)
    return -(-ch // 8), -(-cw // 8)


# ------------------------------------------------------------------- decode


def _read_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _decode_scan(
    data: bytes,
    pos: int,
    scan_comps: list[tuple[_Comp, int, int]],  # (comp, dc table id, ac table id)
    dc_tables: dict[int, dict],
    ac_tables: dict[int, dict],
    coef: dict[int, np.ndarray],
    geom: tuple[int, int, int, int, int, int],  # fh fw mcu_rows mcu_cols max_h max_v
    restart_interval: int,
    progressive: bool,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """Decode one scan's entropy data; mutates coef; returns the byte
    position where entropy data ended (next marker search starts there).

    Sequential scans (baseline) decode DC+AC 0..63 per block; progressive
    scans dispatch on (Ss==0, Ah==0) into the four T.81 G.2 cases —
    DC first / DC refine / AC first (EOB-run coded) / AC refine
    (correction bits) — mirroring the spec's figures G.2, G.7 and the
    classic libjpeg control flow for the refinement passes.
    """
    fh, fw, mcu_rows, mcu_cols, max_h, max_v = geom
    if not (0 <= ss <= se <= 63):
        raise ValueError(f"JPEG scan header: bad spectral band {ss}..{se}")
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("JPEG progressive: DC scan must have Se=0")
        if ss > 0 and len(scan_comps) > 1:
            raise ValueError("JPEG progressive: AC scans are single-component")
    # table ids must resolve BEFORE entropy decode so malformed files
    # raise the codec's ValueError, not a bare KeyError mid-stream
    need_dc = (not progressive) or (ss == 0 and ah == 0)
    need_ac = (not progressive) or ss > 0
    for _, td, ta in scan_comps:
        if need_dc and td not in dc_tables:
            raise ValueError(f"JPEG scan references undefined DC table {td}")
        if need_ac and ta not in ac_tables:
            raise ValueError(f"JPEG scan references undefined AC table {ta}")
    br = _BitReader(data, pos)
    interleaved = len(scan_comps) > 1
    dc_pred = {c.cid: 0 for c, _, _ in scan_comps}
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)

    def units():
        if interleaved:
            for mr in range(mcu_rows):
                for mc in range(mcu_cols):
                    mcu = []
                    for c, td, ta in scan_comps:
                        for bv in range(c.v):
                            for bh in range(c.h):
                                mcu.append((c, td, ta, mr * c.v + bv, mc * c.h + bh))
                    yield mcu
        else:
            c, td, ta = scan_comps[0]
            hb, wb = _comp_block_grid(fh, fw, c, max_h, max_v)
            for by in range(hb):
                for bx in range(wb):
                    yield [(c, td, ta, by, bx)]

    def refine_nonzero(zz, k: int) -> None:
        # consume a correction bit for an already-nonzero coefficient
        if br.read_bit() and (int(zz[k]) & p1) == 0:
            zz[k] += p1 if int(zz[k]) >= 0 else m1

    mcu_index = 0
    for mcu in units():
        if restart_interval and mcu_index and mcu_index % restart_interval == 0:
            br.sync_restart(mcu_index // restart_interval - 1)
            dc_pred = {c.cid: 0 for c, _, _ in scan_comps}
            eobrun = 0
        for c, td, ta, by, bx in mcu:
            zz = coef[c.cid][by, bx]
            if not progressive:
                tdc, tac = dc_tables[td], ac_tables[ta]
                size = _read_symbol(br, tdc)
                diff = _extend(br.read_bits(size), size)
                dc_pred[c.cid] += diff
                zz[0] = dc_pred[c.cid]
                i = 1
                while i < 64:
                    rs = _read_symbol(br, tac)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        i += 16
                        continue
                    i += rs >> 4
                    if i > 63:
                        raise ValueError("JPEG AC run past block end")
                    zz[i] = _extend(br.read_bits(rs & 0x0F), rs & 0x0F)
                    i += 1
            elif ss == 0 and ah == 0:  # DC first
                size = _read_symbol(br, dc_tables[td])
                dc_pred[c.cid] += _extend(br.read_bits(size), size)
                zz[0] = dc_pred[c.cid] << al
            elif ss == 0:  # DC refine: one appended bit per block
                if br.read_bit():
                    zz[0] = int(zz[0]) | p1
            elif ah == 0:  # AC first, EOB-run coded
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _read_symbol(br, ac_tables[ta])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run past band end")
                    zz[k] = _extend(br.read_bits(s), s) << al
                    k += 1
            else:  # AC refine
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _read_symbol(br, ac_tables[ta])
                        r, s = rs >> 4, rs & 0x0F
                        sval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            # r == 15: ZRL — skip 16 zero-history coefs
                        else:
                            if s != 1:
                                raise ValueError("JPEG AC refine size != 1")
                            sval = p1 if br.read_bit() else m1
                        while k <= se:
                            if int(zz[k]) != 0:
                                refine_nonzero(zz, k)
                                k += 1
                            elif r == 0:
                                break
                            else:
                                r -= 1
                                k += 1
                        if sval and k <= se:
                            zz[k] = sval
                        k += 1
                if eobrun > 0:
                    while k <= se:  # correction bits through band end
                        if int(zz[k]) != 0:
                            refine_nonzero(zz, k)
                        k += 1
                    eobrun -= 1
        mcu_index += 1
    return br.pos


def _next_marker(data: bytes, p: int) -> int:
    """Skip past entropy padding / fill bytes / stray RSTs to the next
    real marker's 0xFF."""
    while p + 1 < len(data):
        if data[p] != 0xFF:
            p += 1
        elif data[p + 1] == 0x00:  # stuffed byte
            p += 2
        elif data[p + 1] == 0xFF:  # fill byte
            p += 1
        elif 0xD0 <= data[p + 1] <= 0xD7:  # trailing RST
            p += 2
        else:
            return p
    return len(data)


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG bytes → (H, W, 3) uint8 RGB (gray
    replicates to 3 channels so downstream resize/PNG-encode sees one
    shape). Arithmetic coding, hierarchical and 12-bit precision raise
    NotImplementedError honestly; truncated/corrupt bytes raise
    ValueError (never struct.error or IndexError)."""
    try:
        return _jpeg_decode_impl(data)
    except (IndexError, struct.error) as exc:
        # a cut inside ANY header segment (SOF/SOS/DHT/DQT) lands here;
        # cuts inside entropy data are wrapped at the scan call below
        raise ValueError("truncated or corrupt JPEG") from exc


def _jpeg_decode_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}  # zigzag order
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    progressive = False
    coef: dict[int, np.ndarray] | None = None
    geom = None
    nscans = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # TEM/RSTn/SOI: no payload
            pos += 2
            continue
        if pos + 4 > len(data):
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq:
                    vals = np.frombuffer(payload[p : p + 128], ">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(payload[p : p + 64], np.uint8).astype(np.int64)
                    p += 64
                qtables[tq] = vals
        elif marker == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                p += 17 + n
                (dc_tables if tc == 0 else ac_tables)[th] = _huff_decode_table(bits, vals)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision, fh, fw, nc = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision} (only 8)")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append(_Comp(cid, hv >> 4, hv & 0x0F, tq))
            if any(c.h not in (1, 2) or c.v not in (1, 2) for c in comps):
                raise NotImplementedError("JPEG sampling factors beyond 1-2")
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF marker {marker:#x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            fh, fw, comps = frame
            max_h = max(c.h for c in comps)
            max_v = max(c.v for c in comps)
            if coef is None:
                mcu_cols = -(-fw // (8 * max_h))
                mcu_rows = -(-fh // (8 * max_v))
                geom = (fh, fw, mcu_rows, mcu_cols, max_h, max_v)
                coef = {
                    c.cid: np.zeros((mcu_rows * c.v, mcu_cols * c.h, 64), np.int64)
                    for c in comps
                }
            ns = payload[0]
            by_cid = {c.cid: c for c in comps}
            scan_comps = []
            for i in range(ns):
                cid, tt = payload[1 + 2 * i], payload[2 + 2 * i]
                if cid not in by_cid:
                    raise ValueError(f"JPEG SOS references undefined component {cid}")
                scan_comps.append((by_cid[cid], tt >> 4, tt & 0x0F))
            ss_, se_, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            try:
                end = _decode_scan(
                    data, pos + 2 + ln, scan_comps, dc_tables, ac_tables, coef,
                    geom, restart_interval, progressive,
                    ss_, se_, ahal >> 4, ahal & 0x0F,
                )
            except (IndexError, _MarkerReached) as exc:
                # entropy data ran out (truncated upload) or a marker
                # appeared mid-block — surface the codec's error type
                raise ValueError("truncated JPEG entropy data") from exc
            nscans += 1
            pos = _next_marker(data, end)
            continue
        pos += 2 + ln
    if frame is None or coef is None or nscans == 0:
        raise ValueError("truncated JPEG: missing SOF/SOS")
    fh, fw, comps = frame
    max_h = max(c.h for c in comps)
    max_v = max(c.v for c in comps)
    _, _, mcu_rows, mcu_cols, _, _ = geom

    # dequantize + de-zigzag + batched IDCT per component
    planes = {}
    for c in comps:
        bv, bh = mcu_rows * c.v, mcu_cols * c.h
        zz = coef[c.cid].reshape(-1, 64) * qtables[c.tq][None, :]
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz
        blocks = _DCT.T @ nat.reshape(-1, 8, 8).astype(np.float64) @ _DCT
        plane = _blocks_to_plane(blocks, bv, bh) + 128.0
        # crop to this component's true size, then replicate-upsample
        ch = -(-fh * c.v // max_v)
        cw = -(-fw * c.h // max_h)
        plane = plane[:ch, :cw]
        plane = np.repeat(np.repeat(plane, max_v // c.v, 0), max_h // c.h, 1)
        planes[c.cid] = plane[:fh, :fw]
    if len(comps) == 1:
        y = np.clip(np.rint(planes[comps[0].cid]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = (planes[c.cid] for c in comps)
    return _ycbcr_to_rgb(np.rint(y), np.rint(cb), np.rint(cr))
