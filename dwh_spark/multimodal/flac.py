"""Vendored pure-Python FLAC codec (decode + fixture encode).

Implements the public FLAC format (RFC 9639; also the reference
implementation's format.h/stream_decoder.c semantics) from scratch:

- MSB-first bitstream, "fLaC" magic, STREAMINFO + skipped metadata
  blocks, frame sync + UTF-8 frame numbers, CRC-8 / CRC-16 verify.
- Subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (binomial
  integrators), LPC with quantized coefficients; wasted-bits unpack.
- Rice residuals: 4- and 5-bit parameter variants, partition orders,
  escape-to-raw partitions, zigzag signed mapping.
- Stereo decorrelation: left/side, right/side, mid/side (the side
  channel carries bits+1 sample size per spec).

The encoder exists to build real test/fixture streams: mono or
stereo, FIXED orders 0-2, single-partition rice with a per-partition
parameter sweep, one frame per 4096-sample block. It is rate-naive
but format-correct — every stream it emits round-trips through the
decoder bit-exactly (FLAC is lossless), which is what the
oracle-pinned query relies on.

Reference parity: extends the audio surface beyond WAV containers
(multimodal/audio.py: PCM / G.711 / IMA ADPCM) with the dominant
lossless codec a real media corpus carries.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- bit I/O
# FLAC packs bits MSB-first (big-endian bitstream) — the opposite of
# VP8L's LSB-first reader in multimodal/vp8l.py.


class MSBReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._d = data
        self._byte = pos
        self._bit = 0

    def read_bit(self) -> int:
        if self._byte >= len(self._d):
            raise ValueError("FLAC: bitstream truncated")
        b = (self._d[self._byte] >> (7 - self._bit)) & 1
        self._bit += 1
        if self._bit == 8:
            self._bit = 0
            self._byte += 1
        return b

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if v >= 1 << (n - 1):
            v -= 1 << n
        return v

    def read_unary(self) -> int:
        n = 0
        while self.read_bit() == 0:
            n += 1
        return n

    def align(self) -> None:
        if self._bit:
            self._bit = 0
            self._byte += 1

    @property
    def byte_pos(self) -> int:
        return self._byte


class MSBWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._cur = 0
        self._nbits = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self._cur = (self._cur << 1) | ((v >> i) & 1)
            self._nbits += 1
            if self._nbits == 8:
                self._out.append(self._cur)
                self._cur = 0
                self._nbits = 0

    def write_unary(self, n: int) -> None:
        for _ in range(n):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self._nbits:
            self.write(0, 1)

    def getvalue(self) -> bytes:
        assert self._nbits == 0, "unaligned"
        return bytes(self._out)


# --------------------------------------------------------------- CRCs


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8+x^2+x+1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16+x^15+x^2+1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# ------------------------------------------------------ frame numbers


def _utf8_like_encode(n: int) -> bytes:
    """FLAC's extended-UTF-8 coding for frame/sample numbers."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_bytes = 2
    while bits > 6 * (n_bytes - 1) + (7 - n_bytes) and n_bytes < 7:
        n_bytes += 1
    lead_mask = (0xFF << (8 - n_bytes)) & 0xFF
    shift = 6 * (n_bytes - 1)
    out.append(lead_mask | (n >> shift))
    for i in range(n_bytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _utf8_like_decode(br: MSBReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_bytes = 0
    mask = 0x80
    while b0 & mask:
        n_bytes += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n_bytes - 1):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("FLAC: bad UTF-8 continuation in frame number")
        v = (v << 6) | (cont & 0x3F)
    return v


# ----------------------------------------------------------- residuals

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else ((-r << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _read_residuals(br: MSBReader, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError(f"FLAC: residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_parts = 1 << porder
    if block_size % n_parts:
        raise ValueError("FLAC: partition does not divide block size")
    out: list[int] = []
    for p in range(n_parts):
        n = block_size // n_parts - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            out.extend(br.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out.append(_unzigzag(u))
    return out


def _write_residuals(
    bw: MSBWriter, res: list[int], block_size: int, order: int, pbits: int = 4
) -> None:
    bw.write(0 if pbits == 4 else 1, 2)
    bw.write(0, 4)  # partition order 0: one partition
    us = [_zigzag(r) for r in res]
    # parameter sweep: smallest total bit cost (format-correct, simple)
    best_param, best_cost = 0, None
    for param in range(0, (1 << pbits) - 1):
        cost = sum((u >> param) + 1 + param for u in us)
        if best_cost is None or cost < best_cost:
            best_param, best_cost = param, cost
        if cost > (best_cost or 0) * 4:
            break
    bw.write(best_param, pbits)
    for u in us:
        bw.write_unary(u >> best_param)
        bw.write(u & ((1 << best_param) - 1), best_param)


# ------------------------------------------------------------- decode


def _read_subframe(br: MSBReader, block_size: int, bits: int) -> np.ndarray:
    if br.read_bit() != 0:
        raise ValueError("FLAC: subframe padding bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read_bit():  # wasted-bits-per-sample flag
        wasted = br.read_unary() + 1
        bits -= wasted
    if sf_type == 0:  # CONSTANT
        v = br.read_signed(bits)
        samples = [v] * block_size
    elif sf_type == 1:  # VERBATIM
        samples = [br.read_signed(bits) for _ in range(block_size)]
    elif 8 <= sf_type <= 12:  # FIXED order 0-4
        order = sf_type - 8
        warm = [br.read_signed(bits) for _ in range(order)]
        res = _read_residuals(br, block_size, order)
        samples = list(warm)
        coefs = _FIXED_COEFFS[order]
        for r in res:
            pred = sum(c * samples[-j - 1] for j, c in enumerate(coefs))
            samples.append(pred + r)
    elif sf_type >= 32:  # LPC, order = type - 31
        order = sf_type - 31
        warm = [br.read_signed(bits) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _read_residuals(br, block_size, order)
        samples = list(warm)
        for r in res:
            acc = sum(c * samples[-j - 1] for j, c in enumerate(coefs))
            samples.append((acc >> shift) + r)
    else:
        raise ValueError(f"FLAC: reserved subframe type {sf_type}")
    arr = np.array(samples, dtype=np.int64)
    return arr << wasted


_BLOCKSIZE_FROM_CODE = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                        **{n: 256 << (n - 8) for n in range(8, 16)}}
_SAMPLE_BITS_FROM_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SAMPLE_RATE_FROM_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def flac_decode(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → ((n_samples, channels) int array, sample_rate).
    Verifies frame-header CRC-8 and frame CRC-16."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (bad magic)")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos : pos + 4]
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        body = data[pos + 4 : pos + 4 + size]
        if btype == 0:
            streaminfo = body
        pos += 4 + size
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC: missing STREAMINFO")
    si = MSBReader(streaminfo)
    si.read(16); si.read(16); si.read(24); si.read(24)
    si_rate = si.read(20)
    si_channels = si.read(3) + 1
    si_bits = si.read(5) + 1
    total = si.read(36)

    channels_out: list[np.ndarray] = [np.empty(0, np.int64) for _ in range(si_channels)]
    got = 0
    # total == 0 is the spec's "unknown length" (streamed encodes):
    # decode frames until the bytes run out instead of stopping early
    while (total == 0 or got < total) and pos + 2 < len(data):
        hdr_start = pos
        br = MSBReader(data, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_code = br.read(4)
        bits_code = br.read(3)
        br.read(1)  # reserved
        _utf8_like_decode(br)
        if bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_FROM_CODE:
            block_size = _BLOCKSIZE_FROM_CODE[bs_code]
        else:
            raise ValueError("FLAC: reserved blocksize code")
        if sr_code == 0:
            rate = si_rate
        elif sr_code in _SAMPLE_RATE_FROM_CODE:
            rate = _SAMPLE_RATE_FROM_CODE[sr_code]
        elif sr_code == 12:
            rate = br.read(8) * 1000
        elif sr_code in (13, 14):
            rate = br.read(16) * (1 if sr_code == 13 else 10)
        else:
            raise ValueError("FLAC: invalid sample-rate code")
        if bits_code == 0:
            bits = si_bits
        elif bits_code in _SAMPLE_BITS_FROM_CODE:
            bits = _SAMPLE_BITS_FROM_CODE[bits_code]
        else:
            raise ValueError("FLAC: reserved sample-size code")
        crc8_stored = data[br.byte_pos]
        if _crc8(data[hdr_start : br.byte_pos]) != crc8_stored:
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        br.read(8)  # consume CRC byte

        if chan_code < 8:
            n_ch = chan_code + 1
            subs = [_read_subframe(br, block_size, bits) for _ in range(n_ch)]
        elif chan_code in (8, 9, 10):
            n_ch = 2
            b0 = bits + (1 if chan_code == 9 else 0)
            b1 = bits + (1 if chan_code in (8, 10) else 0)
            c0 = _read_subframe(br, block_size, b0)
            c1 = _read_subframe(br, block_size, b1)
            if chan_code == 8:  # left/side
                subs = [c0, c0 - c1]
            elif chan_code == 9:  # side/right
                subs = [c0 + c1, c1]
            else:  # mid/side
                mid2 = (c0 << 1) | (c1 & 1)
                subs = [(mid2 + c1) >> 1, (mid2 - c1) >> 1]
        else:
            raise ValueError(f"FLAC: reserved channel assignment {chan_code}")
        if n_ch != si_channels:
            raise ValueError("FLAC: frame/streaminfo channel mismatch")
        br.align()
        frame_bytes = data[hdr_start : br.byte_pos]
        crc_bytes = data[br.byte_pos : br.byte_pos + 2]
        if len(crc_bytes) < 2:
            raise ValueError("FLAC: truncated frame (CRC-16 missing)")
        crc16_stored = struct.unpack(">H", crc_bytes)[0]
        if _crc16(frame_bytes) != crc16_stored:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = br.byte_pos + 2
        for i in range(n_ch):
            channels_out[i] = np.concatenate([channels_out[i], subs[i]])
        got += block_size
    return np.stack(channels_out, axis=1), si_rate


# ------------------------------------------------------------- encode


def _best_fixed_order(x: np.ndarray, max_order: int) -> int:
    best, best_cost = 0, None
    r = x.astype(np.int64)
    for order in range(max_order + 1):
        cost = np.abs(r).sum()
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
        r = np.diff(r)
    return best


_STEREO_CODES = {"ls": 8, "rs": 9, "ms": 10}


def flac_encode(
    samples: np.ndarray,
    rate: int = 8000,
    bits: int = 16,
    block_size: int = 4096,
    fixed_order: int | None = None,
    stereo_mode: str | None = None,
) -> bytes:
    """Int samples (flat mono or (n, ch), ch<=2) → FLAC bytes with
    FIXED-predictor subframes (order auto-chosen per channel unless
    pinned) and single-partition rice residuals. ``stereo_mode``
    ('ls' | 'rs' | 'ms') writes the decorrelated channel assignments
    (side channel at bits+1 per spec)."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if channels > 2:
        raise ValueError("encoder supports <= 2 channels")
    if stereo_mode is not None and channels != 2:
        raise ValueError("stereo_mode needs 2 channels")

    out = bytearray(b"fLaC")
    si = MSBWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + b"\x00" * 16  # md5 unset (all zero)
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo

    frame_ix = 0
    for start in range(0, n, block_size):
        blk = arr[start : start + block_size]
        bs = blk.shape[0]
        hdr = MSBWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed-blocksize stream
        hdr.write(7, 4)  # blocksize at end of header, 16-bit - 1
        hdr.write(0, 4)  # rate from streaminfo
        chan_code = (
            _STEREO_CODES[stereo_mode] if stereo_mode else channels - 1
        )
        hdr.write(chan_code, 4)
        hdr.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits], 3)
        hdr.write(0, 1)
        hdr.align()
        hdr_bytes = hdr.getvalue() + _utf8_like_encode(frame_ix)
        bs_w = MSBWriter()
        bs_w.write(bs - 1, 16)
        bs_w.align()
        hdr_bytes += bs_w.getvalue()
        hdr_bytes += bytes([_crc8(hdr_bytes)])

        if stereo_mode is None:
            chans = [(blk[:, ch], bits) for ch in range(channels)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo_mode == "ls":
                chans = [(left, bits), (side, bits + 1)]
            elif stereo_mode == "rs":
                chans = [(side, bits + 1), (right, bits)]
            else:  # mid/side: mid = (L+R)>>1, low bit carried by side
                chans = [((left + right) >> 1, bits), (side, bits + 1)]
        body = MSBWriter()
        for x, ch_bits in chans:
            order = (
                fixed_order
                if fixed_order is not None
                else _best_fixed_order(x, min(2, bs - 1))
            )
            order = min(order, bs - 1)
            body.write(0, 1)
            body.write(8 + order, 6)
            body.write(0, 1)  # no wasted bits
            for w in x[:order]:
                body.write(int(w) & ((1 << ch_bits) - 1), ch_bits)
            res = x.copy()
            for _ in range(order):
                res = np.diff(res)
            _write_residuals(body, [int(v) for v in res], bs, order)
        body.align()
        frame = hdr_bytes + body.getvalue()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_ix += 1
    return bytes(out)
