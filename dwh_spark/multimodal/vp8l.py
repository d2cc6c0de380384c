"""Vendored pure-Python/numpy WebP-lossless (VP8L) codec.

Implements the public WebP Lossless Bitstream Specification
(RFC 9649 §4; also distributed with libwebp as
``doc/webp-lossless-bitstream-spec.txt``) from scratch — no libwebp,
no PIL. Reference parity target: the reference engine decodes webp
via Go's image registry (``x/imgresizer/resizer.go:244-255``; e2e
format list ``resizer_test.go:10-27``).

Decoder coverage (the full lossless feature set):
- LSB-first bit reading, canonical prefix codes (both "simple" 1-2
  symbol codes and normal codes with the 19-symbol RLE code-length
  code, optional max-symbol limit),
- LZ77 backward references with the 2D distance mapping, color cache,
  meta-prefix (per-tile code group) images,
- all four transforms, applied inverse in reverse signal order:
  predictor (14 modes incl. Select / ClampAddSubtract), cross-color,
  subtract-green, color-indexing with sub-byte pixel bundling.

Encoder coverage (enough to exercise every decoder path in
roundtrips, and to build real fixture corpora): literal coding,
greedy LZ77, color cache, subtract-green, fixed-mode predictor,
fixed-element cross-color, palette + bundling. Single code group
(no meta-prefix image) — valid per spec, just not rate-optimal.

Lossy VP8 genuinely needs a native library and raises
NotImplementedError (VP8X-wrapped VP8L decodes via the RIFF chunk
scan); ``multimodal/registry.py`` is
the documented injection seam for those.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- bit I/O


class BitReader:
    """LSB-first bit reader (RFC 9649 §4.1: bits are read starting
    from the least-significant bit of each byte)."""

    def __init__(self, data: bytes) -> None:
        self._d = data
        self._byte = 0
        self._bit = 0

    def read_bit(self) -> int:
        if self._byte >= len(self._d):
            raise ValueError("VP8L: bitstream truncated")
        b = (self._d[self._byte] >> self._bit) & 1
        self._bit += 1
        if self._bit == 8:
            self._bit = 0
            self._byte += 1
        return b

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i
        return v


class BitWriter:
    """LSB-first bit writer mirroring :class:`BitReader`."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._cur = 0
        self._nbits = 0

    def write_bit(self, b: int) -> None:
        self._cur |= (b & 1) << self._nbits
        self._nbits += 1
        if self._nbits == 8:
            self._out.append(self._cur)
            self._cur = 0
            self._nbits = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            self.write_bit((v >> i) & 1)

    def getvalue(self) -> bytes:
        out = bytes(self._out)
        if self._nbits:
            out += bytes([self._cur])
        return out


# --------------------------------------------------------- prefix codes

MAX_CODE_LENGTH = 15
# Order in which code-length-code lengths are stored (RFC 9649 §4.2.1.2)
CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)


def canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """RFC 1951-style canonical code assignment: symbols sorted by
    (length, symbol) get sequential codes. Returns {sym: (code, len)}."""
    syms = sorted(s for s, ln in enumerate(lengths) if ln > 0)
    syms.sort(key=lambda s: (lengths[s], s))
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for s in syms:
        ln = lengths[s]
        code <<= ln - prev_len
        codes[s] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class HuffDecoder:
    """Bit-at-a-time canonical prefix decoder. The first bit read is
    the MSB of the canonical code (libwebp tree-walk order). A code
    with exactly one used symbol decodes it consuming ZERO bits."""

    def __init__(self, lengths: list[int]) -> None:
        used = [s for s, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("VP8L: empty prefix code")
        self._single = used[0] if len(used) == 1 else None
        self._map = {
            (ln, code): s for s, (code, ln) in canonical_codes(lengths).items()
        }

    @classmethod
    def from_simple(cls, symbols: list[int]) -> "HuffDecoder":
        """Simple-code decoder with EXPLICIT codes in LISTED order:
        per the spec/libwebp, the first listed symbol gets code 0 and
        the second code 1 — NOT canonical-by-value assignment (a
        stream may list the larger symbol first)."""
        self = cls.__new__(cls)
        self._single = symbols[0] if len(symbols) == 1 else None
        self._map = {(1, code): s for code, s in enumerate(symbols)}
        return self

    def decode(self, br: BitReader) -> int:
        if self._single is not None:
            return self._single
        code = 0
        for ln in range(1, MAX_CODE_LENGTH + 1):
            code = (code << 1) | br.read_bit()
            sym = self._map.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


class HuffEncoder:
    """Write-side twin of :class:`HuffDecoder` over the same lengths."""

    def __init__(self, lengths: list[int]) -> None:
        used = [s for s, ln in enumerate(lengths) if ln > 0]
        self._single = used[0] if len(used) == 1 else None
        self._codes = canonical_codes(lengths)

    def encode(self, bw: BitWriter, sym: int) -> None:
        if self._single is not None:
            if sym != self._single:
                raise ValueError("symbol not in single-entry code")
            return
        code, ln = self._codes[sym]
        for i in range(ln - 1, -1, -1):  # MSB first
            bw.write_bit((code >> i) & 1)


def build_code_lengths(hist: list[int], limit: int = MAX_CODE_LENGTH) -> list[int]:
    """Huffman code lengths for a histogram, depth-limited by count
    flattening (halve-and-rebuild, the classic zlib trick)."""
    counts = list(hist)
    n_used = sum(1 for c in counts if c > 0)
    if n_used == 0:
        return [0] * len(counts)
    if n_used == 1:
        return [1 if c > 0 else 0 for c in counts]
    while True:
        import heapq

        heap: list[tuple[int, int, tuple]] = []
        uid = 0
        for s, c in enumerate(counts):
            if c > 0:
                heap.append((c, uid, ("leaf", s)))
                uid += 1
        heapq.heapify(heap)
        while len(heap) > 1:
            c1, _, t1 = heapq.heappop(heap)
            c2, _, t2 = heapq.heappop(heap)
            heapq.heappush(heap, (c1 + c2, uid, ("node", t1, t2)))
            uid += 1
        lengths = [0] * len(counts)
        stack = [(heap[0][2], 0)]
        max_depth = 0
        while stack:
            node, d = stack.pop()
            if node[0] == "leaf":
                lengths[node[1]] = max(d, 1)
                max_depth = max(max_depth, d)
            else:
                stack.append((node[1], d + 1))
                stack.append((node[2], d + 1))
        if max_depth <= limit:
            return lengths
        counts = [(c + 1) >> 1 if c > 0 else 0 for c in counts]


# ------------------------------------------------- code (de)serialization


def read_code(br: BitReader, alphabet_size: int) -> HuffDecoder:
    """Read one prefix code header (RFC 9649 §4.2.1)."""
    lengths = [0] * alphabet_size
    if br.read_bit():  # simple code: codes follow LISTED order
        num_symbols = br.read_bit() + 1
        first_8bit = br.read_bit()
        symbols = [br.read(8 if first_8bit else 1)]
        if num_symbols == 2:
            symbols.append(br.read(8))
        return HuffDecoder.from_simple(symbols)
    # normal code: code-length-code lengths in CL_ORDER
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[CL_ORDER[i]] = br.read(3)
    cl_dec = HuffDecoder(cl_lengths)
    if br.read_bit():  # max-symbol limit present
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    i = 0
    prev_len = 8
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_dec.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s != 0:
                prev_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return HuffDecoder(lengths)


def write_code(bw: BitWriter, lengths: list[int]) -> HuffEncoder:
    """Write one prefix code header; returns the matching encoder.

    Uses the simple form for 1-2 symbols below 256, else the normal
    form with literal lengths and 17/18 zero-run codes."""
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(used) <= 2 and used[-1] < 256:
        bw.write_bit(1)
        bw.write_bit(len(used) - 1)
        first_8bit = 0 if used[0] <= 1 else 1
        bw.write_bit(first_8bit)
        bw.write(used[0], 8 if first_8bit else 1)
        if len(used) == 2:
            bw.write(used[1], 8)
        return HuffEncoder(lengths)
    bw.write_bit(0)
    # serialize lengths as symbols over the code-length alphabet
    cl_syms: list[tuple[int, int]] = []  # (symbol, extra_payload)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            run = 1
            while i + run < n and lengths[i + run] == 0:
                run += 1
            i += run
            while run >= 3:
                if run >= 11:
                    take = min(run, 138)
                    cl_syms.append((18, take - 11))
                else:
                    take = run
                    cl_syms.append((17, take - 3))
                run -= take
            for _ in range(run):
                cl_syms.append((0, 0))
        else:
            cl_syms.append((lengths[i], 0))
            i += 1
    cl_hist = [0] * 19
    for s, _ in cl_syms:
        cl_hist[s] += 1
    cl_lengths = build_code_lengths(cl_hist, limit=7)
    bw.write(19 - 4, 4)  # always emit all 19 positions
    for pos in CL_ORDER:
        bw.write(cl_lengths[pos], 3)
    bw.write_bit(0)  # no max-symbol limit: runs pad to alphabet end
    enc = HuffEncoder(cl_lengths)
    for s, extra in cl_syms:
        enc.encode(bw, s)
        if s == 17:
            bw.write(extra, 3)
        elif s == 18:
            bw.write(extra, 7)
    return HuffEncoder(lengths)


# ------------------------------------------------------ LZ77 plumbing

NUM_LENGTH_CODES = 24
NUM_DISTANCE_CODES = 40
CACHE_HASH_MUL = 0x1E35A7BD


def prefix_decode(code: int, br: BitReader) -> int:
    """LZ77 length/distance prefix decoding (RFC 9649 §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def prefix_encode(value: int) -> tuple[int, int, int]:
    """Inverse of :func:`prefix_decode`: value -> (code, extra, nbits)."""
    if value <= 4:
        return value - 1, 0, 0
    x = value - 1
    hi = x.bit_length() - 1
    extra = hi - 1
    second_msb = (x >> extra) & 1
    return 2 * hi + second_msb, x & ((1 << extra) - 1), extra


def _build_distance_map() -> list[tuple[int, int]]:
    """The 120-entry 2D distance mapping (RFC 9649 §4.2.2): the close
    (dx, dy) neighbors with dy in [0,7], dx in [-7,8] (dy>0, or dy==0
    and dx>0), sorted by squared distance then |dx| then sign.

    libwebp's kCodeToPlane packs each entry as (dy << 4) | (8 - dx),
    so dx is bounded below by 8 - 15 = -7, NOT -8: dy in 0..7 with
    dx in -7..8 yields exactly 8 + 7*16 = 120 candidates, no
    truncation. (A -8 lower bound shifts codes 103-120 off the spec
    table; see test_vp8l_distance_map_pins_libwebp_table in tests/test_codecs.py.)"""
    cands = []
    for dy in range(0, 8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    assert len(cands) == 120
    return cands


DISTANCE_MAP = _build_distance_map()
_DISTANCE_MAP_INV = {p: i + 1 for i, p in enumerate(DISTANCE_MAP)}


def plane_to_dist(plane_code: int, width: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = DISTANCE_MAP[plane_code - 1]
    return max(dy * width + dx, 1)


def dist_to_plane(dist: int, width: int) -> int:
    """Prefer the 2D code when the distance is a mapped neighbor."""
    dy, dx = divmod(dist, width)
    if dx > 8:
        dx -= width
        dy += 1
    code = _DISTANCE_MAP_INV.get((dx, dy))
    if code is not None and plane_to_dist(code, width) == dist:
        return code
    return dist + 120


def cache_index(pix: int, cache_bits: int) -> int:
    return ((pix * CACHE_HASH_MUL) & 0xFFFFFFFF) >> (32 - cache_bits)


# ------------------------------------------------------- image decoding


def _read_codes_group(br: BitReader, cache_size: int) -> list[HuffDecoder]:
    sizes = (256 + NUM_LENGTH_CODES + cache_size, 256, 256, 256, NUM_DISTANCE_CODES)
    return [read_code(br, s) for s in sizes]


def _decode_pixels(br: BitReader, w: int, h: int, level0: bool) -> np.ndarray:
    """Decode the entropy-coded ARGB plane (flat uint32 array of w*h).

    Handles color cache, meta-prefix group images (level0 only) and
    LZ77 backward references."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"VP8L: color cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    group_of: np.ndarray | None = None
    meta_bits = 0
    num_groups = 1
    if level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_image(br, mw, mh, level0=False)
        group_of = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(group_of.max()) + 1

    groups = [_read_codes_group(br, cache_size) for _ in range(num_groups)]

    argb = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    cache_limit = 256 + NUM_LENGTH_CODES
    while pos < total:
        if group_of is None:
            g = groups[0]
        else:
            x, y = pos % w, pos // w
            mw = (w + (1 << meta_bits) - 1) >> meta_bits
            g = groups[group_of[(y >> meta_bits) * mw + (x >> meta_bits)]]
        s = g[0].decode(br)
        if s < 256:
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            pix = (alpha << 24) | (red << 16) | (s << 8) | blue
            argb[pos] = pix
            if cache_bits:
                cache[cache_index(pix, cache_bits)] = pix
            pos += 1
        elif s < cache_limit:
            length = prefix_decode(s - 256, br)
            dist_code = prefix_decode(g[4].decode(br), br)
            dist = plane_to_dist(dist_code, w)
            if dist > pos:
                raise ValueError("VP8L: backward reference before start")
            if pos + length > total:
                raise ValueError("VP8L: backward reference past end")
            for _ in range(length):  # may overlap (dist < length)
                pix = int(argb[pos - dist])
                argb[pos] = pix
                if cache_bits:
                    cache[cache_index(pix, cache_bits)] = pix
                pos += 1
        else:
            if not cache_bits:
                raise ValueError("VP8L: cache symbol without color cache")
            argb[pos] = cache[s - cache_limit]
            pos += 1
    return argb


# ---------------------------------------------------------- transforms

TR_PREDICTOR, TR_COLOR, TR_SUBTRACT_GREEN, TR_COLOR_INDEXING = 0, 1, 2, 3


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-channel (a+b)>>1 on packed ARGB uint32 (SIMD-free trick:
    average each byte lane without unpacking)."""
    return ((a & b) + (((a ^ b) & np.uint32(0xFEFEFEFE)) >> np.uint32(1))).astype(
        np.uint32
    )


def _channels(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)


def _select_pred(left: int, top: int, topleft: int) -> int:
    la, lr, lg, lb = _channels(left)
    ta, tr_, tg, tb = _channels(top)
    ca, cr, cg, cb = _channels(topleft)
    # sum over channels of |L-TL| - |T-TL|;  <= 0 -> top closer -> top
    d = (
        (abs(la - ca) - abs(ta - ca))
        + (abs(lr - cr) - abs(tr_ - cr))
        + (abs(lg - cg) - abs(tg - cg))
        + (abs(lb - cb) - abs(tb - cb))
    )
    return top if d <= 0 else left


def _clamp_add_sub_full(left: int, top: int, topleft: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((left >> shift) & 0xFF) + ((top >> shift) & 0xFF) - ((topleft >> shift) & 0xFF)
        out |= max(0, min(255, v)) << shift
    return out


def _clamp_add_sub_half(left: int, top: int, topleft: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        ave = (((left >> shift) & 0xFF) + ((top >> shift) & 0xFF)) >> 1
        d = ave - ((topleft >> shift) & 0xFF)
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
        out |= max(0, min(255, ave + half)) << shift
    return out


def _predict(mode: int, left: int, top: int, topleft: int, topright: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    a2 = lambda x, y: int(_avg2(np.uint32(x), np.uint32(y)))  # noqa: E731
    if mode == 5:
        return a2(a2(left, topright), top)
    if mode == 6:
        return a2(left, topleft)
    if mode == 7:
        return a2(left, top)
    if mode == 8:
        return a2(topleft, top)
    if mode == 9:
        return a2(top, topright)
    if mode == 10:
        return a2(a2(left, topleft), a2(top, topright))
    if mode == 11:
        return _select_pred(left, top, topleft)
    if mode == 12:
        return _clamp_add_sub_full(left, top, topleft)
    if mode == 13:
        return _clamp_add_sub_half(left, top, topleft)
    raise ValueError(f"VP8L: predictor mode {mode}")


def _pred_neighbors(argb: np.ndarray, pos: int, w: int) -> tuple[int, int, int, int]:
    """Contiguous-memory neighbor semantics (libwebp): TR at the right
    edge wraps to the current row's first pixel, all already decoded."""
    return (
        int(argb[pos - 1]),
        int(argb[pos - w]),
        int(argb[pos - w - 1]),
        int(argb[pos - w + 1]),
    )


def _add_pixels(a: int, b: int) -> int:
    """Per-channel (a+b) & 0xff on packed ARGB."""
    out = 0
    for shift in (24, 16, 8, 0):
        out |= ((((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)) & 0xFF) << shift
    return out


def _sub_pixels(a: int, b: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        out |= ((((a >> shift) & 0xFF) - ((b >> shift) & 0xFF)) & 0xFF) << shift
    return out


def _predictor_inverse(argb: np.ndarray, w: int, h: int, bits: int, sub: np.ndarray) -> None:
    """In-place inverse predictor transform. Edge rules: (0,0) uses
    0xff000000, row 0 uses L, column 0 uses T, regardless of tile mode."""
    tw = _subsample(w, bits)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(argb[pos - 1])
        elif x == 0:
            pred = int(argb[pos - w])
        else:
            mode = (int(sub[(y >> bits) * tw + (x >> bits)]) >> 8) & 0xFF
            left, top, topleft, topright = _pred_neighbors(argb, pos, w)
            pred = _predict(mode, left, top, topleft, topright)
        argb[pos] = _add_pixels(int(argb[pos]), pred)


def _predictor_forward(argb: np.ndarray, w: int, h: int, mode: int) -> np.ndarray:
    """Residuals for a constant predictor mode (encoder side); same
    edge rules as the inverse, predicting from ORIGINAL pixels."""
    out = np.zeros_like(argb)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(argb[pos - 1])
        elif x == 0:
            pred = int(argb[pos - w])
        else:
            left, top, topleft, topright = _pred_neighbors(argb, pos, w)
            pred = _predict(mode, left, top, topleft, topright)
        out[pos] = _sub_pixels(int(argb[pos]), pred)
    return out


def _ct_delta(t: np.ndarray | int, c: np.ndarray | int) -> np.ndarray:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5, arithmetic."""
    t8 = np.asarray(t, dtype=np.uint8).astype(np.int8).astype(np.int32)
    c8 = np.asarray(c, dtype=np.uint8).astype(np.int8).astype(np.int32)
    return (t8 * c8) >> 5


def _color_inverse(argb: np.ndarray, w: int, h: int, bits: int, sub: np.ndarray) -> None:
    """In-place inverse cross-color transform (vectorized per row
    since tiles are row-aligned slices)."""
    tw = _subsample(w, bits)
    a = (argb >> 24) & 0xFF
    r = ((argb >> 16) & 0xFF).astype(np.int32)
    g = ((argb >> 8) & 0xFF).astype(np.int32)
    b = (argb & 0xFF).astype(np.int32)
    xs = np.arange(w * h) % w
    ys = np.arange(w * h) // w
    cte = sub[(ys >> bits) * tw + (xs >> bits)]
    g2r = cte & 0xFF          # blue channel of the element pixel
    g2b = (cte >> 8) & 0xFF   # green channel
    r2b = (cte >> 16) & 0xFF  # red channel
    new_r = (r + _ct_delta(g2r, g)) & 0xFF
    new_b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, new_r)) & 0xFF
    argb[:] = (a << 24) | (new_r.astype(np.uint32) << 16) | (
        g.astype(np.uint32) << 8
    ) | new_b.astype(np.uint32)


def _color_forward(argb: np.ndarray, g2r: int, g2b: int, r2b: int) -> np.ndarray:
    """Forward cross-color with one constant element (encoder side);
    red_to_blue uses the ORIGINAL red (libwebp VP8LTransformColor)."""
    a = (argb >> 24) & 0xFF
    r = ((argb >> 16) & 0xFF).astype(np.int32)
    g = ((argb >> 8) & 0xFF).astype(np.int32)
    b = (argb & 0xFF).astype(np.int32)
    new_r = (r - _ct_delta(np.full_like(g, g2r), g)) & 0xFF
    new_b = (b - _ct_delta(np.full_like(g, g2b), g) - _ct_delta(np.full_like(r, r2b), r)) & 0xFF
    return (
        (a << 24)
        | (new_r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | new_b.astype(np.uint32)
    ).astype(np.uint32)


def _subtract_green_inverse(argb: np.ndarray) -> None:
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) + g) & 0xFF
    b = ((argb & 0xFF) + g) & 0xFF
    argb[:] = (argb & 0xFF00FF00) | (r << np.uint32(16)) | b


def _subtract_green_forward(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) - g) & 0xFF
    b = ((argb & 0xFF) - g) & 0xFF
    return ((argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b).astype(np.uint32)


def _palette_width_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _palette_inverse(
    argb: np.ndarray, packed_w: int, w: int, h: int, palette: np.ndarray
) -> np.ndarray:
    """Unbundle packed indices (green channel) and map through the
    palette; out-of-range indices decode as transparent black."""
    width_bits = _palette_width_bits(len(palette))
    idx_bits = 8 >> width_bits
    per = 1 << width_bits
    mask = (1 << idx_bits) - 1
    green = ((argb.reshape(h, packed_w) >> 8) & 0xFF).astype(np.uint32)
    cols = []
    for i in range(per):
        cols.append((green >> (i * idx_bits)) & mask)
    idx = np.stack(cols, axis=2).reshape(h, packed_w * per)[:, :w]
    lut = np.zeros(mask + 1, dtype=np.uint32)
    lut[: len(palette)] = palette
    return lut[idx].reshape(-1)


# ------------------------------------------------------- stream decode


def _decode_image(br: BitReader, w: int, h: int, level0: bool) -> np.ndarray:
    """RFC 9649 §4.3 decode_image_stream: optional transforms
    (level0 only), then the entropy-coded plane, then inverse
    transforms in reverse order. Returns flat uint32 ARGB of the
    ORIGINAL w*h."""
    transforms: list[tuple] = []
    cur_w = w
    if level0:
        seen = set()
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError(f"VP8L: duplicate transform {ttype}")
            seen.add(ttype)
            if ttype == TR_SUBTRACT_GREEN:
                transforms.append((TR_SUBTRACT_GREEN,))
            elif ttype in (TR_PREDICTOR, TR_COLOR):
                bits = br.read(3) + 2
                sw, sh = _subsample(cur_w, bits), _subsample(h, bits)
                sub = _decode_image(br, sw, sh, level0=False)
                transforms.append((ttype, bits, sub))
            elif ttype == TR_COLOR_INDEXING:
                n_colors = br.read(8) + 1
                pal_deltas = _decode_image(br, n_colors, 1, level0=False)
                # palette is subtraction-coded per channel
                palette = np.zeros(n_colors, dtype=np.uint32)
                prev = 0
                for i in range(n_colors):
                    prev = _add_pixels(prev, int(pal_deltas[i]))
                    palette[i] = prev
                width_bits = _palette_width_bits(n_colors)
                transforms.append((TR_COLOR_INDEXING, cur_w, palette))
                cur_w = _subsample(cur_w, width_bits)

    argb = _decode_pixels(br, cur_w, h, level0)

    for t in reversed(transforms):
        if t[0] == TR_SUBTRACT_GREEN:
            _subtract_green_inverse(argb)
        elif t[0] == TR_PREDICTOR:
            _predictor_inverse(argb, cur_w, h, t[1], t[2])
        elif t[0] == TR_COLOR:
            _color_inverse(argb, cur_w, h, t[1], t[2])
        else:  # COLOR_INDEXING: width returns to the pre-bundling size
            orig_w, palette = t[1], t[2]
            argb = _palette_inverse(argb, cur_w, orig_w, h, palette)
            cur_w = orig_w
    return argb


def vp8l_decode(payload: bytes) -> np.ndarray:
    """Decode a raw VP8L chunk payload to an (H, W, 4) RGBA array."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha-used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    argb = _decode_image(br, w, h, level0=True)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 0] = ((argb >> 16) & 0xFF).reshape(h, w)  # R
    out[:, :, 1] = ((argb >> 8) & 0xFF).reshape(h, w)   # G
    out[:, :, 2] = (argb & 0xFF).reshape(h, w)          # B
    out[:, :, 3] = ((argb >> 24) & 0xFF).reshape(h, w)  # A
    return out


def vp8_frame_info(chunk: bytes) -> dict:
    """Parse a lossy VP8 chunk's UNCOMPRESSED key-frame header
    (RFC 6386 §9.1) — the part of the format that needs no entropy
    tables: 3-byte frame tag (LSB-first: key_frame inverted bit,
    3-bit version, show_frame, 19-bit first-partition size), the
    0x9D 0x01 0x2A start code, then 16-bit (14+2) width|xscale and
    height|yscale. Returns dims/metadata so lossy files still yield
    real catalog information even though full entropy decode is a
    documented won't-do (see SURVEY §2.5: the ~3k-entry default
    probability tables cannot be verified in this sandbox, and
    unverifiable tables would silently mis-decode real files)."""
    if len(chunk) < 10:
        raise ValueError("VP8 chunk too short for frame header")
    tag = chunk[0] | (chunk[1] << 8) | (chunk[2] << 16)
    key_frame = (tag & 1) == 0
    version = (tag >> 1) & 7
    show_frame = (tag >> 4) & 1
    first_part_size = tag >> 5
    if not key_frame:
        raise ValueError("VP8: not a key frame (still WebP must be)")
    if chunk[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8: bad key-frame start code")
    w_raw = chunk[6] | (chunk[7] << 8)
    h_raw = chunk[8] | (chunk[9] << 8)
    return {
        "width": w_raw & 0x3FFF,
        "height": h_raw & 0x3FFF,
        "xscale": w_raw >> 14,
        "yscale": h_raw >> 14,
        "version": version,
        "show_frame": bool(show_frame),
        "first_part_size": first_part_size,
    }


def webp_decode(data: bytes) -> np.ndarray:
    """Decode a WebP container. Lossless (VP8L) decodes for real,
    including VP8X-wrapped VP8L (metadata chunks are skipped by the
    RIFF scan). Lossy VP8 and animated (ANIM/ANMF) files need a native
    library and raise NotImplementedError (register one via
    multimodal.registry); only malformed containers raise ValueError.
    Returns (H, W, 3) when alpha is fully opaque, else (H, W, 4)."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    pos = 12
    animated = False
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            rgba = vp8l_decode(chunk)
            if (rgba[:, :, 3] == 255).all():
                return np.ascontiguousarray(rgba[:, :, :3])
            return rgba
        if fourcc == b"VP8 ":
            try:
                info = vp8_frame_info(chunk)
                dims = f"{info['width']}x{info['height']}"
            except ValueError:
                dims = "?"
            raise NotImplementedError(
                f"WebP VP8 (lossy, {dims}) needs a native codec — "
                "register one via multimodal.registry"
            )
        if fourcc in (b"ANIM", b"ANMF"):
            # animation frames live INSIDE ANMF sub-chunks; a valid
            # animated file has no top-level image chunk, so classify
            # it as unsupported-format, not as corrupt
            animated = True
        # VP8X is just the extended-features header (EXIF/ICC/alpha
        # metadata): keep scanning — a VP8L chunk later in the RIFF is
        # fully decodable; only an actual lossy VP8 chunk raises.
        pos += 8 + size + (size & 1)
    if animated:
        raise NotImplementedError(
            "animated WebP (ANIM/ANMF) needs a native codec — register "
            "one via multimodal.registry"
        )
    raise ValueError("WebP: no image chunk found")


# ------------------------------------------------------- stream encode


def _tokenize(
    argb: np.ndarray, use_lz77: bool, cache_bits: int
) -> list[tuple]:
    """Greedy tokenization: ('lit', pix) | ('cache', idx) |
    ('copy', length, dist). Mirrors the decoder's cache updates."""
    tokens: list[tuple] = []
    cache = [0] * (1 << cache_bits) if cache_bits else []
    n = len(argb)
    pos = 0
    while pos < n:
        if use_lz77 and pos > 0:
            run = 0
            while pos + run < n and argb[pos + run] == argb[pos - 1] and run < 4096:
                run += 1
            if run >= 3:
                pix = int(argb[pos - 1])
                tokens.append(("copy", run, 1))
                if cache_bits:
                    cache[cache_index(pix, cache_bits)] = pix
                pos += run
                continue
        pix = int(argb[pos])
        if cache_bits:
            idx = cache_index(pix, cache_bits)
            if cache[idx] == pix:
                tokens.append(("cache", idx))
                pos += 1
                continue
            cache[idx] = pix
        tokens.append(("lit", pix))
        pos += 1
    return tokens


def _encode_pixels(
    bw: BitWriter,
    argb: np.ndarray,
    w: int,
    level0: bool,
    use_lz77: bool,
    cache_bits: int,
) -> None:
    if cache_bits:
        bw.write_bit(1)
        bw.write(cache_bits, 4)
    else:
        bw.write_bit(0)
    if level0:
        bw.write_bit(0)  # no meta-prefix image: single code group

    tokens = _tokenize(argb, use_lz77, cache_bits)
    cache_size = (1 << cache_bits) if cache_bits else 0
    hists = [
        [0] * (256 + NUM_LENGTH_CODES + cache_size),
        [0] * 256,
        [0] * 256,
        [0] * 256,
        [0] * NUM_DISTANCE_CODES,
    ]
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = _channels(t[1])
            hists[0][g] += 1
            hists[1][r] += 1
            hists[2][b] += 1
            hists[3][a] += 1
        elif t[0] == "cache":
            hists[0][256 + NUM_LENGTH_CODES + t[1]] += 1
        else:
            lcode, _, _ = prefix_encode(t[1])
            dcode, _, _ = prefix_encode(dist_to_plane(t[2], w))
            hists[0][256 + lcode] += 1
            hists[4][dcode] += 1
    # every tree must exist even if unused (read_code always runs)
    for hi in hists:
        if not any(hi):
            hi[0] = 1
    encoders = [write_code(bw, build_code_lengths(h)) for h in hists]
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = _channels(t[1])
            encoders[0].encode(bw, g)
            encoders[1].encode(bw, r)
            encoders[2].encode(bw, b)
            encoders[3].encode(bw, a)
        elif t[0] == "cache":
            encoders[0].encode(bw, 256 + NUM_LENGTH_CODES + t[1])
        else:
            lcode, lextra, lbits = prefix_encode(t[1])
            encoders[0].encode(bw, 256 + lcode)
            bw.write(lextra, lbits)
            dcode, dextra, dbits = prefix_encode(dist_to_plane(t[2], w))
            encoders[4].encode(bw, dcode)
            bw.write(dextra, dbits)


def _encode_sub_image(bw: BitWriter, argb: np.ndarray, w: int) -> None:
    """Entropy-coded sub-image (transform data / palette): no
    transforms, no meta bit, no cache, literals only."""
    _encode_pixels(bw, argb, w, level0=False, use_lz77=False, cache_bits=0)


def webp_encode(
    arr: np.ndarray,
    *,
    use_lz77: bool = True,
    cache_bits: int = 0,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
) -> bytes:
    """Encode (H, W, 3|4) uint8 to a lossless WebP. The keyword knobs
    exist so tests can drive every decoder path; defaults produce a
    plain literal/LZ77 stream. ``palette`` is mutually exclusive with
    the pixel-space transforms."""
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("expected (H, W, 3|4) uint8 array")
    if palette and (subtract_green or predictor_mode is not None or color_transform):
        raise ValueError("palette excludes other transforms")
    h, w = arr.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L size limit is 16384x16384")
    a = arr[:, :, 3].astype(np.uint32) if arr.shape[2] == 4 else np.uint32(255)
    argb = (
        (a << 24)
        | (arr[:, :, 0].astype(np.uint32) << 16)
        | (arr[:, :, 1].astype(np.uint32) << 8)
        | arr[:, :, 2].astype(np.uint32)
    ).reshape(-1)
    has_alpha = bool(arr.shape[2] == 4 and (arr[:, :, 3] != 255).any())

    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write_bit(1 if has_alpha else 0)
    bw.write(0, 3)  # version

    cur_w = w
    # Transform headers are read in stream order and inverted in
    # reverse, so forward application order == stream order.
    if subtract_green:
        bw.write_bit(1)
        bw.write(TR_SUBTRACT_GREEN, 2)
        argb = _subtract_green_forward(argb)
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        bw.write_bit(1)
        bw.write(TR_COLOR, 2)
        bits = 4
        bw.write(bits - 2, 3)
        sw, sh = _subsample(cur_w, bits), _subsample(h, bits)
        cte = 0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
        _encode_sub_image(bw, np.full(sw * sh, cte, dtype=np.uint32), sw)
        argb = _color_forward(argb, g2r, g2b, r2b)
    if predictor_mode is not None:
        bw.write_bit(1)
        bw.write(TR_PREDICTOR, 2)
        bits = 4
        bw.write(bits - 2, 3)
        sw, sh = _subsample(cur_w, bits), _subsample(h, bits)
        sub = np.full(sw * sh, 0xFF000000 | (predictor_mode << 8), dtype=np.uint32)
        _encode_sub_image(bw, sub, sw)
        argb = _predictor_forward(argb, cur_w, h, predictor_mode)
    if palette:
        colors = np.unique(argb)
        if len(colors) > 256:
            raise ValueError("palette transform needs <= 256 colors")
        bw.write_bit(1)
        bw.write(TR_COLOR_INDEXING, 2)
        bw.write(len(colors) - 1, 8)
        deltas = np.zeros(len(colors), dtype=np.uint32)
        prev = 0
        for i, c in enumerate(colors):
            deltas[i] = _sub_pixels(int(c), prev)
            prev = int(c)
        _encode_sub_image(bw, deltas, len(colors))
        lookup = {int(c): i for i, c in enumerate(colors)}
        idx = np.array([lookup[int(p)] for p in argb], dtype=np.uint32).reshape(h, cur_w)
        width_bits = _palette_width_bits(len(colors))
        idx_bits = 8 >> width_bits
        per = 1 << width_bits
        packed_w = _subsample(cur_w, width_bits)
        pad = packed_w * per - cur_w
        if pad:
            idx = np.pad(idx, ((0, 0), (0, pad)))
        green = np.zeros((h, packed_w), dtype=np.uint32)
        for i in range(per):
            green |= idx[:, i::per] << (i * idx_bits)
        argb = (np.uint32(0xFF000000) | (green << np.uint32(8))).reshape(-1)
        cur_w = packed_w
    bw.write_bit(0)  # end of transforms

    _encode_pixels(bw, argb, cur_w, level0=True, use_lz77=use_lz77, cache_bits=cache_bits)

    payload = b"\x2f" + bw.getvalue()
    if len(payload) & 1:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload + b"\x00"
    else:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff_size = 4 + len(chunk)
    return b"RIFF" + struct.pack("<I", riff_size) + b"WEBP" + chunk
