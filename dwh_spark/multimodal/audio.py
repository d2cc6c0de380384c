"""Vendored pure-numpy audio sample codecs: PCM, G.711, IMA ADPCM.

Python-side twin of the JVM-column WAV header ops in
``multimodal/av.py`` (wav_bytes / parse_wav_header build and parse
headers without touching samples): this module decodes the actual
sample payload inside Arrow batches (``mapInPandas``).

Implements public specs from scratch:
- RIFF/WAVE container walk (fmt + data chunks).
- Linear PCM at 8 (unsigned), 16, 24, 32 bits and IEEE float32 —
  all normalized to int16.
- G.711 mu-law and A-law companding (CCITT G.711; the classic
  public-domain reference implementation is Sun's g711.c). Table-free
  closed forms, vectorized over numpy via 256-entry LUTs.
- IMA/DVI ADPCM (the IMA Digital Audio Pack algorithm; WAV format
  tag 0x11): 4-bit adaptive differential coding, block headers with
  (predictor, step index), low-nibble-first packing.

Unknown format tags consult ``multimodal/registry.get_audio_decoder``
before raising — same seam as images/video.

Reference parity: the reference engine's media path treats audio as
opaque bytes plus metadata; sample decode is the capability a real
training-data pipeline needs on top (SURVEY.md training-pipeline
section), mirroring what its Go media libs would provide.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- G.711

_BIAS = 0x84
_CLIP = 32635


def ulaw_decode_byte(u: int) -> int:
    """One mu-law byte → linear int16 (G.711 expansion)."""
    u = ~u & 0xFF
    t = ((u & 0x0F) << 3) + _BIAS
    t <<= (u & 0x70) >> 4
    return _BIAS - t if (u & 0x80) else t - _BIAS


def ulaw_encode_sample(s: int) -> int:
    """Linear int16 → mu-law byte (G.711 compression)."""
    sign = 0x80 if s < 0 else 0
    if s < 0:
        s = -s
    if s > _CLIP:
        s = _CLIP
    s += _BIAS
    exp = s.bit_length() - 8  # s >= 0x84 so bit_length >= 8
    mant = (s >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def alaw_decode_byte(a: int) -> int:
    """One A-law byte → linear int16 (G.711 expansion)."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


_ALAW_SEG_END = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def alaw_encode_sample(s: int) -> int:
    """Linear int16 → A-law byte (G.711 compression, 13-bit input)."""
    pcm = s >> 3
    if pcm >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        pcm = -pcm - 1
    seg = 8
    for i, end in enumerate(_ALAW_SEG_END):
        if pcm <= end:
            seg = i
            break
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (pcm >> 1) & 0x0F if seg < 2 else (pcm >> seg) & 0x0F
    return aval ^ mask


_ULAW_LUT = np.array([ulaw_decode_byte(u) for u in range(256)], dtype=np.int16)
_ALAW_LUT = np.array([alaw_decode_byte(a) for a in range(256)], dtype=np.int16)


def ulaw_decode(data: bytes) -> np.ndarray:
    return _ULAW_LUT[np.frombuffer(data, np.uint8)]


def alaw_decode(data: bytes) -> np.ndarray:
    return _ALAW_LUT[np.frombuffer(data, np.uint8)]


def ulaw_encode(samples: np.ndarray) -> bytes:
    return bytes(ulaw_encode_sample(int(s)) for s in samples)


def alaw_encode(samples: np.ndarray) -> bytes:
    return bytes(alaw_encode_sample(int(s)) for s in samples)


# -------------------------------------------------------- IMA ADPCM

IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
IMA_INDEX_ADJUST = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_step(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (pred, index) -> updated state."""
    step = int(IMA_STEPS[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + IMA_INDEX_ADJUST[nibble & 7]))
    return pred, index


def ima_adpcm_decode_block(block: bytes) -> np.ndarray:
    """One mono IMA ADPCM WAV block → int16 samples. Layout: int16
    predictor, uint8 step index, uint8 reserved, then nibble pairs
    low-nibble-first. Yields 1 + 2*(len-4) samples."""
    pred, index = struct.unpack("<hB", block[:3])
    if index > 88:
        raise ValueError(f"IMA ADPCM step index {index}")
    out = np.empty(1 + 2 * (len(block) - 4), np.int16)
    out[0] = pred
    pos = 1
    for byte in block[4:]:
        for nib in (byte & 0x0F, byte >> 4):
            pred, index = _ima_step(nib, pred, index)
            out[pos] = pred
            pos += 1
    return out


def ima_adpcm_encode_block(
    samples: np.ndarray, index: int = 0
) -> tuple[bytes, np.ndarray]:
    """Encode int16 samples (odd count) as one mono block starting at
    the given step index. Returns (block_bytes, exact_reconstruction)
    — the reconstruction is what any correct decoder must produce."""
    n = len(samples)
    if n % 2 == 0:
        raise ValueError("IMA block sample count must be odd (1 + 2k)")
    pred = int(samples[0])
    recon = np.empty(n, np.int16)
    recon[0] = pred
    out = bytearray(struct.pack("<hBB", pred, index, 0))
    nibbles = []
    for i in range(1, n):
        step = int(IMA_STEPS[index])
        diff = int(samples[i]) - pred
        nib = 0
        if diff < 0:
            nib = 8
            diff = -diff
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        pred, index = _ima_step(nib, pred, index)
        recon[i] = pred
        nibbles.append(nib)
    for lo, hi in zip(nibbles[::2], nibbles[1::2]):
        out.append(lo | (hi << 4))
    return bytes(out), recon


# ---------------------------------------------------- WAV container

WAVE_PCM = 0x0001
WAVE_IEEE_FLOAT = 0x0003
WAVE_ALAW = 0x0006
WAVE_MULAW = 0x0007
WAVE_IMA_ADPCM = 0x0011


def _decode_pcm(data: bytes, bits: int) -> np.ndarray:
    if bits == 16:
        return np.frombuffer(data, "<i2")
    if bits == 8:  # unsigned, center 128
        return ((np.frombuffer(data, np.uint8).astype(np.int16) - 128) << 8).astype(
            np.int16
        )
    if bits == 24:
        b = np.frombuffer(data, np.uint8).reshape(-1, 3).astype(np.uint32)
        raw = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)).astype(np.int32)
        raw = (raw << 8) >> 8  # sign-extend 24 -> 32
        return (raw >> 8).astype(np.int16)
    if bits == 32:
        return (np.frombuffer(data, "<i4") >> 16).astype(np.int16)
    raise ValueError(f"PCM bits-per-sample {bits}")


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n_samples, channels) int16 array, sample_rate).

    Dispatches on the fmt chunk's format tag: PCM (8/16/24/32-bit),
    IEEE float32, G.711 mu-law / A-law, IMA ADPCM (mono). Unknown
    tags consult the pluggable audio-decoder registry before raising.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (RIFF/WAVE) container")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _byte_rate, block_align, bits = fmt
    if tag == WAVE_PCM:
        flat = _decode_pcm(payload, bits)
    elif tag == WAVE_IEEE_FLOAT:
        f = np.frombuffer(payload, "<f4")
        flat = np.clip(np.rint(f * 32767.0), -32768, 32767).astype(np.int16)
    elif tag == WAVE_MULAW:
        flat = ulaw_decode(payload)
    elif tag == WAVE_ALAW:
        flat = alaw_decode(payload)
    elif tag == WAVE_IMA_ADPCM:
        if channels != 1:
            raise NotImplementedError("IMA ADPCM: mono only")
        blocks = [
            ima_adpcm_decode_block(payload[i : i + block_align])
            for i in range(0, len(payload), block_align)
            if len(payload[i : i + block_align]) > 4
        ]
        flat = np.concatenate(blocks) if blocks else np.empty(0, np.int16)
    else:
        from dwh_spark.multimodal import registry

        plugged = registry.get_audio_decoder(f"wav_fmt_{tag:#06x}")
        if plugged is None:
            raise NotImplementedError(
                f"WAV format tag {tag:#06x} needs a native codec — register "
                f"'wav_fmt_{tag:#06x}' via multimodal.registry"
            )
        # normalize plugin output to this function's contract:
        # (n, channels) int16 — registry decoders return (n,) floats
        out = np.asarray(plugged(payload))
        if np.issubdtype(out.dtype, np.floating):
            out = np.clip(np.rint(out * 32767.0), -32768, 32767)
        flat = out.astype(np.int16).reshape(-1)
    if channels > 1:
        flat = flat[: len(flat) - len(flat) % channels]
        return flat.reshape(-1, channels), rate
    return flat.reshape(-1, 1), rate


def wav_encode(
    samples: np.ndarray,
    rate: int,
    codec: str = "pcm16",
    block_samples: int = 1001,
) -> bytes:
    """Int16 samples (flat mono or (n, ch)) → WAV bytes in the given
    codec ('pcm16', 'pcm8', 'float32', 'ulaw', 'alaw', 'ima_adpcm')."""
    arr = np.asarray(samples, np.int16)
    channels = 1 if arr.ndim == 1 else arr.shape[1]
    flat = arr.reshape(-1)
    if codec == "pcm16":
        tag, bits, payload = WAVE_PCM, 16, flat.astype("<i2").tobytes()
        block_align = 2 * channels
    elif codec == "pcm8":
        tag, bits = WAVE_PCM, 8
        payload = ((flat.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
        block_align = channels
    elif codec == "float32":
        tag, bits = WAVE_IEEE_FLOAT, 32
        payload = (flat.astype(np.float32) / 32767.0).astype("<f4").tobytes()
        block_align = 4 * channels
    elif codec == "ulaw":
        tag, bits, payload = WAVE_MULAW, 8, ulaw_encode(flat)
        block_align = channels
    elif codec == "alaw":
        tag, bits, payload = WAVE_ALAW, 8, alaw_encode(flat)
        block_align = channels
    elif codec == "ima_adpcm":
        if channels != 1:
            raise NotImplementedError("IMA ADPCM: mono only")
        if block_samples % 2 == 0:
            raise ValueError("block_samples must be odd")
        parts = []
        for i in range(0, len(flat), block_samples):
            chunk = flat[i : i + block_samples]
            if len(chunk) % 2 == 0:
                chunk = chunk[:-1]
            if len(chunk) == 0:
                break
            parts.append(ima_adpcm_encode_block(chunk)[0])
        tag, bits = WAVE_IMA_ADPCM, 4
        payload = b"".join(parts)
        block_align = 4 + (block_samples - 1) // 2
    else:
        raise ValueError(f"unknown codec {codec!r}")
    if codec == "ima_adpcm":
        # spec nAvgBytesPerSec = rate * block_bytes / samples_per_block
        byte_rate = rate * block_align // block_samples
    else:
        byte_rate = rate * block_align
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(payload))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, tag, channels, rate, byte_rate, block_align, bits)
        + b"data"
        + struct.pack("<I", len(payload))
    )
    return hdr + payload
