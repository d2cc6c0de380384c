"""Vendored audio sample codecs: G.711 companding, IMA ADPCM, WAV
container dispatch (multimodal/audio.py)."""

import numpy as np
import pytest

from dwh_spark.multimodal import audio as A


def test_g711_byte_identity():
    """decode→encode is the identity on code bytes — the strong G.711
    conformance check. The single mu-law exception is 0x7F (negative
    zero decodes to 0, which re-encodes as positive zero 0xFF)."""
    for u in range(256):
        if u == 0x7F:
            assert A.ulaw_decode_byte(u) == 0
            continue
        assert A.ulaw_encode_sample(A.ulaw_decode_byte(u)) == u
    for a in range(256):
        assert A.alaw_encode_sample(A.alaw_decode_byte(a)) == a


def test_g711_quantization_error_bounded():
    """Companding error is bounded by half the top-segment step:
    mu-law 8159-point quantizer over +-32k → <= 1024; A-law 13-bit →
    <= 528 (including the >>3 truncation)."""
    xs = np.arange(-32768, 32768, 13, dtype=np.int64)
    for enc, dec, bound in (
        (A.ulaw_encode_sample, A.ulaw_decode_byte, 1024),
        (A.alaw_encode_sample, A.alaw_decode_byte, 528),
    ):
        err = max(abs(dec(enc(int(x))) - int(x)) for x in xs)
        assert err <= bound, err


def test_g711_vectorized_matches_scalar():
    data = bytes(range(256))
    assert A.ulaw_decode(data).tolist() == [
        A.ulaw_decode_byte(u) for u in range(256)
    ]
    assert A.alaw_decode(data).tolist() == [
        A.alaw_decode_byte(a) for a in range(256)
    ]


def test_ima_adpcm_exact_reconstruction():
    """The encoder's internal reconstruction IS the decode contract:
    decode(encode(x)) must equal it bit-for-bit, and must track the
    input within the adaptive quantizer's reach."""
    rng = np.random.default_rng(3)
    s = np.cumsum(rng.integers(-300, 300, 1001)).clip(-32000, 32000).astype(np.int16)
    blk, recon = A.ima_adpcm_encode_block(s, index=20)
    dec = A.ima_adpcm_decode_block(blk)
    assert np.array_equal(dec, recon)
    assert np.abs(dec.astype(int) - s.astype(int)).max() < 2000


def test_ima_adpcm_clamps_and_index_bounds():
    # extreme jumps drive predictor/index into their clamps
    s = np.array([0] + [32767, -32768] * 100, np.int16)
    blk, recon = A.ima_adpcm_encode_block(s, index=0)
    dec = A.ima_adpcm_decode_block(blk)
    assert np.array_equal(dec, recon)
    with pytest.raises(ValueError, match="odd"):
        A.ima_adpcm_encode_block(np.zeros(4, np.int16))
    bad = bytearray(blk)
    bad[2] = 99  # step index out of range
    with pytest.raises(ValueError, match="step index"):
        A.ima_adpcm_decode_block(bytes(bad))


def test_wav_roundtrip_all_codecs():
    rng = np.random.default_rng(7)
    s = np.cumsum(rng.integers(-400, 400, 1001)).clip(-32000, 32000).astype(np.int16)
    for codec, tol in (
        ("pcm16", 0), ("float32", 0), ("pcm8", 255),
        ("ulaw", 1024), ("alaw", 528), ("ima_adpcm", 2000),
    ):
        out, rate = A.wav_decode(A.wav_encode(s, 16000, codec))
        assert rate == 16000
        assert out.shape == (1001, 1), codec
        assert np.abs(out[:, 0].astype(int) - s.astype(int)).max() <= tol, codec


def test_wav_stereo_and_24_32_bit():
    rng = np.random.default_rng(9)
    st = rng.integers(-30000, 30000, (64, 2)).astype(np.int16)
    out, _ = A.wav_decode(A.wav_encode(st, 44100, "pcm16"))
    assert np.array_equal(out, st)
    # hand-build 24-bit and 32-bit payloads: high bytes must survive
    import struct

    def wav(tag, bits, payload, ba):
        return (
            b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, tag, 1, 8000, 8000 * ba, ba, bits)
            + b"data" + struct.pack("<I", len(payload)) + payload
        )

    vals32 = np.array([0x12340000, -0x23450000], "<i4")
    out32, _ = A.wav_decode(wav(1, 32, vals32.tobytes(), 4))
    assert out32[:, 0].tolist() == [0x1234, -0x2345]
    p24 = b"\x00\x00\x40" + b"\x00\x00\xc0"  # +0x400000, -0x400000
    out24, _ = A.wav_decode(wav(1, 24, p24, 3))
    assert out24[:, 0].tolist() == [0x4000, -0x4000]


def test_wav_unknown_tag_registry_seam():
    import struct

    from dwh_spark.multimodal import registry

    payload = b"\x01\x02\x03\x04"
    wav = (
        b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 0x0055, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 4) + payload
    )
    registry._reset_for_tests()
    try:
        with pytest.raises(NotImplementedError, match="0x0055"):
            A.wav_decode(wav)
        registry.register_audio_decoder(
            "wav_fmt_0x0055",
            lambda data: np.frombuffer(data, np.uint8).astype(np.int16).reshape(-1, 1),
        )
        out, rate = A.wav_decode(wav)
        assert rate == 8000 and out[:, 0].tolist() == [1, 2, 3, 4]
    finally:
        registry._reset_for_tests()


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        A.wav_decode(b"RIFFxxxxAVI LIST")
    with pytest.raises(ValueError, match="fmt/data"):
        A.wav_decode(b"RIFF\x04\x00\x00\x00WAVE")


# ------------------------------------------------------------------- FLAC


def test_flac_lossless_roundtrip_all_orders():
    from dwh_spark.multimodal import flac

    rng = np.random.default_rng(5)
    s = np.cumsum(rng.integers(-300, 300, 9000)).clip(-32000, 32000).astype(np.int64)
    data = flac.flac_encode(s, rate=8000, block_size=4096)
    out, rate = flac.flac_decode(data)
    assert rate == 8000 and np.array_equal(out[:, 0], s)
    assert len(data) < 2 * len(s)  # rice coding actually compresses
    for order in (0, 1, 2):  # multi-frame + UTF-8 frame numbers
        d = flac.flac_encode(s[:1000], fixed_order=order, block_size=256)
        assert np.array_equal(flac.flac_decode(d)[0][:, 0], s[:1000])


def test_flac_stereo_decorrelation_modes():
    from dwh_spark.multimodal import flac

    rng = np.random.default_rng(7)
    l = np.cumsum(rng.integers(-300, 300, 5000)).clip(-32000, 32000)
    r = np.cumsum(rng.integers(-200, 200, 5000)).clip(-32000, 32000)
    st = np.stack([l, r], 1).astype(np.int64)
    for mode in (None, "ls", "rs", "ms"):
        out, _ = flac.flac_decode(flac.flac_encode(st, stereo_mode=mode))
        assert np.array_equal(out, st), mode


def test_flac_crc_detects_corruption():
    import pytest

    from dwh_spark.multimodal import flac

    s = np.arange(2000, dtype=np.int64) % 700 - 350
    data = bytearray(flac.flac_encode(s))
    data[len(data) // 2] ^= 0x40
    # a flipped bit either fails a CRC outright or derails the rice
    # stream into a detected truncation/sync error — always ValueError
    with pytest.raises(ValueError, match="CRC|truncated|sync"):
        flac.flac_decode(bytes(data))
    data2 = bytearray(flac.flac_encode(s))
    data2[-1] ^= 0x01  # flip inside the final CRC-16 itself
    with pytest.raises(ValueError, match="CRC"):
        flac.flac_decode(bytes(data2))
    with pytest.raises(ValueError, match="magic"):
        flac.flac_decode(b"not a flac stream")


def test_flac_lpc_subframe_decodes():
    """The LPC path has no encoder twin, so pin it with a hand-built
    stream: order-1 LPC, coef c, shift s => x[i] = ((c*x[i-1])>>s)+r[i]."""
    import struct

    from dwh_spark.multimodal import flac

    bs, bits = 8, 16
    warm, coef, precision, shift = 100, 13, 5, 3
    residuals = [3, -2, 0, 7, -5, 1, 4]

    si = flac.MSBWriter()
    si.write(bs, 16); si.write(bs, 16); si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(bits - 1, 5); si.write(bs, 36)
    streaminfo = si.getvalue() + b"\x00" * 16
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo

    hdr = flac.MSBWriter()
    hdr.write(0b11111111111110, 14); hdr.write(0, 1); hdr.write(0, 1)
    hdr.write(7, 4)   # 16-bit blocksize at end
    hdr.write(0, 4)   # rate from streaminfo
    hdr.write(0, 4)   # mono
    hdr.write(4, 3)   # 16-bit samples
    hdr.write(0, 1)
    hdr.align()
    hb = hdr.getvalue() + b"\x00"  # frame number 0
    bsw = flac.MSBWriter(); bsw.write(bs - 1, 16); bsw.align()
    hb += bsw.getvalue()
    hb += bytes([flac._crc8(hb)])

    body = flac.MSBWriter()
    body.write(0, 1)
    body.write(32 + (1 - 1), 6)   # LPC, order 1 (type 32 + order-1)
    body.write(0, 1)              # no wasted bits
    body.write(warm & 0xFFFF, bits)
    body.write(precision - 1, 4)
    body.write(shift & 0x1F, 5)   # positive 5-bit signed
    body.write(coef & ((1 << precision) - 1), precision)
    flac._write_residuals(body, residuals, bs, 1)
    body.align()
    frame = hb + body.getvalue()
    frame += struct.pack(">H", flac._crc16(frame))
    out += frame

    decoded, rate = flac.flac_decode(bytes(out))
    expect = [warm]
    for r in residuals:
        expect.append(((coef * expect[-1]) >> shift) + r)
    assert rate == 8000
    assert decoded[:, 0].tolist() == expect


def _minimal_flac_prefix(bs_code: int, bits_code: int) -> bytes:
    """fLaC + STREAMINFO + the first bytes of a frame header carrying
    the given blocksize / sample-size codes (enough to reach the code
    validation, which precedes CRC checks)."""
    import struct

    from dwh_spark.multimodal import flac

    si = flac.MSBWriter()
    si.write(16, 16); si.write(16, 16); si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(15, 5); si.write(16, 36)
    streaminfo = si.getvalue() + b"\x00" * 16
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    hdr = flac.MSBWriter()
    hdr.write(0b11111111111110, 14); hdr.write(0, 1); hdr.write(0, 1)
    hdr.write(bs_code, 4); hdr.write(0, 4); hdr.write(0, 4)
    hdr.write(bits_code, 3); hdr.write(0, 1)
    hdr.align()
    out += hdr.getvalue() + b"\x00" * 8
    return bytes(out)


def test_flac_reserved_codes_raise_domain_errors():
    """Reserved blocksize code 0 and sample-size code 3 must raise the
    codec's ValueError contract, not leak a bare KeyError."""
    import pytest

    from dwh_spark.multimodal import flac

    with pytest.raises(ValueError, match="reserved blocksize"):
        flac.flac_decode(_minimal_flac_prefix(bs_code=0, bits_code=4))
    with pytest.raises(ValueError, match="reserved sample-size"):
        flac.flac_decode(_minimal_flac_prefix(bs_code=7, bits_code=3))


def test_flac_negative_lpc_shift_raises_domain_error():
    """A malformed stream with a negative LPC shift must raise the
    codec's ValueError, not numpy/python's negative-shift error."""
    import struct

    import pytest

    from dwh_spark.multimodal import flac

    bs, bits = 8, 16
    si = flac.MSBWriter()
    si.write(bs, 16); si.write(bs, 16); si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(bits - 1, 5); si.write(bs, 36)
    streaminfo = si.getvalue() + b"\x00" * 16
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    hdr = flac.MSBWriter()
    hdr.write(0b11111111111110, 14); hdr.write(0, 1); hdr.write(0, 1)
    hdr.write(7, 4); hdr.write(0, 4); hdr.write(0, 4); hdr.write(4, 3)
    hdr.write(0, 1)
    hdr.align()
    hb = hdr.getvalue() + b"\x00"
    bsw = flac.MSBWriter(); bsw.write(bs - 1, 16); bsw.align()
    hb += bsw.getvalue()
    hb += bytes([flac._crc8(hb)])
    body = flac.MSBWriter()
    body.write(0, 1)
    body.write(32 + (1 - 1), 6)
    body.write(0, 1)
    body.write(100, bits)
    body.write(5 - 1, 4)
    body.write((-1) & 0x1F, 5)   # negative shift
    body.write(13, 5)
    flac._write_residuals(body, [0] * (bs - 1), bs, 1)
    body.align()
    frame = hb + body.getvalue()
    frame += struct.pack(">H", flac._crc16(frame))
    out += frame
    with pytest.raises(ValueError, match="negative LPC shift"):
        flac.flac_decode(bytes(out))
