"""FLAC codec: lossless round trips through the encoder's real paths
(FIXED predictors, Rice, three stereo decorrelations, multi-frame, 8-bit)
plus hand-built streams for the decoder-only paths (CONSTANT, VERBATIM,
LPC, Rice2, rice escape-to-raw, wasted bits) and loud-failure cases."""

from __future__ import annotations

import numpy as np
import pytest

from polygon_algotrading_env_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number_encode,
    decode_flac,
    encode_flac,
)


def _quant(x, bps=16):
    scale = float(1 << (bps - 1))
    return np.clip(np.round(np.clip(x, -1, 1) * scale), -scale, scale - 1) / scale


def test_flac_mono_roundtrip_is_lossless_and_compresses():
    rate = 8000
    t = np.arange(rate) / rate
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    blob = encode_flac(sig, rate)
    back, r = decode_flac(blob)
    assert r == rate and len(back) == rate
    assert np.array_equal(back, _quant(sig))
    assert len(blob) < 2 * len(sig)  # smaller than the raw s16 PCM


def test_flac_stereo_decorrelation_modes_roundtrip():
    rate = 8000
    t = np.arange(3000) / rate
    l = 0.4 * np.sin(2 * np.pi * 220 * t)
    r = 0.4 * np.sin(2 * np.pi * 330 * t) + 0.01 * np.cos(2 * np.pi * 50 * t)
    ref = (_quant(l) + _quant(r)) / 2  # decode contract: mono average
    for mode in ("independent", "left_side", "mid_side"):
        back, _ = decode_flac(
            encode_flac(np.stack([l, r]), rate, stereo_mode=mode)
        )
        assert np.array_equal(back, ref), mode


def test_flac_multiframe_8bit_and_noise():
    rate = 8000
    rng = np.random.default_rng(2)
    noise = rng.uniform(-0.9, 0.9, 5000)
    back, _ = decode_flac(encode_flac(noise, rate, blocksize=1024))
    assert np.array_equal(back, _quant(noise))
    back8, _ = decode_flac(encode_flac(noise, rate, bps=8, blocksize=512))
    assert np.array_equal(back8, _quant(noise, bps=8))


def _hand_frame(subframe_writer, blocksize, bps=16, rate=8000):
    """Build a 1-frame mono FLAC stream whose subframe bits come from
    ``subframe_writer(wr)`` — exercises decoder paths our encoder never
    emits."""
    info = bytearray(34)
    info[0:2] = blocksize.to_bytes(2, "big")
    info[2:4] = blocksize.to_bytes(2, "big")
    packed = (rate << 4) | (0 << 1) | ((bps - 1) >> 4)
    info[10:13] = packed.to_bytes(3, "big")
    info[13] = (((bps - 1) & 0x0F) << 4) | 0
    info[14:18] = blocksize.to_bytes(4, "big")
    out = bytearray(b"fLaC") + bytes([0x80]) + len(info).to_bytes(3, "big") + info

    wr = _BitWriter()
    wr.write(0x3FFE, 14)
    wr.write(0, 2)
    wr.write(7, 4)   # 16-bit blocksize follows
    wr.write(0, 4)   # rate from STREAMINFO
    wr.write(0, 4)   # mono
    wr.write(4, 3)   # 16-bit
    wr.write(0, 1)
    for b in _utf8_number_encode(0):
        wr.write(b, 8)
    wr.write(blocksize - 1, 16)
    wr.write(_crc8(bytes(wr.buf)), 8)
    subframe_writer(wr)
    wr.align()
    wr.write(_crc16(bytes(wr.buf)), 16)
    return bytes(out + wr.bytes())


def test_flac_constant_and_verbatim_subframes():
    def const(wr):
        wr.write(0, 1); wr.write(0, 6); wr.write(0, 1)
        wr.write_signed(-1234, 16)

    back, _ = decode_flac(_hand_frame(const, 64))
    assert np.allclose(back, -1234 / 32768.0)

    vals = [5, -7, 100, -32768, 32767, 0, 1, -1]

    def verb(wr):
        wr.write(0, 1); wr.write(1, 6); wr.write(0, 1)
        for v in vals:
            wr.write_signed(v, 16)

    back, _ = decode_flac(_hand_frame(verb, len(vals)))
    assert np.array_equal(np.round(back * 32768).astype(int), vals)


def test_flac_lpc_subframe_and_rice2_and_escape():
    # LPC order 1, coef 1<<shift == pure LOCF: x_t = x_{t-1} + r_t
    resid = [3, -2, 5, 0, -1]
    warm = [100]

    def lpc(wr):
        wr.write(0, 1); wr.write(32, 6); wr.write(0, 1)  # LPC order 1
        wr.write_signed(warm[0], 16)
        wr.write(3, 4)             # precision-1 = 3 -> 4-bit coefs
        wr.write_signed(2, 5)      # shift 2
        wr.write_signed(4, 4)      # coef 4 == 1<<2
        wr.write(1, 2)             # Rice2 method
        wr.write(0, 4)             # one partition
        wr.write(2, 5)             # rice2 param
        for r in resid:
            zz = (abs(r) << 1) - 1 if r < 0 else (r << 1)
            wr.write_unary(zz >> 2)
            wr.write(zz & 3, 2)

    back, _ = decode_flac(_hand_frame(lpc, 1 + len(resid)))
    exp = [100]
    for r in resid:
        exp.append(exp[-1] + r)
    assert np.array_equal(np.round(back * 32768).astype(int), exp)

    # escape-to-raw partition: param == 0b1111 then 5-bit raw size
    vals = [7, -9, 12, -15]

    def esc(wr):
        wr.write(0, 1); wr.write(8, 6); wr.write(0, 1)  # FIXED order 0
        wr.write(0, 2)             # Rice method
        wr.write(0, 4)
        wr.write(15, 4)            # escape
        wr.write(8, 5)             # 8-bit raw residuals
        for v in vals:
            wr.write_signed(v, 8)

    back, _ = decode_flac(_hand_frame(esc, len(vals)))
    assert np.array_equal(np.round(back * 32768).astype(int), vals)


def test_flac_wasted_bits():
    vals = [8, -16, 24, 0]  # all divisible by 8 -> 3 wasted bits

    def wasted(wr):
        wr.write(0, 1); wr.write(1, 6)  # VERBATIM
        wr.write(1, 1)                  # wasted flag
        wr.write_unary(2)               # unary(k-1)=2 -> k=3
        for v in vals:
            wr.write_signed(v >> 3, 13)

    back, _ = decode_flac(_hand_frame(wasted, len(vals)))
    assert np.array_equal(np.round(back * 32768).astype(int), vals)


def test_flac_malformed_and_crc_failures():
    rate = 8000
    sig = 0.3 * np.sin(np.arange(2000) / 30.0)
    blob = bytearray(encode_flac(sig, rate))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"XXXX" + bytes(blob[4:]))
    with pytest.raises(ValueError, match="truncated|ended early"):
        decode_flac(bytes(blob[:50]))
    # flip one PCM-carrying byte near the end: some CRC must trip
    corrupt = bytearray(blob)
    corrupt[-20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|FLAC"):
        decode_flac(bytes(corrupt))


def test_flac_through_audio_features_and_extract(spark):
    from polygon_algotrading_env_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        wav_features,
    )

    rate = 8000
    t = np.arange(rate // 2) / rate
    blob = encode_flac(0.4 * np.sin(2 * np.pi * 220 * t), rate)
    f = wav_features(blob)
    assert abs(f[0] - 0.5) < 1e-9          # duration
    assert abs(f[2] - 0.4 / 2**0.5) < 1e-3  # rms
    media = spark.createDataFrame(
        [(1, "audio", bytearray(blob), ("audio/flac", None, None, 0.5, None))],
        MEDIA_SCHEMA,
    )
    feats = extract_features(media).collect()
    assert len(feats) == 1 and abs(feats[0]["feature"][0] - 0.5) < 1e-9
