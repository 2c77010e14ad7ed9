"""FLAC fixed-predictor subset codec (operators/flac.py): bit-exact
round trips (FLAC is lossless), residual/CRC structure, error boundaries,
and codec-transparency through the audio feature passes (FLAC bytes must
produce byte-identical features to the same samples as WAV)."""

import numpy as np
import pytest

from seronet_data_validator_spark.operators.flac import (
    _crc8,
    decode_flac,
    flac_bytes,
)


def _sig(seed=11, n=9000, sr=8000):
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + rng.normal(0, 0.01, n)
    return (np.clip(x, -1, 1) * 32767).astype(np.int16)


@pytest.mark.parametrize(
    "samples,sr",
    [
        (_sig(), 8000),
        (np.full(5000, -123, np.int16), 16000),            # constant
        (np.arange(-4096, 4096, dtype=np.int16), 44100),   # order-2 perfect
        (np.array([1, -1, 32767, -32768, 0], np.int16), 48000),  # extremes
        (np.random.default_rng(3).integers(-32768, 32768, 10000).astype(np.int16), 22050),
    ],
)
def test_roundtrip_bit_exact(samples, sr):
    dec, dsr = decode_flac(flac_bytes(samples, sr))
    assert dsr == sr
    assert np.array_equal(dec, samples)


def test_multi_frame_and_blocksize():
    s = _sig(n=13000)
    dec, _ = decode_flac(flac_bytes(s, 8000, block_size=1024))  # 13 frames
    assert np.array_equal(dec, s)


def test_crc_and_error_boundaries():
    s = _sig(n=3000)
    enc = bytearray(flac_bytes(s, 8000))
    with pytest.raises(ValueError):
        decode_flac(b"not flac")
    with pytest.raises(ValueError):
        decode_flac(bytes(enc[: len(enc) // 2]))  # truncated
    # flip one payload byte -> frame CRC-16 must catch it
    bad = bytearray(enc)
    bad[-40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    assert _crc8(b"") == 0


def test_flac_transparent_in_feature_passes(spark):
    """The SAME samples through WAV and FLAC bytes must produce identical
    exact features — codec transparency of the decode dispatch."""
    from seronet_data_validator_spark.operators.dsp import audio_basic_features_exact
    from seronet_data_validator_spark.sources.clips import wav_bytes

    s = _sig(n=7000)
    rows = [
        ("wav", bytearray(wav_bytes(s, 8000))),
        ("flac", bytearray(flac_bytes(s, 8000))),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r["clip_id"]: r for r in audio_basic_features_exact(df).collect()}
    for field in ("n_samples", "sr_hz", "peak_abs", "zero_crossings", "rms"):
        assert out["wav"][field] == out["flac"][field]


# ---- round-5 additions: stereo, LPC, spec-literal STREAMINFO ----


def _stereo_sig(seed=5, n=9000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    left = (3000 * np.sin(t / 20) + rng.normal(0, 40, n)).astype(np.int16)
    right = (left // 2 + rng.normal(0, 60, n)).astype(np.int16)
    return np.stack([left, right], axis=1)


@pytest.mark.parametrize("order", [1, 2, 4, 8, 12, 32])
def test_lpc_roundtrip_bit_exact(order):
    from seronet_data_validator_spark.operators.flac import decode_flac_full

    s = _sig(n=9000)
    enc = flac_bytes(s, 8000, lpc_order=order)
    dec, sr = decode_flac(enc)
    assert sr == 8000 and np.array_equal(dec, s)
    full, _ = decode_flac_full(enc)
    assert full.shape == (len(s), 1)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
@pytest.mark.parametrize("order", [0, 4])
def test_stereo_roundtrip_all_decorrelations(mode, order):
    from seronet_data_validator_spark.operators.flac import decode_flac_full

    st = _stereo_sig()
    enc = flac_bytes(st, 16000, stereo_mode=mode, lpc_order=order)
    full, sr = decode_flac_full(enc)
    assert sr == 16000
    assert np.array_equal(full, st)
    # mono contract downmixes deterministically: (L+R) >> 1
    mono, _ = decode_flac(enc)
    exp = (
        (st[:, 0].astype(np.int64) + st[:, 1].astype(np.int64)) >> 1
    ).astype(np.int16)
    assert np.array_equal(mono, exp)


def test_lpc_beats_fixed_on_tonal_signal():
    """Sanity that the LPC path is genuine compression, not a re-encode."""
    s = _sig(n=16000)
    assert len(flac_bytes(s, 8000, lpc_order=8)) < len(flac_bytes(s, 8000))


def test_streaminfo_spec_literal_field_layout():
    """Byte-literal STREAMINFO authored field-by-field per RFC 9639 §8.2
    (independent of this module's encoder): 44100 Hz, 2 ch, 16 bps,
    123456 samples. Catches packed-layout bugs that encoder/decoder
    round-trips cannot (both sides sharing the same wrong shift)."""
    from seronet_data_validator_spark.operators.flac import decode_flac_full

    # bits 63..44 sr=44100, 43..41 ch-1=1, 40..36 bps-1=15, 35..0 total
    packed = (44100 << 44) | (1 << 41) | (15 << 36) | 123456
    si = (
        b"\x10\x00"  # min block 4096
        + b"\x10\x00"  # max block 4096
        + b"\x00\x00\x00" * 2  # frame sizes unknown
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # md5
    )
    blob = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si
    # no frames: decodes to an empty stream with the right sr/ch metadata
    full, sr = decode_flac_full(blob)
    assert sr == 44100
    assert full.shape == (0, 2)
    # a 24-bit mono declaration reads back as a deep (int32) empty stream
    packed24 = (48000 << 44) | (0 << 41) | (23 << 36) | 0
    si24 = si[:10] + packed24.to_bytes(8, "big") + b"\x00" * 16
    blob24 = b"fLaC" + bytes([0x80]) + len(si24).to_bytes(3, "big") + si24
    full24, sr24 = decode_flac_full(blob24)
    assert sr24 == 48000
    assert full24.shape == (0, 1)
    assert full24.dtype == np.int32


def test_escaped_partition_nbits_zero_decodes_zeros():
    """A raw-escape partition with nbits=0 is valid per spec (all-zero
    residuals); hand-assemble a frame using escape code 0b1111 + nbits=0."""
    from seronet_data_validator_spark.operators.flac import (
        _BitWriter,
        _crc8 as crc8,
        _crc16 as crc16,
        _SYNC,
        _utf8_number,
    )
    import struct

    n = 64
    # STREAMINFO for mono/16-bit, n samples
    packed = (8000 << 44) | (0 << 41) | (15 << 36) | n
    si = (
        struct.pack(">HH", 16, 4096)
        + b"\x00\x00\x00" * 2
        + packed.to_bytes(8, "big")
        + b"\x00" * 16
    )
    out = bytearray(b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si)
    w = _BitWriter()
    w.write(_SYNC, 14)
    w.write(0, 2)
    w.write(0b0111, 4)  # 16-bit blocksize at end
    w.write(0b0000, 4)  # sr from STREAMINFO
    w.write(0b0000, 4)  # mono
    w.write(0b100, 3)  # 16 bps
    w.write(0, 1)
    for b in _utf8_number(0):
        w.write(b, 8)
    w.write(n - 1, 16)
    w.write(crc8(bytes(w.out)), 8)
    # FIXED order-1 subframe: warmup 777, then escaped partition nbits=0
    w.write(0, 1)
    w.write(0b001001, 6)
    w.write(0, 1)
    w.write(777, 16)
    w.write(0b00, 2)  # 4-bit rice method
    w.write(0, 4)  # partition order 0
    w.write(0b1111, 4)  # escape
    w.write(0, 5)  # nbits = 0 -> all residuals are zero
    w.align()
    frame = bytes(w.out)
    out += frame + struct.pack(">H", crc16(frame))
    dec, sr = decode_flac(bytes(out))
    assert sr == 8000
    assert np.array_equal(dec, np.full(n, 777, np.int16))


def test_wasted_bits_subframe():
    """Wasted-bits shift: samples that are all multiples of 2^k are coded
    at sbps-k with a final left shift; hand-encode k=3."""
    from seronet_data_validator_spark.operators.flac import (
        _BitWriter,
        _crc8 as crc8,
        _crc16 as crc16,
        _SYNC,
        _utf8_number,
    )
    import struct

    n = 16
    vals = np.arange(-8, 8, dtype=np.int64) * 8  # multiples of 8 (k=3)
    packed = (8000 << 44) | (0 << 41) | (15 << 36) | n
    si = (
        struct.pack(">HH", 16, 4096)
        + b"\x00\x00\x00" * 2
        + packed.to_bytes(8, "big")
        + b"\x00" * 16
    )
    out = bytearray(b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si)
    w = _BitWriter()
    w.write(_SYNC, 14)
    w.write(0, 2)
    w.write(0b0111, 4)
    w.write(0b0000, 4)
    w.write(0b0000, 4)
    w.write(0b100, 3)
    w.write(0, 1)
    for b in _utf8_number(0):
        w.write(b, 8)
    w.write(n - 1, 16)
    w.write(crc8(bytes(w.out)), 8)
    # VERBATIM subframe with wasted=3: flag 1 then unary(k-1)=unary(2)
    w.write(0, 1)
    w.write(0b000001, 6)
    w.write(1, 1)  # wasted-bits flag
    w.write(0b001, 3)  # unary 2 -> wasted = 3
    for v in (vals >> 3):
        w.write(int(v) & 0x1FFF, 13)  # sbps - wasted = 13
    w.align()
    frame = bytes(w.out)
    out += frame + struct.pack(">H", crc16(frame))
    dec, _ = decode_flac(bytes(out))
    assert np.array_equal(dec, vals.astype(np.int16))


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24, 32])
@pytest.mark.parametrize("order", [0, 6])
def test_any_bit_depth_roundtrip(bps, order):
    """Every spec-coded bit depth round-trips bit-exactly, through both the
    frame-header bps code path and (bps=14 below) the STREAMINFO path."""
    from seronet_data_validator_spark.operators.flac import decode_flac_full

    rng = np.random.default_rng(bps * 100 + order)
    lim = 1 << (bps - 1)
    t = np.arange(4000)
    base = (lim * 0.6 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int64)
    x = np.clip(base + rng.integers(-lim // 64, lim // 64, 4000), -lim, lim - 1)
    enc = flac_bytes(x, 16000, bps=bps, block_size=1024, lpc_order=order)
    full, sr = decode_flac_full(enc)
    assert sr == 16000
    assert full.dtype == (np.int32 if bps > 16 else np.int16)
    assert np.array_equal(full[:, 0].astype(np.int64), x)
    # mono contract rescales by a power of two to the 16-bit lane
    mono, _ = decode_flac(enc)
    exp = x >> (bps - 16) if bps >= 16 else x << (16 - bps)
    assert np.array_equal(mono.astype(np.int64), exp)


def test_uncoded_bit_depth_via_streaminfo():
    """A depth with no frame-header code (14-bit) signals via STREAMINFO
    (frame bps code 0b000) and still round-trips bit-exactly."""
    from seronet_data_validator_spark.operators.flac import decode_flac_full

    rng = np.random.default_rng(14)
    x = rng.integers(-(1 << 13), 1 << 13, 3000).astype(np.int64)
    full, sr = decode_flac_full(flac_bytes(x, 8000, bps=14, block_size=512))
    assert sr == 8000
    assert np.array_equal(full[:, 0].astype(np.int64), x)


@pytest.mark.parametrize("n_ch", [3, 4, 6, 8])
def test_multichannel_independent_roundtrip(n_ch):
    """3-8 channels encode/decode independently, channel order preserved;
    the mono contract downmixes as the floor mean of the channel sum."""
    from seronet_data_validator_spark.operators.flac import decode_flac_full

    rng = np.random.default_rng(n_ch)
    x = rng.integers(-20000, 20000, (2500, n_ch)).astype(np.int64)
    enc = flac_bytes(x, 16000, block_size=800, lpc_order=4)
    full, sr = decode_flac_full(enc)
    assert sr == 16000
    assert full.shape == (2500, n_ch)
    assert np.array_equal(full.astype(np.int64), x)
    mono, _ = decode_flac(enc)
    assert np.array_equal(mono.astype(np.int64), x.sum(axis=1) // n_ch)


def test_stereo_24bit_decorrelated_roundtrip():
    """Deep stereo exercises the side channel's bps+1 lane above 16 bits."""
    from seronet_data_validator_spark.operators.flac import decode_flac_full

    rng = np.random.default_rng(24)
    lim = 1 << 23
    x = rng.integers(-lim, lim, (2000, 2)).astype(np.int64)
    for mode in ("left_side", "right_side", "mid_side"):
        enc = flac_bytes(x, 48000, bps=24, stereo_mode=mode, lpc_order=2)
        full, sr = decode_flac_full(enc)
        assert sr == 48000 and full.dtype == np.int32
        assert np.array_equal(full.astype(np.int64), x), mode


def test_encode_range_and_channel_validation():
    with pytest.raises(ValueError, match="out of range"):
        flac_bytes(np.array([300], np.int64), 8000, bps=8)
    with pytest.raises(ValueError, match="1-8 channels"):
        flac_bytes(np.zeros((10, 9), np.int64), 8000)
    with pytest.raises(ValueError, match="4-32"):
        flac_bytes(np.zeros(10, np.int64), 8000, bps=33)
