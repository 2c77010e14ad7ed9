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
