"""AIFF / Sun AU container codecs (operators/aiff.py): bit-exact round
trips at every supported depth and channel count, the 80-bit extended
float sample-rate field, error boundaries, and codec transparency through
the audio feature passes (same samples via WAV, AIFF and AU must produce
identical exact features)."""

import numpy as np
import pandas as pd
import pytest

from seronet_data_validator_spark.operators.aiff import (
    AU_PCM8,
    AU_PCM16,
    AU_PCM24,
    AU_ULAW,
    _f80_decode,
    _f80_encode,
    aiff_bytes,
    au_bytes,
    decode_aiff,
    decode_au,
)


def _sig(seed=9, n=4000, lim=32768):
    rng = np.random.default_rng(seed)
    return rng.integers(-lim, lim, n).astype(np.int64)


@pytest.mark.parametrize("sr", [8000, 16000, 22050, 44100, 48000, 96000])
def test_f80_sample_rate_roundtrip(sr):
    assert _f80_decode(_f80_encode(sr)) == sr


@pytest.mark.parametrize("bits,lim", [(8, 1 << 7), (16, 1 << 15), (24, 1 << 23)])
@pytest.mark.parametrize("n_ch", [1, 2, 4])
def test_aiff_roundtrip_bit_exact(bits, lim, n_ch):
    x = _sig(bits + n_ch, 3000, lim)
    if n_ch > 1:
        x = np.stack([np.roll(x, c) for c in range(n_ch)], axis=1)
    full, sr, got_bits = decode_aiff(aiff_bytes(x, 44100, bits=bits))
    assert sr == 44100 and got_bits == bits
    assert np.array_equal(full.reshape(x.shape), x)


@pytest.mark.parametrize(
    "enc,lim,bits",
    [(AU_PCM8, 1 << 7, 8), (AU_PCM16, 1 << 15, 16), (AU_PCM24, 1 << 23, 24)],
)
@pytest.mark.parametrize("n_ch", [1, 2])
def test_au_pcm_roundtrip_bit_exact(enc, lim, bits, n_ch):
    x = _sig(enc * 3 + n_ch, 2500, lim)
    if n_ch > 1:
        x = np.stack([x, -x // 2], axis=1)
    full, sr, got_bits = decode_au(au_bytes(x, 16000, encoding=enc))
    assert sr == 16000 and got_bits == bits
    assert np.array_equal(full.reshape(x.shape), x)


def test_au_ulaw_expands_through_g711_table():
    from seronet_data_validator_spark.operators.audio import _ULAW_TABLE

    codes = np.arange(256, dtype=np.int64)
    full, sr, bits = decode_au(au_bytes(codes, 8000, encoding=AU_ULAW))
    assert sr == 8000 and bits == 16
    assert np.array_equal(full[:, 0], _ULAW_TABLE[np.arange(256)].astype(np.int64))


def test_au_unknown_size_reads_rest_of_file():
    x = _sig(1, 500, 1 << 15)
    b = bytearray(au_bytes(x, 8000))
    b[8:12] = b"\xff\xff\xff\xff"  # data size unknown per spec
    full, _, _ = decode_au(bytes(b))
    assert np.array_equal(full[:, 0], x)


def test_error_boundaries():
    with pytest.raises(ValueError, match="not an AIFF"):
        decode_aiff(b"FORMxxxxWAVE")
    with pytest.raises(ValueError, match="not an AU"):
        decode_au(b"RIFF" + b"\x00" * 40)
    with pytest.raises(ValueError, match="COMM or SSND"):
        decode_aiff(b"FORM" + (4).to_bytes(4, "big") + b"AIFF")
    x = _sig(2, 100, 1 << 15)
    trunc = aiff_bytes(x, 8000)[:-50]
    with pytest.raises(ValueError):
        decode_aiff(trunc)
    with pytest.raises(ValueError, match="out of range"):
        aiff_bytes(np.array([200], np.int64), 8000, bits=8)
    with pytest.raises(ValueError, match="encoding"):
        au_bytes(x, 8000, encoding=27)


def test_transparent_in_feature_passes(spark):
    """Identical samples through WAV, AIFF, AU-16 and AU-µ-law-free lanes
    must produce identical exact features — transparency of the decode
    dispatch (audio._decode_view)."""
    from seronet_data_validator_spark.operators.dsp import (
        audio_basic_features_exact,
    )
    from seronet_data_validator_spark.sources.clips import wav_bytes

    s = _sig(4, 5000, 1 << 15)
    s16 = s.astype(np.int16)
    rows = [
        {"clip_id": "wav", "bytes": wav_bytes(s16, 8000)},
        {"clip_id": "aiff", "bytes": aiff_bytes(s, 8000)},
        {"clip_id": "au", "bytes": au_bytes(s, 8000)},
        # stereo AU with L=R=s: floor-mean downmix == s
        {"clip_id": "au2", "bytes": au_bytes(np.stack([s, s], axis=1), 8000)},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = {r["clip_id"]: r for r in audio_basic_features_exact(df).collect()}
    for field in ("n_samples", "sr_hz", "peak_abs", "zero_crossings", "rms"):
        assert out["wav"][field] == out["aiff"][field] == out["au"][field]
        assert out["wav"][field] == out["au2"][field]
