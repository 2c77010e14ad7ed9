"""IMA/DVI ADPCM codec (operators/adpcm.py): the vectorized block-parallel
decoder against a spec-literal scalar reference, round trips through the
real WAV container, and the audio._decode_view / _parse_header wiring."""

import struct

import numpy as np
import pytest

from seronet_data_validator_spark.operators.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    adpcm_bytes,
    decode_adpcm_wav,
    samples_per_block,
)
from seronet_data_validator_spark.operators.audio import _decode_view, _parse_header


def _scalar_decode(blob):
    """Straight-from-the-spec scalar decoder (no numpy state tricks)."""
    pos, fmt, fact, data = 12, None, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            (fact,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    _tag, _ch, sr, _br, ba, _bits, _cb, _spb = struct.unpack_from("<HHIIHHHH", fmt, 0)
    out = []
    for bstart in range(0, len(data), ba):
        blk = data[bstart : bstart + ba]
        pred = struct.unpack_from("<h", blk, 0)[0]
        idx = blk[2]
        out.append(pred)
        nibs = []
        for byte in blk[4:]:
            nibs += [byte & 0xF, byte >> 4]
        for nib in nibs:
            step = int(STEP_TABLE[idx])
            diff = step >> 3
            if nib & 4:
                diff += step
            if nib & 2:
                diff += step >> 1
            if nib & 1:
                diff += step >> 2
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(INDEX_TABLE[nib])))
            out.append(pred)
    return np.array(out[:fact], np.int16), sr


@pytest.mark.parametrize("n", [1, 24, 25, 26, 100, 505, 1203])
def test_vectorized_decoder_matches_scalar_spec(n):
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32768, n).astype(np.int16)
    blob = adpcm_bytes(s, 8000, block_align=16 if n < 200 else 256)
    got, sr1 = decode_adpcm_wav(blob)
    want, sr2 = _scalar_decode(blob)
    assert sr1 == sr2 == 8000
    assert len(got) == n
    assert np.array_equal(got, want)


def test_snr_on_smooth_signal():
    """4-bit ADPCM on a mid-scale sine tracks well (codec-typical >20 dB)."""
    t = np.arange(4000)
    s = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    got, _ = decode_adpcm_wav(adpcm_bytes(s, 8000))
    err = got.astype(np.float64) - s
    snr = 10 * np.log10((s.astype(np.float64) ** 2).sum() / (err**2).sum())
    assert snr > 20.0


def test_header_parse_and_truncation():
    s = (np.arange(300) * 321 % 4096 - 2048).astype(np.int16)
    blob = adpcm_bytes(s, 8000, block_align=16)
    view = np.frombuffer(blob, np.uint8)
    n, sr, fmt, ch, bits = _parse_header(view[:60], len(blob))
    assert (n, sr, fmt, ch, bits) == (300, 8000, 0x11, 1, 4)
    with pytest.raises(ValueError, match="truncated"):
        _parse_header(view[:60], len(blob) - 10)
    assert samples_per_block(16) == 25


def test_decode_view_dispatch():
    """_decode_view sniffs fmt 0x11 and routes to the ADPCM walker."""
    s = (500 * np.sin(np.arange(600) / 20)).astype(np.int16)
    view = np.frombuffer(adpcm_bytes(s, 16000), np.uint8)
    pcm, sr = _decode_view(view)
    assert sr == 16000 and len(pcm) == 600
    assert np.array_equal(pcm, decode_adpcm_wav(bytes(view))[0])


def test_audio_features_over_adpcm(spark):
    """Wire-through: the feature operators see ADPCM clips like any WAV."""
    from seronet_data_validator_spark.operators.multimodal import audio_features

    s = (3000 * np.sin(np.arange(1600) / 10)).astype(np.int16)
    df = spark.createDataFrame(
        [("a1", bytearray(adpcm_bytes(s, 8000)))], "clip_id string, bytes binary"
    )
    row = audio_features(df).collect()[0]
    assert row["sr_hz"] == 8000 and row["n_samples"] == 1600
    assert 0 < row["rms"] < 1
