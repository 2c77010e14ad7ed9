"""Audio DSP operators: spectral features, silence/VAD statistics, and
spectral-fingerprint near-duplicate detection over binary audio columns.

These extend the multimodal family (multimodal.py) with the signal-level
analyses a training-data pipeline runs over an audio corpus: per-clip
spectral shape (feeding quality gates and corpus stats), silence profiling
(trim points, speech-segment counts), and content-based duplicate detection
that survives re-encoding, amplitude scaling and resampling — the audio
analog of MinHash/SimHash text dedup (operators/dedup.py).

Execution shape: the numpy DSP runs as Arrow-batched ``mapInArrow`` passes
over zero-copy buffer views (same plumbing as multimodal.audio_features) —
narrow, partition-parallel, no shuffle. Only the near-dup candidate join
shuffles, and it shuffles the 16-byte fingerprint, not the audio: the
banded self-join + Hamming verify is pure JVM Column code, mirroring
dedup.simhash_near_duplicates. At 100 TB the fingerprint table is ~10^6×
smaller than the corpus, so the join cost is negligible next to the scan.

All DSP is pure numpy over the public WAV/FFT math — no codec or DSP
library. Reference parity: the reference validates audio metadata only
(Validation_Rules.py); these operators are part of the beyond-reference
LLM-data-pipeline surface the build brief asks for.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seronet_data_validator_spark.operators.multimodal import _decoded_rows

SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("dominant_freq_hz", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
        T.StructField("spectral_bandwidth_hz", T.DoubleType()),
        T.StructField("spectral_rolloff_hz", T.DoubleType()),
        T.StructField("spectral_flatness", T.DoubleType()),
    ]
)


def _welch_power(pcm: np.ndarray, n_fft: int) -> np.ndarray | None:
    """Mean Hann-windowed power spectrum over non-overlapping n_fft frames
    (Welch's method, zero overlap). Short clips get one zero-padded frame."""
    if len(pcm) == 0:
        return None
    if len(pcm) < n_fft:
        frames = np.zeros((1, n_fft), np.float32)
        frames[0, : len(pcm)] = pcm
    else:
        n = (len(pcm) // n_fft) * n_fft
        frames = pcm[:n].reshape(-1, n_fft)
    win = np.hanning(n_fft).astype(np.float32)
    spec = np.fft.rfft(frames * win, axis=1)
    return np.mean(np.abs(spec) ** 2, axis=0)


def spectral_features(
    clips: DataFrame, *, n_fft: int = 1024, id_col: str = "clip_id"
) -> DataFrame:
    """Spectral shape per clip from the mean power spectrum (DC excluded):

    - dominant_freq_hz: peak bin frequency
    - spectral_centroid_hz: power-weighted mean frequency
    - spectral_bandwidth_hz: power-weighted std around the centroid
    - spectral_rolloff_hz: frequency below which 85% of power lies
    - spectral_flatness: geometric/arithmetic power mean (1 = white noise,
      → 0 for a pure tone)

    Narrow Arrow pass; decode failures yield NULL features.
    """
    src = clips.select(id_col, "bytes")
    names = [f.name for f in SPECTRAL_SCHEMA.fields]

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {n: [] for n in names}
            for _, cid, pcm, sr in _decoded_rows(batch, id_col):
                power = _welch_power(pcm, n_fft) if pcm is not None else None
                if power is None or float(np.sum(power[1:])) <= 0.0:
                    row = (cid, None, None, None, None, None)
                else:
                    p = power[1:]  # drop DC: silence offsets are not "signal"
                    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)[1:]
                    total = float(np.sum(p))
                    centroid = float(np.sum(freqs * p) / total)
                    bandwidth = float(
                        np.sqrt(np.sum(p * (freqs - centroid) ** 2) / total)
                    )
                    cum = np.cumsum(p)
                    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
                    flat = float(
                        np.exp(np.mean(np.log(p + 1e-20))) / (total / len(p))
                    )
                    row = (
                        cid, float(freqs[int(np.argmax(p))]),
                        centroid, bandwidth, rolloff, flat,
                    )
                for n, v in zip(names, row):
                    cols[n].append(v)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[n], type=pa.string() if n == "clip_id" else pa.float64())
                    for n in names
                ],
                names,
            )

    return src.mapInArrow(run, schema=SPECTRAL_SCHEMA)


SILENCE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("silence_ratio", T.DoubleType()),
        T.StructField("leading_silence_ms", T.DoubleType()),
        T.StructField("trailing_silence_ms", T.DoubleType()),
        T.StructField("n_speech_segments", T.IntegerType()),
    ]
)


def silence_stats(
    clips: DataFrame,
    *,
    frame_ms: int = 25,
    threshold_db: float = -40.0,
    id_col: str = "clip_id",
) -> DataFrame:
    """Energy-based VAD statistics: frame the clip into non-overlapping
    `frame_ms` windows, mark a frame silent when its RMS (re full scale 1.0)
    is below `threshold_db`, and report the silence ratio, leading/trailing
    silence (trim points) and the count of contiguous speech segments."""
    src = clips.select(id_col, "bytes")
    thr = 10.0 ** (threshold_db / 20.0)
    names = [f.name for f in SILENCE_SCHEMA.fields]
    types = [pa.string(), pa.int32(), pa.float64(), pa.float64(), pa.float64(), pa.int32()]

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {n: [] for n in names}
            for _, cid, pcm, sr in _decoded_rows(batch, id_col):
                flen = max(1, int(sr * frame_ms / 1000)) if pcm is not None else 1
                if pcm is None or len(pcm) < flen:
                    row = (cid, 0, None, None, None, None)
                else:
                    n = (len(pcm) // flen) * flen
                    frames = pcm[:n].reshape(-1, flen)
                    rms = np.sqrt(np.mean(frames.astype(np.float64) ** 2, axis=1))
                    speech = rms >= thr
                    k = len(speech)
                    idx = np.flatnonzero(speech)
                    if len(idx) == 0:
                        lead, trail, segs = float(k), float(k), 0
                    else:
                        lead = float(idx[0])
                        trail = float(k - 1 - idx[-1])
                        segs = int(np.sum(np.diff(idx) > 1)) + 1
                    row = (
                        cid, k, float(np.mean(~speech)),
                        lead * frame_ms, trail * frame_ms, segs,
                    )
                for nm, v in zip(names, row):
                    cols[nm].append(v)
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[nm], type=t) for nm, t in zip(names, types)], names
            )

    return src.mapInArrow(run, schema=SILENCE_SCHEMA)


FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("fp0", T.LongType()),
        T.StructField("fp1", T.LongType()),
    ]
)

# log-spaced band edges in Hz on a CANONICAL 8 kHz grid. Clips are
# linearly resampled to _CANON_SR before analysis so every clip shares the
# exact same FFT bin placement: without canonicalization, a tone sitting
# near a band edge lands in different bands at different source rates
# (measured: 14/43 frequencies crossed the hamming threshold between 16 k
# and 44.1 k sources; after canonicalization 0/129 cross-rate pairs exceed
# hamming 1). Top edge below the canonical Nyquist (4000).
_T_CHUNKS = 16
_N_BANDS = 8
_BAND_EDGES = np.geomspace(100.0, 3800.0, _N_BANDS + 1)
_FP_NFFT = 512  # zero-padded chunk FFT: interpolates short-chunk spectra
_CANON_SR = 8000


def _canonical_rate(pcm: np.ndarray, sr: int) -> np.ndarray:
    """Linear-interpolation resample to the canonical analysis rate (same
    math as multimodal.audio_resample, driver/worker-local numpy)."""
    if sr == _CANON_SR or len(pcm) == 0:
        return pcm
    n_new = max(1, int(round(len(pcm) * _CANON_SR / sr)))
    x_old = np.arange(len(pcm), dtype=np.float64)
    x_new = np.linspace(0.0, len(pcm) - 1, n_new)
    return np.interp(x_new, x_old, pcm).astype(np.float32)


def _fingerprint_bits(pcm: np.ndarray, sr: int) -> np.ndarray | None:
    """128-bit spectral fingerprint: resample to the canonical 8 kHz grid,
    split into 16 equal time chunks; per chunk, integrate the (zero-padded)
    power spectrum into 8 log-spaced Hz bands; bit[t, b] = band energy
    above the chunk's mean band energy. Amplitude-invariant (compares
    within a chunk), duration-normalized (chunks are relative time),
    sample-rate-invariant (canonical grid). 16×8 beats finer band splits:
    with more, narrower bands a narrowband clip sets so few bits that
    distinct content collides under the same hamming threshold (measured
    false-match on distinct tones: 5% at 16×8, 12% at 8×16, 42% at 4×32).
    Returns a (128,) uint8 bit array or None."""
    if pcm is None or len(pcm) < _T_CHUNKS:
        return None
    pcm = _canonical_rate(pcm, sr)
    if len(pcm) < _T_CHUNKS:
        return None
    bits = np.empty((_T_CHUNKS, _N_BANDS), np.uint8)
    clen = len(pcm) // _T_CHUNKS
    freqs = np.fft.rfftfreq(max(_FP_NFFT, clen), d=1.0 / _CANON_SR)
    band_of = np.searchsorted(_BAND_EDGES, freqs, side="right") - 1
    in_band = (band_of >= 0) & (band_of < _N_BANDS)
    for t in range(_T_CHUNKS):
        chunk = pcm[t * clen : (t + 1) * clen]
        spec = np.abs(np.fft.rfft(chunk, n=max(_FP_NFFT, clen))) ** 2
        energy = np.bincount(
            band_of[in_band], weights=spec[in_band], minlength=_N_BANDS
        )
        bits[t] = (energy > energy.mean()).astype(np.uint8)
    return bits.reshape(-1)


def _pack_bits(bits: np.ndarray) -> tuple[int, int]:
    """Pack a (128,) bit array into two int64 words (bit k → word k//64,
    position k%64). Goes through uint64 so bit 63 wraps to the sign bit
    instead of overflowing Python's int→long cast."""
    words = []
    for w in range(2):
        acc = np.uint64(0)
        for i in range(64):
            if bits[w * 64 + i]:
                acc |= np.uint64(1) << np.uint64(i)
        words.append(int(acc.astype(np.int64)))
    return words[0], words[1]


def audio_fingerprint(clips: DataFrame, *, id_col: str = "clip_id") -> DataFrame:
    """Per-clip 128-bit spectral fingerprint as two long columns (fp0, fp1).
    Narrow Arrow pass; clips too short to fingerprint (or failing decode)
    yield NULL words."""
    src = clips.select(id_col, "bytes")

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids, w0, w1 = [], [], []
            for _, cid, pcm, sr in _decoded_rows(batch, id_col):
                bits = _fingerprint_bits(pcm, sr) if pcm is not None else None
                ids.append(cid)
                if bits is None:
                    w0.append(None)
                    w1.append(None)
                else:
                    a, b = _pack_bits(bits)
                    w0.append(a)
                    w1.append(b)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(w0, pa.int64()),
                 pa.array(w1, pa.int64())],
                ["clip_id", "fp0", "fp1"],
            )

    return src.mapInArrow(run, schema=FINGERPRINT_SCHEMA)


def audio_near_duplicates(
    clips: DataFrame,
    *,
    max_hamming: int = 12,
    n_bands_lsh: int = 16,
    id_col: str = "clip_id",
    max_bucket_size: int | None = None,
    star: bool = False,
    cache_handles: list | None = None,
    input_rows_bound: int | None = None,
) -> DataFrame:
    """Content-based audio near-dup pairs: fingerprints within `max_hamming`
    bits over the 128-bit spectral hash. Catches re-encoded, re-scaled and
    resampled copies that exact byte-level dedup misses.

    Pigeonhole banding via dedup.banded_hamming_pairs: the 128 bits split
    into `n_bands_lsh` exact chunks (16 bands × 8 bits by default — any
    pair within 15 bits of each other shares ≥1 exact chunk, so the
    max_hamming=12 default has the full guarantee); candidates bucket-join
    on (band, chunk), verify with bit_count(xor). ``max_bucket_size`` arms
    the exact hot-bucket secondary banding (silent/constant clips hash to
    identical fingerprint words and would otherwise concentrate a quadratic
    candidate blowup in one reducer); ``star`` caps the inherently
    quadratic identical-fingerprint output with hub pairs. The fingerprint
    pass is the only Python; banding + verify are JVM Column ops on two
    longs. Output: (id_a, id_b, hamming)."""
    from seronet_data_validator_spark.operators.dedup import banded_hamming_pairs

    if 128 % n_bands_lsh:
        raise ValueError("n_bands_lsh must divide 128")
    if max_hamming >= n_bands_lsh:
        raise ValueError(
            "pigeonhole guarantee needs max_hamming < n_bands_lsh "
            f"(got {max_hamming} >= {n_bands_lsh})"
        )
    fp = audio_fingerprint(clips, id_col=id_col).where(
        F.col("fp0").isNotNull()
    ).persist()
    if cache_handles is not None:
        cache_handles.append(fp)
    return banded_hamming_pairs(
        fp,
        ["fp0", "fp1"],
        id_col,
        total_bits=128,
        max_hamming=max_hamming,
        n_bands=n_bands_lsh,
        max_bucket_size=max_bucket_size,
        star=star,
        input_rows_bound=input_rows_bound,
    )


BASIC_EXACT_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("peak_abs", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_basic_features_exact(
    clips: DataFrame, *, id_col: str = "clip_id"
) -> DataFrame:
    """Basic audio features with engine-portable EXACT arithmetic.

    Unlike ``multimodal.audio_features`` (float32 pipeline, rows-only
    verifiable), every value here is reproducible bit-for-bit by any engine
    that can see the int16 samples: peak and zero-crossing counts are pure
    integer aggregates, and RMS is a single IEEE double division + sqrt over
    an exactly-accumulated int64 sum of squares. This is what gives the
    audio decode path a full VALUE oracle (driver contract
    `audio_basic_features`): the WAV decode is the real RIFF parser
    (operators/audio._decode_view), so a decode bug shows up as a value
    mismatch, not just a row-count change.

    Narrow mapInArrow pass, zero-copy int16 views, no shuffle — the same
    execution shape as the other DSP operators.
    """
    from seronet_data_validator_spark.operators.audio import (
        _binary_views,
        _decode_view,
    )

    src = clips.select(id_col, "bytes")
    names = [f.name for f in BASIC_EXACT_SCHEMA.fields]
    types = [pa.string(), pa.int64(), pa.int32(), pa.int64(), pa.int64(), pa.float64()]

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {n: [] for n in names}
            ids = batch.column(0).to_pylist()
            get, _ = _binary_views(batch.column(1))
            for i in range(batch.num_rows):
                try:
                    s16, sr = _decode_view(get(i))
                except ValueError:
                    row = (ids[i], 0, 0, None, None, None)
                else:
                    s = s16.astype(np.int64)
                    n = len(s)
                    if n == 0:
                        row = (ids[i], 0, sr, None, None, None)
                    else:
                        sum_sq = int(np.dot(s, s))
                        peak = int(np.max(np.abs(s)))
                        zc = int(np.sum(s[:-1] * s[1:] < 0)) if n > 1 else 0
                        row = (ids[i], n, sr, peak, zc, float(np.sqrt(sum_sq / n)))
                for name, v in zip(names, row):
                    cols[name].append(v)
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[n], type=t) for n, t in zip(names, types)],
                names=names,
            )

    return src.mapInArrow(run, schema=BASIC_EXACT_SCHEMA)


MEL_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_mels", T.IntegerType()),
        T.StructField("log_mel_mean", T.ArrayType(T.DoubleType())),
        T.StructField("log_mel_std", T.ArrayType(T.DoubleType())),
        T.StructField("mfcc_mean", T.ArrayType(T.DoubleType())),
    ]
)


def _mel_filterbank(
    n_mels: int, n_fft: int, sr: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Triangular mel filterbank (HTK mel scale, public formula
    m = 2595*log10(1 + f/700)); shape (n_mels, n_fft//2 + 1)."""
    fmax = fmax or sr / 2.0
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)  # noqa: E731
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)  # noqa: E731
    pts = imel(np.linspace(mel(fmin), mel(fmax), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        l, c, r = bins[i], bins[i + 1], bins[i + 2]
        if c > l:
            fb[i, l:c] = (np.arange(l, c) - l) / (c - l)
        if r > c:
            fb[i, c:r] = (r - np.arange(c, r)) / (r - c)
    return fb


def mel_features(
    clips: DataFrame,
    *,
    n_fft: int = 512,
    hop: int = 256,
    n_mels: int = 40,
    n_mfcc: int = 13,
    id_col: str = "clip_id",
) -> DataFrame:
    """Log-mel spectrogram + MFCC summary per clip — the standard speech
    feature front-end (frame → Hann → power spectrum → triangular mel bank
    → log → DCT-II), summarized as per-clip mean/std over frames so the
    output stays a bounded row per clip regardless of duration.

    Execution shape: narrow mapInArrow over zero-copy int16 views, no
    shuffle — identical to spectral_features. Per-clip cost is O(samples ×
    log n_fft); at corpus scale the pass pipelines with the scan. Feature
    tables of this shape feed dedup (embedding near-dup on mfcc_mean),
    quality gates (energy/band profiles) and drift monitors (PSI over mel
    bands). FFT math → rows-only verifiability; the known-answer pytest
    anchors tone locations and filterbank partition-of-unity instead.
    """
    from seronet_data_validator_spark.operators.audio import (
        _binary_views,
        _decode_view,
    )

    src = clips.select(id_col, "bytes")
    names = [f.name for f in MEL_SCHEMA.fields]
    win = np.hanning(n_fft)
    # orthonormal DCT-II applied to the mel axis → MFCCs
    k = np.arange(n_mels)
    dct = np.cos((2 * k[None, :] + 1) * np.arange(n_mfcc)[:, None] * np.pi / (2 * n_mels))
    dct *= np.sqrt(2.0 / n_mels)
    dct[0] *= np.sqrt(0.5)
    banks: dict[int, np.ndarray] = {}

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {n: [] for n in names}
            ids = batch.column(0).to_pylist()
            get, _ = _binary_views(batch.column(1))
            for i in range(batch.num_rows):
                try:
                    s16, sr = _decode_view(get(i))
                except ValueError:
                    row = (ids[i], 0, n_mels, None, None, None)
                else:
                    x = s16.astype(np.float64) / 32768.0
                    if len(x) < n_fft:
                        x = np.pad(x, (0, n_fft - len(x)))
                    n_frames = 1 + (len(x) - n_fft) // hop
                    idx = (
                        np.arange(n_fft)[None, :]
                        + hop * np.arange(n_frames)[:, None]
                    )
                    spec = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
                    if sr not in banks:
                        banks[sr] = _mel_filterbank(n_mels, n_fft, sr)
                    logmel = np.log(spec @ banks[sr].T + 1e-10)
                    mfcc = logmel @ dct.T
                    row = (
                        ids[i],
                        int(n_frames),
                        n_mels,
                        [float(v) for v in logmel.mean(axis=0)],
                        [float(v) for v in logmel.std(axis=0)],
                        [float(v) for v in mfcc.mean(axis=0)],
                    )
                for name, v in zip(names, row):
                    cols[name].append(v)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[n], type=t)
                    for n, t in zip(
                        names,
                        [
                            pa.string(), pa.int32(), pa.int32(),
                            pa.list_(pa.float64()), pa.list_(pa.float64()),
                            pa.list_(pa.float64()),
                        ],
                    )
                ],
                names=names,
            )

    return src.mapInArrow(run, schema=MEL_SCHEMA)


RESAMPLE_EXACT_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("target_sr", T.IntegerType()),
        T.StructField("n_out", T.LongType()),
        T.StructField("sum_num", T.LongType()),
        T.StructField("peak_num", T.LongType()),
        T.StructField("sumsq_num", T.LongType()),
    ]
)


def resample_features_exact(
    clips: DataFrame, *, targets: tuple[int, ...] = (16000, 4000), id_col: str = "clip_id"
) -> DataFrame:
    """Exact-arithmetic features of the RESAMPLED signal — the value oracle
    for the linear-interpolation resampler (multimodal.resample_linear,
    the same code audio_resample re-encodes through).

    For dyadic rate ratios every interpolated value is an exact binary
    fraction m/65536 with |m| <= 2^17 (m = 2*s at integer positions,
    s[i]+s[i+1] at half positions), so num = y * 65536 is an exactly
    representable integer in float32 AND float64, and the int64 aggregates
    below (sum, peak, sum of squares) are bit-reproducible by any engine
    that can regenerate the source samples — no FFT, no rounding mode in
    sight. Narrow mapInArrow pass over the real decode path, one output row
    per (clip, target rate), no shuffle."""
    from seronet_data_validator_spark.operators.audio import (
        _binary_views,
        _decode_view,
    )
    from seronet_data_validator_spark.operators.multimodal import resample_linear

    src = clips.select(id_col, "bytes")
    names = [f.name for f in RESAMPLE_EXACT_SCHEMA.fields]
    types = [pa.string(), pa.int32(), pa.int64(), pa.int64(), pa.int64(), pa.int64()]

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {n: [] for n in names}
            ids = batch.column(0).to_pylist()
            get, _ = _binary_views(batch.column(1))
            for i in range(batch.num_rows):
                try:
                    s16, sr = _decode_view(get(i))
                except ValueError:
                    continue
                pcm = s16.astype(np.float32) / 32768.0
                for t in targets:
                    y = resample_linear(pcm, sr, t)
                    num = np.rint(y.astype(np.float64) * 65536.0).astype(np.int64)
                    row = (
                        ids[i],
                        t,
                        len(num),
                        int(num.sum()),
                        int(np.max(np.abs(num))) if len(num) else None,
                        int(np.dot(num, num)),
                    )
                    for name, v in zip(names, row):
                        cols[name].append(v)
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[n], type=ty) for n, ty in zip(names, types)],
                names=names,
            )

    return src.mapInArrow(run, schema=RESAMPLE_EXACT_SCHEMA)


FRAME_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("sumsq", T.LongType()),
    ]
)

SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("seg_idx", T.LongType()),
        T.StructField("start_frame", T.LongType()),
        T.StructField("end_frame", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def frame_energies(
    clips: DataFrame, *, frame_len: int = 160, id_col: str = "clip_id"
) -> DataFrame:
    """Per-frame sum-of-squares over the real decode path, as EXACT int64
    (int16 samples squared and summed — max 160 * 2^30 per frame, far under
    int64). One row per full frame (the tail partial frame is dropped, so
    the frame grid is deterministic); narrow mapInArrow, no shuffle."""
    from seronet_data_validator_spark.operators.audio import (
        _binary_views,
        _decode_view,
    )

    src = clips.select(id_col, "bytes")

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids_out: list[str] = []
            fidx: list[np.ndarray] = []
            sums: list[np.ndarray] = []
            ids = batch.column(0).to_pylist()
            get, _ = _binary_views(batch.column(1))
            for i in range(batch.num_rows):
                try:
                    s16, _sr = _decode_view(get(i))
                except ValueError:
                    continue
                nf = len(s16) // frame_len
                if nf == 0:
                    continue
                s = s16[: nf * frame_len].astype(np.int64)
                e = (s * s).reshape(nf, frame_len).sum(axis=1)
                ids_out.extend([ids[i]] * nf)
                fidx.append(np.arange(nf, dtype=np.int64))
                sums.append(e)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids_out, pa.string()),
                    pa.array(
                        np.concatenate(fidx) if fidx else np.empty(0, np.int64)
                    ),
                    pa.array(
                        np.concatenate(sums) if sums else np.empty(0, np.int64)
                    ),
                ],
                names=["clip_id", "frame_idx", "sumsq"],
            )

    return src.mapInArrow(run, schema=FRAME_ENERGY_SCHEMA)


def energy_segments(
    clips: DataFrame,
    *,
    frame_len: int = 160,
    threshold: int = 1_000_000,
    id_col: str = "clip_id",
) -> DataFrame:
    """VAD-style speech segmentation: frames whose exact integer energy
    exceeds `threshold` are active; contiguous active runs become segments
    (gaps-and-islands via frame_idx - row_number). The audio analog of
    sentence splitting for a training-data pipeline — segment boundaries
    feed clip chunking and silence-trim decisions.

    Plan shape: ONE shuffle total. The islands window partitions by
    clip_id; the (clip_id, _grp) aggregation and the per-clip segment
    numbering both reuse that clustering, so Catalyst inserts no further
    Exchange. Every compared quantity is an int64 the oracle can replay —
    no float thresholds, no RMS normalization ambiguity."""
    from pyspark.sql import Window

    fr = frame_energies(clips, frame_len=frame_len, id_col=id_col)
    active = fr.filter(F.col("sumsq") > threshold)
    w = Window.partitionBy("clip_id").orderBy("frame_idx")
    seg = (
        active.withColumn(
            "_grp", F.col("frame_idx") - F.row_number().over(w)
        )
        .groupBy("clip_id", "_grp")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("sumsq").alias("energy"),
        )
    )
    w2 = Window.partitionBy("clip_id").orderBy("start_frame")
    return seg.select(
        "clip_id",
        F.row_number().over(w2).cast("long").alias("seg_idx"),
        "start_frame",
        "end_frame",
        "n_frames",
        "energy",
    )


PITCH_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("best_lag", T.LongType()),
        T.StructField("r_best", T.LongType()),
        T.StructField("r_zero", T.LongType()),
        T.StructField("periodicity", T.DoubleType()),
    ]
)


def pitch_lag_exact(
    clips: DataFrame,
    *,
    min_lag: int = 8,
    max_lag: int = 200,
    id_col: str = "clip_id",
) -> DataFrame:
    """Autocorrelation pitch-lag estimate with engine-portable EXACT
    arithmetic: ``r(L) = sum(s[i] * s[i+L])`` is a pure int64 sum (max
    |s|^2 * n ~ 3e12, far inside int64), ``best_lag`` is the argmax over
    ``[min_lag, max_lag]`` with ties broken toward the SMALLEST lag, and
    ``periodicity = r_best / r_zero`` is the single IEEE division at the
    end (both operands < 2^53, so the double quotient is identical in any
    engine). Clips with ``r_zero = 0`` (digital silence) report NULL
    periodicity and the tie-broken ``best_lag = min_lag``.

    This is the classic time-domain pitch tracker a speech-corpus QA pass
    runs (voiced-ness + F0 plausibility); the integer formulation is what
    lets the driver contract value-check it (``pitch_lag``) instead of a
    rows-only FFT variant. Same narrow mapInArrow shape as the other DSP
    passes — the per-clip lag scan is ~200 vectorized dot products.
    """
    from seronet_data_validator_spark.operators.audio import (
        _binary_views,
        _decode_view,
    )

    src = clips.select(id_col, "bytes")
    names = [f.name for f in PITCH_SCHEMA.fields]
    types = [pa.string(), pa.int64(), pa.int64(), pa.int64(), pa.int64(), pa.float64()]
    lo, hi = int(min_lag), int(max_lag)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {n: [] for n in names}
            ids = batch.column(0).to_pylist()
            get, _ = _binary_views(batch.column(1))
            for i in range(batch.num_rows):
                try:
                    s16, _sr = _decode_view(get(i))
                except ValueError:
                    row = (ids[i], 0, None, None, None, None)
                else:
                    s = s16.astype(np.int64)
                    n = len(s)
                    if n == 0:
                        row = (ids[i], 0, None, None, None, None)
                    else:
                        r_zero = int(np.dot(s, s))
                        best_lag, r_best = lo, None
                        for lag in range(lo, hi + 1):
                            r = int(np.dot(s[:-lag], s[lag:])) if lag < n else 0
                            if r_best is None or r > r_best:
                                best_lag, r_best = lag, r
                        per = (r_best / r_zero) if r_zero > 0 else None
                        row = (ids[i], n, best_lag, r_best, r_zero, per)
                for name, v in zip(names, row):
                    cols[name].append(v)
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[n], type=t) for n, t in zip(names, types)],
                names=names,
            )

    return src.mapInArrow(run, schema=PITCH_SCHEMA)


HUM_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("freq_hz", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("hum_power", T.DoubleType()),
    ]
)


def hum_detection(
    clips: DataFrame,
    *,
    freqs: tuple = (50.0, 60.0),
    threshold: float = 0.05,
    id_col: str = "clip_id",
) -> DataFrame:
    """Mains-hum screen: the Goertzel single-bin DTFT power at each probe
    frequency (50/60 Hz by default — ground-loop hum is the classic field
    recording fault), normalized against the clip's total energy. Unlike
    the Welch/FFT passes this IS engine-portable: the Goertzel recurrence
    ``s0 = x + c*s1 - s2`` is a fixed chain of IEEE double ops over the
    integer samples, with the single transcendental (the coefficient
    ``c = 2·cos(2πf/sr)``) computed once per (clip-rate, freq) — an
    external engine replaying the identical recurrence reproduces every
    power bit-for-bit, which is what gives this query a full value oracle
    where ``spectral_profile`` is rows-only.

    Outputs one row per (clip, probe frequency): the raw Goertzel power,
    ``hum_frac = 2·power / (n · sum_sq)`` (≈1.0 for a full-scale pure
    tone at the bin, ≈0 for noise), and ``has_hum`` (frac > threshold).
    Clips that fail to decode or are digital silence report NULL powers
    and ``has_hum = false``.

    Execution shape: narrow mapInArrow decode pass; the recurrence is a
    per-sample Python-float loop (sequential dependency, like the LPC
    restore in operators/flac.py) — correct for fixtures and QC sampling;
    a deployment screening every clip at 10^12 scale would swap a C
    kernel behind the same dispatch. Everything after the pass is native
    Column code.
    """
    import math

    from seronet_data_validator_spark.operators.audio import (
        _binary_views,
        _decode_view,
    )

    probe = [float(f) for f in freqs]
    src = clips.select(id_col, "bytes")
    names = [f.name for f in HUM_SCHEMA.fields]
    types = [pa.string(), pa.float64(), pa.int64(), pa.int32(), pa.int64(), pa.float64()]

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {n: [] for n in names}
            ids = batch.column(0).to_pylist()
            get, _ = _binary_views(batch.column(1))
            for i in range(batch.num_rows):
                try:
                    s16, sr = _decode_view(get(i))
                except ValueError:
                    for f in probe:
                        for name, v in zip(names, (ids[i], f, 0, 0, None, None)):
                            cols[name].append(v)
                    continue
                s = s16.astype(np.int64)
                n = len(s)
                sum_sq = int(np.dot(s, s)) if n else 0
                xs = s.astype(np.float64).tolist()
                for f in probe:
                    if n == 0 or sum_sq == 0:
                        row = (ids[i], f, n, sr, sum_sq if n else None, None)
                    else:
                        c = 2.0 * math.cos(2.0 * math.pi * f / sr)
                        s1 = s2 = 0.0
                        for x in xs:
                            s0 = x + c * s1 - s2
                            s2 = s1
                            s1 = s0
                        p = s1 * s1 + s2 * s2 - c * s1 * s2
                        row = (ids[i], f, n, sr, sum_sq, p)
                    for name, v in zip(names, row):
                        cols[name].append(v)
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[n], type=t) for n, t in zip(names, types)],
                names=names,
            )

    stats = src.mapInArrow(run, schema=HUM_SCHEMA)
    frac = (
        F.lit(2.0)
        * F.col("hum_power")
        / (F.col("n_samples").cast("double") * F.col("sum_sq").cast("double"))
    )
    ok = F.col("hum_power").isNotNull()
    return stats.select(
        id_col,
        "freq_hz",
        "n_samples",
        "sr_hz",
        "sum_sq",
        "hum_power",
        F.when(ok, frac).alias("hum_frac"),
        F.coalesce(F.when(ok, frac > F.lit(threshold)), F.lit(False)).alias(
            "has_hum"
        ),
    )
