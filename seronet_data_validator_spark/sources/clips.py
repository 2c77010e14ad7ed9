"""Deterministic audio clip + transcript generator (input_hint schema).

Schema: (clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
transcript string) — BASELINE.json input_hint. Generation is distributed
(mapInPandas over spark.range) and seeded PER ROW id, so the output is
bit-identical regardless of parallelism or partitioning — required for the
local[8]-vs-local[32] scaling-efficiency protocol to compare like with like.

clip_id is hierarchical `SS_CCCCCC_NNN` (site, corpus, clip), mirroring the
reference's CBC/participant/biospecimen prefix hierarchy
(/root/reference/Validation_Rules.py:131-150).

Audio is PCM16 WAV (RIFF header + int16 sine/noise mix) — pure numpy, no
codec libraries; the engine's decode UDF parses the same public WAV layout.
Codec keys are skewed (~82% 'pcm_s16le') to exercise salting/AQE-skew paths.

The "bad" fixture (seed-controlled corruption) seeds exact violation counts
by row id — the reference's golden-count test contract
(/root/reference/test_bad_submission.py:36-54).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
        T.StructField("site", T.StringType(), True),  # partition key = clip_id prefix
    ]
)

SAMPLE_RATES = [8000, 16000, 22050, 44100, 48000]
CODECS = ["pcm_s16le", "flac", "opus", "mp3", "aac"]
# hot-key skew: index 0 dominates
CODEC_WEIGHTS = [0.82, 0.08, 0.05, 0.03, 0.02]
SITES = ["11", "22", "33", "41"]
WORDS = (
    "the quick brown fox jumps over lazy dog audio clip speech sample "
    "validation engine spark distributed partition shuffle transcript "
    "signal noise ratio sine wave hello world testing data quality"
).split()


def wav_bytes(samples_i16: np.ndarray, sr_hz: int) -> bytes:
    """Minimal RIFF/WAVE PCM16 mono encoder (public WAV spec)."""
    data = samples_i16.astype("<i2").tobytes()
    n = len(data)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", n) + data


def wav_bytes_ex(
    samples: np.ndarray, sr_hz: int, *, bits: int = 16
) -> bytes:
    """RIFF/WAVE PCM encoder for the extended decode surface: ``samples``
    is (n,) mono or (n, 2) stereo; ``bits`` 16 (int16 values) or 24
    (int32 values in [-2^23, 2^23))."""
    samples = np.asarray(samples)
    ch = 2 if samples.ndim == 2 else 1
    if bits == 16:
        data = samples.astype("<i2").tobytes()
    elif bits == 24:
        s = samples.astype(np.int32).reshape(-1)
        b3 = np.empty((len(s), 3), np.uint8)
        b3[:, 0] = s & 0xFF
        b3[:, 1] = (s >> 8) & 0xFF
        b3[:, 2] = (s >> 16) & 0xFF
        data = b3.tobytes()
    else:
        raise ValueError(f"unsupported bits {bits}")
    n = len(data)
    align = ch * bits // 8
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, ch, sr_hz, sr_hz * align, align, bits
    )
    return hdr + fmt + b"data" + struct.pack("<I", n) + data


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """Parse the RIFF/WAVE PCM16 mono layout produced above → (float32, sr)."""
    pcm, sr = decode_wav_i16(b)
    return pcm.astype(np.float32) / 32768.0, sr


def decode_wav_i16(b: bytes) -> tuple[np.ndarray, int]:
    """Zero-copy variant: int16 view of the sample data (no scale, no copy).
    Hot-path decode for the SNR invariant — scale factors cancel in the
    power ratio, so full-scale float conversion is wasted work there."""
    if b is None or len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    sr = struct.unpack("<I", b[24:28])[0]
    n = struct.unpack("<I", b[40:44])[0]
    pcm = np.frombuffer(b, dtype="<i2", offset=44, count=n // 2)
    return pcm, sr


def _synth_row(rid: int, seed: int, payload: bool = True) -> dict:
    rng = np.random.default_rng(np.uint64(seed * 1_000_003 + rid))
    site = SITES[int(rng.integers(0, len(SITES)))]
    corpus = int(rng.integers(0, 1_000_000))
    clip = int(rng.integers(0, 1000))
    clip_id = f"{site}_{corpus:06d}_{clip:03d}"
    sr = SAMPLE_RATES[int(rng.integers(0, len(SAMPLE_RATES)))]
    dur_ms = int(rng.integers(50, 400))
    n_samp = int(round(sr * dur_ms / 1000.0))
    freq = 100.0 + float(rng.integers(0, 300))
    noise = rng.normal(0.0, 0.005, n_samp).astype(np.float32)
    if payload:
        # PCM synthesis (the expensive part) only when the payload is wanted
        t = np.arange(n_samp, dtype=np.float32) / sr
        signal = 0.6 * np.sin(2 * np.pi * freq * t)
        samples = np.clip(signal + noise, -1.0, 1.0)
        payload_bytes = wav_bytes((samples * 32767).astype(np.int16), sr)
    else:
        # metadata-only fixture (bytes column present but empty): every RNG
        # draw happens in the same order, so ids/codecs/transcripts are
        # IDENTICAL to the full generation at the same (rid, seed) — only
        # the PCM synthesis is skipped. For benching the metadata/transcript
        # stages (run_audio_pass=False); the decoded-PCM pass would rightly
        # reject every row of such a fixture.
        payload_bytes = b""
    codec = str(rng.choice(CODECS, p=CODEC_WEIGHTS))
    n_words = int(rng.integers(3, 12))
    transcript = " ".join(rng.choice(WORDS, size=n_words))
    return {
        "clip_id": clip_id,
        "bytes": payload_bytes,
        "sr_hz": sr,
        "dur_ms": dur_ms,
        "codec": codec,
        "transcript": transcript,
        "site": site,
    }


def _corrupt(row: dict, rid: int, n_rows: int) -> dict:
    """Seed exact, position-deterministic violations for the Bad fixture.

    Row ids are dense [0, n), so counts are exact: 6 malformed clip_id,
    3 duplicated clip_id, 4 unregistered codec, 2 out-of-range dur_ms,
    2 blank transcript, 1 N/A transcript, 1 low-SNR clip, 1 invalid sr_hz,
    plus "valid-but-wrong" rows that ONLY the decoded-PCM invariant pass can
    catch (metadata passes every row rule; reality disagrees): 1 wrong-but-
    allowed sr_hz, 1 wrong-but-in-range dur_ms, 1 silently swapped
    transcript, 1 truncated byte buffer, 1 implausible speech-rate transcript.
    Disjoint id ranges keep the per-(rule,column) golden counts independent
    under the C22 first-writer-wins dedup (reference
    test_bad_submission.py:36-54 contract style).
    """
    if rid < 6:
        row["clip_id"] = f"BAD-ID-{rid}"
    elif rid < 9:
        row["clip_id"] = "11_000000_000"  # 3 extra copies -> dup count 3 (+1 if natural)
    elif rid < 13:
        row["codec"] = f"codec_x{rid}"
    elif rid < 15:
        row["dur_ms"] = 10_000_000
    elif rid < 17:
        row["transcript"] = ""
    elif rid < 18:
        row["transcript"] = "N/A"
    elif rid < 19:
        pcm, sr = decode_wav(row["bytes"])
        noisy = np.clip(pcm + np.random.default_rng(7).normal(0, 0.5, len(pcm)), -1, 1)
        row["bytes"] = wav_bytes((noisy * 32767).astype(np.int16), sr)
    elif rid < 20:
        row["sr_hz"] = 12345
    elif rid < 21:
        # allowed rate, but not the one the WAV header carries
        row["sr_hz"] = 8000 if row["sr_hz"] != 8000 else 16000
    elif rid < 22:
        row["dur_ms"] = min(row["dur_ms"] + 5_000, 600_000)  # in range, wrong
    elif rid < 23:
        row["transcript"] = "silently swapped transcript words"
    elif rid < 24:
        row["bytes"] = row["bytes"][:-7]  # truncated payload, odd tail
    elif rid < 25:
        # transcript/audio mispairing: 200 words against a <=400 ms clip
        # (>=500 words/sec) -> C13b.speech_rate; the C13a.transcript report
        # for the same (row, column, value) is suppressed by the C22
        # first-writer-wins dedup (row rules run before the audio pass).
        row["transcript"] = " ".join(["rapid"] * 200)
    return row


def generate_clips(
    spark: SparkSession,
    n_rows: int,
    *,
    seed: int = 42,
    bad: bool = False,
    num_partitions: int | None = None,
    payload: bool = True,
) -> DataFrame:
    """Distributed deterministic generation: spark.range → mapInPandas.

    ``payload=False`` keeps every metadata/transcript value identical but
    leaves ``bytes`` empty (see ``_synth_row``); requires ``bad=False`` —
    the corruption recipes tamper with real PCM buffers."""
    if not payload and bad:
        raise ValueError("payload=False supports only the clean fixture")
    # row-adaptive partitioning: a fixed defaultParallelism split puts ~5
    # rows in each of 32 Python tasks for the small fixtures — the worker
    # round-trip latency then dwarfs the synth (~0.2 ms/clip). ≥64 rows per
    # task, capped at defaultParallelism so large generations still use
    # every core.
    parts = num_partitions or max(
        4, min(spark.sparkContext.defaultParallelism, n_rows // 64)
    )
    base = spark.range(0, n_rows, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid in pdf["id"].to_numpy():
                row = _synth_row(int(rid), seed, payload=payload)
                if bad:
                    row = _corrupt(row, int(rid), n_rows)
                rows.append(row)
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=CLIPS_SCHEMA)


def reference_clips(spark: SparkSession, n_rows: int, *, seed: int = 42) -> DataFrame:
    """The per-row invariant oracle (FIXTURES.md §3): the UNCORRUPTED
    generation at the same seed, so a Bad fixture's tampered rows disagree
    with it on PCM (SNR) / transcript / duration exactly where corrupted."""
    good = generate_clips(spark, n_rows, seed=seed, bad=False)
    return good.select(
        "clip_id",
        good["bytes"].alias("ref_bytes"),
        good["transcript"].alias("ref_transcript"),
    )


def codec_registry_df(spark: SparkSession) -> DataFrame:
    """Dimension table — analog of the injected assay registry
    (/root/reference/Data_Validation_v1.py:277-303)."""
    rows = [
        ("pcm_s16le", "wav", "F"),
        ("flac", "flac", "F"),
        ("opus", "ogg", "T"),
        ("mp3", "mp3", "T"),
        ("aac", "m4a", "T"),
    ]
    # Arrow-backed (sources/local.py): the registry is re-scanned by several
    # lifecycle stages; the pickled-RDD form pays 32 Python tasks per scan.
    from seronet_data_validator_spark.sources.local import local_df

    return local_df(spark, rows, "codec string, container string, lossy string")
