"""Multimodal binary-column operators.

Media payloads are opaque `binary` columns with typed metadata columns
beside them (the clips table's (bytes, sr_hz, dur_ms, codec) is the audio
instance). Each operator is an Arrow-batched `mapInPandas` with a declared
output schema — the Spark-side plumbing (schema, partitioning, batch shape)
is real and tested; decoders for formats whose libraries are not in this
container are STUBBED behind clearly-marked NotImplementedError / a
deterministic fake, as permitted by the build brief.

Audio is fully real (RIFF/WAV PCM16 parse in numpy — public spec).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seronet_data_validator_spark.sources.clips import decode_wav, wav_bytes

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("clipping_ratio", T.DoubleType()),
    ]
)


def audio_features(clips: DataFrame, *, id_col: str = "clip_id") -> DataFrame:
    """Feature-extract over the binary audio column: RMS, peak, ZCR,
    clipping ratio — the audio analog of image feature extraction.
    Narrow (no shuffle); Arrow batches; numpy-vectorized per clip."""
    src = clips.select(id_col, "bytes")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, b in zip(pdf[id_col], pdf["bytes"]):
                try:
                    pcm, sr = decode_wav(b)
                except (ValueError, TypeError):
                    rows.append((cid, 0, 0, None, None, None, None))
                    continue
                n = len(pcm)
                rms = float(np.sqrt(np.mean(pcm**2))) if n else 0.0
                peak = float(np.max(np.abs(pcm))) if n else 0.0
                zcr = float(np.mean(np.abs(np.diff(np.sign(pcm))) > 0)) if n > 1 else 0.0
                clip_ratio = float(np.mean(np.abs(pcm) >= 0.999)) if n else 0.0
                rows.append((cid, n, sr, rms, peak, zcr, clip_ratio))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return src.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
    ]
)


def audio_resample(clips: DataFrame, target_sr: int, *, id_col: str = "clip_id") -> DataFrame:
    """Resample audio to `target_sr` (linear interpolation — numpy; the
    'resize' analog for audio). Returns re-encoded WAV bytes."""
    src = clips.select(id_col, "bytes")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, b in zip(pdf[id_col], pdf["bytes"]):
                try:
                    pcm, sr = decode_wav(b)
                except (ValueError, TypeError):
                    rows.append((cid, None, None))
                    continue
                if sr == target_sr or len(pcm) == 0:
                    out = pcm
                else:
                    n_out = max(1, int(round(len(pcm) * target_sr / sr)))
                    x_old = np.linspace(0.0, 1.0, num=len(pcm), endpoint=False)
                    x_new = np.linspace(0.0, 1.0, num=n_out, endpoint=False)
                    out = np.interp(x_new, x_old, pcm).astype(np.float32)
                rows.append((cid, wav_bytes((out * 32767).astype(np.int16), target_sr), target_sr))
            yield pd.DataFrame(rows, columns=["clip_id", "bytes", "sr_hz"])

    return src.mapInPandas(run, schema=RESAMPLED_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.ArrayType(T.FloatType())),
    ]
)


def audio_frame_sample(
    clips: DataFrame, *, frame_ms: int = 25, max_frames: int = 8, id_col: str = "clip_id"
) -> DataFrame:
    """Frame-sampling (the video frame-sample analog): split decoded PCM into
    fixed-length frames, emit up to `max_frames` evenly-spaced frames per
    clip as float arrays — the batch shape a downstream feature model wants."""
    src = clips.select(id_col, "bytes")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for cid, b in zip(pdf[id_col], pdf["bytes"]):
                try:
                    pcm, sr = decode_wav(b)
                except (ValueError, TypeError):
                    continue
                flen = max(1, int(sr * frame_ms / 1000))
                n_frames = max(1, len(pcm) // flen)
                take = np.linspace(0, n_frames - 1, num=min(max_frames, n_frames)).astype(int)
                for fi in np.unique(take):
                    ids.append(cid)
                    idxs.append(int(fi))
                    frames.append(pcm[fi * flen : (fi + 1) * flen].tolist())
            yield pd.DataFrame({"clip_id": ids, "frame_idx": idxs, "frame": frames})

    return src.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def image_features(
    images: DataFrame, *, id_col: str = "item_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Image decode/feature plumbing. The decode itself is STUBBED — no image
    codec library ships in this container. The Spark-side contract (schema,
    Arrow batching, partition-parallel narrow pass) is identical to
    audio_features; swap `_decode_image_stub` for a real decoder (PIL/cv2)
    in production."""
    src = images.select(id_col, bytes_col)

    def _decode_image_stub(b: bytes) -> tuple[int, int, float]:
        raise NotImplementedError(
            "image decode requires an image codec library (PIL/cv2), "
            "not available in this container — plumbing only"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, b in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    w, h, luma = _decode_image_stub(b)
                    rows.append((iid, w, h, luma))
                except NotImplementedError:
                    rows.append((iid, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return src.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
