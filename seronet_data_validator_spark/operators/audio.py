"""Audio invariant pass: decoded-PCM checks as Arrow-vectorized pandas UDFs.

This is the engine's only Python-executed data path (input_hint: "vectorized
pandas/Arrow UDFs (no per-row Python) throughout"). It is the audio analog of
the reference's cross-column arithmetic invariants C13
(/root/reference/File_Submission_Object.py:519-552): instead of
total-vs-live cell counts, the invariants are

  * the WAV header must decode, and its sample rate must equal ``sr_hz``;
  * ``dur_ms`` must equal round(n_samples / sr * 1000) (±2 ms);
  * against a reference row (analog of prior-vs-confirm consistency,
    /root/reference/Validation_Rules.py:64-97): decoded PCM must match the
    reference PCM with SNR ≥ 30 dB (allclose in dB terms), and the
    transcript must equal the reference transcript exactly.

WAV parsing is header math + ``np.frombuffer`` — zero-copy per Arrow batch.
Rows are processed batch-at-a-time inside mapInPandas; the per-row numpy
work is unavoidable (variable-length buffers) but stays inside one Python
worker call per ~4096-row Arrow batch, never one call per row.

At 100 TB the binary column dominates I/O: this pass projects ONLY
(row-id, bytes, sr_hz, dur_ms[, ref_bytes, transcripts]) so Parquet/Iceberg
column pruning keeps every other byte on disk, and it runs partition-parallel
with no shuffle at all (narrow transformation).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seronet_data_validator_spark.model import SEVERITY_ERROR, VIOLATION_SCHEMA
from seronet_data_validator_spark.sources.clips import decode_wav_i16

_SNR_DB_MIN = 30.0


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """SNR of ``test`` against ``ref`` in dB: 10·log10(P_ref / P_noise).

    Power terms as float32 dot products (BLAS) rather than elementwise
    square+mean — ~2x fewer temporaries in the hot path; scale factors
    cancel in the ratio so int16-scaled inputs work unchanged."""
    n = min(len(ref), len(test))
    if n == 0:
        return -np.inf
    r = np.asarray(ref[:n], dtype=np.float32)
    t = np.asarray(test[:n], dtype=np.float32)
    noise = r - t
    p_ref = float(np.dot(r, r))
    p_noise = float(np.dot(noise, noise))
    if p_noise == 0.0:
        return np.inf
    if p_ref == 0.0:
        return -np.inf
    return 10.0 * np.log10(p_ref / p_noise)


def audio_violations(
    clips: DataFrame,
    reference_clips: DataFrame | None = None,
    *,
    table_name: str = "clips",
    id_column: str = "clip_id",
    snr_db_min: float = _SNR_DB_MIN,
    dur_tolerance_ms: int = 2,
) -> DataFrame:
    """Run the decoded-PCM invariant suite; returns a violations DataFrame.

    ``reference_clips`` (clip_id, ref_bytes, ref_transcript) joins 1:1 on the
    id; when absent only the self-consistency checks run. The join key is the
    (unique) clip id — a plain shuffle hash join both sides; at cluster scale
    both tables would be bucketed by clip_id in Iceberg so this becomes a
    storage-partitioned join with no shuffle.
    """
    cols = [F.col(id_column), F.col("bytes"), F.col("sr_hz"), F.col("dur_ms")]
    df = clips.select(*cols, F.col("transcript"))
    has_ref = reference_clips is not None
    if has_ref:
        ref = reference_clips.select(
            F.col(id_column), F.col("ref_bytes"), F.col("ref_transcript")
        )
        df = df.join(ref, id_column, "left")

    def check_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k, _ in _OUT_COLS}

            def emit(cid: str, column: str, value: str, rule: str, msg: str) -> None:
                out["severity"].append(SEVERITY_ERROR)
                out["table_name"].append(table_name)
                out["row_ref"].append(cid)
                out["column_name"].append(column)
                out["column_value"].append(value)
                out["rule_id"].append(rule)
                out["message"].append(msg)

            for row in pdf.itertuples(index=False):
                cid = getattr(row, id_column)
                try:
                    pcm, sr = decode_wav_i16(row.bytes)
                except (ValueError, TypeError) as e:
                    emit(cid, "bytes", f"<{0 if row.bytes is None else len(row.bytes)}B>",
                         "C13a.decode", f"audio buffer failed to decode: {e}")
                    continue
                if row.sr_hz is not None and int(sr) != int(row.sr_hz):
                    emit(cid, "sr_hz", str(row.sr_hz), "C13a.sr_mismatch",
                         f"declared sr_hz {row.sr_hz} != decoded {sr}")
                if row.dur_ms is not None:
                    decoded_ms = round(len(pcm) / sr * 1000.0)
                    if abs(decoded_ms - int(row.dur_ms)) > dur_tolerance_ms:
                        emit(cid, "dur_ms", str(row.dur_ms), "C13a.dur_mismatch",
                             f"declared dur_ms {row.dur_ms} != decoded {decoded_ms}")
                if has_ref and row.ref_bytes is not None:
                    try:
                        ref_pcm, _ = decode_wav_i16(row.ref_bytes)
                    except (ValueError, TypeError):
                        ref_pcm = None
                    if ref_pcm is not None:
                        s = snr_db(ref_pcm, pcm)
                        if s < snr_db_min:
                            emit(cid, "bytes", f"snr={s:.1f}dB", "C13a.snr",
                                 f"decoded PCM SNR {s:.1f} dB below required {snr_db_min} dB")
                if has_ref and row.ref_transcript is not None:
                    if (row.transcript or "") != row.ref_transcript:
                        emit(cid, "transcript", str(row.transcript), "C13a.transcript",
                             "transcript does not equal reference transcript")
            yield pd.DataFrame(out, columns=[k for k, _ in _OUT_COLS])

    return df.mapInPandas(check_batches, schema=VIOLATION_SCHEMA)


_OUT_COLS = [(f.name, f.dataType) for f in VIOLATION_SCHEMA.fields]
