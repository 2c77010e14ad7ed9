"""Unit tests for the audio QC verdict family (operators/qc.py): planted
clips with known verdicts, the partial-frame silence rule, the NULL-gain
and peak-limited branches, and every speaking-rate status lane."""

import numpy as np
import pandas as pd
import pytest

from seronet_data_validator_spark.operators.qc import (
    audio_qc,
    loudness_gain,
    speaking_rate,
)
from seronet_data_validator_spark.sources.clips import wav_bytes


def _clips_df(spark, named_samples):
    rows = [
        {"clip_id": cid, "bytes": wav_bytes(np.asarray(s, np.int16), 8000)}
        for cid, s in named_samples
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


@pytest.fixture(scope="module")
def qc_rows(spark):
    rng_i = np.arange(2000, dtype=np.int64)
    healthy = ((3 * 7919 + rng_i * 104729 + 12345) % 65536) - 32768
    clips = _clips_df(
        spark,
        [
            ("healthy", healthy),
            ("silent", np.zeros(2000, np.int64)),
            ("clipped", np.where((rng_i // 8) % 2 == 0, 32767, -32768)),
            ("dc", np.full(2000, 3000, np.int64)),
            ("spike", np.where(rng_i == 0, 20000, 0)),
        ],
    )
    return {r["clip_id"]: r.asDict() for r in audio_qc(clips).collect()}


def test_audio_qc_verdicts(qc_rows):
    assert qc_rows["healthy"]["qc_pass"] is True
    assert qc_rows["silent"]["is_silent"] is True
    assert qc_rows["silent"]["qc_pass"] is False
    assert qc_rows["clipped"]["is_clipped"] is True
    assert qc_rows["clipped"]["clip_count"] == 2000
    assert qc_rows["dc"]["dc_biased"] is True
    assert qc_rows["dc"]["is_silent"] is False
    # spike: one loud frame, the rest silent -> silent-majority verdict
    assert qc_rows["spike"]["is_silent"] is True
    assert qc_rows["spike"]["silence_frames"] == qc_rows["spike"]["n_frames"] - 1


def test_audio_qc_partial_frame(spark):
    # 170 samples = one full frame + a 10-sample partial frame; the partial
    # frame counts, and its silence is judged over the real samples only
    s = np.zeros(170, np.int64)
    s[165] = 5000  # loud sample inside the partial frame
    rows = {
        r["clip_id"]: r.asDict()
        for r in audio_qc(_clips_df(spark, [("part", s)])).collect()
    }
    assert rows["part"]["n_frames"] == 2
    assert rows["part"]["silence_frames"] == 1


def test_audio_qc_undecodable(spark):
    df = spark.createDataFrame(
        pd.DataFrame([{"clip_id": "junk", "bytes": b"not a riff"}])
    )
    row = audio_qc(df).collect()[0].asDict()
    assert row["is_clipped"] is None
    assert row["qc_pass"] is False


def test_loudness_gain_branches(spark):
    rng_i = np.arange(2000, dtype=np.int64)
    clips = _clips_df(
        spark,
        [
            ("dc", np.full(2000, 3000, np.int64)),
            ("silent", np.zeros(2000, np.int64)),
            ("spike", np.where(rng_i == 0, 20000, 0)),
        ],
    )
    rows = {r["clip_id"]: r.asDict() for r in loudness_gain(clips).collect()}
    # constant 3000: rms == 3000 exactly, gain = 3276.8/3000, not limited
    assert rows["dc"]["peak_limited"] is False
    assert rows["dc"]["gain"] == pytest.approx(3276.8 / 3000.0, rel=0, abs=0)
    # silence: nothing to normalize
    assert rows["silent"]["gain"] is None
    assert rows["silent"]["peak_limited"] is None
    # impulse: rms-gain would push the peak past full scale -> capped
    assert rows["spike"]["peak_limited"] is True
    assert rows["spike"]["gain"] == pytest.approx(32767.0 / 20000.0, rel=0, abs=0)
    # the cap really keeps the scaled peak inside int16
    assert rows["spike"]["gain"] * 20000.0 <= 32767.0


def test_speaking_rate_statuses(spark):
    pdf = pd.DataFrame(
        [
            {"clip_id": "ok", "transcript": "one two three", "dur_ms": 1500},
            {"clip_id": "fast", "transcript": " ".join(["w"] * 40), "dur_ms": 1000},
            {"clip_id": "slow", "transcript": "just two", "dur_ms": 9000},
            {"clip_id": "empty", "transcript": "   ", "dur_ms": 1000},
            {"clip_id": "baddur", "transcript": "some words", "dur_ms": 0},
        ]
    )
    rows = {
        r["clip_id"]: r.asDict()
        for r in speaking_rate(spark.createDataFrame(pdf)).collect()
    }
    assert rows["ok"]["rate_status"] == "ok"
    assert rows["ok"]["n_tokens"] == 3
    assert rows["ok"]["words_per_sec"] == pytest.approx(2.0)
    assert rows["fast"]["rate_status"] == "too_fast"
    assert rows["slow"]["rate_status"] == "too_slow"
    assert rows["empty"]["rate_status"] == "empty_transcript"
    assert rows["empty"]["n_tokens"] == 0
    assert rows["baddur"]["rate_status"] == "bad_duration"
    assert rows["baddur"]["words_per_sec"] is None


def test_alignment_check_violation_classes(spark):
    from seronet_data_validator_spark.operators.qc import alignment_check

    def clip(cid, dur, spans):
        return {
            "clip_id": cid,
            "dur_ms": dur,
            "alignment": [
                {"token": f"t{j}", "start_ms": s, "end_ms": e}
                for j, (s, e) in enumerate(spans)
            ],
        }

    pdf = pd.DataFrame(
        [
            clip("clean", 1000, [(0, 210), (250, 460), (500, 710)]),
            clip("overlap", 1000, [(0, 210), (200, 460)]),
            clip("inverted", 1000, [(0, 210), (500, 470)]),
            clip("oob", 500, [(0, 210), (250, 530)]),
            clip("neg", 1000, [(-10, 210), (250, 460)]),
            clip("empty", 1000, []),
            clip("single", 1000, [(0, 210)]),  # n<2: no overlap lane
        ]
    )
    rows = {
        r["clip_id"]: r.asDict()
        for r in alignment_check(spark.createDataFrame(pdf)).collect()
    }
    assert rows["clean"]["align_ok"] is True
    assert rows["overlap"]["n_overlaps"] == 1 and not rows["overlap"]["align_ok"]
    assert rows["inverted"]["n_inverted"] == 1
    assert rows["oob"]["n_oob"] == 1
    assert rows["neg"]["n_oob"] == 1
    assert rows["empty"]["align_ok"] is False  # empty alignment never passes
    assert rows["empty"]["n_overlaps"] == 0
    assert rows["single"]["align_ok"] is True


def test_normalize_transcript(spark):
    from seronet_data_validator_spark.operators.text import normalize_transcript

    pdf = pd.DataFrame(
        [
            {"clip_id": "a", "transcript": "  Hello,   WORLD!! don't (Spark) "},
            {"clip_id": "b", "transcript": "mid--dash x123"},
            {"clip_id": "c", "transcript": "   "},
        ]
    )
    rows = {
        r["clip_id"]: r.asDict()
        for r in normalize_transcript(spark.createDataFrame(pdf)).collect()
    }
    assert rows["a"]["norm_transcript"] == "hello world don't spark"
    assert rows["a"]["n_raw_tokens"] == 4
    assert rows["a"]["n_norm_tokens"] == 4
    # double-dash compounds SPLIT under normalization: norm > raw
    assert rows["b"]["norm_transcript"] == "mid dash x123"
    assert rows["b"]["n_raw_tokens"] == 2
    assert rows["b"]["n_norm_tokens"] == 3
    assert rows["c"]["norm_transcript"] == ""
    assert rows["c"]["n_norm_tokens"] == 0


def test_qc_pass_in_lifecycle(spark, tmp_path):
    """validate_clips(run_qc_pass=True): planted QC-bad payloads produce
    QC1 violation rows attributed to their REAL partition, the clipping
    Error fails that partition's verdict, and the clean fixture stays
    clean with the pass enabled."""
    from pyspark.sql import functions as F

    from seronet_data_validator_spark.model import VIOLATION_SCHEMA
    from seronet_data_validator_spark.runner import validate_clips
    from seronet_data_validator_spark.sources.clips import generate_clips

    clips = generate_clips(spark, 200, seed=11, bad=False)
    victims = [
        r["clip_id"]
        for r in clips.select("clip_id").orderBy("clip_id").limit(3).collect()
    ]
    i = np.arange(2000, dtype=np.int64)
    bad_bytes = {
        victims[0]: wav_bytes(
            np.where((i // 8) % 2 == 0, 32767, -32768).astype(np.int16), 8000
        ),  # clipped -> Error
        victims[1]: wav_bytes(np.zeros(2000, np.int16), 8000),  # silent -> Warning
        victims[2]: wav_bytes(np.full(2000, 3000, np.int16), 8000),  # DC -> Warning
    }
    planted = clips.withColumn(
        "bytes",
        F.when(F.col("clip_id") == victims[0], F.lit(bad_bytes[victims[0]]))
        .when(F.col("clip_id") == victims[1], F.lit(bad_bytes[victims[1]]))
        .when(F.col("clip_id") == victims[2], F.lit(bad_bytes[victims[2]]))
        .otherwise(F.col("bytes")),
    )
    out = str(tmp_path / "qc_out")
    res = validate_clips(
        spark, planted, run_id="QC1", output_root=out,
        run_audio_pass=False, run_qc_pass=True,
    )
    assert res.passed is False
    import pyspark.sql.types as T

    stored = T.StructType(
        list(VIOLATION_SCHEMA.fields) + [T.StructField("site", T.StringType())]
    )
    v = spark.read.schema(stored).parquet(f"{out}/violations/QC1")
    qc = {r["row_ref"]: r.asDict() for r in v.where(
        F.col("rule_id").startswith("QC1")).collect()}
    assert set(qc) == set(victims)
    assert qc[victims[0]]["rule_id"] == "QC1.clipped"
    assert qc[victims[0]]["severity"] == "Error"
    assert qc[victims[1]]["rule_id"] == "QC1.silent"
    assert qc[victims[1]]["severity"] == "Warning"
    assert qc[victims[2]]["rule_id"] == "QC1.dc_offset"
    # partition attribution: each QC row carries the victim's REAL site
    for cid in victims:
        assert qc[cid]["site"] == cid.split("_")[0]
    # the clipping Error fails exactly that partition's verdict
    verdicts = {r["partition_key"]: r["pass"] for r in res.verdicts}
    assert verdicts[victims[0].split("_")[0]] is False
    # clean fixture with the pass on: QC adds nothing
    res2 = validate_clips(
        spark, clips, run_id="QC2", output_root=str(tmp_path / "qc_out2"),
        run_audio_pass=False, run_qc_pass=True,
    )
    assert res2.passed is True


def test_codec_container_check(spark):
    from seronet_data_validator_spark.operators.flac import flac_bytes
    from seronet_data_validator_spark.operators.qc import codec_container_check

    s = np.arange(100, dtype=np.int16)
    pdf = pd.DataFrame(
        [
            {"clip_id": "wav_ok", "bytes": wav_bytes(s, 8000), "codec": "pcm_s16le"},
            {"clip_id": "wav_case", "bytes": wav_bytes(s, 8000), "codec": " PCM_S16LE "},
            {"clip_id": "wav_mis", "bytes": wav_bytes(s, 8000), "codec": "flac"},
            {"clip_id": "flac_ok", "bytes": flac_bytes(s, 8000), "codec": "flac"},
            {"clip_id": "flac_mis", "bytes": flac_bytes(s, 8000), "codec": "opus"},
            {"clip_id": "junk", "bytes": b"\x00\x01\x02\x03junk", "codec": "mp3"},
            {"clip_id": "tiny", "bytes": b"RI", "codec": "pcm_s16le"},
        ]
    )
    rows = {
        r["clip_id"]: r.asDict()
        for r in codec_container_check(spark.createDataFrame(pdf)).collect()
    }
    assert rows["wav_ok"]["codec_matches"] is True
    assert rows["wav_case"]["codec_matches"] is True  # case/space-insensitive
    assert rows["wav_mis"]["codec_matches"] is False
    assert rows["flac_ok"]["codec_matches"] is True
    assert rows["flac_mis"]["codec_matches"] is False
    # unrecognized containers can't be validated -> NULL (decode pass owns them)
    assert rows["junk"]["container"] is None
    assert rows["junk"]["codec_matches"] is None
    assert rows["tiny"]["codec_matches"] is None


def test_audio_dropouts_planted(spark):
    """Planted runs: interior-only rule (edge silence never counts), the
    min-run cutoff, multiple runs per clip, and the undecodable lane."""
    from seronet_data_validator_spark.operators.qc import audio_dropouts

    rng_i = np.arange(3000, dtype=np.int64)
    active = ((5 * 7919 + rng_i * 104729 + 12345) % 65536) - 32768

    one = active.copy()
    one[500:800] = 0  # one interior run of 300
    multi = active.copy()
    multi[200:400] = 0  # 200 ✓
    multi[900:1060] = 0  # exactly 160 ✓ (boundary)
    multi[1500:1659] = 0  # 159 ✗ (one short of min_run)
    edges = active.copy()
    edges[:400] = 0  # leading — never counts
    edges[-250:] = 0  # trailing — never counts
    clean = active.copy()

    df = _clips_df(
        spark, [("one", one), ("multi", multi), ("edges", edges), ("clean", clean)]
    )
    bad = spark.createDataFrame(
        pd.DataFrame([{"clip_id": "junk", "bytes": b"\x00" * 50}])
    )
    out = {
        r["clip_id"]: r.asDict()
        for r in audio_dropouts(df.unionByName(bad)).collect()
    }
    assert out["one"]["n_dropouts"] == 1
    assert out["one"]["longest_dropout"] == 300
    assert out["one"]["has_dropout"] is True
    assert out["multi"]["n_dropouts"] == 2
    assert out["multi"]["dropout_samples"] == 360
    assert out["multi"]["longest_dropout"] == 200
    assert out["edges"]["n_dropouts"] == 0
    assert out["edges"]["has_dropout"] is False
    assert out["clean"]["n_dropouts"] == 0
    assert out["clean"]["dropout_ratio"] == 0.0
    assert out["junk"]["n_dropouts"] is None
    assert out["junk"]["has_dropout"] is False


def test_stereo_balance_verdicts(spark):
    """Phase flip, dead channel, balance ratio, mono lane, codec agreement
    (same pair through RIFF stereo and mid/side FLAC), and undecodable."""
    from seronet_data_validator_spark.operators.flac import flac_bytes
    from seronet_data_validator_spark.operators.qc import stereo_balance
    from seronet_data_validator_spark.sources.clips import wav_bytes_ex

    i = np.arange(2000, dtype=np.int64)
    left = ((7 * 7919 + i * 104729 + 12345) % 32768) - 16384
    pairs = {
        "indep": np.stack([left, ((i * 7919 + 54321) % 32768) - 16384], axis=1),
        "flip": np.stack([left, -left], axis=1),
        "quiet_r": np.stack([left, left // 4], axis=1),
        "dead_r": np.stack([left, np.zeros_like(left)], axis=1),
    }
    rows = [
        {"clip_id": cid, "bytes": wav_bytes_ex(p.astype(np.int16), 8000)}
        for cid, p in pairs.items()
    ]
    rows.append(
        {
            "clip_id": "flip_flac",
            "bytes": flac_bytes(pairs["flip"], 8000, stereo_mode="mid_side"),
        }
    )
    rows.append({"clip_id": "mono", "bytes": wav_bytes(left.astype(np.int16), 8000)})
    rows.append({"clip_id": "junk", "bytes": b"nope" * 12})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = {r["clip_id"]: r.asDict() for r in stereo_balance(df).collect()}

    assert out["indep"]["n_channels"] == 2
    assert out["indep"]["mono_compatible"] is True
    assert abs(out["indep"]["lr_corr"]) < 0.2
    assert out["flip"]["phase_flipped"] is True
    assert out["flip"]["lr_corr"] == -1.0
    assert out["flip"]["mono_compatible"] is False
    # FLAC lane carries the identical pair -> identical stats
    for f in ("lr_corr", "rms_l", "rms_r", "balance_ratio", "phase_flipped"):
        assert out["flip_flac"][f] == out["flip"][f], f
    assert out["quiet_r"]["balance_ratio"] > 10
    assert out["quiet_r"]["lr_corr"] > 0.99
    assert out["dead_r"]["dead_channel"] is True
    assert out["dead_r"]["balance_ratio"] is None
    assert out["mono"]["n_channels"] == 1
    assert out["mono"]["rms_l"] is None
    assert out["mono"]["phase_flipped"] is False
    assert out["junk"]["n_channels"] is None
    assert out["junk"]["mono_compatible"] is False
