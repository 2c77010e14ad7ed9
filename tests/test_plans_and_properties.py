"""Physical-plan audits (the 100 TB evidence: pruning, no stray exchanges)
and property-based checks for numeric kernels."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from seronet_data_validator_spark.operators.audio import snr_db
from seronet_data_validator_spark.plans.compile import compile_ruleset
from seronet_data_validator_spark.rulesets import clips_ruleset
from seronet_data_validator_spark.sources.clips import generate_clips


@pytest.fixture(scope="module")
def clips_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plan_audit") / "clips.parquet")
    generate_clips(spark, 500, seed=3).write.parquet(p)
    return p


def test_rules_pass_prunes_bytes_from_scan(spark, clips_parquet):
    """The fused rules pass must NOT read the binary payload: Catalyst column
    pruning keeps `bytes` (>95% of the corpus) on disk. ReadSchema in the
    physical plan is the proof."""
    clips = spark.read.parquet(clips_parquet)
    v = compile_ruleset(clips, clips_ruleset(), keep_columns=("site",))
    plan = v._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    for ln in scan_lines:
        assert "bytes" not in ln, f"rules scan reads the binary column: {ln}"


def test_range_filter_pushes_down(spark, clips_parquet):
    """A rule-style predicate on a scannable column must reach the parquet
    scan as a pushed filter."""
    clips = spark.read.parquet(clips_parquet)
    q = clips.where(F.col("dur_ms") > 600_000).select("clip_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(dur_ms" in plan, plan


def test_audio_fast_path_ipc_columns_are_narrow(spark, clips_parquet):
    """The audio pass's Python boundary must receive the projected narrow
    columns (header/flags), not raw transcript/ref_transcript — transcripts
    are compared JVM-side."""
    from seronet_data_validator_spark.operators.audio import audio_violations
    from seronet_data_validator_spark.sources.clips import reference_clips

    clips = spark.read.parquet(clips_parquet)
    refs = reference_clips(spark, 500, seed=3)
    av = audio_violations(clips, refs)
    plan = av._jdf.queryExecution().analyzed().toString()
    # the mapInArrow input schema is the projection's output
    assert "_payload" in plan and "_full" in plan and "_bad_transcript" in plan


@settings(max_examples=50, deadline=None)
@given(
    data=st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400),
    noise=st.lists(st.integers(min_value=-300, max_value=300), min_size=1, max_size=400),
)
def test_snr_chunked_matches_naive(data, noise):
    """The chunked, scratch-buffer SNR must equal the naive full-array
    float64 formulation to float32 precision."""
    n = min(len(data), len(noise))
    ref = np.array(data[:n], dtype=np.int16)
    test = np.clip(ref.astype(np.int32) + np.array(noise[:n], dtype=np.int32),
                   -32768, 32767).astype(np.int16)
    got = snr_db(ref, test)
    r = ref.astype(np.float64)
    t = test.astype(np.float64)
    p_ref = float(np.dot(r, r))
    p_noise = float(np.dot(r - t, r - t))
    if p_noise == 0.0:
        assert got == np.inf
    elif p_ref == 0.0:
        assert got == -np.inf
    else:
        expected = 10.0 * np.log10(p_ref / p_noise)
        assert abs(got - expected) < 0.05


def test_snr_chunk_boundaries():
    """Clip longer than one scratch chunk: accumulation across chunks."""
    rng = np.random.default_rng(0)
    ref = (rng.normal(0, 8000, 50_000)).astype(np.int16)
    test = (ref.astype(np.int32) + rng.integers(-50, 50, 50_000)).astype(np.int16)
    got = snr_db(ref, test)
    r, t = ref.astype(np.float64), test.astype(np.float64)
    expected = 10.0 * np.log10(np.dot(r, r) / np.dot(r - t, r - t))
    assert abs(got - expected) < 0.02


@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
             min_size=19, max_size=19, unique=True),
)
def test_drift_stats_identity_and_shift(qs):
    """KS and PSI are 0 for identical distributions and strictly positive
    under a large shift; PSI under shift exceeds the 0.2 alert threshold."""
    from seronet_data_validator_spark.operators.stats import (
        ks_from_quantiles,
        psi_from_quantiles,
    )

    q = sorted(qs)
    assert ks_from_quantiles(q, q) == 0.0
    assert abs(psi_from_quantiles(q, q)) < 1e-9
    span = max(q[-1] - q[0], 1.0)
    shifted = [x + 10 * span for x in q]
    assert ks_from_quantiles(shifted, q) > 0.9
    assert psi_from_quantiles(shifted, q) > 0.2


def test_g711_tables_exhaustive_vs_reconstruction_formula():
    """All 256 codes of both G.711 tables against the INDEPENDENT
    segment/mantissa reconstruction formulas (ITU-T G.711 tables 1-2):
    µ-law |x| = 4·(((2m+33)<<seg) − 33); A-law |x| = 8·(2m+1) for seg 0,
    8·(2m+33)·2^(seg−1) otherwise — a different derivation than the
    CCITT shift arithmetic that builds the tables."""
    from seronet_data_validator_spark.operators.audio import _ALAW_TABLE, _ULAW_TABLE

    for code in range(256):
        u = (~code) & 0xFF
        seg, m = (u & 0x70) >> 4, u & 0x0F
        mag = 4 * ((((2 * m) + 33) << seg) - 33)
        expect = -mag if (u & 0x80) else mag
        assert int(_ULAW_TABLE[code]) == expect, f"ulaw {code:#x}"
    for code in range(256):
        a = code ^ 0x55
        seg, m = (a & 0x70) >> 4, a & 0x0F
        mag = 8 * (2 * m + 1) if seg == 0 else 8 * (2 * m + 33) * (1 << (seg - 1))
        expect = mag if (a & 0x80) else -mag
        assert int(_ALAW_TABLE[code]) == expect, f"alaw {code:#x}"
