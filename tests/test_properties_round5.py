"""Hypothesis property tests for the round-5 surface: FLAC encode/decode
transparency over arbitrary PCM, PNG round trips over arbitrary pixels, and
URL-canonicalization invariance under spelling transforms. These generalize
the fixed-fixture tests the same way test_plans_and_properties.py does for
the rule compiler (SURVEY.md §5 model: property tests back every codec
boundary)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# FLAC: decode(encode(x)) == x for every mode the encoder can emit
# ---------------------------------------------------------------------------

pcm_mono = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=700
)


@settings(max_examples=25, deadline=None)
@given(samples=pcm_mono, lpc_order=st.sampled_from([0, 1, 4, 8]))
def test_flac_mono_roundtrip_any_pcm(samples, lpc_order):
    from seronet_data_validator_spark.operators.flac import decode_flac, flac_bytes

    x = np.array(samples, np.int16)
    blob = flac_bytes(x, 8000, block_size=256, lpc_order=lpc_order)
    got, sr = decode_flac(blob)
    assert sr == 8000
    assert np.array_equal(got, x)


@settings(max_examples=15, deadline=None)
@given(
    samples=st.lists(
        st.tuples(
            st.integers(min_value=-32768, max_value=32767),
            st.integers(min_value=-32768, max_value=32767),
        ),
        min_size=1,
        max_size=400,
    ),
    mode=st.sampled_from(["independent", "left_side", "right_side", "mid_side"]),
)
def test_flac_stereo_roundtrip_any_pcm(samples, mode):
    from seronet_data_validator_spark.operators.flac import (
        decode_flac_full,
        flac_bytes,
    )

    x = np.array(samples, np.int16)
    blob = flac_bytes(x, 16000, block_size=128, stereo_mode=mode)
    got, sr = decode_flac_full(blob)
    assert sr == 16000 and got.shape == x.shape
    assert np.array_equal(got, x)


# ---------------------------------------------------------------------------
# PNG: lossless for arbitrary RGB pixel data
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    data=st.data(),
)
def test_png_roundtrip_any_pixels(w, h, data):
    from seronet_data_validator_spark.operators.png import decode_png, png_bytes

    flat = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=w * h * 3,
            max_size=w * h * 3,
        )
    )
    px = np.array(flat, np.uint8).reshape(h, w, 3)
    gw, gh, got = decode_png(png_bytes(px))
    assert (gw, gh) == (w, h)
    assert np.array_equal(got, px)


# ---------------------------------------------------------------------------
# URL canonicalization: spelling transforms never change the canonical form
# ---------------------------------------------------------------------------

label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-") and not s.startswith("www")
)
pkey = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=5).filter(
    lambda s: s not in ("fbclid", "gclid", "msclkid") and not s.startswith("utm_")
)


@st.composite
def url_parts(draw):
    scheme = draw(st.sampled_from(["http", "https"]))
    host = ".".join(draw(st.lists(label, min_size=2, max_size=3)))
    path = "".join("/" + draw(label) for _ in range(draw(st.integers(0, 3))))
    params = sorted(
        f"{k}={v}"
        for k, v in draw(
            st.dictionaries(pkey, st.integers(0, 99), min_size=0, max_size=4)
        ).items()
    )
    return scheme, host, path, params


@settings(max_examples=40, deadline=None)
@given(parts=url_parts(), data=st.data())
def test_canonicalization_invariant_under_spelling(spark, parts, data):
    """Apply a random pile of spelling transforms (case, www., shown default
    port, trailing slash, tracking params, param order, fragment) to a base
    URL; every variant must canonicalize to the canonical form of the base,
    and canonicalization must be a fixpoint."""
    from seronet_data_validator_spark.operators.web import canonicalize_url

    scheme, host, path, params = parts
    url = scheme + "://" + host + path + ("?" + "&".join(params) if params else "")
    # -- spelling transforms (semantics-preserving under the documented rules)
    if data.draw(st.booleans()):
        scheme = scheme.upper()
    if data.draw(st.booleans()):
        host = "WWW." + host.upper()
    if data.draw(st.booleans()):
        host += ":443" if scheme.lower() == "https" else ":80"
    if data.draw(st.booleans()):
        path += "/" * data.draw(st.integers(1, 3))
    params = list(params)
    if data.draw(st.booleans()):
        params.append("utm_source=" + data.draw(st.sampled_from("abc")))
        data.draw(st.randoms()).shuffle(params)
    variant = scheme + "://" + host + path + ("?" + "&".join(params) if params else "")
    if data.draw(st.booleans()):
        variant += "#frag"

    df = spark.createDataFrame([(url,), (variant,)], "url string")
    base_c, var_c = [
        r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()
    ]
    assert var_c == base_c, f"{variant!r} -> {var_c!r}, expected {base_c!r}"
    # fixpoint
    df2 = spark.createDataFrame([(base_c,)], "url string")
    again = df2.select(canonicalize_url("url").alias("c")).collect()[0]["c"]
    assert again == base_c


# ---------------------------------------------------------------------------
# Session-4 QC/augmentation family properties
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_normalize_transcript_idempotent(spark, texts):
    """normalize(normalize(x)) == normalize(x): after one pass only
    [a-z0-9' ] and single spaces remain, so a second pass is a no-op."""
    import pandas as pd

    from seronet_data_validator_spark.operators.text import normalize_transcript

    pdf = pd.DataFrame(
        [{"clip_id": f"p{i}", "transcript": t} for i, t in enumerate(texts)]
    )
    once = normalize_transcript(spark.createDataFrame(pdf)).collect()
    pdf2 = pd.DataFrame(
        [
            {"clip_id": r["clip_id"], "transcript": r["norm_transcript"]}
            for r in once
        ]
    )
    twice = normalize_transcript(spark.createDataFrame(pdf2)).collect()
    a = {r["clip_id"]: (r["norm_transcript"], r["n_norm_tokens"]) for r in once}
    b = {r["clip_id"]: (r["norm_transcript"], r["n_norm_tokens"]) for r in twice}
    assert a == b


@settings(max_examples=8, deadline=None)
@given(
    sig=st.lists(
        st.integers(min_value=-16000, max_value=16000), min_size=50, max_size=400
    ),
    nz=st.lists(
        st.sampled_from([-1000, -800, -600, 600, 800, 1000]),
        min_size=20,
        max_size=60,
    ),
    ratio=st.sampled_from([2.0, 10.0]),
)
def test_mix_at_snr_achieves_ratio(spark, sig, nz, ratio):
    """The added noise component's RMS lands within the 0.5 rounding bound
    of rms_signal / ratio (reverse triangle inequality on the per-sample
    floor(+0.5) quantization), and with the bounded fixture no sample
    clamps — so decode(mixed) - signal recovers the component exactly."""
    import pandas as pd

    from seronet_data_validator_spark.operators.augment import mix_at_snr
    from seronet_data_validator_spark.operators.audio import _decode_view
    from seronet_data_validator_spark.sources.clips import wav_bytes

    s = np.array(sig, np.int64)
    s[0] = 12000  # guarantee a nonzero signal
    clips = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "clip_id": "p",
                    "bytes": wav_bytes(s.astype(np.int16), 8000),
                    "noise_id": 0,
                }
            ]
        )
    )
    bank = spark.createDataFrame(
        pd.DataFrame(
            [{"noise_id": 0, "bytes": wav_bytes(np.array(nz, np.int16), 8000)}]
        )
    )
    row = mix_at_snr(clips, bank, ratio=ratio).collect()[0]
    assert row["clipped_samples"] == 0
    mixed, _sr = _decode_view(np.frombuffer(bytes(row["bytes"]), np.uint8))
    add = mixed.astype(np.int64) - s
    rms_s = float(np.sqrt(np.dot(s, s) / len(s)))
    rms_add = float(np.sqrt(np.dot(add, add) / len(add)))
    assert abs(rms_add - rms_s / ratio) <= 0.51


@settings(max_examples=8, deadline=None)
@given(
    sig=st.lists(
        st.integers(min_value=-12000, max_value=12000),
        min_size=300,
        max_size=600,
    )
)
def test_pitch_lag_negation_invariant(spark, sig):
    """r(L) = sum(s_i * s_{i+L}) is invariant under s -> -s, so the whole
    pitch row (lag, correlations, periodicity) must match exactly."""
    import pandas as pd

    from seronet_data_validator_spark.operators.dsp import pitch_lag_exact
    from seronet_data_validator_spark.sources.clips import wav_bytes

    s = np.array(sig, np.int64)
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {"clip_id": "pos", "bytes": wav_bytes(s.astype(np.int16), 8000)},
                {"clip_id": "neg", "bytes": wav_bytes((-s).astype(np.int16), 8000)},
            ]
        )
    )
    rows = {
        r["clip_id"]: r.asDict()
        for r in pitch_lag_exact(df, min_lag=8, max_lag=60).collect()
    }
    pos, neg = rows["pos"], rows["neg"]
    for k in ("best_lag", "r_best", "r_zero", "periodicity"):
        assert pos[k] == neg[k]
