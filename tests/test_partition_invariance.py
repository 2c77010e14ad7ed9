"""Distributed-correctness properties: operator output must be a pure
function of the DATA, never of its partitioning. On a 1000-executor cluster
the same table arrives under arbitrary splits; any partition-sensitive
result is a silent correctness bug that small single-partition tests miss."""

import pytest
from pyspark.sql import functions as F

from seronet_data_validator_spark.operators import dedup
from seronet_data_validator_spark.runner import validate_clips
from seronet_data_validator_spark.sources.clips import (
    codec_registry_df,
    generate_clips,
    reference_clips,
)


def _violation_multiset(res):
    return sorted(
        (r["severity"], r["table_name"], r["row_ref"], r["column_name"],
         r["column_value"], r["rule_id"], r["message"])
        for r in res.violations.collect()
    )


def test_validate_clips_partition_invariant(spark):
    clips = generate_clips(spark, 500, seed=43, bad=True)
    reg = codec_registry_df(spark)
    refs = reference_clips(spark, 500, seed=43)
    outs = []
    for n_parts in (1, 7):
        res = validate_clips(
            spark, clips.repartition(n_parts), codec_registry=reg,
            reference_clips=refs, run_id=f"pi{n_parts}",
        )
        outs.append((_violation_multiset(res), res.passed,
                     sorted((v["partition_key"], v["pass"], v["n_errors"])
                            for v in res.verdicts)))
    assert outs[0] == outs[1]


def test_exact_duplicates_partition_invariant(spark):
    rows = [(i, f"doc body {i % 37}") for i in range(400)]  # 37 dup groups
    df = spark.createDataFrame(rows, "doc_id long, text string")
    outs = []
    for n_parts in (1, 11):
        out = dedup.exact_duplicates(df.repartition(n_parts), max_dup_ids=5)
        outs.append(sorted(
            (r["content_hash"], r["n"], r["keep_id"], tuple(r["dup_ids"]))
            for r in out.collect()
        ))
    assert outs[0] == outs[1]
    assert len(outs[0]) == 37 and all(t[1] >= 10 for t in outs[0])


def test_minhash_pairs_partition_invariant(spark):
    rows = [(i, "common shared text for the near duplicate family number "
             + str(i % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    outs = []
    for n_parts in (1, 9):
        pairs = dedup.minhash_dedup(df.repartition(n_parts), jaccard_threshold=0.9)
        outs.append(sorted((r["id_a"], r["id_b"], r["jaccard"])
                           for r in pairs.collect()))
    assert outs[0] == outs[1] and outs[0]


def test_connected_components_partition_invariant(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 50)]          # chain 0..50
        + [(100 + i, 100) for i in range(1, 10)],   # star at 100
        "id_a long, id_b long",
    )
    outs = []
    for n_parts in (1, 5):
        comp = dedup.connected_components(pairs.repartition(n_parts))
        outs.append(sorted((r["node"], r["component"]) for r in comp.collect()))
    assert outs[0] == outs[1]
    comps = {c for _, c in outs[0]}
    assert comps == {0, 100}


def test_portable_signatures_partition_invariant(spark):
    """Portable fingerprint/minhash/simhash values are pure functions of the
    text — identical under any partitioning (simhash's vote aggregation and
    the signature folds must not depend on row or token order)."""
    from seronet_data_validator_spark.operators import text

    rows = [(i, f"token{i % 13} alpha beta gamma delta token{i % 7} epsilon zeta")
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    outs = []
    for n_parts in (1, 9):
        d = df.repartition(n_parts)
        fp = {r["doc_id"]: r["fingerprint"]
              for r in text.fingerprint_portable(d).collect()}
        mh = {r["doc_id"]: tuple(r["minhash_sig"]) for r in
              dedup.minhash_signature(dedup.shingles_portable(d), num_hashes=16).collect()}
        sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash_portable(d).collect()}
        outs.append((fp, mh, sh))
    assert outs[0] == outs[1]


def test_round3_operators_partition_invariant(spark):
    """The round-3 additions with any shuffle/driver interplay: exact KS
    (driver bucket offsets), global shuffle rank (two-phase offsets),
    line dedup (corpus-wide counts + reassembly), stratified sample (pure
    hash), survivor selection (window) — all must be pure functions of the
    data under arbitrary partitioning."""
    from seronet_data_validator_spark.operators.dedup import line_dedup, select_survivors
    from seronet_data_validator_spark.operators.sampling import (
        global_sort_rank,
        stratified_sample,
    )
    from seronet_data_validator_spark.operators.stats import ks_two_sample

    rows = [(i, f"grp{i % 3}", float((i * 37) % 101)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, v double")
    docs = spark.createDataFrame(
        [(i, ("shared boilerplate banner line\nunique line %d\nok" % i)
          if i % 2 else "shared boilerplate banner line\nonly this")
         for i in range(40)],
        "doc_id long, text string",
    )
    comp = spark.createDataFrame(
        [(i, i // 4) for i in range(40)], "doc_id long, component long"
    )
    scores = spark.createDataFrame(
        [(i, (i * 13) % 29) for i in range(40)], "doc_id long, n_chars long"
    )

    def snapshots(n_parts):
        d = df.repartition(n_parts)
        ks = ks_two_sample(d, value_col="v",
                           sample_a=F.col("lang") == "grp0", buckets=8).first()
        rank = sorted((r["doc_id"], r["shuffle_rank"])
                      for r in global_sort_rank(d).collect())
        samp = sorted(r["doc_id"] for r in stratified_sample(
            d, strata_col="lang", fractions={"grp0": 0.5},
            default_fraction=0.3).collect())
        ld = sorted((r["doc_id"], r["text"])
                    for r in line_dedup(docs.repartition(n_parts)).collect())
        surv = sorted((r["doc_id"], r["is_survivor"]) for r in select_survivors(
            comp.repartition(n_parts), scores, score_col="n_chars").collect())
        return (ks["ks_d"], ks["n_a"], ks["n_b"]), rank, samp, ld, surv

    assert snapshots(1) == snapshots(13)


def test_audio_basic_features_partition_invariant(spark):
    """Round-4 exact feature pass: byte-identical output under any split —
    the values are the contract (full DuckDB oracle), so even a 1-ULP
    partition sensitivity would break the hash check."""
    import __spark_entry__ as entry_mod
    from seronet_data_validator_spark.operators.dsp import audio_basic_features_exact

    clips = entry_mod._exact_wav_clips(spark, 30)
    outs = []
    for n_parts in (1, 6):
        rows = audio_basic_features_exact(clips.repartition(n_parts)).collect()
        outs.append(sorted(tuple(r) for r in rows))
    assert outs[0] == outs[1]
