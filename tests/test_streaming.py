"""Streaming validation tests: availableNow file-source micro-batches."""

import os

import pytest
from pyspark.sql import functions as F

from seronet_data_validator_spark.sources.clips import (
    codec_registry_df,
    generate_clips,
)
from seronet_data_validator_spark.streaming import (
    stream_validate_clips,
    windowed_event_counts,
)


def test_stream_validate_clips(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    generate_clips(spark, 200, seed=43, bad=True).write.parquet(inp)

    q = stream_validate_clips(
        spark, inp, out, codec_registry=codec_registry_df(spark),
    )
    q.awaitTermination(120)

    viols = spark.read.parquet(os.path.join(out, "violations_stream"))
    counts = {
        (r["rule_id"]): r["count"]
        for r in viols.where(F.col("severity") == "Error").groupBy("rule_id").count().collect()
    }
    # row-level + batch-level checks fire with the seeded counts
    assert counts["C3.clip_id_format"] == 6
    assert counts["C4.dup_id"] == 1
    assert counts["C15.referential"] == 4

    # violations land partitioned by batch_id (dynamic overwrite → a
    # replayed micro-batch overwrites its own partition, not appends)
    viol_parts = [n for n in os.listdir(os.path.join(out, "violations_stream"))
                  if n.startswith("batch_id=")]
    assert viol_parts, "violations_stream must be partitioned by batch_id"

    # exactly-once: restarting the stream over the same files adds nothing
    q2 = stream_validate_clips(spark, inp, out, codec_registry=codec_registry_df(spark))
    q2.awaitTermination(60)
    viols2 = spark.read.parquet(os.path.join(out, "violations_stream"))
    assert viols2.count() == viols.count()


def test_cross_batch_duplicate_detected(spark, tmp_path):
    """A clip_id that arrived in an earlier micro-batch must flag
    C4.cross_batch_dup when it reappears in a later batch — batch-local
    uniqueness alone would silently pass it."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    generate_clips(spark, 50, seed=1).write.parquet(inp)
    q = stream_validate_clips(spark, inp, out)
    q.awaitTermination(120)

    # land 5 clips with the SAME ids (same seed, same row ids) as a new file
    generate_clips(spark, 5, seed=1).coalesce(1).write.mode("append").parquet(inp)
    q2 = stream_validate_clips(spark, inp, out)
    q2.awaitTermination(120)

    viols = spark.read.parquet(os.path.join(out, "violations_stream"))
    cross = viols.where(F.col("rule_id") == "C4.cross_batch_dup")
    assert cross.count() == 5
    assert "earlier micro-batch" in cross.first()["message"]


def test_stream_audio_invariant_pass(spark, tmp_path):
    """With a static reference table, the stream runs the decoded-PCM
    invariant pass per micro-batch — the C13a families the batch runner
    emits appear in the streaming violations too."""
    from seronet_data_validator_spark.sources.clips import reference_clips

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    generate_clips(spark, 200, seed=43, bad=True).write.parquet(inp)
    q = stream_validate_clips(
        spark, inp, out,
        codec_registry=codec_registry_df(spark),
        reference_clips=reference_clips(spark, 200, seed=43),
    )
    q.awaitTermination(120)
    viols = spark.read.parquet(os.path.join(out, "violations_stream"))
    rules = {r["rule_id"] for r in viols.select("rule_id").distinct().collect()}
    assert {"C13a.snr", "C13a.sr_mismatch", "C13a.dur_mismatch",
            "C13a.transcript", "C13a.decode"} <= rules


def test_seen_key_log_compaction_bounded(spark, tmp_path):
    """54 single-file micro-batches with compaction every 8: the seen-key
    log must end as ONE snapshot + a tail bounded by the compaction
    interval — per-batch read volume stays O(interval), not O(history) —
    while still holding every key ever seen. Violations land partitioned by
    batch_id (dynamic overwrite → replay-idempotent)."""
    import glob

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    clips = generate_clips(spark, 216, seed=5)
    clips.repartition(54).write.parquet(inp)
    n_ids = clips.select("clip_id").distinct().count()

    q = stream_validate_clips(
        spark, inp, out, max_files_per_trigger=1, compact_seen_keys_every=8,
    )
    q.awaitTermination(600)

    seen_root = os.path.join(out, "seen_keys")
    snaps = [n for n in os.listdir(seen_root)
             if n.startswith("snap=") and not n.endswith(".tmp")]
    assert len(snaps) == 1, f"exactly one live snapshot expected, got {snaps}"
    tail_files = glob.glob(os.path.join(seen_root, "tail", "*.parquet"))
    assert len(tail_files) <= 8, (
        f"tail must be bounded by the compaction interval, got {len(tail_files)}"
    )
    # no key lost across compactions
    paths = [os.path.join(seen_root, snaps[0])]
    if tail_files:
        paths.append(os.path.join(seen_root, "tail"))
    log = spark.read.schema("clip_id string, batch_id long").parquet(*paths)
    assert log.select("clip_id").distinct().count() == n_ids


def test_stream_dedup_within_watermark(spark, tmp_path):
    """State-store dedup keeps the first arrival per id across micro-batches
    and drops re-arrivals inside the watermark horizon."""
    from seronet_data_validator_spark.streaming import stream_dedup_within_watermark

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    base = generate_clips(spark, 60, seed=5).cache()
    # three landed files: originals, a full duplicate wave, fresh rows —
    # maxFilesPerTrigger=1 forces them into separate micro-batches
    base.coalesce(1).write.parquet(inp)
    base.limit(25).coalesce(1).write.mode("append").parquet(inp)
    fresh = generate_clips(spark, 20, seed=99).coalesce(1)
    fresh.write.mode("append").parquet(inp)

    q = stream_dedup_within_watermark(
        spark, inp, out, watermark="10 minutes", max_files_per_trigger=1
    )
    q.awaitTermination(180)

    got = spark.read.parquet(os.path.join(out, "deduped"))
    n_unique = (
        base.select("clip_id").union(fresh.select("clip_id")).distinct().count()
    )
    assert got.select("clip_id").distinct().count() == n_unique
    # every surviving row is unique — the duplicate wave was dropped
    assert got.count() == n_unique


def test_windowed_event_counts_matches_batch(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(ev, window="1 hour", watermark="2 hours")
    rows = out.collect()
    assert len(rows) > 0
    total = sum(r["n"] for r in rows)
    assert total == ev.count()


def test_windowed_drift_batch_and_stream_agree(spark, tmp_path):
    """PSI per tumbling window: ~0 when the reference profile matches the
    stream, large when shifted; the identical plan runs batch and streaming
    (availableNow) with equal results."""
    from seronet_data_validator_spark.streaming import windowed_drift

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    probs = [i / 10.0 for i in range(1, 10)]  # decile bins: 10 bins over
    ref_q = ev.approxQuantile("value", probs, 0.001)  # ~230-row 7d windows

    matched = windowed_drift(ev, ref_q, probs=probs, window="7 days").collect()
    assert matched and all(not r["drifted"] for r in matched)
    assert max(abs(r["psi"]) for r in matched) < 0.2

    shifted = windowed_drift(
        ev, [q + 1000.0 for q in ref_q], probs=probs, window="7 days"
    ).collect()
    assert shifted and all(r["drifted"] for r in shifted)

    inp = str(tmp_path / "ev")
    ev.write.parquet(inp)
    stream = spark.readStream.schema(ev.schema).parquet(inp)
    q = (
        windowed_drift(stream, ref_q, probs=probs, window="7 days")
        .writeStream.format("memory")
        .queryName("drift_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["n"], r["psi"])
        for r in spark.sql("select * from drift_mem").collect()
    }
    want = {(r["window_start"], r["n"], r["psi"]) for r in matched}
    # append mode emits a window only once the watermark passes its end, so
    # the trailing window stays pending at stream end — everything emitted
    # must match the batch plan exactly
    assert got and got <= want and len(want) - len(got) <= 1


def test_stream_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: inline gap-closure within a
    batch, event-time-timeout closure once the watermark passes, per-key
    state surviving a restart, and agreement with batch sessionize."""
    import datetime

    from seronet_data_validator_spark.operators.temporal import sessionize
    from seronet_data_validator_spark.streaming import stream_sessionize

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    base = datetime.datetime(2024, 1, 1)
    ts = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    schema = "user_id long, ts timestamp"
    rows1 = [(1, ts(0)), (1, ts(10)), (1, ts(2000)), (2, ts(5))]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(inp)
    q = stream_sessionize(spark, inp, out, schema, gap_seconds=1800, watermark="1 seconds")
    q.awaitTermination(120)
    got = {(r["key"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
           for r in spark.read.parquet(out + "/sessions").collect()}
    # user 1's first session closed INLINE by its own 2000s event; user 2's
    # closed by event-time timeout (watermark 1999s > 5s + gap)
    assert (1, "2024-01-01 00:00:00", "2024-01-01 00:00:10", 2) in got
    assert (2, "2024-01-01 00:00:05", "2024-01-01 00:00:05", 1) in got
    # user 1's session at 2000s is still OPEN (watermark has not passed it)
    assert len(got) == 2

    # restart from checkpoint with a far-future event: state is restored,
    # the watermark advances, and the open session closes exactly once
    spark.createDataFrame([(3, ts(100_000))], schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    q2 = stream_sessionize(spark, inp, out, schema, gap_seconds=1800, watermark="1 seconds")
    q2.awaitTermination(120)
    sess = spark.read.parquet(out + "/sessions")
    got2 = {(r["key"], str(r["session_start"]), r["n_events"]) for r in sess.collect()}
    assert (1, "2024-01-01 00:33:20", 1) in got2
    assert len(got2) == 3  # user 3's session is open, never emitted

    # batch parity: closed streaming sessions == batch sessionize sessions
    # for the users whose sessions have all closed (1 and 2)
    batch = spark.createDataFrame(rows1, schema)
    bs = (
        sessionize(batch, key="user_id", ts_col="ts", gap_seconds=1800)
        .groupBy("user_id", "session_idx")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"), F.count("*").alias("n"))
    )
    batch_set = {(r["user_id"], str(r["s"]), str(r["e"]), r["n"]) for r in bs.collect()}
    stream_set = {(r["key"], str(r["session_start"]), str(r["session_end"]),
                   r["n_events"]) for r in sess.where(F.col("key") < 3).collect()}
    assert stream_set == batch_set


def test_stream_qc_pass_matches_batch(spark, tmp_path):
    """run_qc_pass=True in the stream emits the same QC1 verdict rows the
    batch adapter produces over the same input (stream/backfill parity for
    the acceptance family)."""
    import numpy as np

    from seronet_data_validator_spark.operators.qc import qc_violations
    from seronet_data_validator_spark.sources.clips import wav_bytes

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    clips = generate_clips(spark, 80, seed=5, bad=False)
    victim = clips.select("clip_id").orderBy("clip_id").limit(1).collect()[0][0]
    i = np.arange(2000, dtype=np.int64)
    clipped = wav_bytes(
        np.where((i // 8) % 2 == 0, 32767, -32768).astype(np.int16), 8000
    )
    planted = clips.withColumn(
        "bytes",
        F.when(F.col("clip_id") == victim, F.lit(clipped)).otherwise(
            F.col("bytes")
        ),
    )
    planted.write.parquet(inp)

    q = stream_validate_clips(spark, inp, out, run_qc_pass=True)
    q.awaitTermination(120)
    sv = (
        spark.read.parquet(os.path.join(out, "violations_stream"))
        .where(F.col("rule_id").startswith("QC1"))
        .select("severity", "row_ref", "rule_id", "column_value")
    )
    bv = qc_violations(spark.read.parquet(inp)).select(
        "severity", "row_ref", "rule_id", "column_value"
    )
    s_rows = sorted(map(tuple, sv.collect()))
    b_rows = sorted(map(tuple, bv.collect()))
    assert s_rows == b_rows
    assert any(r[1] == victim and r[2] == "QC1.clipped" for r in s_rows)
