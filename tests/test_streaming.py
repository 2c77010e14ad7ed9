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


def test_windowed_event_counts_matches_batch(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(ev, window="1 hour", watermark="2 hours")
    rows = out.collect()
    assert len(rows) > 0
    total = sum(r["n"] for r in rows)
    assert total == ev.count()
