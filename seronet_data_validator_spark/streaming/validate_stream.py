"""Streaming validation: readStream → fused rule pass → foreachBatch sink.

Row-level rules are narrow, so the SAME compiled plan from
plans/compile.compile_ruleset applies unchanged to a streaming DataFrame —
one definition of the rules, two execution modes (the Spark-idiomatic way to
keep batch and streaming semantics identical). Table-level checks that need
a batch view (uniqueness within the batch, referential against a static dim)
run inside foreachBatch on each micro-batch.

At scale this is the continuous-ingestion path: new Iceberg/parquet files
land, availableNow/continuous triggers pick them up, violations append to
the audit table with exactly-once file-sink semantics via the stream
checkpoint.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seronet_data_validator_spark.operators.integrity import (
    duplicate_id_violations,
    referential_violations,
)
from seronet_data_validator_spark.plans.compile import compile_ruleset
from seronet_data_validator_spark.plans.rules import RuleSet
from seronet_data_validator_spark.rulesets import clips_ruleset
from seronet_data_validator_spark.sources.clips import CLIPS_SCHEMA


def stream_validate_clips(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    *,
    ruleset: RuleSet | None = None,
    codec_registry: DataFrame | None = None,
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Continuously validate clip files landing in ``input_path``.

    Returns the StreamingQuery. Violations append to
    ``<output_root>/violations_stream`` parquet; the stream checkpoint lives
    at ``<output_root>/_checkpoint`` (exactly-once per micro-batch).
    """
    rs = ruleset or clips_ruleset()
    reader = spark.readStream.schema(CLIPS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    viol_path = os.path.join(output_root, "violations_stream")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        v = compile_ruleset(batch_df, rs)
        v = v.unionByName(duplicate_id_violations(batch_df, rs.row_ref_column, rs.table_name))
        if codec_registry is not None:
            v = v.unionByName(
                referential_violations(
                    batch_df, codec_registry, "codec", rs.table_name,
                    registry_name="codec_registry", row_ref_column=rs.row_ref_column,
                )
            )
        (
            v.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(viol_path)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(output_root, "_checkpoint"))
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream — the
    late-data-tolerant streaming analog of the batch events_hourly query.
    Works on both streaming and batch DataFrames (same plan)."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )
