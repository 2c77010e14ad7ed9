"""Structured Streaming surface of the engine.

The reference is batch-only (SURVEY.md §2.9): its 'incremental' behavior is
folder/status reprocessing, which the batch engine maps to checkpoint/resume.
This module adds the genuinely-streaming path for continuous ingestion: the
same fused RuleSet applied to a readStream, with violations appended per
micro-batch via foreachBatch (which also runs the table-level checks that
need a batch view), plus watermarked windowed aggregation for event streams.
"""

from seronet_data_validator_spark.streaming.stateful import (
    sessionize_stream,
    stream_sessionize,
)
from seronet_data_validator_spark.streaming.validate_stream import (
    stream_dedup_within_watermark,
    stream_validate_clips,
    windowed_drift,
    windowed_event_counts,
)

__all__ = [
    "sessionize_stream",
    "stream_dedup_within_watermark",
    "stream_sessionize",
    "stream_validate_clips",
    "windowed_drift",
    "windowed_event_counts",
]
