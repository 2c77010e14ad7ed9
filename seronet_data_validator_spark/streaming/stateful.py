"""Custom stateful streaming operators via ``applyInPandasWithState``.

``dropDuplicatesWithinWatermark`` / windowed aggregations cover the built-in
stateful shapes; gap-based sessionization is the canonical semantics Spark
has NO built-in streaming operator for (batch `temporal.sessionize` is two
window functions — a streaming window can't express "gap since the previous
event of this key"). This module implements it with the Arrow-batched
stateful API: per-key state is one (start, last, n) triple, event-time
timeouts close idle sessions, and the watermark bounds state exactly as it
bounds the built-ins.

Scale: state is O(active keys), each a 24-byte triple in the state store —
not O(events). Skewed keys concentrate arrivals, not state. Sessions close
either inline (a later event of the same key arrives > gap after the
previous one — no watermark wait) or by event-time timeout once the
watermark passes last_event + gap, so emission lag is bounded by the
watermark delay.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

SESSION_OUT_SCHEMA = (
    "key long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"  # unix micros


def _sessionize_func(gap_seconds: int, ts_col: str):
    gap_us = gap_seconds * 1_000_000

    def func(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(rows: list[tuple[int, int, int]]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "session_start": pd.to_datetime([r[0] for r in rows], unit="us"),
                    "session_end": pd.to_datetime([r[1] for r in rows], unit="us"),
                    "n_events": [r[2] for r in rows],
                }
            )

        if state.hasTimedOut:
            # watermark passed last_event + gap with no new arrivals:
            # the open session is closed and the key's state evicted.
            start, last, n = state.get
            state.remove()
            yield emit([(start, last, n)])
            return

        times: list[int] = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col]).astype("datetime64[ns]")
            times.extend(ts.astype("int64") // 1_000)
        times.sort()

        start = last = None
        n = 0
        if state.exists:
            start, last, n = state.get
        closed: list[tuple[int, int, int]] = []
        for t in times:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((start, last, n))  # inline close: gap observed
                start, last, n = t, t, 1
            elif t > last:
                last, n = t, n + 1
            else:
                n += 1  # out-of-order within the session span
        state.update((start, last, n))
        # close the still-open session once the watermark passes last + gap;
        # a timeout in the past is illegal, so clamp past the watermark.
        timeout_ms = max(
            (last + gap_us) // 1_000, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield emit(closed)

    return func


def sessionize_stream(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Gap-based sessionization of a STREAMING frame — same semantics as the
    batch `temporal.sessionize` (a session = consecutive events of one key
    with inter-event gaps ≤ gap_seconds), emitted as CLOSED sessions
    (key, session_start, session_end, n_events).

    applyInPandasWithState: state = one (start_us, last_us, n) triple per
    open session; EventTimeTimeout fires when the watermark passes
    last + gap. Late events beyond the watermark may be dropped by the
    engine — the watermark is the lateness contract, exactly as for the
    built-in stateful operators."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            _sessionize_func(gap_seconds, ts_col),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_sessionize(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    schema: StructType | str,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "10 seconds",
    max_files_per_trigger: int | None = None,
    trigger_available_now: bool = True,
):
    """File-source driver for ``sessionize_stream``: closed sessions land in
    ``<output_root>/sessions`` (parquet, append), checkpoint in
    ``<output_root>/_sessions_checkpoint`` — restarts resume per-key state
    from the state store, so a session spanning a restart still closes
    exactly once."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sessions = sessionize_stream(
        reader.parquet(input_path),
        key_col=key_col,
        ts_col=ts_col,
        gap_seconds=gap_seconds,
        watermark=watermark,
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", os.path.join(output_root, "sessions"))
        .option(
            "checkpointLocation", os.path.join(output_root, "_sessions_checkpoint")
        )
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
