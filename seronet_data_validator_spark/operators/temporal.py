"""Temporal join operators for event streams.

The as-of join — "for each left row, the most recent right row at or before
its timestamp, per key" — is the workhorse of event/feature alignment
(point-in-time-correct feature lookup, last-heartbeat enrichment). Spark has
no native ASOF JOIN; the naive range-join (``l.ts >= r.ts`` + row_number)
explodes to O(|L|x|R|) per key before pruning. The scalable composition
used here is union + ordered window:

  tag both sides, union them, and take ``last(right_attr, ignorenulls)``
  over a per-key window ordered by (ts, side) — right rows sort BEFORE a
  left row with the same timestamp, giving ``>=`` semantics. ONE shuffle on
  the key, O(|L|+|R|) rows, no range explosion; skew follows the key
  distribution exactly like any keyed window.

The driver contract oracle-checks this composition against DuckDB's NATIVE
``ASOF LEFT JOIN`` — two independent implementations of the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: consecutive events of the same ``key``
    belong to one session while the gap between them stays ≤
    ``gap_seconds``; a longer gap starts a new session. Adds
    ``session_idx`` (0-based per key, in time order).

    The classic two-window composition — ``lag`` to find gap starts, then a
    running sum of start flags — both over the SAME (key, ts) window, so
    Spark plans ONE shuffle + ONE sort for the whole operator. Scales as
    any keyed window: rows per key bound the task, skewed keys behave like
    any groupBy skew (salt upstream if one key dominates)."""
    w = Window.partitionBy(key).orderBy(ts_col)
    # microsecond-exact gap: casting timestamps to long TRUNCATES to whole
    # seconds and misclassifies gaps within 1 s of the threshold
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = micros - F.lag(micros).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy(key).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        "session_idx", (F.sum(new_session).over(run) - 1).cast("long")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    within_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """All (left, right) pairs with the same ``on`` key and
    ``0 <= right.right_ts - left.left_ts <= within_seconds`` — "right events
    within the window AFTER each left event".

    A naive key-equi join with the range predicate makes Spark build every
    same-key pair before filtering (O(|L_k| x |R_k|) per key). This
    composition BUCKETS time by the window length and equi-joins on
    (key, bucket) with the right side exploded into (bucket, bucket+1) —
    any qualifying pair lands in the same or adjacent bucket, so the join
    output per key is bounded by pairs within ~2 windows, then the exact
    predicate filters. The shuffle key gains the bucket, which also SPREADS
    a hot key's rows across buckets instead of one reducer.

    Returns left columns plus the right's (prefixed ``r_``)."""
    lb = left.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(left_ts).cast("timestamp"))
                           / (within_seconds * 1_000_000))
    )
    r_named = right.select(
        F.col(on),
        F.col(right_ts).alias(f"r_{right_ts}"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (on, right_ts)],
    )
    rb = r_named.withColumn(
        "_rbucket", F.floor(F.unix_micros(F.col(f"r_{right_ts}").cast("timestamp"))
                            / (within_seconds * 1_000_000))
    ).withColumn("_bucket", F.explode(F.array(F.col("_rbucket"), F.col("_rbucket") - 1)))
    delta = F.unix_micros(F.col(f"r_{right_ts}").cast("timestamp")) - F.unix_micros(
        F.col(left_ts).cast("timestamp")
    )
    return (
        lb.join(rb, [on, "_bucket"])
        .where((delta >= 0) & (delta <= within_seconds * 1_000_000))
        .drop("_bucket", "_rbucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: "list[str] | None" = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.right_ts <= left.left_ts`` and the same ``on`` key (NULLs when
    no prior right row exists — left-outer as-of semantics).

    ``right_cols`` are the right-side columns to carry (default: all except
    the key and timestamp); they land as ``<prefix><name>``, plus
    ``<prefix><right_ts>`` for the matched timestamp itself.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    carried = [right_ts] + right_cols

    # union layout: left rows keep their columns, right rows contribute the
    # carried attrs as ONE struct — same schema both sides. One struct, not
    # per-column: last(col, ignorenulls) taken independently per column
    # would stitch fields from DIFFERENT right rows whenever the most
    # recent right row has a NULL attribute (skipped for that column only).
    # The struct itself is never null on a right row, so last(struct,
    # ignorenulls) always picks the whole most-recent row.
    r_struct = F.struct(*[F.col(c).alias(c) for c in carried])
    null_struct = F.lit(None).cast(
        "struct<" + ", ".join(
            f"{c}: {right.schema[c].dataType.simpleString()}" for c in carried
        ) + ">"
    )
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c != on],
        null_struct.alias("_r"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
        r_struct.alias("_r"),
    )
    # (ts, side) order: a right row at the SAME timestamp sorts before the
    # left row -> inclusive (<=) as-of semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ats"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col("_r"), ignorenulls=True).over(w)
    enriched = l_tagged.unionByName(r_tagged).select("*", matched.alias("_m"))
    return enriched.where(F.col("_side") == 1).select(
        F.col(on),
        *[F.col(c) for c in left.columns if c != on],
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in carried],
    )


def out_of_order_events(
    df: DataFrame,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Sequence-order QA: rows whose event time goes BACKWARDS relative to
    the previous event of the same key in arrival order (``seq_col`` — an
    ingest-assigned monotone id). Out-of-order arrival is the thing
    watermarks bound; this measures how much of it the pipeline actually
    sees, per key, before choosing a watermark delay.

    One keyed window (shuffle on the key, per-key sort — the same cost
    profile as sessionize); emits (key, seq, ts, prev_ts, late_by_sec).
    """
    w = Window.partitionBy(key).orderBy(seq_col)
    prev = F.lag(F.col(ts_col)).over(w)
    out = df.select(
        F.col(key),
        F.col(seq_col),
        F.col(ts_col),
        prev.alias("prev_ts"),
    ).where(F.col(ts_col) < F.col("prev_ts"))
    # cast: parquet NTZ timestamps are fine — unix_micros wants TIMESTAMP
    micros = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    late = (micros(F.col("prev_ts")) - micros(F.col(ts_col))) / 1e6
    return out.withColumn("late_by_sec", F.round(late, 6))


def time_gaps(
    df: DataFrame,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    min_gap_seconds: float,
) -> DataFrame:
    """Coverage-gap QA: per-key intervals longer than ``min_gap_seconds``
    with no events — the dual of sessionize (a session boundary IS a gap;
    this reports the gap itself, for feeds that promise periodic data).
    Emits (key, gap_start, gap_end, gap_sec); one keyed window."""
    w = Window.partitionBy(key).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    micros = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    gap = (micros(F.col(ts_col)) - micros(prev)) / 1e6
    return (
        df.select(
            F.col(key),
            prev.alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            F.round(gap, 6).alias("gap_sec"),
        )
        .where(F.col("gap_sec") > min_gap_seconds)
    )
