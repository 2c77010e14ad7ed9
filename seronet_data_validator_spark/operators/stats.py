"""One-pass column profiling + distribution-drift scoring.

The north_rule requires per-column stats — count, null-rate, min/max,
approx-distinct (HLL), quantile sketch — computed in ONE partition-parallel
aggregation pass, then KS/PSI drift against a stored reference profile.

Design: a single ``df.agg(...)`` emits every statistic for every profiled
column in one job (partial + final hash aggregation; one scan). The wide
one-row result is reshaped to long form (one row per column) with a literal
struct array + explode — a driver-free pivot. ``approx_count_distinct`` is
Spark's HLL++; ``percentile_approx`` is the built-in mergeable quantile
sketch (Greenwald-Khanna) standing in for t-digest per SURVEY.md §4.

Drift (KS/PSI) is pure column math AFTER aggregation — profiles are tiny
(one row per column), so the comparison itself is a driver-side numpy
computation over sketch vectors, exactly as merging t-digests driver-side
would be.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_QUANTILE_GRID = [i / 20.0 for i in range(1, 20)]  # 0.05 .. 0.95


def profile(
    df: DataFrame,
    numeric_columns: list[str],
    string_columns: list[str] | None = None,
    *,
    quantiles: list[float] | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """One-pass profile → long DataFrame:
    (column_name, n, n_null, null_rate, n_blank, min, max, mean,
    distinct_est, quantiles array<double>).

    String columns get count/null/blank/distinct only (min/max/quantiles
    null). Blank = '' — the reference's missing marker
    (/root/reference/File_Submission_Object.py:594-596).
    """
    string_columns = string_columns or []
    qs = quantiles or DEFAULT_QUANTILE_GRID
    total = F.count(F.lit(1))

    aggs: list[Column] = [total.alias("_total")]
    for c in numeric_columns:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__null"),
            F.min(col).cast("double").alias(f"{c}__min"),
            F.max(col).cast("double").alias(f"{c}__max"),
            F.avg(col).alias(f"{c}__mean"),
            F.approx_count_distinct(col).alias(f"{c}__distinct"),
            F.percentile_approx(col.cast("double"), qs, accuracy).alias(f"{c}__q"),
        ]
    for c in string_columns:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__null"),
            F.sum(F.when(col == "", 1).otherwise(0)).alias(f"{c}__blank"),
            F.approx_count_distinct(col).alias(f"{c}__distinct"),
        ]

    wide = df.agg(*aggs)

    structs = []
    for c in numeric_columns:
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__null").alias("n_null"),
                (F.col(f"{c}__null") / F.col("_total")).alias("null_rate"),
                F.lit(None).cast("long").alias("n_blank"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
                F.col(f"{c}__mean").alias("mean"),
                F.col(f"{c}__distinct").alias("distinct_est"),
                F.col(f"{c}__q").alias("quantiles"),
            )
        )
    for c in string_columns:
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__null").alias("n_null"),
                (F.col(f"{c}__null") / F.col("_total")).alias("null_rate"),
                F.col(f"{c}__blank").alias("n_blank"),
                F.lit(None).cast("double").alias("min"),
                F.lit(None).cast("double").alias("max"),
                F.lit(None).cast("double").alias("mean"),
                F.col(f"{c}__distinct").alias("distinct_est"),
                F.lit(None).cast("array<double>").alias("quantiles"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def ks_two_sample(
    df: DataFrame,
    *,
    value_col: str,
    sample_a: Column,
    buckets: int = 1024,
) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic, distributed — the
    precise counterpart to ``ks_from_quantiles``'s sketch approximation
    (drift per SURVEY.md §4; reference drift semantics are whole-column
    distribution checks, /root/reference/Validation_Rules.py:36-44).

    D = max over observed values of |F_A(v) - F_B(v)| where A is the rows
    matching ``sample_a`` and B is the rest. The naive form sorts all values
    through one unpartitioned window; this is the scale-correct two-phase
    plan:

      1. ONE shuffle: groupBy(value) → per-value counts (ca, cb). Partial
         aggregation collapses duplicates map-side; only distinct values
         survive.
      2. range-partition the distinct values into ``buckets`` contiguous
         ranges (repartitionByRange, so bucket order == value order) and
         collect per-bucket totals — ≤ ``buckets`` rows to the driver —
         prefix-summed into per-bucket starting offsets for both samples.
      3. cumulative counts = offset + windowed sum PARTITIONED by bucket
         (parallel, bounded state), then a global max of |ca/n_a - cb/n_b|.

    Returns one row (ks_d, n_a, n_b); ks_d is null if either sample is
    empty. The distinct-value table is localCheckpoint'ed so the driver
    totals pass and the final max share one computed shuffle."""
    v = F.col(value_col).cast("double")
    a_flag = F.when(sample_a, 1).otherwise(0)
    per_value = (
        df.where(v.isNotNull())
        .select(v.alias("_v"), a_flag.alias("_a"))
        .groupBy("_v")
        .agg(
            F.sum("_a").alias("_ca"),
            F.sum(F.lit(1) - F.col("_a")).alias("_cb"),
        )
    )
    parted = (
        per_value.repartitionByRange(buckets, "_v")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = sorted(
        parted.groupBy("_pid")
        .agg(F.sum("_ca").alias("ta"), F.sum("_cb").alias("tb"))
        .collect(),
        key=lambda r: r["_pid"],
    )
    n_a = sum(r["ta"] for r in totals)
    n_b = sum(r["tb"] for r in totals)
    spark = df.sparkSession
    if n_a == 0 or n_b == 0:
        return spark.createDataFrame(
            [(None, n_a, n_b)], "ks_d double, n_a long, n_b long"
        )
    rows, oa, ob = [], 0, 0
    for r in totals:
        rows.append((r["_pid"], oa, ob))
        oa += r["ta"]
        ob += r["tb"]
    from seronet_data_validator_spark.sources.local import local_df

    off_df = local_df(spark, rows, "_pid int, _oa long, _ob long")
    w = Window.partitionBy("_pid").orderBy("_v")
    cum_a = F.col("_oa") + F.sum("_ca").over(w)
    cum_b = F.col("_ob") + F.sum("_cb").over(w)
    d = F.abs(cum_a / F.lit(float(n_a)) - cum_b / F.lit(float(n_b)))
    return (
        parted.join(F.broadcast(off_df), "_pid")
        .select(d.alias("_d"))
        .agg(
            F.round(F.max("_d"), 4).alias("ks_d"),
            F.lit(n_a).cast("long").alias("n_a"),
            F.lit(n_b).cast("long").alias("n_b"),
        )
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    *,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantile report — the drill-down companion to `profile`'s
    whole-column sketch (per-site latency percentiles, per-codec duration
    spread). Default is `percentile_approx` (Greenwald-Khanna: mergeable,
    bounded memory — the only viable mode at 10^12 rows); ``exact=True``
    switches to the exact interpolating `percentile` (linear interpolation
    on order statistics, the same definition as SQL ``quantile_cont``) for
    small groups and oracle parity — it buffers each group's values, so
    keep it off hot paths. One partial-agg shuffle either way."""
    aggs = []
    for p in probs:
        col = (
            F.percentile(F.col(value_col), F.lit(p))
            if exact
            else F.percentile_approx(F.col(value_col), p, accuracy)
        )
        aggs.append(F.round(col, 4).alias(f"p{int(round(p * 100))}"))
    return df.groupBy(group_col).agg(
        F.count(F.col(value_col)).alias("n_rows"), *aggs
    )


def numeric_histogram(
    df: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 20,
) -> DataFrame:
    """Fixed-bin histogram with DECLARED bounds — the distribution view a
    validation report pairs with the quantile sketch (`profile`): equal-width
    bins over [lo, hi), plus explicit underflow (bin -1) and overflow (bin
    ``bins``) rows, so out-of-range mass is visible instead of silently
    clipped — the same philosophy as the range rules' severity rows.

    Declared bounds make it ONE pass (no min/max pre-scan): a single
    partial-agg groupBy over ≤ bins+2 surviving groups, the cheapest
    distribution query that exists at 10^12 rows. NULLs are excluded (the
    null-rate belongs to `profile`). Only non-empty bins are returned —
    join against a `sequence` frame if a dense axis is needed."""
    v = F.col(value_col).cast("double")
    width = (hi - lo) / bins
    bin_ = (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(bins))
        .otherwise(F.floor((v - F.lit(lo)) / F.lit(width)))
        .cast("long")
    )
    out = (
        df.where(v.isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    in_range = (F.col("bin") >= 0) & (F.col("bin") < bins)
    return out.select(
        "bin",
        F.when(in_range, F.round(F.lit(lo) + F.col("bin") * width, 6)).alias("bin_lo"),
        F.when(in_range, F.round(F.lit(lo) + (F.col("bin") + 1) * width, 6)).alias("bin_hi"),
        "n_rows",
    )


def psi_by_group(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-group PSI against the GLOBAL distribution — "which site/codec is
    the drifted one?", the attribution query that follows a whole-column
    drift alarm (`psi_drift` answers IF, this answers WHERE). Declared
    [lo, hi) equal-width bins (same contract as `numeric_histogram`,
    under/overflow folded into the edge bins so every observation counts).

    Plan: ONE shuffle — groupBy(group, bin) partial-agg counts (≤ groups ×
    (bins+2) survivors). Everything after is arithmetic on that tiny frame:
    global bin masses re-aggregated from the counts (not a second scan),
    broadcast back, per-group masses via a window partitioned by group, and
    PSI = Σ (p_g − p_glob)·ln(p_g/p_glob) with eps-clamped masses (the
    same convention as `psi_from_quantiles`). Output: (group, n_rows, psi),
    psi sorted-free — threshold downstream."""
    v = F.col(value_col).cast("double")
    width = (hi - lo) / bins
    bin_ = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("long")
    # one materialization point: counts (≤ groups × bins rows by
    # construction) feeds FOUR consumers (global masses, global total,
    # per-group totals, the dense-grid join) — without the stage boundary
    # each consumer re-scans and re-aggregates the full input.
    counts = (
        df.where(v.isNotNull())
        .groupBy(F.col(group_col).alias("grp"), bin_.alias("_bin"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    glob = counts.groupBy("_bin").agg(F.sum("_c").alias("_gc"))
    glob_tot = glob.agg(F.sum("_gc").alias("_gt"))
    glob = glob.crossJoin(F.broadcast(glob_tot)).select(
        "_bin", (F.col("_gc") / F.col("_gt")).alias("_p_glob")
    )
    # dense (group × bin) grid: a bin where the group has ZERO mass still
    # contributes (eps − p_glob)·ln(eps/p_glob) — dropping it (the sparse
    # join) understates exactly the strongest drift signal
    gn = counts.groupBy("grp").agg(F.sum("_c").alias("_n"))
    dense = gn.crossJoin(F.broadcast(glob)).join(
        counts, ["grp", "_bin"], "left"
    )
    pg = F.greatest(F.coalesce(F.col("_c"), F.lit(0)) / F.col("_n"), F.lit(eps))
    pr = F.greatest(F.col("_p_glob"), F.lit(eps))
    term = (pg - pr) * F.log(pg / pr)
    return (
        dense.groupBy("grp")
        .agg(
            F.max("_n").alias("n_rows"),
            F.round(F.sum(term), 6).alias("psi"),
        )
        .select(F.col("grp").alias(group_col), "n_rows", "psi")
    )


def null_rates_by_group(
    df: DataFrame, group_col: str, columns: list[str]
) -> DataFrame:
    """Per-group completeness matrix — the drill-down behind `profile`'s
    whole-column null_rate: WHICH site/feed sends the nulls (and blanks).
    The reference reports missingness per submission file
    (File_Submission_Object.py:590-622); partitioned tables report it per
    partition key instead.

    ONE partial-agg shuffle (conditional sums fold map-side); long-form
    output (group, column_name, n_rows, n_null, n_blank, null_rate) via
    the literal-struct explode — no second pass, no pivot job."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"_null_{c}")
        )
        aggs.append(
            F.sum(F.when(col.cast("string") == "", 1).otherwise(0)).alias(
                f"_blank_{c}"
            )
        )
    wide = df.groupBy(F.col(group_col).alias("grp")).agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_null"),
            F.col(f"_blank_{c}").alias("n_blank"),
            F.round(F.col(f"_null_{c}") / F.col("_n"), 6).alias("null_rate"),
        )
        for c in columns
    ]
    return (
        wide.select(F.col("grp").alias(group_col), F.explode(F.array(*structs)).alias("p"))
        .select(group_col, "p.*")
    )


def benford_profile(df: DataFrame, value_col: str) -> DataFrame:
    """Leading-digit profile vs Benford's law — the classic fabricated-or-
    truncated-data screen for naturally-spanning numeric columns (amounts,
    durations, counts): organic multi-magnitude data follows
    P(d) = log10(1 + 1/d); manual entry, capped fields, and synthetic
    padding do not. A per-digit report, not a verdict — the deviation
    column feeds whatever threshold the caller's domain justifies (MAD
    > 0.015 is the common audit rule of thumb).

    One partial-agg shuffle over ≤ 9 surviving groups (digit from pure
    column math: d = floor(v / 10^floor(log10 v)) — no string casts), then
    share/expected/deviation arithmetic on the 9-row frame. Zeros and
    NULLs are excluded (no leading digit). Output: (digit, n_rows, share,
    expected, deviation)."""
    v = F.abs(F.col(value_col).cast("double"))
    mag = F.floor(F.log10(v))
    digit = F.floor(v / F.pow(F.lit(10.0), mag)).cast("long")
    # ≤ 9 rows; the boundary stops the totals branch re-scanning the input
    counts = (
        df.where(v.isNotNull() & (v > 0))
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("n_rows").alias("_t"))
    share = F.col("n_rows") / F.col("_t")
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n_rows",
        F.round(share, 6).alias("share"),
        F.round(expected, 6).alias("expected"),
        F.round(F.abs(share - expected), 6).alias("deviation"),
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    *,
    top_n: int = 20,
) -> DataFrame:
    """Hot-key diagnostic for a prospective join/agg key — the measurement
    step in front of the engine's skew mitigations (salted anti-join,
    AQE skew split): the north rule names "explicit skew handling on hot
    clip_id/codec keys", and you can't salt what you haven't measured.

    Output: the ``top_n`` heaviest keys with (key, n_rows, share,
    skew_factor, rnk) where share = n/total and skew_factor = n/mean —
    skew_factor ≫ 1 marks keys that will straggle a hash-partitioned
    stage. Plan: ONE shuffle (partial-agg groupBy count; only distinct
    keys survive), totals via a broadcast one-row cross join (no
    unpartitioned window over the counts), top-N via
    TakeOrderedAndProject (rank materializes only after the limit prunes
    to ``top_n`` rows). NULL keys count as a key — a null-heavy join
    column is the most common real skew. Ties break by key for
    determinism."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.avg("n_rows").alias("_mean"),
    )
    top = (
        counts.orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(top_n)
        .crossJoin(F.broadcast(totals))
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    return top.select(
        "key",
        "n_rows",
        F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
        F.round(F.col("n_rows") / F.col("_mean"), 4).alias("skew_factor"),
        F.row_number().over(w).cast("long").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# Drift: KS / PSI over quantile sketches (post-aggregation column math).
# ---------------------------------------------------------------------------


def ks_from_quantiles(q_curr: list[float], q_ref: list[float],
                      probs: list[float] | None = None) -> float:
    """Approximate two-sample KS statistic from matched quantile grids.

    With quantiles q(p) for p on a shared grid, the CDFs are piecewise-linear
    inverses; KS ≈ max |F_curr(x) - F_ref(x)| evaluated on the union of both
    quantile supports.
    """
    probs = np.asarray(probs or DEFAULT_QUANTILE_GRID, dtype=float)
    qc, qr = np.asarray(q_curr, dtype=float), np.asarray(q_ref, dtype=float)
    support = np.union1d(qc, qr)
    f_curr = np.interp(support, qc, probs, left=0.0, right=1.0)
    f_ref = np.interp(support, qr, probs, left=0.0, right=1.0)
    return float(np.max(np.abs(f_curr - f_ref)))


def psi_from_quantiles(q_curr: list[float], q_ref: list[float],
                       probs: list[float] | None = None, *, eps: float = 1e-6) -> float:
    """Population Stability Index: bin current data by the REFERENCE
    quantile edges (equal-mass bins under the reference), estimate current
    bin mass from the current quantile function, sum (c-r)·ln(c/r)."""
    probs = np.asarray(probs or DEFAULT_QUANTILE_GRID, dtype=float)
    qc, qr = np.asarray(q_curr, dtype=float), np.asarray(q_ref, dtype=float)
    # reference bin edges = its own quantiles; ref mass per bin from the grid
    edges = qr
    ref_mass = np.diff(np.concatenate([[0.0], probs, [1.0]]))
    # current CDF at the reference edges, via the current quantile function
    f_curr_at_edges = np.interp(edges, qc, probs, left=0.0, right=1.0)
    curr_mass = np.diff(np.concatenate([[0.0], f_curr_at_edges, [1.0]]))
    c = np.clip(curr_mass, eps, None)
    r = np.clip(ref_mass, eps, None)
    return float(np.sum((c - r) * np.log(c / r)))


def drift_report(
    current_profile: DataFrame,
    reference_profile: DataFrame,
    *,
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.2,
) -> list[dict]:
    """Join tiny profile frames driver-side and score drift per column.

    Returns [{column_name, ks, psi, null_rate_delta, drifted}] — the input
    frames are one-row-per-column aggregates, so collecting them is O(cols),
    not O(data)."""
    curr = {r["column_name"]: r.asDict() for r in current_profile.collect()}
    ref = {r["column_name"]: r.asDict() for r in reference_profile.collect()}
    out = []
    for name in sorted(set(curr) & set(ref)):
        c, r = curr[name], ref[name]
        ks = psi = None
        if c.get("quantiles") and r.get("quantiles"):
            ks = ks_from_quantiles(c["quantiles"], r["quantiles"])
            psi = psi_from_quantiles(c["quantiles"], r["quantiles"])
        nr_delta = abs((c.get("null_rate") or 0.0) - (r.get("null_rate") or 0.0))
        out.append(
            {
                "column_name": name,
                "ks": ks,
                "psi": psi,
                "null_rate_delta": nr_delta,
                "drifted": bool(
                    (ks is not None and ks > ks_threshold)
                    or (psi is not None and psi > psi_threshold)
                ),
            }
        )
    return out
