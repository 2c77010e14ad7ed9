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
from pyspark.sql import Column, DataFrame
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
