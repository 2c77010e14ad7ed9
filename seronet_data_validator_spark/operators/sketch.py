"""Mergeable t-digest quantile sketch (Dunning & Ertl, public algorithm).

SURVEY.md §7 names this as the fidelity upgrade over `percentile_approx`
(Greenwald-Khanna): GK bounds RANK error uniformly, a t-digest bounds
RELATIVE-q error — centroids shrink toward q→0/1, so tail quantiles
(p99/p999 — exactly what drift and SLA checks read) are far tighter at the
same memory. The north-star wording ("t-digest quantiles for drift via
KS/PSI") is this operator.

Spark-first layout: the digest is built where the data lives and only
centroids travel —

  1. one narrow `mapInArrow` pass builds ONE digest per partition
     (numpy-vectorized merging pass per Arrow batch; no Python-per-row),
  2. each partition emits ≤ ``delta`` (mean, weight) centroid pairs —
     a few KB — as a single row,
  3. the driver concatenates partition centroids and runs the SAME merge
     pass once more (associative + weight-preserving, so merge order does
     not matter). 10^5 partitions × 200 centroids = 2·10^7 floats at the
     driver — still trivial; for more, insert a tree level with a
     `groupBy(pid % K)` + applyInPandas merge before collecting.

The scale function is k1(q) = δ/(2π)·asin(2q−1): centroid capacity
∝ sqrt(q(1−q)), the standard tail-accurate profile.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _k(q: np.ndarray | float, delta: int) -> np.ndarray | float:
    return delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)


def _k_inv(y: np.ndarray | float, delta: int) -> np.ndarray | float:
    return 0.5 * (1 + np.sin(2 * np.pi * y / delta))


def merge_centroids(
    means: np.ndarray, weights: np.ndarray, delta: int
) -> tuple[np.ndarray, np.ndarray]:
    """One merging pass: sorted centroids greedily combined while the
    combined cluster stays within the k1 size limit. Weight-preserving and
    mean-preserving (weighted average), so repeated merging never loses
    mass — the property that makes partition digests mergeable."""
    if len(means) == 0:
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.argsort(means, kind="stable")
    means = means[order].astype(np.float64)
    weights = weights[order].astype(np.float64)
    total = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    q0 = 0.0
    q_limit = _k_inv(_k(0.0, delta) + 1.0, delta)
    cur_m, cur_w = means[0], weights[0]
    for m, w in zip(means[1:], weights[1:]):
        q = q0 + (cur_w + w) / total
        if q <= q_limit:
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / total
            q_limit = _k_inv(_k(q0, delta) + 1.0, delta)
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def quantile_from_centroids(
    means: np.ndarray,
    weights: np.ndarray,
    probs: list[float],
    *,
    vmin: float | None = None,
    vmax: float | None = None,
) -> list[float]:
    """Standard t-digest inverse-CDF: centroid masses sit at cumulative
    midpoints, linear interpolation between midpoints. ``vmin``/``vmax``
    anchor the curve at (0, min) and (total, max) — without them the
    extreme quantiles clamp to the edge CENTROID means, which are averages
    and bias p999/p001 inward (the classic tail artifact)."""
    if len(means) == 0:
        return [float("nan")] * len(probs)
    total = weights.sum()
    cum = np.cumsum(weights) - weights / 2.0
    xs, ys = cum, means
    if vmin is not None and np.isfinite(vmin):
        xs = np.concatenate([[0.0], xs])
        ys = np.concatenate([[vmin], ys])
    if vmax is not None and np.isfinite(vmax):
        xs = np.concatenate([xs, [total]])
        ys = np.concatenate([ys, [vmax]])
    targets = np.asarray(probs, dtype=np.float64) * total
    return [float(v) for v in np.interp(targets, xs, ys)]


class TDigest:
    """Driver-side accumulator over (means, weights) batches."""

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0)
        self.weights = np.empty(0)
        self.vmin = float("inf")
        self.vmax = float("-inf")

    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> "TDigest":
        """Raw values (weights=None: data extremes update min/max) or
        another digest's centroids (pass its weights AND merge its
        vmin/vmax via merge_from/manually — centroid means are averages,
        not extremes)."""
        w = np.ones_like(values, dtype=np.float64) if weights is None else weights
        if weights is None and len(values):
            self.vmin = min(self.vmin, float(np.min(values)))
            self.vmax = max(self.vmax, float(np.max(values)))
        self.means = np.concatenate([self.means, values.astype(np.float64)])
        self.weights = np.concatenate([self.weights, w])
        # compact opportunistically so memory stays O(delta)
        if len(self.means) > 8 * self.delta:
            self.means, self.weights = merge_centroids(
                self.means, self.weights, self.delta
            )
        return self

    def compress(self) -> "TDigest":
        self.means, self.weights = merge_centroids(
            self.means, self.weights, self.delta
        )
        return self

    def merge_from(self, other: "TDigest") -> "TDigest":
        self.add(other.means, other.weights)
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        return self

    def quantile(self, probs: list[float]) -> list[float]:
        self.compress()
        return quantile_from_centroids(
            self.means, self.weights, probs, vmin=self.vmin, vmax=self.vmax
        )


_DIGEST_SCHEMA = T.StructType(
    [
        T.StructField("means", T.ArrayType(T.DoubleType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
        T.StructField("vmin", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)


def tdigest_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    *,
    delta: int = 200,
) -> list[float]:
    """Distributed t-digest quantiles: per-partition digests (mapInArrow,
    ≤ delta centroids each) merged driver-side. NULLs/NaNs are excluded.
    Returns the quantile estimates for ``probs`` (driver-side floats — the
    sketch path is for profile/drift consumers, not row-level plans)."""
    src = df.select(value_col)

    def build(batches):
        d = TDigest(delta)
        seen = False
        for batch in batches:
            v = batch.column(0).to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            if len(v):
                d.add(v)
                seen = True
        if seen:
            d.compress()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([d.means.tolist()], pa.list_(pa.float64())),
                    pa.array([d.weights.tolist()], pa.list_(pa.float64())),
                    pa.array([d.vmin], pa.float64()),
                    pa.array([d.vmax], pa.float64()),
                ],
                ["means", "weights", "vmin", "vmax"],
            )

    parts = src.mapInArrow(build, schema=_DIGEST_SCHEMA).collect()
    acc = TDigest(delta)
    for row in parts:
        acc.add(np.asarray(row["means"]), np.asarray(row["weights"]))
        acc.vmin = min(acc.vmin, row["vmin"])
        acc.vmax = max(acc.vmax, row["vmax"])
    return acc.quantile(probs)
