"""Deterministic sampling operators for training-data pipelines.

Splits and quotas must be REPRODUCIBLE — rerunning the pipeline (or
recomputing a split in another engine for audit) has to assign every row
the same way. Both operators here are pure functions of the data:

* ``deterministic_split`` — hash-based train/val/test assignment from the
  row's id via the engine-portable Karp-Rabin hash (text.portable_token_hash),
  so the exact assignment is recomputable outside Spark (the driver
  contract's DuckDB oracle does). No RNG, no ordering dependence, stable
  under repartitioning and incremental reruns: a row's split never changes
  when other rows are added or removed.

* ``per_key_cap`` — per-key quotas (e.g. at most N documents per domain /
  language / source, best-first), the standard pretraining-mix lever.
  One keyed window; ties broken deterministically by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seronet_data_validator_spark.operators.text import portable_token_hash

_SPLIT_BUCKETS = 10_000


def deterministic_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    fractions: "dict[str, float] | None" = None,
) -> DataFrame:
    """Assign each row a split label from a hash of its id.

    ``fractions`` maps label → fraction (must sum to ≤ 1; any remainder
    falls into the LAST label). Assignment: bucket =
    affine(KarpRabin(id)) mod 10000, labels own contiguous bucket ranges
    in dict order. The affine scramble (a*h + b mod p) matters: short
    numeric ids produce CLUSTERED polynomial hashes (a 3-digit id's hash
    spans only ~12k values), which would starve the small splits; the
    multiplicative step spreads any clustered input across the bucket
    space. Adds ``split: string``."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    h = portable_token_hash(F.col(id_col).cast("string"))
    bucket = ((h * 1_103_515_245 + 12_345) % 1_000_000_007) % _SPLIT_BUCKETS
    expr = None
    upper = 0
    labels = list(fractions)
    for lab in labels[:-1]:
        upper += int(round(fractions[lab] * _SPLIT_BUCKETS))
        cond = bucket < upper
        expr = F.when(cond, lab) if expr is None else expr.when(cond, lab)
    last = F.lit(labels[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def per_key_cap(
    df: DataFrame,
    *,
    key: str,
    n: int,
    order_by: str,
    descending: bool = True,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``n`` rows per ``key``, best-first by ``order_by``
    (ties broken by ``id_col`` ascending — deterministic under any
    partitioning). One keyed window shuffle; per-key state is the sort of
    that key's rows, exactly like any groupBy — salt upstream if one key
    dominates the corpus."""
    order = [
        F.col(order_by).desc() if descending else F.col(order_by).asc(),
        F.col(id_col).asc(),
    ]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= n)
        .drop("_rank")
    )


def pack_documents(
    df: DataFrame,
    *,
    budget_tokens: int,
    group_col: str | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (the pretraining
    sequence-packing primitive): documents are laid out in deterministic
    ``id_col`` order (per ``group_col`` when given) and a document joins
    the pack its START offset falls into — ``pack_id =
    floor(preceding_tokens / budget)``. Adds ``pack_id`` and
    ``pack_offset`` (token offset of the doc within the running layout).

    This start-offset rule is a single window (ONE shuffle, running sum) —
    unlike exact greedy first-fit, whose reset-accumulator recurrence is
    inherently sequential per group. The trade: a pack can overflow its
    budget by at most ONE document (the straddler that started inside it),
    which downstream packing consumers handle by truncation or spill —
    the standard streaming-layout compromise.

    At scale ALWAYS pass ``group_col`` (split/source/shard): without it the
    running sum is a single global window — one partition holds the whole
    corpus. Grouped, each group's layout is independent and distributes."""
    parts = [group_col] if group_col else []
    w = (
        Window.partitionBy(*parts).orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    preceding = cum - F.col(tokens_col)
    return df.withColumn("pack_offset", preceding.cast("long")).withColumn(
        "pack_id", F.floor(preceding / budget_tokens).cast("long")
    )


def weighted_mix(
    df: DataFrame,
    *,
    group_col: str,
    weights: "dict[str, float]",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic downsampling so the kept rows' group proportions match
    the target ``weights`` — the pretraining corpus-mix lever ("30% web,
    30% code, 40% books").

    No group is upsampled: with n_g rows per group and target weight w_g,
    the keep rate is r_g = w_g * K / n_g where K = min_g(n_g / w_g) — the
    largest total for which every group can meet its share. A row is kept
    when its id's affine-scrambled Karp-Rabin bucket (an independent salt
    from deterministic_split's) falls under r_g: reproducible in any
    engine, stable under reruns, partition-invariant. Group sizes come
    from one aggregation joined back broadcast (the group dimension is
    small by construction — it is the mix axis)."""
    groups = list(weights)
    counts = (
        df.where(F.col(group_col).isin(groups))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in weights.items() for x in kv]),
        F.col(group_col),
    )
    k_min = counts.select(F.min(F.col("_n") / w_expr).alias("_k"))
    rates = counts.crossJoin(F.broadcast(k_min)).select(
        group_col, ((w_expr * F.col("_k")) / F.col("_n")).alias("_rate")
    )
    h = portable_token_hash(F.concat(F.lit("mix:"), F.col(id_col).cast("string")))
    bucket = ((h * 1_103_515_245 + 12_345) % 1_000_000_007) % _SPLIT_BUCKETS
    return (
        df.join(F.broadcast(rates), group_col)
        .where(bucket < F.col("_rate") * _SPLIT_BUCKETS)
        .drop("_rate")
    )


def global_sort_rank(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    buckets: int = 1024,
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic corpus shuffle order: a dense 1-based global rank in
    scrambled-hash order — the "shuffle the corpus once, reproducibly"
    primitive for fixing a training data order.

    The naive form (`row_number() OVER (ORDER BY hash)`) is an
    unpartitioned window: every row flows through ONE task. This is the
    scale-correct two-phase equivalent:

      1. range-bucket each row by its scrambled hash (bucket = hkey //
         width, so buckets are contiguous hash ranges and bucket order ==
         global order),
      2. count rows per bucket — ≤ ``buckets`` longs to the driver —
         and prefix-sum the counts into per-bucket starting offsets,
      3. rank = offset(bucket) + row_number within the bucket (a window
         PARTITIONED by bucket: parallel, bounded state).

    Rank is a pure function of the id set (Karp-Rabin hash + the same
    affine scramble as deterministic_split; ties broken by id), so it is
    partition-invariant and recomputable outside Spark — the driver
    contract's DuckDB oracle replays it with a plain ordered row_number.

    At the 10^12-row scale the driver holds ``buckets`` counts, each
    window task holds one bucket (~N/buckets rows) — raise ``buckets`` so
    a bucket fits an executor; hash uniformity keeps them balanced."""
    p = 1_000_000_007
    h = portable_token_hash(F.col(id_col).cast("string"))
    hkey = (h * 1_103_515_245 + 12_345) % p
    width = (p + buckets - 1) // buckets
    keyed = df.withColumn("_hkey", hkey).withColumn(
        "_bucket", (F.col("_hkey") / width).cast("long")
    )
    # stage boundary: the bucket-count pass AND the ranked output both read
    # `keyed` — without it the whole upstream plan (possibly a multi-join
    # curation pipeline) executes twice. The materialization costs one
    # shuffle-write-equivalent, the same boundary a sort would create.
    keyed = keyed.localCheckpoint(eager=True)
    counts = keyed.groupBy("_bucket").count().collect()
    offsets, acc = {}, 0
    for row in sorted(counts, key=lambda r: r["_bucket"]):
        offsets[row["_bucket"]] = acc
        acc += row["count"]
    spark = df.sparkSession
    from seronet_data_validator_spark.sources.local import local_df

    off_df = local_df(
        spark, [(b, o) for b, o in offsets.items()], "_bucket long, _offset long"
    )
    w = Window.partitionBy("_bucket").orderBy(
        F.col("_hkey").asc(), F.col(id_col).asc()
    )
    return (
        keyed.join(F.broadcast(off_df), "_bucket")
        .withColumn(rank_col, F.col("_offset") + F.row_number().over(w))
        .drop("_hkey", "_bucket", "_offset")
    )


def stratified_sample(
    df: DataFrame,
    *,
    strata_col: str,
    fractions: "dict[str, float]",
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep each row with its stratum's
    fraction (e.g. downsample boilerplate-heavy sources, keep all of a rare
    language) — the per-GROUP rate lever next to ``deterministic_split``'s
    global one. Strata absent from ``fractions`` use ``default_fraction``.

    Like ``deterministic_split``, membership is a pure function of the id:
    bucket = affine(KarpRabin(id)) mod 10000, keep iff bucket <
    fraction*10000 — reproducible under reruns/repartitioning, auditable in
    any engine, and a row KEPT at fraction f stays kept at every fraction
    >= f (nested samples for ablations). The affine constants differ from
    deterministic_split's so sample membership is independent of split
    assignment. One narrow filter — no shuffle, no RNG, no sampleBy (whose
    Bernoulli draw is partition-order dependent)."""
    h = portable_token_hash(F.col(id_col).cast("string"))
    bucket = ((h * 69_069 + 1) % 1_000_000_007) % _SPLIT_BUCKETS
    thresh = None
    for lab, frac in fractions.items():
        cond = F.col(strata_col) == lab
        t = F.lit(int(round(frac * _SPLIT_BUCKETS)))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    default_t = F.lit(int(round(default_fraction * _SPLIT_BUCKETS)))
    thresh = default_t if thresh is None else thresh.otherwise(default_t)
    return df.where(bucket < thresh)
