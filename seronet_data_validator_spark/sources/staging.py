"""Bucketed staging of the synthetic clips corpus for benchmarks.

Why bucketed tables: the audio-invariant pass joins the clips fact table to
the reference table 1:1 on ``clip_id``. On plain parquet that is a shuffle of
the full binary payload on BOTH sides — at 100 TB the shuffle IS the job. The
production design is an Iceberg table bucket-partitioned by ``clip_id`` so
the join is storage-partitioned (no shuffle); the local-mode analog Spark
supports out of the box is a bucketed+sorted saved table, which planner-proves
co-partitioning and yields a zero-Exchange sort-merge join
(``audio_violations`` plan shows no Exchange operator over these tables).

Staging is untimed in benchmarks — it models the pre-existing data lake, not
the engine under test.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from seronet_data_validator_spark.sources.clips import (
    generate_clips,
    reference_clips,
)

DEFAULT_BUCKETS = 32


def stage_conf(stage_dir: str) -> dict[str, str]:
    """Session conf required to create/read the staged tables: a warehouse +
    derby-backed HIVE metastore pinned inside ``stage_dir`` so separate JVMs
    (the N- and 4N-core bench runs) see the same tables sequentially. The
    default in-memory catalog would lose the table entries (and their bucket
    metadata) at JVM exit, silently forcing every subsequent session to
    re-stage the corpus."""
    return {
        "spark.sql.warehouse.dir": os.path.join(stage_dir, "warehouse"),
        "spark.sql.catalogImplementation": "hive",
        "spark.driver.extraJavaOptions": f"-Dderby.system.home={stage_dir}",
    }


def stage_metadata_table(
    spark: SparkSession,
    n_rows: int,
    *,
    seed: int = 42,
    buckets: int = DEFAULT_BUCKETS,
    table_prefix: str = "cpu",
) -> DataFrame:
    """Bucketed clips table with an EMPTY payload column (generate_clips
    payload=False): metadata/transcript values identical to the full fixture
    at the same seed, ~200 B/row on disk instead of ~10 KB. This is the
    input for the compute-bound scaling shape — the metadata/transcript rule
    suite never reads ``bytes`` (the fused pass prunes it), so the staged
    payload would be dead weight measuring the page cache, not the engine."""
    tbl = f"{table_prefix}_clips_{n_rows}_{seed}"
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    loc = os.path.join(wh, tbl)
    if wh and os.path.exists(loc) and not spark.catalog.tableExists(tbl):
        import shutil

        shutil.rmtree(loc)
    if not spark.catalog.tableExists(tbl):
        print(f"[staging] creating table {tbl} ({n_rows} rows)", flush=True)
        (
            generate_clips(spark, n_rows, seed=seed, payload=False)
            .repartition(buckets, "clip_id")
            .write.bucketBy(buckets, "clip_id")
            .sortBy("clip_id")
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    return spark.table(tbl)


def stage_clip_tables(
    spark: SparkSession,
    n_rows: int,
    *,
    seed: int = 42,
    buckets: int = DEFAULT_BUCKETS,
    bad: bool = False,
    table_prefix: str = "bench",
    refs_from_clips: bool | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Write (once) and return the clips + reference tables, both bucketed by
    clip_id. Bucket count is a property of the data layout, not the compute
    level — identical across parallelism levels so N- and 4N-core runs read
    byte-identical inputs.

    ``refs_from_clips`` (default: true when ``bad`` is false): for a clean
    fixture the reference table's content is byte-identical to the clips
    table, so the reference side is a projection of the SAME staged table —
    halves staging disk/time; the join is still a real two-scan
    storage-partitioned merge join. A ``bad`` fixture needs the separate
    uncorrupted table."""
    clips_tbl = f"{table_prefix}_clips_{n_rows}_{seed}{'_bad' if bad else ''}"
    refs_tbl = f"{table_prefix}_refs_{n_rows}_{seed}"
    # a killed run can leave the table dir without a metastore entry —
    # clear the orphaned location so saveAsTable succeeds
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    for tbl in (clips_tbl, refs_tbl):
        loc = os.path.join(wh, tbl)
        if wh and os.path.exists(loc) and not spark.catalog.tableExists(tbl):
            import shutil

            shutil.rmtree(loc)
    # repartition by the bucket key BEFORE the bucketed write: Spark's
    # repartition hash == its bucketing hash, so every bucket lands in
    # EXACTLY ONE file — single-file buckets let the scan report sortedness
    # and the reference join becomes a zero-Exchange, zero-Sort merge join
    # (multi-file buckets would re-Sort both sides per task).
    if not spark.catalog.tableExists(clips_tbl):
        print(f"[staging] creating table {clips_tbl} ({n_rows} rows)", flush=True)
        (
            generate_clips(spark, n_rows, seed=seed, bad=bad)
            .repartition(buckets, "clip_id")
            .write.bucketBy(buckets, "clip_id")
            .sortBy("clip_id")
            .mode("overwrite")
            .saveAsTable(clips_tbl)
        )
    if refs_from_clips is None:
        refs_from_clips = not bad
    from pyspark.sql import functions as F

    if refs_from_clips:
        clips = spark.table(clips_tbl)
        refs = clips.select(
            "clip_id",
            F.col("bytes").alias("ref_bytes"),
            F.col("transcript").alias("ref_transcript"),
        )
        return clips, refs
    if not spark.catalog.tableExists(refs_tbl):
        print(f"[staging] creating table {refs_tbl}", flush=True)
        if bad:
            # bad fixture: reference content differs — generate it afresh
            src = reference_clips(spark, n_rows, seed=seed).repartition(buckets, "clip_id")
        else:
            # clean fixture: the reference CONTENT equals the staged clips
            # table, so derive it by projecting the staged table. The
            # repartition is NOT optional: a plain projection+write scan
            # SPLITS the big bucket files (maxPartitionBytes), and each split
            # writes its own file per bucket — multi-file buckets lose the
            # reported sort order and the reference join regains per-task
            # Sorts. Re-hashing by the bucket key restores exactly one file
            # per bucket (repartition hash == bucketing hash).
            src = spark.table(clips_tbl).select(
                "clip_id",
                F.col("bytes").alias("ref_bytes"),
                F.col("transcript").alias("ref_transcript"),
            ).repartition(buckets, "clip_id")
        (
            src.write.bucketBy(buckets, "clip_id")
            .sortBy("clip_id")
            .mode("overwrite")
            .saveAsTable(refs_tbl)
        )
    return spark.table(clips_tbl), spark.table(refs_tbl)
