"""Sources: deterministic synthetic generators + schema-contracted readers.

The reference's sources are CSV/Excel sheets plus an S3 folder protocol
(SURVEY.md §2.1 S1-S4). At the target scale the input is a catalog table of
audio clip + transcript pairs; in the sandbox we synthesize it
deterministically (seeded — no external data) and read/write parquet. The
parquet layout is partition-keyed exactly as an Iceberg table would be, so
the checkpoint/resume and per-partition verdict logic is identical; swapping
``.parquet(path)`` for ``.writeTo(table)`` is the only cluster delta.
"""

from seronet_data_validator_spark.sources.clips import (
    CLIPS_SCHEMA,
    codec_registry_df,
    generate_clips,
)

__all__ = ["CLIPS_SCHEMA", "generate_clips", "codec_registry_df"]
