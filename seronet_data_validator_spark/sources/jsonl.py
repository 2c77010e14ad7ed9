"""JSONL (newline-delimited JSON) source with quarantine routing.

Web-scale corpora ship as JSONL shards; the ingestion contract mirrors the
engine's CSV/staging path: a DECLARED schema (inference is a full extra
scan and is forbidden on the 10^12-row path), PERMISSIVE parsing so one
bad shard never kills the job, and the malformed lines ROUTED — not
dropped — into a quarantine frame carrying the raw line for triage, the
same philosophy as the violation sink (bad data is evidence, not noise).

Spark-first: `spark.read.json` with `columnNameOfCorruptRecord` does the
parse JVM-side (Jackson inside codegen); the split into (clean,
quarantine) is two filters over ONE cached-at-the-source scan — no Python,
no second parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL shards against a declared schema → (clean, quarantine).

    clean: rows where every declared field parsed (fields MISSING from a
    line surface as NULLs — the null-presence rules decide severity).
    quarantine: (raw_line) for lines PERMISSIVE mode marks corrupt —
    syntactic garbage AND lines whose present fields mismatch the declared
    type (Spark fills the corrupt column for both): the raw line is kept
    verbatim for triage/re-parse, the same bad-data-is-evidence philosophy
    as the violation sink."""
    struct = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    if CORRUPT_COL not in [f.name for f in struct.fields]:
        struct = struct.add(CORRUPT_COL, StringType())
    raw = (
        spark.read.schema(struct)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark requires caching/materializing the parsed frame before
    # filtering on the corrupt column (the parser would otherwise prune
    # the data columns and re-parse inconsistently — documented Spark
    # behavior); the source scan is the natural boundary.
    raw = raw.cache()
    clean = raw.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine
