"""Typed side-columns replacing the reference's per-cell dynamic coercion.

The reference coerces EVERY cell float→date→str at load
(/root/reference/File_Submission_Object.py:22-34) and rules then branch on
runtime type (isinstance checks at :405,443,446). The Spark-native design
keeps one declared type per column and derives *typed side expressions*:
``as_number(c)`` is non-null exactly when the reference would have seen a
float; ``as_timestamp(c)`` when it would have parsed a date. ``try_cast``
null-on-failure is the Catalyst-friendly analog — no Python, full codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_number(c: Column) -> Column:
    """Numeric view of a string column; NULL where not a number.

    Mirrors convert_data_type's float() attempt, including the reference's
    exemption that values containing '_' stay strings (IDs like '12_345678'
    must NOT count as numbers — File_Submission_Object.py:25-26).
    """
    c = c.cast("string")
    return F.when(~c.contains("_"), c.try_cast("double")).otherwise(F.lit(None))


def is_number(c: Column) -> Column:
    return as_number(c).isNotNull()


def as_timestamp(c: Column) -> Column:
    """Timestamp view; NULL where not a date.

    The reference uses dateutil.parser.parse as fallback
    (File_Submission_Object.py:28-33). We accept the common unambiguous
    forms it sees in practice (ISO date/datetime, US M/D/Y) via a
    try_to_timestamp coalesce chain — declarative, codegen'd.
    """
    c = F.trim(c.cast("string"))
    # Digit guard: a cell with no digit can never parse, and non-date text is
    # the COMMON case in a failing column — without the guard every such cell
    # pays 7 exception-throwing formatter attempts; with it, one regex scan.
    return F.when(
        c.rlike("[0-9]"),
        F.coalesce(
            F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
            F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss")),
            F.try_to_timestamp(c, F.lit("M/d/yyyy")),
            F.try_to_timestamp(c, F.lit("M/d/yyyy H:mm")),
            F.try_to_timestamp(c, F.lit("M/d/yy")),
            F.try_to_timestamp(c, F.lit("HH:mm:ss")),
            F.try_to_timestamp(c, F.lit("H:mm")),
        ),
    )


def is_date(c: Column) -> Column:
    """True when the cell parses as a date AND is not a bare number
    (the reference tries float() first, so '2021' is a number, not a date)."""
    return as_timestamp(c).isNotNull() & as_number(c).isNull()


def flatten_json(df, json_col: str, schema: str, *, prefix: str = ""):
    """Typed flatten of a JSON string column (sidecar metadata, event
    payloads): ``from_json`` with a DECLARED schema — the schema contract
    applies to semi-structured fields exactly as C21 applies to columns;
    fields that fail the declared type parse to NULL, feeding the same
    null-presence rules as any typed column. JVM Jackson parse inside
    codegen — no Python, no schema inference scan (inference reads the
    whole column once and is forbidden on the 10^12-row path).

    Returns df plus one typed column per schema field (``prefix`` guards
    collisions). Keep the raw string column for quarantine/auditing."""
    from pyspark.sql.types import StructType

    struct = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    out = df.withColumn("_j", F.from_json(F.col(json_col), struct))
    for field in struct.fields:
        out = out.withColumn(f"{prefix}{field.name}", F.col(f"_j.{field.name}"))
    return out.drop("_j")
