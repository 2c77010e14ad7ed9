"""Schema contracts (C21 column_validation).

The reference diffs CSV headers against Excel templates by set difference
and GATES the whole submission on any column error
(/root/reference/File_Submission_Object.py:140-168,
Data_Validation_v1.py:160-170). Spark-native: the contract is a declared
StructType diffed against ``df.schema`` — a driver-side metadata operation,
no job. Extra columns are tolerated (warning), missing or type-mismatched
contract columns are gating errors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from seronet_data_validator_spark.model import (
    ROW_REF_WHOLE_COLUMN,
    SEVERITY_ERROR,
    SEVERITY_WARNING,
    VIOLATION_SCHEMA,
)
from seronet_data_validator_spark.sources.clips import CLIPS_SCHEMA

CONTRACTS: dict[str, T.StructType] = {"clips": CLIPS_SCHEMA}


def schema_contract_violations(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    contract: T.StructType | None = None,
    *,
    strict_types: bool = True,
) -> DataFrame | None:
    """None when the contract holds; otherwise a violations DataFrame whose
    presence gates data validation (mirroring the reference's column gate)."""
    contract = contract or CONTRACTS.get(table_name)
    if contract is None:
        return None
    actual = {f.name: f.dataType for f in df.schema.fields}
    rows = []
    for f in contract.fields:
        if f.name not in actual:
            rows.append(
                (SEVERITY_ERROR, table_name, ROW_REF_WHOLE_COLUMN, f.name, "",
                 "C21.schema", "This column is expected and is missing from the table")
            )
        elif strict_types and actual[f.name] != f.dataType:
            rows.append(
                (SEVERITY_ERROR, table_name, ROW_REF_WHOLE_COLUMN, f.name,
                 str(actual[f.name]), "C21.schema",
                 f"Column type {actual[f.name].simpleString()} does not match "
                 f"contract type {f.dataType.simpleString()}")
            )
    for name in actual:
        if name not in {f.name for f in contract.fields}:
            rows.append(
                (SEVERITY_WARNING, table_name, ROW_REF_WHOLE_COLUMN, name, "",
                 "C21.schema", "Column found in table is not expected by the contract")
            )
    errors = [r for r in rows if r[0] == SEVERITY_ERROR]
    if not errors:
        return None
    return spark.createDataFrame(rows, VIOLATION_SCHEMA)
