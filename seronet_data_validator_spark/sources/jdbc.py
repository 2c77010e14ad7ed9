"""S4: SQL-table gap-fill source (reference File_Submission_Object.py:812-867).

The reference hydrates missing sheets with ``pd.read_sql`` SELECTs against a
warehouse (``SELECT ... WHERE id IN (...)``). The Spark-native equivalent is
``spark.read.jdbc`` with predicate pushdown: the key filter ships to the
database, and ``numPartitions``/bounds split the pull across executors so a
large gap-fill is not a single-connection bottleneck.

No JDBC driver ships in this sandbox, so ``load()`` is gated: the reader
CONFIGURATION (url, dbtable-as-subquery, pushed key filter, partitioning) is
real and unit-tested via ``dry_run``; executing it requires a driver jar on
the cluster classpath, exactly as spark-submit deployments provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_gap_fill(
    spark: SparkSession,
    url: str,
    table: str,
    key_column: str,
    keys: list[str],
    *,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    dry_run: bool = False,
) -> DataFrame | dict:
    """Pull rows of ``table`` whose ``key_column`` is in ``keys`` over JDBC.

    The IN-filter is folded into the ``dbtable`` subquery so it executes
    database-side (the reference's ``WHERE id IN (...)`` shape,
    File_Submission_Object.py:857-859) — Spark never scans the full table.
    With ``partition_column`` + bounds the read fans out to
    ``num_partitions`` parallel connections.

    ``dry_run=True`` returns the reader options dict instead of connecting
    (sandbox has no JDBC driver)."""
    quoted = ", ".join("'" + str(k).replace("'", "''") + "'" for k in keys)
    subquery = f"(SELECT * FROM {table} WHERE {key_column} IN ({quoted})) AS gap_fill"
    options: dict[str, str] = {"url": url, "dbtable": subquery}
    if partition_column is not None:
        options.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound if lower_bound is not None else 0),
            upperBound=str(upper_bound if upper_bound is not None else 1_000_000),
        )
    if dry_run:
        return options
    return spark.read.format("jdbc").options(**options).load()
