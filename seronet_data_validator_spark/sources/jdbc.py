"""S4: SQL-table gap-fill source (reference File_Submission_Object.py:812-867).

The reference hydrates missing sheets with ``pd.read_sql`` SELECTs against a
warehouse (``SELECT ... WHERE id IN (...)``). The Spark-native equivalent is
``spark.read.jdbc`` with predicate pushdown: the key filter ships to the
database, and ``numPartitions``/bounds split the pull across executors so a
large gap-fill is not a single-connection bottleneck.

Execution is tested in-sandbox against embedded Apache Derby (its jars ship
with Spark for the Hive metastore): ``tests/test_jdbc_execution.py`` seeds a
Derby database and round-trips keyed, chunked, and partition-fanned pulls
through this function. Against a networked warehouse (PostgreSQL, MySQL, …)
the only extra requirement is that driver jar on the cluster classpath,
exactly as spark-submit deployments provide.
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
    max_keys_per_query: int = 10_000,
    driver: str | None = None,
    dry_run: bool = False,
) -> DataFrame | dict | list[dict]:
    """Pull rows of ``table`` whose ``key_column`` is in ``keys`` over JDBC.

    The IN-filter is folded into the ``dbtable`` subquery so it executes
    database-side (the reference's ``WHERE id IN (...)`` shape,
    File_Submission_Object.py:857-859) — Spark never scans the full table.
    With ``partition_column`` + bounds the read fans out to
    ``num_partitions`` parallel connections.

    An empty ``keys`` list raises (``WHERE key IN ()`` is invalid SQL on
    most databases); key lists beyond ``max_keys_per_query`` are chunked
    into multiple database-side-filtered pulls unioned Spark-side, so no
    single statement exceeds the database's statement-length limit. (At the
    extreme — millions of keys — stage the keys as a temp table and join
    database-side instead; that is a deployment concern, noted here.)

    ``driver`` names the JDBC driver class when the database's driver does
    not self-register via ``java.sql.Driver`` services (Derby embedded needs
    ``org.apache.derby.iapi.jdbc.AutoloadedDriver`` under Spark's isolated
    classloader). ``dry_run=True`` returns the reader options dict (or a
    list of dicts, one per chunk) instead of connecting."""
    if not keys:
        raise ValueError(
            "jdbc_gap_fill requires at least one key: 'WHERE {0} IN ()' is "
            "invalid SQL — skip the gap-fill when there is nothing to fill".format(key_column)
        )

    def _options(chunk: list[str]) -> dict[str, str]:
        quoted = ", ".join("'" + str(k).replace("'", "''") + "'" for k in chunk)
        subquery = f"(SELECT * FROM {table} WHERE {key_column} IN ({quoted})) AS gap_fill"
        opts: dict[str, str] = {"url": url, "dbtable": subquery}
        if driver is not None:
            opts["driver"] = driver
        if partition_column is not None:
            opts.update(
                partitionColumn=partition_column,
                numPartitions=str(num_partitions),
                lowerBound=str(lower_bound if lower_bound is not None else 0),
                upperBound=str(upper_bound if upper_bound is not None else 1_000_000),
            )
        return opts

    chunks = [
        list(keys[i : i + max_keys_per_query])
        for i in range(0, len(keys), max_keys_per_query)
    ]
    all_options = [_options(c) for c in chunks]
    if dry_run:
        return all_options[0] if len(all_options) == 1 else all_options
    dfs = [spark.read.format("jdbc").options(**o).load() for o in all_options]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
