"""Replicates the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare row count
+ order-insensitive values (columns sorted by name, floats rounded)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    res = ddb.execute(oracle)
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count"
    assert normalize(spark_rows, spark_cols) == normalize(ddb_rows, ddb_cols), (
        f"{name}: value mismatch"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
