"""S4 executed for real: jdbc_gap_fill against embedded Apache Derby.

Derby's jars ship with Spark (Hive-metastore dependency), so the JDBC source
can be exercised end-to-end in this sandbox — no network database needed.
Reference semantics: File_Submission_Object.py:812-867 (pd.read_sql gap-fill
with a WHERE id IN (...) key filter).
"""

import pytest

from seronet_data_validator_spark.sources.jdbc import jdbc_gap_fill

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create a Derby database with a 40-row equipment table, return its URL."""
    db_dir = tmp_path_factory.mktemp("derby") / "gapdb"
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE equipment ("
        "biospecimen_id VARCHAR(32) NOT NULL, site VARCHAR(16), reading INT)"
    )
    ps = conn.prepareStatement("INSERT INTO equipment VALUES (?, ?, ?)")
    for i in range(40):
        ps.setString(1, f"BIO_{i:03d}")
        ps.setString(2, f"site_{i % 3}")
        ps.setInt(3, i * 10)
        ps.addBatch()
    ps.executeBatch()
    conn.commit()
    conn.close()
    return f"jdbc:derby:{db_dir}"


def test_jdbc_gap_fill_executes_keyed_pull(spark, derby_url):
    keys = ["BIO_001", "BIO_005", "BIO_017", "BIO_033"]
    df = jdbc_gap_fill(
        spark, derby_url, "equipment", "biospecimen_id", keys,
        driver=DERBY_DRIVER,
    )
    got = sorted(r["BIOSPECIMEN_ID"] for r in df.collect())
    assert got == sorted(keys)


def test_jdbc_gap_fill_chunked_pull_unions(spark, derby_url):
    # 5 keys, 2 per statement -> 3 database-side-filtered pulls unioned.
    keys = [f"BIO_{i:03d}" for i in (0, 7, 14, 21, 28)]
    opts = jdbc_gap_fill(
        spark, derby_url, "equipment", "biospecimen_id", keys,
        max_keys_per_query=2, driver=DERBY_DRIVER, dry_run=True,
    )
    assert isinstance(opts, list) and len(opts) == 3
    df = jdbc_gap_fill(
        spark, derby_url, "equipment", "biospecimen_id", keys,
        max_keys_per_query=2, driver=DERBY_DRIVER,
    )
    got = sorted(r["BIOSPECIMEN_ID"] for r in df.collect())
    assert got == sorted(keys)


def test_jdbc_gap_fill_partitioned_fanout(spark, derby_url):
    # partition_column + bounds split the pull across parallel connections.
    keys = [f"BIO_{i:03d}" for i in range(40)]
    df = jdbc_gap_fill(
        spark, derby_url, "equipment", "biospecimen_id", keys,
        partition_column="reading", num_partitions=4,
        lower_bound=0, upper_bound=400, driver=DERBY_DRIVER,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 40
    sites = {r["SITE"] for r in df.select("SITE").distinct().collect()}
    assert sites == {"site_0", "site_1", "site_2"}
