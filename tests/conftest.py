import tempfile

import pytest

from seronet_data_validator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    wh = tempfile.mkdtemp(prefix="spark_test_wh_")
    s = get_spark(
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "4g",
            # keep test tables (bucketed staging) out of the repo cwd
            "spark.sql.warehouse.dir": f"{wh}/warehouse",
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={wh}",
        },
    )
    yield s
    s.stop()
