import os

import pytest

from preql_spark.engine import Engine, default_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = default_session("preql_spark_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def eng(spark):
    return Engine(spark).load_dir(SF_DIR)
