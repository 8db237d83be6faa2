import os

import pytest

from preql_spark.engine import Engine, default_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # suite fixtures run kilobyte frames: per-task scheduling cost
    # dominates, so the session core count is a wall-time lever
    # (A/B'd in OPTIMIZATION_r15.md), overridable for slow boxes
    # 4 measured fastest on the heavy modules (8: 138 s, 4: 77 s,
    # 2: 118 s on the property trio; the 64-plane LSH test 120->71 s)
    s = default_session("preql_spark_tests",
                        cpus=int(os.environ.get(
                            "SPARK_GRAFT_TEST_CPUS", "4")))
    yield s


@pytest.fixture(scope="session")
def eng(spark):
    return Engine(spark).load_dir(SF_DIR)
