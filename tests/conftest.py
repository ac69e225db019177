import os
import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from logparse_spark.session import get_spark

    s = get_spark(app_name="logparse_tests", master="local[4]", shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "4g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_sf_small(tmp_path_factory):
    """Small deterministic transcripts fixture dir (t1 smoke scale)."""
    from logparse_spark.fixtures import ensure_fixture

    return ensure_fixture("0.001")
