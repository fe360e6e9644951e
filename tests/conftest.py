import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_kafka_project_spark.session import build_session


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end case (minutes, not seconds)"
    )


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
        app_name="etl_kafka_project_spark-tests",
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return str(tmp_path / "table")
