import sys

import pytest

sys.path.insert(0, "/root/repo")

from auto_vectordb_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-test-warehouse"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
