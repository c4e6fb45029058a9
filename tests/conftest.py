import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # small JVM for tests


@pytest.fixture(scope="session")
def spark():
    from json_schema_modern_spark import get_spark

    s = get_spark(app_name="jsms-tests", extra_conf={"spark.driver.memory": "8g"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
