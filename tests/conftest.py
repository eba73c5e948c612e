import sys

import pytest

sys.path.insert(0, "/root/repo")

from iot_system_plc_data_to_influxdb_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
    s = get_spark("engine-tests")
    yield s
