from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from m3spark.session import get_spark

    s = get_spark("m3spark-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
