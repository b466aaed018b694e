from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from avc_parser_spark.session import get_spark

    s = get_spark(app_name="avc-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
