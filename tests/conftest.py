from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from research_data_pipeline_spark.session import get_spark

    s = get_spark(app="rdp-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
