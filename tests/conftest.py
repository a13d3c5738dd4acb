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


@pytest.fixture(scope="session", autouse=True)
def _isolated_artifact_root(tmp_path_factory):
    """Point the persistent skew-stats store at a per-run tmp dir so test
    corpora (tmp-path datasets, doctored stores) never leak artifacts
    into the repo's spark-warehouse or poison a later run's warm path."""
    import os

    old = os.environ.get("SPARK_GRAFT_ARTIFACT_DIR")
    os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = str(
        tmp_path_factory.mktemp("artifacts")
    )
    yield
    if old is None:
        os.environ.pop("SPARK_GRAFT_ARTIFACT_DIR", None)
    else:
        os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = old
