from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from aws_lakehouse_project_spark.session import build_session

    spark = build_session(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
