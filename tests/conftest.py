from __future__ import annotations

import pytest

from vector_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="vector_spark_tests", cores=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def events(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


@pytest.fixture(scope="session")
def docs_table(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
