from __future__ import annotations

import os

import pytest

from vena_etl_tool_spark.session import get_spark

# Small fixture dir for fast unit tests; oracle tests use TEST_SF_DIR.
SMOKE_SF_DIR = "/root/testdata/sf0.001"
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR
