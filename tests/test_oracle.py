"""Differential test: every registered query vs its DuckDB oracle.

Mirrors the driver's correctness gate. Runs at sf0.001 by default for
speed; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to run at the
driver's exact scale.
"""

from __future__ import annotations

import pytest

from vena_etl_tool_spark.registry import all_specs
from vena_etl_tool_spark.testing import diff_query, duckdb_connection

_SPECS = all_specs()


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_matches_oracle(name, spark, con, sf_dir):
    res = diff_query(spark, con, _SPECS[name], sf_dir)
    assert res.ok, f"{name}: {res.detail}"
