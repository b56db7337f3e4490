"""Invariant tests for the third round-11 work session's operators
(oracle hash checks run in test_oracle.py / the driver; these pin the
semantics the hash can't see)."""

from __future__ import annotations

import hashlib

import pytest


def _sdiv(num: int, den: int) -> int:
    """Sign-safe integral division (the operators' tau_milli convention)."""
    if den == 0:
        return 0
    mag = abs(num) // den
    return mag if num >= 0 else -mag


def _ab_variant(uid: int) -> str:
    h = int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:12], 16)
    return "A" if h % 2 == 0 else "B"


def test_did_reproduces_from_pure_python(spark, sf_dir):
    """Recompute the whole DiD readout with exact python ints from the
    same parquet (a third engine) and require equality with every emitted
    cell — plus the defining DiD identity: the lift row's estimate equals
    ((dB)*nA - (dA)*nB) * 1000 / (nA*nB) with exact integer deltas."""
    import duckdb

    from vena_etl_tool_spark.operators.analytics import events_did_readout

    rows = {r.variant: r for r in events_did_readout(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "B-A"}

    con = duckdb.connect()
    per_user = con.execute(
        f"""
        WITH b AS (SELECT (CAST(floor(epoch(MIN(ts))) AS BIGINT)
                           + CAST(floor(epoch(MAX(ts))) AS BIGINT)) // 2 AS mid_s
                   FROM '{sf_dir}/events.parquet')
        SELECT user_id,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    AND CAST(floor(epoch(ts)) AS BIGINT) <= b.mid_s
                    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0),
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    AND CAST(floor(epoch(ts)) AS BIGINT) > b.mid_s
                    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
        FROM '{sf_dir}/events.parquet' CROSS JOIN b
        GROUP BY user_id, b.mid_s
        """
    ).fetchall()

    stats: dict[str, tuple[int, int, int]] = {}
    for v in ("A", "B"):
        grp = [(x, y) for uid, x, y in per_user if _ab_variant(uid) == v]
        n_v = len(grp)
        sx_v = sum(x for x, _ in grp)
        sy_v = sum(y for _, y in grp)
        stats[v] = (n_v, sx_v, sy_v)
        r = rows[v]
        assert (r.n_users, r.pre_cents, r.post_cents) == (n_v, sx_v, sy_v)
        assert r.pre_per_user_cents == sx_v // n_v
        assert r.post_per_user_cents == sy_v // n_v
        assert r.delta_per_user_milli == _sdiv((sy_v - sx_v) * 1000, n_v)

    n_a, sx_a, sy_a = stats["A"]
    n_b, sx_b, sy_b = stats["B"]
    lift = rows["B-A"]
    assert lift.n_users == n_b - n_a
    assert lift.pre_cents == sx_b - sx_a
    assert lift.post_cents == sy_b - sy_a
    did = _sdiv(((sy_b - sx_b) * n_a - (sy_a - sx_a) * n_b) * 1000, n_a * n_b)
    assert lift.delta_per_user_milli == did
    # discriminating power at the gate SF: both periods carry real money
    assert sx_a + sx_b > 0 and sy_a + sy_b > 0


def test_did_agrees_with_cuped_population(spark, sf_dir):
    """The two experiment readouts share the assignment and the split:
    per-variant user counts and (pre, post) cents totals must agree with
    events_cuped_adjust's (x, y) columns row for row."""
    from vena_etl_tool_spark.operators.analytics import (
        events_cuped_adjust,
        events_did_readout,
    )

    did = {r.variant: r for r in events_did_readout(spark, sf_dir).collect()}
    cuped = {r.variant: r for r in events_cuped_adjust(spark, sf_dir).collect()}
    for v in ("A", "B", "B-A"):
        assert did[v].n_users == cuped[v].n_users
        assert did[v].pre_cents == cuped[v].x_cents
        assert did[v].post_cents == cuped[v].y_cents
