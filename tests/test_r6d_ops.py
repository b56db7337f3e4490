"""Tests for the fourth round-6 work session's operators: CUSUM
change-point detection, Theil-Sen robust trend, per-source boilerplate
templates, DSIR importance selection, and MMR diversified re-ranking.

Strategy mirrors the rest of the suite: pure-Python reconstruction of
each statistic from the fixture tables (the strongest check — it
exercises the whole operator, not a helper), plus planted invariants.
"""

from __future__ import annotations

import duckdb

from vena_etl_tool_spark.operators.timeseries import events_change_point


def _fixture_daily(sf_dir: str) -> list[tuple[str, object, int]]:
    """Exact daily e4 totals via DuckDB (shares the DECIMAL(18,4) cast
    convention with both engines, which a Python float round would not)."""
    return duckdb.sql(
        f"""
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2
        """
    ).fetchall()


def test_change_point_matches_python_cusum(spark, sf_dir):
    """Rebuild the dense grid, the n-scaled CUSUM series, and the argmax
    pick in pure Python big-int arithmetic and require every output
    column to match — including the signed truncated-division shift."""
    daily = _fixture_daily(sf_dir)
    days = sorted({d for _, d, _ in daily})
    d0, d1 = days[0], days[-1]
    n = (d1 - d0).days + 1
    by_type: dict[str, dict[int, int]] = {}
    for et, d, y in daily:
        by_type.setdefault(et, {})[(d - d0).days] = y

    expected = {}
    for et, series in by_type.items():
        s = sum(series.values())
        cum = 0
        best = None  # (abs_c, day_offset, c, rn, cum)
        for o in range(n):
            cum += series.get(o, 0)
            rn = o + 1
            c = n * cum - rn * s
            key = (-abs(c), o)
            if best is None or key < best[0]:
                best = (key, c, rn, cum)
        _, c, rn, cum = best
        pre_days, post_days = rn, n - rn
        pre_sum, post_sum = cum, s - cum
        if post_days == 0:
            shift = None
        else:
            num = post_sum * pre_days - pre_sum * post_days
            den = pre_days * post_days
            sign = -1 if num < 0 else 1
            shift = sign * (abs(num) // den * 1000 + abs(num) % den * 1000 // den)
        expected[et] = (
            n,
            (d0 + __import__("datetime").timedelta(days=rn - 1)),
            c,
            pre_days,
            post_days,
            pre_sum,
            post_sum,
            shift,
        )

    got = {
        r.event_type: (
            r.n_days,
            r.change_day,
            r.cusum_peak,
            r.pre_days,
            r.post_days,
            r.pre_sum_e4,
            r.post_sum_e4,
            r.shift_e4_milli,
        )
        for r in events_change_point(spark, sf_dir).collect()
    }
    assert got == expected
