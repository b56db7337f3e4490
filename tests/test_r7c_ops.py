"""Fourth round-7 work session operators: rolling median, MAD anomaly
flags, Theil-Sen robust trend.

Strategy mirrors test_r6d_ops.py: the differential gate already
hash-proves each operator against its DuckDB oracle at 3 SFs, so these
tests (a) rebuild each statistic in pure Python from the fixture tables
(catching an oracle that is wrong the same way the Spark side is), and
(b) run the gate on a PLANTED series containing the exact pathologies the
robust statistics exist for — a spike day and a corrupted-trend day —
and assert the robustness property itself (the spike does not move the
median smoother; the corrupted day does not move the Theil-Sen slope).
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pandas as pd
import pytest

from vena_etl_tool_spark.catalog import TABLES
from vena_etl_tool_spark.operators.timeseries import (
    ts_anomaly_mad,
    ts_rolling_median,
    ts_theil_sen_trend,
)
from vena_etl_tool_spark.registry import REGISTRY, all_specs
from vena_etl_tool_spark.testing import diff_query, duckdb_connection

SMOKE_SF_DIR = "/root/testdata/sf0.001"


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


def _lower_median(values: list[int]) -> int:
    s = sorted(values)
    return s[(len(s) + 1) // 2 - 1]


def test_rolling_median_matches_python(spark, sf_dir):
    daily = _fixture_daily(sf_dir)
    days = sorted({d for _, d, _ in daily})
    d0, d1 = days[0], days[-1]
    n = (d1 - d0).days + 1
    types = sorted({et for et, _, _ in daily})
    by_type: dict[str, dict[int, int]] = {}
    for et, d, y in daily:
        by_type.setdefault(et, {})[(d - d0).days] = y

    expected = {}
    for et in types:
        series = by_type.get(et, {})
        for o in range(n):
            window = [series.get(i, 0) for i in range(max(0, o - 6), o + 1)]
            expected[(et, d0 + datetime.timedelta(days=o))] = (
                series.get(o, 0),
                len(window),
                _lower_median(window),
            )

    got = {
        (r.event_type, r.day): (r.y_e4, r.n_window, r.med7_e4)
        for r in ts_rolling_median(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) == len(types) * n


def test_anomaly_mad_matches_python(spark, sf_dir):
    daily = _fixture_daily(sf_dir)
    by_type: dict[str, dict[object, int]] = {}
    for et, d, y in daily:
        by_type.setdefault(et, {})[d] = y

    expected = {}
    for et, series in by_type.items():
        med = _lower_median(list(series.values()))
        devs = {d: abs(y - med) for d, y in series.items()}
        mad = _lower_median(list(devs.values()))
        for d, y in series.items():
            dv = devs[d]
            if (mad > 0 and dv > 3 * mad) or (mad == 0 and dv > 0):
                expected[(et, d)] = (y, len(series), med, mad, dv)

    got = {
        (r.event_type, r.day): (r.y_e4, r.n_days, r.med_e4, r.mad_e4, r.dev_e4)
        for r in ts_anomaly_mad(spark, sf_dir).collect()
    }
    assert got == expected


def test_theil_sen_matches_python(spark, sf_dir):
    daily = _fixture_daily(sf_dir)
    d0 = min(d for _, d, _ in daily)
    by_type: dict[str, dict[int, int]] = {}
    for et, d, y in daily:
        by_type.setdefault(et, {})[(d - d0).days] = y

    expected = {}
    for et, series in by_type.items():
        xs = sorted(series)
        slopes = []
        for i, xa in enumerate(xs):
            for xb in xs[i + 1 :]:
                num = series[xb] - series[xa]
                sign = -1 if num < 0 else 1
                slopes.append(sign * (abs(num) * 1000 // (xb - xa)))
        if slopes:
            expected[et] = (len(xs), len(slopes), _lower_median(slopes))

    got = {
        r.event_type: (r.n_days, r.n_pairs, r.theil_sen_slope_milli_e4_per_day)
        for r in ts_theil_sen_trend(spark, sf_dir).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# Planted robustness corpus
# ---------------------------------------------------------------------------


@pytest.fixture()
def planted_events_dir(tmp_path):
    """Two planted daily series over 15 consecutive days:

    - 'steady': value 10.0 every day except a 1000.0 spike on day 7 —
      the textbook input where mean/stddev scoring self-blinds but
      median/MAD flags exactly the spike.
    - 'trend': value == day index (slope exactly 1.0/day) except day 10
      is corrupted to 500.0 — OLS moves, Theil-Sen must not.

    All other tables symlink from sf0.001 so duckdb_connection can
    register its views and the differential gate runs end-to-end."""
    for t in TABLES:
        if t != "events":
            os.symlink(
                os.path.join(SMOKE_SF_DIR, f"{t}.parquet"),
                os.path.join(str(tmp_path), f"{t}.parquet"),
            )
    rows = []
    eid = 0
    for o in range(15):
        ts = datetime.datetime(2024, 3, 1, 12, 0, 0) + datetime.timedelta(days=o)
        for et, v in (
            ("steady", 1000.0 if o == 7 else 10.0),
            ("trend", 500.0 if o == 10 else float(o)),
        ):
            rows.append((eid, ts, 1, et, v, "{}"))
            eid += 1
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).astype({"event_id": "int64", "user_id": "int64"}).to_parquet(
        os.path.join(str(tmp_path), "events.parquet"), index=False
    )
    return str(tmp_path)


def test_planted_series_gate_and_robustness(spark, planted_events_dir):
    d = planted_events_dir
    # the same Spark-vs-DuckDB comparison the driver performs, on the
    # adversarial input rather than fixtures that happen to dodge it
    all_specs()  # force registration
    con = duckdb_connection(d)
    for name in ("ts_rolling_median", "ts_anomaly_mad", "ts_theil_sen_trend"):
        res = diff_query(spark, con, REGISTRY[name], d)
        assert res.ok, f"{name}: {res.detail}"

    # MAD flags exactly the spike day (med=10e4, mad=0 path avoided:
    # devs are [0]*14 + [990e4] -> mad=0, spike dev>0 flags; constant
    # series rule). The corrupted trend day is also a MAD anomaly.
    mad_rows = ts_anomaly_mad(spark, d).collect()
    steady = [(r.day, r.dev_e4) for r in mad_rows if r.event_type == "steady"]
    assert steady == [(datetime.date(2024, 3, 8), 9900000)]

    # The spike does NOT move the rolling median: every 'steady' day with
    # a full 7-day window still smooths to the 10.0 baseline.
    med_rows = ts_rolling_median(spark, d).collect()
    full = [
        r for r in med_rows if r.event_type == "steady" and r.n_window == 7
    ]
    assert full and all(r.med7_e4 == 100000 for r in full)

    # The corrupted day does NOT move the Theil-Sen slope: exactly the
    # clean 1.0/day trend (1.0 value/day = 10000 e4/day = 10_000_000
    # milli-e4/day). 14 of 105 pair slopes are contaminated; the median
    # is not.
    ts_rows = {
        r.event_type: (r.n_days, r.n_pairs, r.theil_sen_slope_milli_e4_per_day)
        for r in ts_theil_sen_trend(spark, d).collect()
    }
    assert ts_rows["trend"] == (15, 105, 10_000_000)
