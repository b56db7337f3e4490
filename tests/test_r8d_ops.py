"""Round-8 fourth session: activity streaks (gaps & islands), funnel
time-to-convert, and the streaming late-data audit.

Python reconstructions from the fixture parquet guard against an oracle
wrong the same way the Spark side is; the late-data audit additionally
pins the conservation identity (total = emitted + dropped + open), which
holds ONLY if Spark's watermark dropped exactly the analytically
predicted rows — the audit's entire point.
"""

from __future__ import annotations

import datetime
from collections import defaultdict

import pandas as pd

from vena_etl_tool_spark.operators.analytics import (
    events_activity_streaks,
    events_funnel_ttc,
)
from vena_etl_tool_spark.streaming.queries import stream_late_data_audit


def _events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_activity_streaks_matches_python(spark, sf_dir):
    ev = _events(sf_dir)
    days = defaultdict(set)
    for r in ev.itertuples():
        days[r.user_id].add(r.ts.date())
    expect = {}
    for u, ds in days.items():
        ds = sorted(ds)
        streaks = []
        start = prev = ds[0]
        ln = 1
        for d in ds[1:]:
            if (d - prev).days == 1:
                ln += 1
            else:
                streaks.append((ln, start))
                start, ln = d, 1
            prev = d
        streaks.append((ln, start))
        longest = max(s[0] for s in streaks)
        first_longest = min(s[1] for s in streaks if s[0] == longest)
        expect[u] = (len(ds), len(streaks), longest, first_longest)
    got = {
        r.user_id: (
            r.n_active_days,
            r.n_streaks,
            r.longest_streak_days,
            r.longest_streak_start,
        )
        for r in events_activity_streaks(spark, sf_dir).collect()
    }
    assert got == expect


def test_funnel_ttc_matches_python(spark, sf_dir):
    ev = _events(sf_dir)
    signups = (
        ev[ev.event_type == "signup"].groupby("user_id").ts.min().to_dict()
    )
    conv = {}
    for u, t0 in signups.items():
        p = ev[(ev.user_id == u) & (ev.event_type == "purchase") & (ev.ts >= t0)]
        if len(p):
            ttc = int(p.ts.min().timestamp()) - int(t0.timestamp())
            # ISO week truncation (Monday)
            wk = (t0 - pd.Timedelta(days=t0.weekday())).date()
            conv[u] = (wk, ttc)
    expect = {}
    by_cohort = defaultdict(list)
    for u, (wk, ttc) in conv.items():
        by_cohort[wk].append((ttc, u))
    for wk, rows in by_cohort.items():
        rows.sort()
        n = len(rows)
        vals = [t for t, _ in rows]
        expect[wk] = (
            n,
            min(vals),
            vals[(n + 1) // 2 - 1],
            max(vals),
            sum(vals) // n,
        )
    got = {
        r.cohort_week: (
            r.n_converted,
            r.min_ttc_sec,
            r.median_ttc_sec,
            r.max_ttc_sec,
            r.mean_ttc_sec,
        )
        for r in events_funnel_ttc(spark, sf_dir).collect()
    }
    assert {str(k): v for k, v in got.items()} == {
        str(k): v for k, v in expect.items()
    }


def test_late_data_audit_conserves_and_predicts(spark, sf_dir):
    ev = _events(sf_dir)
    rows = {
        r.event_type: r for r in stream_late_data_audit(spark, sf_dir).collect()
    }
    # conservation: every source row is accounted for exactly once —
    # emitted by the stream, dropped late, or still open in state
    for r in rows.values():
        assert r.n_total == r.n_emitted + r.n_dropped_late + r.n_open_state
    # totals match the batch table
    counts = ev.groupby("event_type").size().to_dict()
    assert {t: r.n_total for t, r in rows.items()} == counts
    # analytic drop prediction, reconstructed in python
    five = datetime.timedelta(minutes=5)
    wend = ev.ts.dt.floor("5min") + five
    wm1 = ev[ev.event_id % 2 == 0].ts.max() - datetime.timedelta(minutes=10)
    wm2 = ev.ts.max() - datetime.timedelta(minutes=10)
    late = (ev.event_id % 2 == 1) & (wend <= wm1)
    open_ = wend > wm2
    expect_drop = ev[late].groupby("event_type").size().to_dict()
    expect_open = ev[open_].groupby("event_type").size().to_dict()
    for t, r in rows.items():
        assert r.n_dropped_late == expect_drop.get(t, 0)
        assert r.n_open_state == expect_open.get(t, 0)
    # the fixture genuinely exercises the drop path
    assert sum(r.n_dropped_late for r in rows.values()) > 0
