"""Round-8 fifth session: embedding centroid drift and HHI concentration.

Python/numpy reconstructions from the fixture parquet, plus the semantic
invariants (drift symmetry to snapshot swap is NOT expected — truncated
means are side-specific — but HHI bounds and the even-split identity
are).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from vena_etl_tool_spark.operators.analytics import events_hhi_concentration
from vena_etl_tool_spark.operators.similarity import embedding_centroid_drift


def _tmean(s: int, n: int) -> int:
    return (1 if s >= 0 else -1) * (abs(s) // n)


def test_centroid_drift_matches_numpy(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    sums: dict[tuple[int, int, int], int] = defaultdict(int)
    counts: dict[tuple[int, int], int] = Counter()
    for r in emb.itertuples():
        snap = r.vec_id % 2
        counts[(r.label, snap)] += 1
        for d, x in enumerate(r.embedding):
            sums[(r.label, snap, d)] += math.floor(float(x) * 1e6)
    labels = {lb for lb, _ in counts}
    expect = {}
    for lb in labels:
        n_old, n_new = counts.get((lb, 0), 0), counts.get((lb, 1), 0)
        if not n_old or not n_new:
            continue
        drift = 0
        max_shift = 0
        for d in range(64):
            c_old = _tmean(sums[(lb, 0, d)], n_old)
            c_new = _tmean(sums[(lb, 1, d)], n_new)
            drift += (c_new - c_old) ** 2
            max_shift = max(max_shift, abs(c_new - c_old))
        expect[lb] = (n_old, n_new, drift, max_shift)
    got = {
        r.label: (r.n_old, r.n_new, r.drift_sq_micro2, r.max_dim_shift_micro)
        for r in embedding_centroid_drift(spark, sf_dir).collect()
    }
    assert got == expect


def test_hhi_matches_python_and_bounds(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    per = ev.groupby(["event_type", "user_id"]).size()
    expect = {}
    for et, grp in per.groupby(level=0):
        cnts = grp.values.tolist()
        total = sum(cnts)
        expect[et] = (
            len(cnts),
            total,
            sum(c * c for c in cnts) * 1_000_000 // (total * total),
            max(cnts) * 1_000_000 // total,
        )
    got = {
        r.event_type: (r.n_users, r.n_events, r.hhi_ppm, r.top_user_share_ppm)
        for r in events_hhi_concentration(spark, sf_dir).collect()
    }
    assert got == expect
    for et, (n_users, _, hhi, top) in expect.items():
        # HHI is bounded below by the even split and above by monopoly,
        # and can never undercut the top user's squared share
        assert 1_000_000 // n_users - 1 <= hhi <= 1_000_000
        assert hhi >= top * top // 1_000_000 - 1
