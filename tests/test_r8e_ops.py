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


def test_centroid_drift_survives_one_parity_label(spark, tmp_path):
    # ANSI regression: a label whose members are all one vec_id parity has
    # an empty snapshot side — the truncated mean must NULL (and the row
    # drop), not throw on `div` by zero; the full differential gate must
    # still hold on such a corpus.
    import os

    import numpy as np

    from vena_etl_tool_spark.catalog import TABLES
    from vena_etl_tool_spark.registry import REGISTRY, all_specs
    from vena_etl_tool_spark.testing import diff_query, duckdb_connection

    for t in TABLES:
        if t != "embeddings":
            os.symlink(
                os.path.join("/root/testdata/sf0.001", f"{t}.parquet"),
                os.path.join(str(tmp_path), f"{t}.parquet"),
            )
    rng = np.random.default_rng(7)
    rows = []
    # label 0: both parities; label 1: ONLY even vec_ids (one-parity)
    for vid in range(8):
        rows.append((vid, rng.normal(size=64).astype("float32").tolist(), 0))
    for vid in (10, 12, 14):
        rows.append((vid, rng.normal(size=64).astype("float32").tolist(), 1))
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).astype(
        {"vec_id": "int64", "label": "int32"}
    ).to_parquet(os.path.join(str(tmp_path), "embeddings.parquet"), index=False)
    all_specs()
    con = duckdb_connection(str(tmp_path))
    res = diff_query(
        spark, con, REGISTRY["embedding_centroid_drift"], str(tmp_path)
    )
    assert res.ok, res
    out = embedding_centroid_drift(spark, str(tmp_path)).collect()
    assert {r.label for r in out} == {0}  # the one-parity label drops out
