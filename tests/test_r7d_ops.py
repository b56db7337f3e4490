"""Fifth round-7 work session operators: rolling distinct actives,
event-type co-occurrence lift, train/val/test split-leakage audit.

Same strategy as test_r7c_ops.py: the differential gate hash-proves each
against its DuckDB oracle at 3 SFs; these tests rebuild each result in
pure Python from the fixture tables so an oracle wrong the same way the
Spark side is would still be caught, and pin the semantic properties
(window clipping, lift-vs-independence, cross-split-only flagging).
"""

from __future__ import annotations

import datetime
import hashlib

import duckdb

from vena_etl_tool_spark.operators.analytics import (
    events_cooccurrence_lift,
    events_rolling_actives,
)
from vena_etl_tool_spark.operators.textanalysis import dataset_split_leakage


def _user_days(sf_dir: str) -> set[tuple[int, datetime.date]]:
    return set(
        duckdb.sql(
            f"""SELECT DISTINCT user_id, CAST(ts AS DATE)
                FROM read_parquet('{sf_dir}/events.parquet')"""
        ).fetchall()
    )


def test_rolling_actives_matches_python(spark, sf_dir):
    ud = _user_days(sf_dir)
    d1 = max(d for _, d in ud)
    cover: set[tuple[int, datetime.date]] = set()
    for u, d in ud:
        for o in range(7):
            c = d + datetime.timedelta(days=o)
            if c <= d1:
                cover.add((u, c))
    wau: dict[datetime.date, int] = {}
    for _, c in cover:
        wau[c] = wau.get(c, 0) + 1
    dau: dict[datetime.date, int] = {}
    for _, d in ud:
        dau[d] = dau.get(d, 0) + 1
    expected = {
        d: (dau.get(d, 0), w, dau.get(d, 0) * 1000 // w) for d, w in wau.items()
    }
    got = {
        r.day: (r.dau, r.wau_7d, r.stickiness_milli)
        for r in events_rolling_actives(spark, sf_dir).collect()
    }
    assert got == expected
    # window clipping: no day past the data's last day; the last day IS
    # reported (its trailing window is complete by definition)
    assert max(got) == d1
    # WAU >= DAU on every day (the window contains the day itself)
    assert all(w >= d for d, w, _ in got.values())


def test_cooccurrence_lift_matches_python(spark, sf_dir):
    ut = set(
        duckdb.sql(
            f"""SELECT DISTINCT user_id, event_type
                FROM read_parquet('{sf_dir}/events.parquet')"""
        ).fetchall()
    )
    users: dict[int, set[str]] = {}
    for u, t in ut:
        users.setdefault(u, set()).add(t)
    nu = len(users)
    nt: dict[str, int] = {}
    for _, t in ut:
        nt[t] = nt.get(t, 0) + 1
    support: dict[tuple[str, str], int] = {}
    for basket in users.values():
        ts = sorted(basket)
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                support[(a, b)] = support.get((a, b), 0) + 1
    expected = {
        (a, b): (
            s,
            nt[a],
            nt[b],
            nu,
            s * nu * 1000 // (nt[a] * nt[b]),
            s * 1000 // nt[a],
        )
        for (a, b), s in support.items()
    }
    got = {
        (r.type_a, r.type_b): (
            r.support_users,
            r.n_type_a,
            r.n_type_b,
            r.n_users,
            r.lift_milli,
            r.conf_a_to_b_milli,
        )
        for r in events_cooccurrence_lift(spark, sf_dir).collect()
    }
    assert got == expected and got


def _split(doc_id: int) -> str:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
    if h in "0123456789ab":
        return "train"
    if h in "cd":
        return "val"
    return "test"


def test_split_leakage_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for doc_id, text in rows:
        canon = " ".join(sorted(set(text.split(" "))))
        fp = hashlib.md5(canon.encode()).hexdigest()
        groups.setdefault(fp, []).append(doc_id)
    expected = {}
    for fp, ids in groups.items():
        splits = [_split(i) for i in ids]
        if len(set(splits)) >= 2:
            expected[fp] = (
                len(ids),
                len(set(splits)),
                min(ids),
                splits.count("train"),
                splits.count("val"),
                splits.count("test"),
            )
    got = {
        r.fingerprint: (
            r.n_docs,
            r.n_splits,
            r.min_doc_id,
            r.train_docs,
            r.val_docs,
            r.test_docs,
        )
        for r in dataset_split_leakage(spark, sf_dir).collect()
    }
    assert got == expected and got
    # cross-split only: single-split duplicate groups must NOT be flagged
    same_split_dup_groups = [
        fp
        for fp, ids in groups.items()
        if len(ids) > 1 and len({_split(i) for i in ids}) == 1
    ]
    assert all(fp not in got for fp in same_split_dup_groups)
