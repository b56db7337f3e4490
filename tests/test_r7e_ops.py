"""Sixth round-7 work session operators: exact-integer ACF + day-of-week
seasonality, linear multi-touch attribution, data-constrained epoch plan,
Gopher quality rules, Deequ-style expectations, referential-integrity audit.

Same strategy as test_r7d_ops.py: the differential gate hash-proves each
against its DuckDB oracle at 3 SFs; these tests rebuild the results in
pure Python from the fixture parquet so an oracle wrong the same way the
Spark side is would still be caught, and pin the semantic invariants
(credit conservation, plan never overspending, both-direction FK audit).
"""

from __future__ import annotations

import datetime
import math

import duckdb

from vena_etl_tool_spark.operators.aggregates import (
    integrity_orphan_audit,
    profile_expectations,
)
from vena_etl_tool_spark.operators.analytics import events_attribution_linear
from vena_etl_tool_spark.operators.textanalysis import (
    _GOPHER_STOPWORDS,
    dataset_epoch_plan,
    text_gopher_rules,
)
from vena_etl_tool_spark.operators.timeseries import (
    ts_autocorrelation,
    ts_seasonality_dow,
)


def _daily_counts(sf_dir: str) -> dict[str, dict[datetime.date, int]]:
    rows = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE), COUNT(*)
            FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2"""
    ).fetchall()
    out: dict[str, dict[datetime.date, int]] = {}
    for t, d, c in rows:
        out.setdefault(t, {})[d] = c
    return out


def _day_bounds(sf_dir: str) -> tuple[datetime.date, datetime.date]:
    (lo, hi) = duckdb.sql(
        f"""SELECT MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))
            FROM read_parquet('{sf_dir}/events.parquet')"""
    ).fetchone()
    return lo, hi


def _tdiv(num: int, den: int) -> int:
    """Truncated signed milli division — the engines' shared convention."""
    s = -1 if num < 0 else 1
    a = abs(num)
    return s * (a // den * 1000 + a % den * 1000 // den)


def test_acf_matches_python(spark, sf_dir):
    daily = _daily_counts(sf_dir)
    lo, hi = _day_bounds(sf_dir)
    n = (hi - lo).days + 1
    expected = {}
    for t, cnts in daily.items():
        ys = [cnts.get(lo + datetime.timedelta(days=i), 0) for i in range(n)]
        s, ss = sum(ys), sum(y * y for y in ys)
        den = n * n * ss - n * s * s
        for k in range(1, 8):
            m = n - k
            sxy = sum(ys[i] * ys[i + k] for i in range(m))
            pa, qb = sum(ys[:m]), sum(ys[k:])
            num = n * n * sxy - n * s * (pa + qb) + m * s * s
            expected[(t, k)] = (n, m, num, den, None if den == 0 else _tdiv(num, den))
    got = {
        (r.event_type, r.lag_days): (r.n_days, r.n_pairs, r.acf_num, r.acf_den, r.acf_milli)
        for r in ts_autocorrelation(spark, sf_dir).collect()
    }
    assert got == expected
    # ACF is a correlation: |r| <= 1 (milli: 1000) for every lag
    assert all(v[4] is None or abs(v[4]) <= 1000 for v in got.values())


def test_seasonality_dow_matches_python(spark, sf_dir):
    daily = _daily_counts(sf_dir)
    lo, hi = _day_bounds(sf_dir)
    n = (hi - lo).days + 1
    monday = datetime.date(1970, 1, 5)
    expected = {}
    for t, cnts in daily.items():
        days = [lo + datetime.timedelta(days=i) for i in range(n)]
        total = sum(cnts.get(d, 0) for d in days)
        by_dow: dict[int, list[int]] = {}
        for d in days:
            by_dow.setdefault((d - monday).days % 7 + 1, []).append(cnts.get(d, 0))
        for dow, ys in by_dow.items():
            expected[(t, dow)] = (
                len(ys),
                sum(ys),
                sum(ys) * 1000 // len(ys),
                None if total == 0 else sum(ys) * n * 1000 // (len(ys) * total),
            )
    rows = ts_seasonality_dow(spark, sf_dir).collect()
    got = {
        (r.event_type, r.dow): (r.n_days, r.n_events, r.mean_daily_milli, r.seasonal_index_milli)
        for r in rows
    }
    assert got == expected
    # per type: the dow day counts partition the grid
    for t in daily:
        assert sum(v[0] for (tt, _), v in got.items() if tt == t) == n


def test_attribution_credit_conservation(spark, sf_dir):
    rows = {r.touch_type: r for r in events_attribution_linear(spark, sf_dir).collect()}
    ev = duckdb.sql(
        f"""SELECT event_id, ts, user_id, event_type
            FROM read_parquet('{sf_dir}/events.parquet')"""
    ).fetchall()
    purchases = [(e, t, u) for e, t, u, ty in ev if ty == "purchase"]
    touches = [(e, t, u, ty) for e, t, u, ty in ev if ty in ("click", "view", "signup")]
    by_user: dict[int, list] = {}
    for e, t, u, ty in touches:
        by_user.setdefault(u, []).append((e, t, ty))
    credit: dict[str, int] = {}
    n_direct = 0
    for ce, ct, cu in purchases:
        window = [
            (e, t, ty)
            for e, t, ty in by_user.get(cu, [])
            if t < ct and t >= ct - datetime.timedelta(days=7)
        ]
        if not window:
            n_direct += 1
            continue
        m = len(window)
        newest = max(window, key=lambda x: (x[1], x[0]))
        for e, t, ty in window:
            credit[ty] = credit.get(ty, 0) + 1000 // m + (1000 % m if (e, t, ty) == newest else 0)
    for ty, c in credit.items():
        assert rows[ty].credit_milli == c
    assert rows["(direct)"].n_conversions == n_direct
    assert rows["(direct)"].credit_milli == n_direct * 1000
    # conservation: every conversion's 1000 milli-credits land somewhere
    assert sum(r.credit_milli for r in rows.values()) == len(purchases) * 1000


def test_epoch_plan_never_overspends(spark, sf_dir):
    rows = dataset_epoch_plan(spark, sf_dir).collect()
    masses = {
        (lang, src): nt
        for lang, src, nt in duckdb.sql(
            f"""SELECT lang, source, SUM(len(string_split(text, ' ')))
                FROM read_parquet('{sf_dir}/documents.parquet') GROUP BY 1, 2"""
        ).fetchall()
    }
    total = sum(masses.values())
    total_sqrt = sum(math.isqrt(m) for m in masses.values())
    for r in rows:
        assert r.n_tokens == masses[(r.lang, r.source)]
        assert r.sqrt_mass == math.isqrt(r.n_tokens)
        assert r.target_tokens == total * 2 * r.sqrt_mass // total_sqrt
        assert r.epochs_milli == min(4000, r.target_tokens * 1000 // r.n_tokens)
        assert r.capped == (r.epochs_milli == 4000)
        assert r.planned_tokens == r.n_tokens * r.epochs_milli // 1000
        # the plan never overspends its target, and the shortfall is the gap
        assert r.planned_tokens <= r.target_tokens
        assert r.shortfall_tokens == r.target_tokens - r.planned_tokens
    # capped domains surrender budget: a capped row has a strict shortfall
    # unless its truncated target landed exactly on the cap
    assert sum(r.planned_tokens for r in rows) <= total * 2


def test_gopher_rules_match_python(spark, sf_dir):
    docs = duckdb.sql(
        f"SELECT source, lang, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    agg: dict[tuple[str, str], list[int]] = {}
    for source, lang, text in docs:
        ws = text.split(" ")
        nw = len(ws)
        if nw == 0:
            continue
        sum_wlen = sum(len(w) for w in ws)
        n_alpha = sum(1 for w in ws if w[:1].isalpha())
        n_symbol = sum(1 for w in ws if "#" in w or "..." in w)
        hits = sum(1 for s in _GOPHER_STOPWORDS if s in ws)
        ok = [
            50 <= nw <= 100000,
            3000 <= sum_wlen * 1000 // nw <= 10000,
            n_symbol * 1000 // nw <= 100,
            n_alpha * 1000 // nw >= 800,
            hits >= 2,
        ]
        a = agg.setdefault((source, lang), [0] * 7)
        a[0] += 1
        for i, o in enumerate(ok):
            a[1 + i] += 0 if o else 1
        a[6] += int(all(ok))
    got = {
        (r.source, r.lang): [
            r.n_docs,
            r.fail_word_count,
            r.fail_mean_wlen,
            r.fail_symbol_ratio,
            r.fail_alpha_frac,
            r.fail_stopwords,
            r.n_pass_all,
        ]
        for r in text_gopher_rules(spark, sf_dir).collect()
    }
    assert got == agg
    # the rules discriminate on this corpus: some docs fail, some pass
    assert sum(v[6] for v in got.values()) > 0
    assert any(v[1] + v[2] + v[5] > 0 for v in got.values())


def test_expectations_verdicts(spark, sf_dir):
    rows = {(r.tbl, r.constraint): r for r in profile_expectations(spark, sf_dir).collect()}
    assert len(rows) == 8
    # Row field `pass` is a Python keyword — access via asDict
    for r in rows.values():
        d = r.asDict()
        assert 0 <= d["metric_ppm"] <= 1_000_000
        assert d["pass"] == (1 if d["n_ok"] == d["n_rows"] else 0)
    # independent recount of one constraint per table
    con = duckdb.connect()
    n, n_uniq = con.execute(
        f"""SELECT COUNT(*), COUNT(DISTINCT o_orderkey)
            FROM read_parquet('{sf_dir}/orders.parquet')"""
    ).fetchone()
    d = rows[("orders", "unique(o_orderkey)")].asDict()
    assert (d["n_rows"], d["n_ok"]) == (n, n_uniq)
    n, ok = con.execute(
        f"""SELECT COUNT(*), SUM(CAST(l_quantity BETWEEN 1 AND 50 AS INT))
            FROM read_parquet('{sf_dir}/lineitem.parquet')"""
    ).fetchone()
    d = rows[("lineitem", "range(l_quantity)")].asDict()
    assert (d["n_rows"], d["n_ok"]) == (n, ok)


def test_orphan_audit_directions(spark, sf_dir):
    rows = {r.edge: r for r in integrity_orphan_audit(spark, sf_dir).collect()}
    assert len(rows) == 5
    con = duckdb.connect()
    # clean TPC-H: no orphans anywhere, and child keys are a subset of parents
    for r in rows.values():
        assert r.n_orphan_keys == 0
        assert r.n_child_keys <= r.n_parent_keys + r.n_orphan_keys
        assert r.n_child_keys <= r.n_child_rows
    # the reverse direction is non-trivially exercised on clean data
    e = rows["orders.o_custkey->customer.c_custkey"]
    (expected_unref,) = con.execute(
        f"""SELECT COUNT(*) FROM read_parquet('{sf_dir}/customer.parquet') c
            WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{sf_dir}/orders.parquet') o
                              WHERE o.o_custkey = c.c_custkey)"""
    ).fetchone()
    assert e.n_unreferenced == expected_unref
    e = rows["lineitem.l_orderkey->orders.o_orderkey"]
    (n_rows, n_keys) = con.execute(
        f"""SELECT COUNT(*), COUNT(DISTINCT l_orderkey)
            FROM read_parquet('{sf_dir}/lineitem.parquet')"""
    ).fetchone()
    assert (e.n_child_rows, e.n_child_keys) == (n_rows, n_keys)
