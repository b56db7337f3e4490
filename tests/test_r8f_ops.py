"""Round-8 sixth session: RFM segmentation and the Benford first-digit
audit — Python reconstructions (including ANSI NTILE's
remainder-to-leading-buckets rule) plus the audit invariants.
"""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

import pandas as pd

from vena_etl_tool_spark.operators.aggregates import (
    _BENFORD_PPM,
    profile_benford_audit,
)
from vena_etl_tool_spark.operators.analytics import orders_rfm_segments


def _ntile4(keys):
    """ANSI NTILE(4) over already-sorted keys: the first (n mod 4) buckets
    get ceil(n/4) rows, the rest floor(n/4)."""
    n = len(keys)
    base, extra = divmod(n, 4)
    out = {}
    i = 0
    for q in range(1, 5):
        size = base + (1 if q <= extra else 0)
        for k in keys[i : i + size]:
            out[k] = q
        i += size
    return out


def test_rfm_matches_python(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    max_d = orders.o_orderdate.max()
    per = {}
    for ck, grp in orders.groupby("o_custkey"):
        cents = sum(
            int(Decimal(str(v)).quantize(Decimal("0.01")) * 100)
            for v in grp.o_totalprice
        )
        per[ck] = (
            (max_d - grp.o_orderdate.max()).days,
            len(grp),
            cents,
        )
    custs = sorted(per)
    r_q = _ntile4(sorted(custs, key=lambda c: (per[c][0], c)))
    f_q = _ntile4(sorted(custs, key=lambda c: (-per[c][1], c)))
    m_q = _ntile4(sorted(custs, key=lambda c: (-per[c][2], c)))
    seg = defaultdict(lambda: [0, 0, 0])
    for c in custs:
        s = seg[(r_q[c], f_q[c], m_q[c])]
        s[0] += 1
        s[1] += per[c][2]
        s[2] += per[c][1]
    expect = {
        k: (n, cents // n, orders_)
        for k, (n, cents, orders_) in seg.items()
    }
    got = {
        (r.r_q, r.f_q, r.m_q): (r.n_customers, r.avg_monetary_cents, r.total_orders)
        for r in orders_rfm_segments(spark, sf_dir).collect()
    }
    assert got == expect
    # quartile populations are balanced by the NTILE contract
    for pos in range(3):
        by_q = defaultdict(int)
        for (qs, n) in ((k[pos], v[0]) for k, v in expect.items()):
            by_q[qs] += n
        assert max(by_q.values()) - min(by_q.values()) <= 1


def test_benford_matches_python(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    vals = [v for v in orders.o_totalprice if v >= 1]
    total = len(vals)
    counts = defaultdict(int)
    for v in vals:
        counts[int(str(int(math.floor(v)))[0])] += 1
    got = {r.digit: r for r in profile_benford_audit(spark, sf_dir).collect()}
    assert set(got) == set(range(1, 10))
    assert sum(r.n_values for r in got.values()) == total
    for d in range(1, 10):
        r = got[d]
        assert r.n_values == counts.get(d, 0)
        assert r.observed_ppm == counts.get(d, 0) * 1_000_000 // total
        assert r.expected_ppm == _BENFORD_PPM[d - 1]
        assert r.abs_dev_ppm == abs(r.observed_ppm - r.expected_ppm)
