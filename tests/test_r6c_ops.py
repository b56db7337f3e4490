"""Tests for the third round-6 work session's operators: the portable
HyperLogLog family, rendezvous sharding, PMI collocations, key-skew
profiling, winsorized stats, trend fits, and kNN-graph triangles.

Strategy mirrors the rest of the suite: pure-Python/numpy reconstruction
of each sketch or statistic, plus invariant checks that make the audit
columns non-vacuous.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from vena_etl_tool_spark.catalog import load_table
from vena_etl_tool_spark.operators.textanalysis import (
    HLL_ALPHA_DEN,
    HLL_ALPHA_NUM,
    HLL_M,
    HLL_RMAX,
    text_hll_cardinality,
)


def _hll_register(tok: str) -> tuple[int, int]:
    h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
    j = h % HLL_M
    w = h // HLL_M
    bitlen = max(w.bit_length(), 1)  # bin(0)='0' has length 1 in both engines
    return j, min(55 - bitlen, HLL_RMAX)


def _hll_estimate(regs: dict[int, int]) -> tuple[int, int]:
    from vena_etl_tool_spark.operators.textanalysis import (
        HLL_LC_TABLE,
        HLL_LC_THRESHOLD,
    )

    zero = HLL_M - len(regs)
    s = sum(1 << (HLL_RMAX - m) for m in regs.values()) + zero * (1 << HLL_RMAX)
    numer = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << HLL_RMAX)
    raw = numer // (HLL_ALPHA_DEN * s)
    if zero > 0 and raw < HLL_LC_THRESHOLD:
        return HLL_LC_TABLE[zero], zero
    return raw, zero


def test_hll_matches_python_sketch(spark, sf_dir):
    """Rebuild the HLL registers and integer estimate in pure Python and
    require identical per-source AND merged rows; the merged registers
    must equal the register-wise max of the per-source sketches (the
    merge law), and the estimate must land within 35% of truth (3 sigma
    for m=64 is ~39% — a hard failure here means broken hashing, not
    sketch variance)."""
    per_source: dict[str, set[str]] = defaultdict(set)
    for r in load_table(spark, sf_dir, "documents").select("source", "text").collect():
        per_source[r.source].update(r.text.split(" "))

    regs_by_source: dict[str, dict[int, int]] = {}
    for src, toks in per_source.items():
        regs: dict[int, int] = {}
        for t in toks:
            j, rho = _hll_register(t)
            regs[j] = max(regs.get(j, 0), rho)
        regs_by_source[src] = regs
    merged: dict[int, int] = {}
    for regs in regs_by_source.values():
        for j, m in regs.items():
            merged[j] = max(merged.get(j, 0), m)
    regs_by_source["ALL"] = merged
    exact = {s: len(t) for s, t in per_source.items()}
    exact["ALL"] = len(set().union(*per_source.values()))

    rows = text_hll_cardinality(spark, sf_dir).collect()
    assert {r.source for r in rows} == set(regs_by_source)
    for r in rows:
        est, zero = _hll_estimate(regs_by_source[r.source])
        assert (r.hll_estimate, r.zero_registers) == (est, zero), r.source
        assert r.exact_distinct == exact[r.source], r.source
        err = abs(est - exact[r.source]) * 1000 // exact[r.source]
        assert r.abs_err_permille == err, r.source
        assert err <= 350, f"{r.source}: estimate off by {err}/1000"


def test_stream_hll_merge_is_replay_invariant(spark, sf_dir):
    """The streamed + deliberately replayed register grid must equal the
    batch-built grid exactly (MAX-merge idempotence)."""
    from vena_etl_tool_spark.streaming.queries import stream_hll_merge

    truth: dict[int, int] = {}
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        for t in r.text.split(" "):
            j, rho = _hll_register(t)
            truth[j] = max(truth.get(j, 0), rho)
    got = {r.j: r.m for r in stream_hll_merge(spark, sf_dir).collect()}
    assert got == truth


def test_rendezvous_minimal_disruption(spark, sf_dir):
    """Python HRW reconstruction must match, and the law must hold:
    no pre-existing shard gains a doc when the ring grows 8 -> 9, the
    new shard's arrivals equal everyone else's departures, and the
    moved share is in a loose binomial neighborhood of 1/9."""
    from vena_etl_tool_spark.operators.layouts import (
        SHARDS_AFTER,
        SHARDS_BEFORE,
        layout_rendezvous_shards,
    )

    def shard_of(doc_id: int, n: int) -> int:
        return max(
            range(n),
            key=lambda s: int(
                hashlib.md5(f"{doc_id}#{s}".encode()).hexdigest()[:15], 16
            ),
        )

    before: dict[int, int] = defaultdict(int)
    after: dict[int, int] = defaultdict(int)
    moved_out: dict[int, int] = defaultdict(int)
    moved_in: dict[int, int] = defaultdict(int)
    ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    for d in ids:
        o, n = shard_of(d, SHARDS_BEFORE), shard_of(d, SHARDS_AFTER)
        before[o] += 1
        after[n] += 1
        if o != n:
            moved_out[o] += 1
            moved_in[n] += 1

    rows = layout_rendezvous_shards(spark, sf_dir).collect()
    assert len(rows) == SHARDS_AFTER
    total_moved = 0
    for r in rows:
        assert (r.n_before, r.n_after, r.moved_in, r.moved_out) == (
            before[r.shard],
            after[r.shard],
            moved_in[r.shard],
            moved_out[r.shard],
        ), r.shard
        if r.shard < SHARDS_BEFORE:
            assert r.moved_in == 0, f"shard {r.shard} gained docs on ring growth"
        total_moved += r.moved_out
    new = next(r for r in rows if r.shard == SHARDS_BEFORE)
    assert new.n_before == 0 and new.moved_in == new.n_after == total_moved
    # E[moved] = n/9; allow +-50% (binomial tail at fixture sizes)
    assert abs(total_moved - len(ids) / SHARDS_AFTER) < len(ids) / SHARDS_AFTER * 0.5


def test_pmi_collocations_match_python(spark, sf_dir):
    """Recompute adjacent-bigram lift in Python (same float expression
    shape) and require identical top rows; every reported pair must be
    a genuinely adjacent bigram with counts above the noise floor."""
    import math

    from vena_etl_tool_spark.operators.textanalysis import (
        PMI_MIN_PAIR,
        PMI_SCALE,
        PMI_TOPN,
        text_pmi_collocations,
    )

    uni: dict[str, int] = defaultdict(int)
    big: dict[tuple[str, str], int] = defaultdict(int)
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        ts = r.text.split(" ")
        for t in ts:
            uni[t] += 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] += 1
    t = sum(uni.values())
    scored = [
        (
            math.floor(float(n * t) / float(uni[a] * uni[b]) * float(PMI_SCALE)),
            a,
            b,
            n,
        )
        for (a, b), n in big.items()
        if n >= PMI_MIN_PAIR
    ]
    scored.sort(key=lambda x: (-x[0], x[1], x[2]))
    expected = scored[:PMI_TOPN]

    rows = sorted(text_pmi_collocations(spark, sf_dir).collect(), key=lambda r: r.rk)
    assert len(rows) == len(expected)
    for r, (lift, a, b, n) in zip(rows, expected):
        assert (r.w1, r.w2, r.pair_count, r.lift_ppm) == (a, b, n, lift)
        assert r.w1_count == uni[a] and r.w2_count == uni[b]
        assert r.pair_count >= PMI_MIN_PAIR


def test_key_skew_profile_matches_python(spark, sf_dir):
    """Reconstruct the l_suppkey distribution in Python and pin its row;
    structural invariants hold for every key (p50 <= p99 <= max,
    top1 <= top10 shares, skew ratio >= 1e6 ppm = 1.0x mean)."""
    from vena_etl_tool_spark.operators.aggregates import profile_key_skew

    cnt: dict[int, int] = defaultdict(int)
    for r in load_table(spark, sf_dir, "lineitem").select("l_suppkey").collect():
        cnt[r.l_suppkey] += 1
    n_rows = sum(cnt.values())
    counts = sorted(cnt.values())

    def pdisc(q: float) -> int:
        import math

        return counts[math.ceil(q * len(counts)) - 1]

    by_key_desc = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    top10 = sum(n for _, n in by_key_desc[:10])

    rows = {r.key_name: r for r in profile_key_skew(spark, sf_dir).collect()}
    assert set(rows) == {"l_partkey", "l_suppkey", "l_orderkey"}
    r = rows["l_suppkey"]
    assert (r.n_rows, r.n_keys, r.max_count) == (n_rows, len(cnt), counts[-1])
    assert (r.p50_count, r.p99_count) == (pdisc(0.5), pdisc(0.99))
    assert r.top1_share_ppm == by_key_desc[0][1] * 1_000_000 // n_rows
    assert r.top10_share_ppm == top10 * 1_000_000 // n_rows
    assert r.skew_ratio_ppm == counts[-1] * len(cnt) * 1_000_000 // n_rows
    for k, row in rows.items():
        assert row.n_rows == n_rows, k  # every key column covers every row
        assert row.p50_count <= row.p99_count <= row.max_count, k
        assert row.top1_share_ppm <= row.top10_share_ppm, k
        assert row.skew_ratio_ppm >= 1_000_000, k


def test_linear_trend_matches_numpy(spark, sf_dir):
    """The integer sufficient-statistics slope must agree with numpy's
    lstsq fit on the same daily series (within milli-unit truncation),
    and the reported num/den must reproduce exactly."""
    import numpy as np

    from vena_etl_tool_spark.operators.timeseries import ts_linear_trend

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value").collect()
    d0 = min(r.ts.date() for r in ev)
    daily: dict[tuple[str, int], int] = defaultdict(int)
    for r in ev:
        # DECIMAL(18,4) accumulate == exact sum of round(value*1e4) ints
        daily[(r.event_type, (r.ts.date() - d0).days)] += round(r.value * 10_000)

    rows = ts_linear_trend(spark, sf_dir).collect()
    by_type: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for (et, x), y in daily.items():
        by_type[et].append((x, y))
    assert {r.event_type for r in rows} == set(by_type)
    for r in rows:
        pts = by_type[r.event_type]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        assert (r.n_days, r.slope_num, r.slope_den) == (n, num, den)
        assert r.sum_y_e4 == sy
        sign = -1 if num < 0 else 1
        expect_milli = sign * (abs(num) * 1000 // den)
        assert r.slope_milli_e4_per_day == expect_milli
        xs = np.array([x for x, _ in pts], dtype=float)
        ys = np.array([y for _, y in pts], dtype=float)
        np_slope = np.polyfit(xs, ys, 1)[0]
        assert abs(np_slope * 1000 - r.slope_milli_e4_per_day) <= 1000 + abs(np_slope) * 1e-6


def test_winsorized_stats_match_python(spark, sf_dir):
    """Pin one source's winsorized row against a pure-Python clamp, and
    require structural invariants everywhere (clamped mass ~5%+5%,
    winsorized mean between the cutoffs, variance non-negative)."""
    from vena_etl_tool_spark.operators.aggregates import agg_winsorized_stats

    import math

    per_source: dict[str, list[int]] = defaultdict(list)
    for r in load_table(spark, sf_dir, "documents").select("source", "n_chars").collect():
        per_source[r.source].append(r.n_chars)

    rows = {r.source: r for r in agg_winsorized_stats(spark, sf_dir).collect()}
    assert set(rows) == set(per_source)
    for src, vals in per_source.items():
        vals.sort()
        lo = vals[math.ceil(0.05 * len(vals)) - 1]
        hi = vals[math.ceil(0.95 * len(vals)) - 1]
        clamped = [min(max(v, lo), hi) for v in vals]
        n = len(vals)
        r = rows[src]
        assert (r.n_docs, r.lo_cut, r.hi_cut) == (n, lo, hi), src
        assert r.n_clamped_lo == sum(1 for v in vals if v < lo), src
        assert r.n_clamped_hi == sum(1 for v in vals if v > hi), src
        assert r.win_mean_milli == sum(clamped) * 1000 // n, src
        sv, svv = sum(clamped), sum(v * v for v in clamped)
        assert r.win_var == (n * svv - sv * sv) // (n * n), src
        assert lo * 1000 <= r.win_mean_milli <= hi * 1000, src
        assert r.win_var >= 0 and r.n_clamped_lo + r.n_clamped_hi <= n // 8, src


def test_triangle_census_matches_networkless_python(spark, sf_dir):
    """Recount triangles with a pure-Python adjacency-set walk over the
    SAME mutual edge set and require identical per-node rows; at least
    one triangle must exist or the census is vacuous."""
    from vena_etl_tool_spark.operators.similarity import (
        sim_graph_triangles,
        sim_knn_graph_mutual,
    )

    edges = [
        (r.vec_a, r.vec_b)
        for r in sim_knn_graph_mutual(spark, sf_dir).select("vec_a", "vec_b").collect()
    ]
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri: dict[int, int] = defaultdict(int)
    for a, b in edges:  # oriented a<b; close with c>b to count each once
        for c in adj[a] & adj[b]:
            if c > b:
                for n in (a, b, c):
                    tri[n] += 1

    rows = sim_graph_triangles(spark, sf_dir).collect()
    assert {r.vec_id for r in rows} == set(adj)
    total = 0
    for r in rows:
        assert r.degree == len(adj[r.vec_id]), r.vec_id
        assert r.triangles == tri.get(r.vec_id, 0), r.vec_id
        if r.degree < 2:
            assert r.clustering_ppm is None
        else:
            assert r.clustering_ppm == r.triangles * 2_000_000 // (
                r.degree * (r.degree - 1)
            )
            assert 0 <= r.clustering_ppm <= 1_000_000
        total += r.triangles
    assert total > 0, "no triangles in fixture graph — census vacuous"


def test_cumulative_uniques_identity(spark, sf_dir):
    """Python reconstruction plus the defining identities: cumulative =
    running sum of new; dau = new + returning; final cumulative equals
    the corpus's total distinct users."""
    from vena_etl_tool_spark.operators.analytics import events_cumulative_uniques

    seen: set[int] = set()
    by_day: dict = defaultdict(set)
    for r in load_table(spark, sf_dir, "events").select("ts", "user_id").collect():
        by_day[r.ts.date()].add(r.user_id)

    rows = sorted(events_cumulative_uniques(spark, sf_dir).collect(), key=lambda r: r.day)
    assert [r.day for r in rows] == sorted(by_day)
    running = 0
    for r in rows:
        users = by_day[r.day]
        new = len(users - seen)
        assert (r.dau, r.new_users) == (len(users), new), r.day
        assert r.returning_users == len(users) - new
        running += new
        assert r.cumulative_users == running
        seen |= users
    assert rows[-1].cumulative_users == len(seen)


def test_canonical_pick_policy(spark, sf_dir):
    """The winner per cluster must be its longest member (min doc_id on
    ties), exactly one keep per cluster, and cluster membership must
    agree with dedup_cluster_assign."""
    from vena_etl_tool_spark.operators.dedup import (
        dedup_canonical_pick,
        dedup_cluster_assign,
    )

    rows = dedup_canonical_pick(spark, sf_dir).collect()
    assert rows, "no duplicate clusters in fixture — pick is vacuous"
    clusters: dict[int, list] = defaultdict(list)
    for r in rows:
        clusters[r.cluster_root].append(r)
    for root, members in clusters.items():
        assert len(members) == members[0].n_members
        best = min(members, key=lambda m: (-m.n_chars, m.doc_id))
        keeps = [m for m in members if m.keep]
        assert len(keeps) == 1 and keeps[0].doc_id == best.doc_id == keeps[0].canonical_id
    base = {
        (r.doc_id, r.cluster_root)
        for r in dedup_cluster_assign(spark, sf_dir).collect()
    }
    assert {(r.doc_id, r.cluster_root) for r in rows} == base


def test_canonical_pick_clusters_exact_clone_families(spark, tmp_path):
    """On a corpus WITH exact clones (which the fixture SFs lack), a
    family of k >= 2 identical texts must form its own cluster rooted
    and canonicalized at the min-id member even with no near-dup edge,
    and singleton uniques must not appear."""
    import os

    from vena_etl_tool_spark.operators.dedup import dedup_canonical_pick

    rows = [
        # clone family of 3 (one text, ids 10/11/12) — no near-dup partner
        (10, "alpha beta gamma delta epsilon zeta", "en", "s1"),
        (11, "alpha beta gamma delta epsilon zeta", "en", "s1"),
        (12, "alpha beta gamma delta epsilon zeta", "en", "s1"),
        # a singleton unique doc — must NOT appear in output
        (20, "completely different words here entirely so", "en", "s1"),
        # near-dup pair (high 3-gram overlap), different texts
        (30, "one two three four five six seven eight nine ten", "en", "s1"),
        (31, "one two three four five six seven eight nine eleven", "en", "s1"),
    ]
    df = spark.createDataFrame(
        [(i, t, lg, sc, len(t)) for i, t, lg, sc in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "documents.parquet"))
    out = {r.doc_id: r for r in dedup_canonical_pick(spark, str(tmp_path)).collect()}

    assert set(out) == {10, 11, 12, 30, 31}
    for d in (10, 11, 12):
        assert out[d].cluster_root == 10 and out[d].n_members == 3
        assert out[d].canonical_id == 10 and out[d].keep == (d == 10)
    assert out[30].cluster_root == out[31].cluster_root == 30
    assert out[30].n_members == 2
    # 31's text is longer ("eleven" vs "ten") — best-by-length keeps 31
    assert out[30].canonical_id == 31 and out[31].keep and not out[30].keep


def test_quality_calibration_ranks(spark, sf_dir):
    """Python rank reconstruction (ties share RANK), percentile bounds,
    and the decile histogram is roughly uniform per source."""
    from vena_etl_tool_spark.operators.textanalysis import text_quality_calibration

    per_source: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for r in load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect():
        per_source[r.source].append((r.doc_id, r.n_chars))

    expect: dict[int, tuple[int, int, int]] = {}
    for src, docs in per_source.items():
        n = len(docs)
        vals = sorted(c for _, c in docs)
        for d, c in docs:
            rank = vals.index(c) + 1  # RANK: 1 + count of strictly smaller
            pct = (rank - 1) * 1000 // (n - 1) if n > 1 else None
            dec = min((rank - 1) * 10 // (n - 1), 9) if n > 1 else None
            expect[d] = (rank, pct, dec)

    rows = text_quality_calibration(spark, sf_dir).collect()
    assert len(rows) == sum(len(v) for v in per_source.values())
    deciles: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for r in rows:
        assert (r.src_rank, r.pct_milli, r.decile) == expect[r.doc_id], r.doc_id
        if r.pct_milli is not None:
            assert 0 <= r.pct_milli <= 1000 and 0 <= r.decile <= 9
            deciles[r.source][r.decile] += 1
    for src, hist in deciles.items():
        n = sum(hist.values())
        for d in range(10):
            assert hist.get(d, 0) >= n // 40, (src, d, "decile far from uniform")
