"""Round-7 second/third-session operator invariants.

The differential gate already hash-proves each operator against its
DuckDB oracle at 3 SFs (including skyline's O(n log n) window rewrite vs
the textbook O(n^2) NOT-EXISTS definition). These tests pin the SEMANTIC
invariants that would survive an oracle that was wrong in the same way
the Spark side is — brute-force reconstructions and planted corpora.
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

import pyspark.sql.functions as F

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def test_skyline_equals_bruteforce(spark):
    """Frontier = brute-force dominance filter on the same input rows."""
    from vena_etl_tool_spark.operators.analytics import (
        SKY_FROM,
        SKY_TO,
        skyline_pareto_frontier,
    )
    from vena_etl_tool_spark.catalog import load_table

    cust = load_table(spark, SMOKE_SF_DIR, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    rows = (
        load_table(spark, SMOKE_SF_DIR, "orders")
        .filter(
            (F.col("o_orderdate") >= F.expr(SKY_FROM))
            & (F.col("o_orderdate") < F.expr(SKY_TO))
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "segment",
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .collect()
    )
    expect = set()
    for r in rows:
        dominated = any(
            s.segment == r.segment
            and s.price <= r.price
            and s.d >= r.d
            and (s.price < r.price or s.d > r.d)
            for s in rows
        )
        if not dominated:
            expect.add((r.segment, r.o_orderkey))
    got = {
        (r.segment, r.o_orderkey)
        for r in skyline_pareto_frontier(spark, SMOKE_SF_DIR).collect()
    }
    assert got == expect and got


def test_bm25_ranking_invariants(spark):
    from vena_etl_tool_spark.operators.textanalysis import (
        BM25_QUERIES,
        BM25_TOP_K,
        text_bm25_search,
    )

    n_terms = {}
    for q, _ in BM25_QUERIES:
        n_terms[q] = n_terms.get(q, 0) + 1
    out = text_bm25_search(spark, SMOKE_SF_DIR).collect()
    byq: dict[str, list] = {}
    for r in out:
        byq.setdefault(r.query_id, []).append(r)
    assert set(byq) == set(n_terms)
    for q, rs in byq.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= BM25_TOP_K
        # scores non-increasing along the ranking; tie-break by doc_id
        for a, b in zip(rs, rs[1:]):
            assert a.score > b.score or (
                a.score == b.score and a.doc_id < b.doc_id
            )
        assert all(1 <= r.n_terms_matched <= n_terms[q] for r in rs)


def test_markov_transitions_reconstruct(spark):
    from vena_etl_tool_spark.operators.analytics import (
        events_markov_transitions,
    )

    out = events_markov_transitions(spark, SMOKE_SF_DIR).collect()
    assert out
    totals: dict[str, int] = {}
    for r in out:
        totals[r.from_type] = totals.get(r.from_type, 0) + r.n_trans
    for r in out:
        assert r.from_total == totals[r.from_type]
        assert r.prob_milli == r.n_trans * 1000 // r.from_total <= 1000
        assert r.surprisal_bits == int(
            math.floor(math.log2(r.from_total // r.n_trans))
        )


def test_ewma_bounded_by_window_extremes(spark):
    from vena_etl_tool_spark.operators.timeseries import (
        EWMA_K,
        ts_ewma_halflife,
    )

    out = ts_ewma_halflife(spark, SMOKE_SF_DIR).collect()
    assert out
    days = {(r.event_type, r.day): r.day_total for r in out}
    first_day = {}
    for r in out:
        cur = first_day.get(r.event_type)
        if cur is None or r.day < cur:
            first_day[r.event_type] = r.day
    for r in out:
        assert 1 <= r.n_days_in_window <= EWMA_K
        window_vals = [
            v
            for (t, d), v in days.items()
            if t == r.event_type and 0 <= (r.day - d).days < EWMA_K
        ]
        assert min(window_vals) - 1e-6 <= r.ewma <= max(window_vals) + 1e-6
        if r.day == first_day[r.event_type]:
            assert r.n_days_in_window == 1
            assert abs(r.ewma - round(r.day_total, 6)) < 1e-6


def test_boilerplate_flags_planted_span(spark, tmp_path):
    """A trigram planted into 12 docs (>= BOILER_MIN_DOCS) is flagged at
    EVERY occurrence — including the first (the contrast with
    text_span_dedup's first-occurrence-keep); unique docs stay clean."""
    from vena_etl_tool_spark.catalog import TABLES
    from vena_etl_tool_spark.operators.textanalysis import (
        BOILER_MIN_DOCS,
        text_boilerplate_ngrams,
    )

    assert BOILER_MIN_DOCS <= 12
    for t in TABLES:
        if t != "documents":
            os.symlink(
                os.path.join(SMOKE_SF_DIR, f"{t}.parquet"),
                os.path.join(str(tmp_path), f"{t}.parquet"),
            )
    boiler = "all rights reserved"
    rows = []
    for i in range(12):
        rows.append((i, f"{boiler} unique{i} words{i} here{i}"))
    rows.append((100, "totally original content nothing shared"))
    pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": "en",
                "source": "s",
                "n_chars": len(t),
            }
            for i, t in rows
        ]
    ).astype({"doc_id": "int64", "n_chars": "int64"}).to_parquet(
        os.path.join(str(tmp_path), "documents.parquet"), index=False
    )
    out = {
        r.doc_id: r
        for r in text_boilerplate_ngrams(spark, str(tmp_path)).collect()
    }
    for i in range(12):
        assert out[i].n_boiler >= 1  # the planted span, incl. doc 0's copy
        assert out[i].n_spans == 4  # 6 tokens -> 4 sliding trigrams
    assert out[100].n_boiler == 0 and out[100].boiler_permille == 0


def test_histogram_partitions_the_table(spark):
    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.aggregates import (
        HIST_BIN_W,
        profile_histogram_equiwidth,
    )

    out = profile_histogram_equiwidth(spark, SMOKE_SF_DIR).collect()
    n_orders = load_table(spark, SMOKE_SF_DIR, "orders").count()
    assert sum(r.n_rows for r in out) == n_orders
    for r in out:
        assert r.bin_lo == r.bin * HIST_BIN_W
        assert r.bin_lo <= r.min_price <= r.max_price < r.bin_lo + HIST_BIN_W
        assert r.min_price * r.n_rows <= r.sum_price <= r.max_price * r.n_rows


def test_hll_overlap_sketch_laws(spark):
    from vena_etl_tool_spark.operators.textanalysis import text_hll_overlap

    out = text_hll_overlap(spark, SMOKE_SF_DIR).collect()
    assert len(out) == 190  # 20 sources -> C(20,2) pairs
    for r in out:
        # union sketch = register-wise MAX => estimate dominates both sides
        assert r.hll_union >= max(r.hll_a, r.hll_b)
        assert r.exact_union == r.exact_a + r.exact_b - r.exact_inter
        assert r.hll_inter == r.hll_a + r.hll_b - r.hll_union
        assert 0 <= r.jaccard_milli <= 1000
        assert 0 <= r.hll_jaccard_milli <= 1000


def test_probe_sweep_monotone_and_anchored(spark):
    """Recall and candidate count are monotone non-decreasing in nprobe
    (supersets by construction), and the nprobe=IVF_NPROBE row's hit set
    agrees with composing sim_ann_ivf against exact truth directly."""
    from vena_etl_tool_spark.operators.similarity import (
        IVF_NPROBE,
        SWEEP_LEVELS,
        TOP_K,
        sim_ann_ivf,
        sim_ann_ivf_probe_sweep,
        sim_cosine_topk,
    )

    rows = {r.nprobe: r for r in sim_ann_ivf_probe_sweep(spark, SMOKE_SF_DIR).collect()}
    assert sorted(rows) == sorted(SWEEP_LEVELS)
    levels = sorted(rows)
    for a, b in zip(levels, levels[1:]):
        assert rows[a].hits <= rows[b].hits
        assert rows[a].recall_milli <= rows[b].recall_milli
        assert rows[a].n_candidates <= rows[b].n_candidates
    assert all(0 <= rows[v].recall_milli <= 1000 for v in levels)
    # anchor: nprobe=2 hits == |ivf top-k ∩ exact top-k| composed directly
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim_cosine_topk(spark, SMOKE_SF_DIR).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in sim_ann_ivf(spark, SMOKE_SF_DIR).collect()
        if r.rk <= TOP_K
    }
    assert rows[IVF_NPROBE].hits == len(exact & ivf)


def test_temperature_weights_flatten_mixture(spark):
    """alpha=1/2 compresses the mixture: the lightest domain's upsample
    factor exceeds the heaviest's, weight mass sums to ~1e6, and
    sqrt_mass is the exact integer isqrt."""
    import math as m

    from vena_etl_tool_spark.operators.textanalysis import (
        dataset_temperature_weights,
    )

    out = dataset_temperature_weights(spark, SMOKE_SF_DIR).collect()
    assert out
    for r in out:
        assert r.sqrt_mass == m.isqrt(r.n_tokens)
    total_ppm = sum(r.weight_ppm for r in out)
    assert 1_000_000 - len(out) <= total_ppm <= 1_000_000
    lightest = min(out, key=lambda r: r.n_tokens)
    heaviest = max(out, key=lambda r: r.n_tokens)
    if lightest.n_tokens < heaviest.n_tokens:
        assert lightest.upsample_milli > heaviest.upsample_milli
        assert heaviest.upsample_milli < 1000 < lightest.upsample_milli


def test_mode_reconstruct(spark):
    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.aggregates import (
        agg_mode_deterministic,
    )

    orders = load_table(spark, SMOKE_SF_DIR, "orders").collect()
    counts: dict[tuple, dict[str, int]] = {}
    for o in orders:
        g = (o.o_orderstatus, o.o_orderdate.year)
        counts.setdefault(g, {})
        counts[g][o.o_orderpriority] = counts[g].get(o.o_orderpriority, 0) + 1
    out = {
        (r.o_orderstatus, r.order_year): r
        for r in agg_mode_deterministic(spark, SMOKE_SF_DIR).collect()
    }
    assert set(out) == set(counts)
    for g, vals in counts.items():
        mode = min(vals.items(), key=lambda kv: (-kv[1], kv[0]))
        assert out[g].mode_priority == mode[0]
        assert out[g].mode_count == mode[1]
        assert out[g].n_values == len(vals)
        assert out[g].group_total == sum(vals.values())
