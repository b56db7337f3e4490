"""Round-9 third-session operator invariants. Differential coverage lives
in the registry gate; these pin the algebraic identities and planted-case
semantics the oracles can't see."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timezone

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_systematic_sample_matches_bruteforce(spark):
    # The distributed prefix-sum selection must equal the single-threaded
    # definition: one point every STEP of cumulative weight along the
    # md5 permutation.
    import hashlib

    from vena_etl_tool_spark.operators.projection import (
        SYSSAMPLE_M,
        sample_weighted_systematic,
    )

    got = {
        r.o_orderkey: (r.weight_cents, r.cum_weight, r.n_points)
        for r in sample_weighted_systematic(spark, SF).collect()
    }
    rows = (
        spark.read.parquet(os.path.join(SF, "orders.parquet"))
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("w"),
        )
        .collect()
    )
    perm = sorted(
        rows,
        key=lambda r: (
            hashlib.md5(f"syssample:{r.o_orderkey}".encode()).hexdigest(),
            r.o_orderkey,
        ),
    )
    total = sum(r.w for r in perm)
    step = total // SYSSAMPLE_M
    cum, expect = 0, {}
    for r in perm:
        prev = cum
        cum += r.w
        pts = cum // step - prev // step
        if pts >= 1:
            expect[r.o_orderkey] = (r.w, cum, pts)
    assert got == expect
    assert sum(p for _, _, p in got.values()) == total // step


def test_padding_waste_bucketing_reduces_waste(spark):
    from vena_etl_tool_spark.operators.textanalysis import (
        PADDING_BUCKETS,
        dataset_padding_waste,
    )

    rows = {r.bucket: r for r in dataset_padding_waste(spark, SF).collect()}
    assert set(rows) == set(range(PADDING_BUCKETS + 1))
    g = rows[0]
    assert g.padded_tokens == g.max_len * g.n_docs
    bucketed_waste = sum(rows[b].waste_tokens for b in range(1, PADDING_BUCKETS + 1))
    assert all(rows[b].waste_tokens >= 0 for b in rows)
    # length-bucketing can only shrink per-batch max => total waste drops
    assert bucketed_waste <= g.waste_tokens
    assert sum(rows[b].n_docs for b in range(1, PADDING_BUCKETS + 1)) == g.n_docs
    assert sum(rows[b].sum_tokens for b in range(1, PADDING_BUCKETS + 1)) == g.sum_tokens
    spark.catalog.clearCache()  # _distributed_ntile caches its ranked table


def test_fd_audit_identities(spark):
    from vena_etl_tool_spark.operators.aggregates import profile_fd_violations

    rows = profile_fd_violations(spark, SF).collect()
    li = {r.lhs_value: r for r in rows if r.fd == "lineitem.l_returnflag->l_linestatus"}
    # the synthetic fixture draws flag/status independently, so the FD is
    # violated for every determinant — the audit must say so exactly
    assert set(li) == {"R", "A", "N"}
    assert all(r.fd_holds == 0 and r.n_rhs_values == 2 for r in li.values())
    docs = [r for r in rows if r.fd == "documents.source->lang"]
    assert docs and all(r.fd_holds == 0 for r in docs)
    for r in rows:
        assert r.n_violations == r.n_rows - r.majority_n
        assert (r.n_violations == 0) == (r.fd_holds == 1)
        assert r.majority_n >= (r.n_rows + r.n_rhs_values - 1) // r.n_rhs_values


def test_candidate_key_verdicts(spark):
    from vena_etl_tool_spark.operators.aggregates import profile_candidate_keys

    rows = {(r.tbl, r.cols): r for r in profile_candidate_keys(spark, SF).collect()}
    # the synthetic lineitem does NOT honor the TPC-H compound key (line
    # numbers repeat within an order) — the audit's job is to SAY so
    assert rows[("lineitem", "l_orderkey,l_linenumber")].is_key == 0
    assert rows[("lineitem", "l_orderkey")].is_key == 0
    assert (
        rows[("lineitem", "l_orderkey,l_linenumber")].uniqueness_ppm
        > rows[("lineitem", "l_orderkey")].uniqueness_ppm
    )
    assert rows[("orders", "o_orderkey")].is_key == 1
    assert rows[("events", "event_id")].is_key == 1
    assert rows[("documents", "doc_id")].is_key == 1
    for r in rows.values():
        assert r.n_dup_rows == r.n_rows - r.n_distinct
        assert 0 < r.uniqueness_ppm <= 1_000_000
        assert (r.uniqueness_ppm == 1_000_000) == (r.is_key == 1)
    # clone families exist only at sf0.1 — the text row must catch them
    big = {
        (r.tbl, r.cols): r
        for r in profile_candidate_keys(spark, "/root/testdata/sf0.1").collect()
    }
    assert big[("documents", "text")].is_key == 0
    assert big[("documents", "doc_id")].is_key == 1


def test_recall_evals_structure_and_signal(spark):
    from vena_etl_tool_spark.operators.embeddings_eval import (
        MRL_DIMS,
        embedding_binary_quantize_recall,
        embedding_mrl_truncate_recall,
    )
    from vena_etl_tool_spark.operators.similarity import N_QUERIES, TOP_K

    bq = embedding_binary_quantize_recall(spark, SF).collect()
    assert len(bq) == N_QUERIES
    assert all(0 <= r.hits <= TOP_K for r in bq)
    # 64 sign bits + exact rerank must beat random (signal, not proof)
    assert sum(r.hits for r in bq) > 0
    mrl = embedding_mrl_truncate_recall(spark, SF).collect()
    assert len(mrl) == N_QUERIES * len(MRL_DIMS)
    by_d = {
        d: sum(r.hits for r in mrl if r.trunc_dims == d) for d in MRL_DIMS
    }
    assert all(v > 0 for v in by_d.values())


def test_asof_nearest_planted_directions(spark):
    from vena_etl_tool_spark.operators.joins import (
        ASOF_NEAREST_TOL_SEC,
        join_asof_nearest,
    )

    T0 = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)

    def ev(eid, uid, etype, offset_s):
        return (
            eid,
            datetime.fromtimestamp(T0.timestamp() + offset_s, tz=timezone.utc),
            uid,
            etype,
            1.0,
            "{}",
        )

    rows = [
        # user 1: click 10 s before and 3 s after -> forward wins
        ev(100, 1, "purchase", 0),
        ev(1, 1, "click", -10),
        ev(2, 1, "click", 3),
        # user 2: equidistant (5 s both sides) -> tie goes backward
        ev(200, 2, "purchase", 0),
        ev(3, 2, "click", -5),
        ev(4, 2, "click", 5),
        # user 3: click exactly at the purchase ts -> backward, delta 0
        ev(300, 3, "purchase", 0),
        ev(5, 3, "click", 0),
        # user 4: nearest click beyond tolerance -> masked to NULL
        ev(400, 4, "purchase", 0),
        ev(6, 4, "click", ASOF_NEAREST_TOL_SEC + 1),
        # user 5: no clicks at all
        ev(500, 5, "purchase", 0),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {r.event_id: r for r in join_asof_nearest(spark, d).collect()}
    assert got[100].direction == "forward" and got[100].delta_us == 3_000_000
    assert got[200].direction == "backward" and got[200].delta_us == -5_000_000
    assert got[300].direction == "backward" and got[300].delta_us == 0
    assert got[400].direction is None and got[400].nearest_click_us is None
    assert got[500].direction is None and got[500].delta_us is None


def test_overlap_depth_layout_contrast(spark):
    from vena_etl_tool_spark.operators.layouts import (
        ZM_SHARDS,
        layout_overlap_depth,
    )

    rows = {r.layout: r for r in layout_overlap_depth(spark, SF).collect()}
    # date-range shards are disjoint by construction -> depth exactly 1;
    # every hash shard spans ~the whole date range -> all overlap at once
    assert rows["clustered"].max_overlap_depth == 1
    assert rows["hashed"].max_overlap_depth == rows["hashed"].n_shards == ZM_SHARDS


def test_two_hop_reach_identities(spark):
    from vena_etl_tool_spark.operators.similarity import (
        KNN_GRAPH_K,
        _mutual_graph_persisted,
        sim_graph_2hop_reach,
    )

    rows = sim_graph_2hop_reach(spark, SF).collect()
    n_edges = _mutual_graph_persisted(spark, SF).count()
    assert rows and all(r.reach_2 == r.n_1hop + r.n_2hop for r in rows)
    assert all(1 <= r.n_1hop <= KNN_GRAPH_K for r in rows)
    # handshake: degrees sum to twice the undirected edge count
    assert sum(r.n_1hop for r in rows) == 2 * n_edges
    # strict 2-hop can never exceed the K-capped expansion bound
    assert all(r.n_2hop <= r.n_1hop * (KNN_GRAPH_K - 0) for r in rows)


def test_ab_readout_identities(spark):
    from vena_etl_tool_spark.operators.analytics import events_ab_test_readout

    rows = {r.variant: r for r in events_ab_test_readout(spark, SF).collect()}
    assert set(rows) == {"A", "B", "B-A"}
    a, b, d = rows["A"], rows["B"], rows["B-A"]
    # the diff row is exactly B minus A, column for column
    for c in ("n_users", "n_converted", "purchase_cents", "cvr_ppm",
              "cents_per_user"):
        assert getattr(d, c) == getattr(b, c) - getattr(a, c), c
    # assignment is a partition of the user universe
    n_users = (
        spark.read.parquet(os.path.join(SF, "events.parquet"))
        .select("user_id").distinct().count()
    )
    assert a.n_users + b.n_users == n_users
    assert 0 <= a.n_converted <= a.n_users and 0 <= b.n_converted <= b.n_users
    # assignment must be reproducible: hash, not RNG
    again = {r.variant: r for r in events_ab_test_readout(spark, SF).collect()}
    assert again["A"].n_users == a.n_users


def test_graph_greedy_walk_identities(spark):
    from vena_etl_tool_spark.operators.similarity import (
        N_QUERIES,
        _mutual_graph_persisted,
        sim_ann_graph_greedy,
    )

    rows = sim_ann_graph_greedy(spark, SF).collect()
    assert len(rows) == N_QUERIES
    edges = _mutual_graph_persisted(spark, SF)
    graph_nodes = {
        v for r in edges.select("vec_a", "vec_b").collect() for v in (r.vec_a, r.vec_b)
    }
    entry = min(graph_nodes)
    for r in rows:
        assert r.entry_node == entry
        # the walk can only land on graph nodes, never on the query itself
        assert r.final_node in graph_nodes and r.final_node != r.query_id
        assert r.truth_node in graph_nodes and r.truth_node != r.query_id
        assert r.hit_top1 == int(r.final_node == r.truth_node)
        assert -1.0 <= r.final_cosine <= 1.0
    # greedy over a mutual-kNN graph must navigate better than chance:
    # at least one query reaches its true best reachable node
    assert sum(r.hit_top1 for r in rows) > 0


def test_mutual_graph_invariants_for_greedy_walks(spark):
    """ADVICE r11 (similarity.py:2903): the greedy walks' -inf
    self-candidate equivalence (and the inner frontier⋈adj join being
    lossless) rests on two mutual-graph invariants — no self loops, and
    every node reachable through >= 1 edge (bidir symmetry gives
    out-degree >= 1 for every node that appears at all). Pin them at the
    artifact, and pin that no -inf ever escapes the walk as a final
    cosine."""
    import math

    from vena_etl_tool_spark.operators.similarity import (
        _mutual_graph_persisted,
        sim_ann_graph_greedy,
    )

    edges = _mutual_graph_persisted(spark, SF)
    assert edges.filter(F.col("vec_a") == F.col("vec_b")).count() == 0
    # every endpoint has degree >= 1 by membership; the walk must then
    # always find a finite non-self candidate, so -inf cannot surface
    rows = sim_ann_graph_greedy(spark, SF).collect()
    assert rows and all(math.isfinite(r.final_cosine) for r in rows)
