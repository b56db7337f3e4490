"""Round-8 operators, first session: link prediction over the mutual-kNN
graph and one exact Lloyd (k-means) iteration.

Same strategy as test_r7*_ops.py: the differential gate hash-proves each
query against its DuckDB oracle at 3 SFs; these tests rebuild the results
in pure Python/numpy from the fixture parquet so an oracle wrong the same
way the Spark side is would still be caught, and pin the semantic
invariants (non-adjacency, index ranges, truncated-mean arithmetic).
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from vena_etl_tool_spark.operators.similarity import (
    _IVF_CENTS,
    _IVF_C_SQ,
    sim_kmeans_lloyd_step,
    sim_knn_graph_mutual,
    sim_link_prediction,
)


def _exact_assignment(vecs: np.ndarray) -> np.ndarray:
    """The scaled-int nearest-centroid rule both engines implement:
    argmin over |c|^2_scaled - 2*dot_scaled, first minimum wins."""
    n = len(vecs)
    scores = np.empty((n, len(_IVF_CENTS)), dtype=np.int64)
    for i, row in enumerate(vecs):
        for c in range(len(_IVF_CENTS)):
            dot = sum(
                math.floor(float(x) * float(p) * 1e12)
                for x, p in zip(row, _IVF_CENTS[c])
            )
            scores[i, c] = _IVF_C_SQ[c] - 2 * dot
    return np.argmin(scores, axis=1)


def test_lloyd_step_matches_numpy_reconstruction(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = np.array([r.embedding for r in emb], dtype=np.float64)
    assign = _exact_assignment(vecs)
    sums: dict[tuple[int, int], int] = defaultdict(int)
    counts: dict[int, int] = defaultdict(int)
    for row, c in zip(vecs, assign):
        counts[int(c)] += 1
        for d, x in enumerate(row):
            sums[(int(c), d)] += math.floor(float(x) * 1e6)
    out = {
        (r.cent, r.dim): r for r in sim_kmeans_lloyd_step(spark, sf_dir).collect()
    }
    # every non-empty (cell, dim) present, nothing else
    assert set(out) == set(sums)
    for (c, d), r in out.items():
        s = sums[(c, d)]
        n = counts[c]
        expect_new = (1 if s >= 0 else -1) * (abs(s) // n)
        expect_old = math.floor(float(_IVF_CENTS[c][d]) * 1e6)
        assert r.n_members == n
        assert r.new_c_micro == expect_new
        assert r.old_c_micro == expect_old
        assert r.shift_micro == abs(expect_new - expect_old)


def test_link_prediction_matches_graph_reconstruction(spark, sf_dir):
    edges = {
        (r.vec_a, r.vec_b)
        for r in sim_knn_graph_mutual(spark, sf_dir).collect()
    }
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect = {}
    nodes = sorted(adj)
    for v in nodes:
        nb = sorted(adj[v])
        for i, u in enumerate(nb):
            for w in nb[i + 1 :]:
                key = (u, w)
                if key in edges:
                    continue
                cn = len(adj[u] & adj[w])
                if cn < 2:
                    continue
                ra = sum(1_000_000 // len(adj[x]) for x in adj[u] & adj[w])
                jac = cn * 1000 // (len(adj[u]) + len(adj[w]) - cn)
                expect[key] = (cn, jac, ra)
    got = {
        (r.vec_a, r.vec_b): (r.common_neighbors, r.jaccard_milli, r.ra_micro)
        for r in sim_link_prediction(spark, sf_dir).collect()
    }
    assert got == expect
    # predicted links are never existing edges, always properly ordered
    assert all(a < b and (a, b) not in edges for a, b in got)
