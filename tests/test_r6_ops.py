"""Invariant tests for the round-6 operators: BPE merge step, snapshot
diff, and the mutual k-NN graph (each also has a DuckDB differential
oracle; these tests pin semantics the hash compare can't express —
planted inputs with hand-computed answers, and an independent numpy
reconstruction of the graph)."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from vena_etl_tool_spark.catalog import load_table
from vena_etl_tool_spark.operators.similarity import (
    _IVF_CENTS,
    KNN_GRAPH_K,
    SEM_CLUSTER_MIN_COS,
    sim_knn_graph_mutual,
    sim_semantic_clusters,
)
from vena_etl_tool_spark.operators.textanalysis import (
    corpus_snapshot_diff,
    text_bpe_merge_step,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows], DOC_SCHEMA
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_bpe_merge_step_planted_counts(spark, tmp_path):
    """Hand-computed pair weights: 'abab'×3 contributes ab=6, ba=3;
    'cd'×3 contributes cd=3. Weight is word-frequency-weighted and counts
    a pair TWICE when it occurs twice inside one word."""
    d = _write_docs(
        spark,
        tmp_path,
        [(1, "abab abab cd", "s"), (2, "abab cd cd", "s")],
    )
    out = {r.pair: r for r in text_bpe_merge_step(spark, d).collect()}
    assert out["ab"].weight == 6 and out["ab"].n_word_types == 1
    assert out["ba"].weight == 3
    assert out["cd"].weight == 3
    assert out["ab"].rk == 1  # highest weight wins the merge


def test_snapshot_diff_planted_statuses(spark, tmp_path):
    """Every status class planted by doc_id residues: %13==0 → added,
    %11==0 → removed, %7==0 in both snapshots → changed (old text is the
    truncated version), %11==0 AND %13==0 → in neither snapshot."""
    text = "alpha beta gamma delta epsilon zeta"
    d = _write_docs(
        spark,
        tmp_path,
        [(i, text, "s") for i in (1, 7, 11, 13, 77, 91, 143)],
    )
    out = {r.status: r for r in corpus_snapshot_diff(spark, d).collect()}
    assert out["unchanged"].n_docs == 1  # id 1
    assert out["changed"].n_docs == 1 and out["changed"].first_doc == 7
    assert out["removed"].n_docs == 2  # ids 11, 77
    assert out["added"].n_docs == 2  # ids 13, 91
    # id 143 (= 11·13) is in neither snapshot: 6 of 7 docs accounted for
    assert sum(r.n_docs for r in out.values()) == 6


def _scaled_dot(x: np.ndarray, y: np.ndarray) -> float:
    """The engines' scaled-integer fold, bit-for-bit."""
    return sum(math.floor(float(a) * float(b) * 1e12) for a, b in zip(x, y)) / 1e12


def _numpy_mutual_graph(spark, sf_dir):
    """Independent reconstruction of the mutual graph: scaled-int centroid
    assignment, per-cell exact top-k, reciprocal filter. Returns
    (expected edges {(a,b): (rk_ab, rk_ba)}, raw cosines {(a,b): c})."""
    rows = load_table(spark, sf_dir, "embeddings").collect()
    # mirror the operator's exact-duplicate collapse: min vec_id per content
    by_content: dict[tuple, int] = {}
    for r in rows:
        k = tuple(r.embedding)
        by_content[k] = min(by_content.get(k, r.vec_id), r.vec_id)
    vecs = {vid: np.asarray(k, dtype=np.float64) for k, vid in by_content.items()}
    c_sq = [_scaled_dot(c, c) for c in _IVF_CENTS]
    cells: dict[int, list[int]] = {}
    for vid, v in vecs.items():
        scores = [c_sq[i] - 2 * _scaled_dot(v, _IVF_CENTS[i]) for i in range(16)]
        cells.setdefault(int(np.argmin(scores)), []).append(vid)
    norms = {vid: math.sqrt(_scaled_dot(v, v)) for vid, v in vecs.items()}
    topk: dict[int, list[tuple[int, int]]] = {}  # src -> [(rk, dst)]
    cos: dict[tuple[int, int], float] = {}
    for members in cells.values():
        for src in members:
            scored = []
            for dst in members:
                if dst == src:
                    continue
                c = _scaled_dot(vecs[src], vecs[dst]) / (norms[src] * norms[dst])
                cos[(min(src, dst), max(src, dst))] = c
                scored.append((-c, dst))
            scored.sort()
            topk[src] = [(rk + 1, dst) for rk, (_, dst) in enumerate(scored[:KNN_GRAPH_K])]
    expected = {}
    for src, lst in topk.items():
        for rk, dst in lst:
            back = [r for r, d in topk.get(dst, ()) if d == src]
            if back and src < dst:
                expected[(src, dst)] = (rk, back[0])
    return expected, cos


def test_mutual_knn_graph_matches_numpy(spark, sf_dir):
    """Full independent reconstruction: assign every vector to its argmin
    centroid with the same scaled-int math, build per-cell exact cosine
    top-k lists, keep reciprocal edges — the Spark result must match the
    edge set, ranks included."""
    expected, cos = _numpy_mutual_graph(spark, sf_dir)
    got = {
        (r.vec_a, r.vec_b): (r.rk_ab, r.rk_ba, r.cosine)
        for r in sim_knn_graph_mutual(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for pair, (rk_ab, rk_ba, c) in got.items():
        assert (rk_ab, rk_ba) == expected[pair]
        assert 1 <= rk_ab <= KNN_GRAPH_K and 1 <= rk_ba <= KNN_GRAPH_K
        assert pair[0] < pair[1]
        assert math.isclose(c, round(cos[pair], 6), abs_tol=1e-9)


def test_semantic_clusters_match_numpy_union_find(spark, sf_dir):
    """Label propagation over the strong mutual edges must equal a
    union-find over the numpy-reconstructed edge set: same membership,
    same min-id roots, keep ⟺ root, sizes consistent."""
    expected_edges, cos = _numpy_mutual_graph(spark, sf_dir)
    strong = [
        p for p in expected_edges if round(cos[p], 6) >= SEM_CLUSTER_MIN_COS
    ]
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in strong:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = {n: find(n) for n in parent}
    got = {r.vec_id: r for r in sim_semantic_clusters(spark, sf_dir).collect()}
    assert set(got) == set(roots)
    sizes: dict[int, int] = {}
    for n, r in roots.items():
        sizes[r] = sizes.get(r, 0) + 1
    for n, row in got.items():
        assert row.cluster_root == roots[n]
        assert row.keep == (n == roots[n])
        assert row.n_members == sizes[roots[n]]


def test_bpe_train_planted_merge_sequence(spark, tmp_path):
    """Hand-computed 4-iteration merge sequence, including the
    vocabulary-exhaustion case (iteration 5 finds no pairs → the merge
    table ends at 4 rows)."""
    from vena_etl_tool_spark.operators.textanalysis import text_bpe_train

    d = _write_docs(
        spark,
        tmp_path,
        [(1, "aaaa aaaa baba", "s"), (2, "aaaa baba baba", "s")],
    )
    got = [
        (r.iter, r.pair_a, r.pair_b, r.merged, r.weight)
        for r in text_bpe_train(spark, d).orderBy("iter").collect()
    ]
    assert got == [
        (1, "a", "a", "aa", 9),    # 3 non-overlapping (a,a) per 'aaaa' x3
        (2, "b", "a", "ba", 6),
        (3, "aa", "aa", "aaaa", 3),
        (4, "ba", "ba", "baba", 3),
    ]


def test_bpe_train_odd_run_greedy_and_oracle_parity(spark, tmp_path):
    """'aaaaa' pins the left-to-right non-overlap rule (aa aa a, then the
    tie-broken (aa,a) merge), and the DuckDB islands oracle must agree
    with the Spark fold on exactly this adversarial input — the fixture
    corpus never exercises overlapping runs."""
    import duckdb

    from vena_etl_tool_spark.operators.textanalysis import text_bpe_train
    from vena_etl_tool_spark.registry import all_specs

    d = _write_docs(spark, tmp_path, [(1, "aaaaa aaaaa", "s")])
    got = [
        (r.iter, r.pair_a, r.pair_b, r.merged, r.weight)
        for r in text_bpe_train(spark, d).orderBy("iter").collect()
    ]
    assert got == [
        (1, "a", "a", "aa", 8),      # 4 adjacent pairs x freq 2, greedy -> [aa, aa, a]
        (2, "aa", "a", "aaa", 2),    # tie (aa,a) beats (aa,aa) on pair_b
        (3, "aa", "aaa", "aaaaa", 2),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"  # Spark writes a dir
    )
    oracle = [
        tuple(r)
        for r in con.execute(
            f"SELECT * FROM ({all_specs()['text_bpe_train'].oracle}) ORDER BY iter"
        ).fetchall()
    ]
    assert oracle == got


def test_bpe_apply_planted_compression(spark, tmp_path):
    """After the 4 planted merges both words tokenize to one symbol:
    every doc is 12 chars -> 3 BPE tokens, compression 4.0. Also pins
    n_tok_bpe <= n_tok_chars globally."""
    from vena_etl_tool_spark.operators.textanalysis import text_bpe_apply

    d = _write_docs(
        spark,
        tmp_path,
        [(1, "aaaa aaaa baba", "s"), (2, "aaaa baba baba", "s")],
    )
    rows = {r.doc_id: r for r in text_bpe_apply(spark, d).collect()}
    for doc_id in (1, 2):
        r = rows[doc_id]
        assert (r.n_tok_chars, r.n_tok_bpe, r.compression) == (12, 3, 4.0)
