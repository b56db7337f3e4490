"""Tests for the operators added in the round-6 continuation session:
the fuzzy trigram join (set-similarity join with PPJoin prefix
filtering) and friends.

Strategy mirrors the rest of the suite: planted fixtures with known
answers, plus exhaustive brute-force cross-checks small enough to be
computed in plain Python — the prefix filter claims NO false negatives,
so the operator output must equal brute force exactly.
"""

from __future__ import annotations

import pytest

from vena_etl_tool_spark.operators.dedup import (
    FUZZY_JACCARD_T,
    join_fuzzy_trigram,
)


def _trigrams(s: str) -> set[str]:
    return {s[i : i + 3] for i in range(len(s) - 2)}


def _jaccard(a: str, b: str) -> float:
    ta, tb = _trigrams(a), _trigrams(b)
    inter = len(ta & tb)
    return inter / (len(ta) + len(tb) - inter)


def _write_parts(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    df.write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    return str(tmp_path)


def test_fuzzy_join_planted_typo_family(spark, tmp_path):
    """A typo pair must surface with the exact Jaccard; clone families
    collapse to the min-key rep with the family size reported; unrelated
    names must not pair."""
    d = _write_parts(
        spark,
        tmp_path,
        [
            (10, "acme widget"),
            (11, "acme widget"),
            (12, "acme widget"),
            (20, "acme widgets"),
            (30, "zzzz unrelated"),
        ],
    )
    rows = join_fuzzy_trigram(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.rep_a, r.rep_b) == (10, 20)
    assert (r.n_parts_a, r.n_parts_b) == (3, 1)
    expect = _jaccard("acme widget", "acme widgets")
    assert expect >= FUZZY_JACCARD_T
    assert r.jaccard == pytest.approx(expect, abs=1e-6)
    assert r.n_shared == len(_trigrams("acme widget") & _trigrams("acme widgets"))


def test_fuzzy_join_matches_brute_force_on_fixture(spark, sf_dir):
    """PPJoin prefix filtering must be lossless: the operator's pair set
    over the real fixture catalog equals the exhaustive all-pairs
    brute force at the same threshold (the prefix bound guarantees a
    candidate for every qualifying pair; the verify removes the rest)."""
    from vena_etl_tool_spark.catalog import load_table

    names = {}
    for r in (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg({"p_partkey": "min"})
        .collect()
    ):
        names[r[1]] = r[0]  # rep -> name
    reps = sorted(names)
    truth = set()
    for i, ra in enumerate(reps):
        for rb in reps[i + 1 :]:
            if _jaccard(names[ra], names[rb]) >= FUZZY_JACCARD_T:
                truth.add((ra, rb))
    got = {(r.rep_a, r.rep_b) for r in join_fuzzy_trigram(spark, sf_dir).collect()}
    assert got == truth
    assert truth, "fixture has no qualifying pairs — test is vacuous"


def test_fuzzy_join_short_and_degenerate_names(spark, tmp_path):
    """Names shorter than one trigram are excluded (the sequence(1,0)
    descending-range trap), and an exact-duplicate catalog yields no
    pairs at all (clone collapse leaves a single rep)."""
    d = _write_parts(
        spark,
        tmp_path,
        [(1, "ab"), (2, "ab"), (3, "same name"), (4, "same name")],
    )
    assert join_fuzzy_trigram(spark, d).collect() == []


# ---------------------------------------------------------------------------
# IVFADC (sim_ann_ivfadc) — full numpy reconstruction of the index:
# cell assignment, residual PQ codes, per-probe lookup tables, ADC
# ranking. The operator's scaled-int algebra must reproduce this exactly.
# ---------------------------------------------------------------------------


def test_ivfadc_matches_numpy_reconstruction(spark, sf_dir):
    import math

    import numpy as np

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.similarity import (
        _IVF_CENTS,
        _PQ_BOOKS,
        IVF_NPROBE,
        N_QUERIES,
        PQ_SUBDIM,
        PQ_SUBSPACES,
        TOP_K,
        sim_ann_ivfadc,
    )

    def sfloor(x: float) -> int:
        return math.floor(x * 1e12)

    def score_vs_books(sub: np.ndarray, s: int) -> list[int]:
        out = []
        for k in range(16):
            c = _PQ_BOOKS[s][k]
            csq = sum(sfloor(float(v) * float(v)) for v in c)
            dot = sum(sfloor(float(x) * float(p)) for x, p in zip(sub, c))
            out.append(csq - 2 * dot)
        return out

    rows = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    labels = {r.vec_id: r.label for r in rows}

    # cell assignment: argmin over |c|^2 - 2<x,c> (scaled), ties -> first
    def cell_of(x: np.ndarray) -> int:
        scores = []
        for i in range(len(_IVF_CENTS)):
            c = _IVF_CENTS[i]
            csq = sum(sfloor(float(v) * float(v)) for v in c)
            dot = sum(sfloor(float(xx) * float(cc)) for xx, cc in zip(x, c))
            scores.append(csq - 2 * dot)
        return scores.index(min(scores))

    cells = {v: cell_of(x) for v, x in vecs.items()}
    codes = {}
    for v, x in vecs.items():
        res = x - _IVF_CENTS[cells[v]]
        codes[v] = [
            min(
                range(16),
                key=lambda k: score_vs_books(
                    res[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM], s
                )[k]
                * 16
                + k,  # tie -> lowest code, like array_position of the min
            )
            for s in range(PQ_SUBSPACES)
        ]

    expected = {}
    for q in sorted(v for v in vecs if v < N_QUERIES):
        # probe the NPROBE best cells by the same scaled score, tie -> cid
        cscores = []
        for i in range(len(_IVF_CENTS)):
            c = _IVF_CENTS[i]
            csq = sum(sfloor(float(v) * float(v)) for v in c)
            dot = sum(sfloor(float(xx) * float(cc)) for xx, cc in zip(vecs[q], c))
            cscores.append((csq - 2 * dot, i))
        probed = [cid for _, cid in sorted(cscores)[:IVF_NPROBE]]
        cand = []
        for cid in probed:
            qres = vecs[q] - _IVF_CENTS[cid]
            term0 = sum(sfloor(float(r) * float(r)) for r in qres)
            tables = [
                score_vs_books(qres[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM], s)
                for s in range(PQ_SUBSPACES)
            ]
            for v, cell in cells.items():
                if cell != cid or v == q:
                    continue
                adc = term0 + sum(
                    tables[s][codes[v][s]] for s in range(PQ_SUBSPACES)
                )
                cand.append((adc, v))
        cand.sort()
        expected[q] = [
            (v, adc, rk + 1) for rk, (adc, v) in enumerate(cand[:TOP_K])
        ]

    got: dict[int, list] = {}
    for r in sim_ann_ivfadc(spark, sf_dir).collect():
        got.setdefault(r.query_id, []).append(
            (r.neighbor_id, r.adc_score, r.rk, r.neighbor_label)
        )
    for q in got:
        got[q].sort(key=lambda t: t[2])
    assert set(got) == set(expected)
    for q, exp in expected.items():
        assert [(v, adc, rk) for v, adc, rk in exp] == [
            (v, adc, rk) for v, adc, rk, _ in got[q]
        ], f"query {q} diverges"
        for v, _, _, lab in got[q]:
            assert lab == labels[v]


def test_rp_projection_matches_numpy_and_jl_bound(spark, sf_dir):
    """The projected coordinates equal a numpy reconstruction of the
    scaled-int fold, and the distortion audit shows the JL guarantee:
    unbiased (mean ratio ~ 1) and concentrated (most pairs within
    1 +- 3 * sqrt(2/RP_DIM))."""
    import math

    import numpy as np

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.similarity import (
        _RP_MAT,
        RP_DIM,
        embedding_random_projection,
        embedding_rp_distance_audit,
    )

    rows = load_table(spark, sf_dir, "embeddings").limit(30).collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    got = {
        r.vec_id: [getattr(r, f"p{j}") for j in range(RP_DIM)]
        for r in embedding_random_projection(spark, sf_dir).collect()
        if r.vec_id in vecs
    }
    for v, x in vecs.items():
        for j in range(RP_DIM):
            y = sum(math.floor(float(xx) * float(p) * 1e12) for xx, p in zip(x, _RP_MAT[j]))
            assert got[v][j] == round(y / 1e12, 6), (v, j)

    dist = [r.distortion for r in embedding_rp_distance_audit(spark, sf_dir).collect()]
    assert len(dist) > 1000
    mean = sum(dist) / len(dist)
    assert 0.9 < mean < 1.1, mean
    assert all(0.05 < d < 4.0 for d in dist)
    sigma = math.sqrt(2.0 / RP_DIM)
    within = sum(1 for d in dist if abs(d - 1) <= 3 * sigma) / len(dist)
    assert within > 0.95, within


def test_pagerank_matches_exact_integer_reconstruction(spark, sf_dir):
    """The distributed power iteration equals a pure-Python big-int
    reconstruction on the same mutual edge set, and total rank mass is
    conserved up to floor losses (sum <= 1e12, within n*(iters+1) of it
    after accounting for per-edge floors)."""
    from collections import defaultdict

    from vena_etl_tool_spark.operators.similarity import (
        PAGERANK_ITERS,
        PR_SCALE,
        sim_graph_pagerank,
        sim_knn_graph_mutual,
    )

    edges = [
        (r.vec_a, r.vec_b)
        for r in sim_knn_graph_mutual(spark, sf_dir).select("vec_a", "vec_b").collect()
    ]
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    n = len(adj)
    pr = {v: PR_SCALE // n for v in adj}
    for _ in range(PAGERANK_ITERS):
        nxt = {v: (15 * PR_SCALE) // (100 * n) for v in adj}
        for u, nbrs in adj.items():
            c = (pr[u] * 85) // (100 * len(nbrs))
            for v in nbrs:
                nxt[v] += c
        pr = nxt

    got = {r.vec_id: (r.degree, r.pr_e12) for r in sim_graph_pagerank(spark, sf_dir).collect()}
    assert set(got) == set(adj)
    for v in adj:
        assert got[v] == (len(adj[v]), pr[v]), v

    total = sum(p for _, p in got.values())
    assert total <= PR_SCALE
    # floor losses: <= n per init + per iteration (base term + one per edge)
    assert total >= PR_SCALE - (PAGERANK_ITERS + 1) * (n + 2 * len(edges) + 1)
    # centrality is non-degenerate: ranks differ across nodes
    assert len({p for _, p in got.values()}) > 10


def test_label_spread_fills_planted_clusters(spark, tmp_path):
    """Two well-separated planted clusters, one seed label each: after
    propagation every node carries its cluster's label; seeds never
    change; the correct flag agrees with label_true."""
    import numpy as np

    from vena_etl_tool_spark.operators.similarity import sim_label_spread

    rng = np.random.default_rng(42)
    rows = []
    base_a = rng.normal(size=64)
    base_b = -base_a  # antipodal: cosine(A, B) ~ -1, never mutual-top-k
    # 5 nodes per cluster with KNN_GRAPH_K=4: each node's top-k is its
    # whole cluster, so every within-cluster edge is reciprocal.
    for i in range(5):
        rows.append((i, (base_a + 0.01 * rng.normal(size=64)).tolist(), 1))
    for i in range(10, 15):
        rows.append((i, (base_b + 0.01 * rng.normal(size=64)).tolist(), 2))
    df = spark.createDataFrame(
        [(v, [float(x) for x in e], lab) for v, e, lab in rows],
        "vec_id long, embedding array<double>, label int",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    got = {r.vec_id: r for r in sim_label_spread(spark, str(tmp_path)).collect()}
    # every planted node is in the graph (tight clusters => mutual edges)
    assert set(got) == {*range(5), *range(10, 15)}
    for v, r in got.items():
        want = 1 if v < 5 else 2
        assert r.label_true == want
        assert r.label_spread == want, (v, r)
        assert r.correct
        assert r.is_seed == (v % 5 == 0)


def test_cms_matches_python_sketch_and_guarantee(spark, sf_dir):
    """Rebuild the count-min sketch in pure Python (hashlib md5, same
    row-salted columns) and require identical estimates; the CM
    overestimate guarantee must hold for every reported word and at
    least one fixture word must actually collide (WIDTH=16 is chosen to
    force that)."""
    import hashlib
    from collections import Counter, defaultdict

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.textanalysis import (
        CMS_DEPTH,
        CMS_TOPN,
        CMS_WIDTH,
        text_cms_heavy_hitters,
    )

    counts = Counter()
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        counts.update(r.text.split(" "))

    def col_of(tok: str, d: int) -> int:
        h = hashlib.md5(f"{tok}#{d}".encode()).hexdigest()
        return int(h[:15], 16) % CMS_WIDTH

    cells = defaultdict(int)
    for tok, n in counts.items():
        for d in range(CMS_DEPTH):
            cells[(d, col_of(tok, d))] += n

    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOPN]
    expected = {}
    for rk, (tok, n) in enumerate(top, 1):
        est = min(cells[(d, col_of(tok, d))] for d in range(CMS_DEPTH))
        expected[tok] = (rk, n, est)

    rows = text_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == CMS_TOPN
    for r in rows:
        rk, n, est = expected[r.word]
        assert (r.rk, r.true_count, r.cms_estimate) == (rk, n, est), r.word
        assert r.overestimate_ok and r.cms_estimate >= r.true_count
        assert r.collision_err == r.cms_estimate - r.true_count
    assert any(r.collision_err > 0 for r in rows), "no collisions — audit vacuous"


def test_weighted_sample_exact_and_shuffle_free(spark, sf_dir):
    """The content-addressed keep set equals a hashlib reconstruction
    exactly (no RNG, no partitioning dependence), and the whole operator
    is a zero-Exchange scan+filter."""
    import hashlib

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.projection import (
        WSAMPLE_REF,
        sample_weighted_bernoulli,
    )

    expected = {}
    for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect():
        w = min(len(set(r.text.split(" "))), WSAMPLE_REF)
        u48 = int(hashlib.md5(f"wsample:{r.doc_id}".encode()).hexdigest()[:12], 16)
        if u48 * WSAMPLE_REF < w * (1 << 48):
            expected[r.doc_id] = w

    df = sample_weighted_bernoulli(spark, sf_dir)
    got = {r.doc_id: r.weight for r in df.collect()}
    assert got == expected
    assert expected, "fixture kept nothing — test is vacuous"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "weighted sample must ride the scan"


def test_asof_tolerance_bounds_and_nonvacuous(spark, sf_dir):
    """Every surfaced match is within [ts - TOL, ts]; the fixture
    exercises both branches (some purchases have a recent click, some a
    stale/no click); flag and mask agree."""
    import datetime

    from vena_etl_tool_spark.operators.joins import (
        ASOF_TOLERANCE_SEC,
        join_asof_tolerance,
    )

    rows = join_asof_tolerance(spark, sf_dir).collect()
    tol = datetime.timedelta(seconds=ASOF_TOLERANCE_SEC)
    assert any(r.had_recent_click for r in rows)
    assert any(not r.had_recent_click for r in rows)
    for r in rows:
        assert r.had_recent_click == (r.last_click_ts is not None)
        if r.last_click_ts is not None:
            assert r.ts - tol <= r.last_click_ts <= r.ts


def test_stream_cms_merge_mass_conservation(spark, sf_dir):
    """The streamed+merged sketch holds exactly DEPTH copies of the
    corpus token mass (every occurrence increments one cell per row),
    within the DEPTH*WIDTH cell budget — merge loses and invents
    nothing. (Bit-equality with the batch sketch is the oracle's job.)"""
    import pyspark.sql.functions as F

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.textanalysis import CMS_DEPTH, CMS_WIDTH
    from vena_etl_tool_spark.streaming.queries import stream_cms_merge

    cells = stream_cms_merge(spark, sf_dir).collect()
    assert len(cells) <= CMS_DEPTH * CMS_WIDTH
    total_tokens = (
        load_table(spark, sf_dir, "documents")
        .select(F.size(F.split("text", " ")).alias("k"))
        .agg(F.sum("k"))
        .collect()[0][0]
    )
    assert sum(c.cnt for c in cells) == CMS_DEPTH * total_tokens


def test_phash_clusters_consistent_with_pairs(spark):
    """Every near-dup pair's endpoints share a cluster root; exactly one
    keep per cluster; n_members counts the cluster exactly. Run at
    sf0.01 (sf0.001 has no pHash pairs — result legitimately empty)."""
    from collections import Counter

    from vena_etl_tool_spark.operators.multimodal import (
        multimodal_phash_clusters,
        multimodal_phash_neardup,
    )

    sf = "/root/testdata/sf0.01"
    pairs = [(r.doc_a, r.doc_b) for r in multimodal_phash_neardup(spark, sf).collect()]
    rows = multimodal_phash_clusters(spark, sf).collect()
    assert pairs and rows, "sf0.01 fixture lost its pHash near-dup families"
    root = {r.doc_id: r.cluster_root for r in rows}
    for a, b in pairs:
        assert root[a] == root[b]
    sizes = Counter(root.values())
    for r in rows:
        assert r.n_members == sizes[r.cluster_root]
        assert r.keep == (r.doc_id == r.cluster_root)
        assert r.cluster_root == min(
            d for d, rt in root.items() if rt == r.cluster_root
        )
