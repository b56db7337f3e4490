"""Planted edge cases for the round-5 curation operators — paths the
fixture data never exercises (degenerate MAD, known-answer terciles,
single-language entropy)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_anomaly_degenerate_mad_flags_with_null_z(spark, tmp_path, monkeypatch):
    """Constant values except one outlier: MAD is 0, so the 3*MAD filter
    flags every non-median value and robust_z reports NULL (NULLIF), not
    a crash or inf."""
    import vena_etl_tool_spark.operators.analytics as an

    rows = [(i, "click", 5.0) for i in range(9)] + [(9, "click", 99.0)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    monkeypatch.setattr(an, "load_table", lambda s, d, n: ev)
    out = an.events_value_anomaly(spark, "ignored").collect()
    assert len(out) == 1
    row = out[0]
    assert row.event_id == 9 and row.value == 99.0
    assert row.med == 5.0 and row.mad == 0.0
    assert row.robust_z is None  # NULLIF(mad, 0) — no inf, no crash


def test_lm_buckets_known_answer(spark, monkeypatch):
    """3-doc corpus with hand-computable unigram CE: 'a a' (common token,
    lowest CE -> head), 'a b' (middle), 'c c'?? — use distinct rarity
    levels so terciles are forced one doc each."""
    import vena_etl_tool_spark.operators.textanalysis as ta

    # token counts: a=3, b=2, c=1; total=6
    docs = spark.createDataFrame(
        [(1, "a a"), (2, "a b"), (3, "b c")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(ta, "load_table", lambda s, d, n: docs)
    out = {r.doc_id: r for r in ta.text_lm_quality_buckets(spark, "x").collect()}

    def scaled_ll(cnt: int, total: int = 6) -> int:
        return math.floor(math.log(cnt / total) * 1e9)

    def ce(counts: list[int]) -> float:
        s = sum(scaled_ll(c) for c in counts)
        return round(-(s / 1e9) / len(counts), 6)

    assert out[1].cross_entropy == ce([3, 3])
    assert out[2].cross_entropy == ce([3, 2])
    assert out[3].cross_entropy == ce([2, 1])
    assert (out[1].bucket, out[2].bucket, out[3].bucket) == (
        "head",
        "middle",
        "tail",
    )
    assert all(out[d].n_toks == 2 for d in (1, 2, 3))


def test_source_health_single_language_entropy_zero(spark, monkeypatch):
    """A source emitting one language has exactly 0.0 entropy (the
    collapsing-source alarm); a 50/50 two-language source has ln(2)."""
    import vena_etl_tool_spark.operators.textanalysis as ta

    rows = (
        [(i, f"uniq one {i}", "en", "mono", 10) for i in range(4)]
        + [(10 + i, f"uniq two {i}", "en" if i % 2 == 0 else "fr", "duo", 10)
           for i in range(4)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(ta, "load_table", lambda s, d, n: docs)
    out = {r.source: r for r in ta.corpus_source_health(spark, "x").collect()}
    assert out["mono"].lang_entropy == 0.0
    # scaled-long fold of ln(2): ln(4) - (2*floor(2*ln(2)*1e6)/1e6)/4
    expected = round(
        math.log(4.0) - (2 * math.floor(2 * math.log(2.0) * 1e6) / 1e6) / 4, 6
    )
    assert out["duo"].lang_entropy == expected
    assert out["mono"].n_dup_docs == 0 and out["duo"].dup_rate == 0.0


def test_bloom_prefilter_invariants(spark, monkeypatch):
    """Planted bloom semantics: (a) NO false negative — every true dup is
    is_known=true; (b) composed output equals plain exact membership for
    every doc (the oracle-equality claim, re-proven on planted data);
    (c) the FP rate among definite-non-members is small, i.e. the
    prefilter genuinely cuts the exact join's probe side."""
    import vena_etl_tool_spark.operators.dedup as dd

    n_old, n_new = 400, 400
    old = [(i * 4 + 1, f"old document body number {i}", "a") for i in range(n_old)]
    # new batch: 50 exact dups of old docs, 350 unique
    new = [(i * 4, f"old document body number {i}", "b") for i in range(50)] + [
        (i * 4, f"fresh unseen text payload {i}", "b") for i in range(50, n_new)
    ]
    docs = spark.createDataFrame(
        old + new, "doc_id long, text string, source string"
    )
    monkeypatch.setattr(dd, "load_table", lambda s, d, n: docs)
    out = {r.doc_id: r.is_known for r in dd.corpus_bloom_prefilter(spark, "x").collect()}
    assert len(out) == n_new
    for i in range(50):
        assert out[i * 4] is True, "false negative — bloom must never drop a dup"
    for i in range(50, n_new):
        assert out[i * 4] is False, "exact verify must kill bloom false positives"

    # FP-rate sanity on the raw bloom: rebuild it and probe non-members
    import pyspark.sql.functions as F

    opos = (
        docs.filter(F.col("doc_id") % 4 != 0)
        .select(F.explode(F.array(*dd._bloom_positions("text"))).alias("pos"))
    )
    w, m = dd._bloom_word_mask()
    bloom = opos.select(w, m).groupBy("w").agg(F.bit_or("m").alias("bits"))
    probes = spark.range(2000).selectExpr(
        "id AS doc_id", "CONCAT('definitely not present ', id) AS text"
    )
    ppos = probes.select(
        "doc_id", F.explode(F.array(*dd._bloom_positions("text"))).alias("pos")
    )
    pw, pm = dd._bloom_word_mask()
    hits = (
        ppos.select("doc_id", pw, pm)
        .join(F.broadcast(bloom), "w", "left")
        .select(
            "doc_id",
            (F.coalesce("bits", F.lit(0)).bitwiseAND(F.col("m")) != 0).alias("hit"),
        )
        .groupBy("doc_id")
        .agg(F.bool_and("hit").alias("maybe"))
    )
    fp = hits.filter("maybe").count()
    assert fp <= 2, f"bloom FP rate implausibly high: {fp}/2000"


def test_pq_codebook_centroids_quantize_exactly(spark, monkeypatch):
    """A vector assembled from codebook centroids must quantize to
    exactly those codes with reconstruction error EXACTLY 0 (the scaled
    floors cancel term-for-term when x == c), and codes stay in [0, 16)."""
    import vena_etl_tool_spark.operators.similarity as sim

    planted = [3, 0, 15, 7, 1, 9, 12, 5]
    vec = [float(v) for s, k in enumerate(planted) for v in sim._PQ_BOOKS[s][k]]
    other = [0.01 * i for i in range(64)]
    emb = spark.createDataFrame(
        [(1, vec, 0), (2, other, 1)],
        "vec_id long, embedding array<double>, label int",
    )
    monkeypatch.setattr(sim, "load_table", lambda s, d, n: emb)
    monkeypatch.setattr(sim, "spread_small", lambda df: df)
    out = {r.vec_id: r for r in sim.embedding_product_quantize(spark, "x").collect()}
    got = [out[1][f"code{s}"] for s in range(sim.PQ_SUBSPACES)]
    assert got == planted
    assert out[1].recon_err_sq == 0.0
    for r in out.values():
        assert r.recon_err_sq >= 0.0
        for s in range(sim.PQ_SUBSPACES):
            assert 0 <= r[f"code{s}"] < sim.PQ_CODES


def test_adc_output_shape_invariants(spark, sf_dir):
    """ADC top-k: exactly TOP_K rows per query, rk dense in [1, k],
    no self-matches, scores nondecreasing within a query."""
    from vena_etl_tool_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        sim_ann_pq_adc,
    )

    rows = sim_ann_pq_adc(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.neighbor_id != r.query_id
    assert len(by_q) == N_QUERIES
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, TOP_K + 1))
        scores = [r.adc_score for r in rs]
        assert scores == sorted(scores)
