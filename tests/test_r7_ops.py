"""Round-7 regression tests — the ADVICE r6 findings made permanent.

The medium finding was an ORACLE divergence class the fixture SFs cannot
catch (they contain no exact-clone texts): the Spark side of
dedup_canonical_pick works at clone-collapsed rep grain while its old
oracle ran full-document-grain CC with no family rule. These tests run the
full differential gate (testing.diff_query — the same comparison the
driver performs) on synthetic corpora that DO contain the divergence
triggers, so the bridge is proven on the adversarial input, not just on
fixtures that happen to dodge it.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from vena_etl_tool_spark.catalog import TABLES
from vena_etl_tool_spark.registry import REGISTRY, all_specs
from vena_etl_tool_spark.testing import diff_query, duckdb_connection

SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def clone_corpus_dir(spark, tmp_path):
    """A fixture dir whose documents table contains every trigger from the
    ADVICE scenario — an exact-clone family with NO near-dup edge (the
    2-word pair from the report, plus a 3-way family), clones that ALSO
    have near-dup partners, and singletons — with all other tables
    symlinked from sf0.001 so duckdb_connection can register its views."""
    for t in TABLES:
        if t != "documents":
            os.symlink(
                os.path.join(SMOKE_SF_DIR, f"{t}.parquet"),
                os.path.join(str(tmp_path), f"{t}.parquet"),
            )
    rows = [
        # the literal ADVICE repro: a 2-word exact-clone pair (too short to
        # shingle — len(words) < 3 — so it can never gain a near-dup edge)
        (1, "tiny clone", "en", "s1"),
        (2, "tiny clone", "en", "s1"),
        # 3-way clone family, shingleable but with no near-dup partner
        (10, "alpha beta gamma delta epsilon zeta", "en", "s1"),
        (11, "alpha beta gamma delta epsilon zeta", "en", "s2"),
        (12, "alpha beta gamma delta epsilon zeta", "en", "s1"),
        # near-dup pair where ONE side is itself a clone family of 2
        (20, "one two three four five six seven eight nine ten", "en", "s1"),
        (21, "one two three four five six seven eight nine ten", "en", "s1"),
        (22, "one two three four five six seven eight nine eleven", "en", "s2"),
        # singleton uniques — must not appear in survivorship output
        (30, "completely different words appear here entirely so", "en", "s1"),
        (31, "nothing shares any trigram with this sentence at all", "en", "s2"),
    ]
    _write_documents(rows, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def _write_documents(rows, path):
    # single-FILE parquet (pandas/pyarrow): the duckdb views read one file,
    # matching the driver's fixture layout (Spark reads it fine too)
    pd.DataFrame(
        [
            {"doc_id": i, "text": t, "lang": lg, "source": sc, "n_chars": len(t)}
            for i, t, lg, sc in rows
        ]
    ).astype({"doc_id": "int64", "n_chars": "int64"}).to_parquet(path, index=False)


def _diff(spark, name, sf_dir):
    all_specs()  # force registration
    con = duckdb_connection(sf_dir)
    return diff_query(spark, con, REGISTRY[name], sf_dir)


def test_canonical_pick_oracle_holds_on_clone_corpus(spark, clone_corpus_dir):
    """ADVICE r6 (medium): on a corpus with exact clones the old oracle
    returned the near-dup rows only while Spark returned the clone
    families too — hash mismatch. The clone-collapsed oracle must now
    hash-match on exactly that input."""
    res = _diff(spark, "dedup_canonical_pick", clone_corpus_dir)
    assert res.ok, res.detail
    # and the scenario really exercises the divergence: clone families
    # with no near-dup edge ARE in the output
    out = {r.doc_id for r in REGISTRY["dedup_canonical_pick"].fn(
        spark, clone_corpus_dir).collect()}
    assert {1, 2, 10, 11, 12} <= out
    assert 30 not in out and 31 not in out


@pytest.mark.parametrize("name", ["dedup_containment", "dedup_cluster_assign"])
def test_sibling_dedup_oracles_hold_on_clone_corpus(spark, clone_corpus_dir, name):
    """The sibling near-dup oracles (one already clone-collapsed, one
    deliberately full-grain) must also stay engine-consistent on the
    clone corpus — guards against the same divergence class resurfacing."""
    res = _diff(spark, name, clone_corpus_dir)
    assert res.ok, res.detail


def test_quality_calibration_oracle_holds_on_singleton_source(spark, tmp_path):
    """ADVICE r6 (low): a single-doc source must yield NULL pct_milli AND
    NULL decile (LEAST used to skip the NULL and return 9) — proven
    through the full differential gate on a corpus with a singleton."""
    for t in TABLES:
        if t != "documents":
            os.symlink(
                os.path.join(SMOKE_SF_DIR, f"{t}.parquet"),
                os.path.join(str(tmp_path), f"{t}.parquet"),
            )
    rows = [
        (1, "a" * 10, "en", "solo"),
        (2, "b" * 10, "en", "multi"),
        (3, "c" * 20, "en", "multi"),
        (4, "d" * 30, "en", "multi"),
    ]
    _write_documents(rows, os.path.join(str(tmp_path), "documents.parquet"))
    res = _diff(spark, "text_quality_calibration", str(tmp_path))
    assert res.ok, res.detail
    out = {r.doc_id: r for r in REGISTRY["text_quality_calibration"].fn(
        spark, str(tmp_path)).collect()}
    assert out[1].pct_milli is None and out[1].decile is None
    assert out[4].pct_milli == 1000 and out[4].decile == 9


def test_trained_ivfadc_beats_untrained(spark, sf_dir):
    """Trained-residual-codebook IVFADC invariants (r6 verdict #6), same
    pattern as test_trained_pq_beats_untrained: with cells and probes held
    IDENTICAL to the hash-checked untrained twin, trained codebooks must
    (a) reconstruct cell residuals with strictly lower mean squared error
    than the seeded-random fixed books, and (b) not lose recall@k vs the
    untrained baseline (measured ~0.10 at sf0.01)."""
    import pyspark.sql.functions as F

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.ml_lsh import (
        _ivfadc_trained_parts,
        _trained_pq_scores,
        sim_ann_ivfadc_trained_recall,
    )
    from vena_etl_tool_spark.operators.similarity import (
        _PQ_BOOKS,
        PQ_SUBSPACES,
        _ivf_scores_spark,
        _residual_spark,
        sim_ann_ivfadc_recall,
    )

    coded, _ = _ivfadc_trained_parts(spark, sf_dir)
    t_err = coded.agg(F.avg("recon_err_sq")).first()[0]

    # untrained residual recon error: same |r|^2 + min_k identity with the
    # fixed seeded books the oracle-checked twin quantizes against
    fixed_books = [[list(map(float, c)) for c in _PQ_BOOKS[s]]
                   for s in range(PQ_SUBSPACES)]
    emb = load_table(spark, sf_dir, "embeddings")
    resid = (
        emb.select("embedding", F.expr(_ivf_scores_spark()).alias("scores"))
        .select(
            "embedding",
            (F.expr("array_position(scores, array_min(scores))") - 1)
            .cast("int")
            .alias("cent"),
        )
        .select(F.expr(_residual_spark("embedding", "cent")).alias("res"))
    )
    u_err_col = F.expr(
        "aggregate(transform(res, x -> x * x), 0.0D, (acc, v) -> acc + v)"
    ) + sum(
        F.expr(f"array_min({_trained_pq_scores(s, fixed_books, src='res')})")
        for s in range(PQ_SUBSPACES)
    )
    u_err = resid.agg(F.avg(u_err_col)).first()[0]
    assert t_err < u_err * 0.85, (t_err, u_err)

    t_rec = (
        sim_ann_ivfadc_trained_recall(spark, sf_dir)
        .agg(F.avg("recall_at_k"))
        .first()[0]
    )
    u_rec = (
        sim_ann_ivfadc_recall(spark, sf_dir).agg(F.avg("recall_at_k")).first()[0]
    )
    assert t_rec >= u_rec, (t_rec, u_rec)
