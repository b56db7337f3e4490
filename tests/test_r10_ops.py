"""Round-10 operator tests: the HLL candidate-key screen and the pinned
NULL semantics of the exact candidate-key audit."""

import pyspark.sql.functions as F
import pytest


def test_candidate_keys_sketch_within_rsd_of_exact(spark, sf_dir):
    """VERDICT r9 #3 invariant: the HLL screen's estimate stays within a
    few rsd of the exact twin on every combo, and no true key is ever
    screened out (a false screen-out would skip the exact escalation)."""
    from vena_etl_tool_spark.operators.aggregates import (
        profile_candidate_keys,
        profile_candidate_keys_sketch,
    )

    exact = {
        (r.tbl, r.cols): r
        for r in profile_candidate_keys(spark, sf_dir).collect()
    }
    sketch = {
        (r.tbl, r.cols): r
        for r in profile_candidate_keys_sketch(spark, sf_dir).collect()
    }
    assert set(exact) == set(sketch)
    for key, ex in exact.items():
        sk = sketch[key]
        assert sk.n_rows == ex.n_rows  # same pinned non-null universe
        rel_err = abs(sk.approx_distinct - ex.n_distinct) / max(ex.n_distinct, 1)
        assert rel_err <= 0.05, (key, sk.approx_distinct, ex.n_distinct)
        if ex.is_key:
            assert sk.is_key_candidate == 1, key  # keys never screened out


def test_candidate_keys_null_semantics_pinned(spark):
    """r9 ADVICE: Spark count_distinct drops NULL-bearing tuples while
    DuckDB counts them — the audit pins parity by filtering to complete
    key tuples on BOTH sides. Feed a frame WITH nulls through the same
    shape and check the convention holds."""
    from vena_etl_tool_spark.operators import aggregates as ag

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "b"), (3, "a"), (3, "a")],
        "k int, v string",
    )
    # replicate the operator's inner shape on a synthetic combo
    filtered = df
    for c in ("k", "v"):
        filtered = filtered.where(F.col(c).isNotNull())
    row = filtered.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("k"), F.col("v")).alias("n_distinct"),
    ).collect()[0]
    # 3 complete tuples: (1,a), (3,a), (3,a) -> 2 distinct
    assert row.n_rows == 3
    assert row.n_distinct == 2


@pytest.mark.parametrize("mod", [2])
def test_ml_minhash_stratum_is_registered(mod):
    from vena_etl_tool_spark import registry

    specs = registry.all_specs()
    assert "dedup_ml_minhash_stratum" in specs
    assert specs["dedup_ml_minhash_stratum"].oracle is None
