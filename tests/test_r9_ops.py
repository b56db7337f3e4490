"""Round-9 operator invariants: the distributed-NTILE rewrite and the
round's new operators. Differential coverage lives in the registry gate
(python -m vena_etl_tool_spark.testing); these tests pin the algebraic
identities the oracles can't see."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window


def _reference_ntile(spark, df, sort_cols, b):
    return df.withColumn("q_ref", F.ntile(b).over(Window.orderBy(*sort_cols)))


def test_distributed_ntile_matches_builtin_ntile(spark):
    # The rewrite must reproduce ANSI NTILE bit-for-bit, including the
    # remainder rule (first n%B buckets take one extra row) and the
    # n < B degenerate case, on sizes that straddle partition counts.
    from vena_etl_tool_spark.operators.analytics import _distributed_ntile

    for n, b in [(1, 4), (3, 4), (4, 4), (7, 4), (101, 4), (1000, 7)]:
        df = spark.range(n).select(
            F.col("id").alias("k"),
            # non-monotone metric with heavy ties to exercise tiebreaks
            (F.col("id") * 37 % 11).alias("m"),
        )
        got = _distributed_ntile(df, [F.col("m"), F.col("k")], b, "q")
        ref = _reference_ntile(spark, df, [F.col("m"), F.col("k")], b)
        both = got.join(ref, "k").select("k", "q", "q_ref")
        bad = both.filter(F.col("q") != F.col("q_ref")).count()
        assert bad == 0, f"n={n} b={b}: {bad} mismatches"
        spark.catalog.clearCache()


def test_distributed_ntile_desc_order(spark):
    from vena_etl_tool_spark.operators.analytics import _distributed_ntile

    df = spark.range(57).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("m")
    )
    got = _distributed_ntile(df, [F.col("m").desc(), F.col("k")], 4, "q")
    ref = df.withColumn(
        "q_ref", F.ntile(4).over(Window.orderBy(F.col("m").desc(), "k"))
    )
    bad = (
        got.join(ref, "k")
        .filter(F.col("q") != F.col("q_ref"))
        .count()
    )
    assert bad == 0
    spark.catalog.clearCache()
