"""Bucketed-table layout: the SCALE.md fix for the orders⋈lineitem
exchange. Both fact tables written bucketed on the join key → the join
plans with zero shuffle exchanges."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vena_etl_tool_spark.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("warehouse")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    for df, name, key in ((li, "li_bucketed", "l_orderkey"), (orders, "o_bucketed", "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(base / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "li_bucketed", "o_bucketed"
    for name in ("li_bucketed", "o_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    joined = (
        spark.table(li_t)
        # hint forces SMJ (the fixture is broadcast-sized; at real scale the
        # planner would choose SMJ on its own) so the no-exchange property
        # of co-located buckets is observable
        .join(spark.table(o_t).hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located, co-sorted buckets: SortMergeJoin with NO shuffle exchange
    # on either join side (the only exchange allowed is the final tiny agg)
    join_section = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan
    assert join_section.count("Exchange hashpartitioning") == 0
    # and the result is still correct
    expected = (
        spark.table(li_t)
        .join(spark.table(o_t).hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert joined.agg(F.sum("n")).first()[0] == expected


def test_registered_bucketed_join_query_plan(spark, sf_dir):
    """The registered layout_bucketed_join query must itself plan the
    co-located SortMergeJoin with no exchange on either join side."""
    from vena_etl_tool_spark.operators.layouts import layout_bucketed_join

    df = layout_bucketed_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    join_section = plan.split("SortMergeJoin")[-1]
    assert join_section.count("Exchange hashpartitioning") == 0
