"""Sorts / limits / top-k (SURVEY.md §B.6).

Global top-k goes through ``orderBy(...).limit(k)`` which Catalyst plans as
TakeOrderedAndProject — each partition keeps only its local top-k, so no
full sort or single-node shuffle happens even at 100 TB. Per-group top-k is
the row_number window pattern.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..registry import register


@register(
    "topk_global",
    tags=("sort", "topk"),
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
""",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-15 by price with a unique tiebreak (deterministic LIMIT).
    Planned as TakeOrderedAndProject — verify with .explain()."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


@register(
    "topn_per_group",
    tags=("sort", "topk", "window"),
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
WHERE rn <= 3
""",
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per market segment (row_number ≤ k). One shuffle on
    the group key; AQE handles group skew."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
    )


@register(
    "sort_global_ranked",
    tags=("sort",),
    oracle="""
SELECT n_name, n_regionkey,
       ROW_NUMBER() OVER (ORDER BY n_regionkey, n_name) AS global_rank
FROM nation
""",
)
def sort_global_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (range-partitioned) sort, materialized as an explicit rank so
    the ordering itself is visible to the order-insensitive hash check."""
    nation = load_table(spark, sf_dir, "nation")
    w = Window.orderBy("n_regionkey", "n_name")
    return nation.select(
        "n_name", "n_regionkey", F.row_number().over(w).alias("global_rank")
    )


@register(
    "sort_within_partitions",
    tags=("sort",),
    # Partition-local ordering is not SQL-observable, but the driver's
    # compare is order-insensitive (sorted canonical rows) — so a plain
    # set-equality oracle still pins the full row contents: the operator
    # must reorder rows, never drop/duplicate/mutate them.
    oracle="SELECT l_orderkey, l_returnflag, l_shipdate FROM lineitem",
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortWithinPartitions: the write-path optimization (sorted parquet row
    groups for better min/max pruning) — no global shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.repartition(8, "l_returnflag")
        .sortWithinPartitions("l_returnflag", "l_shipdate")
        .select("l_orderkey", "l_returnflag", "l_shipdate")
    )
