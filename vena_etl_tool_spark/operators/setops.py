"""Set operations (SURVEY.md §B.7): union / intersect / except, bag + set.

Spark's set ops are plain shuffles on the full row; at scale prefer
pre-projecting to the minimal column set (done here) so the exchange
carries only what the comparison needs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register


def _seg_nations(spark: SparkSession, sf_dir: str, seg: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == seg)
        .select("c_nationkey")
    )


@register(
    "setop_union_all",
    tags=("setop",),
    oracle="""
SELECT c_nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
) GROUP BY c_nationkey
""",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (unionAll) — aggregated so the multiset is visible."""
    a = _seg_nations(spark, sf_dir, "BUILDING")
    b = _seg_nations(spark, sf_dir, "AUTOMOBILE")
    return a.unionAll(b).groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "setop_union_distinct",
    tags=("setop",),
    oracle="""
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
""",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — union + distinct."""
    a = _seg_nations(spark, sf_dir, "BUILDING")
    b = _seg_nations(spark, sf_dir, "AUTOMOBILE")
    return a.union(b).distinct()


@register(
    "setop_union_by_name",
    tags=("setop",),
    oracle="""
SELECT k AS custkey, kind FROM (
  SELECT c_custkey AS k, 'customer' AS kind FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT o_custkey AS k, 'big_order' AS kind FROM orders WHERE o_totalprice > 400000
)
""",
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName across differently-ordered projections (schema-aligned
    by column name, not position)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.lit("customer").alias("kind"), F.col("c_custkey").alias("custkey"))
    )
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"), F.lit("big_order").alias("kind"))
    )
    return cust.unionByName(big).select("custkey", "kind")


@register(
    "setop_intersect",
    tags=("setop",),
    oracle="""
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
""",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection."""
    a = _seg_nations(spark, sf_dir, "BUILDING")
    b = _seg_nations(spark, sf_dir, "AUTOMOBILE")
    return a.intersect(b)


@register(
    "setop_intersect_all",
    tags=("setop",),
    oracle="""
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT ALL
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
""",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (multiplicity = min of the two sides)."""
    a = _seg_nations(spark, sf_dir, "BUILDING")
    b = _seg_nations(spark, sf_dir, "AUTOMOBILE")
    return a.intersectAll(b)


@register(
    "setop_except",
    tags=("setop",),
    oracle="""
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
""",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (subtract)."""
    a = _seg_nations(spark, sf_dir, "BUILDING")
    b = _seg_nations(spark, sf_dir, "AUTOMOBILE")
    return a.subtract(b)


@register(
    "setop_except_all",
    tags=("setop",),
    oracle="""
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT ALL
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
""",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (multiplicity-aware)."""
    a = _seg_nations(spark, sf_dir, "BUILDING")
    b = _seg_nations(spark, sf_dir, "AUTOMOBILE")
    return a.exceptAll(b)
