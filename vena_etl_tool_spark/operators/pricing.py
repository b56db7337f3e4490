"""Flagship pricing-summary queries (SURVEY.md §7 M0, §B.4 hash aggregate).

The reference performs no local data transformation at all (its "pipeline"
is an opaque CSV upload — /root/reference/src/api/templates.js:133-192), so
these queries define the engine's flagship *relational* surface per the
mandate: scan → filter → project → hash-aggregate → sort in one declarative
plan that Catalyst compiles to a partial/final aggregate with the filter and
column pruning pushed into the parquet scan.

Scale: the aggregate keys (returnflag × linestatus = 6 groups) make the
shuffle tiny regardless of input size — map-side partial aggregation reduces
100 TB of lineitem to a handful of rows per task before any exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register
from ._shared import davg, dsum

Q1_CUTOFF = "1998-09-02"


@register(
    "q1_pricing_summary",
    tags=("aggregate", "flagship"),
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: filter → groupBy → 8 aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "global_aggregate",
    tags=("aggregate",),
    oracle="""
SELECT
  COUNT(*) AS n_rows,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
  CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
  CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
  MIN(l_shipdate) AS first_ship,
  MAX(l_shipdate) AS last_ship
FROM lineitem
""",
)
def global_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-key (global) aggregate over the fact table (§B.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )
