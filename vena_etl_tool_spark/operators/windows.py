"""Window functions (SURVEY.md §B.5): ranking, analytic, frames.

Determinism discipline: rank/dense_rank/percent_rank/cume_dist may order by
a non-unique key (ties get equal values), but row_number/ntile/lag/lead and
frame aggregates always order by a total order (unique tiebreak) or their
output is undefined. Window state is per-partition-key; at scale the only
shuffle is the hash exchange on partitionBy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..registry import register


@register(
    "window_ranking",
    tags=("window",),
    oracle="""
SELECT
  o_custkey, o_orderkey,
  ROW_NUMBER()   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
  RANK()         OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rnk,
  DENSE_RANK()   OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS drnk,
  NTILE(4)       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile,
  ROUND(PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate), 6) AS prank,
  ROUND(CUME_DIST()    OVER (PARTITION BY o_custkey ORDER BY o_orderdate), 6) AS cdist
FROM orders
""",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five ranking functions + cume_dist per customer order history."""
    orders = load_table(spark, sf_dir, "orders")
    total = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    tied = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(total).alias("rn"),
        F.rank().over(tied).alias("rnk"),
        F.dense_rank().over(tied).alias("drnk"),
        F.ntile(4).over(total).alias("quartile"),
        F.round(F.percent_rank().over(tied), 6).alias("prank"),
        F.round(F.cume_dist().over(tied), 6).alias("cdist"),
    )


@register(
    "window_analytic",
    tags=("window",),
    oracle="""
SELECT
  o_custkey, o_orderkey,
  LAG(o_totalprice)     OVER w AS prev_price,
  LEAD(o_totalprice)    OVER w AS next_price,
  LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price,
  FIRST_VALUE(o_orderkey) OVER w AS first_order,
  LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead (with offset + default) and first/last over explicit frames."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
    )


@register(
    "window_frames",
    tags=("window", "frames"),
    oracle="""
SELECT
  o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3,
  COUNT(*) OVER (PARTITION BY o_custkey
                 ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS orders_30d
FROM orders
""",
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame specs: running total (unbounded), 3-row moving average, and a
    value-range frame (trailing 30 days, ordered by epoch-day so the range
    arithmetic is integer on both engines)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    by_day = (
        Window.partitionBy("o_custkey")
        .orderBy(F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-30, Window.currentRow)
    )
    dec_price = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec_price).over(running).cast("double").alias("running_total"),
        (F.sum(dec_price).over(last3).cast("double") / F.count(F.lit(1)).over(last3)).alias(
            "moving_avg3"
        ),
        F.count(F.lit(1)).over(by_day).alias("orders_30d"),
    )
