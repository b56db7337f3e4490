"""Deep TPC-H-pattern coverage — the decision-support query shapes a
reference user's reporting workload is built from, adapted to the fixture
schema (no commitdate/receiptdate/shipmode/container columns; predicates
recalibrated to the synthetic value domains, see FIXTURES.md).

Each query is a classic access pattern the engine must plan well at 100 TB:
EXISTS → semi join (q4), scan-heavy filter+global agg (q6), left-join
distribution (q13), conditional-aggregate ratio (q14), correlated scalar
average (q17), HAVING-subquery fan-in (q18), OR-of-ANDs pushdown (q19),
EXISTS + NOT-EXISTS self-joins (q21), anti-join + scalar subquery (q22).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register
from ._shared import dsum


@register(
    "q4_priority_exists",
    tags=("join", "semi", "aggregate"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style: EXISTS decorrelated to a left-semi join, then a
    tiny (5-group) aggregate. The semi join shuffles only the order keys
    of the probe side; the date filter is pushed to the orders scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_revenue_forecast",
    tags=("filter", "aggregate"),
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.045 AND l_discount <= 0.075
  AND l_quantity < 24
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style: the pure scan benchmark — every predicate reaches
    the parquet reader (PushedFilters), no join, a single global partial+
    final aggregate. Discount bounds sit between the data's 0.01 grid
    points so double comparison is boundary-safe in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.045)
            & (F.col("l_discount") <= 0.075)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q13_order_count_distribution",
    tags=("join", "outer", "aggregate"),
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style: distribution of customers by order count. The
    join predicate (not a WHERE) keeps zero-order customers via the left
    outer join; COUNT(column) counts only matched rows. Two aggregates,
    but the second groups on a tiny domain (distinct counts)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    tags=("join", "aggregate"),
    oracle="""
SELECT ROUND(
         100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE),
         6) AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style promo-revenue share: conditional aggregation over
    a fact×dim join. The part side is broadcast (dim ≪ fact at any SF);
    the month filter prunes the lineitem scan before the join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev.cast("decimal(18,4)")).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.sum(promo_rev).cast("double") / dsum(rev, 4), 6
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    tags=("join", "subquery", "aggregate"),
    oracle="""
WITH li AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l
  JOIN part ON l.l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
), caps AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(l_quantity) AS avg_qty
  FROM li
  GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS small_qty_revenue,
       COUNT(*) AS n_items
FROM li JOIN caps USING (l_partkey)
WHERE l_quantity * 5.0 < avg_qty
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style: revenue from orders below 20% of the part's
    average quantity — the correlated scalar AVG decorrelated to a
    per-part aggregate joined back to the fact rows. ``qty * 5 < avg``
    instead of ``qty < 0.2 * avg`` keeps the comparison exact-integer ×
    double on both engines (no 0.2 literal-type divergence). Both the
    aggregate and the join-back share one hash partitioning on
    l_partkey — a single shuffle of the brand-filtered slice."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    caps = li.groupBy("l_partkey").agg(
        (dsum("l_quantity") / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(caps, "l_partkey")
        .filter(F.col("l_quantity") * 5.0 < F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice").alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q18_large_volume_customers",
    tags=("join", "subquery", "topk"),
    oracle="""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style large-volume customers: the HAVING-IN subquery
    becomes the build side itself — aggregate lineitem once, filter the
    groups, then join the (now tiny) order list back. AQE promotes the
    filtered aggregate to a broadcast build at any SF where it fits."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_filter",
    tags=("join", "filter", "aggregate"),
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_type = 'SMALL'  AND p_size <= 15
       AND l_quantity >= 1  AND l_quantity <= 15)
   OR (p_brand = 'Brand#23' AND p_type = 'MEDIUM' AND p_size <= 25
       AND l_quantity >= 10 AND l_quantity <= 25)
   OR (p_brand = 'Brand#4'  AND p_size <= 35
       AND l_quantity >= 20 AND l_quantity <= 35)
""",
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style OR-of-ANDs over a fact×dim join. Catalyst factors
    the part-only conjuncts out of the disjunction and pushes them below
    the join on the broadcast side; the mixed lineitem+part residual
    stays as the post-join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12") & (F.col("p_type") == "SMALL")
            & (F.col("p_size") <= 15) & qty.between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")
            & (F.col("p_size") <= 25) & qty.between(10, 25)
        )
        | ((F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 35) & qty.between(20, 35))
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q21_sole_returner",
    tags=("join", "semi", "anti", "topk"),
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
)
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style: suppliers who were the ONLY supplier with a
    returned item on a finished multi-supplier order — the classic
    EXISTS + NOT EXISTS pair, decorrelated to a left-semi and a
    left-anti self-join on (orderkey, suppkey≠). All three lineitem
    passes and the semi/anti probes hash-partition on l_orderkey, so
    AQE coalesces them onto one exchange of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    waiting = (
        l1.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            l2,
            (F.col("l2_orderkey") == F.col("l_orderkey"))
            & (F.col("l2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3_orderkey") == F.col("l_orderkey"))
            & (F.col("l3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


@register(
    "q22_dormant_balance",
    tags=("join", "anti", "subquery", "aggregate"),
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(c_acctbal) AS threshold
  FROM customer
  WHERE c_acctbal > 0.0
    AND c_mktsegment IN ('AUTOMOBILE', 'FURNITURE', 'BUILDING')
)
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_mktsegment IN ('AUTOMOBILE', 'FURNITURE', 'BUILDING')
  AND c_acctbal > threshold
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
)
def q22_dormant_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style: well-funded customers in target segments with no
    urgent orders — an uncorrelated scalar-AVG subquery (computed once,
    crossed in as a 1-row broadcast) plus a NOT EXISTS decorrelated to a
    left-anti join against the pre-filtered orders side."""
    cust = load_table(spark, sf_dir, "customer")
    segs = ("AUTOMOBILE", "FURNITURE", "BUILDING")
    in_seg = cust.filter(F.col("c_mktsegment").isin(*segs))
    threshold = in_seg.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal") / F.count("c_acctbal")).alias("threshold")
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        in_seg.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "q2_min_cost_supplier",
    tags=("join", "subquery", "broadcast"),
    oracle="""
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
), unit AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS min_unit_price
  FROM lineitem
  JOIN eu_supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, MIN(min_unit_price) AS best_price
  FROM unit GROUP BY l_partkey
)
SELECT p.p_partkey, u.l_suppkey AS s_suppkey, s.s_name,
       ROUND(u.min_unit_price, 6) AS unit_price
FROM unit u
JOIN best b ON u.l_partkey = b.l_partkey AND u.min_unit_price = b.best_price
JOIN part p ON u.l_partkey = p.p_partkey
JOIN eu_supp s ON u.l_suppkey = s.s_suppkey
WHERE p.p_size >= 40 AND p.p_type = 'SMALL'
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-style (fixture-adapted: no partsupp table, so the
    part×supplier cost relation is derived from lineitem unit prices):
    for each qualifying part, the EUROPE supplier(s) offering the minimum
    unit price. The correlated MIN subquery decorrelates to a per-part
    aggregate joined back on (part, price) — two hash aggregates sharing
    the (l_partkey, l_suppkey) exchange, then broadcast dims. MIN of a
    per-row double is order-insensitive, so the equality join on the
    minimum is engine-exact."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    eu_supp = supp.join(
        F.broadcast(
            nation.join(
                F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
            )
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem")
    unit = (
        li.join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "min_unit_price"
            )
        )
    )
    best = unit.groupBy("l_partkey").agg(F.min("min_unit_price").alias("best_price"))
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") >= 40) & (F.col("p_type") == "SMALL")
    )
    return (
        unit.join(
            best,
            (unit.l_partkey == best.l_partkey)
            & (unit.min_unit_price == best.best_price),
        )
        .drop(best.l_partkey)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            F.round("min_unit_price", 6).alias("unit_price"),
        )
    )


@register(
    "q9_product_profit",
    tags=("join", "aggregate"),
    oracle="""
SELECT n_name AS supp_nation, year(o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, year(o_orderdate)
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style product-line profit by supplier nation and year
    (fixture-adapted: no partsupp, so profit is the discounted revenue
    term only). The part filter lands before the join (pushdown); part /
    supplier / nation are broadcast; the only big exchange is
    lineitem⋈orders on orderkey, then a small (nation × year) aggregate."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("profit"))
    )


@register(
    "q11_important_value",
    tags=("join", "subquery", "aggregate"),
    oracle="""
WITH asia_value AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, value
FROM asia_value
WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) * 0.001
               FROM asia_value)
""",
)
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-style important-stock scan (fixture-adapted: value is
    ASIA-supplied discounted revenue per part instead of partsupp cost ×
    qty). The global threshold is an uncorrelated scalar aggregate over
    the SAME per-part frame — computed once and crossed in as a 1-row
    broadcast, so the per-part aggregate is not recomputed. The heavy
    exchange is one groupBy(l_partkey)."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("value"))
    )
    # decimal-exact total: a plain double SUM is order-dependent across
    # Spark's partial-agg combine order vs DuckDB's sequential sum, and a
    # borderline part could flip across the 0.1% threshold
    threshold = per_part.agg(
        (F.sum(F.col("value").cast("decimal(18,4)")).cast("double") * 0.001).alias(
            "threshold"
        )
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


@register(
    "q12_late_shipments",
    tags=("join", "aggregate"),
    oracle="""
SELECT l_returnflag,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
""",
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-style late-shipment priority split (fixture-adapted:
    grouped by returnflag — there is no shipmode column). The year filter
    prunes the lineitem scan; the late predicate is a join-time interval
    comparison; the priority split is one conditional aggregate over a
    3-row group domain."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    tags=("join", "subquery", "aggregate"),
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-style top supplier: the revenue "view" is one aggregate
    over the pruned half-year scan; the MAX is an uncorrelated scalar over
    that same frame, crossed in as a 1-row broadcast. Revenue totals are
    exact decimal sums, so the equality-to-max predicate (ties included,
    per the spec) is engine-exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_part_supplier_diversity",
    tags=("join", "aggregate", "distinct"),
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 7, 14, 23, 36, 45, 49, 50)
  AND s_acctbal >= 0
GROUP BY p_brand, p_type, p_size
""",
)
def q16_part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style supplier diversity per (brand, type, size)
    (fixture-adapted: the part↔supplier relation comes from lineitem; the
    excluded-supplier complaint filter becomes a negative-balance filter).
    Distinct-count aggregate over broadcast-joined dims — the expensive
    part is the two-phase distinct on (group, suppkey)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 7, 14, 23, 36, 45, 49, 50))
    )
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_quantity_share_suppliers",
    tags=("join", "aggregate", "semi"),
    oracle="""
WITH red_qty AS (
  SELECT l_suppkey, SUM(l_quantity) AS total_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, n_name, total_qty
FROM red_qty
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE total_qty > 500
""",
)
def q20_quantity_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style: suppliers who moved significant volume of a
    product line in a year (fixture-adapted: the partsupp availqty
    half-of-stock predicate becomes an absolute volume threshold).
    Aggregate-then-filter (HAVING) on the supplier key, with part as a
    broadcast pre-join filter; l_quantity is integer-valued in the
    fixtures so SUM is exact in both engines."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 500)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name", "total_qty")
    )


@register(
    "q8_market_share",
    tags=("join", "aggregate", "conditional"),
    oracle="""
WITH volumes AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey AND p_type = 'ECONOMY'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM volumes
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style national market share: NATION_3's share of ECONOMY
    part volume sold into AMERICA-region customers, by order year. The
    classic two-nation-role join: nation joins once on the supplier side
    (the share dimension) and once on the customer side (the market
    filter). Dims (part, supplier, both nation roles, region) broadcast;
    the two big exchanges are lineitem⋈orders on orderkey and
    orders⋈customer on custkey — at 100 TB both are the natural shuffle
    keys and AQE handles their relative sizing. The ratio divides two
    decimal-exact sums AFTER casting each to double, so both engines
    perform one identical IEEE division per group."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    # customer-side market filter: customers in AMERICA-region nations
    cust_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_nationkey"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cn_nationkey")
    ).select("c_custkey")
    supp_nation = supp.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    volume = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,4)")
    volumes = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    target = F.when(
        F.col("supp_nation") == "NATION_3", F.col("volume")
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return volumes.groupBy("o_year").agg(
        (
            F.sum(target).cast("double") / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )
