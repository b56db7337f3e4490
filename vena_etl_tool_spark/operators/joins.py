"""Join operators (SURVEY.md §B.3) — every join kind, Spark-first.

Scale design notes (100 TB):
- Small dims (region, nation, supplier) are wrapped in ``F.broadcast`` so
  the fact-side scan never shuffles for them.
- Fact⋈fact equi-joins (orders⋈lineitem) shuffle on the join key; AQE
  (enabled in session.py) handles skew splitting and partition coalescing.
- The range join buckets the probe value onto the band prefix so Catalyst
  plans an equi-join + residual filter instead of a broadcast nested loop.
- The as-of join is the union/last_value trick: one shuffle on
  (user_id), no per-row subquery, no nested loop — the scalable pattern
  for "most recent prior event" at any data size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..registry import register
from ._shared import dsum

Q3_DATE = "1997-06-01"


@register(
    "q3_shipping_priority",
    tags=("join", "aggregate", "topk"),
    oracle=f"""
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style: 3-way equi-join → aggregate → top-k with a total
    order (revenue is decimal-exact so the DESC sort is deterministic)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit(Q3_DATE).cast("timestamp_ntz")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("c_custkey") == F.col("o_custkey"))
        .join(li.filter(F.col("l_shipdate") > cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    tags=("join", "aggregate", "broadcast"),
    oracle="""
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style 6-way join; all dimension sides broadcast so the only
    shuffles are the two fact-fact exchanges and the final aggregate."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


@register(
    "join_left_outer",
    tags=("join",),
    oracle="""
SELECT
  c_custkey,
  COUNT(o_orderkey) AS n_orders,
  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
GROUP BY c_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with an extra join-side predicate; customers with no
    finished orders survive with n_orders=0."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderstatus") == "F"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "join_right_outer",
    tags=("join",),
    oracle="""
SELECT n_name, c_custkey
FROM (SELECT * FROM customer WHERE c_acctbal > 9500) c
RIGHT JOIN nation ON c_nationkey = n_nationkey
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join: every nation survives even with no rich customer
    (null c_custkey)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9500)
    nation = load_table(spark, sf_dir, "nation")
    return cust.join(
        nation, F.col("c_nationkey") == F.col("n_nationkey"), "right"
    ).select("n_name", "c_custkey")


@register(
    "join_full_outer",
    tags=("join",),
    oracle="""
SELECT
  COALESCE(h.c_nationkey, b.c_nationkey) AS nationkey,
  COALESCE(h.n_house, 0) AS n_house,
  COALESCE(b.n_build, 0) AS n_build
FROM
  (SELECT c_nationkey, COUNT(*) AS n_house FROM customer
   WHERE c_mktsegment = 'HOUSEHOLD' GROUP BY c_nationkey) h
FULL OUTER JOIN
  (SELECT c_nationkey, COUNT(*) AS n_build FROM customer
   WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey) b
ON h.c_nationkey = b.c_nationkey
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates with disjoint key coverage."""
    cust = load_table(spark, sf_dir, "customer")
    house = (
        cust.filter(F.col("c_mktsegment") == "HOUSEHOLD")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_house"))
    )
    build = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_build"))
    )
    return house.join(build, "c_nationkey", "outer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.coalesce("n_house", F.lit(0)).alias("n_house"),
        F.coalesce("n_build", F.lit(0)).alias("n_build"),
    )


@register(
    "join_semi",
    tags=("join",),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with ≥1 urgent order. Semi joins
    never duplicate the probe side, so no post-dedup is needed."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    tags=("join",),
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders since 2000."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "join_cross",
    tags=("join",),
    oracle="""
SELECT r_name, seg.c_mktsegment AS segment
FROM region
CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny relations (BroadcastNestedLoopJoin).
    Cross joins are only ever safe when one side is provably small."""
    region = load_table(spark, sf_dir, "region").select("r_name")
    segs = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
    )
    return region.crossJoin(segs)


@register(
    "join_range_bands",
    tags=("join", "range-join"),
    oracle="""
SELECT b.band_name, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_total
FROM orders o
JOIN (VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 300000.0),
             ('high', 300000.0, 1000000000.0)) AS b(band_name, lo, hi)
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band_name
""",
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join of a fact against interval bands. The band table
    is broadcast, so the non-equi condition is evaluated map-side — no
    shuffle, no nested loop over big×big."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 1e5), ("mid", 1e5, 3e5), ("high", 3e5, 1e9)],
        "band_name string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("band_total"),
        )
    )


@register(
    "join_asof_last_click",
    tags=("join", "asof"),
    oracle="""
SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent prior (or simultaneous)
    click by the same user. Implemented with the union + last_value(ignore
    nulls) pattern: a single shuffle on user_id, linear state, no nested
    loop — this is the 100 TB-safe as-of strategy (SURVEY.md §B.3). The
    oracle is DuckDB's native ASOF JOIN, so the window rewrite is checked
    against a real as-of implementation, not a correlated-subquery
    emulation."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("click_ts"), F.lit(0).alias("side"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("timestamp_ntz").alias("click_ts"), F.lit(1).alias("side"),
    )
    # side=0 sorts clicks before purchases at equal ts → "<=" semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


@register(
    "join_range_bucketized",
    tags=("join", "range-join", "interval"),
    oracle="""
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
)
SELECT a.event_id AS event_a, b.event_id AS event_b,
       b.sec - a.sec AS gap_sec
FROM e a
JOIN e b
  ON a.user_id = b.user_id
 AND b.sec > a.sec AND b.sec <= a.sec + 60
 AND a.event_id <> b.event_id
""",
)
def join_range_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big×big interval self-join via the equi-prefix (bucketize) rewrite
    — SURVEY.md §4.2's at-scale range-join strategy, as a registered plan:
    pairs of events by the same user within 60 seconds, at the operator's
    declared SECOND granularity (both sides compare floor-epoch-seconds;
    an oracle on raw sub-second timestamps diverges the moment the data
    has two events inside one second — which sf0.1 does and sf0.01 does
    not, a latent mismatch the sf0.1 sweep caught in round 4).

    A naive theta join (u = u AND ts diff ≤ 60s) on two fact-sized inputs
    is a nested loop over every user's full history. The rewrite buckets
    time into 60 s cells and equi-joins on (user_id, cell) for each of the
    two cells a 60 s window can touch (b's cell = a's or a's + 1), then
    applies the exact interval predicate to the tiny per-bucket candidate
    set. Every join is a plain shuffled equi-join; worst-case work is
    bounded by events-per-(user, minute)², never history²."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    base = ev.select(
        "event_id", "user_id", "ts", sec.alias("sec"), (sec / 60).cast("long").alias("cell")
    )
    # side a explodes to the 2 cells its 60s look-ahead window can reach;
    # side b keeps its single home cell → candidates = equi-join on
    # (user_id, cell)
    a = base.select(
        F.col("event_id").alias("event_a"),
        "user_id",
        F.col("sec").alias("sec_a"),
        F.explode(F.array(F.col("cell"), F.col("cell") + 1)).alias("cell"),
    )
    b = base.select(
        F.col("event_id").alias("event_b"),
        "user_id",
        F.col("sec").alias("sec_b"),
        "cell",
    )
    return (
        a.join(b, ["user_id", "cell"])
        .filter(
            (F.col("sec_b") > F.col("sec_a"))
            & (F.col("sec_b") <= F.col("sec_a") + 60)
            & (F.col("event_a") != F.col("event_b"))
        )
        .select("event_a", "event_b", (F.col("sec_b") - F.col("sec_a")).alias("gap_sec"))
    )


@register(
    "merge_upsert_actions",
    tags=("join", "outer", "merge"),
    oracle="""
WITH target AS (
  SELECT c_custkey, c_acctbal FROM customer
), updates AS (
  SELECT o_custkey AS u_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS new_balance
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  GROUP BY o_custkey
)
SELECT COALESCE(c_custkey, u_custkey) AS custkey,
       CASE WHEN c_custkey IS NULL THEN 'insert'
            WHEN u_custkey IS NULL THEN 'keep'
            ELSE 'update' END AS action,
       CASE WHEN u_custkey IS NULL THEN c_acctbal ELSE new_balance END
         AS merged_balance
FROM target FULL OUTER JOIN updates ON c_custkey = u_custkey
""",
)
def merge_upsert_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE/upsert semantics (WHEN MATCHED UPDATE / NOT MATCHED
    INSERT / NOT MATCHED BY SOURCE KEEP) expressed as a single full outer
    join — the engine-level rewrite behind every table-format MERGE. The
    updates side is an aggregate of the late-window orders; both sides
    hash-partition on the merge key, so the merge is one shuffle each
    side and the action tagging is pure projection."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    updates = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
        .groupBy(F.col("o_custkey").alias("u_custkey"))
        .agg(dsum("o_totalprice").alias("new_balance"))
    )
    joined = cust.join(
        updates, F.col("c_custkey") == F.col("u_custkey"), "full_outer"
    )
    action = (
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("u_custkey").isNull(), "keep")
        .otherwise("update")
    )
    return joined.select(
        F.coalesce("c_custkey", "u_custkey").alias("custkey"),
        action.alias("action"),
        F.when(F.col("u_custkey").isNull(), F.col("c_acctbal"))
        .otherwise(F.col("new_balance"))
        .alias("merged_balance"),
    )


@register(
    "join_null_safe",
    tags=("join", "null-safe"),
    oracle="""
WITH keyed AS (
  SELECT event_id,
         NULLIF(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10, 3)
           AS k_bucket,
         value
  FROM events
), dim AS (
  SELECT k_bucket,
         COUNT(*) AS bucket_n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
  FROM keyed GROUP BY k_bucket
)
SELECT k.event_id, k.k_bucket, d.bucket_n, d.bucket_value
FROM keyed k
JOIN dim d ON k.k_bucket IS NOT DISTINCT FROM d.k_bucket
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): rows
    whose derived bucket key is NULL must match the dimension's NULL
    group instead of silently dropping — the semantics a data-quality
    rollup needs when the grouping key itself can be absent. Catalyst
    hashes null-safe keys by coalescing into a hashable form, so this
    still plans a broadcast HASH join, not a nested loop (plan-tested).
    The dimension is built by aggregating the same nullable key (the
    NULL group aggregates normally), so every fact row matches exactly
    one dim row and the output is the input cardinality."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_id",
        F.expr(
            "nullif(cast(get_json_object(props, '$.k') as int) % 10, 3)"
        ).alias("k_bucket"),
        "value",
    )
    dim = keyed.groupBy("k_bucket").agg(
        F.count(F.lit(1)).alias("bucket_n"),
        dsum("value", 2).alias("bucket_value"),
    ).select(
        F.col("k_bucket").alias("d_bucket"), "bucket_n", "bucket_value"
    )
    return (
        keyed.join(
            F.broadcast(dim), F.col("k_bucket").eqNullSafe(F.col("d_bucket"))
        )
        .select("event_id", "k_bucket", "bucket_n", "bucket_value")
    )


@register(
    "join_interval_overlap",
    tags=("join", "range-join", "interval", "overlap"),
    oracle="""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
), marked AS (
  SELECT user_id, sec,
         CASE WHEN sec - LAG(sec) OVER w > 1800
                OR LAG(sec) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)
), sessions AS (
  SELECT user_id, MIN(sec) AS s_start, MAX(sec) AS s_end
  FROM (SELECT user_id, sec,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY sec
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked)
  GROUP BY user_id, session_no
), bounds AS (
  SELECT CAST(MIN(sec) // 3600 AS BIGINT) AS h0,
         CAST(MAX(sec) // 3600 AS BIGINT) AS h1
  FROM e
), windows AS (
  SELECT h * 3600 + 600 AS w_start, h * 3600 + 1199 AS w_end
  FROM (SELECT unnest(generate_series(h0, h1)) AS h FROM bounds)
)
SELECT s.user_id, s.s_start, s.s_end, w.w_start,
       LEAST(s.s_end, w.w_end) - GREATEST(s.s_start, w.w_start) + 1
         AS overlap_sec
FROM sessions s JOIN windows w
  ON s.s_start <= w.w_end AND w.w_start <= s.s_end
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval OVERLAP join — the third temporal-join class next
    to as-of (point-in-time) and range-bucketized (point-in-interval):
    user activity sessions (gaps-and-islands, 30-min gap, second
    granularity like sessionize_events) overlapped against deterministic
    hourly maintenance windows ([h:10:00, h:19:59] each hour of the data
    span), reporting the exact overlap seconds — the shape behind
    "which sessions did the maintenance window clip?".

    At-scale rewrite (the oracle states the naive theta join; results are
    identical): each window lies inside exactly one hour, so sessions
    explode to the hours they span and candidates come from a plain
    equi-join on the hour — lossless, since any overlapping pair shares
    the window's hour. Work is bounded by sessions-per-hour × windows-
    per-hour, never sessions × windows; a pathological months-long
    session costs span/3600 candidate rows, not a scan of all windows.
    All arithmetic is integer seconds — no float anywhere. Precondition:
    nonnegative epoch seconds (the fixture contract) — `div` truncates
    toward zero, so pre-1970 timestamps would need floor-div bucketing
    for the hour-explode to stay lossless."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    e = ev.select("user_id", sec.alias("sec"))
    w = Window.partitionBy("user_id").orderBy("sec")
    gap = F.col("sec") - F.lag("sec").over(w)
    marked = e.select(
        "user_id",
        "sec",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_session"),
    )
    run_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        marked.withColumn("session_no", F.sum("new_session").over(run_w))
        .groupBy("user_id", "session_no")
        .agg(F.min("sec").alias("s_start"), F.max("sec").alias("s_end"))
    )
    bounds = e.agg(
        F.expr("min(sec) div 3600").alias("h0"), F.expr("max(sec) div 3600").alias("h1")
    )
    windows = bounds.select(
        F.explode(F.sequence("h0", "h1")).alias("h")
    ).select(
        (F.col("h") * 3600 + 600).alias("w_start"),
        (F.col("h") * 3600 + 1199).alias("w_end"),
        F.col("h").alias("w_hour"),
    )
    cand = sessions.withColumn(
        "h", F.explode(F.sequence(F.expr("s_start div 3600"), F.expr("s_end div 3600")))
    )
    joined = cand.join(windows, F.col("h") == F.col("w_hour")).filter(
        (F.col("s_start") <= F.col("w_end")) & (F.col("w_start") <= F.col("s_end"))
    )
    return joined.select(
        "user_id",
        "s_start",
        "s_end",
        "w_start",
        (
            F.least("s_end", "w_end") - F.greatest("s_start", "w_start") + 1
        ).alias("overlap_sec"),
    )


ASOF_TOLERANCE_SEC = 1800  # max staleness for a click to still count


@register(
    "join_asof_tolerance",
    tags=("join", "asof", "tolerance"),
    oracle=f"""
SELECT p.event_id, p.user_id, p.ts,
       CASE WHEN c.ts >= p.ts - INTERVAL {ASOF_TOLERANCE_SEC} SECOND
            THEN c.ts END AS last_click_ts,
       c.ts IS NOT NULL
         AND c.ts >= p.ts - INTERVAL {ASOF_TOLERANCE_SEC} SECOND
         AS had_recent_click
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a staleness tolerance — the missing half of the
    as-of API surface (pandas merge_asof's ``tolerance=``): for each
    purchase, the most recent prior click by the same user counts only
    if it happened within ASOF_TOLERANCE_SEC; older matches return NULL
    exactly like no match (attribution windows, sensor-reading
    freshness). Same single-shuffle union + last_value(ignore nulls)
    rewrite as join_asof_last_click — the tolerance is a pure
    post-projection mask on the matched timestamp, so the 100 TB plan
    is IDENTICAL to the untolerated as-of (one exchange on user_id,
    linear window state, no nested loop). The oracle applies the same
    mask over DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("click_ts"), F.lit(0).alias("side"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("timestamp_ntz").alias("click_ts"), F.lit(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cutoff = F.expr(f"ts - INTERVAL {ASOF_TOLERANCE_SEC} SECOND")
    matched = (
        clicks.unionByName(purchases)
        .withColumn("asof_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
    )
    return matched.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("asof_ts") >= cutoff, F.col("asof_ts")).alias(
            "last_click_ts"
        ),
        (F.col("asof_ts").isNotNull() & (F.col("asof_ts") >= cutoff)).alias(
            "had_recent_click"
        ),
    )


# Nearest-direction as-of: how far (µs) a match may sit on EITHER side
# of the probe before it stops counting.
ASOF_NEAREST_TOL_SEC = 7200


@register(
    "join_asof_nearest",
    tags=("join", "asof", "nearest"),
    oracle=f"""
WITH p AS (
  SELECT event_id, user_id, ts, epoch_us(ts) AS tus
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(ts) AS cus FROM events WHERE event_type = 'click'
), b AS (
  SELECT p.event_id, MAX(c.cus) AS back_us
  FROM p JOIN c ON c.user_id = p.user_id AND c.cus <= p.tus
  GROUP BY p.event_id
), f AS (
  SELECT p.event_id, MIN(c.cus) AS fwd_us
  FROM p JOIN c ON c.user_id = p.user_id AND c.cus > p.tus
  GROUP BY p.event_id
), picked AS (
  SELECT p.event_id, p.user_id, p.ts, p.tus, b.back_us, f.fwd_us,
         CASE
           WHEN b.back_us IS NULL AND f.fwd_us IS NULL THEN NULL
           WHEN f.fwd_us IS NULL THEN b.back_us
           WHEN b.back_us IS NULL THEN f.fwd_us
           WHEN p.tus - b.back_us <= f.fwd_us - p.tus THEN b.back_us
           ELSE f.fwd_us
         END AS near_us
  FROM p LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
)
SELECT event_id, user_id, ts,
       CASE WHEN abs(near_us - tus) <= {ASOF_NEAREST_TOL_SEC * 1000000}
            THEN near_us END AS nearest_click_us,
       CASE WHEN abs(near_us - tus) <= {ASOF_NEAREST_TOL_SEC * 1000000}
            THEN near_us - tus END AS delta_us,
       CASE WHEN abs(near_us - tus) <= {ASOF_NEAREST_TOL_SEC * 1000000}
            THEN (CASE WHEN near_us <= tus THEN 'backward' ELSE 'forward' END)
       END AS direction
FROM picked
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof
    ``direction='nearest'``): for each purchase, the click by the same
    user with the smallest |Δt| in EITHER direction — ties go backward
    (the causal default) — masked to NULL beyond a tolerance. The sensor
    -fusion/alignment primitive the backward-only as-of can't express.

    Plan: the same single-shuffle union rewrite as join_asof_last_click,
    with TWO frames over ONE (user_id, ts, side) sort — backward
    last_value(ignorenulls) over the preceding frame, forward
    first_value over the following frame (a click at exactly the
    purchase ts sorts before it, so Δ=0 lands backward — the oracle's
    `cus <= tus` branch states the same rule). No join at all: one
    exchange of the fact table, linear window state, then pure
    projection arithmetic in exact epoch-µs integers. At 100 TB this
    beats the two-ASOF-joins formulation by a full shuffle and never
    materializes candidate pairs."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("click_ts"), F.lit(0).alias("side"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast(clicks.schema["click_ts"].dataType).alias("click_ts"),
        F.lit(1).alias("side"),
    )
    base = Window.partitionBy("user_id").orderBy("ts", "side")
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    matched = (
        clicks.unionByName(purchases)
        .withColumn("_back", F.last("click_ts", ignorenulls=True).over(w_back))
        .withColumn("_fwd", F.first("click_ts", ignorenulls=True).over(w_fwd))
        .filter(F.col("side") == 1)
    )
    # ts loads as TIMESTAMP_NTZ on pyspark 4.1; unix_micros wants a tz'd
    # TIMESTAMP — the session tz is pinned UTC, so the cast is the exact
    # epoch_us DuckDB computes on the naive value
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    back_us = F.unix_micros(F.col("_back").cast("timestamp"))
    fwd_us = F.unix_micros(F.col("_fwd").cast("timestamp"))
    near_us = (
        F.when(back_us.isNull() & fwd_us.isNull(), F.lit(None).cast("long"))
        .when(fwd_us.isNull(), back_us)
        .when(back_us.isNull(), fwd_us)
        .when(tus - back_us <= fwd_us - tus, back_us)
        .otherwise(fwd_us)
    )
    tol = ASOF_NEAREST_TOL_SEC * 1_000_000
    picked = matched.withColumn("_near", near_us).withColumn("_tus", tus)
    in_tol = F.abs(F.col("_near") - F.col("_tus")) <= tol
    return picked.select(
        "event_id",
        "user_id",
        "ts",
        F.when(in_tol, F.col("_near")).alias("nearest_click_us"),
        F.when(in_tol, F.col("_near") - F.col("_tus")).alias("delta_us"),
        F.when(
            in_tol,
            F.when(F.col("_near") <= F.col("_tus"), F.lit("backward")).otherwise(
                F.lit("forward")
            ),
        ).alias("direction"),
    )
