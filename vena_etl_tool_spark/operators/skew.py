"""Skew-handling patterns (SURVEY.md §4.2 / BASELINE mandate: "salting for
skew").

Two explicit techniques, each oracle-checked to prove the rewrite preserves
semantics:

- **salted aggregation**: groupBy(key) on a skewed key becomes
  groupBy(key, salt) partial → groupBy(key) final. Same two-exchange shape
  Spark already uses, but the salt bounds the *partial* partition size when
  one key dominates (AQE coalescing can't split a single running task).
- **salted broadcast-side replication join**: the skewed probe side gets a
  random-ish (but deterministic: hash-derived) salt; the small build side is
  replicated once per salt value. Join key becomes (key, salt) — the hot
  key's rows spread over SALT_BUCKETS tasks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register
from ._shared import dsum

SALT_BUCKETS = 8


@register(
    "skew_salted_aggregate",
    tags=("skew", "aggregate"),
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM lineitem
GROUP BY l_returnflag
""",
)
def skew_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a deliberately low-cardinality
    (i.e. maximally skewed) key: salt from a row-content hash so it is
    deterministic, partial-aggregate per (key, salt), then final-merge per
    key. Result is provably identical to the direct groupBy (the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT_BUCKETS))
    )
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("ptotal"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.sum("ptotal").cast("double").alias("total"),
    )


@register(
    "skew_salted_join",
    tags=("skew", "join"),
    oracle="""
SELECT n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replication join: probe side (customer, pretend-skewed on
    nationkey) gets a deterministic salt; build side (nation) is exploded
    once per salt bucket; the equi-join runs on (key, salt). Output equals
    the plain join — the salt only reshapes the shuffle."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "_salt", F.pmod(F.xxhash64("c_custkey"), F.lit(SALT_BUCKETS))
    )
    nation = (
        load_table(spark, sf_dir, "nation")
        .withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)])))
    )
    return (
        cust.join(
            nation,
            (F.col("c_nationkey") == F.col("n_nationkey")) & (cust["_salt"] == nation["_salt"]),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_balance"),
        )
    )
