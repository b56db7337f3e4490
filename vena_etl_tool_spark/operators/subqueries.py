"""Subquery forms (SURVEY.md §4.2 — Catalyst decorrelation is one of the
free rewrites the engine leans on). Expressed via Spark SQL over registered
views; the identical SQL is the oracle, so the decorrelated plan is proven
equal to the naive correlated semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..registry import register

_CORRELATED_SCALAR = """
SELECT p_partkey, p_name, p_type, p_retailprice
FROM part p
WHERE p_retailprice < (
  SELECT AVG(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
)
"""


@register(
    "subquery_correlated_scalar",
    tags=("subquery", "decorrelation"),
    oracle=_CORRELATED_SCALAR,
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (cheaper-than-type-average parts);
    Catalyst decorrelates to an aggregate + join — no per-row re-scan."""
    register_views(spark, sf_dir, "part")
    return spark.sql(_CORRELATED_SCALAR)


_IN_SUBQUERY = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_acctbal < 0
)
AND o_orderkey NOT IN (
  SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49
)
"""


@register(
    "subquery_in_not_in",
    tags=("subquery", "decorrelation"),
    oracle=_IN_SUBQUERY,
)
def subquery_in_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries (planned as left-semi / null-aware anti
    join). NOT IN's three-valued-logic trap is real: the subquery column
    here is non-nullable, so the null-aware join degenerates safely."""
    register_views(spark, sf_dir, "orders", "customer", "lineitem")
    return spark.sql(_IN_SUBQUERY)


_LATERAL_STYLE = """
SELECT n_name, top_orders.o_orderkey, top_orders.o_totalprice
FROM nation
JOIN LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_nationkey = nation.n_nationkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 2
) AS top_orders ON TRUE
"""


@register(
    "subquery_lateral_topn",
    tags=("subquery", "lateral"),
    oracle=_LATERAL_STYLE,
)
def subquery_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL join: top-2 orders per nation — the correlated-table-
    subquery form of per-group top-k (same result as the window version)."""
    register_views(spark, sf_dir, "nation", "orders", "customer")
    return spark.sql(_LATERAL_STYLE)
