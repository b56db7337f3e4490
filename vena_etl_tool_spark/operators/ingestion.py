"""Oracle-checked ingest queries (SURVEY.md §A5/A6 — the reference's
flagship behavior, upgraded).

The reference validates a CSV's existence/extension and then uploads the
raw bytes blindly (/root/reference/src/utils/fileHandling.js:12-47); our
ingest is a typed PERMISSIVE Spark scan that quarantines malformed rows
instead of silently proceeding (pipeline/ingest.py). This module gives
that path a hard correctness row: good-per-label and quarantined counts
over a committed fixture CSV with known-bad rows, differentially checked
against DuckDB applying the identical corruption predicate (TRY_CAST
failure on any typed column) to the same file.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..pipeline.ingest import ingest_csv
from ..pipeline.spec import PipelineSpec
from ..registry import register

FIXTURE_CSV = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "quarantine_demo.csv",
)

_QUARANTINE_SPEC = PipelineSpec(
    spec_id="quarantine-demo",
    name="Quarantine demo CSV",
    description="3-column typed CSV with deliberately malformed numerics",
    schema=T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("label", T.StringType()),
        ]
    ),
    target="quarantine_demo",
)


@register(
    "ingest_quarantine_counts",
    tags=("ingest", "quarantine", "pipeline"),
    oracle=f"""
WITH raw AS (
  SELECT * FROM read_csv('{FIXTURE_CSV}', header=true, all_varchar=true)
), tagged AS (
  SELECT label,
         (TRY_CAST(id AS BIGINT) IS NULL OR TRY_CAST(amount AS DOUBLE) IS NULL) AS corrupt
  FROM raw
)
SELECT 'good:' || label AS bucket, COUNT(*) AS n
FROM tagged WHERE NOT corrupt GROUP BY label
UNION ALL
SELECT 'quarantined' AS bucket, COUNT(*) AS n
FROM tagged WHERE corrupt
""",
)
def ingest_quarantine_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE typed CSV ingest with corrupt-record quarantine: rows
    whose `id`/`amount` fail the schema cast land in the quarantine frame
    (raw text preserved for replay), everything else loads typed. Output
    is the per-label good count plus the quarantine total — the load
    report a 100 TB ingest job would emit. `sf_dir` is unused: the input
    is a committed fixture with known-bad rows so the corruption
    predicate itself is what gets differentially checked."""
    res = ingest_csv(spark, FIXTURE_CSV, _QUARANTINE_SPEC)
    good = (
        res.good.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.concat(F.lit("good:"), F.col("label")).alias("bucket"), "n")
    )
    quarantined = res.quarantine.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("quarantined").alias("bucket"), "n"
    )
    return good.unionByName(quarantined)


LOYALTY_GOLD_CENTS = 500_000  # acctbal >= $5k -> gold in the evolved schema


@register(
    "ingest_schema_evolution",
    tags=("ingest", "layout", "schema", "sink"),
    oracle=f"""
WITH b1 AS (
  SELECT c_custkey, c_name, c_nationkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
  FROM customer WHERE c_custkey % 2 = 0
), b2 AS (
  SELECT c_custkey, c_nationkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents,
         c_mktsegment,
         CASE WHEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   >= {LOYALTY_GOLD_CENTS}
              THEN 'gold' ELSE 'standard' END AS loyalty_tier
  FROM customer WHERE c_custkey % 2 = 1
), merged AS (
  SELECT c_custkey, c_name, c_nationkey, bal_cents,
         NULL AS c_mktsegment, NULL AS loyalty_tier FROM b1
  UNION ALL
  SELECT c_custkey, NULL, c_nationkey, bal_cents,
         c_mktsegment, loyalty_tier FROM b2
), counts AS (
  SELECT 'c_custkey' AS column_name, COUNT(*) AS n_total,
         COUNT(c_custkey) AS n_present FROM merged
  UNION ALL
  SELECT 'c_name', COUNT(*), COUNT(c_name) FROM merged
  UNION ALL
  SELECT 'c_nationkey', COUNT(*), COUNT(c_nationkey) FROM merged
  UNION ALL
  SELECT 'bal_cents', COUNT(*), COUNT(bal_cents) FROM merged
  UNION ALL
  SELECT 'c_mktsegment', COUNT(*), COUNT(c_mktsegment) FROM merged
  UNION ALL
  SELECT 'loyalty_tier', COUNT(*), COUNT(loyalty_tier) FROM merged
)
SELECT column_name,
       CAST(n_total AS BIGINT) AS n_total,
       CAST(n_present AS BIGINT) AS n_present,
       CAST(n_present * 1000000 // n_total AS BIGINT) AS coverage_ppm
FROM counts
""",
)
def ingest_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution through the ingest path, end-to-end from disk:
    batch 1 lands with the ORIGINAL schema (custkey, name, nationkey,
    balance cents); batch 2 lands with the EVOLVED one (name dropped,
    market segment + a derived loyalty_tier added); the table then reads
    back with mergeSchema=true — Spark's union-by-name file-schema
    reconciliation — and the audit reports per-column presence and
    coverage ppm over the merged view. This is the drift a long-lived
    ingest pipeline actually faces (producers upgrade one at a time);
    the oracle simulates the same two-schema union relationally, so a
    hash match proves Spark's merged read fills absent columns with
    NULLs and aligns by NAME, never by position.

    Scale: two partition-local writes (no shuffle: the even/odd split is
    a filter), one merged scan with footer-level schema union (cost ~
    one footer read per file, not a data pass), and a column-grain
    unpivot aggregate. mergeSchema's cost at 100 TB is the footer
    listing; production pins the merged schema in a catalog after first
    contact — the audit here IS that first-contact report."""
    from ..catalog import load_table
    from .layouts import layout_dir

    src = load_table(spark, sf_dir, "customer")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    root = layout_dir(sf_dir, "schema_evolution")
    b1 = src.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", "c_nationkey", cents.alias("bal_cents")
    )
    b2 = src.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey",
        "c_nationkey",
        cents.alias("bal_cents"),
        "c_mktsegment",
        F.when(cents >= LOYALTY_GOLD_CENTS, "gold")
        .otherwise("standard")
        .alias("loyalty_tier"),
    )
    b1.write.mode("overwrite").parquet(os.path.join(root, "batch=1"))
    b2.write.mode("overwrite").parquet(os.path.join(root, "batch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "batch=1"), os.path.join(root, "batch=2")
    )
    cols = [
        "c_custkey",
        "c_name",
        "c_nationkey",
        "bal_cents",
        "c_mktsegment",
        "loyalty_tier",
    ]
    stack_expr = "stack({n}, {args}) as (column_name, v)".format(
        n=len(cols),
        args=", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols),
    )
    return (
        merged.selectExpr(stack_expr)
        .groupBy("column_name")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("v").alias("n_present"),
        )
        .select(
            "column_name",
            F.col("n_total").cast("long").alias("n_total"),
            F.col("n_present").cast("long").alias("n_present"),
            F.expr("CAST(n_present * 1000000 div n_total AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
    )
