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
