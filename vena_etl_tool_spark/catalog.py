"""Typed loaders for the fixture tables (TESTDATA.md / FIXTURES.md).

The engine's analog of the reference's *template catalog*
(/root/reference/src/api/templates.js:47-125 lists/introspects remote
templates): here the catalog is a local registry of table specs, and
introspection is ``df.schema`` — see also pipeline/spec.py for the
user-facing pipeline-spec registry.

All loads are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning / partition pruning. The only normalization is
the `events.ts` nanosecond column (parquet TIMESTAMP(NANOS)), handled
**dtype-adaptively**: depending on the Spark build/confs the parquet
reader surfaces it either as BIGINT nanoseconds (older builds honoring
``spark.sql.legacy.parquet.nanosAsLong``) or natively as TIMESTAMP_NTZ
truncated to microseconds (pyspark 4.1+, where that conf is a no-op).
We branch on the *observed* dtype — never on the conf — and normalize to
``timestamp_ntz`` at microsecond precision, bit-identical to what
DuckDB's reader produces for the same file.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Small dimension tables: always broadcast-join these (well under the 10 MB
# default threshold at any SF; region/nation are fixed-size).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with engine-canonical types."""
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = df.withColumn("ts", _normalize_event_ts(dict(df.dtypes)["ts"]))
    return df


def _normalize_event_ts(loaded_dtype: str) -> F.Column:
    """Canonical `ts` expression for whatever dtype the reader produced.

    - ``bigint``: raw nanoseconds (nanosAsLong path) — integer `div`, not
      `/`, because ns epoch values exceed double's 2^53 mantissa; truncate
      to µs exactly as DuckDB does.
    - ``timestamp_ntz``: the reader already truncated ns → µs natively
      (pyspark 4.1+); pass through.
    - ``timestamp``: session-tz read; re-type to ntz (session tz is UTC so
      the wall clock is unchanged).
    """
    if loaded_dtype == "bigint":
        return F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    return F.col("ts").cast("timestamp_ntz")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
