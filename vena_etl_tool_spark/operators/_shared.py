"""Shared helpers for operator modules.

Numeric discipline for the DuckDB differential oracle: aggregate in exact
DECIMAL, ship DOUBLE. A per-row double expression (e.g. price * (1-disc)) is
bit-deterministic in both engines, so casting each row to DECIMAL before a
sum makes the aggregate order-insensitive and exact; the final cast back to
DOUBLE is again deterministic and gives both engines the same wire type.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-insensitive sum of a double column: exact decimal accumulate,
    double out. Equivalent DuckDB SQL:
    ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def spread_small(df: "DataFrame") -> "DataFrame":
    """Repartition a narrow input up to the session's default parallelism.

    A small or single-file table scans into fewer partitions than cores,
    serializing every downstream map stage (LSH projections, shingle
    explodes) onto one thread. At real scale the input partitioning
    already exceeds parallelism and this is a no-op — it never adds a
    shuffle for a big corpus, only for inputs too narrow to saturate the
    cluster (where the shuffle is cheap by construction).
    """
    try:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no SparkContext — let AQE size stages
        return df
    # File count is a Connect-safe proxy for scan parallelism (a `.rdd`
    # probe would force a driver-side plan conversion during build). A scan
    # over fewer files than cores cannot saturate the cluster; at real
    # scale inputs have >> cores files and this is a no-op.
    if len(df.inputFiles()) < parallelism:
        return df.repartition(parallelism)
    return df


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-insensitive average: exact decimal sum / count, in double.
    Equivalent DuckDB SQL:
    ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)
