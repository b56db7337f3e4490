"""Dry-run of the external correctness driver, end to end.

The driver imports ``__spark_entry__`` with a BARE SparkSession (none of
this repo's engine confs), evaluates the first 50 entries of ``queries()``
at sf0.01, and hash-compares each against its ``oracle_sql()`` twin in
DuckDB. The local gate (``python -m vena_etl_tool_spark.testing``) covers
the comparison logic but builds its session via ``session.get_spark`` —
this script removes that last difference by running the identical sweep
under the driver's session posture, so a conf-dependent query can't pass
locally and fail the round gate.

Usage: python tools/driver_dryrun.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    # Bare session: mirrors the driver — no UTC pin, no AQE overrides, no
    # Arrow conf; anything a query needs must be set by the query path
    # itself (session.configure is called inside streaming sources etc.).
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .appName("driver-dryrun")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vena_etl_tool_spark.registry import all_specs
    from vena_etl_tool_spark.testing import diff_query, duckdb_connection

    specs = list(all_specs().items())[:n]
    con = duckdb_connection(sf_dir)
    bad = 0
    for name, spec in specs:
        try:
            res = diff_query(spark, con, spec, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: EXCEPTION {type(e).__name__}: {e}")
            bad += 1
            continue
        if res.ok:
            print(f"PASS {name}: {res.detail}")
        else:
            print(f"FAIL {name}: {res.detail}")
            bad += 1
    print(f"{len(specs) - bad}/{len(specs)} window queries pass (bare session) at {sf_dir}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
