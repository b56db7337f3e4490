"""Driver-parity regression test (VERDICT r2 item #3).

Round 2's ~20 red queries all traced to one environment drift: the
correctness driver builds a *bare* SparkSession (none of our engine confs),
and on pyspark 4.1+ the parquet TIMESTAMP(NANOS) column in `events` reads
natively as `timestamp_ntz` — `spark.sql.legacy.parquet.nanosAsLong` is
silently ignored, so the old long-nanos conversion path either crashed
(batch) or produced 1000×-compressed timelines (streaming).

This test subprocess-launches a bare session — no engine confs, exactly the
driver's posture — and asserts that both the batch loader and the streaming
source produce calendar-plausible 2024 timestamps. It fails on the r2 HEAD
and passes after the dtype-adaptive fix, so this class of drift can never
silently return.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

PROBE = textwrap.dedent(
    """
    import json, sys
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    # Bare session: the driver sets NO engine confs before calling us.
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .appName("driver-parity-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.streaming.queries import events_stream, run_to_table

    sf_dir = sys.argv[1]

    batch = load_table(spark, sf_dir, "events")
    brow = batch.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n")
    ).first()

    stream = run_to_table(
        events_stream(spark, sf_dir).select("event_id", "ts"),
        "parity_probe", "append",
    )
    srow = stream.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n")
    ).first()

    print(json.dumps({
        "batch_ts_dtype": dict(batch.dtypes)["ts"],
        "batch_lo": str(brow.lo), "batch_hi": str(brow.hi), "batch_n": brow.n,
        "stream_lo": str(srow.lo), "stream_hi": str(srow.hi), "stream_n": srow.n,
    }))
    spark.stop()
    """
)


def test_bare_session_events_timestamps_are_calendar_plausible(tmp_path):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"fixture dir {SF_DIR} not present")
    out = subprocess.run(
        [sys.executable, "-c", PROBE, SF_DIR],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO_ROOT,
        env={**os.environ, "PYTHONPATH": REPO_ROOT},
    )
    assert out.returncode == 0, f"probe crashed:\n{out.stderr[-3000:]}"
    payload = json.loads(out.stdout.strip().splitlines()[-1])

    assert payload["batch_ts_dtype"] == "timestamp_ntz"
    # fixture events span January 2024; a nanos-misread collapses to 1970,
    # a µs-as-ns misread compresses the whole month into ~43 minutes.
    assert payload["batch_lo"].startswith("2024-01"), payload
    assert payload["batch_hi"].startswith("2024-01"), payload
    assert payload["stream_lo"].startswith("2024-01"), payload
    assert payload["stream_hi"].startswith("2024-01"), payload
    # batch and stream must agree on the exact timeline endpoints and count
    assert payload["batch_lo"] == payload["stream_lo"], payload
    assert payload["batch_hi"] == payload["stream_hi"], payload
    assert payload["batch_n"] == payload["stream_n"] > 0, payload
