"""Streaming state-store posture (r8 verdict #7): the stateful operators
must produce identical results under the RocksDB provider — the one a
100 TB deployment runs — as under the default HDFS-backed (heap) store,
and the VENA_ETL_STATE_STORE toggle must actually reach the session conf.

The provider is a per-query conf captured into each stream's checkpoint
at first start; every registered stream uses a fresh checkpoint per call,
so flipping the session conf between runs genuinely switches providers.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from vena_etl_tool_spark.session import (
    ROCKSDB_PROVIDER,
    _STATE_STORE_KEY,
    _state_store_overrides,
    configure,
)
from vena_etl_tool_spark.streaming.stateful import (
    _state_store_provider,
    stream_stateful_running_totals,
)

SF_DIR = "/root/testdata/sf0.001"


def _totals(spark):
    rows = stream_stateful_running_totals(spark, SF_DIR).collect()
    return {r.user_id: (r.n_events, r.total_value) for r in rows}


def test_stateful_op_same_result_under_rocksdb(spark):
    # applyInPandasWithState under the default (heap) provider vs RocksDB:
    # bit-identical per-user running totals, both equal to the batch agg.
    default_run = _totals(spark)
    assert spark.conf.get(_STATE_STORE_KEY) != ROCKSDB_PROVIDER
    with _state_store_provider(spark):
        assert spark.conf.get(_STATE_STORE_KEY) == ROCKSDB_PROVIDER
        rocks_run = _totals(spark)
    assert spark.conf.get(_STATE_STORE_KEY) != ROCKSDB_PROVIDER  # restored
    assert rocks_run == default_run

    batch = {
        r.user_id: (r.n_events, r.total_value)
        for r in (
            spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_value"),
            )
        ).collect()
    }
    assert rocks_run == batch


def test_state_store_env_toggle_reaches_session_conf(spark):
    prev_env = os.environ.get("VENA_ETL_STATE_STORE")
    prev_conf = spark.conf.get(_STATE_STORE_KEY)
    try:
        os.environ["VENA_ETL_STATE_STORE"] = "rocksdb"
        assert _state_store_overrides()[_STATE_STORE_KEY] == ROCKSDB_PROVIDER
        configure(spark)
        assert spark.conf.get(_STATE_STORE_KEY) == ROCKSDB_PROVIDER
    finally:
        if prev_env is None:
            os.environ.pop("VENA_ETL_STATE_STORE", None)
        else:
            os.environ["VENA_ETL_STATE_STORE"] = prev_env
        spark.conf.set(_STATE_STORE_KEY, prev_conf)
    # default posture: no override when the env var is absent
    assert _state_store_overrides() == {}
