"""SparkSession factory + session-level configuration.

Two call sites:

1. Our own tests / bench / CLI build a session via :func:`get_spark`.
2. The correctness driver hands us an *existing* session; :func:`configure`
   applies the runtime-settable confs we rely on (UTC timezone, ns-timestamp
   parquet compatibility, AQE) without rebuilding the session.

Scale notes (100 TB target): every conf set here is either runtime-settable
or a safe default on a real cluster. Shuffle partition count is only pinned
for local runs — on a cluster AQE coalescing
(``spark.sql.adaptive.coalescePartitions.enabled``) picks the real number
from the advisory partition size, so a hard-coded 32 never ships a bad plan
to a 1000-executor job.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and desirable) to set on any session at runtime.
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic timestamp semantics for the DuckDB differential oracle.
    "spark.sql.session.timeZone": "UTC",
    # The fixture `events` table stores TIMESTAMP(NANOS). Older Spark builds
    # honor this conf (ts reads as BIGINT ns); pyspark 4.1+ ignores it and
    # reads natively as TIMESTAMP_NTZ µs. Harmless either way — the loader
    # (catalog._normalize_event_ts) branches on the OBSERVED dtype, never on
    # this conf.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Adaptive execution: runtime re-plan, skew-join splitting, partition
    # coalescing. Core of the 100 TB story.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let the planner pick shuffled-hash join when its size conditions are
    # met instead of always sorting both sides (opt guide §3.1/§9; the
    # planner still falls back to sort-merge when no side can build a
    # local map, so the spill-safety story is size-gated, not forfeited).
    # OPTIMIZATION r11 A/B over a 20-query sample at sf0.1: 52.8-56.3 s
    # (base, two runs) -> 43.1 s; no sampled query regressed.
    "spark.sql.join.preferSortMergeJoin": "false",
    # Arrow for pandas UDF / toPandas paths.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}

# Streaming state-store posture (SCALE.md "state store" row). The provider
# choice is load-bearing at 100 TB key cardinality: the default HDFS-backed
# store keeps every key's state on the executor HEAP (state must fit in
# memory per partition), while RocksDB spills to local SSD and bounds
# checkpoint deltas via changelog checkpointing. The fixtures run fine on
# the default, so it stays the default locally; a deployment opts in with
# VENA_ETL_STATE_STORE=rocksdb (read at session build AND in configure(),
# so the driver-contract path honors it too). The conf is per-query — each
# stream captures it into its checkpoint at first start — which is also why
# stream_transform_with_state pins RocksDB for itself regardless (the TWS
# API requires it).
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_STATE_STORE_KEY = "spark.sql.streaming.stateStore.providerClass"


def _state_store_overrides() -> dict[str, str]:
    choice = os.environ.get("VENA_ETL_STATE_STORE", "").lower()
    if choice in ("rocksdb", "rocks"):
        return {
            _STATE_STORE_KEY: ROCKSDB_PROVIDER,
            # bounded incremental checkpoints: upload the changelog per
            # batch, snapshot in the background
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        }
    return {}


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Worker-side callables (pandas UDFs, applyInPandasWithState fns) may be
    cloudpickled *by reference* to this module; if the driver wasn't
    launched from the repo root the workers can't import it. Shipping a
    zip via addPyFile puts the package on every worker's sys.path
    regardless of the driver's cwd.
    """
    if getattr(spark, "_vena_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    stamp = int(max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    ))
    zip_path = os.path.join(tempfile.gettempdir(), f"vena_etl_tool_spark_{stamp}.zip")
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "vena_etl_tool_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
        os.replace(tmp, zip_path)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # e.g. Connect sessions without an SC; worker closures are
        # self-contained anyway for the shipped operators
    spark._vena_pkg_shipped = True  # type: ignore[attr-defined]


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-created session (driver contract)."""
    for k, v in {**RUNTIME_CONFS, **_state_store_overrides()}.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A conf may be static on some builds; never fail the query for it.
            pass
    _ship_package(spark)
    return spark


def get_spark(
    app_name: str = "vena-etl-tool-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``)
    so bench and tests share one knob with the driver harness.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_env) if cpus_env and cpus_env.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in {**RUNTIME_CONFS, **_state_store_overrides()}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
