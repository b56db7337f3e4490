"""Arbitrary stateful streaming (SURVEY.md §B.9 last row):
``applyInPandasWithState`` — per-key mutable state with timeouts, the Spark
analog of a custom streaming operator.

The operator below keeps per-user running aggregates (event count, value
sum, last-seen timestamp) across micro-batches. With availableNow over the
static fixture the final state equals the batch GROUP BY — which makes this
oracle-checkable like the rest of the streaming family.

Scale: state lives in the state store partitioned by key; only the group's
Arrow batches cross the Python boundary. Timeouts (unused here — the
bounded run ends the stream) are how production pipelines expire idle keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupStateTimeout

from ..registry import register
from .queries import events_stream, run_to_table

STATE_SCHEMA = "n long, total double, last_ts timestamp"
OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


def make_update_user_state():
    """Build the stateful update fn as a self-contained closure (no refs to
    this package's globals — executors may not have the repo on sys.path)."""

    def update_user_state(key, batches, state):
        """Fold each micro-batch into (count, sum, last_ts) state and emit
        the updated running aggregate for the key."""
        import pandas as pd

        (user_id,) = key
        n, total, last_ts = state.get if state.exists else (0, 0.0, None)
        for pdf in batches:
            n += len(pdf)
            # decimal-style rounding keeps the sum deterministic vs the oracle
            total = round(total + float(pdf["value"].round(2).sum()), 2)
            batch_max = pdf["ts"].max()
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        state.update((n, total, last_ts))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [float(total)]}
        )

    return update_user_state


@register(
    "stream_stateful_running_totals",
    tags=("streaming", "stateful"),
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
""",
)
def stream_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator: per-user running totals via
    applyInPandasWithState; availableNow makes the final update equal the
    batch aggregate. Output mode `update` + memory sink keeps the last
    emission per key."""
    import pyspark.sql.functions as F

    ev = events_stream(spark, sf_dir).select("user_id", "ts", "value")
    updated = ev.groupBy("user_id").applyInPandasWithState(
        make_update_user_state(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = run_to_table(updated, "stream_stateful_running_totals", "update")
    # update mode emits one row per key per micro-batch; running totals are
    # monotone (values ≥ 0), so the final state is the per-key max
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
    )
