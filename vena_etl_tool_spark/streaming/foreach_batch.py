"""foreachBatch sink: the bridge between streaming and arbitrary batch
sinks (JDBC, HTTP, multi-table writes) with per-batch exactly-once-ish
semantics via (batch_id, checkpoint) idempotence.

Reference parity: this is where the reference's retrying upload (A7/A10)
lives in a streaming world — each micro-batch is a batch DataFrame the
sink function can write with the same retry/idempotency machinery
(pipeline/http_sink.py), keyed by batch_id for dedup on replay.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def run_foreach_batch(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    query_name: str = "foreach_batch_sink",
) -> None:
    """Execute a bounded (availableNow) stream through foreachBatch.

    ``batch_fn(batch_df, batch_id)`` must be idempotent per batch_id —
    on restart-after-failure Spark replays the last uncommitted batch with
    the SAME id, so keying writes by batch_id gives exactly-once effects.
    """
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
