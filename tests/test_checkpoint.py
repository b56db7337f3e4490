"""Checkpoint-recovery semantics: the streaming analog of the reference's
retry policy (SURVEY.md A7 → 'for streaming, checkpoint-based restart').
The file source + checkpoint guarantees exactly-once: a restarted query
re-processes nothing."""

from __future__ import annotations

import pyspark.sql.functions as F

from vena_etl_tool_spark.streaming.queries import events_stream


def _run_once(spark, sf_dir, out_dir, ckpt_dir):
    q = (
        events_stream(spark, sf_dir)
        .select("event_id", "user_id")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_foreach_batch_idempotent_by_batch_id(spark, sf_dir, tmp_path):
    """foreachBatch writes keyed by batch_id: a rerun with the same
    checkpoint replays nothing, so the output directory set is stable."""
    import os

    from vena_etl_tool_spark.streaming.foreach_batch import run_foreach_batch

    out = str(tmp_path / "batches")
    os.makedirs(out, exist_ok=True)
    ckpt = str(tmp_path / "fb_ckpt")

    def write_batch(batch_df: "object", batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    src = events_stream(spark, sf_dir).select("event_id", "event_type")
    run_foreach_batch(src, write_batch, ckpt)
    first = sorted(os.listdir(out))
    total = spark.read.parquet(f"{out}/*").count()
    assert total == 1000
    run_foreach_batch(src, write_batch, ckpt)  # same checkpoint → no new work
    assert sorted(os.listdir(out)) == first
    assert spark.read.parquet(f"{out}/*").count() == 1000


def test_checkpoint_restart_is_exactly_once(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _run_once(spark, sf_dir, out, ckpt)
    n_events = spark.read.parquet(out).count()
    assert n_events == 1000  # sf0.001 events

    # restart with the same checkpoint: the source offsets say everything
    # is already committed → zero new rows, no duplicates
    _run_once(spark, sf_dir, out, ckpt)
    after = spark.read.parquet(out)
    assert after.count() == n_events
    assert after.select(F.countDistinct("event_id")).first()[0] == n_events
