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
