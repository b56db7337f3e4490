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


def test_append_watermark_flush_across_two_restarts(spark, tmp_path):
    """Planted-row drive of the stream_append_restart_flush shape: append
    mode + watermark, two availableNow runs from ONE checkpoint.

    Timeline (5-min windows, 10-min watermark delay):
      run 1: w0 rows at 00:01/00:02 + an anchor at 00:16 → watermark ends
             at 00:06, which closes window [00:00,00:05) → emits (w0, 2)
             exactly once; window [00:15,00:20) stays open in state.
      between runs: a LATE row for w0 (00:03) and a live row for the open
             window (00:17) and a new anchor at 00:31 arrive.
      run 2: the late w0 row is dropped (its window already emitted); the
             00:17 row folds into open state; watermark reaches 00:21,
             flushing [00:15,00:20) with BOTH its rows (one per run) —
             and nothing is re-emitted.
    """
    import datetime as dt
    import os

    stage = str(tmp_path / "stage")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt2")

    def t(minute: int) -> dt.datetime:
        return dt.datetime(2024, 1, 1, 0, minute)

    schema = "ts timestamp, k string"

    def write_chunk(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(stage)

    def run_once():
        agg = (
            spark.readStream.schema(schema)
            .parquet(stage)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"), "k")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("window.start").alias("ws"), "k", "n"
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if not os.path.exists(os.path.join(sink, "_spark_metadata")):
            return []
        out = spark.read.schema("ws timestamp, k string, n long").parquet(sink)
        return sorted((r.ws.minute, r.k, r.n) for r in out.collect())

    write_chunk([(t(1), "w0"), (t(2), "w0"), (t(16), "anchor")])
    emitted1 = run_once()
    assert emitted1 == [(0, "w0", 2)]  # w0 closed with run-1 rows only

    write_chunk([(t(3), "w0"), (t(17), "anchor"), (t(31), "tail")])
    emitted2 = run_once()
    # late w0 row dropped (no re-emission, count unchanged); the open
    # [00:15,00:20) window flushed exactly once with rows from BOTH runs
    assert emitted2 == [(0, "w0", 2), (15, "anchor", 2)]
