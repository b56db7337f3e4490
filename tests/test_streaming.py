"""Batch-equivalence + lifecycle tests for streaming operators (§5.2.3)."""

from __future__ import annotations

import pyspark.sql.functions as F

from vena_etl_tool_spark.catalog import load_table
from vena_etl_tool_spark.streaming.queries import events_stream, stream_tumbling_window


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    """availableNow streaming windowed agg == the same agg run in batch."""
    streamed = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in stream_tumbling_window(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = {
        (r["window"]["start"].replace(tzinfo=None), r.event_type): (r.n, r.total_value)
        for r in ev.groupBy(F.window(F.col("ts").cast("timestamp"), "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .collect()
    }
    assert streamed == batch


def test_stream_query_lifecycle(spark, sf_dir):
    """Submit → status → progress → stop: the reference's job lifecycle
    (upload/status/cancel) mapped onto a StreamingQuery handle."""
    q = (
        events_stream(spark, sf_dir)
        .select("event_id")
        .writeStream.format("memory")
        .queryName("lifecycle_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.id is not None
    status = q.status  # observable mid-flight or after
    assert "message" in status
    q.awaitTermination()
    assert not q.isActive
    assert q.exception() is None
    total = sum(int(p["numInputRows"]) for p in q.recentProgress)
    assert total == load_table(spark, sf_dir, "events").count()
    q.stop()  # idempotent stop on a finished query


def test_dedup_within_watermark_bounded_state_invariants(spark, sf_dir):
    """The bounded-state dedup variant: its output key set must exactly
    cover the distinct input keys when the whole fixture arrives within
    one availableNow pass (no eviction can fire mid-stream), and every
    kept first_seen must be a real event time for that key."""
    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.streaming.queries import stream_dedup_within_watermark

    out = stream_dedup_within_watermark(spark, sf_dir)
    got = {(r.user_id, r.event_type) for r in out.collect()}
    exact = {
        (r.user_id, r.event_type)
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == exact
    assert out.count() == len(got)  # one surviving row per key


def test_fresh_stream_workdir_sweeps_stale_siblings(tmp_path, monkeypatch):
    """The per-PID sink workdirs must not accumulate: stale sibling dirs
    (older than the TTL) are swept on the next call, fresh ones and the
    caller's own dir are preserved."""
    import os
    import time

    from vena_etl_tool_spark.streaming import queries as sq

    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    base = tmp_path / "vena_stream_sinks"
    base.mkdir()
    stale = base / "stream_tumbling_append_99999"
    fresh = base / "stream_tumbling_append_88888"
    stale.mkdir()
    fresh.mkdir()
    old = time.time() - sq._SINK_TTL_SECONDS - 60
    os.utime(stale, (old, old))

    workdir = sq.fresh_stream_workdir("stream_tumbling_append")
    assert not stale.exists(), "stale sibling should be swept"
    assert fresh.exists(), "fresh sibling (possibly live) must survive"
    assert workdir == str(base / f"stream_tumbling_append_{os.getpid()}")


def test_left_outer_nulls_are_watermark_gated(spark, sf_dir):
    """The left-outer stream join must contain the inner join's rows
    exactly, plus null-click rows only for purchases old enough that the
    final watermark closed their match window."""
    import pyspark.sql.functions as F

    from vena_etl_tool_spark.streaming.queries import (
        stream_stream_join,
        stream_stream_left_outer,
    )

    outer = stream_stream_left_outer(spark, sf_dir)
    inner = stream_stream_join(spark, sf_dir)
    matched = outer.filter(F.col("click_id").isNotNull())
    assert matched.exceptAll(inner).count() == 0
    assert inner.exceptAll(matched).count() == 0
    assert outer.filter(F.col("click_id").isNull()).count() > 0


def test_session_window_boundary_is_inclusive(spark):
    """Pins the empirical session_window contract the oracle encodes: an
    event at EXACTLY last_ts + gap merges into the running session (so
    the gaps-and-islands oracle must use strict > on the gap)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:30:00"),   # exactly the 30-min gap: merges
            (1, "2024-01-01 01:00:01"),   # 30:01 after: new session
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    sessions = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(r.n for r in sessions) == [1, 2]


def test_transform_with_state_matches_batch_groupby(spark, sf_dir):
    """The stateful per-(user, type) running totals (TWS path or its
    env-gated fallback twin) must equal the batch GROUP BY exactly."""
    import pyspark.sql.functions as F

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.streaming.stateful import (
        make_per_type_processor,
        stream_transform_with_state,
    )

    got = {
        (r.user_id, r.event_type): (r.n_events, r.total_value)
        for r in stream_transform_with_state(spark, sf_dir).collect()
    }
    exp = {
        (r.user_id, r.event_type): (r.n, r.tv)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
        )
        .collect()
    }
    assert got == exp
    # the TWS processor itself must always build (the channel deps are the
    # only env gate), so API regressions surface even where protobuf is absent
    proc = make_per_type_processor()
    assert hasattr(proc, "init") and hasattr(proc, "handleInputRows")


def test_tws_processor_logic_with_fake_mapstate():
    """Drive PerTypeCounts.handleInputRows directly against a fake
    MapState: the TWS channel needs protobuf (absent here), but the
    processor's fold logic must not go unexercised — two batches for one
    user must accumulate per-type counts/cents and emit the full map."""
    import pandas as pd

    from vena_etl_tool_spark.streaming.stateful import make_per_type_processor

    class FakeMapState:
        def __init__(self):
            self.d = {}

        def containsKey(self, k):
            return k in self.d

        def getValue(self, k):
            return self.d[k]

        def updateValue(self, k, v):
            self.d[k] = v

        def iterator(self):
            return iter(self.d.items())

    class FakeHandle:
        def __init__(self):
            self.state = FakeMapState()

        def getMapState(self, name, key_schema, value_schema, ttlDurationMs=None):
            return self.state

    proc = make_per_type_processor()
    handle = FakeHandle()
    proc.init(handle)
    b1 = pd.DataFrame(
        {"event_type": ["view", "view", "click"], "value_cents": [100.0, 50.0, 25.0]}
    )
    out1 = pd.concat(proc.handleInputRows((7,), iter([b1]), None))
    got1 = {r.event_type: (r.n_events, r.total_value) for r in out1.itertuples()}
    assert got1 == {"view": (2, 1.5), "click": (1, 0.25)}
    b2 = pd.DataFrame({"event_type": ["view"], "value_cents": [200.0]})
    out2 = pd.concat(proc.handleInputRows((7,), iter([b2]), None))
    got2 = {r.event_type: (r.n_events, r.total_value) for r in out2.itertuples()}
    # state carried across batches: the full updated map is re-emitted
    assert got2 == {"view": (3, 3.5), "click": (1, 0.25)}
    proc.close()
