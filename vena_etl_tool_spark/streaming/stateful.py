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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x): the successor API to
# applyInPandasWithState — typed state primitives (ValueState / ListState /
# MapState / timers) managed per key by the state store. Requires the
# RocksDB state-store provider; pinned per-query below (the value is
# captured into the stream's checkpoint at first start, same as the state
# partition count).
# ---------------------------------------------------------------------------

from ..session import ROCKSDB_PROVIDER as _ROCKSDB_PROVIDER


class _state_store_provider:
    """Temporarily pin the state-store provider while a stream starts;
    always restores the session value (other streaming queries in this
    session keep the default HDFS-backed provider)."""

    def __init__(self, spark: SparkSession, provider: str = _ROCKSDB_PROVIDER):
        self.spark, self.provider = spark, provider
        self._key = "spark.sql.streaming.stateStore.providerClass"

    def __enter__(self) -> None:
        self.prev = self.spark.conf.get(self._key)
        self.spark.conf.set(self._key, self.provider)

    def __exit__(self, *exc) -> None:
        self.spark.conf.set(self._key, self.prev)


def has_tws_deps() -> bool:
    """transformWithStateInPandas talks to the JVM state server over
    protobuf from the Python workers; without the `protobuf` package the
    stream crashes at first batch. Gate on the import (environment rule:
    optional deps behind an import-try), and fall back to the
    applyInPandasWithState twin below."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no `google` namespace package at all
        return False


def make_per_type_fallback():
    """Semantic twin of PerTypeCounts on the pre-4.x API: state stays
    keyed by user (like the TWS MapState), with the per-type map encoded
    as three parallel arrays in the state struct — one Python call per
    USER per batch (5× fewer than keying by (user, type), measurable at
    bench scale: 7500 -> 1500 group invocations at sf0.1)."""

    def update(key, batches, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            types, ns, cents = state.get
            agg = {t: [n, c] for t, n, c in zip(types, ns, cents)}
        else:
            agg = {}
        for pdf in batches:
            g = pdf.groupby("event_type", sort=False)["value_cents"].agg(
                ["size", "sum"]
            )
            for etype, row in g.iterrows():
                cur = agg.setdefault(etype, [0, 0.0])
                cur[0] += int(row["size"])
                cur[1] += float(row["sum"])
        state.update(
            (
                list(agg.keys()),
                [v[0] for v in agg.values()],
                [v[1] for v in agg.values()],
            )
        )
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_type": list(agg.keys()),
                "n_events": [v[0] for v in agg.values()],
                "total_value": [round(v[1] / 100.0, 2) for v in agg.values()],
            }
        )

    return update


def make_per_type_processor():
    """Build the StatefulProcessor CLASS inside a factory so cloudpickle
    serializes it by value (same rationale as make_update_user_state:
    executors may not have this package on sys.path)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class PerTypeCounts(StatefulProcessor):
        """Per-user MapState keyed by event_type holding (n, total);
        every batch folds its rows into the map and emits the full
        per-(user, type) running aggregate."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getMapState(
                "per_type", "event_type string", "n long, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            for pdf in rows:
                grouped = pdf.groupby("event_type", sort=False).agg(
                    n=("event_type", "size"), total=("value_cents", "sum")
                )
                for etype, row in grouped.iterrows():
                    prev = (
                        self._state.getValue((etype,))
                        if self._state.containsKey((etype,))
                        else (0, 0.0)
                    )
                    # cents stay integral in the double: exact accumulation
                    self._state.updateValue(
                        (etype,), (prev[0] + int(row["n"]), prev[1] + float(row["total"]))
                    )
            out = [
                {"user_id": user_id, "event_type": k[0], "n_events": v[0],
                 "total_value": round(v[1] / 100.0, 2)}
                for k, v in self._state.iterator()
            ]
            yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return PerTypeCounts()


@register(
    "stream_transform_with_state",
    tags=("streaming", "stateful", "transformWithState"),
    oracle="""
SELECT user_id, event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id, event_type
""",
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming on the Spark 4 transformWithState API:
    per-user MapState (keyed by event_type) of running (count, value)
    aggregates, emitted in update mode. availableNow over the static
    fixture makes the final emission per (user, type) equal the batch
    GROUP BY — the same batch-equivalence harness as the
    applyInPandasWithState twin above, now on the typed-state successor
    API (RocksDB-backed state store, pinned per-query). Where the TWS
    Python deps (protobuf) are absent the query runs a semantic twin on
    the older API — has_tws_deps() gates at runtime, the oracle is
    identical either way.

    Exactness: values are folded as integer CENTS inside the double state
    field (value has 2 decimals by fixture contract), so accumulation
    order cannot perturb the sum — the /100 happens once at emission.

    Scale: state is hash-partitioned by user key in the RocksDB store;
    only Arrow batches of each key's rows cross the Python boundary, and
    MapState gives O(types-per-user) state access instead of rewriting
    one blob value per batch."""
    import pyspark.sql.functions as F

    ev = events_stream(spark, sf_dir).select(
        "user_id",
        "event_type",
        # DECIMAL cents computed JVM-side, exact for 2-decimal doubles
        F.round(F.col("value").cast("decimal(18,2)") * 100, 0)
        .cast("double")
        .alias("value_cents"),
    )
    if has_tws_deps():
        with _state_store_provider(spark):
            out = ev.groupBy("user_id").transformWithStateInPandas(
                statefulProcessor=make_per_type_processor(),
                outputStructType=(
                    "user_id long, event_type string, n_events long, total_value double"
                ),
                outputMode="Update",
                timeMode="None",
            )
            sink = run_to_table(out, "stream_transform_with_state", "update")
    else:
        # Env gate: the TWS Python state client speaks protobuf to the JVM;
        # without the protobuf package in the workers the semantic twin
        # below runs on the older API — same state keying, same output.
        out = ev.groupBy("user_id").applyInPandasWithState(
            make_per_type_fallback(),
            outputStructType=(
                "user_id long, event_type string, n_events long, total_value double"
            ),
            stateStructType=(
                "types array<string>, ns array<long>, cents array<double>"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        sink = run_to_table(out, "stream_transform_with_state", "update")
    # update mode re-emits the full map per key per batch; the COUNT is
    # strictly monotone (a group is only invoked with rows), so the final
    # emission per (user, type) is the one with the largest n_events —
    # take its total via max_by rather than max(total), which would be
    # wrong if negative event values ever made totals non-monotone
    return sink.groupBy("user_id", "event_type").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Event-time TIMERS (r8 verdict #9): a session-timeout emitter. A session
# closes two ways — a later event of the same user arrives more than GAP
# after it (in-batch gap), or no event ever does and the watermark passes
# last_ts + GAP (a real per-key event-time timer fires). Milliseconds
# everywhere: Spark tracks watermarks and timeout timestamps in ms
# (truncating µs event times), so both engines compute on epoch_ms values
# and the oracle's firing predicate `timeout_ms < wm_ms` is exactly the
# engine's (FlatMapGroupsWithStateExec times out strictly below the
# eviction watermark).
# ---------------------------------------------------------------------------

SESSION_GAP_MS = 30 * 60 * 1000  # the sessionize_events 30-min convention
SESSION_WM_DELAY_MS = 10 * 60 * 1000
_TIMER_OUTPUT_SCHEMA = (
    "user_id long, session_start_ms long, session_end_ms long, "
    "n_events long, closed_by string"
)


def make_session_timeout_fn(gap_ms: int):
    """applyInPandasWithState update fn (self-contained closure): per-user
    open-session state (start_ms, last_ms, n); in-batch gaps close and
    emit immediately; EventTimeTimeout fires the trailing session once
    the watermark passes last_ms + gap."""

    def fn(key, batches, state):
        import numpy as np
        import pandas as pd

        cols = ["user_id", "session_start_ms", "session_end_ms",
                "n_events", "closed_by"]
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                [[user_id, start_ms, last_ms, n, "timer"]], columns=cols
            )
            return
        pdf = pd.concat(list(batches)).sort_values(["ts", "event_id"])
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
        # vectorized gaps-and-islands over this batch's rows
        brk = np.zeros(len(ts_ms), dtype=bool)
        brk[1:] = (ts_ms[1:] - ts_ms[:-1]) > gap_ms
        sid = np.cumsum(brk)
        starts = ts_ms[np.r_[True, brk[1:]]]
        ends = np.array([ts_ms[sid == s].max() for s in range(sid[-1] + 1)])
        counts = np.bincount(sid)
        sessions = list(zip(starts.tolist(), ends.tolist(), counts.tolist()))
        # splice the carried-over open session onto the front
        if state.exists:
            p_start, p_last, p_n = state.get
            if ts_ms[0] - p_last > gap_ms:
                sessions.insert(0, (p_start, p_last, p_n))
            else:
                s0, e0, n0 = sessions[0]
                sessions[0] = (p_start, max(e0, p_last), n0 + p_n)
        *closed, (o_start, o_last, o_n) = sessions
        state.update((int(o_start), int(o_last), int(o_n)))
        state.setTimeoutTimestamp(int(o_last) + gap_ms)
        yield pd.DataFrame(
            [[user_id, s, e, n, "gap"] for s, e, n in closed], columns=cols
        )

    return fn


def make_session_timer_processor(gap_ms: int):
    """transformWithState twin on the Spark-4 timer API (deploy path —
    gated on has_tws_deps() like make_per_type_processor): ValueState for
    the open session, registerTimer/deleteTimer on every extension,
    handleExpiredTimer emits and clears. Semantics mirror
    make_session_timeout_fn exactly."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    cols = ["user_id", "session_start_ms", "session_end_ms",
            "n_events", "closed_by"]

    class SessionTimers(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._open = handle.getValueState(
                "open_session", "start_ms long, last_ms long, n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            brk = np.zeros(len(ts_ms), dtype=bool)
            brk[1:] = (ts_ms[1:] - ts_ms[:-1]) > gap_ms
            sid = np.cumsum(brk)
            starts = ts_ms[np.r_[True, brk[1:]]]
            ends = np.array([ts_ms[sid == s].max() for s in range(sid[-1] + 1)])
            counts = np.bincount(sid)
            sessions = list(zip(starts.tolist(), ends.tolist(), counts.tolist()))
            if self._open.exists():
                p_start, p_last, p_n = self._open.get()
                self._handle.deleteTimer(p_last + gap_ms)
                if ts_ms[0] - p_last > gap_ms:
                    sessions.insert(0, (p_start, p_last, p_n))
                else:
                    s0, e0, n0 = sessions[0]
                    sessions[0] = (p_start, max(e0, p_last), n0 + p_n)
            *closed, (o_start, o_last, o_n) = sessions
            self._open.update((int(o_start), int(o_last), int(o_n)))
            self._handle.registerTimer(int(o_last) + gap_ms)
            yield pd.DataFrame(
                [[user_id, s, e, n, "gap"] for s, e, n in closed],
                columns=cols,
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if self._open.exists():
                start_ms, last_ms, n = self._open.get()
                self._open.clear()
                yield pd.DataFrame(
                    [[user_id, start_ms, last_ms, n, "timer"]], columns=cols
                )

        def close(self) -> None:
            pass

    return SessionTimers()


@register(
    "stream_timer_sessions",
    tags=("streaming", "stateful", "timers"),
    oracle=f"""
WITH wm AS (
  SELECT max(epoch_ms(ts)) - {SESSION_WM_DELAY_MS} AS wm_ms FROM events
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {SESSION_GAP_MS}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
), agg AS (
  SELECT user_id, session_idx,
         min(epoch_ms(ts)) AS session_start_ms,
         max(epoch_ms(ts)) AS session_end_ms,
         COUNT(*) AS n_events
  FROM numbered GROUP BY user_id, session_idx
), marked AS (
  SELECT *, session_idx < max(session_idx) OVER (PARTITION BY user_id)
              AS has_next
  FROM agg
)
SELECT user_id, session_start_ms, session_end_ms,
       CAST(n_events AS BIGINT) AS n_events,
       CASE WHEN has_next THEN 'gap' ELSE 'timer' END AS closed_by
FROM marked, wm
WHERE has_next OR session_end_ms + {SESSION_GAP_MS} < wm_ms
""",
)
def stream_timer_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key event-time TIMERS: a session-timeout emitter (r8 verdict
    #9). Each user's open session lives in keyed state with a timer at
    last_ts + 30 min; a later in-gap event extends the session and moves
    the timer, a later out-of-gap event closes it ('gap'), and if no
    event ever comes the timer fires once the watermark passes and emits
    the session ('timer'). With availableNow over the static fixture all
    rows land in one data batch (in-batch gaps close there) and the
    end-of-input no-data batch — the engine's timer wheel — fires every
    timer below the final watermark max(ts) − 10 min, so the emitted set
    is exactly predictable: the DuckDB oracle sessionizes in ms
    arithmetic and keeps closed sessions plus timed-out trailing ones
    (`timeout_ms < wm_ms`, the engine's strict eviction predicate).
    Trailing sessions whose timer sits at/above the watermark stay in
    state unemitted — bounded-state semantics, stated exactly.

    Deploy path: the Spark-4 transformWithState timer API
    (registerTimer / handleExpiredTimer, make_session_timer_processor)
    when the TWS python deps exist; the applyInPandasWithState
    EventTimeTimeout twin otherwise — same ms arithmetic, same output,
    and the engine that runs HERE (no protobuf in this container) is the
    fallback, so the oracle gates real timer firings either way.

    Scale: state is one (start, last, n) triple per live user key in the
    state store (RocksDB at deployment); timers are engine-managed per
    key — no global scan per batch; only each key's Arrow batches cross
    to Python. Emission is append-mode (each session exactly once)."""
    ev = events_stream(spark, sf_dir).select("user_id", "ts", "event_id")
    # watermark delay derives from the SAME constant the oracle's wm_ms
    # predicate uses — a hardcoded "10 minutes" here would silently
    # diverge the two engines if the constant ever changed
    ev = ev.withWatermark("ts", f"{SESSION_WM_DELAY_MS // 1000} seconds")
    if has_tws_deps():
        with _state_store_provider(spark):
            out = ev.groupBy("user_id").transformWithStateInPandas(
                statefulProcessor=make_session_timer_processor(SESSION_GAP_MS),
                outputStructType=_TIMER_OUTPUT_SCHEMA,
                outputMode="Append",
                timeMode="EventTime",
            )
            return run_to_table(out, "stream_timer_sessions", "append")
    out = ev.groupBy("user_id").applyInPandasWithState(
        make_session_timeout_fn(SESSION_GAP_MS),
        outputStructType=_TIMER_OUTPUT_SCHEMA,
        stateStructType="start_ms long, last_ms long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return run_to_table(out, "stream_timer_sessions", "append")
