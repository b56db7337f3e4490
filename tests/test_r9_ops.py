"""Round-9 operator invariants: the distributed-NTILE rewrite and the
round's new operators. Differential coverage lives in the registry gate
(python -m vena_etl_tool_spark.testing); these tests pin the algebraic
identities the oracles can't see."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window


def _reference_ntile(spark, df, sort_cols, b):
    return df.withColumn("q_ref", F.ntile(b).over(Window.orderBy(*sort_cols)))


def test_distributed_ntile_matches_builtin_ntile(spark):
    # The rewrite must reproduce ANSI NTILE bit-for-bit, including the
    # remainder rule (first n%B buckets take one extra row) and the
    # n < B degenerate case, on sizes that straddle partition counts.
    from vena_etl_tool_spark.operators.analytics import _distributed_ntile

    for n, b in [(1, 4), (3, 4), (4, 4), (7, 4), (101, 4), (1000, 7)]:
        df = spark.range(n).select(
            F.col("id").alias("k"),
            # non-monotone metric with heavy ties to exercise tiebreaks
            (F.col("id") * 37 % 11).alias("m"),
        )
        got = _distributed_ntile(df, [F.col("m"), F.col("k")], b, "q")
        ref = _reference_ntile(spark, df, [F.col("m"), F.col("k")], b)
        both = got.join(ref, "k").select("k", "q", "q_ref")
        bad = both.filter(F.col("q") != F.col("q_ref")).count()
        assert bad == 0, f"n={n} b={b}: {bad} mismatches"
        spark.catalog.clearCache()


def test_star_contract_chain_converges_in_log_rounds(spark):
    # VERDICT r8 #4: the planted-chain adversary. A 1000-link path has
    # component diameter 1000 — min-label propagation moves the min ONE
    # hop per round, so it cannot finish inside any log-scale budget;
    # large-star/small-star contracts distances multiplicatively and
    # must converge in O(log n) rounds with every node labeled 0.
    import math

    from vena_etl_tool_spark.operators.dedup import _star_contract

    n = 1000
    edges = spark.range(n).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    stars, rounds = _star_contract(edges)
    budget = 3 * int(math.log2(n + 1)) + 2  # generous O(log n) ceiling
    assert rounds <= budget, f"{rounds} rounds > O(log n) budget {budget}"
    rows = stars.collect()
    # converged star forest: every non-root points directly at node 0
    assert len(rows) == n
    assert all(r.v == 0 for r in rows)
    assert sorted(r.u for r in rows) == list(range(1, n + 1))


def test_star_contract_matches_label_propagation(spark):
    # same answer as the propagation CC on a mixed topology: two cliques,
    # a bridge, a 2-node island, self-contained ids
    from vena_etl_tool_spark.operators.dedup import (
        connected_components,
        star_contract_components,
    )

    raw = (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]  # clique 0-4
        + [(10, 11), (11, 12), (12, 13)]  # path
        + [(4, 10)]  # bridge: one component 0..13
        + [(20, 21)]  # island
    )
    edges = spark.createDataFrame(raw, ["x", "y"])
    a = {
        (r.node, r.label)
        for r in star_contract_components(edges, "x", "y").collect()
    }
    b = {
        (r.node, r.label)
        for r in connected_components(edges, "x", "y").collect()
    }
    assert a == b
    assert {l for _, l in a} == {0, 20}


def test_multimodal_decode_roundtrip_planted(spark):
    # The decode seam must recover EXACTLY what the encode stage packed —
    # header fields and pixel stats — for texts at the container format's
    # edge cases: 1 byte, a width-wrap length (639/640 pixels), repeated
    # bytes, and the full printable-ASCII alphabet.
    from vena_etl_tool_spark.operators import multimodal as mm

    # the documented container constants must match what the (mandatorily
    # self-contained) worker closures pack: 4-byte magic + 2+2+1 dims
    assert mm.VM_MAGIC == b"VM01" and mm.VM_HEADER_LEN == len(mm.VM_MAGIC) + 5

    texts = [
        "a",
        "x" * 639,
        "y" * 640,
        "".join(chr(c) for c in range(32, 122)),
        "zz" * 300,
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "plant", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        rows = {
            r.doc_id: r
            for r in mm.multimodal_decode_features(spark, d).collect()
        }
    for i, t in enumerate(texts):
        b = t.encode()
        r = rows[i]
        assert r.header_ok
        assert r.width == len(b) % 640 + 1
        assert r.height == (len(b) * 7) % 480 + 1
        assert r.channels == len(b) % 3 + 1
        assert r.n_pixels == len(b)
        assert r.pixel_sum == sum(b)
        assert r.mean_centi == sum(b) * 100 // len(b)
        assert r.first_pixel == b[0] and r.last_pixel == b[-1]


def test_timer_sessions_boundary_semantics(spark):
    # Pins the engine conventions the stream_timer_sessions oracle rests
    # on, at exact boundaries: (a) event-time timers fire iff
    # timeout_ms < watermark_ms, STRICTLY — a timer sitting exactly AT
    # the watermark stays in state; (b) a gap of exactly GAP ms does NOT
    # break a session (the predicate is gap > GAP).
    import os
    import tempfile
    from datetime import datetime, timezone

    from vena_etl_tool_spark.streaming.stateful import (
        SESSION_GAP_MS,
        SESSION_WM_DELAY_MS,
        stream_timer_sessions,
    )

    GAP, DELAY = SESSION_GAP_MS, SESSION_WM_DELAY_MS
    E = int(datetime(2024, 1, 10, tzinfo=timezone.utc).timestamp() * 1000)
    wm = E - DELAY
    rows = [
        (99, E),                # watermark anchor; its own timer >= wm
        (1, wm - GAP - 5000),   # timer 5 s below wm -> fires
        (2, wm - GAP),          # timer EXACTLY at wm -> must NOT fire
        (3, wm - GAP - 1),      # timer 1 ms below wm -> fires
        (4, E - 100_000_000),   # gap of exactly GAP ms -> ONE session...
        (4, E - 100_000_000 + GAP),
        (5, E - 200_000_000),   # gap of GAP+1 ms -> closes by gap...
        (5, E - 200_000_000 + GAP + 1),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (i, datetime.fromtimestamp(ms / 1000, tz=timezone.utc),
                 uid, "click", 1.0, "{}")
                for i, (uid, ms) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {
            (r.user_id, r.session_start_ms, r.session_end_ms,
             r.n_events, r.closed_by)
            for r in stream_timer_sessions(spark, d).collect()
        }
    expect = {
        (1, wm - GAP - 5000, wm - GAP - 5000, 1, "timer"),
        (3, wm - GAP - 1, wm - GAP - 1, 1, "timer"),
        (4, E - 100_000_000, E - 100_000_000 + GAP, 2, "timer"),
        (5, E - 200_000_000, E - 200_000_000, 1, "gap"),
        (5, E - 200_000_000 + GAP + 1, E - 200_000_000 + GAP + 1, 1, "timer"),
    }
    assert got == expect


def test_distributed_ntile_desc_order(spark):
    from vena_etl_tool_spark.operators.analytics import _distributed_ntile

    df = spark.range(57).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("m")
    )
    got = _distributed_ntile(df, [F.col("m").desc(), F.col("k")], 4, "q")
    ref = df.withColumn(
        "q_ref", F.ntile(4).over(Window.orderBy(F.col("m").desc(), "k"))
    )
    bad = (
        got.join(ref, "k")
        .filter(F.col("q") != F.col("q_ref"))
        .count()
    )
    assert bad == 0
    spark.catalog.clearCache()
