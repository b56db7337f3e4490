"""Time-series operators over the events stream — resample/gap-fill,
trailing-window moving aggregates, and exact-arithmetic anomaly scoring.

These are the batch time-series primitives a metrics/observability user of
the reference would expect next to sessionization (analytics.py): densify a
sparse series onto a regular grid, smooth it, and flag outliers. All three
stay in whole-stage codegen — the time grid is generated distributed
(``sequence`` + ``explode``, no driver-side loop), and the statistics are
computed from exact integer/decimal sums so the DuckDB oracle matches
bit-for-bit (stddev_samp over doubles would be summation-order-dependent).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..registry import register
from ._shared import dsum


@register(
    "ts_gapfill_hourly",
    tags=("timeseries", "events"),
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
), grid AS (
  SELECT g.hour_ts, t.event_type
  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
        FROM bounds) g
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
), counts AS (
  SELECT date_trunc('hour', ts) AS hour_ts, event_type,
         COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
  FROM events
  GROUP BY 1, 2
)
SELECT grid.hour_ts, grid.event_type,
       COALESCE(counts.n, 0) AS n,
       COALESCE(counts.total_value, 0.0) AS total_value
FROM grid LEFT JOIN counts USING (hour_ts, event_type)
""",
)
def ts_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the event stream onto a dense hourly grid per event type,
    filling silent hours with zero — the densify step every downstream
    moving-window or charting consumer needs.

    Scale shape: the grid is built distributed — ``sequence()`` runs on a
    1-row bounds aggregate and ``explode`` fans it out; no driver-side
    range loop, no collect. The grid side is tiny (hours × types) so AQE
    broadcasts it against the aggregated counts; the only full shuffle is
    the counts aggregate of the raw events."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour_ts")
    )
    types = ev.select("event_type").distinct()
    grid = hours.crossJoin(types)
    counts = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", 4).alias("total_value"),
    )
    return grid.join(counts, ["hour_ts", "event_type"], "left").select(
        "hour_ts",
        "event_type",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
    )


@register(
    "ts_moving_average",
    tags=("timeseries", "window", "events"),
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS day_total
  FROM events
  GROUP BY 1, 2
)
SELECT event_type, day, day_total,
       ROUND(CAST(SUM(CAST(day_total AS DECIMAL(18,4))) OVER w AS DOUBLE)
             / COUNT(*) OVER w, 6) AS ma7
FROM daily
WINDOW w AS (PARTITION BY event_type
             ORDER BY CAST(day - DATE '1970-01-01' AS BIGINT)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def ts_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average of daily value totals per event type.
    RANGE framing over epoch-days (not ROWS) so a missing day shortens
    the window instead of silently reaching further back — the correct
    semantics for sparse series. The daily aggregate and the window share
    the event_type hash partitioning: one shuffle end-to-end."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(dsum("value", 4).alias("day_total"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_date(F.col("day")))  # epoch days
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        "day_total",
        F.round(
            F.sum(F.col("day_total").cast("decimal(18,4)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("ma7"),
    )


@register(
    "ts_anomaly_zscore",
    tags=("timeseries", "statistics", "events"),
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(*) AS n
  FROM events
  GROUP BY 1, 2
), stats AS (
  SELECT event_type,
         COUNT(*) AS n_days,
         SUM(n) AS total,
         SUM(n * n) AS total_sq
  FROM daily
  GROUP BY event_type
)
SELECT d.event_type, d.day, d.n,
       ROUND((d.n - CAST(s.total AS DOUBLE) / s.n_days)
             / sqrt((s.total_sq - CAST(s.total AS DOUBLE) * s.total / s.n_days)
                    / (s.n_days - 1)), 6) AS zscore,
       ABS((d.n - CAST(s.total AS DOUBLE) / s.n_days)
           / sqrt((s.total_sq - CAST(s.total AS DOUBLE) * s.total / s.n_days)
                  / (s.n_days - 1))) > 2.0 AS is_anomaly
FROM daily d JOIN stats s USING (event_type)
""",
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly flags over daily event counts. The mean
    and sample variance come from exact integer sums (Σn, Σn² are BIGINTs
    — no floating-point accumulation), so the score is bit-identical in
    any engine and under any partitioning; ``stddev_samp`` over doubles
    would not be. The per-type stats table is tiny → broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.col("n")).alias("total_sq"),
    )
    mean = F.col("total").cast("double") / F.col("n_days")
    var = (
        F.col("total_sq") - F.col("total").cast("double") * F.col("total") / F.col("n_days")
    ) / (F.col("n_days") - 1)
    z = (F.col("n") - mean) / F.sqrt(var)
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "n",
        F.round(z, 6).alias("zscore"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


@register(
    "scd2_priority_history",
    tags=("timeseries", "window", "scd"),
    oracle="""
WITH ordered AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER w AS prev_priority
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), changes AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
  FROM ordered
  WHERE prev_priority IS NULL OR prev_priority <> o_orderpriority
)
SELECT o_custkey AS custkey, o_orderpriority AS priority,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS valid_to,
       lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
FROM changes
""",
)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: collapse each
    customer's order-priority timeline into change intervals with
    valid_from / valid_to / is_current — the standard warehouse pattern
    for reconstructing attribute history from an event log. Both window
    passes share one hash partitioning on custkey (single shuffle);
    run-length collapse via lag-compare, interval close via lead."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        orders.withColumn("prev_priority", F.lag("o_orderpriority").over(w))
        .filter(
            F.col("prev_priority").isNull()
            | (F.col("prev_priority") != F.col("o_orderpriority"))
        )
    )
    valid_to = F.lead("o_orderdate").over(w)
    return changes.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Per-group OLS trend fit — exact-integer least squares
# ---------------------------------------------------------------------------
# slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), computed entirely in int64:
# x = days since the GLOBAL min day (broadcast row — centering keeps n·Σxy
# below ~5e16 instead of brushing int64 max with epoch-day x), y = the daily
# value total in exact DECIMAL(18,4) ten-thousandths. The reported
# slope_milli is trunc(|num|·1000/den)·sign — sign handled explicitly
# because Spark's div truncates toward zero while DuckDB's // floors, and
# they disagree on negatives; all divisions here see non-negative operands.
_TREND_ORACLE = """
WITH lo AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events
), daily AS (
  SELECT event_type,
         date_diff('day', lo.d0, CAST(ts AS DATE)) AS x,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
  FROM events, lo
  GROUP BY event_type, x
), sums AS (
  SELECT event_type,
         COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx,
         MIN(x) AS x_min, MAX(x) AS x_max
  FROM daily GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       CAST(x_min AS BIGINT) AS x_min, CAST(x_max AS BIGINT) AS x_max,
       CAST(sy AS BIGINT) AS sum_y_e4,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
         (CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END) *
         (abs(n * sxy - sx * sy) // (n * sxx - sx * sx) * 1000
          + abs(n * sxy - sx * sy) % (n * sxx - sx * sx) * 1000
            // (n * sxx - sx * sx))
       END AS BIGINT) AS slope_milli_e4_per_day
FROM sums
"""


@register(
    "ts_linear_trend",
    tags=("timeseries", "events", "regression"),
    oracle=_TREND_ORACLE,
)
def ts_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend of daily value totals — OLS slope via
    the sufficient statistics (n, Σx, Σy, Σxy, Σx²) so the 'model fit'
    is just two aggregates: one to daily grain (exact DECIMAL sums),
    one per group. Exact int64 throughout; x is centered on the global
    min day (broadcast single-row aggregate) to keep products far from
    int64 range, and the truncated-division sign is handled explicitly
    (Spark div truncates, DuckDB // floors — they differ on negatives).
    At 100 TB this is the degenerate-but-dominant case of grouped
    regression: no iterative solver, no UDF, pure map-side-combinable
    sums — the same shape works for thousands of groups per pass.

    Plan shape: fact scan → daily aggregate (one exchange on
    (event_type, day)) → per-type aggregate of ~365-row groups; the
    min-day row broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    lo = ev.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    daily = (
        ev.crossJoin(F.broadcast(lo))
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.col("d0")).alias("x"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
            .cast("long")
            .alias("y")
        )
    )
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
    )
    return sums.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n_days",
        "CAST(x_min AS BIGINT) AS x_min",
        "CAST(x_max AS BIGINT) AS x_max",
        "CAST(sy AS BIGINT) AS sum_y_e4",
        "CAST(n * sxy - sx * sy AS BIGINT) AS slope_num",
        "CAST(n * sxx - sx * sx AS BIGINT) AS slope_den",
        """CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
             (CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END) *
             (abs(n * sxy - sx * sy) div (n * sxx - sx * sx) * 1000
              + abs(n * sxy - sx * sy) % (n * sxx - sx * sx) * 1000
                div (n * sxx - sx * sx))
           END AS BIGINT) AS slope_milli_e4_per_day""",
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection — exact-integer level-shift localization
# ---------------------------------------------------------------------------
# The classic offline CUSUM statistic: on the dense daily series y_1..y_n
# (zero-filled grid), C_d = Σ_{i≤d}(y_i − ȳ) peaks at the most likely single
# change point. Scaling by n keeps it integral: c_d = n·cum_d − d·S where
# cum_d is the running sum and S = Σy (both exact int64 ten-thousandths), so
# both engines agree bit-for-bit. The post-minus-pre mean shift reports in
# the trend operator's signed-trunc-division milli convention.
_CUSUM_ORACLE = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0,
         date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) + 1 AS nd
  FROM events
), grid AS (
  SELECT t.event_type, bounds.d0 + CAST(g.o AS INTEGER) AS day
  FROM (SELECT DISTINCT event_type FROM events) t,
       bounds,
       (SELECT unnest(range(0, (SELECT nd FROM bounds))) AS o) g
), daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), series AS (
  SELECT grid.event_type, grid.day, COALESCE(daily.y, 0) AS y
  FROM grid LEFT JOIN daily USING (event_type, day)
), cusum AS (
  SELECT event_type, day, y,
         ROW_NUMBER() OVER w AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(y) OVER w AS cum,
         SUM(y) OVER (PARTITION BY event_type) AS s
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), scored AS (
  SELECT *, n * cum - rn * s AS c,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(n * cum - rn * s) DESC, day) AS rk
  FROM cusum
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       day AS change_day,
       CAST(c AS BIGINT) AS cusum_peak,
       CAST(rn AS BIGINT) AS pre_days,
       CAST(n - rn AS BIGINT) AS post_days,
       CAST(cum AS BIGINT) AS pre_sum_e4,
       CAST(s - cum AS BIGINT) AS post_sum_e4,
       CAST(CASE WHEN n - rn = 0 THEN NULL ELSE
         (CASE WHEN (s - cum) * rn - cum * (n - rn) < 0 THEN -1 ELSE 1 END) *
         (abs((s - cum) * rn - cum * (n - rn)) // (rn * (n - rn)) * 1000
          + abs((s - cum) * rn - cum * (n - rn)) % (rn * (n - rn)) * 1000
            // (rn * (n - rn)))
       END AS BIGINT) AS shift_e4_milli
FROM scored WHERE rk = 1
"""


@register(
    "events_change_point",
    tags=("timeseries", "events", "changepoint", "monitoring"),
    oracle=_CUSUM_ORACLE,
)
def events_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM change-point detection per event type: zero-fill the
    daily value series onto the global date grid, compute the cumulative
    deviation-from-mean statistic, and report the day where |CUSUM|
    peaks — the most likely single level shift — plus the pre/post mean
    shift. The statistic is scaled by n (c_d = n·cum_d − d·S) so the
    whole pipeline stays in exact int64 ten-thousandths: no double
    accumulation, both engines agree bit-for-bit, and the shift reports
    via the explicit-sign truncated division the trend operator
    established (Spark div truncates, DuckDB // floors — they differ on
    negatives).

    Scale shape: the raw fact scan collapses to (event_type, day) grain
    in ONE exchange with map-side combine; everything after runs on the
    tiny day-grain series (the grid is types × days, built distributed
    from a broadcast 1-row bounds aggregate). The per-type windows
    partition on event_type — thousands of monitored series parallelize
    across the cluster, and no window ever sees more than n_days rows.
    At 100 TB this is the shape that matters: the heavy data touches one
    combinable aggregate; detection runs on the rollup."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        (
            F.datediff(F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date")))
            + 1
        ).alias("nd"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.col("nd") - 1)).alias("o"),
            "d0",
        )
        .select("event_type", F.date_add(F.col("d0"), F.col("o")).alias("day"))
    )
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg((F.sum(F.col("value").cast("decimal(18,4)")) * 10000).cast("long").alias("y"))
    series = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("y", F.lit(0).cast("long")).alias("y")
    )
    w_ord = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cusum = series.select(
        "event_type",
        "day",
        F.row_number().over(Window.partitionBy("event_type").orderBy("day")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("y").over(w_ord).alias("cum"),
        F.sum("y").over(w_all).alias("s"),
    )
    scored = cusum.withColumn("c", F.col("n") * F.col("cum") - F.col("rn") * F.col("s"))
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.abs("c").desc(), F.col("day"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .selectExpr(
            "event_type",
            "CAST(n AS BIGINT) AS n_days",
            "day AS change_day",
            "CAST(c AS BIGINT) AS cusum_peak",
            "CAST(rn AS BIGINT) AS pre_days",
            "CAST(n - rn AS BIGINT) AS post_days",
            "CAST(cum AS BIGINT) AS pre_sum_e4",
            "CAST(s - cum AS BIGINT) AS post_sum_e4",
            """CAST(CASE WHEN n - rn = 0 THEN NULL ELSE
                 (CASE WHEN (s - cum) * rn - cum * (n - rn) < 0 THEN -1 ELSE 1 END) *
                 (abs((s - cum) * rn - cum * (n - rn)) div (rn * (n - rn)) * 1000
                  + abs((s - cum) * rn - cum * (n - rn)) % (rn * (n - rn)) * 1000
                    div (rn * (n - rn)))
               END AS BIGINT) AS shift_e4_milli""",
        )
    )


# ---------------------------------------------------------------------------
# Exponentially weighted moving average — decay smoothing, exactly
# ---------------------------------------------------------------------------
EWMA_K = 8  # lookback horizon in days; half-life = 1 day (alpha = 1/2)


@register(
    "ts_ewma_halflife",
    tags=("timeseries", "window", "events", "ewma"),
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(day - DATE '1970-01-01' AS BIGINT) AS epoch_day,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS day_total
  FROM events
  GROUP BY 1, 2
)
SELECT c.event_type, c.day, CAST(c.day_total AS DOUBLE) AS day_total,
       CAST(COUNT(*) AS BIGINT) AS n_days_in_window,
       ROUND(
         CAST(SUM(p.day_total
                  * (1::BIGINT << CAST({EWMA_K} - 1
                                       - (c.epoch_day - p.epoch_day)
                                       AS INT))) AS DOUBLE)
         / CAST(SUM(1::BIGINT << CAST({EWMA_K} - 1
                                      - (c.epoch_day - p.epoch_day)
                                      AS INT)) AS DOUBLE),
         6) AS ewma
FROM daily c
JOIN daily p
  ON p.event_type = c.event_type
 AND c.epoch_day - p.epoch_day >= 0
 AND c.epoch_day - p.epoch_day < {EWMA_K}
GROUP BY c.event_type, c.day, c.day_total
""",
)
def ts_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average with a one-day half-life —
    the decay smoothing ts_moving_average's uniform 7-day window cannot
    express (yesterday should count half of today, not equally). The
    usual recursive EWMA is float-order-dependent and unportable; with
    alpha = 1/2 and a finite EWMA_K-day horizon the weights are EXACT
    integer powers of two (2^(K-1-lag)), so the weighted sum is exact
    DECIMAL x int arithmetic and only the final normalizing division is
    a (correctly-rounded, engine-identical) double op — the PMI
    determinism argument. Missing days drop out of BOTH sums, so gaps
    renormalize instead of decaying toward a phantom zero (the sparse-
    series semantics the moving average gets from RANGE framing).

    Plan shape: one day-grain rollup of the event stream (the only
    corpus-sized exchange, map-side combinable), then a self-join of the
    TINY (type, day) frame on a banded day offset — at 100 TB the day
    grain is ~365 x |types| rows/year regardless of event volume, so the
    quadratic-looking join never touches event grain (the
    events_change_point budget rule)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(dsum("value", 4).alias("day_total"))
        .withColumn("epoch_day", F.unix_date("day"))
    )
    c = daily.select(
        F.col("event_type"),
        F.col("day"),
        F.col("epoch_day").alias("c_epoch"),
        F.col("day_total").alias("c_total"),
    )
    p = daily.select(
        F.col("event_type"),
        F.col("epoch_day").alias("p_epoch"),
        F.col("day_total").alias("p_total"),
    )
    lag = F.col("c_epoch") - F.col("p_epoch")
    wgt = F.expr(f"shiftleft(1L, CAST({EWMA_K} - 1 - (c_epoch - p_epoch) AS INT))")
    return (
        c.join(p, "event_type")
        .filter((lag >= 0) & (lag < EWMA_K))
        .groupBy("event_type", "day", "c_total")
        .agg(
            F.count(F.lit(1)).alias("n_days_in_window"),
            F.round(
                F.sum(F.col("p_total") * wgt).cast("double")
                / F.sum(wgt).cast("double"),
                6,
            ).alias("ewma"),
        )
        .select(
            "event_type",
            "day",
            F.col("c_total").cast("double").alias("day_total"),
            "n_days_in_window",
            "ewma",
        )
    )


# ---------------------------------------------------------------------------
# Rolling median — exact order statistics over a trailing calendar window
# ---------------------------------------------------------------------------
# Smoothing a metrics series with a trailing MEDIAN instead of a mean is the
# robust-monitoring default (one bad day shouldn't move the smoother), but
# engines disagree on median interpolation for even counts. The portable
# definition used here is the LOWER median (rank ceil(n/2) of the sorted
# window), which is always one of the input values — integer in, integer
# out, bit-identical across engines. The window is the trailing 7 calendar
# days on the zero-filled grid (ROWS 6 PRECEDING on a dense series IS the
# calendar window — the same grid construction events_change_point uses).
_ROLLMED_ORACLE = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0,
         date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) + 1 AS nd
  FROM events
), grid AS (
  SELECT t.event_type, bounds.d0 + CAST(g.o AS INTEGER) AS day
  FROM (SELECT DISTINCT event_type FROM events) t,
       bounds,
       (SELECT unnest(range(0, (SELECT nd FROM bounds))) AS o) g
), daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), series AS (
  SELECT grid.event_type, grid.day, COALESCE(daily.y, 0) AS y
  FROM grid LEFT JOIN daily USING (event_type, day)
), windowed AS (
  SELECT event_type, day, y,
         list(y) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS arr
  FROM series
)
SELECT event_type, day,
       CAST(y AS BIGINT) AS y_e4,
       CAST(len(arr) AS BIGINT) AS n_window,
       CAST(list_sort(arr)[CAST((len(arr) + 1) // 2 AS INTEGER)] AS BIGINT)
         AS med7_e4
FROM windowed
"""


@register(
    "ts_rolling_median",
    tags=("timeseries", "events", "robust"),
    oracle=_ROLLMED_ORACLE,
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling MEDIAN of daily value totals per event type —
    the robust smoother for monitoring series. Exact order statistic
    (lower median of the sorted window), not percentile_approx: the
    window holds ≤7 values by construction, so collecting it into an
    array inside the window frame is O(7) per row and the median is an
    exact element lookup — engine-portable where interpolating medians
    and t-digest sketches are not.

    Scale shape: the fact scan collapses to (event_type, day) grain in
    one map-side-combinable exchange; the rolling window runs on the
    dense day-grid series (types × days rows — thousands of series
    parallelize across the cluster, each window sees ≤7 values). The
    array never exceeds 7 elements, so there is no per-row blowup: this
    is the general pattern for exact small-window order statistics at
    100 TB — rollup first, windowed collect on the rollup."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        (
            F.datediff(F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date")))
            + 1
        ).alias("nd"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.col("nd") - 1)).alias("o"),
            "d0",
        )
        .select("event_type", F.date_add(F.col("d0"), F.col("o")).alias("day"))
    )
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg((F.sum(F.col("value").cast("decimal(18,4)")) * 10000).cast("long").alias("y"))
    series = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("y", F.lit(0).cast("long")).alias("y")
    )
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return series.withColumn("arr", F.collect_list("y").over(w7)).selectExpr(
        "event_type",
        "day",
        "CAST(y AS BIGINT) AS y_e4",
        "CAST(size(arr) AS BIGINT) AS n_window",
        "CAST(element_at(array_sort(arr), CAST((size(arr) + 1) div 2 AS INT))"
        " AS BIGINT) AS med7_e4",
    )


# ---------------------------------------------------------------------------
# MAD anomaly flags — the robust twin of ts_anomaly_zscore
# ---------------------------------------------------------------------------
# Mean/stddev anomaly scoring (ts_anomaly_zscore) breaks down exactly when
# it matters: the outliers it should flag inflate the stddev that defines
# "outlier". The robust recipe is median/MAD — both are order statistics, so
# with the LOWER-median convention the whole detector stays in exact int64
# ten-thousandths and hash-matches across engines (a 0.6745 consistency
# constant would reintroduce doubles; the 3×MAD threshold absorbs it).
_MAD_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), medl AS (
  SELECT event_type, list_sort(list(y)) AS ys, COUNT(*) AS n
  FROM daily GROUP BY 1
), med AS (
  SELECT event_type, CAST(n AS BIGINT) AS n_days,
         ys[CAST((n + 1) // 2 AS INTEGER)] AS med
  FROM medl
), dev AS (
  SELECT d.event_type, d.day, d.y, m.n_days, m.med,
         abs(d.y - m.med) AS dv
  FROM daily d JOIN med m USING (event_type)
), madl AS (
  SELECT event_type, list_sort(list(dv)) AS ds, COUNT(*) AS n
  FROM dev GROUP BY 1
), mad AS (
  SELECT event_type, ds[CAST((n + 1) // 2 AS INTEGER)] AS mad FROM madl
)
SELECT dev.event_type, dev.day,
       CAST(dev.y AS BIGINT) AS y_e4,
       CAST(dev.n_days AS BIGINT) AS n_days,
       CAST(dev.med AS BIGINT) AS med_e4,
       CAST(mad.mad AS BIGINT) AS mad_e4,
       CAST(dev.dv AS BIGINT) AS dev_e4
FROM dev JOIN mad USING (event_type)
WHERE (mad.mad > 0 AND dev.dv > 3 * mad.mad)
   OR (mad.mad = 0 AND dev.dv > 0)
"""


@register(
    "ts_anomaly_mad",
    tags=("timeseries", "events", "robust", "anomaly"),
    oracle=_MAD_ORACLE,
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD anomaly detection on daily value totals — the robust
    twin of ts_anomaly_zscore. A day is anomalous when its absolute
    deviation from the per-type median exceeds 3× the median absolute
    deviation (with the degenerate MAD=0 constant-series rule: any
    deviation flags). Both statistics are LOWER medians — exact order
    statistics in int64 ten-thousandths, so unlike stddev-based scoring
    the detector is immune to the outliers it hunts AND immune to
    summation-order double drift across engines.

    Scale shape: facts collapse to (event_type, day) grain in one
    map-side-combinable exchange; the two median passes aggregate the
    day-grain rollup (≤ n_days values per group — bounded arrays, same
    justification as ts_rolling_median) and broadcast back as
    series-grain statistics. At 100 TB the heavy scan feeds exactly one
    exchange; everything else is rollup-sized."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg((F.sum(F.col("value").cast("decimal(18,4)")) * 10000).cast("long").alias("y"))
    med = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr(
            "element_at(array_sort(collect_list(y)),"
            " CAST((count(*) + 1) div 2 AS INT))"
        ).alias("med"),
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "dv", F.abs(F.col("y") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr(
            "element_at(array_sort(collect_list(dv)),"
            " CAST((count(*) + 1) div 2 AS INT))"
        ).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(
            ((F.col("mad") > 0) & (F.col("dv") > 3 * F.col("mad")))
            | ((F.col("mad") == 0) & (F.col("dv") > 0))
        )
        .selectExpr(
            "event_type",
            "day",
            "CAST(y AS BIGINT) AS y_e4",
            "CAST(n_days AS BIGINT) AS n_days",
            "CAST(med AS BIGINT) AS med_e4",
            "CAST(mad AS BIGINT) AS mad_e4",
            "CAST(dv AS BIGINT) AS dev_e4",
        )
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend — median of pairwise slopes at day grain
# ---------------------------------------------------------------------------
# OLS (ts_linear_trend) has breakdown point 0: one corrupted day can flip
# the reported trend. The Theil–Sen estimator — the median of all pairwise
# slopes — tolerates ~29% corruption and is THE standard robust trend for
# monitoring. Naively it is O(n²) in the series length, which is exactly
# why computing it at DAY grain matters: after the rollup, n is the number
# of days (bounded by the calendar), so the pair self-join is
# grain-bounded and corpus-independent — the same argument as
# ts_ewma_halflife's banded self-join. Each pair slope is an exact
# truncated division in milli units (both operands handled with the
# explicit-sign convention ts_linear_trend established); the median is the
# lower order statistic, picked by rank — the VALUE at a fixed rank of a
# sorted multiset is deterministic even though row_number tie order is not,
# which is why only the slope (the sort key) leaves the query.
_THEILSEN_ORACLE = """
WITH lo AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events
), daily AS (
  SELECT event_type,
         date_diff('day', lo.d0, CAST(ts AS DATE)) AS x,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
  FROM events, lo
  GROUP BY event_type, x
), pairs AS (
  SELECT a.event_type,
         (CASE WHEN b.y - a.y < 0 THEN -1 ELSE 1 END) *
         (abs(b.y - a.y) * 1000 // (b.x - a.x)) AS slope_milli
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.x > a.x
), ranked AS (
  SELECT event_type, slope_milli,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope_milli) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS np
  FROM pairs
), nd AS (
  SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1
)
SELECT r.event_type,
       CAST(nd.n_days AS BIGINT) AS n_days,
       CAST(r.np AS BIGINT) AS n_pairs,
       CAST(r.slope_milli AS BIGINT) AS theil_sen_slope_milli_e4_per_day
FROM ranked r JOIN nd USING (event_type)
WHERE r.rn = (r.np + 1) // 2
"""


@register(
    "ts_theil_sen_trend",
    tags=("timeseries", "events", "robust", "regression"),
    oracle=_THEILSEN_ORACLE,
)
def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the lower median of all
    pairwise day-grain slopes. See the module comment above the oracle
    for why the O(n²) pair join is safe — it runs at day grain (calendar-
    bounded), never at event grain, so a 100 TB corpus and a 100 GB one
    build the same pair table. Slopes are exact signed truncated
    divisions in milli ten-thousandths; the median is picked by rank so
    only the deterministic sort-key value is emitted."""
    ev = load_table(spark, sf_dir, "events")
    lo = ev.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    daily = (
        ev.crossJoin(F.broadcast(lo))
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.col("d0")).alias("x"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
            .cast("long")
            .alias("y")
        )
    )
    a = daily.select(
        "event_type", F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        "event_type", F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(b, "event_type").filter(F.col("xb") > F.col("xa")).selectExpr(
        "event_type",
        "(CASE WHEN yb - ya < 0 THEN -1 ELSE 1 END) *"
        " (abs(yb - ya) * 1000 div (xb - xa)) AS slope_milli",
    )
    ranked = pairs.select(
        "event_type",
        "slope_milli",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("slope_milli"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("np"),
    )
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    return (
        ranked.filter(F.expr("rn = (np + 1) div 2"))
        .join(F.broadcast(nd), "event_type")
        .selectExpr(
            "event_type",
            "CAST(n_days AS BIGINT) AS n_days",
            "CAST(np AS BIGINT) AS n_pairs",
            "CAST(slope_milli AS BIGINT) AS theil_sen_slope_milli_e4_per_day",
        )
    )


# ---------------------------------------------------------------------------
# Autocorrelation function — exact-integer lag-k ACF at day grain
# ---------------------------------------------------------------------------
# The seasonality / burstiness diagnostic: r_k = Σ(y_t−ȳ)(y_{t+k}−ȳ) /
# Σ(y_t−ȳ)² on the dense daily count series (zero-filled global grid, so a
# silent day is a real 0, not a missing sample). Multiplying through by n²
# clears the mean fractions: num_k = n²·Σy_t·y_{t+k} − n·S·(P_k+Q_k) +
# (n−k)·S² and den = n²·Σy² − n·S² are integers, so the milli ratio is the
# explicit-sign truncated division ts_linear_trend established. The lag
# pairs come from a self-join of the DAY-GRAIN rollup (n = calendar days —
# corpus-independent, the ts_theil_sen_trend argument), never event grain.
_ACF_MAX_LAG = 7

_ACF_ORACLE = f"""
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0,
         date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) + 1 AS nd
  FROM events
), grid AS (
  SELECT t.event_type, g.o AS x
  FROM (SELECT unnest(generate_series(0, nd - 1)) AS o FROM bounds) g
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
), cnts AS (
  SELECT event_type, date_diff('day', b.d0, CAST(ts AS DATE)) AS x,
         COUNT(*) AS c
  FROM events, bounds b GROUP BY 1, 2
), daily AS (
  SELECT grid.event_type, grid.x, COALESCE(cnts.c, 0) AS y
  FROM grid LEFT JOIN cnts USING (event_type, x)
), stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(y) AS s, SUM(y * y) AS ss
  FROM daily GROUP BY 1
), lagged AS (
  SELECT a.event_type, k.k,
         COUNT(*) AS m,
         SUM(a.y * b.y) AS sxy,
         SUM(a.y) AS pa,
         SUM(b.y) AS qb
  FROM daily a
  CROSS JOIN (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS k) k
  JOIN daily b ON b.event_type = a.event_type AND b.x = a.x + k.k
  GROUP BY 1, 2
), nd AS (
  SELECT l.event_type, l.k, l.m, st.n, st.s,
         st.n * st.n * l.sxy - st.n * st.s * (l.pa + l.qb) + l.m * st.s * st.s
           AS num,
         st.n * st.n * st.ss - st.n * st.s * st.s AS den
  FROM lagged l JOIN stats st USING (event_type)
)
SELECT event_type, CAST(k AS BIGINT) AS lag_days,
       CAST(n AS BIGINT) AS n_days, CAST(m AS BIGINT) AS n_pairs,
       CAST(num AS BIGINT) AS acf_num, CAST(den AS BIGINT) AS acf_den,
       CAST(CASE WHEN den = 0 THEN NULL ELSE
         (CASE WHEN num < 0 THEN -1 ELSE 1 END) *
         (abs(num) // den * 1000 + abs(num) % den * 1000 // den)
       END AS BIGINT) AS acf_milli
FROM nd
"""


@register(
    "ts_autocorrelation",
    tags=("timeseries", "events", "acf"),
    oracle=_ACF_ORACLE,
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily event-count series per event
    type — the seasonality/burstiness diagnostic (a weekly cycle shows as
    an acf peak at lag 7; white noise hovers near 0). The single-
    denominator ACF form (full-series mean and variance) avoids any
    square root: scaled by n², numerator and denominator are exact
    integers, and the milli ratio uses the explicit-sign truncated
    division convention (Spark div truncates, DuckDB // floors — they
    differ on negatives, and ACF numerators go negative).

    Scale shape: facts collapse to the zero-filled (event_type, day)
    grid in one map-side-combinable exchange; the 7-lag pair join runs
    at DAY grain (calendar-bounded, corpus-independent — the
    ts_theil_sen_trend argument), so its cost never grows with the
    event volume. Moment products carry DECIMAL(38,0) on the Spark side
    (SUM(long) wraps silently; DuckDB promotes to HUGEINT) — exact far
    beyond 100 TB daily counts."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        (
            F.datediff(F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date")))
            + 1
        ).alias("nd"),
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.col("nd") - 1)).alias("x"),
        )
    )
    cnts = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.col("d0")).alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    daily = grid.join(cnts, ["event_type", "x"], "left").select(
        "event_type", "x", F.coalesce("c", F.lit(0)).cast("long").alias("y")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
    )
    ks = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("k"))
    a = daily.crossJoin(F.broadcast(ks))
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    lagged = (
        a.join(
            b,
            (F.col("et_b") == F.col("event_type"))
            & (F.col("xb") == F.col("x") + F.col("k")),
        )
        .groupBy("event_type", "k")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(F.col("y") * F.col("yb")).alias("sxy"),
            F.sum("y").alias("pa"),
            F.sum("yb").alias("qb"),
        )
    )
    nd = lagged.join(stats, "event_type").selectExpr(
        "event_type",
        "k",
        "m",
        "n",
        "CAST(n AS DECIMAL(38,0)) * n * sxy - CAST(n AS DECIMAL(38,0)) * s * (pa + qb)"
        " + CAST(m AS DECIMAL(38,0)) * s * s AS num",
        "CAST(n AS DECIMAL(38,0)) * n * ss - CAST(n AS DECIMAL(38,0)) * s * s AS den",
    )
    return nd.selectExpr(
        "event_type",
        "CAST(k AS BIGINT) AS lag_days",
        "CAST(n AS BIGINT) AS n_days",
        "CAST(m AS BIGINT) AS n_pairs",
        "CAST(num AS BIGINT) AS acf_num",
        "CAST(den AS BIGINT) AS acf_den",
        """CAST(CASE WHEN den = 0 THEN NULL ELSE
             (CASE WHEN num < 0 THEN -1 ELSE 1 END) *
             (abs(num) div den * 1000 + abs(num) % den * 1000 div den)
           END AS BIGINT) AS acf_milli""",
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonal index — the calendar-profile companion of the ACF
# ---------------------------------------------------------------------------
# index_dow = mean(daily count | dow) / mean(daily count), in exact milli:
# (sum_dow · n_total · 1000) div (n_dow · sum_total). Day-of-week is
# computed portably as days-since-a-known-Monday mod 7 (Spark's dayofweek
# is 1=Sunday, DuckDB's dayofweek is 0=Sunday, DuckDB's isodow has no Spark
# twin — the epoch arithmetic sidesteps all three conventions).
_DOW_ORACLE = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0,
         date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) + 1 AS nd
  FROM events
), grid AS (
  SELECT t.event_type, (b.d0 + g.o * INTERVAL 1 DAY)::DATE AS day
  FROM bounds b, (SELECT unnest(generate_series(0, nd - 1)) AS o FROM bounds) g
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
), cnts AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), daily AS (
  SELECT grid.event_type, grid.day,
         date_diff('day', DATE '1970-01-05', grid.day) % 7 + 1 AS dow,
         COALESCE(cnts.c, 0) AS y
  FROM grid LEFT JOIN cnts USING (event_type, day)
), tot AS (
  SELECT event_type, COUNT(*) AS n_total, SUM(y) AS sum_total
  FROM daily GROUP BY 1
)
SELECT d.event_type, CAST(d.dow AS BIGINT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(d.y) AS BIGINT) AS n_events,
       CAST(SUM(d.y) * 1000 // COUNT(*) AS BIGINT) AS mean_daily_milli,
       CAST(CASE WHEN t.sum_total = 0 THEN NULL ELSE
         SUM(d.y) * t.n_total * 1000 // (COUNT(*) * t.sum_total)
       END AS BIGINT) AS seasonal_index_milli
FROM daily d JOIN tot t USING (event_type)
GROUP BY d.event_type, d.dow, t.n_total, t.sum_total
"""


@register(
    "ts_seasonality_dow",
    tags=("timeseries", "events", "seasonality"),
    oracle=_DOW_ORACLE,
)
def ts_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index per event type — mean daily count for
    each weekday relative to the overall mean (milli; 1000 = flat, >1000
    = that weekday runs hot). Companion of ts_autocorrelation: the ACF
    says THAT a weekly cycle exists, this profile says WHICH days carry
    it. Computed on the zero-filled global day grid so silent days
    weigh in as real zeros; day-of-week is epoch arithmetic
    (days-since-Monday-1970-01-05 mod 7) because Spark's and DuckDB's
    dayofweek disagree on the week origin.

    Scale shape: one map-side-combinable exchange to (event_type, day)
    grain, then two rollup-sized aggregates (7 rows per type out); the
    totals broadcast back. The fact scan feeds exactly one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        (
            F.datediff(F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date")))
            + 1
        ).alias("nd"),
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.col("nd") - 1)).alias("o"),
            "d0",
        )
        .select("event_type", F.date_add(F.col("d0"), F.col("o")).alias("day"))
    )
    cnts = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    daily = grid.join(cnts, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        (F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")) % 7 + 1).alias(
            "dow"
        ),
        F.coalesce("c", F.lit(0)).cast("long").alias("y"),
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("y").alias("sum_total")
    )
    return (
        daily.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "dow", "n_total", "sum_total")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("y").alias("n_events"),
        )
        .selectExpr(
            "event_type",
            "CAST(dow AS BIGINT) AS dow",
            "CAST(n_days AS BIGINT) AS n_days",
            "CAST(n_events AS BIGINT) AS n_events",
            "CAST(n_events * 1000 div n_days AS BIGINT) AS mean_daily_milli",
            """CAST(CASE WHEN sum_total = 0 THEN NULL ELSE
                 n_events * n_total * 1000 div (n_days * sum_total)
               END AS BIGINT) AS seasonal_index_milli""",
        )
    )
