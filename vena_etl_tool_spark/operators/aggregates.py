"""Aggregation operators beyond the flagship (SURVEY.md §B.4).

All Spark aggregates are automatically partial+final (map-side combine),
so every query here ships a few rows per task into the shuffle no matter
the input size. Statistical aggregates are rounded on both sides because
their merge order is engine-specific; sums/averages use the exact decimal
discipline from operators/_shared.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table, register_views
from ..registry import register
from ._shared import dsum


@register(
    "agg_distinct_counts",
    tags=("aggregate", "distinct"),
    oracle="""
SELECT
  o_orderpriority,
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(DISTINCT o_orderstatus) AS n_statuses,
  CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_distinct_price,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/SUM(DISTINCT) per group — Catalyst plans the expand +
    two-phase aggregate; no manual dedup pass needed."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.sum_distinct(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_distinct_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_statistical",
    tags=("aggregate", "stats"),
    oracle="""
SELECT
  l_returnflag,
  ROUND(STDDEV_SAMP(l_quantity), 4) + 0.0 AS qty_stddev,
  ROUND(VAR_SAMP(l_quantity), 4) + 0.0 AS qty_var,
  ROUND(CORR(l_quantity, l_extendedprice), 4) + 0.0 AS qty_price_corr,
  ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) + 0.0 AS qty_price_covar,
  ROUND(SKEWNESS(l_quantity), 4) + 0.0 AS qty_skew,
  ROUND(KURTOSIS(l_quantity), 4) + 0.0 AS qty_kurt
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_statistical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates; rounded because distributed moment merges
    are not bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    # +0.0 canonicalizes IEEE -0.0 to +0.0 (both engines)
    zero = F.lit(0.0)
    return li.groupBy("l_returnflag").agg(
        (F.round(F.stddev_samp("l_quantity"), 4) + zero).alias("qty_stddev"),
        (F.round(F.var_samp("l_quantity"), 4) + zero).alias("qty_var"),
        (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + zero).alias(
            "qty_price_corr"
        ),
        (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2) + zero).alias(
            "qty_price_covar"
        ),
        (F.round(F.skewness("l_quantity"), 4) + zero).alias("qty_skew"),
        (F.round(F.kurtosis("l_quantity"), 4) + zero).alias("qty_kurt"),
    )


@register(
    "agg_collect",
    tags=("aggregate", "collect"),
    oracle="""
SELECT
  o_orderpriority,
  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
  COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set sorted for determinism (collect order is undefined).
    The array is serialized to a ','-joined string at the query boundary
    so the result is scalar-typed (array outputs aren't canonicalizable
    by the harness hash); sort-before-join keeps it deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_rollup",
    tags=("aggregate", "rollup"),
    oracle="""
SELECT
  l_returnflag, l_linestatus,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  GROUPING(l_returnflag) AS g_flag,
  GROUPING(l_linestatus) AS g_status
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING markers (distinguish real NULL keys from
    subtotal rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


@register(
    "agg_cube",
    tags=("aggregate", "cube"),
    oracle="""
SELECT
  o_orderstatus, o_orderpriority,
  COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total"),
    )


@register(
    "agg_grouping_sets",
    tags=("aggregate", "grouping-sets"),
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL over registered temp views."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_pivot",
    tags=("aggregate", "pivot"),
    oracle="""
SELECT
  l_returnflag,
  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never let pivot scan for distinct
    values at scale — pass the list so it's one aggregate, not two jobs)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_f"),
            F.col("O").alias("qty_o"),
        )
    )


@register(
    "unpivot_melt",
    tags=("aggregate", "unpivot"),
    oracle="""
WITH pivoted AS (
  SELECT
    l_returnflag,
    CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
    CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, status_col, qty
FROM pivoted
UNPIVOT (qty FOR status_col IN (qty_f, qty_o))
""",
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide → long, the inverse of agg_pivot — pivot then
    unpivot round-trips the per-status quantities into rows."""
    wide = agg_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty_f", "qty_o"],
        variableColumnName="status_col",
        valueColumnName="qty",
    ).filter(F.col("qty").isNotNull())


@register(
    "agg_percentiles_exact",
    tags=("aggregate", "percentile"),
    oracle="""
SELECT
  l_returnflag,
  ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25,
  ROUND(quantile_cont(l_quantity, 0.5), 4) AS q50,
  ROUND(quantile_cont(l_quantity, 0.75), 4) AS q75,
  ROUND(MEDIAN(l_extendedprice), 4) AS median_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) — matches quantile_cont."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q25"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("q50"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("q75"),
        F.round(F.median("l_extendedprice"), 4).alias("median_price"),
    )


@register(
    "agg_approx_distinct",
    tags=("aggregate", "approx"),
    oracle=None,  # HLL sketches are engine-specific; accuracy asserted in unit tests
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB substitute for
    exact distinct counts; rel-error vs exact is unit-tested (<5%)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )


@register(
    "agg_approx_quantile",
    tags=("aggregate", "approx"),
    oracle=None,  # KLL/GK sketch values are engine-specific
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx — single-pass mergeable quantile sketch. The
    three quantiles are emitted as scalar columns (not the raw array) so
    the output is harness-hashable."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias("pq")
        )
        .select(
            "l_linestatus",
            F.element_at("pq", 1).alias("price_p50"),
            F.element_at("pq", 2).alias("price_p95"),
            F.element_at("pq", 3).alias("price_p99"),
        )
    )


@register(
    "agg_hll_sketch_rollup",
    tags=("aggregate", "approx", "sketch"),
    oracle=None,  # DataSketches HLL registers are engine-specific;
    # estimate-vs-exact tolerance is unit-tested (tests/test_edgecases.py)
)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable sketch STATE as data — the 100 TB distinct-count pattern
    `approx_count_distinct` hides: per-month HLL sketches are materialized
    once (this is what you'd persist with each daily partition), then the
    year rollup MERGES the sketches (`hll_union_agg`) instead of
    re-scanning the raw fact table. At scale this turns every
    distinct-count rollup after the first into a KB-sized merge job.
    HLL register updates are max-based, so estimates are deterministic
    under any partitioning/merge order (safe for the hash harness's
    rows-only check and for cross-run comparison)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    return (
        monthly.groupBy("yr")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_customers"),
            F.count(F.lit(1)).alias("n_months"),
        )
        .select("yr", "est_customers", "n_months")
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


@register(
    "profile_column_stats",
    tags=("profiling", "aggregate", "quality"),
    oracle=" UNION ALL ".join(
        f"""
SELECT '{c}' AS col,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_val,
       CAST(MAX({c}) AS VARCHAR) AS max_val
FROM documents"""
        for c in _PROFILE_COLS
    ),
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling — the data-quality pass every pipeline runs before
    training: per column, row/null/distinct counts and min/max (as
    strings, so one long-format result covers heterogeneous types). All
    five columns profile in ONE wide aggregate over ONE scan: the N
    `count(distinct col_i)` branches compile to a single Expand (row
    replication in-memory, not N table scans — the r4 union-of-branches
    shape re-scanned the table per column, a 5× scan multiplier at
    100 TB), then a `stack` unpivots the single wide row to long format
    driver-side-free. At 100 TB you'd optionally approx the distinct
    counts (the agg_approx_distinct pattern) to drop the Expand
    entirely; exact here so the oracle can hash-check.

    Long format (col, n_rows, n_null, n_distinct, min_val, max_val)
    rather than one wide row: schema stays fixed as tables gain columns,
    which is what lets downstream drift alerts diff profiles across
    snapshots.

    Type guard: min/max are compared as STRINGS against the oracle, so
    _PROFILE_COLS is restricted to types whose string rendering is
    identical in Spark and DuckDB (integral + string). A double would
    diverge ('1.0E10' vs '10000000000.0'); widen only with an explicit
    per-type normalization."""
    docs = load_table(spark, sf_dir, "documents")
    _STABLE_STR_CAST = ("bigint", "int", "smallint", "tinyint", "string")
    dtypes = dict(docs.dtypes)
    for c in _PROFILE_COLS:
        if dtypes[c] not in _STABLE_STR_CAST:
            raise TypeError(
                f"profile_column_stats: column {c!r} has type {dtypes[c]!r}; "
                "min/max string rendering is only cross-engine-stable for "
                f"{_STABLE_STR_CAST} — add explicit normalization first"
            )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"cnt_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"min_{c}"),
            F.max(c).cast("string").alias(f"max_{c}"),
        ]
    wide = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows, n_rows - cnt_{c}, nd_{c}, min_{c}, max_{c}"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col, n_rows, n_null, n_distinct, min_val, max_val)"
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnosis — the report that drives salting/AQE decisions
# ---------------------------------------------------------------------------
_SKEW_KEYS = ("l_partkey", "l_suppkey", "l_orderkey")
_SKEW_TOPN = 10

_SKEW_ORACLE = f"""
WITH kv AS (
  {" UNION ALL ".join(f"SELECT '{k}' AS key_name, {k} AS key_value FROM lineitem" for k in _SKEW_KEYS)}
), cnts AS (
  SELECT key_name, key_value, COUNT(*) AS cnt FROM kv GROUP BY 1, 2
), rk AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY key_name ORDER BY cnt DESC, key_value) AS r
  FROM cnts
)
SELECT key_name,
  CAST(SUM(cnt) AS BIGINT) AS n_rows,
  CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(MAX(cnt) AS BIGINT) AS max_count,
  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cnt) AS BIGINT) AS p50_count,
  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY cnt) AS BIGINT) AS p99_count,
  CAST(MAX(CASE WHEN r = 1 THEN cnt END) * 1000000 // SUM(cnt) AS BIGINT)
    AS top1_share_ppm,
  CAST(SUM(CASE WHEN r <= {_SKEW_TOPN} THEN cnt ELSE 0 END) * 1000000
       // SUM(cnt) AS BIGINT) AS top10_share_ppm,
  CAST(MAX(cnt) * COUNT(*) * 1000000 // SUM(cnt) AS BIGINT) AS skew_ratio_ppm
FROM rk GROUP BY key_name
"""


@register(
    "profile_key_skew",
    tags=("aggregate", "profiling", "skew", "llm"),
    oracle=_SKEW_ORACLE,
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report over lineitem's three join keys in ONE pass:
    per key, row/key counts, max and exact p50/p99 per-key multiplicity,
    the top-1/top-10 key concentration in ppm, and max/mean as
    skew_ratio_ppm. This is the diagnosis that decides between plain
    shuffle, salting (operators/skew.py), and AQE skew-split at 100 TB —
    produced as a first-class operator instead of an ad-hoc notebook
    query, cheap enough to run as a pre-flight before every big join.

    Plan shape: one fact scan fans out map-only via stack() to
    (key_name, key_value) grain, one exchange to per-key counts, and
    everything downstream (window rank + percentiles) runs at KEYS
    grain — orders of magnitude smaller than the fact table; the final
    aggregate has exactly len(_SKEW_KEYS) groups."""
    li = load_table(spark, sf_dir, "lineitem")
    stack_args = ", ".join(f"'{k}', {k}" for k in _SKEW_KEYS)
    kv = li.selectExpr(
        f"stack({len(_SKEW_KEYS)}, {stack_args}) AS (key_name, key_value)"
    )
    cnts = kv.groupBy("key_name", "key_value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("key_name").orderBy(F.col("cnt").desc(), "key_value")
    return (
        cnts.withColumn("r", F.row_number().over(w))
        .groupBy("key_name")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_count"),
            F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cnt) AS BIGINT)").alias("p50_count"),
            F.expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY cnt) AS BIGINT)").alias("p99_count"),
            F.expr(
                "CAST(MAX(CASE WHEN r = 1 THEN cnt END) * 1000000"
                " div SUM(cnt) AS BIGINT)"
            ).alias("top1_share_ppm"),
            F.expr(
                f"CAST(SUM(CASE WHEN r <= {_SKEW_TOPN} THEN cnt ELSE 0 END)"
                " * 1000000 div SUM(cnt) AS BIGINT)"
            ).alias("top10_share_ppm"),
            F.expr(
                "CAST(MAX(cnt) * COUNT(*) * 1000000 div SUM(cnt) AS BIGINT)"
            ).alias("skew_ratio_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Winsorized robust statistics — outlier-insensitive profiling
# ---------------------------------------------------------------------------
_WINSOR_LO = 0.05
_WINSOR_HI = 0.95

_WINSOR_ORACLE = f"""
WITH cuts AS (
  SELECT source,
         percentile_disc({_WINSOR_LO}) WITHIN GROUP (ORDER BY n_chars) AS lo_cut,
         percentile_disc({_WINSOR_HI}) WITHIN GROUP (ORDER BY n_chars) AS hi_cut
  FROM documents GROUP BY source
), clamped AS (
  SELECT d.source, c.lo_cut, c.hi_cut,
         LEAST(GREATEST(d.n_chars, c.lo_cut), c.hi_cut) AS v,
         CAST(d.n_chars < c.lo_cut AS INT) AS is_lo,
         CAST(d.n_chars > c.hi_cut AS INT) AS is_hi
  FROM documents d JOIN cuts c ON c.source = d.source
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(MAX(lo_cut) AS BIGINT) AS lo_cut,
  CAST(MAX(hi_cut) AS BIGINT) AS hi_cut,
  CAST(SUM(is_lo) AS BIGINT) AS n_clamped_lo,
  CAST(SUM(is_hi) AS BIGINT) AS n_clamped_hi,
  CAST(SUM(v) * 1000 // COUNT(*) AS BIGINT) AS win_mean_milli,
  CAST((COUNT(*) * SUM(v * v) - SUM(v) * SUM(v))
       // (COUNT(*) * COUNT(*)) AS BIGINT) AS win_var
FROM clamped GROUP BY source
"""


@register(
    "agg_winsorized_stats",
    tags=("aggregate", "profiling", "robust", "llm"),
    oracle=_WINSOR_ORACLE,
)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-source length statistics — the robust-profiling
    counterpart of profile_column_stats: per-group p5/p95 cutoffs
    (percentile_disc — exact, rank-based, portable), values clamped
    into [lo, hi], then mean and population variance of the clamped
    values in exact integer arithmetic (milli-units / num-div-den).
    Outliers can't drag the mean, and the clamp counts expose how much
    mass the tails held — the quality-gate statistic a corpus curation
    pipeline wants before setting length filters.

    Plan shape: one aggregate to per-source cutoffs (a handful of
    rows, broadcast back onto the scan — same topology as
    text_lm_quality_buckets), then one clamped aggregate; no global
    sort, no second shuffle of the fact table."""
    docs = load_table(spark, sf_dir, "documents")
    cuts = docs.groupBy("source").agg(
        # Spark's percentile_disc returns DOUBLE (DuckDB keeps BIGINT) —
        # cast back immediately; the cutoff is an actual data value, so
        # the round-trip is exact
        F.expr(
            f"CAST(percentile_disc({_WINSOR_LO})"
            " WITHIN GROUP (ORDER BY n_chars) AS BIGINT)"
        ).alias("lo_cut"),
        F.expr(
            f"CAST(percentile_disc({_WINSOR_HI})"
            " WITHIN GROUP (ORDER BY n_chars) AS BIGINT)"
        ).alias("hi_cut"),
    )
    clamped = docs.join(F.broadcast(cuts), "source").select(
        "source",
        "lo_cut",
        "hi_cut",
        F.least(F.greatest("n_chars", "lo_cut"), "hi_cut").alias("v"),
        (F.col("n_chars") < F.col("lo_cut")).cast("int").alias("is_lo"),
        (F.col("n_chars") > F.col("hi_cut")).cast("int").alias("is_hi"),
    )
    return clamped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("lo_cut").cast("long").alias("lo_cut"),
        F.max("hi_cut").cast("long").alias("hi_cut"),
        F.sum("is_lo").cast("long").alias("n_clamped_lo"),
        F.sum("is_hi").cast("long").alias("n_clamped_hi"),
        # exactness guard (ADVICE r6): DuckDB's SUM(BIGINT) promotes to
        # HUGEINT and stays exact; Spark's SUM(long) stays long and wraps
        # silently outside ANSI mode. Carry the moment arithmetic in
        # DECIMAL(38,0) — exact to 1e38, which covers count*sum(v^2) for
        # ~1e12 docs of 1e4 chars — so the cross-engine bridge holds at
        # corpus sizes where int64 would diverge.
        F.expr(
            "CAST(CAST(SUM(v) AS DECIMAL(38,0)) * 1000 div COUNT(*) AS BIGINT)"
        ).alias("win_mean_milli"),
        F.expr(
            "CAST((CAST(COUNT(*) AS DECIMAL(38,0))"
            " * SUM(CAST(v AS DECIMAL(18,0)) * v)"
            " - CAST(SUM(v) AS DECIMAL(38,0)) * CAST(SUM(v) AS DECIMAL(38,0)))"
            " div (CAST(COUNT(*) AS DECIMAL(38,0)) * COUNT(*)) AS BIGINT)"
        ).alias("win_var"),
    )


# ---------------------------------------------------------------------------
# Equi-width histogram — the ANALYZE-statistics / data-profiling primitive
# ---------------------------------------------------------------------------
HIST_BIN_W = 25_000.0  # o_totalprice bin width (~23 bins over TPC-H range)


@register(
    "profile_histogram_equiwidth",
    tags=("aggregate", "profiling", "histogram"),
    oracle=f"""
SELECT CAST(floor(o_totalprice / {HIST_BIN_W}) AS BIGINT) AS bin,
       CAST(floor(o_totalprice / {HIST_BIN_W}) AS BIGINT) * {HIST_BIN_W}
         AS bin_lo,
       COUNT(*) AS n_rows,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY 1, 2
""",
)
def profile_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram over orders.o_totalprice — the
    profiling primitive behind ANALYZE statistics, optimizer selectivity
    estimates, and data-quality drift dashboards (the missing sibling of
    profile_column_stats' min/max/distinct and agg_percentiles_exact's
    quantiles: those summarize, this shows SHAPE). Bins are fixed-width
    floor(price / W): the bin id is ONE correctly-rounded double
    division + floor — identical in both engines (the PMI argument) —
    and each bin carries count, min/max (exact doubles from the scan)
    and an exact-DECIMAL sum.

    Plan shape: a single map-side-combinable hash aggregate — the
    histogram is ~range/W rows however big the fact table, so at 100 TB
    this is one scan + a KB-sized exchange, the cheapest possible
    full-table profile. Equi-DEPTH histograms need the percentile
    machinery instead (agg_percentiles_exact / approx twin)."""
    orders = load_table(spark, sf_dir, "orders")
    bin_ = F.floor(F.col("o_totalprice") / HIST_BIN_W).cast("long")
    return orders.groupBy(
        bin_.alias("bin"), (bin_ * HIST_BIN_W).alias("bin_lo")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "agg_mode_deterministic",
    tags=("aggregate", "mode", "window"),
    oracle="""
WITH counts AS (
  SELECT o_orderstatus, year(o_orderdate) AS order_year,
         o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2, 3
)
SELECT o_orderstatus, order_year,
       o_orderpriority AS mode_priority, n AS mode_count,
       n_values, group_total,
       CAST(n * 1000 // group_total AS BIGINT) AS share_milli
FROM (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus, order_year
                            ORDER BY n DESC, o_orderpriority) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY o_orderstatus, order_year)
              AS BIGINT) AS n_values,
         CAST(SUM(n) OVER (PARTITION BY o_orderstatus, order_year)
              AS BIGINT) AS group_total
  FROM counts
) WHERE rk = 1
""",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group — the most-frequent-value aggregate
    with ties broken by value order. Both engines ship a native mode()
    whose tie-breaking is implementation-defined (Spark picks an
    arbitrary hash-map winner, DuckDB the first encountered), so the
    portable form is stated explicitly: count to (group, value) grain,
    then one row_number window ordered (count DESC, value) — the same
    determinism discipline the repo applies to every top-1 pick. Here:
    the modal order priority per (status, year). Output carries the
    mode's share and the distinct-value count, the two numbers that say
    whether the mode MEANS anything.

    Plan shape: the fact table collapses to (group, value) grain in one
    map-side-combinable aggregate (5 priorities x status x year groups
    here); the window runs on that tiny grain — at 100 TB the only
    fact-sized cost is the first scan, the window never sees row grain
    (the skyline/price-grain rule again)."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy(
        "o_orderstatus",
        F.year("o_orderdate").alias("order_year"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n"))
    grp = Window.partitionBy("o_orderstatus", "order_year")
    w = grp.orderBy(F.col("n").desc(), "o_orderpriority")
    return (
        counts.select(
            "o_orderstatus",
            "order_year",
            "o_orderpriority",
            "n",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(grp).cast("long").alias("n_values"),
            F.sum("n").over(grp).cast("long").alias("group_total"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            "order_year",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
            "n_values",
            "group_total",
            F.expr("CAST(n * 1000 div group_total AS BIGINT)").alias(
                "share_milli"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Declarative data-quality expectations — the Deequ/Great-Expectations shape
# ---------------------------------------------------------------------------
# A constraint suite evaluated as ONE aggregate pass per table (each check
# is a conditional count inside the same scan — the Deequ trick: N
# constraints cost one shuffle-free aggregation, not N scans), then
# unpivoted to one row per constraint with its compliance metric in ppm and
# the pass verdict. Uniqueness is the one check that needs key grain —
# COUNT(DISTINCT) rides the same aggregate.
_EXPECT_PPM = 1_000_000


@register(
    "profile_expectations",
    tags=("profiling", "quality", "aggregate"),
    oracle=f"""
WITH o AS (
  SELECT COUNT(*) AS n,
         COUNT(DISTINCT o_orderkey) AS n_uniq,
         SUM(CAST(o_totalprice > 0 AS INT)) AS n_price_ok,
         SUM(CAST(o_orderstatus IN ('O', 'F', 'P') AS INT)) AS n_status_ok,
         SUM(CAST(CAST(o_orderdate AS DATE)
                  BETWEEN DATE '1995-01-01' AND DATE '2001-12-31'
                  AS INT)) AS n_date_ok
  FROM orders
), c AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(regexp_matches(c_name, '^Customer#[0-9]{{9}}$') AS INT))
           AS n_name_ok,
         SUM(CAST(c_acctbal >= -1000.0 AS INT)) AS n_bal_ok
  FROM customer
), l AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(l_quantity BETWEEN 1 AND 50 AS INT)) AS n_qty_ok,
         SUM(CAST(l_shipdate IS NOT NULL AS INT)) AS n_ship_ok
  FROM lineitem
)
SELECT * FROM (
  SELECT 'orders' AS tbl, 'unique(o_orderkey)' AS constraint,
         CAST(n AS BIGINT) AS n_rows, CAST(n_uniq AS BIGINT) AS n_ok,
         CAST(n_uniq * {_EXPECT_PPM} // n AS BIGINT) AS metric_ppm,
         CAST(n_uniq = n AS INT) AS pass FROM o
  UNION ALL
  SELECT 'orders', 'compliance(o_totalprice > 0)',
         CAST(n AS BIGINT), CAST(n_price_ok AS BIGINT),
         CAST(n_price_ok * {_EXPECT_PPM} // n AS BIGINT),
         CAST(n_price_ok = n AS INT) FROM o
  UNION ALL
  SELECT 'orders', 'in_set(o_orderstatus)',
         CAST(n AS BIGINT), CAST(n_status_ok AS BIGINT),
         CAST(n_status_ok * {_EXPECT_PPM} // n AS BIGINT),
         CAST(n_status_ok = n AS INT) FROM o
  UNION ALL
  SELECT 'orders', 'range(o_orderdate)',
         CAST(n AS BIGINT), CAST(n_date_ok AS BIGINT),
         CAST(n_date_ok * {_EXPECT_PPM} // n AS BIGINT),
         CAST(n_date_ok = n AS INT) FROM o
  UNION ALL
  SELECT 'customer', 'pattern(c_name)',
         CAST(n AS BIGINT), CAST(n_name_ok AS BIGINT),
         CAST(n_name_ok * {_EXPECT_PPM} // n AS BIGINT),
         CAST(n_name_ok = n AS INT) FROM c
  UNION ALL
  SELECT 'customer', 'min(c_acctbal) >= -1000',
         CAST(n AS BIGINT), CAST(n_bal_ok AS BIGINT),
         CAST(n_bal_ok * {_EXPECT_PPM} // n AS BIGINT),
         CAST(n_bal_ok = n AS INT) FROM c
  UNION ALL
  SELECT 'lineitem', 'range(l_quantity)',
         CAST(n AS BIGINT), CAST(n_qty_ok AS BIGINT),
         CAST(n_qty_ok * {_EXPECT_PPM} // n AS BIGINT),
         CAST(n_qty_ok = n AS INT) FROM l
  UNION ALL
  SELECT 'lineitem', 'completeness(l_shipdate)',
         CAST(n AS BIGINT), CAST(n_ship_ok AS BIGINT),
         CAST(n_ship_ok * {_EXPECT_PPM} // n AS BIGINT),
         CAST(n_ship_ok = n AS INT) FROM l
)
""",
)
def profile_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality expectation suite: uniqueness, value
    compliance, set membership, range, pattern, and completeness
    constraints over orders/customer/lineitem — each table verified in
    ONE aggregate pass (every constraint is a conditional count riding
    the same scan; uniqueness rides as COUNT(DISTINCT)), then unpivoted
    via stack() to one row per constraint with its compliance metric in
    exact ppm and a pass verdict. This is the pre-load quality gate the
    reference's validation step (pipeline/ingest.py) grows into at
    warehouse scale.

    Scale shape: three scans total (one per table — N constraints share
    it), each collapsing to a 1-row aggregate; COUNT(DISTINCT) on the
    key column is the only exchange that sees key grain. Output is
    constraint-grain (bytes)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    p = _EXPECT_PPM
    o = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderkey").alias("n_uniq"),
        F.sum((F.col("o_totalprice") > 0).cast("int")).alias("n_price_ok"),
        F.sum(F.col("o_orderstatus").isin("O", "F", "P").cast("int")).alias(
            "n_status_ok"
        ),
        F.sum(
            F.col("o_orderdate")
            .cast("date")
            .between(F.lit("1995-01-01").cast("date"), F.lit("2001-12-31").cast("date"))
            .cast("int")
        ).alias("n_date_ok"),
    )
    c = customer.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_name").rlike("^Customer#[0-9]{9}$").cast("int")).alias(
            "n_name_ok"
        ),
        F.sum((F.col("c_acctbal") >= -1000.0).cast("int")).alias("n_bal_ok"),
    )
    li = lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").between(1, 50).cast("int")).alias("n_qty_ok"),
        F.sum(F.col("l_shipdate").isNotNull().cast("int")).alias("n_ship_ok"),
    )
    o_rows = o.selectExpr(
        f"""stack(4,
          'unique(o_orderkey)', n_uniq,
          'compliance(o_totalprice > 0)', n_price_ok,
          'in_set(o_orderstatus)', n_status_ok,
          'range(o_orderdate)', n_date_ok) AS (constraint, n_ok)""",
        "n",
    ).selectExpr(
        "'orders' AS tbl",
        "constraint",
        "CAST(n AS BIGINT) AS n_rows",
        "CAST(n_ok AS BIGINT) AS n_ok",
        f"CAST(n_ok * {p} div n AS BIGINT) AS metric_ppm",
        "CAST(n_ok = n AS INT) AS pass",
    )
    c_rows = c.selectExpr(
        """stack(2,
          'pattern(c_name)', n_name_ok,
          'min(c_acctbal) >= -1000', n_bal_ok) AS (constraint, n_ok)""",
        "n",
    ).selectExpr(
        "'customer' AS tbl",
        "constraint",
        "CAST(n AS BIGINT) AS n_rows",
        "CAST(n_ok AS BIGINT) AS n_ok",
        f"CAST(n_ok * {p} div n AS BIGINT) AS metric_ppm",
        "CAST(n_ok = n AS INT) AS pass",
    )
    l_rows = li.selectExpr(
        """stack(2,
          'range(l_quantity)', n_qty_ok,
          'completeness(l_shipdate)', n_ship_ok) AS (constraint, n_ok)""",
        "n",
    ).selectExpr(
        "'lineitem' AS tbl",
        "constraint",
        "CAST(n AS BIGINT) AS n_rows",
        "CAST(n_ok AS BIGINT) AS n_ok",
        f"CAST(n_ok * {p} div n AS BIGINT) AS metric_ppm",
        "CAST(n_ok = n AS INT) AS pass",
    )
    return o_rows.unionByName(c_rows).unionByName(l_rows)


# ---------------------------------------------------------------------------
# Referential-integrity audit — FK orphans and unreferenced parents
# ---------------------------------------------------------------------------
# Both directions of every FK edge in one full-outer join per edge at
# DISTINCT-KEY grain: child keys missing from the parent (orphans — hard
# corruption) and parent keys no child references (unreferenced — the
# dead-dimension signal; ~1/3 of TPC-H customers have no orders by
# construction, so the audit is non-trivially exercised on clean data).
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
)


def _fk_edge_oracle(child: str, ckey: str, parent: str, pkey: str) -> str:
    return f"""
  SELECT '{child}.{ckey}->{parent}.{pkey}' AS edge,
         CAST(SUM(COALESCE(ck.cnt, 0)) AS BIGINT) AS n_child_rows,
         CAST(COUNT(ck.k) AS BIGINT) AS n_child_keys,
         CAST(SUM(CASE WHEN pk.k IS NULL AND ck.k IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_keys,
         CAST(COUNT(pk.k) AS BIGINT) AS n_parent_keys,
         CAST(SUM(CASE WHEN ck.k IS NULL AND pk.k IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_unreferenced
  FROM (SELECT {ckey} AS k, COUNT(*) AS cnt FROM {child}
        WHERE {ckey} IS NOT NULL GROUP BY 1) ck
  FULL OUTER JOIN (SELECT DISTINCT {pkey} AS k FROM {parent}) pk USING (k)
"""


@register(
    "integrity_orphan_audit",
    tags=("profiling", "quality", "join", "integrity"),
    oracle=" UNION ALL ".join(_fk_edge_oracle(*e) for e in _FK_EDGES),
)
def integrity_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the schema's FK edges: per edge,
    child row/key counts, orphan child keys (no parent — corruption),
    parent key count, and unreferenced parent keys (no child — the
    dead-dimension signal that is nonzero even on clean TPC-H: ~1/3 of
    customers never order, some parts are never lined). One full-outer
    join per edge at DISTINCT-KEY grain answers both directions at
    once — the audit every warehouse load pipeline runs before enabling
    constraints.

    Scale shape: each child table collapses to key grain in one
    map-side-combinable aggregate BEFORE the join, so the full-outer
    join shuffles keys, never fact rows (full outer cannot broadcast —
    all 5 edges sort-merge, but at distinct-key grain that exchange is
    the small one by construction). Output is edge-grain (5 rows)."""
    out = None
    for child, ckey, parent, pkey in _FK_EDGES:
        ck = (
            load_table(spark, sf_dir, child)
            .filter(F.col(ckey).isNotNull())
            .groupBy(F.col(ckey).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pk = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pkey).alias("k"))
            .distinct()
            .withColumn("p_present", F.lit(1))
        )
        edge = (
            ck.withColumn("c_present", F.lit(1))
            .join(pk, "k", "full_outer")
            .agg(
                F.sum(F.coalesce("cnt", F.lit(0))).cast("long").alias("n_child_rows"),
                F.count("c_present").cast("long").alias("n_child_keys"),
                F.sum(
                    (F.col("p_present").isNull() & F.col("c_present").isNotNull())
                    .cast("int")
                )
                .cast("long")
                .alias("n_orphan_keys"),
                F.count("p_present").cast("long").alias("n_parent_keys"),
                F.sum(
                    (F.col("c_present").isNull() & F.col("p_present").isNotNull())
                    .cast("int")
                )
                .cast("long")
                .alias("n_unreferenced"),
            )
            .select(
                F.lit(f"{child}.{ckey}->{parent}.{pkey}").alias("edge"),
                "n_child_rows",
                "n_child_keys",
                "n_orphan_keys",
                "n_parent_keys",
                "n_unreferenced",
            )
        )
        out = edge if out is None else out.unionByName(edge)
    return out


# ---------------------------------------------------------------------------
# Benford first-digit audit — the forensic data-quality screen (Nigrini's
# accounting-fraud test, standard in data-integrity suites): naturally
# occurring multi-magnitude amounts follow P(d) = log10(1 + 1/d); a
# fabricated or truncated column does not. Expected probabilities are
# Python-precomputed ppm literals embedded identically in both engines —
# no transcendental function in the comparison path.
# ---------------------------------------------------------------------------

_BENFORD_PPM = (301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757)
_BENFORD_VALUES = ", ".join(f"({d + 1}, {p})" for d, p in enumerate(_BENFORD_PPM))


@register(
    "profile_benford_audit",
    tags=("profiling", "quality", "aggregate", "audit"),
    oracle=f"""
WITH firsts AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
), n AS (
  SELECT COUNT(*) AS total FROM firsts
), expected(digit, expected_ppm) AS (
  VALUES {_BENFORD_VALUES}
)
SELECT e.digit,
       CAST(COALESCE(o.cnt, 0) AS BIGINT) AS n_values,
       CAST(COALESCE(o.cnt, 0) * 1000000 // (SELECT total FROM n) AS BIGINT)
         AS observed_ppm,
       CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
       CAST(abs(COALESCE(o.cnt, 0) * 1000000 // (SELECT total FROM n)
                - e.expected_ppm) AS BIGINT) AS abs_dev_ppm
FROM expected e
LEFT JOIN (SELECT digit, COUNT(*) AS cnt FROM firsts GROUP BY digit) o
  ON o.digit = e.digit
""",
)
def profile_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit (Benford) distribution of order totals vs the
    log10(1+1/d) expectation, per digit: observed count, observed ppm,
    expected ppm, absolute deviation. A column that fails this screen
    hard (synthetic amounts, fixed price lists, truncation artifacts)
    gets routed to a human before it feeds revenue models — the fixture
    amounts are uniform-ish, so the LARGE deviation here is itself the
    correct verdict, hash-checked. First digit is extracted from the
    integer part's decimal rendering (exact in both engines; amounts
    < 1 are excluded as digit-less).

    Plan shape: one map-side-combinable aggregate to 9 digit cells plus
    a one-row total, joined against a 9-row literal table — nothing
    after the scan is corpus-sized, the ANALYZE-pass shape
    (profile_histogram_equiwidth's argument)."""
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.filter(F.col("o_totalprice") >= 1).select(
        F.expr(
            "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING),"
            " 1, 1) AS BIGINT)"
        ).alias("digit")
    )
    n = firsts.agg(F.count(F.lit(1)).alias("total"))
    obs = firsts.groupBy("digit").agg(F.count(F.lit(1)).alias("cnt"))
    expected = spark.createDataFrame(
        [(d + 1, p) for d, p in enumerate(_BENFORD_PPM)],
        ["digit", "expected_ppm"],
    )
    return (
        expected.join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("n_values"),
            F.expr("CAST(COALESCE(cnt, 0) * 1000000 div total AS BIGINT)").alias(
                "observed_ppm"
            ),
            F.col("expected_ppm").cast("long").alias("expected_ppm"),
            F.expr(
                "CAST(abs(COALESCE(cnt, 0) * 1000000 div total"
                " - expected_ppm) AS BIGINT)"
            ).alias("abs_dev_ppm"),
        )
    )


# Candidate-key combos audited by profile_candidate_keys: (table, columns).
# Chosen to exercise true keys, near-keys, and deliberate non-keys (the
# documents.text row measures exactly the clone mass the dedup family
# removes). NULL semantics are PINNED, not assumed: Spark's
# count_distinct(a, b) drops tuples where ANY column is NULL while
# DuckDB's COUNT(DISTINCT (a, b)) counts NULL-bearing tuples, so both
# sides filter to all-key-columns-non-null rows explicitly (r9 ADVICE) —
# the audit is defined over complete key tuples and stays oracle-safe
# if a fixture ever gains NULLs.
_KEY_COMBOS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("lineitem", ("l_orderkey",)),
    ("lineitem", ("l_partkey", "l_suppkey")),
    ("orders", ("o_orderkey",)),
    ("orders", ("o_custkey",)),
    ("events", ("event_id",)),
    ("events", ("user_id", "ts")),
    ("documents", ("doc_id",)),
    ("documents", ("text",)),
)


def _candidate_keys_oracle() -> str:
    branches = []
    for tbl, cols in _KEY_COMBOS:
        tup = f"({', '.join(cols)})" if len(cols) > 1 else cols[0]
        nonnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
        branches.append(f"""
  SELECT '{tbl}' AS tbl, '{",".join(cols)}' AS cols,
         COUNT(*) AS n_rows,
         COUNT(DISTINCT {tup}) AS n_distinct,
         COUNT(*) - COUNT(DISTINCT {tup}) AS n_dup_rows,
         CAST(COUNT(DISTINCT {tup}) * 1000000 // COUNT(*) AS BIGINT)
           AS uniqueness_ppm,
         CAST(COUNT(DISTINCT {tup}) = COUNT(*) AS INT) AS is_key
  FROM {tbl} WHERE {nonnull}""")
    return "\nUNION ALL\n".join(branches)


@register(
    "profile_candidate_keys",
    tags=("profiling", "quality", "aggregate"),
    oracle=_candidate_keys_oracle(),
)
def profile_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery audit: exact uniqueness of declared and
    suspected key combos across four tables — row count, distinct-tuple
    count, duplicate mass, uniqueness ppm, and the is_key verdict. The
    profiling pass a warehouse runs before trusting a MERGE key or
    choosing a bucketing column; the documents.text row quantifies the
    clone mass the dedup family later removes.

    Scale: each combo is ONE exact distinct aggregate — partial+final
    hash agg with map-side combine, shuffling only distinct tuples (for
    true keys that equals the row count, which is what an exact
    uniqueness audit must pay; the HLL twin in agg_approx_distinct is
    the sketch-budget alternative). Combos on the same table still scan
    it once each so column pruning stays per-combo-minimal."""
    out = None
    for tbl, cols in _KEY_COMBOS:
        df = load_table(spark, sf_dir, tbl)
        # pinned NULL semantics: audit complete key tuples only (see
        # _KEY_COMBOS comment — Spark and DuckDB disagree on NULL tuples)
        for c in cols:
            df = df.where(F.col(c).isNotNull())
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(*[F.col(c) for c in cols]).alias("n_distinct"),
        ).select(
            F.lit(tbl).alias("tbl"),
            F.lit(",".join(cols)).alias("cols"),
            "n_rows",
            "n_distinct",
            (F.col("n_rows") - F.col("n_distinct")).alias("n_dup_rows"),
            # DECIMAL(38,0) ppm: int64 would ANSI-overflow past ~9.2e12
            # distinct rows where DuckDB silently promotes to HUGEINT
            F.expr(
                "CAST(CAST(n_distinct AS DECIMAL(38,0)) * 1000000"
                " div n_rows AS BIGINT)"
            ).alias("uniqueness_ppm"),
            (F.col("n_distinct") == F.col("n_rows")).cast("int").alias("is_key"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


@register(
    "profile_candidate_keys_sketch",
    tags=("profiling", "quality", "aggregate", "sketch"),
    oracle=None,  # HLL estimates are engine-internal; the exact twin
    # (profile_candidate_keys) is the oracle-backed variant and the
    # invariant test pins the sketch within rsd of it
)
def profile_candidate_keys_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL uniqueness SCREEN over the same 9 key combos as
    ``profile_candidate_keys`` (VERDICT r9 #3): approx_count_distinct at
    rsd=0.01 replaces the exact distinct aggregate, so the shuffle
    carries fixed-size HLL registers instead of every distinct tuple —
    the audit's 10× scale factor drops from the exact twin's 7.3× to
    scan-bound. This is the production posture: run the sketch screen
    routinely, run the exact twin only on combos the screen flags as
    near-unique (uniqueness_ppm ≥ the screening threshold), where the
    is_key verdict actually needs exactness.

    Same pinned NULL semantics as the exact twin (all key columns
    non-null), same output shape with ``approx_`` column names; is_key
    becomes is_key_candidate — a sketch can screen keys OUT (estimate
    far below n_rows) but never certify one IN."""
    out = None
    for tbl, cols in _KEY_COMBOS:
        df = load_table(spark, sf_dir, tbl)
        for c in cols:
            df = df.where(F.col(c).isNotNull())
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.approx_count_distinct(
                F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]),
                rsd=0.01,
            ).alias("approx_distinct"),
        ).select(
            F.lit(tbl).alias("tbl"),
            F.lit(",".join(cols)).alias("cols"),
            "n_rows",
            "approx_distinct",
            F.expr(
                "CAST(CAST(approx_distinct AS DECIMAL(38,0)) * 1000000"
                " div n_rows AS BIGINT)"
            ).alias("approx_uniqueness_ppm"),
            # 3% screening margin ≈ 3σ at rsd=0.01: below it the combo is
            # definitively NOT a key; above it, escalate to the exact twin
            (F.col("approx_distinct") >= F.col("n_rows") * 0.97)
            .cast("int")
            .alias("is_key_candidate"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


# Functional dependencies audited by profile_fd_violations. documents'
# source -> lang is deliberately violated (every source mixes langs);
# lineitem's returnflag -> linestatus is the classic partially-holding
# dependency (R/A ship only as F; N splits O/F), so the audit proves it
# reports both holding and violated determinant values exactly.
_FD_SPECS: tuple[tuple[str, str, str], ...] = (
    ("documents", "source", "lang"),
    ("lineitem", "l_returnflag", "l_linestatus"),
)


def _fd_violations_oracle() -> str:
    branches = []
    for tbl, lhs, rhs in _FD_SPECS:
        branches.append(f"""
  SELECT '{tbl}.{lhs}->{rhs}' AS fd, CAST({lhs} AS VARCHAR) AS lhs_value,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_rhs_values,
         MIN(rhs_val) FILTER (WHERE rk = 1) AS majority_rhs,
         CAST(MIN(cnt) FILTER (WHERE rk = 1) AS BIGINT) AS majority_n,
         CAST(SUM(cnt) - MIN(cnt) FILTER (WHERE rk = 1) AS BIGINT)
           AS n_violations,
         CAST(COUNT(*) = 1 AS INT) AS fd_holds
  FROM (
    SELECT {lhs}, CAST({rhs} AS VARCHAR) AS rhs_val, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY {lhs}
                              ORDER BY COUNT(*) DESC, CAST({rhs} AS VARCHAR))
             AS rk
    FROM {tbl} GROUP BY {lhs}, CAST({rhs} AS VARCHAR)
  ) GROUP BY {lhs}""")
    return "\nUNION ALL\n".join(branches)


@register(
    "profile_fd_violations",
    tags=("profiling", "quality", "aggregate"),
    oracle=_fd_violations_oracle(),
)
def profile_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each candidate FD lhs -> rhs,
    report per determinant value the row mass, the number of distinct
    rhs values, the majority rhs (exact-count majority, lexicographic
    tie-break) and the violation mass — the minimum number of rows an
    FD-repair would have to change. fd_holds flags determinant values
    where the dependency is exact.

    Scale: one (lhs, rhs)-grain combinable aggregate per FD (the grain
    is the value-pair vocabulary, not the fact volume), then a window
    over the lhs partitioning of that tiny grain — nothing fact-sized
    crosses the second exchange."""
    out = None
    for tbl, lhs, rhs in _FD_SPECS:
        df = load_table(spark, sf_dir, tbl)
        pairs = (
            df.groupBy(
                F.col(lhs).cast("string").alias("lhs_value"),
                F.col(rhs).cast("string").alias("rhs_val"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("lhs_value").orderBy(
            F.col("cnt").desc(), F.col("rhs_val")
        )
        ranked = pairs.withColumn("rk", F.row_number().over(w))
        agg = ranked.groupBy("lhs_value").agg(
            F.sum("cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("n_rhs_values"),
            F.min(F.when(F.col("rk") == 1, F.col("rhs_val"))).alias(
                "majority_rhs"
            ),
            F.min(F.when(F.col("rk") == 1, F.col("cnt"))).alias("majority_n"),
        ).select(
            F.lit(f"{tbl}.{lhs}->{rhs}").alias("fd"),
            "lhs_value",
            "n_rows",
            "n_rhs_values",
            "majority_rhs",
            "majority_n",
            (F.col("n_rows") - F.col("majority_n")).alias("n_violations"),
            (F.col("n_rhs_values") == 1).cast("int").alias("fd_holds"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


# --- Equi-depth histogram (distributed exact selection) ---------------------
# Probe bucket width for the two-phase boundary selection: phase 1 counts
# rows per fixed-width bucket (tiny aggregate), phase 2 windows ONLY the
# <= EQD_TILES-1 buckets that contain a decile boundary.
EQD_PROBE_W = 25_000.0
EQD_TILES = 10


@register(
    "profile_histogram_equidepth",
    tags=("aggregate", "profiling", "histogram", "quantile"),
    oracle=f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM orders),
tiles AS (
  SELECT t, (c * t) // {EQD_TILES} AS k
  FROM n CROSS JOIN (SELECT unnest(range(1, {EQD_TILES})) AS t)
), ranked AS (
  SELECT o_totalprice, o_orderkey,
         ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
  FROM orders
)
SELECT CAST(t AS BIGINT) AS tile, k AS boundary_rank,
       CAST(floor(o_totalprice / {EQD_PROBE_W}) AS BIGINT) AS bucket,
       o_totalprice AS boundary_price,
       o_orderkey AS boundary_orderkey
FROM tiles JOIN ranked ON rn = k
""",
)
def profile_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram boundaries over orders.o_totalprice — the
    exact decile cut points (the sibling profile_histogram_equiwidth's
    docstring defers to): boundary t is the k_t-th smallest row under
    the unique total order (o_totalprice, o_orderkey), k_t = n*t/10.

    The Spark side is the DISTRIBUTED SELECTION algorithm, not a global
    sort: phase 1 aggregates row counts per fixed-width probe bucket
    (map-side combinable, ~range/W rows however big the table) and a
    cumulative sum over that tiny bucket list locates, for each target
    rank k_t, the one bucket containing it plus the residual rank within
    it; phase 2 row_number-windows ONLY those <= {EQD_TILES - 1} boundary
    buckets — each a ~1/{EQD_TILES}-of-one-bucket sliver of the table,
    partitioned by bucket so no global single-partition window exists
    anywhere. The oracle is the direct single-node formulation (one
    global ROW_NUMBER), so the two engines cross-check the algorithm,
    not a shared plan.

    Exactness: k_t = n*t div {EQD_TILES} is rank arithmetic; boundary
    prices are raw doubles read from the scan — no float math at all."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice",
        "o_orderkey",
        F.floor(F.col("o_totalprice") / EQD_PROBE_W).cast("long").alias("bucket"),
    )
    bcnt = orders.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    # cumulative over the bucket list: ~range/W rows, single tiny window
    cum = bcnt.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    n = bcnt.agg(F.sum("cnt").cast("long").alias("c"))
    tiles = (
        n.select(F.explode(F.sequence(F.lit(1), F.lit(EQD_TILES - 1))).alias("t"), "c")
        .select(
            F.col("t").cast("long").alias("tile"),
            F.expr(f"CAST(c * t div {EQD_TILES} AS BIGINT)").alias("boundary_rank"),
        )
    )
    # tiny theta join (<= 9 tiles x ~range/W buckets, both broadcast-sized):
    # rank k lands in the unique bucket with cum - cnt < k <= cum
    # <= EQD_TILES-1 rows consumed by BOTH the hot-bucket list and the
    # final rank join — materialize once so the locator subtree (and its
    # tiny nested-loop join) doesn't replay per consumer
    located = (
        tiles.join(
            F.broadcast(cum),
            (F.col("boundary_rank") <= F.col("cum"))
            & (F.col("boundary_rank") > F.col("cum") - F.col("cnt")),
        )
        .select(
            "tile",
            "boundary_rank",
            "bucket",
            (F.col("boundary_rank") - (F.col("cum") - F.col("cnt"))).alias(
                "local_rank"
            ),
        )
        .localCheckpoint()
    )
    # phase 2: window ONLY the boundary buckets, partitioned by bucket
    hot = located.select("bucket").distinct()
    slivers = orders.join(F.broadcast(hot), "bucket").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("bucket").orderBy("o_totalprice", "o_orderkey")
        ),
    )
    return (
        located.join(
            slivers,
            (located["bucket"] == slivers["bucket"])
            & (located["local_rank"] == slivers["rn"]),
        )
        .select(
            "tile",
            "boundary_rank",
            located["bucket"].alias("bucket"),
            F.col("o_totalprice").alias("boundary_price"),
            F.col("o_orderkey").alias("boundary_orderkey"),
        )
    )


# --- Pearson correlation matrix (profiling) ---------------------------------
# Integer measurement units per column (exact moments): quantity is whole,
# money/rate columns scale to cents / percent points.
_CORR_COLS = (
    ("l_quantity", "CAST(l_quantity AS BIGINT)"),
    ("l_extendedprice", "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
    ("l_discount", "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"),
    ("l_tax", "CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)"),
)


def _corr_expr(dec: str) -> str:
    """Shared corr formula over exact integer moments (n, sx, sy, sxx,
    syy, sxy already cast to ``dec``): numerator and variance terms are
    exact 128-bit integers; the one float step is the final
    correctly-rounded double division + sqrt (the cosine discipline),
    rounded to 6 dp on both engines."""
    num = "(n * sxy - sx * sy)"
    dx = "(n * sxx - sx * sx)"
    dy = "(n * syy - sy * sy)"
    return (
        f"CASE WHEN {dx} > 0 AND {dy} > 0 THEN "
        f"ROUND(CAST({num} AS DOUBLE) / (SQRT(CAST({dx} AS DOUBLE)) * "
        f"SQRT(CAST({dy} AS DOUBLE))), 6) ELSE NULL END"
    )


def _corr_oracle() -> str:
    aggs = [f"CAST(COUNT(*) AS HUGEINT) AS n"]
    for name, unit in _CORR_COLS:
        c = name.split("_", 1)[1]
        aggs.append(f"SUM(CAST({unit} AS HUGEINT)) AS s_{c}")
        aggs.append(
            f"SUM(CAST({unit} AS HUGEINT) * CAST({unit} AS HUGEINT)) AS s_{c}{c}"
        )
    pairs = []
    names = [n for n, _ in _CORR_COLS]
    for i, (na, ua) in enumerate(_CORR_COLS):
        for nb, ub in _CORR_COLS[i + 1 :]:
            a, b = na.split("_", 1)[1], nb.split("_", 1)[1]
            aggs.append(
                f"SUM(CAST({ua} AS HUGEINT) * CAST({ub} AS HUGEINT)) AS s_{a}{b}"
            )
            pairs.append(
                f"SELECT '{na}' AS col_a, '{nb}' AS col_b, CAST(n AS BIGINT) AS n_rows, "
                f"{_corr_expr('HUGEINT')} AS corr FROM "
                f"(SELECT n, s_{a} AS sx, s_{b} AS sy, s_{a}{a} AS sxx, "
                f"s_{b}{b} AS syy, s_{a}{b} AS sxy FROM m)"
            )
    return (
        "WITH m AS (SELECT " + ", ".join(aggs) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(pairs)
    )


@register(
    "profile_correlation_matrix",
    tags=("aggregate", "profiling", "statistics", "correlation"),
    oracle=_corr_oracle(),
)
def profile_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over lineitem's numeric columns —
    the profiling primitive behind feature selection and drift root-
    causing (which columns move together), as a 6-row matrix upper
    triangle. Both engines' native corr() aggregates in floating point
    with merge-order-dependent rounding, so the portable form computes
    EXACT integer sufficient statistics (each column scaled to whole
    units — cents / percent points; sums, squares and cross products in
    128-bit integers, one map-side-combinable pass for all 15 moments)
    and spends its single float step on the final correctly-rounded
    double division + sqrt, rounded to 6 dp — the cosine discipline.

    Scale shape: ONE scan, one 15-aggregate map-side-combined reduce to
    a single row, and a 6-row projection from that row. The cheapest
    possible correlation matrix at any table size; adding columns grows
    the moment count quadratically but the plan shape not at all."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for name, unit in _CORR_COLS:
        c = name.split("_", 1)[1]
        u = F.expr(unit).cast("decimal(38,0)")
        aggs.append(F.sum(u).alias(f"s_{c}"))
        aggs.append(F.sum(u * u).alias(f"s_{c}{c}"))
    for i, (na, ua) in enumerate(_CORR_COLS):
        for nb, ub in _CORR_COLS[i + 1 :]:
            a, b = na.split("_", 1)[1], nb.split("_", 1)[1]
            aggs.append(
                F.sum(
                    F.expr(ua).cast("decimal(38,0)") * F.expr(ub).cast("decimal(38,0)")
                ).alias(f"s_{a}{b}")
            )
    # ONE row feeding six pair projections — materialize it so the full
    # scan + 15-moment aggregate doesn't replay per output row
    m = li.agg(*aggs).localCheckpoint()
    outs = []
    for i, (na, _) in enumerate(_CORR_COLS):
        for nb, _ in _CORR_COLS[i + 1 :]:
            a, b = na.split("_", 1)[1], nb.split("_", 1)[1]
            outs.append(
                m.selectExpr(
                    f"'{na}' AS col_a",
                    f"'{nb}' AS col_b",
                    "CAST(n AS BIGINT) AS n_rows",
                    f"s_{a} AS sx",
                    f"s_{b} AS sy",
                    f"s_{a}{a} AS sxx",
                    f"s_{b}{b} AS syy",
                    f"s_{a}{b} AS sxy",
                    "n",
                ).selectExpr(
                    "col_a", "col_b", "n_rows", f"{_corr_expr('DECIMAL(38,0)')} AS corr"
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
