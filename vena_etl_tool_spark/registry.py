"""Query registry — the single source of truth behind ``__spark_entry__.py``.

Every operator from SURVEY.md §2 Part B registers here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are SQL-expressible) the equivalent ANSI SQL that DuckDB runs on the same
parquet tables. The driver diffs the two (row count + schema +
order-insensitive value hash) at sf=0.01; tests/test_oracle.py runs the same
diff locally.

Discipline (FIXTURES.md "oracle-comparison discipline"):
- every computed column is aliased identically on both sides;
- money-ish double aggregates are cast to DECIMAL on both sides;
- no nondeterministic functions in oracle-checked queries;
- LIMIT/top-k queries use a total order (unique tiebreak column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module (registration happens at import)."""
    from . import operators  # noqa: F401  (imports all submodules)
    from . import streaming  # noqa: F401


# The correctness driver evaluates queries() in iteration order and checks
# the first 50. This window is chosen so those 50 span every operator
# module (SURVEY.md §2 family): queries changed this round first (they need
# fresh evidence), then one-or-more representatives per family that lacked
# a hard correctness row last round, then flagships. The remainder follow
# alphabetically; the window rotates across rounds so every query
# eventually lands a driver-checked row (see OPERATORS.md).
DRIVER_WINDOW: tuple[str, ...] = (
    # changed/new this round
    "ingest_quarantine_counts",
    "sim_ann_ivf",
    "corpus_curation_pipeline",
    "embedding_quantize_int8",
    "sessionize_events",
    "stream_tumbling_append",
    "agg_collect",
    "agg_approx_quantile",
    "dedup_minhash_signatures",
    "scalar_functions_extra",
    "map_functions_extra",
    "dedup_ngram_jaccard",
    "dedup_cluster_assign",
    "dedup_minhash_lsh_pairs",
    "dedup_embedding_cosine",
    # families without a driver row last round
    "window_ranking",
    "text_term_salience",
    "window_frames",
    "layout_partitioned_pruning",
    "dedup_levenshtein",
    "setop_intersect_all",
    "setop_except_all",
    "topk_global",
    "topn_per_group",
    "funnel_conversion",
    "sim_cosine_topk",
    "text_redact",
    "skew_salted_aggregate",
    "skew_salted_join",
    "subquery_correlated_scalar",
    "subquery_in_not_in",
    "subquery_lateral_topn",
    "udf_pandas_scalar_norm",
    "udf_grouped_agg",
    "udf_apply_in_pandas",
    "udf_map_in_pandas",
    "text_langid",
    # pricing/projection flagships (keep a fresh row; also family coverage)
    "q1_pricing_summary",
    "filter_project",
    "ts_moving_average",
    "stream_foreach_batch_sink",
    "stream_static_join",
    "stream_stream_join",
    "stream_stateful_running_totals",
    # new TPC-H-pattern suite representatives (operators/tpch_suite.py)
    "q17_small_quantity_revenue",
    "q21_sole_returner",
    "q6_revenue_forecast",
    # new-this-round rows-only queries that still need a first driver row
    "join_range_bucketized",
    "multimodal_resize_plan",
    "sim_ann_ivf_kmeans",
)


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise KeyError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    for n in sorted(REGISTRY):
        if n not in ordered:
            ordered[n] = REGISTRY[n]
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
