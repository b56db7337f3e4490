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
# the first 50. Window policy (since r3): ONLY oracle-backed queries
# (rows-only entries can never produce a green driver row — the driver
# records `no_oracle` as an error); never-checked > re-validation when
# displacing; a query whose code or ORACLE changes re-enters the window.
#
# Round-5 window: after r4, EVERY oracle-backed query except the one
# declared carry-over held a driver-green row (residue was exactly
# {join_interval_overlap}), so this round's composition is
#   (1) the r4 carry-over — leads, as declared;
#   (2) the 6 queries added or materially changed in r5: three new
#       oracle-backed queries (corpus_incremental_persisted,
#       stream_append_restart_flush — the r4 verdict's Missing #2 and
#       stretch #8), two rows-only→oracle conversions
#       (stream_dedup_within_watermark, udf_arrow_python — verdict #5),
#       and the two plan/guard rewrites (profile_column_stats single-scan
#       rewrite — verdict #2, corpus_drift_topk overflow guard);
#   (3) EVIDENCE-FRESHNESS rotation (verdict #1 / ROUND4_NOTES handoff):
#       all 32 queries whose newest driver-green row is round 1,
#   (4) then 11 of the 34 whose newest row is round 2, prioritized as:
#       the 9 that are also bench-flagship queries (a bench regression
#       with stale correctness evidence is the worst debugging position),
#       plus one skew-family and one stateful-streaming representative.
# The 23 r2-green queries that didn't fit are the r6 rotation backlog
# (docs/COVERAGE.md lists per-query history; none are uncovered — each
# holds a green r2 row against its unchanged oracle).
DRIVER_WINDOW: tuple[str, ...] = (
    # --- (1) the declared r4 carry-over ---
    "join_interval_overlap",
    # --- (2) added or changed in r5 ---
    "corpus_incremental_persisted",
    "stream_append_restart_flush",
    "stream_dedup_within_watermark",
    "udf_arrow_python",
    "profile_column_stats",
    "corpus_drift_topk",
    # --- (3) newest driver evidence is r1 (all 32) ---
    "agg_cube",
    "agg_distinct_counts",
    "agg_grouping_sets",
    "agg_percentiles_exact",
    "agg_pivot",
    "agg_rollup",
    "agg_statistical",
    "array_functions",
    "date_functions",
    "dedup_exact",
    "dedup_exact_hash",
    "distinct_projection",
    "drop_duplicates_subset",
    "global_aggregate",
    "higher_order_functions",
    "join_anti",
    "join_cross",
    "join_full_outer",
    "join_left_outer",
    "join_range_bands",
    "join_right_outer",
    "join_semi",
    "json_functions",
    "market_share_by_year",
    "math_functions",
    "multimodal_binary_metadata",
    "multimodal_frame_sample",
    "q10_returned_items",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "string_functions",
    "unpivot_melt",
    # --- (2b) added late-r5, pre-freeze: the LM-quality terciles and the
    # MAD anomaly detector are never-checked, so they displace two of the
    # r2 re-validation picks below (never-checked > re-validation;
    # topk_global's TakeOrderedAndProject path stays covered in-window by
    # subquery_lateral_topn + the plan tests, and setop_except_all keeps
    # its r2-green row and leads the declared r6 backlog with the rest of
    # the setop family) ---
    "text_lm_quality_buckets",
    "events_value_anomaly",
    # corpus_source_health (late-r5) displaces embedding_quantize_int8
    # (r2-green, map-only, the simplest plan in the registry — lowest
    # re-validation value of the remaining picks; r6 backlog):
    "corpus_source_health",
    # corpus_bloom_prefilter (late-r5) displaces udf_grouped_agg
    # (r2-green; the udfs.py module keeps an in-window representative via
    # udf_arrow_python, whose oracle is new this round):
    "corpus_bloom_prefilter",
    # embedding_product_quantize (late-r5) displaces sim_cosine_topk
    # (r2-green; similarity.py keeps TWO in-window representatives —
    # sim_ann_ivf re-validates the shared scaled-fold scoring the
    # brute-force path uses, and the PQ query itself is new code):
    "embedding_product_quantize",
    # sim_ann_pq_adc (late-r5) displaces subquery_lateral_topn (r2-green;
    # the lateral-topn shape — per-key window top-k — is re-validated by
    # the ADC query's own partitioned top-k window, and subqueries.py
    # rotates with the r6 backlog):
    "sim_ann_pq_adc",
    # sim_ann_adc_recall (late-r5) displaces sim_ann_ivf (r2-green, and
    # effectively re-validated by FRESH r4 driver rows: its scan runs
    # verbatim inside sim_ann_recall_eval and its centroid folds inside
    # dedup_semantic_ivf, both r4-green):
    "sim_ann_adc_recall",
    # dedup_containment RE-ENTERS (late-r5: its oracle gained the
    # CONT_PAIRS_PER_DOC output-cap QUALIFY — the r4 green row certified
    # the old oracle text). Displaces corpus_curation_pipeline (r2-green;
    # its stages are re-verified inside pipeline_pretrain_flagship and
    # stream_curation_pipeline, both r4-green):
    "dedup_containment",
    # --- (4) newest driver evidence is r2: bench flagships first ---
    "window_frames",
    # family representatives: salted-join skew handling and the
    # applyInPandasWithState stateful path
    "skew_salted_join",
    "stream_stateful_running_totals",
)

# Oracle-backed queries added AFTER this round's window was frozen — they
# rotate into the next round's window. Kept explicit so tests + ROUND notes
# can audit that nothing silently escapes driver coverage. All r5 additions
# and conversions landed BEFORE the freeze and sit in the window above, so
# the residue is empty this round.
ROTATION_RESIDUE: tuple[str, ...] = ()


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
