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
# Round-10 window (frozen at round start; math re-verified against the
# r9-refreshed docs/COVERAGE.md — the ROUND9_NOTES "14 + 36" r10-plan
# line was a typo the r9 verdict flagged: the r9 residue is 15, not 14):
#   (1) all 15 ROTATION_RESIDUE queries from r9 — every r9-added
#       oracle-backed operator takes its FIRST driver-green row here.
#       Three of these (profile_candidate_keys, multimodal_decode_features,
#       sample_weighted_systematic) are ALSO this round's planned
#       "changed => re-enter" targets (r9 ADVICE items) — already
#       seated, so the changes displace nothing.
#   (2) 35 of the 45-query r5-evidence cohort (from docs/COVERAGE.md
#       newest-evidence histogram after the 50/50-green r9 run:
#       45xr5 + 49xr6 + 50xr7 + 50xr8 + 50xr9 + 15xnever = 259
#       oracle-backed) — oldest-evidence re-validation. Pick rule:
#       fewest historical driver-green rows first (the 35 singles),
#       alphabetical tiebreak; the 10 deferred all hold TWO greens
#       (multimodal_frame_sample, profile_column_stats,
#       q10_returned_items, q5_local_supplier_volume, q7_nation_volume,
#       skew_salted_join, stream_stateful_running_totals,
#       string_functions, unpivot_melt, window_frames) and lead the
#       r11 re-validation picks. 15 + 35 = 50: ZERO spare seats.
#       Any r10 "changed => re-enter" for a query OUTSIDE this window
#       must displace one of these r5 fillers (re-seat it in
#       ROTATION_RESIDUE immediately, cap 15).
# After a green r10 driver run: the only oracle-backed queries whose
# newest driver evidence predates r6 are the 10 deferred double-green
# r5 picks, and the r11 window = the (then <=15) r10 residue + those 10
# + the oldest r6-evidence picks.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- (1) the full r9 ROTATION_RESIDUE (15), first driver rows ---
    "dedup_lsh_recall_audit_stratum",
    "dedup_cluster_star_contract",
    "multimodal_decode_features",
    "stream_timer_sessions",
    "embedding_binary_quantize_recall",
    "embedding_mrl_truncate_recall",
    "profile_candidate_keys",
    "profile_fd_violations",
    "sample_weighted_systematic",
    "dataset_padding_waste",
    "join_asof_nearest",
    "layout_overlap_depth",
    "sim_graph_2hop_reach",
    "events_ab_test_readout",
    "sim_ann_graph_greedy",
    # --- (2) 35 single-green r5-evidence picks (alphabetical) ---
    "agg_cube",
    "agg_distinct_counts",
    "agg_grouping_sets",
    "agg_percentiles_exact",
    "agg_pivot",
    "agg_rollup",
    "agg_statistical",
    "array_functions",
    "corpus_bloom_prefilter",
    "corpus_source_health",
    "date_functions",
    "dedup_exact",
    "dedup_exact_hash",
    "distinct_projection",
    "drop_duplicates_subset",
    "embedding_product_quantize",
    "events_value_anomaly",
    "global_aggregate",
    "higher_order_functions",
    "join_anti",
    "join_cross",
    "join_full_outer",
    "join_interval_overlap",
    "join_left_outer",
    "join_range_bands",
    "join_right_outer",
    "join_semi",
    "json_functions",
    "market_share_by_year",
    "math_functions",
    "multimodal_binary_metadata",
    "sim_ann_pq_adc",
    "stream_append_restart_flush",
    "text_lm_quality_buckets",
    "udf_arrow_python",
)

# Oracle-backed queries added AFTER this round's window was frozen — they
# rotate into the next round's window. Kept explicit so tests + ROUND notes
# can audit that nothing silently escapes driver coverage. The r10 window
# froze at round start with the complete 15-query r9 residue seated, so
# this list reopens EMPTY; every oracle-backed operator ADDED during r10
# must be appended here (enforced by tests/test_registry_order.py, cap 15)
# and leads the r11 window together with the 10 deferred r5 picks +
# oldest-evidence (r6) picks.
ROTATION_RESIDUE: tuple[str, ...] = (
    # --- first r10 work session ---
    "merge_cow_parquet",
    "stream_retrieval_serving",
    "sim_maxsim_late_interaction",
    "sim_maxsim_plaid_rerank",
    "merge_delete_vectors",
    "privacy_k_anonymity",
    "privacy_k_generalize",
    "dedup_prefix_filter_join",
    "retrieval_system_agreement",
    "stream_cdc_apply",
    "layout_compaction_apply",
    # --- second r10 work session ---
    "privacy_l_diversity",
    "text_zipf_buckets",
    "sim_graph_kcore_peel",
    "stream_merge_cow_sink",
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
