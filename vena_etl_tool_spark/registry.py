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
# Round-9 window (frozen at round start; math re-verified against the
# r8-refreshed docs/COVERAGE.md — the ROUND8_NOTES "49 seats / 1 spare"
# line was a typo the r8 verdict flagged: residue is 15, not 14):
#   (1) all 15 ROTATION_RESIDUE queries from r8 — every r8-added
#       oracle-backed operator takes its FIRST driver-green row here.
#       Three of these (orders_rfm_segments, events_hhi_concentration,
#       dedup_lsh_recall_audit) are ALSO this round's planned
#       "changed ⇒ re-enter" targets (verdict #2/#3, ADVICE items) —
#       they were already seated, so the changes displace nothing.
#   (2) the complete 35-query r4-evidence backlog (alphabetical; from
#       docs/COVERAGE.md newest-evidence histogram: 35×r4 + 45×r5 +
#       49×r6 + 50×r7 + 50×r8 + 15×never = 244 oracle-backed) —
#       oldest-evidence re-validation. 15 + 35 = 50: ZERO spare seats.
#       Any r9 "changed ⇒ re-enter" for a query OUTSIDE this window
#       must displace one of these r4 fillers (all unchanged r4-green;
#       displacing one only defers a re-validation — re-seat it in
#       ROTATION_RESIDUE immediately, cap 15).
# After a green r9 driver run: no oracle-backed query's newest driver
# evidence predates r5, and the r10 window = the (then ≤15) r9 residue
# + the oldest-evidence (r5) re-validation picks.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- (1) the full r8 ROTATION_RESIDUE (15), first driver rows ---
    "sim_link_prediction",
    "sim_kmeans_lloyd_step",
    "retrieval_rrf_fusion",
    "text_tfidf_cosine_pairs",
    "dedup_lsh_recall_audit",
    "text_bpe_fertility",
    "dsir_importance_weights",
    "events_activity_streaks",
    "events_funnel_ttc",
    "stream_late_data_audit",
    "embedding_centroid_drift",
    "events_hhi_concentration",
    "orders_rfm_segments",
    "profile_benford_audit",
    "retrieval_rrf_fusion_ivf",
    # --- (2) the complete 35-query r4-evidence backlog (alphabetical) ---
    "events_path_mining",
    "events_retention_cohorts",
    "join_null_safe",
    "join_range_bucketized",
    "json_functions_extra",
    "layout_bucketed_join",
    "layout_compaction_plan",
    "map_functions_extra",
    "multimodal_audio_segments",
    "pipeline_pretrain_flagship",
    "q11_important_value",
    "q12_late_shipments",
    "q15_top_supplier",
    "q16_part_supplier_diversity",
    "q1_pricing_summary",
    "q20_quantity_share_suppliers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q8_market_share",
    "q9_product_profit",
    "scalar_functions_extra",
    "sessionize_events",
    "sim_ann_lsh",
    "sort_within_partitions",
    "source_python_datasource",
    "source_python_stream",
    "stream_curation_pipeline",
    "stream_stream_left_outer",
    "stream_transform_with_state",
    "stream_tumbling_append",
    "text_contamination_check",
    "text_repetition_ratio",
    "text_span_dedup",
    "text_token_commonness",
    "udtf_chunk_text",
)

# Oracle-backed queries added AFTER this round's window was frozen — they
# rotate into the next round's window. Kept explicit so tests + ROUND notes
# can audit that nothing silently escapes driver coverage. The r9 window
# froze at round start with the complete 15-query r8 residue seated, so
# this list reopens EMPTY; every oracle-backed operator ADDED during r9
# must be appended here (enforced by tests/test_registry_order.py, cap 15)
# and leads the r10 window together with the oldest-evidence (r5) picks.
ROTATION_RESIDUE: tuple[str, ...] = (
    # --- first r9 work session ---
    "dedup_lsh_recall_audit_stratum",
    "dedup_cluster_star_contract",
    # --- second r9 work session ---
    # rows-only → oracle-backed upgrade (verdict #6): the decode seam now
    # parses a real packed binary container, so it needs driver evidence.
    "multimodal_decode_features",
    "stream_timer_sessions",
    # --- third r9 work session ---
    "embedding_binary_quantize_recall",
    "embedding_mrl_truncate_recall",
    "profile_candidate_keys",
    "profile_fd_violations",
    "sample_weighted_systematic",
    "dataset_padding_waste",
    "join_asof_nearest",
    # --- fourth r9 work session ---
    "layout_overlap_depth",
    "sim_graph_2hop_reach",
    # --- fifth r9 work session ---
    "events_ab_test_readout",
    # --- sixth r9 work session: residue at the 15 cap — by construction
    # the round's last operator (the r8 convention) ---
    "sim_ann_graph_greedy",
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
