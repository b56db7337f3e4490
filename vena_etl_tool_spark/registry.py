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
# records `no_oracle` as an error). Final round-4 window (after the
# continuation session): 42 never-checked slots — the 19 declared
# ROTATION_RESIDUE carry-overs, the 8 added/converted early r4, the 9
# added late r4, and the 6 continuation-session operators (semantic
# dedup, drift monitor, containment, transformWithState, compaction
# planner, path mining) — which completes full-registry driver coverage
# (residue 0); then 8 re-validation slots for queries whose code or
# ORACLE materially changed this round (dedup.py embedding rework, the
# late second-granularity and drift-NULLIF oracle fixes) plus the bench
# flagships. Displacement rationale per slot is inline below.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- never driver-checked: r3 rotation residue (19) ---
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_value",
    "q12_late_shipments",
    "q15_top_supplier",
    "q16_part_supplier_diversity",
    "q20_quantity_share_suppliers",
    "dedup_simhash",
    "dataset_pack_sequences",
    "dataset_pack_stats",
    "text_repetition_ratio",
    "text_contamination_check",
    "dataset_mixture_weights",
    "sim_ann_lsh",
    "udtf_chunk_text",
    "stream_curation_pipeline",
    "source_python_datasource",
    "source_python_stream",
    "multimodal_audio_segments",
    # --- never driver-checked: added/oracle-converted in r4 (8) ---
    "pipeline_pretrain_flagship",
    "layout_bucketed_join",
    "json_functions_extra",
    "map_functions_extra",
    "scalar_functions_extra",
    "sort_within_partitions",
    "text_token_commonness",
    "dataset_mixture_sample",
    # --- never driver-checked: added late-r4 (3) — displacing the three
    # re-validation picks that already hold driver-green rows and whose
    # modules did not change this round (topk_global r1, agg_rollup r1,
    # udf_apply_in_pandas r3): never-checked > re-validation ---
    "q8_market_share",
    "text_span_dedup",
    "sim_ann_recall_eval",
    "multimodal_phash_neardup",
    "events_retention_cohorts",
    "stream_stream_left_outer",
    "join_null_safe",
    "corpus_incremental_update",
    "dataset_shuffle_order",
    # --- re-validation: modules changed in r4 + bench flagships (14) ---
    # join_range_bucketized re-enters: its oracle changed in late r4 (the
    # second-granularity fix caught by the sf0.1 sweep), so its r3 green
    # row no longer certifies the current oracle. It displaces
    # join_asof_last_click (r3-green, code unchanged; joins.py is still
    # re-validated via q3 + join_null_safe + this query).
    "join_range_bucketized",
    # (dataset_split_assign / text_quality_score gave up their slots to
    # the two late-r4 operators above: never-checked > re-validation, and
    # their logic is re-verified anyway inside corpus_curation_pipeline +
    # pipeline_pretrain_flagship, both in this window)
    # (dedup_minhash_signatures / dedup_levenshtein / embedding_quantize_int8
    # ceded their slots to the three late additions above — all three are
    # driver-green in earlier rounds and their code paths are re-exercised
    # by queries that remain in the window: lsh_pairs recomputes signatures,
    # recall_eval re-runs both similarity index scans)
    "dedup_embedding_cosine",
    "dedup_minhash_lsh_pairs",
    # dedup_exact_hash ceded its slot to the continuation-session drift
    # monitor (never-checked > re-validation; exact-hash dedup is
    # re-exercised inside pipeline_pretrain_flagship, still in the window):
    "corpus_drift_topk",
    # dedup_cluster_assign ceded its slot to the continuation-session path
    # mining query (never-checked > re-validation; r2-green, its module's
    # hot paths are re-validated by the three dedup queries still here):
    "events_path_mining",
    # sim_cosine_topk ceded its slot to the continuation-session semantic
    # dedup query (never-checked > re-validation; the brute-force cosine
    # path is still re-exercised inside sim_ann_recall_eval, which stays
    # in the window):
    "dedup_semantic_ivf",
    # sim_ann_ivf ceded its slot to the continuation-session compaction
    # planner (never-checked > re-validation; the IVF scan is executed
    # verbatim inside sim_ann_recall_eval AND its centroid folds inside
    # dedup_semantic_ivf, both still in the window):
    "layout_compaction_plan",
    # corpus_curation_pipeline ceded its slot to the continuation-session
    # transformWithState query (never-checked > re-validation; curation
    # stages are re-verified inside pipeline_pretrain_flagship +
    # stream_curation_pipeline, both still in the window):
    "stream_transform_with_state",
    "stream_tumbling_append",
    # stream_tumbling_window ceded its slot to the continuation-session
    # containment query (never-checked > re-validation; the streaming
    # window+sink path stays covered by stream_tumbling_append):
    "dedup_containment",
    # sessionize_events stays: its oracle also changed in late r4 (the
    # truncated-seconds gap fix)
    "sessionize_events",
    # (window_frames / skew_salted_join ceded their slots to the two late
    # additions above — both driver-green in r2 with modules untouched
    # this round)
    "q1_pricing_summary",
    "q3_shipping_priority",
    # q5_local_supplier_volume ceded its slot to the continuation-session
    # profiling query (never-checked > re-validation; q5 is r1-green with
    # its module unchanged, and its all-dims-broadcast join shape is
    # re-exercised by q8_market_share + q9_product_profit in this window):
    "profile_column_stats",
)

# Oracle-backed queries added AFTER this round's window was frozen — they
# rotate into the next round's window. Kept explicit so tests + ROUND notes
# can audit that nothing silently escapes driver coverage. The r4 window
# achieved residue 0; the late-continuation interval-overlap join arrived
# after the final window slot with defensible displacement rationale was
# spent, so it is the declared carry-over and MUST lead the r5 window.
ROTATION_RESIDUE: tuple[str, ...] = ("join_interval_overlap",)


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
