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
# Round-8 window (frozen at round start per r6 verdict #8 / the r7
# ADVICE cap note — residue absorbed BEFORE any new r8 registration):
#   (1) all 25 ROTATION_RESIDUE queries from r7 — every r7-added
#       oracle-backed operator takes its FIRST driver-green row here.
#   (2) the 15 DECLARED r3-evidence stragglers from the r7 notes (the
#       original 12 plus q4_priority_exists, sample_stratified,
#       text_bpe_token_estimate, displaced in r7 by "changed ⇒
#       re-enter" swaps) — after this run no oracle-backed query's
#       newest driver evidence predates r4.
#   (3) 10 filler seats: the alphabetically-first of the 45-query
#       r4-evidence backlog (computed from CORRECTNESS_r01..r07 ∪
#       registry, see docs/COVERAGE.md) — oldest-evidence
#       re-validation. These are the DESIGNATED displacement victims
#       for any mid-round "changed ⇒ re-enter" swap (all unchanged
#       r4-green; displacing one only defers a re-validation).
# After the r8 driver run: newest evidence ≥ r4 everywhere, residue =
# only post-freeze r8 additions (cap 25), and the r9 window (35
# remaining r4-evidence picks + residue) fits one window exactly when
# residue stays ≤ 15 — freeze r9 accordingly.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- (1) the full r7 ROTATION_RESIDUE (25), first driver rows ---
    "text_bigram_surprisal",
    "layout_zonemap_prune",
    "skyline_pareto_frontier",
    "text_bm25_search",
    "text_hll_overlap",
    "events_markov_transitions",
    "text_boilerplate_ngrams",
    "ts_ewma_halflife",
    "profile_histogram_equiwidth",
    "sim_ann_ivf_probe_sweep",
    "dataset_temperature_weights",
    "agg_mode_deterministic",
    "ts_rolling_median",
    "ts_anomaly_mad",
    "ts_theil_sen_trend",
    "events_rolling_actives",
    "events_cooccurrence_lift",
    "dataset_split_leakage",
    "ts_autocorrelation",
    "ts_seasonality_dow",
    "events_attribution_linear",
    "dataset_epoch_plan",
    "text_gopher_rules",
    "profile_expectations",
    "integrity_orphan_audit",
    # --- (2) the 15 declared r3-evidence stragglers ---
    "q4_priority_exists",
    "sample_stratified",
    "text_bpe_token_estimate",
    "text_chunk_windows",
    "text_fingerprint",
    "text_quality_score",
    "text_token_stats",
    "text_wordfreq_topk",
    "ts_anomaly_zscore",
    "ts_gapfill_hourly",
    "ts_moving_average",
    "udf_apply_in_pandas",
    "udf_map_in_pandas",
    "udf_sql_registered",
    "window_analytic",
    # --- (3) oldest-r4-evidence re-validation fillers (displaceable) ---
    "corpus_incremental_update",
    "dataset_mixture_sample",
    "dataset_mixture_weights",
    "dataset_pack_sequences",
    "dataset_pack_stats",
    "dataset_shuffle_order",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh_pairs",
    "dedup_semantic_ivf",
    "dedup_simhash",
)

# Oracle-backed queries added AFTER this round's window was frozen — they
# rotate into the next round's window. Kept explicit so tests + ROUND notes
# can audit that nothing silently escapes driver coverage. The r8 window
# froze at round start with the complete 25-query r7 residue seated, so
# this list reopens EMPTY; every oracle-backed operator ADDED during r8
# must be appended here (enforced by tests/test_registry_order.py) and
# leads the r9 window together with the remaining 35 r4-evidence picks.
ROTATION_RESIDUE: tuple[str, ...] = (
    # --- first r8 work session ---
    "sim_link_prediction",
    "sim_kmeans_lloyd_step",
    # --- second r8 work session ---
    "retrieval_rrf_fusion",
    "text_tfidf_cosine_pairs",
    # --- third r8 work session ---
    "dedup_lsh_recall_audit",
    "text_bpe_fertility",
    "dsir_importance_weights",
    # --- fourth r8 work session ---
    "events_activity_streaks",
    "events_funnel_ttc",
    "stream_late_data_audit",
    # --- fifth r8 work session ---
    "embedding_centroid_drift",
    "events_hhi_concentration",
    # --- sixth r8 work session ---
    "orders_rfm_segments",
    "profile_benford_audit",
    # --- seventh r8 work session (residue at cap — round's last op) ---
    "retrieval_rrf_fusion_ivf",
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
