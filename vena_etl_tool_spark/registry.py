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
# Round-6 window (r5 verdict #1): after r5, every oracle-backed query
# holds a driver-green row somewhere in r1∪…∪r5, so this round is pure
# evidence-freshness rotation plus this round's changes:
#   (1) the 5 queries whose CODE or ORACLE changed in r6 — they re-enter
#       per the window policy: dedup_containment (clone-family
#       pre-collapse + reps oracle CTE), multimodal_phash_neardup (same
#       collapse + occupancy band-width rule + reps oracle CTE),
#       corpus_drift_topk (empty-corpus coalesce under the overflow
#       guard), corpus_incremental_persisted (INCR_BAND_CAP shared
#       constant), stream_dedup_within_watermark (single-input-batch
#       runtime assert) — the last three are r5-green and the changes
#       are behavior-preserving on the fixtures, but "changed ⇒
#       re-enter" is the rule that keeps driver rows certifying CURRENT
#       text;
#   (2) the full 31-query r2-evidence backlog (23 declared in
#       ROUND5_NOTES + the 8 late-r5 displacements) — after this round
#       no oracle-backed query's newest driver evidence predates r3;
#   (3) 14 oldest-r3-evidence picks, per the verdict's shortlist: the
#       five r3 setop queries, sort_global_ranked, struct_functions,
#       map_functions, hash_functions, and the five r3 TPC-H derivatives
#       (q13/q14/q18/q19/q22).
# The r6 rows-only additions (embedding_product_quantize_trained,
# sim_ann_adc_trained_recall) can never hold a driver row and stay out.
# Remaining r3-evidence queries (~32) are the declared r7 backlog.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- (1) changed in r6 ---
    "dedup_containment",
    "multimodal_phash_neardup",
    "corpus_drift_topk",
    "corpus_incremental_persisted",
    "stream_dedup_within_watermark",
    # --- (2) the r2-evidence backlog, complete (31) ---
    "agg_collect",
    "corpus_curation_pipeline",
    "dedup_cluster_assign",
    "dedup_levenshtein",
    "dedup_ngram_jaccard",
    "embedding_quantize_int8",
    "filter_project",
    "ingest_quarantine_counts",
    "layout_partitioned_pruning",
    "multimodal_resize_plan",
    "q17_small_quantity_revenue",
    "q21_sole_returner",
    "q6_revenue_forecast",
    "setop_except_all",
    "setop_intersect_all",
    "sim_ann_ivf",
    "sim_cosine_topk",
    "skew_salted_aggregate",
    "stream_foreach_batch_sink",
    "stream_static_join",
    "subquery_correlated_scalar",
    "subquery_in_not_in",
    "subquery_lateral_topn",
    "text_langid",
    "text_redact",
    "text_term_salience",
    "topk_global",
    "topn_per_group",
    "udf_grouped_agg",
    "udf_pandas_scalar_norm",
    "window_ranking",
    # --- (3) oldest r3-evidence picks (14) ---
    "setop_except",
    "setop_intersect",
    "setop_union_all",
    "setop_union_by_name",
    "setop_union_distinct",
    "sort_global_ranked",
    "struct_functions",
    "map_functions",
    "hash_functions",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_filter",
    "q22_dormant_balance",
)

# Oracle-backed queries added AFTER this round's window was frozen — they
# rotate into the next round's window. Kept explicit so tests + ROUND notes
# can audit that nothing silently escapes driver coverage. The r6 window
# froze on the 31-query r2 backlog (displacing backlog entries for late
# additions was exactly the r5 problem the verdict flagged), so operators
# added after the freeze are declared residue and lead the r7 window
# instead. First r6 session: the BPE trainer family, snapshot diff, the
# mutual-kNN graph, and semantic clusters. Continuation session: the
# fuzzy trigram join (PPJoin), IVFADC + its recall audit, JL random
# projection + its distortion audit, integer PageRank, label propagation,
# the audited count-min sketch, and weighted Bernoulli sampling
# (per-operator rationale in docs/ROUND6_NOTES.md).
ROTATION_RESIDUE: tuple[str, ...] = (
    "corpus_snapshot_diff",
    "sim_knn_graph_mutual",
    "sim_semantic_clusters",
    "text_bpe_merge_step",
    "text_bpe_train",
    "text_bpe_apply",
    # --- added in the r6 continuation session ---
    "join_fuzzy_trigram",
    "sim_ann_ivfadc",
    "sim_ann_ivfadc_recall",
    "embedding_random_projection",
    "embedding_rp_distance_audit",
    "sim_graph_pagerank",
    "sim_label_spread",
    "text_cms_heavy_hitters",
    "sample_weighted_bernoulli",
    "join_asof_tolerance",
    "stream_cms_merge",
    "multimodal_phash_clusters",
    # --- third r6 work session ---
    "text_hll_cardinality",
    "stream_hll_merge",
    "layout_rendezvous_shards",
    "text_pmi_collocations",
    "profile_key_skew",
    "ts_linear_trend",
    "agg_winsorized_stats",
    "sim_graph_triangles",
    "events_cumulative_uniques",
    "dedup_canonical_pick",
    "text_quality_calibration",
    # --- fourth r6 work session ---
    "events_change_point",
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
