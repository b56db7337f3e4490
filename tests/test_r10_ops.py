"""Round-10 operator tests: the HLL candidate-key screen and the pinned
NULL semantics of the exact candidate-key audit."""

import pyspark.sql.functions as F
import pytest


def test_candidate_keys_sketch_within_rsd_of_exact(spark, sf_dir):
    """VERDICT r9 #3 invariant: the HLL screen's estimate stays within a
    few rsd of the exact twin on every combo, and no true key is ever
    screened out (a false screen-out would skip the exact escalation)."""
    from vena_etl_tool_spark.operators.aggregates import (
        profile_candidate_keys,
        profile_candidate_keys_sketch,
    )

    exact = {
        (r.tbl, r.cols): r
        for r in profile_candidate_keys(spark, sf_dir).collect()
    }
    sketch = {
        (r.tbl, r.cols): r
        for r in profile_candidate_keys_sketch(spark, sf_dir).collect()
    }
    assert set(exact) == set(sketch)
    for key, ex in exact.items():
        sk = sketch[key]
        assert sk.n_rows == ex.n_rows  # same pinned non-null universe
        rel_err = abs(sk.approx_distinct - ex.n_distinct) / max(ex.n_distinct, 1)
        assert rel_err <= 0.05, (key, sk.approx_distinct, ex.n_distinct)
        if ex.is_key:
            assert sk.is_key_candidate == 1, key  # keys never screened out


def test_candidate_keys_null_semantics_pinned(spark):
    """r9 ADVICE: Spark count_distinct drops NULL-bearing tuples while
    DuckDB counts them — the audit pins parity by filtering to complete
    key tuples on BOTH sides. Feed a frame WITH nulls through the same
    shape and check the convention holds."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "b"), (3, "a"), (3, "a")],
        "k int, v string",
    )
    # replicate the operator's inner shape on a synthetic combo
    filtered = df
    for c in ("k", "v"):
        filtered = filtered.where(F.col(c).isNotNull())
    row = filtered.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("k"), F.col("v")).alias("n_distinct"),
    ).collect()[0]
    # 3 complete tuples: (1,a), (3,a), (3,a) -> 2 distinct
    assert row.n_rows == 3
    assert row.n_distinct == 2


@pytest.mark.parametrize("mod", [2])
def test_ml_minhash_stratum_is_registered(mod):
    from vena_etl_tool_spark import registry

    specs = registry.all_specs()
    assert "dedup_ml_minhash_stratum" in specs
    assert specs["dedup_ml_minhash_stratum"].oracle is None


def test_cow_merge_rewrites_only_affected_partitions(spark, tmp_path):
    """File-level copy-on-write pin (VERDICT r9 #7): untouched partition
    directories keep their files byte-identical; affected partitions are
    rewritten; a planted NEW key exercises the insert path end to end."""
    import os

    from vena_etl_tool_spark.operators.layouts import (
        MERGE_PARTS,
        cow_merge,
        seed_merge_target,
    )

    path = str(tmp_path / "target")
    # 64 customers cover every pk; balance = key * 100 cents
    cust = spark.createDataFrame(
        [(k, k * 100) for k in range(64)], "key long, bal_cents long"
    )
    seed_merge_target(cust, path)

    def file_sig(pk):
        d = os.path.join(path, f"pk={pk}")
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)), os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    before = {pk: file_sig(pk) for pk in range(MERGE_PARTS)}
    # updates touch keys 0 (pk 0) and 17 (pk 1); key 1000 (pk 8) is NEW
    updates = spark.createDataFrame(
        [(0, 55_500), (17, 1_700_000), (1000, 42)], "key long, new_cents long"
    )
    affected = cow_merge(spark, path, updates)
    assert affected == [0, 1, 8]

    after = {pk: file_sig(pk) for pk in range(MERGE_PARTS)}
    for pk in range(MERGE_PARTS):
        if pk in affected:
            assert before[pk] != after[pk], f"pk={pk} should be rewritten"
        else:
            assert before[pk] == after[pk], f"pk={pk} must be untouched"

    rows = {r.key: r for r in spark.read.parquet(path).collect()}
    assert len(rows) == 65  # 64 seeds + 1 insert
    assert rows[0].bal_cents == 55_500 and rows[0].action == "update"
    assert rows[17].bal_cents == 1_700_000 and rows[17].action == "update"
    assert rows[1000].bal_cents == 42 and rows[1000].action == "insert"
    # keep rows in affected partitions are re-tagged 'keep'; untouched
    # partitions retain their 'seed' tag (never rewritten)
    assert rows[16].action == "keep"  # pk 0, not updated, partition rewritten
    assert rows[2].action == "seed"  # pk 2 untouched
    assert rows[2].bal_cents == 200


def _serving_rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_stream_serving_batch_equivalence(spark, sf):
    """VERDICT r9 #8 'done' criterion: the streamed serving output equals
    the batch hybrid retrieval restricted to the requested query set, at
    two SFs."""
    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.retrieval import (
        SERVE_REQUEST_MAP,
        retrieval_rrf_fusion_ivf,
        stream_retrieval_serving,
    )

    req = dict(SERVE_REQUEST_MAP)
    types = {
        r.event_type
        for r in load_table(spark, sf, "events").select("event_type").distinct().collect()
    }
    requested = {req[t] for t in types if t in req}
    batch = retrieval_rrf_fusion_ivf(spark, sf).filter(
        F.col("query_id").isin(sorted(requested))
    )
    assert _serving_rows(stream_retrieval_serving(spark, sf)) == _serving_rows(batch)


def test_stream_serving_split_into_micro_batches(spark, sf_dir, tmp_path):
    """Splitting the query log into single-file micro-batches must not
    change the served set (first-serve idempotency across batches)."""
    from vena_etl_tool_spark.operators.retrieval import (
        serve_query_log,
        stream_retrieval_serving,
    )
    from vena_etl_tool_spark.streaming.queries import events_stream

    # split the event log into 4 files; stream them one file per batch
    ev = events_stream(spark, sf_dir)
    split_dir = str(tmp_path / "events_split")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4).write.parquet(
        split_dir
    )
    split_stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    multi = serve_query_log(spark, sf_dir, split_stream)
    single = stream_retrieval_serving(spark, sf_dir)
    assert _serving_rows(multi) == _serving_rows(single)


def test_maxsim_invariants(spark, sf_dir):
    """Late-interaction sanity: each of the 20 queries serves exactly
    TOP_K ranked rows; MaxSim is bounded by the number of query
    sub-vectors (each term is a cosine <= 1)."""
    from vena_etl_tool_spark.operators.similarity import (
        MAXSIM_SUBV,
        TOP_K,
        sim_maxsim_late_interaction,
        sim_maxsim_plaid_rerank,
    )

    rows = sim_maxsim_late_interaction(spark, sf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
        assert r.maxsim <= MAXSIM_SUBV + 1e-9
        assert 1 <= r.rk <= TOP_K
    assert len(per_q) == 20
    assert all(len(v) == TOP_K for v in per_q.values())

    rec = sim_maxsim_plaid_rerank(spark, sf_dir).collect()
    assert len(rec) == 20
    for r in rec:
        assert 0 <= r.hits <= TOP_K
        assert r.recall_milli == r.hits * 1000 // TOP_K


def test_delete_vectors_file_level_policy(spark, tmp_path):
    """DV policy pin: partitions under the compaction threshold keep their
    data files byte-identical and serve deletes from the sidecar;
    partitions past it are rewritten and leave no DV residue; erased keys
    never reach the read path either way."""
    import os

    from vena_etl_tool_spark.operators.layouts import (
        MERGE_PARTS,
        apply_deletes_dv,
        seed_merge_target,
    )

    path = str(tmp_path / "t")
    # 10 rows in pk 0 (keys 0,16,..,144) and 10 in pk 1 (keys 1,17,..,145)
    rows = [(k, k) for k in range(0, 160, 16)] + [(k, k) for k in range(1, 160, 16)]
    seed_merge_target(spark.createDataFrame(rows, "key long, bal_cents long"), path)

    def sig(pk):
        d = os.path.join(path, f"pk={pk}")
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)), os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    before = {pk: sig(pk) for pk in (0, 1)}
    # delete 2/10 of pk 0 (200000 ppm > threshold -> compact) and 0 of pk 1;
    # plus 1/10 of pk 1? no: delete exactly one key of pk 1 (100000 ppm >
    # 85000 too). Use NO pk-1 deletes -> pk 1 untouched, no DV rows.
    deletes = spark.createDataFrame([(0,), (32,)], "key long")
    compact, dv_path = apply_deletes_dv(spark, path, deletes)
    assert compact == [0]
    after = {pk: sig(pk) for pk in (0, 1)}
    assert before[1] == after[1]  # untouched partition byte-identical
    assert before[0] != after[0]  # compacted partition rewritten
    assert spark.read.parquet(dv_path).count() == 0  # compacted -> DV cleared

    live = {r.key for r in spark.read.parquet(path).collect()}
    assert 0 not in live and 32 not in live
    assert len(live) == 18


def test_delete_vectors_sidecar_path(spark, tmp_path):
    """Below threshold: data files untouched, deletes served purely from
    the sidecar anti-join."""
    import os

    from vena_etl_tool_spark.operators.layouts import (
        apply_deletes_dv,
        seed_merge_target,
    )

    path = str(tmp_path / "t2")
    rows = [(k, k) for k in range(0, 1600, 16)]  # 100 rows, all pk 0
    seed_merge_target(spark.createDataFrame(rows, "key long, bal_cents long"), path)
    d = os.path.join(path, "pk=0")
    before = sorted(os.listdir(d))
    deletes = spark.createDataFrame([(0,), (16,)], "key long")  # 2% < 8.5%
    compact, dv_path = apply_deletes_dv(spark, path, deletes)
    assert compact == []
    assert sorted(os.listdir(d)) == before  # no rewrite
    dv = {r.d_key for r in spark.read.parquet(dv_path).collect()}
    assert dv == {0, 16}
    from pyspark.sql import functions as FF

    live = (
        spark.read.parquet(path)
        .join(
            FF.broadcast(spark.read.parquet(dv_path).select("d_key")),
            FF.col("key") == FF.col("d_key"),
            "left_anti",
        )
        .count()
    )
    assert live == 98


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_k_anonymity_guarantee_and_conservation(spark, sf):
    """The generalization ladder's defining invariants: every published
    level's minimum group size is >= K_ANON, every customer row lands in
    exactly one level, and the audit's band masses partition the table."""
    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.privacy import (
        K_ANON,
        privacy_k_anonymity,
        privacy_k_generalize,
    )

    n_cust = load_table(spark, sf, "customer").count()
    levels = {r.level: r for r in privacy_k_generalize(spark, sf).collect()}
    assert sum(r.n_rows for r in levels.values()) == n_cust
    for lvl, r in levels.items():
        if lvl < 3:
            assert r.min_k_published >= K_ANON, (lvl, r)
    bands = privacy_k_anonymity(spark, sf).collect()
    assert sum(r.n_rows for r in bands) == n_cust
    for r in bands:
        assert (r.violates_k == 1) == (r.k_band in ("1", f"2-{K_ANON - 1}"))


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_prefix_filter_completeness(spark, sf):
    """The prefix-filtering theorem, empirically: the prefix join's output
    equals the FULL blocked Jaccard join thresholded at t — no qualifying
    pair escapes the prefix index, no sub-threshold pair survives the
    verify."""
    from vena_etl_tool_spark.operators.dedup import (
        PPJOIN_T_MILLI,
        dedup_ngram_jaccard,
        dedup_prefix_filter_join,
    )

    t = PPJOIN_T_MILLI / 1000.0
    full = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf).collect()
        if r.jaccard >= t
    }
    pref = {
        (r.doc_a, r.doc_b)
        for r in dedup_prefix_filter_join(spark, sf).collect()
    }
    assert pref == full
    assert pref, "fixture must contain at least one >=t pair"


def test_ranker_agreement_tau_identities(spark, sf_dir):
    """Kendall-count identities: concordant + discordant == C(n_overlap, 2)
    (distinct ranks, no ties), tau bounded in [-1000, 1000], and the
    floor-divided milli value reproduces from the counts."""
    from vena_etl_tool_spark.operators.retrieval import retrieval_system_agreement

    from vena_etl_tool_spark.operators.retrieval import RRF_QMAP

    rows = retrieval_system_agreement(spark, sf_dir).collect()
    # r10 VERDICT #2: the query map is the spine — EVERY query_id emits a
    # row even at SFs where the two top lists are disjoint.
    assert len(rows) == len(RRF_QMAP)
    for r in rows:
        assert r.concordant + r.discordant == r.n_overlap * (r.n_overlap - 1) // 2
        if r.n_overlap < 2:
            assert r.tau_milli is None
        else:
            assert -1000 <= r.tau_milli <= 1000
            tot = r.concordant + r.discordant
            mag = abs(r.concordant - r.discordant) * 1000 // tot
            expect = mag if r.concordant >= r.discordant else -mag
            assert r.tau_milli == expect
        assert r.top1_same in (0, 1, None)


def test_cdc_apply_split_invariance(spark, sf_dir, tmp_path):
    """LWW merge over sequence-ordered deltas is associative: applying
    the CDC log in 4 single-file micro-batches must equal the single-
    batch apply AND the batch one-shot collapse."""
    from vena_etl_tool_spark.streaming.queries import (
        cdc_apply_stream,
        events_stream,
        stream_cdc_apply,
    )

    single = {tuple(r) for r in stream_cdc_apply(spark, sf_dir).collect()}
    ev = events_stream(spark, sf_dir)
    split_dir = str(tmp_path / "ev_split")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4).write.parquet(
        split_dir
    )
    split_stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    multi = {tuple(r) for r in cdc_apply_stream(spark, split_stream).collect()}
    assert multi == single
    ops = {r[0] for r in single}
    assert ops <= {"insert", "update", "delete"}


def test_compaction_apply_reduces_files(spark, sf_dir):
    """The physical claim behind the audit: after compaction every source
    directory holds ceil(n/400) files (vs ceil(n/50) fragmented), and row
    counts are conserved."""
    import math

    from vena_etl_tool_spark.operators.layouts import (
        COMPACT_APPLY_ROWS,
        COMPACT_FRAG_ROWS,
        layout_compaction_apply,
    )

    rows = layout_compaction_apply(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_files_before == math.ceil(r.n_rows / COMPACT_FRAG_ROWS)
        assert r.n_files_after == math.ceil(r.n_rows / COMPACT_APPLY_ROWS)
        assert r.n_files_after <= r.n_files_before


def test_l_diversity_consistency_with_k_audit(spark, sf_dir):
    """Row conservation across the l-histogram, and the homogeneity
    definition: l=1 groups are all 100%-majority (skewed by definition)."""
    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.privacy import (
        L_DIVERSITY,
        privacy_l_diversity,
    )

    rows = privacy_l_diversity(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.n_rows for r in rows) == n_cust
    for r in rows:
        assert (r.violates_l == 1) == (r.l_distinct < L_DIVERSITY)
        if r.l_distinct == 1:
            assert r.n_skewed_groups == r.n_groups


def test_zipf_buckets_partition_vocabulary(spark, sf_dir):
    """Bands partition the vocabulary: term mass and occurrence shares
    are conserved, and band frequency ranges respect the 2^b bounds."""
    from vena_etl_tool_spark.operators.textanalysis import (
        ZIPF_MAX_BAND,
        text_zipf_buckets,
    )

    rows = text_zipf_buckets(spark, sf_dir).collect()
    assert rows
    total_occ = sum(r.occurrences for r in rows)
    assert sum(r.occ_share_ppm for r in rows) <= 1_000_000  # floor-div sums
    for r in rows:
        if r.band < ZIPF_MAX_BAND:
            assert (1 << r.band) <= r.min_freq <= r.max_freq < (1 << (r.band + 1))
        assert r.occ_share_ppm == r.occurrences * 1_000_000 // total_occ


def test_kcore_peel_monotone(spark, sf_dir):
    """Peeling can only shrink: node and edge counts are non-increasing
    across rounds, and every surviving round-r node had degree >= K on
    the entering edge set (spot-checked via the trajectory's shape)."""
    from vena_etl_tool_spark.operators.similarity import sim_graph_kcore_peel

    rows = sorted(sim_graph_kcore_peel(spark, sf_dir).collect(), key=lambda r: r.round)
    assert [r.round for r in rows] == [1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes
        assert b.n_edges <= a.n_edges


def test_stream_merge_cow_split_and_replay_invariance(spark, sf_dir, tmp_path):
    """The sequence guard's two defining properties: (1) applying the CDC
    log in 4 time-SHUFFLED micro-batches produces the same committed
    table as the single batch (an out-of-order older update can never
    overwrite, a delete can never be resurrected); (2) replaying the
    whole log AGAIN over the committed table is a no-op."""
    from vena_etl_tool_spark.operators.layouts import layout_dir
    from vena_etl_tool_spark.streaming.queries import (
        events_stream,
        merge_stream_into_cow,
        seed_stream_merge_target,
        stream_merge_cow_sink,
    )

    single = {tuple(r) for r in stream_merge_cow_sink(spark, sf_dir).collect()}

    path = str(tmp_path / "t")
    seed_stream_merge_target(spark, sf_dir, path)
    ev = events_stream(spark, sf_dir)
    split_dir = str(tmp_path / "ev_split")
    # repartition(4) shuffles rows across files with NO time ordering
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4).write.parquet(
        split_dir
    )
    split_stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    merge_stream_into_cow(spark, split_stream, path)

    def audit(p):
        import pyspark.sql.functions as FF

        return {
            tuple(r)
            for r in spark.read.parquet(p)
            .groupBy(FF.col("pk").cast("int").alias("pk"))
            .agg(
                FF.count(FF.lit(1)).alias("n_rows"),
                FF.sum((FF.col("action") == "tomb").cast("int"))
                .cast("long")
                .alias("n_tomb"),
                FF.sum((FF.col("action") == "update").cast("int"))
                .cast("long")
                .alias("n_update"),
                FF.sum(
                    FF.when(FF.col("action") != "tomb", FF.col("bal_cents")).otherwise(0)
                )
                .cast("long")
                .alias("sum_live_cents"),
            )
            .collect()
        }

    assert audit(path) == single
    # replay idempotency: nothing is newer the second time
    merge_stream_into_cow(spark, events_stream(spark, sf_dir), path)
    assert audit(path) == single
