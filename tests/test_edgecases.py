"""Edge-case unit tests per SURVEY.md §5.2.4: nulls in join keys, empty
inputs/partitions, duplicate keys, explode_outer null semantics, timestamp
boundaries."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F


def test_null_join_keys_never_match(spark):
    """SQL equi-join semantics: NULL keys match nothing (not even NULL)."""
    a = spark.createDataFrame([(1, "a"), (None, "b"), (2, "c")], "k int, va string")
    b = spark.createDataFrame([(1, "x"), (None, "y")], "k int, vb string")
    inner = a.join(b, "k").collect()
    assert [(r.k, r.vb) for r in inner] == [(1, "x")]
    left = a.join(b, "k", "left").orderBy("va").collect()
    assert [r.vb for r in left] == ["x", None, None]
    # null-safe equality (<=>) is the explicit opt-in
    nullsafe = a.join(b, a["k"].eqNullSafe(b["k"])).count()
    assert nullsafe == 2


def test_empty_input_through_operators(spark):
    empty = spark.createDataFrame([], "k int, v double")
    assert empty.groupBy("k").agg(F.sum("v")).count() == 0
    assert empty.join(spark.range(5), empty.k == F.col("id")).count() == 0
    assert empty.agg(F.sum("v")).first()[0] is None  # global agg: one row, null sum
    assert empty.orderBy("v").limit(3).count() == 0


def test_duplicate_join_keys_multiply(spark):
    a = spark.createDataFrame([(1,), (1,)], "k int")
    b = spark.createDataFrame([(1, "x"), (1, "y")], "k int, v string")
    assert a.join(b, "k").count() == 4  # bag semantics: 2×2
    assert a.join(b, "k", "left_semi").count() == 2  # semi never multiplies


def test_explode_outer_preserves_empty_and_null(spark):
    df = spark.createDataFrame(
        [(1, [10, 20]), (2, []), (3, None)], "id int, xs array<int>"
    )
    inner = df.select("id", F.explode("xs").alias("x"))
    assert {r.id for r in inner.collect()} == {1}
    outer = df.select("id", F.explode_outer("xs").alias("x"))
    rows = {(r.id, r.x) for r in outer.collect()}
    assert rows == {(1, 10), (1, 20), (2, None), (3, None)}


def test_timestamp_boundaries_utc(spark):
    """Session is pinned UTC: epoch math has no DST surprises, and
    ns-fixture truncation (catalog.py) is exact at µs precision."""
    df = spark.createDataFrame(
        [(datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),),
         (datetime.datetime(1970, 1, 1, 0, 0, 0, 0),),
         (datetime.datetime(2038, 1, 19, 3, 14, 8, 0),)],
        "ts timestamp",
    )
    # two epoch extractors, two boundary semantics: unix_timestamp drops the
    # sub-second part (pre-epoch 1969-12-31T23:59:59.999999 → 0), while
    # cast('long') floors (→ -1). Engine code uses cast for oracle queries.
    via_fn = [r.e for r in df.select(F.unix_timestamp("ts").alias("e")).collect()]
    assert via_fn == [0, 0, 2147483648]
    via_cast = [r.e for r in df.select(F.col("ts").cast("long").alias("e")).collect()]
    assert via_cast == [-1, 0, 2147483648]  # floor, epoch, >int32 (no Y2038 wrap)


def test_corrupt_free_csv_has_empty_quarantine(spark, tmp_path):
    from vena_etl_tool_spark.pipeline.ingest import ingest_csv
    from vena_etl_tool_spark.pipeline.spec import default_registry

    p = tmp_path / "clean.csv"
    header = ("l_orderkey,l_partkey,l_suppkey,l_linenumber,l_quantity,"
              "l_extendedprice,l_discount,l_tax,l_returnflag,l_linestatus,l_shipdate")
    p.write_text(header + "\n1,2,3,1,5.0,100.0,0.05,0.02,N,O,1996-01-02 00:00:00\n")
    res = ingest_csv(spark, str(p), default_registry().get("lineitem-csv"))
    assert (res.n_good, res.n_quarantined) == (1, 0)


def test_window_on_single_row_partitions(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame([(i, i) for i in range(5)], "k int, v int")
    w = Window.partitionBy("k").orderBy("v")
    out = df.select(
        F.lag("v").over(w).alias("prev"),
        F.row_number().over(w).alias("rn"),
        F.percent_rank().over(w).alias("pr"),
    ).collect()
    assert all(r.prev is None and r.rn == 1 and r.pr == 0.0 for r in out)


def test_many_empty_partitions(spark):
    """Operators must survive heavily over-partitioned (mostly empty) RDDs."""
    df = spark.range(0, 10).repartition(64)
    assert df.groupBy((F.col("id") % 3).alias("m")).count().count() == 3
    assert df.orderBy(F.col("id").desc()).limit(2).count() == 2


def test_hll_sketch_rollup_accuracy(spark, sf_dir):
    """Merged per-month HLL sketches estimate the per-year distinct
    customer count within 5% of exact."""
    import pyspark.sql.functions as F

    from vena_etl_tool_spark.catalog import load_table
    from vena_etl_tool_spark.operators.aggregates import agg_hll_sketch_rollup

    est = {r.yr: r.est_customers for r in agg_hll_sketch_rollup(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    exact = {
        r.yr: r.n
        for r in orders.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for yr, e in est.items():
        assert abs(e - exact[yr]) / exact[yr] < 0.05, (yr, e, exact[yr])


def test_retention_offset_zero_is_full_cohort(spark, sf_dir):
    """Every user is active in their own first-seen week, so each cohort's
    offset-0 row must cover the whole cohort (retention exactly 1.0)."""
    import pyspark.sql.functions as F

    from vena_etl_tool_spark.operators.analytics import events_retention_cohorts

    rows = (
        events_retention_cohorts(spark, sf_dir)
        .filter(F.col("week_offset") == 0)
        .collect()
    )
    assert rows
    for r in rows:
        assert r.active_users == r.cohort_size
        assert r.retention == 1.0


def test_phash_is_locality_preserving(spark, sf_dir, tmp_path):
    """Lightly-perturbed payloads must pair within the hamming radius
    against their near-dup's clone REPRESENTATIVE; exact clones collapse
    (r6: byte-identical payloads are upstream exact-dedup's job, enforced
    in-operator — they collide in every band at any keyspace width);
    unrelated docs must not appear."""
    from vena_etl_tool_spark.operators.multimodal import (
        PHASH_HAM_T,
        multimodal_phash_neardup,
    )

    base = ("spark shuffles partitions across the cluster while the "
            "optimizer prunes columns from the scan " * 4)
    rows = [
        (1, "s", base),
        (2, "s", base),                       # exact clone of 1 — collapsed
        (3, "s", base[:-10] + "tail bytes"),  # light perturbation
        (4, "s", "completely different payload about storage formats " * 6),
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {(r.doc_a, r.doc_b): r.hamming
           for r in multimodal_phash_neardup(spark, str(tmp_path)).collect()}
    assert (1, 3) in out  # perturbed doc pairs with the family rep
    assert all(2 not in pair for pair in out)  # clone collapsed away
    for (a, b), h in out.items():
        assert a < b and 0 <= h <= PHASH_HAM_T
        assert 4 not in (a, b)  # the unrelated doc never pairs


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_drift_one_sided_snapshot_yields_null_tv(spark, tmp_path):
    """All docs in one parity half (an empty 'new' snapshot): totals hit
    the NULLIF guard — NULL tv/share, never an ANSI divide-by-zero."""
    from vena_etl_tool_spark.operators.textanalysis import corpus_drift_topk

    d = _write_docs(spark, tmp_path, [(0, "a b a", "en", "s", 5), (2, "b c", "en", "s", 3)])
    rows = corpus_drift_topk(spark, d).collect()
    assert rows and all(r.tv_distance is None for r in rows)


def test_drift_empty_corpus_returns_empty(spark, tmp_path):
    """EMPTY documents table: the global token sums are NULL before the
    coalesce(…, 0) — the int64-overflow guard must not fire on them
    (assert_true(NULL) throws); the documented degenerate result is an
    empty DataFrame (r5 ADVICE item)."""
    from vena_etl_tool_spark.operators.textanalysis import corpus_drift_topk

    d = _write_docs(spark, tmp_path, [])
    assert corpus_drift_topk(spark, d).collect() == []


def test_containment_short_docs_produce_no_pairs(spark, tmp_path):
    """Documents under 3 tokens have no shingles; the query returns empty
    instead of erroring."""
    from vena_etl_tool_spark.operators.dedup import dedup_containment

    d = _write_docs(spark, tmp_path, [(0, "a b", "en", "s", 3), (1, "c", "en", "s", 1)])
    assert dedup_containment(spark, d).collect() == []


def test_semantic_dedup_single_vector_is_kept(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from vena_etl_tool_spark.operators.similarity import dedup_semantic_ivf

    pdf = pd.DataFrame(
        {"vec_id": [7], "embedding": [np.ones(64, dtype=np.float32)], "label": [1]}
    )
    pdf.to_parquet(str(tmp_path / "embeddings.parquet"))
    rows = dedup_semantic_ivf(spark, str(tmp_path)).collect()
    assert len(rows) == 1 and not rows[0].is_dup and rows[0].n_close == 0


def test_compaction_single_tiny_file_is_bin_zero(spark, tmp_path):
    from vena_etl_tool_spark.operators.layouts import layout_compaction_plan

    d = _write_docs(spark, tmp_path, [(0, "x", "en", "only", 1)])
    rows = layout_compaction_plan(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.bin_id, r.bin_files, r.bin_bytes) == (0, 1, r.file_bytes)


def test_path_mining_needs_three_events(spark, sf_dir, tmp_path):
    """A user with fewer than 3 events contributes no paths."""
    import datetime as dt

    from vena_etl_tool_spark.operators.analytics import events_path_mining

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 10, "click", 1.0, "{}"),
        (3, t0, 20, "view", 1.0, "{}"),
        (4, t0 + dt.timedelta(minutes=1), 20, "click", 1.0, "{}"),
        (5, t0 + dt.timedelta(minutes=2), 20, "buy", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = events_path_mining(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].path == "view>click>buy" and got[0].n_occurrences == 1


def test_profile_counts_nulls_and_distincts(spark, tmp_path):
    """Planted NULLs: the profile must count them per column (the fixture
    has none, so the oracle diff never exercises this path)."""
    from vena_etl_tool_spark.operators.aggregates import profile_column_stats

    rows = [
        (0, "a", None, "s", 1),
        (1, "b", "en", None, 2),
        (2, "b", "en", "s", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    prof = {r.col: r for r in profile_column_stats(spark, str(tmp_path)).collect()}
    assert prof["lang"].n_null == 1 and prof["lang"].n_distinct == 1
    assert prof["source"].n_null == 1
    assert prof["n_chars"].n_null == 1 and prof["n_chars"].max_val == "2"
    assert prof["text"].n_distinct == 2
    assert prof["doc_id"].n_null == 0 and prof["doc_id"].n_distinct == 3
