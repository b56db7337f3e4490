"""Layout operators: the on-disk claims (partition pruning, ORC predicate
pushdown, Z-order block locality) asserted against the executed plan and
the produced rows — the write-side analog of tests/test_plans.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from vena_etl_tool_spark.operators import layouts
from vena_etl_tool_spark.registry import all_specs

_SPECS = all_specs()


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_read_prunes_directories(spark, sf_dir):
    df = _SPECS["layout_partitioned_pruning"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "PartitionFilters" in plan
    assert "o_year" in plan.split("PartitionFilters")[1].splitlines()[0]
    # the layout really is multi-directory, so the filter had partitions
    # to eliminate — and the one directory holds exactly the year's rows
    import os

    root = layouts.layout_dir(sf_dir, "orders_by_year")
    year_dirs = [d for d in os.listdir(root) if d.startswith("o_year=")]
    assert len(year_dirs) > 1 and "o_year=2001" in year_dirs
    direct = spark.read.parquet(os.path.join(root, "o_year=2001")).count()
    assert direct == df.agg(F.sum("n")).first()[0]


def test_orc_readback_pushes_predicate(spark, sf_dir):
    df = _SPECS["layout_orc_roundtrip"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "OrcScan" in plan or "Format: ORC" in plan or "orc" in plan.lower()
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan


def test_zorder_blocks_are_local_in_both_dims(spark, sf_dir):
    """Fixing the top 4 interleaved bits (zkey >> 8) bounds BOTH source
    dimensions to a 16-wide range — the property that makes a zkey sort
    skippable on either column's min/max stats."""
    rows = _SPECS["layout_zorder_stats"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.zblock < 256
        assert r.max_x - r.min_x <= 15
        assert r.max_y - r.min_y <= 15


def test_zorder_key_is_a_bijection_of_buckets(spark, sf_dir):
    """16-bit Morton interleave is invertible: distinct (x,y) bucket pairs
    and distinct zkeys must 1:1."""
    from vena_etl_tool_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 256).cast("long")
    y = (F.unix_date(F.col("o_orderdate").cast("date")) % 256).cast("long")
    z = orders.select(x.alias("x"), y.alias("y")).withColumn(
        "zkey", layouts._morton16(F.col("x"), F.col("y"))
    )
    n_pairs, n_keys = z.agg(
        F.countDistinct("x", "y"), F.countDistinct("zkey")
    ).first()
    assert n_pairs == n_keys


def test_compaction_bins_are_valid_packing(spark, sf_dir):
    """Next-fit-decreasing invariants: per source, bin ids are contiguous
    from 0; a bin never exceeds target + its own largest member (a file
    straddles the boundary at most once); bytes are conserved."""
    from collections import defaultdict

    from vena_etl_tool_spark.operators.layouts import (
        COMPACT_TARGET_BYTES,
        layout_compaction_plan,
    )

    rows = layout_compaction_plan(spark, sf_dir).collect()
    per_source = defaultdict(list)
    for r in rows:
        per_source[r.source].append(r)
    for source, files in per_source.items():
        bins = defaultdict(list)
        for r in files:
            bins[r.bin_id].append(r)
        assert sorted(bins) == list(range(len(bins)))
        for bin_id, members in bins.items():
            m = members[0]
            assert m.bin_files == len(members)
            assert m.bin_bytes == sum(x.file_bytes for x in members)
            assert m.bin_bytes < COMPACT_TARGET_BYTES + max(
                x.file_bytes for x in members
            )


def test_compaction_oversized_file_keeps_bins_contiguous(spark, tmp_path):
    """A file larger than the target spans several raw cumsum intervals;
    dense_rank must keep the emitted bin ids contiguous regardless."""
    import pandas as pd

    from vena_etl_tool_spark.operators.layouts import (
        COMPACT_DOCS_PER_FILE,
        COMPACT_TARGET_BYTES,
        layout_compaction_plan,
    )

    # file 0: one doc of 2*target bytes; files 1..3: small
    rows = [(0, "x", "en", "s", 2 * COMPACT_TARGET_BYTES)]
    for i in range(1, 4):
        rows.append((i * COMPACT_DOCS_PER_FILE, "x", "en", "s", 100))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        (r.bin_id, r.file_bytes)
        for r in layout_compaction_plan(spark, str(tmp_path)).collect()
    )
    bins = sorted({b for b, _ in got})
    assert bins == list(range(len(bins))), got
