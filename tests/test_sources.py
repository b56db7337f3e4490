"""Source/sink round-trip tests (SURVEY.md §B.1): parquet, CSV, JSONL."""

from __future__ import annotations

import pyspark.sql.functions as F

from vena_etl_tool_spark.catalog import load_table
from vena_etl_tool_spark.pipeline.audit import audit_frame_writer


def test_jsonl_sink_and_scan_roundtrip(spark, tmp_path):
    """A13 analog end-to-end: distributed JSONL append then spark.read.json
    scan-back with the same records."""
    path = str(tmp_path / "audit")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 5).alias("bucket"), F.lit("load").alias("op")
    )
    audit_frame_writer(df, path)
    audit_frame_writer(df.limit(10), path)  # append mode: second batch adds rows
    back = spark.read.json(path)
    assert back.count() == 110
    assert set(back.columns) == {"id", "bucket", "op", "timestamp"}
    assert back.filter(F.col("timestamp").isNull()).count() == 0


def test_csv_roundtrip_typed(spark, tmp_path, sf_dir):
    """CSV sink then typed scan-back preserves values (ISO timestamps)."""
    li = load_table(spark, sf_dir, "lineitem").limit(100).select(
        "l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"
    )
    path = str(tmp_path / "csv_out")
    li.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .schema("l_orderkey long, l_quantity double, l_returnflag string, l_shipdate timestamp_ntz")
        .csv(path)
    )
    assert back.count() == 100
    orig = {(r.l_orderkey, r.l_shipdate) for r in li.collect()}
    assert {(r.l_orderkey, r.l_shipdate) for r in back.collect()} == orig


def test_parquet_sink_partitioned(spark, tmp_path, sf_dir):
    """Partitioned parquet write (the 100 TB layout: partition by date-ish
    key) and partition-pruned read-back."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("order_year").parquet(path)
    back = spark.read.parquet(path)
    one_year = back.filter(F.col("order_year") == 1996)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert one_year.count() == orders.filter(F.year("o_orderdate") == 1996).count()
    # partition pruning visible in the scan (no full-table read)
    assert "order_year" not in plan.split("ReadSchema")[1][:200]


def test_in_memory_source(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string")
    assert df.filter(F.col("tag") == "b").first().id == 2
