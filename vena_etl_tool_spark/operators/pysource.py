"""Custom Python DataSource (SURVEY.md §B.1 — the connector seam).

The reference's only "source" is a local CSV handed to an HTTP uploader
(/root/reference/src/utils/fileHandling.js:12-38); a Spark-native engine
additionally needs a way to plug in NEW sources. pyspark 4's Python
DataSource API is that seam: a pure-Python connector that still gets real
partition-parallel scans (each InputPartition reads independently on an
executor — this is how you'd wrap an internal REST/queue/tensor-shard
source without writing a JVM connector).

The demo source generates deterministic synthetic order rows from pure
arithmetic, so the scan is ORACLE-CHECKABLE: DuckDB's `range()` reproduces
the exact rows. The correctness gate therefore verifies real semantics —
partitioning covers [0, n) exactly once with no seams — not just row
counts. At scale the same skeleton holds: `partitions()` returns one split
per upstream shard; Spark schedules them like any other scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..registry import register

SYNTH_ROWS = 10_000
SYNTH_PARTS = 16


class SyntheticOrdersSource(DataSource):
    """Deterministic arithmetic row source: (order_id, bucket, amount)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_orders"

    def schema(self) -> str:
        return "order_id bigint, bucket int, amount double"

    def reader(self, schema) -> "SyntheticOrdersReader":
        return SyntheticOrdersReader(self.options)


class SyntheticOrdersReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("rows", SYNTH_ROWS))
        self.parts = int(options.get("partitions", SYNTH_PARTS))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        # contiguous row ranges per partition: exact cover of [0, n)
        i = partition.value
        lo = self.n * i // self.parts
        hi = self.n * (i + 1) // self.parts
        for k in range(lo, hi):
            yield (k, k % 7, float((k * 37) % 1000) / 10.0)


@register(
    "source_python_datasource",
    tags=("source", "connector"),
    oracle=f"""
SELECT bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST((r.range * 37) % 1000 AS DOUBLE) / 10.0
                AS DECIMAL(18,1))) AS DOUBLE) AS total_amount,
       MIN(r.range) AS first_id,
       MAX(r.range) AS last_id
FROM (SELECT range, CAST(range % 7 AS INTEGER) AS bucket
      FROM range({SYNTH_ROWS}) r) r
GROUP BY bucket
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan through the registered Python DataSource and aggregate — the
    oracle reproduces the generator arithmetic with DuckDB range(), so a
    partitioning bug (gap, overlap, off-by-one at a split seam) becomes a
    hash mismatch, not a silent wrong answer."""
    # register is idempotent per session; re-registering replaces
    spark.dataSource.register(SyntheticOrdersSource)
    df = (
        spark.read.format("synthetic_orders")
        .option("rows", str(SYNTH_ROWS))
        .option("partitions", str(SYNTH_PARTS))
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("amount").cast("decimal(18,1)")).cast("double").alias(
            "total_amount"
        ),
        F.min("order_id").alias("first_id"),
        F.max("order_id").alias("last_id"),
    )


STREAM_TICKS = 10_000
STREAM_STEP = 1_000


class TickStreamSource(DataSource):
    """Custom STREAMING Python source: offset-tracked micro-batches from
    the same arithmetic generator — the streaming half of the connector
    seam (wrap a queue/changefeed/poll-API without a JVM connector).
    ``read(start)`` returns (rows, next_offset); Spark persists the offset
    in the checkpoint, giving replay/exactly-once like any built-in
    source."""

    @classmethod
    def name(cls) -> str:
        return "tick_stream"

    def schema(self) -> str:
        return "tick bigint, val double"

    def simpleStreamReader(self, schema) -> "TickStreamReader":
        return TickStreamReader(self.options)


class TickStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.limit = int(options.get("limit", STREAM_TICKS))
        self.step = int(options.get("step", STREAM_STEP))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + self.step, self.limit)
        rows = [(k, float((k * 13) % 100) / 4.0) for k in range(pos, end)]
        return iter(rows), {"pos": end}


@register(
    "source_python_stream",
    tags=("source", "connector", "streaming"),
    oracle=f"""
SELECT CAST(tick % 8 AS BIGINT) AS shard,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST((r.range * 13) % 100 AS DOUBLE) / 4.0
                AS DECIMAL(18,2))) AS DOUBLE) AS total_val,
       MAX(r.range) AS last_tick
FROM (SELECT range, range AS tick FROM range({STREAM_TICKS}) r) r
GROUP BY tick % 8
""",
)
def source_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream through the custom Python streaming source into a parquet
    sink, RESTARTING the query from its checkpoint until the source is
    drained (each availableNow run advances one offset window, persisted
    in the checkpoint — so this exercises exactly the restart/replay path
    a production incremental ingest relies on). The DuckDB range() oracle
    then verifies every offset window landed exactly once: a skipped or
    double-applied micro-batch changes counts and sums."""
    import os

    from ..streaming.queries import _state_partitions, fresh_stream_workdir

    spark.dataSource.register(TickStreamSource)
    workdir = fresh_stream_workdir("source_python_stream")
    sink_dir = os.path.join(workdir, "sink")
    ckpt_dir = os.path.join(workdir, "ckpt")
    ticks = (
        spark.readStream.format("tick_stream")
        .option("limit", str(STREAM_TICKS))
        .option("step", str(STREAM_STEP))
        .load()
    )
    with _state_partitions(spark):
        for _ in range(STREAM_TICKS // STREAM_STEP + 2):
            q = (
                ticks.writeStream.format("parquet")
                .option("path", sink_dir)
                .option("checkpointLocation", ckpt_dir)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            if sum(int(p["numInputRows"]) for p in q.recentProgress) == 0:
                break  # offset reached the limit: source drained
    landed = spark.read.schema(ticks.schema).parquet(sink_dir)
    return landed.groupBy((F.col("tick") % 8).alias("shard")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("val").cast("decimal(18,2)")).cast("double").alias("total_val"),
        F.max("tick").alias("last_tick"),
    )
