"""Semi-structured data: arrays, maps, JSON, structs, hashes (§B.8).

`events.props` is a JSON string → ``from_json`` with an explicit schema
(never ``schema_of_json`` per-row at scale). `embeddings.embedding` is
``array<float>`` → higher-order functions (transform/filter/aggregate/
zip_with) keep the math inside codegen, no Python.

Numeric discipline for float arrays: fold with a DECIMAL accumulator so
the aggregate is order-insensitive and exactly reproducible in DuckDB via
``UNNEST`` + decimal SUM (FIXTURES.md discipline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register


@register(
    "json_functions",
    tags=("semistructured", "json"),
    oracle="""
SELECT
  event_id,
  event_type,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
  CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
  json_extract_string(props, '$.missing') AS missing_field
FROM events
WHERE event_type IN ('click', 'purchase')
""",
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parsing of event props: typed from_json + path extraction
    (get_json_object) + absent-key null semantics."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    parsed = ev.withColumn("props_struct", F.from_json("props", "k INT"))
    return parsed.select(
        "event_id",
        "event_type",
        F.col("props_struct.k").alias("k"),
        (F.col("props_struct.k") % 10).alias("k_bucket"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@register(
    "json_functions_extra",
    tags=("semistructured", "json"),
    # Verified cross-engine: Spark to_json and DuckDB to_json(struct_pack)
    # both emit compact `{"k":v}` with identical field order and integer
    # rendering; schema_of_json is a plan constant, mirrored as a literal.
    oracle="""
SELECT event_id,
       to_json(struct_pack(event_type := event_type, user_id := user_id))
         AS as_json,
       json_extract_string(props, '$.k') AS k_str,
       'STRUCT<k: BIGINT>' AS inferred_schema
FROM events WHERE event_id < 50
""",
)
def json_functions_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the JSON family: to_json (struct → string), json_tuple
    (multi-path extraction), schema_of_json on a literal (NEVER per-row at
    scale — one inference, reused as a plan constant)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    inferred = F.schema_of_json(F.lit('{"k": 1}'))
    return ev.select(
        "event_id",
        F.to_json(F.struct(F.col("event_type"), F.col("user_id"))).alias("as_json"),
        F.json_tuple(F.col("props"), "k").alias("k_str"),
        inferred.alias("inferred_schema"),
    )


@register(
    "array_functions",
    tags=("semistructured", "array"),
    oracle="""
SELECT
  doc_id,
  len(string_split(text, ' ')) AS n_words,
  len(list_distinct(string_split(text, ' '))) AS n_unique,
  list_contains(string_split(text, ' '), 'spark') AS has_spark,
  array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3), '-') AS first3_sorted,
  string_split(text, ' ')[1] AS first_word,
  string_split(text, ' ')[-1] AS last_word
FROM documents
""",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over tokenized text: size / distinct / contains /
    sort / slice / element_at (1-based, -1 = last)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_unique"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.concat_ws("-", F.slice(F.sort_array(F.array_distinct(words)), 1, 3)).alias(
            "first3_sorted"
        ),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
    )


@register(
    "higher_order_functions",
    tags=("semistructured", "array", "higher-order"),
    oracle="""
SELECT
  e.vec_id,
  e.label,
  (SELECT CAST(SUM(CAST(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE) AS DECIMAL(20,12))) AS DOUBLE)
   FROM UNNEST(e.embedding) AS u(x)) AS sq_norm,
  len(list_filter(e.embedding, x -> x > 0)) AS n_positive,
  len(list_filter(e.embedding, x -> abs(x) > 2.0)) AS n_large,
  CAST(e.embedding[1] AS DOUBLE) * 2.0 AS first_doubled
FROM embeddings e
""",
)
def higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions on embeddings: aggregate (fold with a
    DECIMAL accumulator → order-insensitive exact sum of squares), filter,
    transform. All JVM-side — this is the scale path for embedding math."""
    emb = load_table(spark, sf_dir, "embeddings")
    x2 = lambda x: (x.cast("double") * x.cast("double")).cast("decimal(20,12)")  # noqa: E731
    return emb.select(
        "vec_id",
        "label",
        F.aggregate(
            "embedding",
            F.lit(0).cast("decimal(20,12)"),
            # re-cast: decimal addition widens precision and the fold's
            # lambda must return exactly the accumulator type
            lambda acc, x: (acc + x2(x)).cast("decimal(20,12)"),
        )
        .cast("double")
        .alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.size(F.filter("embedding", lambda x: F.abs(x) > 2.0)).alias("n_large"),
        (F.element_at("embedding", 1).cast("double") * 2.0).alias("first_doubled"),
    )


@register(
    "explode_functions",
    tags=("semistructured", "array"),
    oracle="""
SELECT vec_id, u.pos AS pos, u.val AS val
FROM (
  SELECT vec_id,
         unnest(list_transform(range(1, len(embedding) + 1),
                               i -> {'pos': i - 1, 'val': embedding[i]})) AS u
  FROM embeddings
  WHERE vec_id < 5
)
""",
)
def explode_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array → (position, value) rows — the row-expansion
    primitive under shingling/frame-sampling. explode_outer semantics
    (null/empty arrays) are unit-tested."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    return emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))


@register(
    "map_functions",
    tags=("semistructured", "map"),
    oracle="""
SELECT user_id, event_type AS k, COUNT(*) AS v
FROM events
GROUP BY user_id, event_type
""",
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction/inspection round-trip: per-user counts →
    map_from_entries → map_keys/map_values validation → explode back to
    rows (the map itself has no canonical order, so the wire format is
    its exploded entries)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    checked = as_map.filter(F.size(F.map_keys("m")) == F.size(F.map_values("m")))
    return checked.select("user_id", F.explode("m").alias("k", "v"))


@register(
    "map_functions_extra",
    tags=("semistructured", "map"),
    # Map iteration order is engine-specific, but this query already
    # flattens every map to sorted scalars — so the oracle rebuilds the
    # same sorted views directly. `value` rides a DECIMAL(18,2)→string
    # bridge on both sides (double→string rendering differs between
    # engines; fixed-point rendering does not).
    oracle="""
SELECT event_id,
       'type,val' AS kept_keys,
       array_to_string(list_sort([
         upper(event_type),
         CAST(user_id AS VARCHAR),
         upper(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR))
       ]), ',') AS upped_vals,
       3 AS n_entries
FROM events WHERE event_id < 100
""",
)
def map_functions_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the map family: map_from_arrays, map_concat, map_filter,
    transform_values, map_entries — outputs flattened to sorted arrays so
    the result is deterministic despite map iteration order."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    base = ev.select(
        "event_id",
        F.map_from_arrays(
            F.array(F.lit("type"), F.lit("uid")),
            F.array(F.col("event_type"), F.col("user_id").cast("string")),
        ).alias("m1"),
        # decimal-string bridge: double→string rendering is engine-specific
        # (1.0E-7 vs 1e-07); DECIMAL(18,2)→string is fixed-point in both
        F.create_map(
            F.lit("val"), F.col("value").cast("decimal(18,2)").cast("string")
        ).alias("m2"),
    )
    combined = base.select(
        "event_id",
        F.map_concat("m1", "m2").alias("m"),
    )
    shaped = combined.select(
        "event_id",
        F.map_filter("m", lambda k, v: k != "uid").alias("kept"),
        F.transform_values("m", lambda k, v: F.upper(v)).alias("upped"),
    )
    return shaped.select(
        "event_id",
        F.concat_ws(",", F.sort_array(F.map_keys("kept"))).alias("kept_keys"),
        F.concat_ws(",", F.sort_array(F.map_values("upped"))).alias("upped_vals"),
        F.size(F.map_entries("upped")).alias("n_entries"),
    )


@register(
    "struct_functions",
    tags=("semistructured", "struct"),
    oracle="""
SELECT
  o_orderkey,
  o_custkey AS cust,
  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
  year(o_orderdate) AS yr
FROM orders
WHERE o_orderstatus = 'O'
""",
)
def struct_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct pack → dot-path access → inline back to flat columns."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("cust"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price"),
            F.year("o_orderdate").alias("yr"),
        ).alias("info"),
    )
    return nested.select(
        "o_orderkey",
        F.col("info.cust").alias("cust"),
        F.col("info.price").alias("price"),
        F.col("info.yr").alias("yr"),
    )


@register(
    "hash_functions",
    tags=("semistructured", "hash"),
    oracle="""
SELECT
  doc_id,
  md5(text) AS text_md5,
  sha256(text) AS text_sha256,
  length(text) AS text_len
FROM documents
""",
)
def hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests (cross-engine standard). xxhash64/crc32 are
    Spark-specific and exercised in hash_functions_extra + dedup ops."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.length("text").alias("text_len"),
    )


@register(
    "hash_functions_extra",
    tags=("semistructured", "hash"),
    oracle=None,  # xxhash64/crc32 have no DuckDB twin; determinism unit-tested
)
def hash_functions_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hashes: xxhash64 (the engine's partitioning/dedup
    workhorse — JVM-side, seed-stable), crc32, murmur3 `hash`."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.xxhash64("text").alias("text_xxh64"),
        F.crc32("text").alias("text_crc32"),
        F.hash("text").alias("text_murmur3"),
        F.spark_partition_id().alias("pid"),
    )
