"""Similarity search over embeddings (SURVEY.md §B.11).

Two tiers, as the mandate requires:
- brute-force cosine top-k — the exact baseline; one broadcast of the
  (small) query set against the full corpus, decimal-exact math so the
  DuckDB oracle matches bit-for-bit;
- random-hyperplane LSH buckets — the scale path: candidates come from an
  equi-join on (band, bucket) instead of a cross product, then exact
  re-scoring. Recall vs brute force is unit-tested.

At 100 TB the corpus side stays partitioned; only queries/hyperplanes are
broadcast, and the bucket join prunes the candidate set to ~corpus/2^bits
per band.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ..catalog import load_table
from ..registry import register
from ._shared import spread_small

TOP_K = 5
N_QUERIES = 20  # vec_id < 20 are the query vectors

# LSH: 4 bands × 12 hyperplanes (deterministic, seed pinned).
LSH_BANDS = 4
LSH_BITS = 12
_PLANES = np.random.default_rng(20240613).normal(
    size=(LSH_BANDS, LSH_BITS, 64)
).astype(np.float64)


def dot_exact(l: Column, r: Column) -> Column:  # noqa: E741
    """Order-insensitive exact dot product of two float arrays.

    Scaled-integer fold: each product is floored at 1e-12 granularity into
    a LONG, so the sum is exact in any order and bit-identical to the
    DuckDB oracle (`SUM(CAST(FLOOR(l*r*1e12) AS BIGINT))/1e12`) — same
    determinism as a DECIMAL fold at ~3.4× less cost (long adds, no
    BigDecimal). Overflow headroom: |term| ≤ ~2.5e13, 64 terms ≪ 2⁶³;
    rescale the 1e12 factor for embeddings with larger magnitudes.
    """
    return (
        F.aggregate(
            F.zip_with(
                l, r,
                lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(1e12)).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(1e12)
    )


def with_sq_norm(emb: DataFrame) -> DataFrame:
    return emb.withColumn("sq_norm", dot_exact(F.col("embedding"), F.col("embedding")))


@register(
    "sim_cosine_topk",
    tags=("llm", "similarity", "topk"),
    oracle=f"""
WITH norms AS (
  SELECT vec_id, label, embedding,
         (SELECT CAST(SUM(CAST(FLOOR(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12
          FROM UNNEST(embedding) AS u(x)) AS sq_norm
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
         (SELECT CAST(SUM(CAST(FLOOR(CAST(struct_extract(p, 1) AS DOUBLE) * CAST(struct_extract(p, 2) AS DOUBLE) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12
          FROM UNNEST(list_zip(q.embedding, c.embedding)) AS t(p))
         / (SQRT(q.sq_norm) * SQRT(c.sq_norm)) AS cosine
  FROM norms q JOIN norms c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id, neighbor_label, ROUND(cosine, 6) AS cosine, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
WHERE rk <= {TOP_K}
""",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k for a query subset: broadcast the
    query vectors against the partitioned corpus, score JVM-side, keep the
    per-query top-k with a window (ties broken by neighbor_id)."""
    emb = with_sq_norm(spread_small(load_table(spark, sf_dir, "embeddings")))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("sq_norm").alias("q_sq"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("c_emb"),
        F.col("sq_norm").alias("c_sq"),
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_raw",
            dot_exact(F.col("q_emb"), F.col("c_emb"))
            / (F.sqrt("q_sq") * F.sqrt("c_sq")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            F.round("cosine_raw", 6).alias("cosine"),
            "rk",
        )
    )


def lsh_bucket_cols() -> list[Column]:
    """One bucket id per band: sign-bit signature against fixed hyperplanes.

    The hyperplane dot products are plain SQL folds — all JVM codegen.
    Planes are literals (broadcast with the plan), seed pinned for
    determinism. Each band is ONE generated-SQL F.expr, not a composed
    Column tree: 48 planes × 64 coefficients via the Column API costs
    tens of thousands of py4j round trips (~seconds of driver time).
    """
    cols = []
    for band in range(LSH_BANDS):
        bits = []
        for bit in range(LSH_BITS):
            plane = _PLANES[band, bit]
            lits = ", ".join(f"{float(v)!r}D" for v in plane)
            proj = (
                f"aggregate(zip_with(embedding, array({lits}),"
                f" (x, p) -> CAST(x AS DOUBLE) * p),"
                f" 0.0D, (acc, v) -> acc + v)"
            )
            bits.append(f"CASE WHEN {proj} > 0 THEN {1 << bit} ELSE 0 END")
        cols.append(F.expr(" + ".join(bits)).alias(f"bucket{band}"))
    return cols


@register(
    "sim_ann_lsh",
    tags=("llm", "similarity", "lsh"),
    oracle=None,  # approximate; recall vs brute force asserted in tests/test_similarity.py
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidate generation
    (equi-join on band buckets) + exact cosine re-scoring of candidates.

    Plan shape at scale: corpus → 4 bucket columns (map-only) → explode to
    (band, bucket) rows → shuffle join with the query buckets → candidate
    set ≪ corpus → exact scoring → per-query top-k window."""
    emb = with_sq_norm(spread_small(load_table(spark, sf_dir, "embeddings")))
    bucketed = emb.select(
        "vec_id", "label", "embedding", "sq_norm", *lsh_bucket_cols()
    )
    bands_arr = F.array(
        *[
            F.struct(F.lit(b).alias("band"), F.col(f"bucket{b}").alias("bucket"))
            for b in range(LSH_BANDS)
        ]
    )
    flat = bucketed.select(
        "vec_id", "label", "embedding", "sq_norm", F.explode(bands_arr).alias("bb")
    ).select(
        "vec_id", "label", "embedding", "sq_norm",
        F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"),
    )
    queries = flat.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("sq_norm").alias("q_sq"),
        "band",
        "bucket",
    )
    cand = (
        flat.join(F.broadcast(queries), ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "q_emb",
            "q_sq",
            F.col("embedding").alias("c_emb"),
            F.col("sq_norm").alias("c_sq"),
        )
        # a pair can collide in several bands; non-key cols are functionally
        # dependent on the pair so subset-dedup is deterministic
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine_raw",
        dot_exact(F.col("q_emb"), F.col("c_emb")) / (F.sqrt("q_sq") * F.sqrt("c_sq")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cosine_raw", 6).alias("cosine"), "rk")
    )
