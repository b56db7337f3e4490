"""pyspark.ml LSH variants (SURVEY.md §B.11 names these as the ml-based
implementation strategy): MinHashLSH over token sets and
BucketedRandomProjectionLSH over embeddings.

The pure-SQL LSH pipelines in dedup.py / similarity.py are the preferred
scale path (no ML fitting step, plain shuffles); these exist for API parity
and cross-validation — tests assert the two implementations agree on
planted duplicates. Seeds pinned; results are deterministic but the bucket
hash functions are Spark-internal, so these are rows-only checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register


def ml_minhash_pairs(docs: DataFrame, jaccard_distance: float = 0.5) -> DataFrame:
    """MinHashLSH near-dup pairs over binarized token vectors."""
    toks = docs.select("doc_id", F.split("text", " ").alias("tokens")).filter(
        F.size("tokens") > 0  # MinHashLSH requires ≥1 non-zero feature
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(toks)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, jaccard_distance, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


@register(
    "dedup_ml_minhash",
    tags=("llm", "dedup", "minhash", "ml"),
    oracle=None,  # Spark-internal hash families; cross-validated in tests
)
def dedup_ml_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pyspark.ml MinHashLSH near-dup join (token-set Jaccard distance ≤
    0.5) — the ml-pipeline twin of dedup_minhash_lsh_pairs."""
    return ml_minhash_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "sim_ann_ml_brp",
    tags=("llm", "similarity", "lsh", "ml"),
    oracle=None,  # Spark-internal hash families; sanity-tested vs brute force
)
def sim_ann_ml_brp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH (euclidean) approximate similarity join:
    query vectors (vec_id < 20) against the corpus within distance 12 —
    the ml-pipeline ANN variant."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector("embedding").alias("features")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", numHashTables=4, bucketLength=2.0, seed=42
    )
    model = brp.fit(emb)
    queries = emb.filter(F.col("vec_id") < 20)
    pairs = model.approxSimilarityJoin(queries, emb, 12.0, distCol="eucl_dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.round("eucl_dist", 6).alias("eucl_dist"),
        )
    )
