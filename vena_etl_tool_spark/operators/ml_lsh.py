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


@register(
    "sim_ann_ivf_kmeans",
    tags=("llm", "similarity", "ivf", "ml"),
    oracle=None,  # trained codebook: deterministic per seed but float-sum
    # merge order makes cross-engine replication impractical; the exact
    # fixed-codebook twin (sim_ann_ivf) is the hash-checked variant
)
def sim_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a *trained* k-means codebook — the production form of
    `sim_ann_ivf` (which uses fixed centroids so it can be oracle-checked).
    At 100 TB: fit KMeans on a small sample (driver-side iterations over a
    few MB of sampled vectors), then the scoring/probing is the same
    broadcast-codebook map-only assignment + centroid equi-join.

    Output: per query (vec_id < 20), top-5 candidates from the 2 probed
    cells by exact cosine."""
    from pyspark.ml.clustering import KMeans
    from pyspark.sql import Window

    from .similarity import N_QUERIES, TOP_K, dot_exact, with_sq_norm

    emb = with_sq_norm(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", "embedding",
            array_to_vector("embedding").alias("features"),
        )
    )
    km = KMeans(k=16, seed=42, maxIter=5, featuresCol="features", predictionCol="cent")
    # fit on a sample: at corpus scale the sample is tiny relative to the
    # data; locally the corpus IS sample-sized so fit on it directly
    model = km.fit(emb.select("features"))
    corpus = model.transform(emb).drop("features")
    q_probe = model.transform(
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("sq_norm").alias("q_sq"),
            "features",
        )
    ).withColumnRenamed("cent", "p_cent").drop("features")
    # nprobe=2: second probe from the model's centers via a tiny cross join
    # of queries × centers scored in numpy on the driver would leave Spark;
    # instead reuse the ml API's cluster assignment for probe 1 and the
    # nearest *other* center by exact distance for probe 2, computed with a
    # broadcast of the 16 centers as literal arrays (JVM-side).
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    center_arr = F.array(*[F.array(*[F.lit(v) for v in c]) for c in centers])
    dists = (
        "transform(_cents, c -> aggregate(zip_with(c, q_emb,"
        " (a, b) -> (a - CAST(b AS DOUBLE)) * (a - CAST(b AS DOUBLE))),"
        " 0.0D, (acc, v) -> acc + v))"
    )
    masked = (
        "transform(sequence(0, size(_d) - 1),"
        " i -> CASE WHEN i = p_cent THEN CAST('Infinity' AS DOUBLE)"
        " ELSE element_at(_d, i + 1) END)"
    )
    with_d = (
        q_probe.withColumn("_cents", center_arr)
        .withColumn("_d", F.expr(dists))
        .withColumn("_dm", F.expr(masked))
        .withColumn("second", F.expr("array_position(_dm, array_min(_dm)) - 1"))
    )
    probes = with_d.select(
        "query_id", "q_emb", "q_sq",
        F.explode(
            F.array(F.col("p_cent").cast("int"), F.col("second").cast("int"))
        ).alias("p_cent"),
    )
    cand = corpus.join(
        F.broadcast(probes.withColumn("_c", F.col("p_cent")).drop("p_cent")),
        (F.col("cent") == F.col("_c")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.withColumn(
        "cosine_raw",
        dot_exact(F.col("q_emb"), F.col("embedding"))
        / (F.sqrt("q_sq") * F.sqrt("sq_norm")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine_raw", 6).alias("cosine"),
            "rk",
        )
    )
