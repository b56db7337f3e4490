"""Embedding-compression evaluation operators (SURVEY.md §B.11 family).

Two production techniques a 100 TB embedding pipeline uses to cut ANN
serving cost, each evaluated against exact top-k truth the way the
IVF/PQ recall evals are:

- binary (1-bit) quantization: 64 float dims → a 64-bit sign signature
  (stored as two 32-bit halves in a BIGINT each); candidates ranked by
  hamming distance, then rescored with the exact cosine — the standard
  binary-quantize + rerank topology (32× smaller vectors, XOR+popcount
  candidate scan).
- Matryoshka (MRL) truncation: score with only the first D dims of the
  embedding (Kusupati et al. 2022 trained nested representations; here
  the truncation mechanics + recall audit on the fixture vectors).

Both stay on the scaled-integer dot-product convention
(similarity.dot_exact) so every ranking is bit-identical in DuckDB.

Scale: signatures/truncations are map-only projections of the corpus;
the candidate scans broadcast the ≤N_QUERIES query rows against the
partitioned corpus (never corpus×corpus); hamming is two XOR+popcounts
per pair. At real scale the signature column is the serving index —
8 bytes/vector — and the rerank touches only BQ_RERANK candidates/query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..registry import register
from ._shared import spread_small
from .similarity import N_QUERIES, TOP_K, dot_exact, with_sq_norm

BQ_RERANK = 50  # hamming candidates kept per query for exact rescoring
MRL_DIMS = (16, 32)  # truncation prefixes audited against the full 64


def _sig_half_spark(lo_bit: int) -> F.Column:
    """Pack sign bits lo_bit..lo_bit+31 of the embedding into a BIGINT."""
    # every term is an explicit LONG literal so the whole add chain is
    # structurally 64-bit: bit 31's literal (2^31) only happens to
    # materialize as LongType via F.lit's Python-int inference, and bits
    # 0..30 alone already sum to INT_MAX — don't ride either boundary
    # on inference (r9 ADVICE: make the invariant structural)
    terms = [
        F.when(
            F.col("embedding")[d] > 0.0, F.lit(1 << (d - lo_bit)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        for d in range(lo_bit, lo_bit + 32)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _sig_half_duck(lo_bit: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN embedding[{d + 1}] > 0.0 THEN {1 << (d - lo_bit)} ELSE 0 END)"
        for d in range(lo_bit, lo_bit + 32)
    )
    return f"CAST({terms} AS BIGINT)"


_DOT_DUCK = (
    "(SELECT CAST(SUM(CAST(FLOOR(CAST(struct_extract(p, 1) AS DOUBLE)"
    " * CAST(struct_extract(p, 2) AS DOUBLE) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12"
    " FROM UNNEST(list_zip({l}, {r})) AS t(p))"
)


def _bq_recall_oracle() -> str:
    from ..registry import REGISTRY

    exact_sql = REGISTRY["sim_cosine_topk"].oracle
    dot = _DOT_DUCK.format(l="q.embedding", r="c.embedding")
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding,
         (SELECT CAST(SUM(CAST(FLOOR(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12
          FROM UNNEST(embedding) AS u(x)) AS sq_norm,
         {_sig_half_duck(0)} AS sig_lo,
         {_sig_half_duck(32)} AS sig_hi
  FROM embeddings
), cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         bit_count(xor(q.sig_lo, c.sig_lo))
           + bit_count(xor(q.sig_hi, c.sig_hi)) AS hamming,
         {dot} / (SQRT(q.sq_norm) * SQRT(c.sq_norm)) AS cosine
  FROM sigs q JOIN sigs c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
), hranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY hamming, neighbor_id) AS hrk
  FROM cand
), bq AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rk
    FROM hranked WHERE hrk <= {BQ_RERANK}
  ) WHERE rk <= {TOP_K}
), exact_k AS (
  SELECT query_id, neighbor_id FROM ({exact_sql})
)
SELECT e.query_id, COUNT(b.neighbor_id) AS hits,
       CAST(COUNT(b.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
FROM exact_k e
LEFT JOIN bq b ON b.query_id = e.query_id AND b.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@register(
    "embedding_binary_quantize_recall",
    tags=("llm", "similarity", "quantization", "eval"),
    oracle=_bq_recall_oracle(),
)
def embedding_binary_quantize_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit (sign) quantization + hamming candidate scan + exact rerank,
    audited as recall@k against the exact cosine top-k per query.

    Pipeline: pack each vector's 64 sign bits into two BIGINT halves
    (map-only, codegen'd CASE sums); broadcast the query signatures
    against the corpus; rank candidates by XOR+popcount hamming (ties by
    neighbor_id); rescore the BQ_RERANK survivors with the exact
    scaled-integer cosine; compare the reranked top-k to the brute-force
    truth. recall_at_k lands on exact multiples of 1/TOP_K — hash-safe.

    Scale: the signature build is one scan; serving stores 8 B/vector
    (32× compression) and the candidate scan is two XORs + popcounts per
    pair — the cheapest possible first-stage filter. The rerank touches
    BQ_RERANK vectors per query. Nothing here is corpus × corpus; the
    query side is broadcast (N_QUERIES rows)."""
    from .similarity import sim_cosine_topk

    emb = with_sq_norm(spread_small(load_table(spark, sf_dir, "embeddings")))
    sigs = emb.select(
        "vec_id",
        "embedding",
        "sq_norm",
        _sig_half_spark(0).alias("sig_lo"),
        _sig_half_spark(32).alias("sig_hi"),
    )
    queries = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("sq_norm").alias("q_sq"),
        F.col("sig_lo").alias("q_lo"),
        F.col("sig_hi").alias("q_hi"),
    )
    corpus = sigs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("sq_norm").alias("c_sq"),
        F.col("sig_lo").alias("c_lo"),
        F.col("sig_hi").alias("c_hi"),
    )
    hamming = F.bit_count(F.col("q_lo").bitwiseXOR(F.col("c_lo"))) + F.bit_count(
        F.col("q_hi").bitwiseXOR(F.col("c_hi"))
    )
    cand = corpus.join(
        F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
    ).withColumn("hamming", hamming)
    hw = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    shortlist = cand.withColumn("hrk", F.row_number().over(hw)).filter(
        F.col("hrk") <= BQ_RERANK
    )
    rescored = shortlist.withColumn(
        "cosine",
        dot_exact(F.col("q_emb"), F.col("c_emb")) / (F.sqrt("q_sq") * F.sqrt("c_sq")),
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    bq = (
        rescored.withColumn("rk", F.row_number().over(rw))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    )
    exact_k = sim_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    return (
        exact_k.join(bq, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("_hit").alias("hits"),
            (F.count("_hit").cast("double") / TOP_K).alias("recall_at_k"),
        )
    )


def _mrl_recall_oracle() -> str:
    from ..registry import REGISTRY

    exact_sql = REGISTRY["sim_cosine_topk"].oracle
    branches = []
    for d in MRL_DIMS:
        dot = _DOT_DUCK.format(
            l=f"q.embedding[1:{d}]", r=f"c.embedding[1:{d}]"
        )
        nrm = (
            "(SELECT CAST(SUM(CAST(FLOOR(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE)"
            " * 1e12) AS BIGINT)) AS DOUBLE) / 1e12"
            f" FROM UNNEST({{v}}.embedding[1:{d}]) AS u(x))"
        )
        branches.append(f"""
  SELECT {d} AS trunc_dims, query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {dot} / (SQRT({nrm.format(v="q")}) * SQRT({nrm.format(v="c")})) DESC,
                      c.vec_id) AS rk
    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE rk <= {TOP_K}""")
    union = "\n  UNION ALL\n".join(branches)
    return f"""
WITH trunc_k AS (
{union}
), exact_k AS (
  SELECT query_id, neighbor_id FROM ({exact_sql})
), dims AS (SELECT DISTINCT trunc_dims FROM trunc_k)
SELECT d.trunc_dims, e.query_id, COUNT(t.neighbor_id) AS hits,
       CAST(COUNT(t.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
FROM exact_k e
CROSS JOIN dims d
LEFT JOIN trunc_k t
  ON t.trunc_dims = d.trunc_dims AND t.query_id = e.query_id
 AND t.neighbor_id = e.neighbor_id
GROUP BY d.trunc_dims, e.query_id
"""


@register(
    "embedding_mrl_truncate_recall",
    tags=("llm", "similarity", "quantization", "eval"),
    oracle=_mrl_recall_oracle(),
)
def embedding_mrl_truncate_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: rank by cosine over only the
    first D dims (D ∈ MRL_DIMS) and measure recall@k against the full
    64-dim truth, per (D, query). The production decision this feeds:
    how many prefix dims the serving index can drop to while keeping
    acceptable recall (4×/2× index shrink for D=16/32).

    Scale: each truncation is a map-only slice of the corpus followed by
    the same broadcast-queries-vs-partitioned-corpus scan as the exact
    baseline — D× cheaper per pair; at deployment the prefix slice is
    the stored index, not a runtime projection."""
    from .similarity import sim_cosine_topk

    emb = spread_small(load_table(spark, sf_dir, "embeddings"))
    per_dim = []
    for d in MRL_DIMS:
        t = emb.select(
            "vec_id", F.slice("embedding", 1, d).alias("temb")
        ).withColumn("tsq", dot_exact(F.col("temb"), F.col("temb")))
        queries = t.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("temb").alias("q_emb"),
            F.col("tsq").alias("q_sq"),
        )
        corpus = t.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("temb").alias("c_emb"),
            F.col("tsq").alias("c_sq"),
        )
        scored = corpus.join(
            F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
        ).withColumn(
            "cosine",
            dot_exact(F.col("q_emb"), F.col("c_emb"))
            / (F.sqrt("q_sq") * F.sqrt("c_sq")),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        per_dim.append(
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select(
                F.lit(d).alias("trunc_dims"),
                "query_id",
                "neighbor_id",
                F.lit(1).alias("_hit"),
            )
        )
    trunc_k = per_dim[0]
    for extra in per_dim[1:]:
        trunc_k = trunc_k.unionByName(extra)
    exact_k = sim_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    dims = trunc_k.select("trunc_dims").distinct()
    return (
        exact_k.crossJoin(F.broadcast(dims))
        .join(trunc_k, ["trunc_dims", "query_id", "neighbor_id"], "left")
        .groupBy("trunc_dims", "query_id")
        .agg(
            F.count("_hit").alias("hits"),
            (F.count("_hit").cast("double") / TOP_K).alias("recall_at_k"),
        )
    )
