"""Privacy / anonymization operators (r10): k-anonymity auditing and
enforcement over quasi-identifier combinations.

Reference parity note: the reference tool (a Node.js upload client,
/root/reference/src/) has no privacy surface; this module extends the
SURVEY.md §2 B.11 LLM-pipeline family with the release-gating audits a
training-data pipeline runs before publishing derived tables: k-anonymity
(Sweeney 2002) measured exactly, and the standard local-generalization
ladder that coarsens or suppresses quasi-identifier groups until every
published row is k-anonymous.

Everything is integer/count arithmetic, so both operators hash-check
against DuckDB end to end — the audit of an anonymization policy is
itself under the differential gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register

K_ANON = 5  # the k in k-anonymity: publishable group size threshold
ACCTBAL_BUCKET = 1000  # quasi-identifier coarsening width (currency units)

# Quasi-identifier ladder, most specific first. Level 0 is the full QI
# tuple; each later level drops the most identifying column; level 2 is
# the last generalization before suppression.
_QI_LEVELS: tuple[tuple[str, ...], ...] = (
    ("c_nationkey", "c_mktsegment", "bal_bucket"),
    ("c_nationkey", "c_mktsegment"),
    ("c_mktsegment",),
)


def _with_bucket(df: DataFrame) -> DataFrame:
    # floor division keeps negatives in their own buckets (-1 for
    # [-1000, 0)), matching SQL's floor(x / w) on both engines
    return df.withColumn(
        "bal_bucket",
        F.floor(F.col("c_acctbal").cast("decimal(18,2)") / ACCTBAL_BUCKET).cast(
            "long"
        ),
    )


_K_BANDS_SQL = f"""
CASE WHEN k = 1 THEN '1'
     WHEN k < {K_ANON} THEN '2-{K_ANON - 1}'
     WHEN k < 20 THEN '{K_ANON}-19'
     ELSE '20+' END
"""


@register(
    "privacy_k_anonymity",
    tags=("privacy", "profiling", "aggregate"),
    oracle=f"""
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(CAST(c_acctbal AS DECIMAL(18,2)) / {ACCTBAL_BUCKET})
              AS BIGINT) AS bal_bucket
  FROM customer
), groups AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket, COUNT(*) AS k
  FROM qi GROUP BY 1, 2, 3
)
SELECT {_K_BANDS_SQL} AS k_band,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       CAST({_K_BANDS_SQL} IN ('1', '2-{K_ANON - 1}') AS INT) AS violates_k
FROM groups
GROUP BY 1
""",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer quasi-identifier tuple
    (nation, market segment, account-balance bucket): group sizes k
    binned into re-identification risk bands — singletons (k=1, directly
    re-identifiable), sub-threshold (k < K_ANON), and publishable bands —
    with group counts, row mass, and min/max k per band. The measurement
    a privacy review runs before releasing a derived table; the row mass
    in violating bands is exactly the suppression cost of the naive
    "drop violating groups" policy.

    Scale: one hash aggregate at QI grain (map-side combined) + one
    band-grain re-aggregate. QI cardinality ≪ rows by construction (it
    is the whole point of the audit), so the second stage is config-
    sized. Survives any row count."""
    qi = _with_bucket(load_table(spark, sf_dir, "customer"))
    groups = qi.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("k")
    )
    band = F.expr(_K_BANDS_SQL)
    return groups.groupBy(band.alias("k_band")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("k").cast("long").alias("n_rows"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.max(band.isin("1", f"2-{K_ANON - 1}").cast("int")).alias("violates_k"),
    )


@register(
    "privacy_k_generalize",
    tags=("privacy", "profiling", "aggregate"),
    oracle=f"""
WITH qi AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(floor(CAST(c_acctbal AS DECIMAL(18,2)) / {ACCTBAL_BUCKET})
              AS BIGINT) AS bal_bucket
  FROM customer
), l0 AS (
  SELECT qi.*, COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment,
                              bal_bucket) AS k0
  FROM qi
), l1 AS (
  SELECT l0.*, COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS k1
  FROM l0 WHERE k0 < {K_ANON}
), l2 AS (
  SELECT l1.*, COUNT(*) OVER (PARTITION BY c_mktsegment) AS k2
  FROM l1 WHERE k1 < {K_ANON}
), leveled AS (
  SELECT 0 AS level, c_custkey, k0 AS k FROM l0 WHERE k0 >= {K_ANON}
  UNION ALL
  SELECT 1, c_custkey, k1 FROM l1 WHERE k1 >= {K_ANON}
  UNION ALL
  SELECT 2, c_custkey, k2 FROM l2 WHERE k2 >= {K_ANON}
  UNION ALL
  SELECT 3, c_custkey, NULL FROM l2 WHERE k2 < {K_ANON}
)
SELECT CAST(level AS INT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(MIN(k), 0) AS BIGINT) AS min_k_published
FROM leveled GROUP BY 1
""",
)
def privacy_k_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-generalization enforcement of k-anonymity: rows publish at
    the MOST SPECIFIC quasi-identifier level whose group already holds
    ≥ K_ANON members — level 0 = (nation, segment, balance bucket),
    level 1 drops the bucket, level 2 keeps only the segment, level 3 =
    suppressed (even the segment group of the survivors is too small).
    Output per level: published rows and the minimum published group
    size — which the invariant test pins at ≥ K_ANON for levels 0-2,
    the definition of the guarantee.

    Note the subtlety the ladder preserves (and the oracle mirrors):
    the level-1 k counts only rows that FAILED level 0 — the standard
    local-recoding semantics where already-published rows don't
    re-enter coarser groups.

    Scale: three window counts over progressively coarser keys, each a
    single hash exchange at that key's grain, applied to a shrinking
    remainder (only sub-threshold rows descend the ladder). No
    cross-row data movement beyond the QI-grain exchanges."""
    qi = _with_bucket(load_table(spark, sf_dir, "customer")).select(
        "c_custkey", "c_nationkey", "c_mktsegment", "bal_bucket"
    )
    from pyspark.sql import Window

    w0 = Window.partitionBy("c_nationkey", "c_mktsegment", "bal_bucket")
    w1 = Window.partitionBy("c_nationkey", "c_mktsegment")
    w2 = Window.partitionBy("c_mktsegment")
    l0 = qi.withColumn("k0", F.count(F.lit(1)).over(w0))
    pub0 = l0.filter(F.col("k0") >= K_ANON).select(
        F.lit(0).alias("level"), "c_custkey", F.col("k0").alias("k")
    )
    r0 = l0.filter(F.col("k0") < K_ANON)
    l1 = r0.withColumn("k1", F.count(F.lit(1)).over(w1))
    pub1 = l1.filter(F.col("k1") >= K_ANON).select(
        F.lit(1).alias("level"), "c_custkey", F.col("k1").alias("k")
    )
    r1 = l1.filter(F.col("k1") < K_ANON)
    l2 = r1.withColumn("k2", F.count(F.lit(1)).over(w2))
    pub2 = l2.filter(F.col("k2") >= K_ANON).select(
        F.lit(2).alias("level"), "c_custkey", F.col("k2").alias("k")
    )
    supp = l2.filter(F.col("k2") < K_ANON).select(
        F.lit(3).alias("level"), "c_custkey", F.lit(None).cast("long").alias("k")
    )
    leveled = pub0.unionByName(pub1).unionByName(pub2).unionByName(supp)
    return leveled.groupBy(F.col("level").cast("int").alias("level")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.min("k"), F.lit(0)).cast("long").alias("min_k_published"),
    )


L_DIVERSITY = 3  # distinct-sensitive-values threshold per published group


@register(
    "privacy_l_diversity",
    tags=("privacy", "profiling", "aggregate"),
    oracle=f"""
WITH qi AS (
  SELECT c_nationkey,
         CAST(floor(CAST(c_acctbal AS DECIMAL(18,2)) / {ACCTBAL_BUCKET})
              AS BIGINT) AS bal_bucket,
         c_mktsegment AS sensitive
  FROM customer
), groups AS (
  SELECT c_nationkey, bal_bucket,
         SUM(cnt) AS k,
         COUNT(*) AS l,
         CAST(MAX(cnt) AS BIGINT) AS majority_n
  FROM (
    SELECT c_nationkey, bal_bucket, sensitive, COUNT(*) AS cnt
    FROM qi GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
)
SELECT CAST(l AS BIGINT) AS l_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN majority_n * 1000 > k * 900 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_skewed_groups,
       CAST(l < {L_DIVERSITY} AS INT) AS violates_l
FROM groups
GROUP BY l
""",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the attack
    k-anonymity misses: a group can hold k ≥ K rows yet leak the
    sensitive attribute when all members SHARE its value (homogeneity
    attack). Over the (nation, balance-bucket) quasi-identifier with
    market segment as the sensitive attribute: per distinct-sensitive
    count l, the group count, row mass, how many groups are
    90%-majority-skewed (the probabilistic-inference risk even when
    l ≥ threshold), and the violates_l verdict. Published tables need
    BOTH audits green; this one composes with privacy_k_generalize's
    ladder unchanged (coarsen until l ≥ L too).

    Scale: one (QI, sensitive)-grain aggregate, one QI-grain
    re-aggregate, one l-grain rollup — each map-side combinable, each
    strictly coarser. Survives any row count."""
    qi = _with_bucket(load_table(spark, sf_dir, "customer")).select(
        "c_nationkey", "bal_bucket", F.col("c_mktsegment").alias("sensitive")
    )
    cell = qi.groupBy("c_nationkey", "bal_bucket", "sensitive").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    groups = cell.groupBy("c_nationkey", "bal_bucket").agg(
        F.sum("cnt").alias("k"),
        F.count(F.lit(1)).alias("l"),
        F.max("cnt").cast("long").alias("majority_n"),
    )
    return groups.groupBy(F.col("l").cast("long").alias("l_distinct")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("k").cast("long").alias("n_rows"),
        F.sum((F.col("majority_n") * 1000 > F.col("k") * 900).cast("int"))
        .cast("long")
        .alias("n_skewed_groups"),
        F.max((F.col("l") < L_DIVERSITY).cast("int")).alias("violates_l"),
    )


T_CLOSENESS_MILLI = 200  # t = 0.2: max EMD between group and global sensitive dist


@register(
    "privacy_t_closeness",
    tags=("privacy", "profiling", "aggregate", "window"),
    oracle=f"""
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(CAST(c_acctbal AS DECIMAL(18,2)) / {ACCTBAL_BUCKET})
              AS BIGINT) AS sens
  FROM customer
), dom AS (
  SELECT sens, ROW_NUMBER() OVER (ORDER BY sens) AS pos,
         COUNT(*) OVER () AS m
  FROM (SELECT DISTINCT sens FROM qi)
), gdist AS (
  SELECT sens, COUNT(*) AS g_cnt FROM qi GROUP BY 1
), tot AS (SELECT COUNT(*) AS n FROM qi),
grp AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS k
  FROM qi GROUP BY 1, 2
), cell AS (
  SELECT c_nationkey, c_mktsegment, sens, COUNT(*) AS cnt
  FROM qi GROUP BY 1, 2, 3
), grid AS (
  SELECT grp.c_nationkey, grp.c_mktsegment, grp.k, dom.sens, dom.pos, dom.m,
         gdist.g_cnt, tot.n, COALESCE(cell.cnt, 0) AS cnt
  FROM grp CROSS JOIN dom
  JOIN gdist ON gdist.sens = dom.sens
  CROSS JOIN tot
  LEFT JOIN cell ON cell.c_nationkey = grp.c_nationkey
                AND cell.c_mktsegment = grp.c_mktsegment
                AND cell.sens = dom.sens
), cums AS (
  SELECT c_nationkey, c_mktsegment, k, m, n,
         ABS(SUM(cnt * n - g_cnt * k)
             OVER (PARTITION BY c_nationkey, c_mktsegment
                   ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS d
  FROM grid
)
SELECT c_nationkey, c_mktsegment,
       CAST(k AS BIGINT) AS k,
       CAST(CASE WHEN m <= 1 THEN 0
                 ELSE SUM(d) * 1000 // (k * n * (m - 1)) END AS BIGINT)
         AS emd_milli,
       CAST(CASE WHEN m <= 1 THEN 0
                 ELSE SUM(d) * 1000 // (k * n * (m - 1)) END
            > {T_CLOSENESS_MILLI} AS INT) AS violates_t
FROM cums
GROUP BY c_nationkey, c_mktsegment, k, m, n
""",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the attack
    l-diversity misses: a group can hold l distinct sensitive values yet
    leak information when its DISTRIBUTION over them diverges from the
    table-wide one (skewness attack). Sensitive attribute = the ordered
    account-balance bucket; per (nation, segment) quasi-identifier
    group, the exact Earth Mover's Distance to the global distribution
    under the standard ordered-domain ground distance:
    EMD = sum_i |cumP_i - cumQ_i| / (m-1).

    Everything stays INTEGER: per ordered bucket the scaled cumulative
    difference cum(cnt_g * N - cnt_global * k) is exact, so
    emd_milli = floor(1000 * sum|cum| / (k * N * (m-1))) hash-matches
    the oracle with no float drift. violates_t flags EMD > t = 0.2.

    Scale: two hash aggregates (QI-grain, (QI, sensitive)-grain), a
    broadcast of the sensitive DOMAIN (m buckets — tiny by definition:
    it is the published attribute's codomain), one window cumsum at
    QI-grain partitioning. The grid is |QI groups| x m, both audit-sized;
    nothing row-scale shuffles twice."""
    from pyspark.sql import Window

    qi = _with_bucket(load_table(spark, sf_dir, "customer")).select(
        "c_nationkey", "c_mktsegment", F.col("bal_bucket").alias("sens")
    )
    dom = (
        qi.select("sens")
        .distinct()
        .withColumn("pos", F.row_number().over(Window.orderBy("sens")))
        .withColumn("m", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    glob = qi.groupBy("sens").agg(F.count(F.lit(1)).alias("g_cnt"))
    n_total = qi.groupBy().agg(F.count(F.lit(1)).alias("n"))
    grp = qi.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("k")
    )
    cell = qi.groupBy("c_nationkey", "c_mktsegment", "sens").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    grid = (
        grp.crossJoin(F.broadcast(dom.join(glob, "sens")))
        .crossJoin(F.broadcast(n_total))
        .join(cell, ["c_nationkey", "c_mktsegment", "sens"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
    )
    wc = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = grid.withColumn(
        "d",
        F.abs(F.sum(F.col("cnt") * F.col("n") - F.col("g_cnt") * F.col("k")).over(wc)),
    )
    emd = F.when(F.col("m") <= 1, F.lit(0)).otherwise(
        F.expr("sum(d) * 1000 div (k * n * (m - 1))")
    )
    return (
        cums.groupBy("c_nationkey", "c_mktsegment", "k", "m", "n")
        .agg(F.sum("d").alias("sum_d"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("k").cast("long").alias("k"),
            F.when(F.col("m") <= 1, F.lit(0))
            .otherwise(F.expr("sum_d * 1000 div (k * n * (m - 1))"))
            .cast("long")
            .alias("emd_milli"),
            (
                F.when(F.col("m") <= 1, F.lit(0)).otherwise(
                    F.expr("sum_d * 1000 div (k * n * (m - 1))")
                )
                > T_CLOSENESS_MILLI
            )
            .cast("int")
            .alias("violates_t"),
        )
    )
