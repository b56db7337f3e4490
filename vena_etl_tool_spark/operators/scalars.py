"""Scalar function surface (SURVEY.md §B.8): string / date / math.

Everything here is a built-in ``pyspark.sql.functions`` expression — pure
whole-stage-codegen projections, zero shuffles, zero Python. Functions whose
DuckDB twin has different semantics (initcap, soundex, months_between,
bround, next_day, format_string padding rules) live in the rows-only
``scalar_functions_extra`` query so the oracle set stays exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register


@register(
    "string_functions",
    tags=("scalar", "string"),
    oracle="""
SELECT
  p_partkey,
  concat_ws('|', p_brand, p_type) AS brand_type,
  upper(p_name) AS name_upper,
  lower(p_brand) AS brand_lower,
  substring(p_name, 1, 4) AS name_prefix,
  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
  rpad(p_brand, 12, '.') AS brand_padded,
  trim(concat('  ', p_type, ' ')) AS type_trimmed,
  regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
  translate(p_type, 'AEO', 'aeo') AS type_translated,
  length(p_name) AS name_len,
  instr(p_name, ' ') AS space_pos,
  levenshtein(p_name, 'red widget') AS dist_to_widget,
  reverse(p_brand) AS brand_rev,
  repeat(p_brand, 2) AS brand_twice,
  replace(p_type, 'ECONOMY', 'ECO') AS type_short,
  left(p_name, 3) AS name_left3,
  right(p_name, 3) AS name_right3,
  contains(p_name, 'red') AS has_red,
  starts_with(p_type, 'SM') AS is_small_type,
  ends_with(p_name, 'bolt') AS is_bolt,
  split_part(p_name, ' ', 1) AS first_word
FROM part
""",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-function family over `part` — one codegen'd projection."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trimmed"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.translate("p_type", "AEO", "aeo").alias("type_translated"),
        F.length("p_name").alias("name_len"),
        F.instr(F.col("p_name"), " ").alias("space_pos"),
        F.levenshtein(F.col("p_name"), F.lit("red widget")).alias("dist_to_widget"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.left(F.col("p_name"), F.lit(3)).alias("name_left3"),
        F.right(F.col("p_name"), F.lit(3)).alias("name_right3"),
        F.contains(F.col("p_name"), F.lit("red")).alias("has_red"),
        F.startswith(F.col("p_type"), F.lit("SM")).alias("is_small_type"),
        F.endswith(F.col("p_name"), F.lit("bolt")).alias("is_bolt"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
    )


@register(
    "date_functions",
    tags=("scalar", "date"),
    oracle="""
SELECT
  o_orderkey,
  year(o_orderdate) AS yr,
  month(o_orderdate) AS mo,
  day(o_orderdate) AS dom,
  quarter(o_orderdate) AS qtr,
  dayofyear(o_orderdate) AS doy,
  weekofyear(o_orderdate) AS iso_week,
  dayofweek(o_orderdate) + 1 AS dow,
  date_trunc('month', o_orderdate) AS month_start,
  date_trunc('year', o_orderdate) AS year_start,
  CAST(CAST(o_orderdate AS DATE) + 7 AS TIMESTAMP) AS ship_by,
  CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3mo,
  CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
  strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
""",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family over `orders`. DuckDB's dayofweek is 0-based
    (Sunday=0) vs Spark's 1-based — the oracle adds 1."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofweek(d).alias("dow"),
        F.date_trunc("month", d).alias("month_start"),
        # DATE-typed outputs are cast to timestamp on both sides: pandas
        # renders engine DATE columns differently (date objects vs ns64).
        F.trunc(d.cast("date"), "year").cast("timestamp_ntz").alias("year_start"),
        F.date_add(d.cast("date"), 7).cast("timestamp_ntz").alias("ship_by"),
        F.add_months(d.cast("date"), 3).cast("timestamp_ntz").alias("plus3mo"),
        F.last_day(d.cast("date")).cast("timestamp_ntz").alias("month_end"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias("days_to_y2k"),
        F.unix_timestamp(d.cast("timestamp")).alias("epoch_s"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@register(
    "math_functions",
    tags=("scalar", "math"),
    oracle="""
SELECT
  l_orderkey, l_linenumber,
  abs(l_discount - 0.05) AS disc_dev,
  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
  round(sqrt(l_quantity), 6) AS qty_sqrt,
  round(pow(l_quantity, 2), 1) AS qty_sq,
  round(exp(l_discount), 6) AS disc_exp,
  round(ln(l_extendedprice), 6) AS price_ln,
  round(log10(l_extendedprice), 6) AS price_log10,
  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
  greatest(l_quantity, l_discount * 100) AS g,
  least(l_quantity, l_discount * 100) AS l,
  ((l_linenumber % 3) + 3) % 3 AS mod3,
  CAST(l_quantity AS INT) // 10 AS qty_decile
FROM lineitem
WHERE l_orderkey % 100 = 0
""",
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family over a deterministic lineitem sample. Transcendental
    outputs are rounded (libm implementations differ in the last ulp)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.pow("l_quantity", F.lit(2)), 1).alias("qty_sq"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("l"),
        F.pmod(F.col("l_linenumber"), F.lit(3)).alias("mod3"),
        (F.col("l_quantity").cast("int") / 10).cast("int").alias("qty_decile"),
    )


# Collapse runs of equal soundex codes ('11' -> '1') one digit at a time:
# RE2 (DuckDB's regex engine) has no backreferences, so seven chained
# regexp_replace calls stand in for '([0-6])\\1+' -> '\\1'.
def _collapse_runs_sql() -> str:
    expr = "{col}"
    for d in "0123456":
        expr = f"regexp_replace({expr}, '{d}+', '{d}', 'g')"
    return expr


_SQL_COLLAPSE_RUNS = _collapse_runs_sql()


@register(
    "scalar_functions_extra",
    tags=("scalar",),
    # Each Spark-flavored scalar is re-derived (not ported) in DuckDB SQL:
    # initcap via a per-word transform, soundex via a closed-form rewrite
    # of the classic automaton (verified against Spark by a hypothesis
    # property test, tests/test_properties.py): map letters to codes with
    # H/W as '-', strip the '-'s (H/W transparency), collapse runs of
    # equal codes (the last-code rule), drop the first letter's own run
    # unless the first letter is H/W, strip vowels' '0's, pad to 3.
    # Deliberately NOT list_reduce: DuckDB 1.0.0 mis-evaluates list_reduce
    # over variable-length lists within a vector batch (row-order-
    # dependent results — found by the property test). Everything here is
    # translate/replace/regexp, which vectorize correctly.
    # bround via round_even, format_string via printf, next_day /
    # months_between on literals via constants.
    oracle=f"""
WITH w AS (
  SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice,
         upper(string_split(p_name, ' ')[1]) AS u
  FROM part
),
sx AS (
  SELECT p_partkey, u,
         translate(u[1], 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                   '0123012-02245501262301-202') AS flc,
         replace(translate(u[2:], 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                           '0123012-02245501262301-202'), '-', '') AS tailc
  FROM w
),
sx2 AS (
  SELECT p_partkey, u, flc,
         {_SQL_COLLAPSE_RUNS.format(col="(CASE WHEN flc = '-' THEN '' ELSE flc END || tailc)")} AS runs
  FROM sx
),
sx3 AS (
  SELECT p_partkey,
         u[1] || substr(
           replace(CASE WHEN flc = '-' THEN runs ELSE runs[2:] END, '0', '')
           || '000', 1, 3) AS sdx
  FROM sx2
)
SELECT w.p_partkey,
       array_to_string(
         list_transform(string_split(lower(p_name), ' '),
                        s -> upper(s[1]) || s[2:]), ' ') AS name_title,
       sx3.sdx AS sdx,
       printf('%s/%s (size %d)', p_brand, p_type, p_size) AS label,
       round_even(p_retailprice, 1) AS price_bankers,
       DATE '2024-01-08' AS next_monday,
       CAST(2.0 AS DOUBLE) AS mb,
       to_json(range(1, p_size % 4 + 2)) AS seq
FROM w JOIN sx3 ON w.p_partkey = sx3.p_partkey
""",
)
def scalar_functions_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-flavored scalars with no exact ANSI/DuckDB twin: initcap,
    soundex, format_string, months_between, bround (HALF_EVEN), next_day,
    sequence, monotonic ids excluded by the no-nondeterminism rule."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("name_title"),
        F.soundex(F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))).alias("sdx"),
        F.format_string("%s/%s (size %d)", "p_brand", "p_type", "p_size").alias("label"),
        F.bround(F.col("p_retailprice"), 1).alias("price_bankers"),
        F.next_day(F.lit("2024-01-01").cast("date"), "Mon").alias("next_monday"),
        F.months_between(
            F.lit("2024-03-15").cast("date"), F.lit("2024-01-15").cast("date")
        ).alias("mb"),
        F.to_json(F.sequence(F.lit(1), F.col("p_size") % 4 + 1)).alias("seq"),
    )


@register(
    "bitwise_functions",
    tags=("scalar", "bitwise"),
    oracle="""
SELECT p_partkey,
       p_partkey & 255                    AS low_byte,
       p_partkey | 4096                   AS with_flag,
       xor(p_partkey, 21845)              AS xored,
       p_partkey << 3                     AS shifted_left,
       p_partkey >> 2                     AS shifted_right,
       CAST(bit_count(p_partkey) AS INT)  AS popcount
FROM part
WHERE p_partkey <= 500
""",
)
def bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family (flag masks, shard extraction, popcount) —
    pure codegen expressions, exact in any engine."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return part.select(
        "p_partkey",
        F.col("p_partkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("p_partkey").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("p_partkey").bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft("p_partkey", 3).alias("shifted_left"),
        F.shiftright("p_partkey", 2).alias("shifted_right"),
        F.bit_count("p_partkey").alias("popcount"),
    )
