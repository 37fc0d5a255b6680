"""Scalar expression & function operators (SURVEY.md §2.B).

Everything here is built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen — except ``q_udf_scalar``, which exists
precisely to prove the Arrow-vectorized pandas_udf path (the sanctioned
escape hatch when built-ins can't express a computation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pgshovel_spark.functions.determinism import dround
from pgshovel_spark.sources.tables import load_table


def q_expr_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / arithmetic over orders."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending"))
        .alias("status_or_pending"),
        dround(F.col("o_totalprice") * 0.9 + 10, 2, in_scale=3).alias("adjusted"),
        (F.col("o_orderkey") % 7).cast("long").alias("bucket"),
    )


_EXPR_CASE_SQL = """
SELECT
  o_orderkey,
  CASE WHEN o_totalprice > 300000 THEN 'big'
       WHEN o_totalprice > 100000 THEN 'mid'
       ELSE 'small' END AS size_class,
  COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_or_pending,
  CAST(ROUND(CAST(o_totalprice * 0.9 + 10 AS DECIMAL(24,3)), 2) AS DOUBLE) AS adjusted,
  CAST(o_orderkey % 7 AS BIGINT) AS bucket
FROM orders
"""


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part (1-indexed substring on both
    engines; split -> first element via getItem/[1])."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
    )


_STRING_FUNCS_SQL = """
SELECT
  p_partkey,
  lower(p_name) AS name_lower,
  upper(p_brand) AS brand_upper,
  substring(p_type, 1, 6) AS type_prefix,
  CAST(length(p_name) AS BIGINT) AS name_len,
  trim('  pad  ') AS trimmed,
  concat_ws('|', p_brand, p_type) AS brand_type,
  replace(p_type, ' ', '_') AS type_snake,
  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
  string_split(p_type, ' ')[1] AS type_first_word,
  regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num
FROM part
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery over orders (timestamps emitted as epoch
    seconds — Appendix A.8)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.unix_timestamp(F.date_trunc("month", "o_orderdate"))
        .cast("long")
        .alias("month_start_s"),
        F.unix_timestamp(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .cast("long")
        .alias("due_s"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2002"),
        F.unix_timestamp("o_orderdate").cast("long").alias("epoch_s"),
    )


_DATE_FUNCS_SQL = """
SELECT
  o_orderkey,
  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
  CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS order_day,
  CAST(FLOOR(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_start_s,
  CAST(FLOOR(epoch(o_orderdate + INTERVAL 30 DAY)) AS BIGINT) AS due_s,
  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
  CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS epoch_s
FROM orders
"""


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery over customer balances (negatives included)."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.round(F.abs(bal), 2).alias("abs_bal"),
        F.round(bal, 0).alias("bal_0dp"),
        F.floor(bal).cast("long").alias("bal_floor"),
        F.ceil(bal).cast("long").alias("bal_ceil"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("sqrt_abs"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("ln_abs1"),
        F.round(F.pow(F.abs(bal), 0.25), 6).alias("pow_q"),
        (F.col("c_custkey") % 13).cast("long").alias("mod13"),
        F.signum(bal).cast("long").alias("bal_sign"),
    )


_MATH_FUNCS_SQL = """
SELECT
  c_custkey,
  ROUND(ABS(c_acctbal), 2) AS abs_bal,
  ROUND(c_acctbal, 0) AS bal_0dp,
  CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
  CAST(CEIL(c_acctbal) AS BIGINT) AS bal_ceil,
  ROUND(SQRT(ABS(c_acctbal)), 6) AS sqrt_abs,
  ROUND(LN(ABS(c_acctbal) + 1), 6) AS ln_abs1,
  ROUND(POWER(ABS(c_acctbal), 0.25), 6) AS pow_q,
  CAST(c_custkey % 13 AS BIGINT) AS mod13,
  CAST(SIGN(c_acctbal) AS BIGINT) AS bal_sign
FROM customer
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from events.props ('{"k": <int>}')."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_mod10"),
    )


_JSON_EXTRACT_SQL = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10
FROM events
"""


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over embeddings (size / first element / L1 norm fold,
    all after DOUBLE cast — Appendix A.3)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    l1 = F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + F.abs(x))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at(emb, 1), 6).alias("first_val"),
        F.round(l1, 4).alias("l1_norm"),
    )


_ARRAY_FUNCS_SQL = """
SELECT
  vec_id,
  CAST(len(embedding) AS BIGINT) AS dim,
  ROUND((embedding::DOUBLE[])[1], 6) AS first_val,
  ROUND(list_reduce(list_transform(embedding::DOUBLE[], x -> abs(x)), (a, b) -> a + b), 4) AS l1_norm
FROM embeddings
"""


def q_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map build + key extraction and struct build + field access, per
    user.  Maps/structs hash poorly across engines, so only EXTRACTED
    SCALARS are emitted (Appendix A.6)."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n_click"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchase"),
        F.count(F.lit(1)).alias("n_total"),
    )
    counts_map = F.create_map(
        F.lit("click"), F.col("n_click"), F.lit("purchase"), F.col("n_purchase")
    )
    stats = F.struct(F.col("n_total").alias("total"), F.col("n_click").alias("clicks"))
    return per_user.select(
        "user_id",
        F.element_at(counts_map, "click").alias("clicks_via_map"),
        F.element_at(counts_map, "purchase").alias("purchases_via_map"),
        stats.getField("total").alias("total_via_struct"),
    )


_MAP_STRUCT_SQL = """
WITH per_user AS (
  SELECT
    user_id,
    CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
    CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
    COUNT(*) AS n_total
  FROM events GROUP BY user_id
)
SELECT
  user_id,
  element_at(MAP(['click', 'purchase'], [n_click, n_purchase]), 'click')[1] AS clicks_via_map,
  element_at(MAP(['click', 'purchase'], [n_click, n_purchase]), 'purchase')[1] AS purchases_via_map,
  struct_extract({'total': n_total, 'clicks': n_click}, 'total') AS total_via_struct
FROM per_user
"""


def _net_price_udf():
    """Arrow-vectorized net price — one Arrow batch per call, ~10-100x
    a row-at-a-time Python UDF.  IEEE double ops are bit-deterministic,
    so the result matches DuckDB's plain arithmetic exactly.  (Built
    lazily: the pandas_udf decorator needs an active SparkSession.)"""

    @pandas_udf("double")
    def net(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return ext * (1.0 - disc) * (1.0 + tax)

    return net


def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar UDF (the Arrow path); rounding routed through
    decimal AFTER the UDF so half-way cases agree with the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        dround(
            _net_price_udf()(
                F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
            ),
            2,
            in_scale=6,
        ).alias("net_price"),
    )


_UDF_SCALAR_SQL = """
SELECT
  l_orderkey,
  CAST(l_linenumber AS BIGINT) AS l_linenumber,
  CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6)), 2) AS DOUBLE) AS net_price
FROM lineitem
"""


def q_expr_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI error-safety panel — Spark 4 runs under ANSI mode
    where division by zero, numeric overflow, bad casts, and
    out-of-bounds access are RUNTIME ERRORS; the ``try_*`` family is
    the documented production posture for untrusted data (NULL on
    failure instead of a dead job).  One row per event exercising all
    four: try_cast of a JSON-extracted string, try_divide with zero
    denominators, try_element_at past an array's end, and
    try_multiply at BIGINT overflow — the oracle states each NULL
    analytically (CASE on the failing condition), so the hash check
    pins the try-semantics themselves.

    Scale: pure row-local expressions inside codegen, zero shuffles.
    r13 perf note: ``try_multiply``'s failure path is a caught JVM
    ArithmeticException PER OVERFLOWING ROW (~28 µs each measured —
    2.8 s of this query's 4.3 s at sf0.1 when nearly every user_id
    overflows against LONG_MAX).  The production posture for a try_*
    hot path whose failure region is statically known is to route
    that region around the exception: the CASE guard keeps
    try_multiply for every row that can succeed (|user_id| <= 1 — the
    only inputs LONG_MAX multiplies without overflow) and states NULL
    for the provably-overflowing rest, bit-identical results
    (4.3 -> 0.45 s measured; oracle hash unchanged).
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr("try_cast(get_json_object(props, '$.k') as bigint)").alias("k_int"),
        (
            F.round(
                F.expr("try_divide(value, cast(user_id % 5 as double))"), 4
            )
            + 0.0
        ).alias("safe_ratio"),
        F.expr(
            "cast(try_element_at(sequence(1, 1 + cast(user_id % 4 as int)), 3)"
            " as bigint)"
        ).alias("third_elem"),
        F.expr(
            "CASE WHEN user_id >= -1 AND user_id <= 1"
            " THEN try_multiply(user_id, 9223372036854775807L)"
            " ELSE CAST(NULL AS BIGINT) END"
        ).alias("big_prod"),
    )


_EXPR_TRY_SQL = """
SELECT
  event_id,
  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
  CASE WHEN user_id % 5 = 0 THEN NULL
       ELSE ROUND(value / CAST(user_id % 5 AS DOUBLE), 4) + 0.0
  END AS safe_ratio,
  CASE WHEN 1 + user_id % 4 >= 3
       THEN CAST(3 AS BIGINT) ELSE NULL END AS third_elem,
  CASE WHEN user_id <= 1 THEN user_id * 9223372036854775807
       ELSE NULL END AS big_prod
FROM events
"""


QUERIES = {
    "q_expr_try": q_expr_try,
    "q_expr_case": q_expr_case,
    "q_string_funcs": q_string_funcs,
    "q_date_funcs": q_date_funcs,
    "q_math_funcs": q_math_funcs,
    "q_json_extract": q_json_extract,
    "q_array_funcs": q_array_funcs,
    "q_map_struct": q_map_struct,
    "q_udf_scalar": q_udf_scalar,
}

ORACLES = {
    "q_expr_try": _EXPR_TRY_SQL,
    "q_expr_case": _EXPR_CASE_SQL,
    "q_string_funcs": _STRING_FUNCS_SQL,
    "q_date_funcs": _DATE_FUNCS_SQL,
    "q_math_funcs": _MATH_FUNCS_SQL,
    "q_json_extract": _JSON_EXTRACT_SQL,
    "q_array_funcs": _ARRAY_FUNCS_SQL,
    "q_map_struct": _MAP_STRUCT_SQL,
    "q_udf_scalar": _UDF_SCALAR_SQL,
}
