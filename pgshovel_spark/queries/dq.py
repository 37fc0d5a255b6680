"""Data-quality constraint checking (deequ/dbt-test style) — the
pre-ingest gate an ETL pipeline runs before publishing tables.

One row per declared constraint: rows checked, violations found,
pass/fail.  Checks are each a column-pruned aggregate (count of a
boolean predicate — map-side combined, no row materialization of
violations); referential checks are LEFT JOINs counting orphan rows.
The union of one-row aggregates is trivially parallel; at 100 TB each
check reads only its own columns and the FK anti joins broadcast the
key side when eligible.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgshovel_spark.sources.tables import load_table


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint sweep over the star schema: primary-key uniqueness,
    referential integrity, domain ranges, and null checks."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")

    def check(name: str, df: DataFrame, violation) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(violation.cast("long")).alias("n_violations"),
        )

    pk_orders = o.agg(
        F.lit("orders_pk_unique").alias("check_name"),
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_violations"),
    )
    fk_orders_cust = (
        o.join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left")
        .agg(
            F.lit("orders_fk_customer").alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.col("c_custkey").isNull().cast("long")).alias("n_violations"),
        )
    )
    fk_li_orders = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left")
        .agg(
            F.lit("lineitem_fk_orders").alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.col("o_orderkey").isNull().cast("long")).alias("n_violations"),
        )
    )
    checks = [
        pk_orders,
        fk_orders_cust,
        fk_li_orders,
        check(
            "lineitem_qty_in_range",
            li,
            ~F.col("l_quantity").between(1, 50),
        ),
        check(
            "lineitem_discount_in_range",
            li,
            ~F.col("l_discount").between(0.0, 0.5),
        ),
        check("customer_name_not_null", c, F.col("c_name").isNull()),
        check("events_value_non_negative", ev, F.col("value") < 0),
        check(
            "orders_date_in_bounds",
            o,
            ~F.col("o_orderdate").between(
                F.lit("1990-01-01").cast("timestamp"),
                F.lit("2030-01-01").cast("timestamp"),
            ),
        ),
    ]
    out = reduce(DataFrame.unionAll, checks)
    return out.select(
        "check_name",
        "n_checked",
        F.coalesce("n_violations", F.lit(0)).cast("long").alias("n_violations"),
        (F.coalesce("n_violations", F.lit(0)) == 0).alias("passed"),
    )


_DQ_CHECKS_SQL = """
SELECT check_name, n_checked,
       CAST(COALESCE(n_violations, 0) AS BIGINT) AS n_violations,
       COALESCE(n_violations, 0) = 0 AS passed
FROM (
  SELECT 'orders_pk_unique' AS check_name, COUNT(*) AS n_checked,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations FROM orders
  UNION ALL
  SELECT 'orders_fk_customer', COUNT(*),
         SUM(CAST(c_custkey IS NULL AS BIGINT))
  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
  UNION ALL
  SELECT 'lineitem_fk_orders', COUNT(*),
         SUM(CAST(o_orderkey IS NULL AS BIGINT))
  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
  UNION ALL
  SELECT 'lineitem_qty_in_range', COUNT(*),
         SUM(CAST(NOT (l_quantity BETWEEN 1 AND 50) AS BIGINT)) FROM lineitem
  UNION ALL
  SELECT 'lineitem_discount_in_range', COUNT(*),
         SUM(CAST(NOT (l_discount BETWEEN 0.0 AND 0.5) AS BIGINT)) FROM lineitem
  UNION ALL
  SELECT 'customer_name_not_null', COUNT(*),
         SUM(CAST(c_name IS NULL AS BIGINT)) FROM customer
  UNION ALL
  SELECT 'events_value_non_negative', COUNT(*),
         SUM(CAST(value < 0 AS BIGINT)) FROM events
  UNION ALL
  SELECT 'orders_date_in_bounds', COUNT(*),
         SUM(CAST(NOT (o_orderdate BETWEEN TIMESTAMP '1990-01-01'
                       AND TIMESTAMP '2030-01-01') AS BIGINT)) FROM orders
)
"""


QUERIES = {"q_dq_checks": q_dq_checks}
ORACLES = {"q_dq_checks": _DQ_CHECKS_SQL}
