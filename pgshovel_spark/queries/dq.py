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
    referential integrity, domain ranges, and null checks.

    Fused plan: the referential checks ride the SAME scan as their
    fact table's row checks — orders' PK/date/FK-to-customer checks
    are one aggregate over ``orders LEFT JOIN customer`` (the dim key
    is a PK, so the join is 1:1 and preserves fact counts — the exact
    assumption the oracle's own LEFT-JOIN counts embed), and both
    lineitem range checks plus its FK-to-orders check are one
    aggregate over ``lineitem LEFT JOIN orders(keys)``.  Four one-row
    partials cross-join into a single row that ``stack``s out to one
    row per constraint.  vs the naive 8-branch union: orders drops
    from three scans to two (fact + FK key side), lineitem from two
    to one — at 100 TB the scans are the whole cost of a DQ gate, and
    both dim sides broadcast (keys only), so the fused plan adds no
    shuffle over the bare row checks."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")

    viol = lambda cond: F.sum(cond.cast("long"))  # noqa: E731
    # orders row checks + FK-to-customer in ONE pass over the join.
    o_agg = (
        o.select("o_orderkey", "o_orderdate", "o_custkey")
        .join(c.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left")
        .agg(
            F.count(F.lit(1)).alias("o_n"),
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("o_pk_viol"),
            viol(
                ~F.col("o_orderdate").between(
                    F.lit("1990-01-01").cast("timestamp"),
                    F.lit("2030-01-01").cast("timestamp"),
                )
            ).alias("o_date_viol"),
            viol(F.col("c_custkey").isNull()).alias("fkoc_viol"),
        )
    )
    # lineitem range checks + FK-to-orders in ONE pass over the join.
    li_agg = (
        li.select("l_orderkey", "l_quantity", "l_discount")
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .agg(
            F.count(F.lit(1)).alias("li_n"),
            viol(~F.col("l_quantity").between(1, 50)).alias("li_qty_viol"),
            viol(~F.col("l_discount").between(0.0, 0.5)).alias("li_disc_viol"),
            viol(F.col("o_orderkey").isNull()).alias("fklo_viol"),
        )
    )
    c_agg = c.agg(
        F.count(F.lit(1)).alias("c_n"),
        viol(F.col("c_name").isNull()).alias("c_name_viol"),
    )
    ev_agg = ev.agg(
        F.count(F.lit(1)).alias("ev_n"),
        viol(F.col("value") < 0).alias("ev_val_viol"),
    )
    # The four one-row partials really do cross-join into a single row
    # (each side is exactly 1 row, so the "cross join" is a broadcast
    # of three scalars — no data movement), and ONE stack fans that
    # row out to one row per constraint.  One action -> one job; each
    # partial is a stage feeding the final 1x1 joins.
    one = reduce(DataFrame.crossJoin, [o_agg, li_agg, c_agg, ev_agg])
    out = one.select(
        F.expr(
            "stack(8,"
            " 'orders_pk_unique', o_n, o_pk_viol,"
            " 'orders_date_in_bounds', o_n, o_date_viol,"
            " 'lineitem_qty_in_range', li_n, li_qty_viol,"
            " 'lineitem_discount_in_range', li_n, li_disc_viol,"
            " 'customer_name_not_null', c_n, c_name_viol,"
            " 'events_value_non_negative', ev_n, ev_val_viol,"
            " 'orders_fk_customer', o_n, fkoc_viol,"
            " 'lineitem_fk_orders', li_n, fklo_viol"
            ") AS (check_name, n_checked, n_violations)"
        )
    )
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
