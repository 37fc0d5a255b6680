"""Scan / projection / filter operators (SURVEY.md §2.A).

These exist to pin the scan efficiency contract: the physical plan
must show column pruning (``ReadSchema`` only lists referenced
columns) and predicate pushdown (``PushedFilters`` non-empty).
tests/test_plans.py asserts both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgshovel_spark.functions.determinism import dround
from pgshovel_spark.sources.tables import load_table


def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename + computed column; scan prunes to 4 cols."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").cast("long").alias("linenumber"),
        F.col("l_quantity").alias("qty"),
        dround(net, 2, in_scale=4).alias("net"),
    )


_SCAN_PROJECT_SQL = """
SELECT
  l_orderkey AS orderkey,
  CAST(l_linenumber AS BIGINT) AS linenumber,
  l_quantity AS qty,
  CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4)), 2) AS DOUBLE) AS net
FROM lineitem
"""


def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate — pushed down to the Parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1998-12-31").cast("timestamp")
        )
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_linestatus") == "F") | (F.col("l_discount") > 0.05))
        & F.col("l_extendedprice").isNotNull()
    ).select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )


_FILTER_PRED_SQL = """
SELECT
  l_orderkey,
  CAST(l_linenumber AS BIGINT) AS l_linenumber,
  l_returnflag,
  l_linestatus,
  l_quantity,
  l_extendedprice,
  l_discount
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
  AND l_returnflag IN ('A', 'R')
  AND (l_linestatus = 'F' OR l_discount > 0.05)
  AND l_extendedprice IS NOT NULL
"""


QUERIES = {
    "q_scan_project": q_scan_project,
    "q_filter_pred": q_filter_pred,
}

ORACLES = {
    "q_scan_project": _SCAN_PROJECT_SQL,
    "q_filter_pred": _FILTER_PRED_SQL,
}
