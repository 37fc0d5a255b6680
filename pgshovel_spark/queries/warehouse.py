"""Partitioned-warehouse layout: plan-time partition pruning, proven.

SCALE.md's central claim for the 100 TB story is that the fact tables
live DATE-PARTITIONED in object storage, so a time-windowed query
prunes whole partition directories at PLANNING time — before a single
row group is opened.  The single-file sf fixtures can't show that, so
this module materializes a hive-partitioned copy of ``lineitem``
(dir-per-ship-month, a shared scratch artifact built once per corpus)
and runs the revenue rollup against it.

``q_scan_partition_pruned`` filters on the partition column: the scan's
``PartitionFilters`` keeps only the 3 matching month directories out of
~84, which tests/test_plans.py asserts directly on the executed plan
(selected partition count AND pruned input files).  The oracle runs the
equivalent month filter over the canonical single-file table — same
rows by construction, so the hash check also proves the partitioned
rewrite loses nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgshovel_spark.functions.determinism import dsum
from pgshovel_spark.operators.scratch import scratch_table
from pgshovel_spark.sources.tables import load_table

#: The pruned window: Q1 1997 (3 of the ~84 ship-month partitions).
_MONTHS = ("1997-01", "1997-02", "1997-03")


def _lineitem_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned lineitem copy (dir per ``ship_month``) — the
    date-partitioned warehouse layout, as a content-keyed scratch
    artifact.  Build cost is one full scan + partitioned write, paid
    once per corpus; every consumer is a partition-prunable scan."""

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        # One shuffle by the partition key before the write: each month
        # directory then gets ONE file instead of one per write task
        # (~84 files, not ~84 x tasks) — the small-files discipline a
        # partitioned warehouse table needs, and a ~3x faster build.
        return li.withColumn(
            "ship_month", F.date_format("l_shipdate", "yyyy-MM")
        ).repartition("ship_month")

    return scratch_table(
        spark, "lineitem_by_month", sf_dir, build, partition_by=["ship_month"]
    )


def q_scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue rollup over Q1 1997, read from the partitioned
    layout: the ``ship_month`` IN-list lands in PartitionFilters, so
    the scan plans over exactly 3 directories — the other ~81 months
    are never listed into the scan, let alone read.  Aggregation is
    the exact-decimal split-long sum (map-side partial, one tiny
    shuffle on the 3 surviving groups)."""
    li = _lineitem_by_month(spark, sf_dir)
    return (
        li.filter(F.col("ship_month").isin(*_MONTHS))
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
    )


_SCAN_PARTITION_PRUNED_SQL = f"""
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       COUNT(*) AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE strftime(l_shipdate, '%Y-%m') IN {tuple(_MONTHS)}
GROUP BY ship_month
"""


def q_scan_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning over the warehouse layout: the month
    window lives on a JOINED dimension (the distinct order-months of
    H1-1997 URGENT orders), not on the fact scan — so the partition
    filter is only known at RUNTIME, after the dim side is built.
    Spark injects a ``dynamicpruningexpression`` into the partitioned
    scan's PartitionFilters (asserted in tests/test_plans.py): the
    broadcast that feeds the join is REUSED as a pruning subquery, the
    fact scan plans over only the dim's ~6 month directories of ~84 on
    disk, and no fact row group outside them is ever opened.  This is
    the star-join pruning lever the date-partitioned 100 TB layout
    depends on — a static IN-list (q_scan_partition_pruned) covers
    literal windows, DPP covers windows derived from another table.

    The dim is DISTINCT months, so the join is a pure month filter
    (no fact-row duplication) and the oracle is the same join over
    the canonical single-file tables.
    """
    li = _lineitem_by_month(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    months = (
        o.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & F.col("o_orderdate").between(
                F.lit("1997-01-01").cast("timestamp"),
                F.lit("1997-06-30").cast("timestamp"),
            )
        )
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .distinct()
    )
    return (
        li.join(F.broadcast(months), li.ship_month == F.col("order_month"))
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            ),
        )
    )


_SCAN_DPP_SQL = """
WITH months AS (
  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS order_month
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-06-30'
)
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       COUNT(*) AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN months ON strftime(l_shipdate, '%Y-%m') = order_month
GROUP BY ship_month
"""


def _bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Register (building if needed) the bucketed customer/orders pair
    for ``sf_dir``: both hash-clustered on custkey into the same
    bucket count, sorted within buckets — the co-located layout that
    makes every recurring join on the key SHUFFLE-FREE (and sort-free)
    at any scale.  External tables under the scratch root (stable
    content-keyed paths); the catalog entry is session-scoped, so a
    fresh session re-registers by rewriting (~150k rows, sub-second at
    bench scale; a production deployment registers the DDL once in a
    shared metastore instead)."""
    import hashlib

    from pgshovel_spark.operators.scratch import ARTIFACT_ROOT

    slug = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    names = []
    for base, key, cols in (
        ("customer", "c_custkey", ["c_custkey", "c_mktsegment", "c_acctbal"]),
        ("orders", "o_custkey", ["o_custkey", "o_totalprice", "o_orderstatus"]),
    ):
        tbl = f"{base}_bkt_{slug}"
        path = ARTIFACT_ROOT / tbl
        if not spark.catalog.tableExists(tbl) or not (path / "_SUCCESS").exists():
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            (
                load_table(spark, sf_dir, base)
                .select(*cols)
                .write.mode("overwrite")
                .option("path", str(path))
                .bucketBy(8, key)
                .sortBy(key)
                .format("parquet")
                .saveAsTable(tbl)
            )
        names.append(tbl)
    return names[0], names[1]


def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment order rollup over the BUCKETED
    customer⋈orders pair: both sides are hash-clustered on custkey
    into the same 8 buckets, so the sort-merge join plans with NO
    Exchange and NO Sort on either side (asserted in
    tests/test_plans.py under a no-broadcast session — with
    broadcasts allowed AQE may still pick a broadcast join here, which
    is also shuffle-free on the fact side).  The answer is provably
    layout-independent: the oracle is the PLAIN join on the canonical
    single-file tables."""
    from pgshovel_spark.functions.determinism import exact_sum

    cust, orders = _bucketed_pair(spark, sf_dir)
    c = spark.table(cust)
    o = spark.table(orders)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(exact_sum("o_totalprice"), 2)
            .cast("double")
            .alias("total_revenue"),
            F.sum((F.col("o_orderstatus") == "F").cast("long")).alias(
                "n_finished"
            ),
        )
    )


_JOIN_BUCKETED_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE)
         AS total_revenue,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_finished
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


QUERIES = {
    "q_scan_partition_pruned": q_scan_partition_pruned,
    "q_scan_dpp": q_scan_dpp,
    "q_join_bucketed": q_join_bucketed,
}
ORACLES = {
    "q_scan_partition_pruned": _SCAN_PARTITION_PRUNED_SQL,
    "q_scan_dpp": _SCAN_DPP_SQL,
    "q_join_bucketed": _JOIN_BUCKETED_SQL,
}
