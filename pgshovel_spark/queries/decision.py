"""Decision-support subquery patterns (SURVEY.md §2.C/§2.D extension).

The classic TPC-H subquery shapes — correlated scalar subquery,
EXISTS / NOT EXISTS, IN-over-aggregate, scalar-max selection —
re-expressed as Catalyst-friendly DataFrame plans.  The fixture lacks
``partsupp`` / ``l_commitdate`` / ``l_shipmode``, so each query keeps
the *shape* of its TPC-H analog on the columns that exist.

Spark-first posture (the point of this module):

- A correlated scalar subquery is a per-key aggregate joined back
  (Catalyst decorrelates the SQL form the same way; we declare the
  join directly so the plan is explicit and broadcast-eligible).
- EXISTS/NOT EXISTS become LEFT SEMI / LEFT ANTI joins — no
  per-row re-execution, one shuffle (or broadcast) total.
- Uncorrelated scalars (global averages / maxima) are one tiny
  aggregated row broadcast via ``crossJoin`` — never a driver
  ``collect`` round-trip inside the plan.
- All money sums go through the exact split-long decimal accumulator
  (``functions/determinism.py``) so Spark and DuckDB agree bit-for-bit
  regardless of partial-aggregation order.

Scale notes (100 TB): every dimension side here (part, supplier,
customer, nation, the per-part/per-order aggregates after their
HAVING) is orders of magnitude smaller than lineitem, so AQE picks
broadcast joins; the only big shuffles are the per-key partial
aggregates on lineitem, which combine map-side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgshovel_spark.functions.determinism import dsum, epoch_s, exact_sum
from pgshovel_spark.sources.tables import (
    dim_catalog,
    load_table,
    nation_name_expr,
    nations_in_region,
)


def q_sub_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery as aggregate+join.

    Revenue locked up in small-quantity orders: lineitems whose
    quantity is below 20% of the part's own average quantity.  The
    correlated ``(SELECT 0.2*avg(l_quantity) FROM lineitem WHERE
    l_partkey = p_partkey)`` decorrelates to a per-part aggregate
    broadcast-joined back to lineitem.

    Determinism: l_quantity is integral (1..50), so its double sum is
    exact in any order and AVG is bit-identical on both engines; the
    0.2* threshold and the ``<`` comparison are then exact too.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum("l_extendedprice", 2).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_SUB_SCALAR_AVG_SQL = """
WITH part_avg AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,6))), 2) AS DOUBLE)
         AS small_qty_revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN part_avg USING (l_partkey)
JOIN part ON l_partkey = p_partkey
WHERE l_quantity < qty_threshold
GROUP BY p_brand
"""


def q_sub_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS as a LEFT SEMI join with a residual
    predicate.

    Orders placed in 1996H1 that had at least one lineitem shipped
    more than 90 days after the order date, counted per priority.
    The correlated EXISTS becomes one semi join on orderkey with the
    date predicate as the join residual — lineitem is scanned once.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1996-06-30").cast("timestamp"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


_SUB_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-06-30'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""


def q_sub_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — uncorrelated scalar + NOT EXISTS anti join.

    Well-funded lapsed customers: balance above the average positive
    balance, no orders since 2000-01-01; counted per market segment.
    The global average is ONE aggregated row broadcast into the plan
    (no driver collect); NOT EXISTS is a LEFT ANTI join whose right
    side is pre-filtered so the date predicate pushes to the scan.

    Determinism: the threshold is an exact decimal sum / count, so
    both engines compare against the identical double.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        (exact_sum("c_acctbal").cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", 2).alias("total_bal"),
        )
    )


_SUB_NOT_EXISTS_SQL = """
WITH thresh AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)
           AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(24,6))), 2) AS DOUBLE)
         AS total_bal
FROM customer, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_mktsegment
"""


def q_sub_in_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — IN over a grouped HAVING as a semi-join chain.

    Large-volume orders: orderkeys whose summed lineitem quantity
    exceeds 160, joined back to orders and customers.  The
    ``o_orderkey IN (SELECT l_orderkey ... HAVING sum > 160)``
    becomes aggregate → join; the qualifying set is tiny after the
    HAVING, so it broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 160)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


_SUB_IN_AGG_SQL = """
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 160
)
SELECT c_name, o_orderkey, o_totalprice, CAST(sum_qty AS DOUBLE) AS sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_sub_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — scalar MAX subquery over a derived view.

    The supplier(s) with the highest revenue from lineitems shipped in
    1997Q1.  Revenue stays an exact decimal through the max-equality
    comparison, so ties and the max itself are bit-deterministic; the
    one-row max broadcasts into the filter.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1997-01-01").cast("timestamp"),
            F.lit("1997-03-31").cast("timestamp"),
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    # the scalar max folds over coalesce(1) — a narrow dependency on
    # rev's (reused) exchange instead of a single-partition exchange
    # of the supplier-sized table (one fewer AQE stage job); the
    # supplier count bounds the single task
    top = rev.coalesce(1).agg(F.max("rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("rev", 2).cast("double").alias("total_revenue"),
        )
    )


_SUB_TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS rev
  FROM lineitem
  WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-03-31'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(ROUND(rev, 2) AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT MAX(rev) FROM rev)
"""


def q_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume between nation pairs.

    Supplier-nation x customer-nation revenue per ship-year.  Two
    independent broadcast-joined dimension paths hang off the single
    lineitem->orders join; the only big shuffle is lineitem->orders.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    # Pre-reduce each dimension path to its (key, nation_name) payload
    # BEFORE broadcasting: two broadcast builds instead of four, and
    # the nation name resolves from the driver-side dim catalog as a
    # LITERAL map inside each build's projection (sources/tables.py
    # dim_catalog) — no nation join at all.  Measured at sf0.1:
    # 11 jobs / 2.4 s (four flat broadcasts) -> 5 jobs.  At 100 TB the
    # same shape holds — the dim payload is the minimal (key, name)
    # pair; if customer outgrows broadcast range, drop the hint and
    # AQE shuffles this one join.
    s_dim = s.select(
        F.col("s_suppkey").alias("sd_suppkey"),
        nation_name_expr(spark, sf_dir, F.col("s_nationkey")).alias("supp_nation"),
    )
    c_dim = c.select(
        F.col("c_custkey").alias("cd_custkey"),
        nation_name_expr(spark, sf_dir, F.col("c_nationkey")).alias("cust_nation"),
    )
    return (
        li.join(
            o.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(s_dim), li.l_suppkey == F.col("sd_suppkey"))
        .join(F.broadcast(c_dim), F.col("o_custkey") == F.col("cd_custkey"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "volume"
            )
        )
    )


_NATION_PAIRS_SQL = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(24,6))), 2) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
GROUP BY 1, 2, 3
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — market share via conditional aggregation.

    Within the ASIA customer market, NATION_2 suppliers' share of
    revenue per order-year.  One pass: the CASE picks the numerator,
    both sums stay exact decimal, and the share divides two exact
    doubles (deterministic on both engines).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # nation (25 rows) and region (5) are the fixed catalog tables of
    # the schema — resolve the ASIA nation-key set and the NATION_2
    # key from the memoized driver-side catalog (sources/tables.py
    # dim_catalog: one padded-union collect per session, exactly how
    # Spark's own runtime filters / InSubqueryExec handle a
    # dim-derived predicate).  The customer and supplier paths then
    # carry LITERAL predicates (an isin that can push into the scan,
    # a flag computed in the projection) instead of a four-level
    # broadcast-join chain — two broadcast builds total, five fewer
    # than the pre-joined dimension shape this replaces.
    del n, r
    asia_nations = nations_in_region(spark, sf_dir, "ASIA")
    nat2_key = next(
        (
            int(x.key)
            for x in dim_catalog(spark, sf_dir)["nation"]
            if x.name == "NATION_2"
        ),
        None,
    )
    if nat2_key is None:
        raise ValueError("nation 'NATION_2' not found in the dim catalog")

    asia_cust = c.filter(F.col("c_nationkey").isin(asia_nations)).select(
        F.col("c_custkey").alias("cd_custkey")
    )
    s_dim = s.select(
        F.col("s_suppkey").alias("sd_suppkey"),
        (F.col("s_nationkey") == F.lit(nat2_key)).alias("is_nat2"),
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(
            o.select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("cd_custkey"))
        .join(F.broadcast(s_dim), li.l_suppkey == F.col("sd_suppkey"))
    )
    agg = joined.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        exact_sum(F.when(F.col("is_nat2"), vol)).alias("nat_rev"),
        exact_sum(vol).alias("all_rev"),
    )
    return agg.select(
        "order_year",
        F.round(
            F.coalesce(F.col("nat_rev"), F.lit(0).cast("decimal(24,6)"))
            .cast("double")
            / F.col("all_rev").cast("double"),
            6,
        ).alias("mkt_share"),
    )


_MARKET_SHARE_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       ROUND(
         CAST(COALESCE(SUM(CASE WHEN sn.n_name = 'NATION_2'
             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))
             END), 0) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(24,6))) AS DOUBLE),
         6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY 1
"""


def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — distribution of customers by order count.

    LEFT OUTER join so zero-order customers survive with c_count = 0,
    then a second (tiny) aggregation over the per-customer counts.
    All-integer, unconditionally deterministic.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_CUSTDIST_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q_growth_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with month-over-month and year-over-year growth
    — the reporting query layered on any revenue rollup: aggregate to
    months (exact decimal), then two lag windows over the tiny monthly
    table.

    Determinism: the monthly sums are exact decimals; growth ratios
    divide two exact doubles and round 4dp.  The window table is
    #months rows — the single-partition window here is bounded by the
    calendar, not the data.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.expr("unix_micros(date_trunc('MONTH', o_orderdate))").alias("month_us")
    ).agg(dsum("o_totalprice", 2).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    w = Window.orderBy("month_us")
    prev_m = F.lag("revenue", 1).over(w)
    prev_y = F.lag("revenue", 12).over(w)
    return monthly.select(
        "month_us",
        "n_orders",
        "revenue",
        F.round((F.col("revenue") - prev_m) / prev_m, 4).alias("mom_growth"),
        F.round((F.col("revenue") - prev_y) / prev_y, 4).alias("yoy_growth"),
    )


_GROWTH_TREND_SQL = """
WITH monthly AS (
  SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE)
           AS revenue,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT month_us, n_orders, revenue,
       ROUND((revenue - lag(revenue, 1) OVER w) / lag(revenue, 1) OVER w, 4)
         AS mom_growth,
       ROUND((revenue - lag(revenue, 12) OVER w) / lag(revenue, 12) OVER w, 4)
         AS yoy_growth
FROM monthly
WINDOW w AS (ORDER BY month_us)
"""


def q_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — revenue from orders where the customer and the
    line's supplier sit in the SAME nation, per nation, one year.

    The same-nation predicate is the interesting part: it correlates
    the two dimension paths, so it rides the fact row AFTER both
    broadcast lookups as a plain column filter — no extra join.  One
    lineitem->orders shuffle; supplier and customer reduce to
    broadcast (key, nationkey) pairs, nation names broadcast onto the
    5-row result path."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    s_dim = s.select(F.col("s_suppkey").alias("sd_key"), "s_nationkey")
    c_dim = c.select(F.col("c_custkey").alias("cd_key"), "c_nationkey")
    return (
        li.join(
            o.select("o_orderkey", "o_custkey", "o_orderdate").filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(s_dim), li.l_suppkey == F.col("sd_key"))
        .join(F.broadcast(c_dim), F.col("o_custkey") == F.col("cd_key"))
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy("s_nationkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        # nation names resolve from the driver-side dim catalog as a
        # literal map lookup on the 25-row result — one fewer
        # broadcast build than the name join (sources/tables.py)
        .select(
            nation_name_expr(spark, sf_dir, F.col("s_nationkey")).alias("nation"),
            "revenue",
            "n_lineitems",
        )
    )


_LOCAL_VOLUME_SQL = """
SELECT n_name AS nation,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — revenue delta from a hypothetical discount
    change: one column-pruned scan, every predicate pushed to parquet,
    ONE exact-decimal aggregate.  The canonical 'is the scan path
    clean' query: no join, no shuffle beyond the 1-row final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 2).alias(
                "revenue_delta"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_REVENUE_FORECAST_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount
                           AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue_delta,
       COUNT(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — top 20 customers by revenue lost to returned
    items in a quarter.  lineitem filters to returnflag='R' at the
    scan; one shuffle join to the date-filtered orders; customer
    attributes broadcast onto the 20-row result; LIMIT carries a
    total order (revenue DESC, custkey ASC) per the determinism
    contract."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.select("o_orderkey", "o_custkey", "o_orderdate").filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "lost_revenue"
            )
        )
        .join(
            F.broadcast(
                c.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "c_mktsegment",
            "lost_revenue",
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_RETURNED_ITEMS_SQL = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal, c_mktsegment,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(24,6))), 2) AS DOUBLE) AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — PROMO parts' share of one month's revenue via
    conditional aggregation: part reduces to a broadcast
    (key, is_promo) pair, the CASE picks the numerator, both sums stay
    exact decimal, and the share divides two exact doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    p_dim = p.select(
        F.col("p_partkey").alias("pd_key"),
        (F.col("p_type") == "PROMO").alias("is_promo"),
    )
    agg = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(F.broadcast(p_dim), li.l_partkey == F.col("pd_key"))
        .agg(
            exact_sum(F.when(F.col("is_promo"), vol)).alias("promo_rev"),
            exact_sum(vol).alias("all_rev"),
        )
    )
    return agg.select(
        F.round(
            F.lit(100.0)
            * F.coalesce(F.col("promo_rev"), F.lit(0).cast("decimal(24,6)"))
            .cast("double")
            / F.col("all_rev").cast("double"),
            6,
        ).alias("promo_pct")
    )


_PROMO_SHARE_SQL = """
SELECT ROUND(
         100.0 * CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))
             END), 0) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(24,6))) AS DOUBLE),
         6) AS promo_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


def q_basket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — revenue from three disjunctive brand/size/
    quantity baskets (adapted to the fixture's columns: no
    shipmode/shipinstruct).  The OR-of-ANDs predicate evaluates
    row-locally AFTER the broadcast part lookup; per-basket rollup
    keeps the result auditable."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    p_dim = p.select(
        F.col("p_partkey").alias("pd_key"), "p_brand", "p_size"
    )
    basket = (
        F.when(
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11),
            F.lit(1),
        )
        .when(
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20),
            F.lit(2),
        )
        .when(
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 40)
            & F.col("l_quantity").between(20, 30),
            F.lit(3),
        )
    )
    return (
        li.join(F.broadcast(p_dim), li.l_partkey == F.col("pd_key"))
        .withColumn("basket", basket)
        .filter(F.col("basket").isNotNull())
        .groupBy("basket")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_BASKET_REVENUE_SQL = """
SELECT basket,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM (
  SELECT l_extendedprice, l_discount,
         CASE
           WHEN p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11 THEN 1
           WHEN p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 20 THEN 2
           WHEN p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 40
                AND l_quantity BETWEEN 20 AND 30 THEN 3
         END AS basket
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
WHERE basket IS NOT NULL
GROUP BY basket
"""


def q_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-line profit by supplier nation and
    order year ('blue' parts; the fixture has no partsupp, so profit
    is the discounted revenue term).

    Plan: the ONE fact-fact shuffle (lineitem⋈orders on orderkey)
    carries the whole query; the part filter and the
    supplier→nation path are pre-reduced broadcast dims — the filter
    lands part-side BEFORE the join, so the fact scan's rows drop at
    the broadcast probe, not after.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%blue%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    s_dim = s.select(F.col("s_suppkey").alias("sd_suppkey"), "s_nationkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s_dim), li.l_suppkey == F.col("sd_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("s_nationkey", F.year("o_orderdate").alias("order_year"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "profit"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        # nation names resolve from the driver-side dim catalog as a
        # literal map on the aggregated rows (one fewer broadcast)
        .select(
            nation_name_expr(spark, sf_dir, F.col("s_nationkey")).alias("nation"),
            "order_year",
            "profit",
            "n_lines",
        )
    )


_PROFIT_BY_NATION_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(24,6))), 2) AS DOUBLE) AS profit,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%blue%'
GROUP BY 1, 2
"""


def q_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional priority counts over the late
    lines (no l_shipmode in the fixture; l_linestatus plays the
    grouping role).

    Lines shipped more than 60 days after the order date during
    1997: per line status, how many belong to high-priority orders
    (1-URGENT / 2-HIGH) vs the rest — the CASE-count pivot riding the
    single lineitem⋈orders shuffle, with the date filters pushed to
    both scans (shipdate window derived from the order window).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1997-01-01").cast("timestamp"),
            F.lit("1998-03-01").cast("timestamp"),
        )
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            & (
                F.col("o_orderdate").between(
                    F.lit("1997-01-01").cast("timestamp"),
                    F.lit("1997-12-31").cast("timestamp"),
                )
            ),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(hi.cast("long")).alias("high_line_count"),
            F.sum((~hi).cast("long")).alias("low_line_count"),
        )
    )


_PRIORITY_SHIPPING_SQL = """
SELECT l_linestatus,
       CAST(SUM(CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS BIGINT))
            AS BIGINT) AS high_line_count,
       CAST(SUM(CAST(o_orderpriority NOT IN ('1-URGENT', '2-HIGH') AS BIGINT))
            AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1998-03-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY l_linestatus
"""


def q_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — supplier diversity per part attribute, with
    both exclusion predicates (the fixture has no partsupp; the
    observed (partkey, suppkey) pairs from lineitem stand in).

    Distinct suppliers per (p_brand, p_size) over trade-observed
    part-supplier links, excluding one brand, PROMO-type parts, and
    suppliers in arrears (s_acctbal < 0 — Q16's complaint-supplier
    exclusion).  NO standalone dedup: both dim joins are broadcast
    (map-side), so raw lines flow straight into the final
    countDistinct, whose partial-aggregation phase dedups
    (brand, size, suppkey) map-side — one corpus shuffle total where
    an up-front ``links.distinct()`` paid the same reduction as an
    EXTRA full exchange (one fewer shuffle and 6 -> 5 jobs at sf0.1;
    the remaining cost is the distinct-aggregate exchange pair
    itself).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#13") & (~F.col("p_type").like("PROMO%"))
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    bad_s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    links = li.select("l_partkey", "l_suppkey")
    return (
        links.join(
            F.broadcast(bad_s), links.l_suppkey == bad_s.s_suppkey, "anti"
        )
        .join(F.broadcast(p), links.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_PARTS_SUPPLIER_COUNT_SQL = """
SELECT p_brand, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) links
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'PROMO%'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
"""


def q_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the double-correlated EXISTS / NOT EXISTS:
    suppliers who were the SOLE late shipper on a multi-supplier
    order (late = shipped more than 60 days after the order date; the
    fixture has no commit/receipt dates).

    Decorrelation, one pass: BOTH correlated subqueries are per-order
    facts — "another supplier exists" is n_suppliers >= 2, "no other
    late supplier" is n_late == 1 — so instead of probing lineitem
    with SEMI and ANTI self-joins (three orderkey shuffles of
    corpus-sized tables), ONE groupBy chain computes
    (n_sup, n_late, the_late_supplier) per order: lines reduce to
    distinct (orderkey, suppkey, late-flag), then to one row per
    order.  The second groupBy re-shuffles only the per-(order,
    supplier) reduction, and the sole-late filter leaves an
    orders-fraction-sized table for the broadcast supplier join.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # ONE orderkey-keyed shuffle feeds BOTH aggregation levels:
    # hash(l_orderkey) satisfies the (orderkey, suppkey) clustering of
    # the first groupBy AND the orderkey clustering of the second, so
    # neither inserts an exchange (the q_excess_inventory shape).  The
    # explicit repartition trades the first level's partial aggregate
    # away, but the shuffled rows are a 3-column projection with ~1-2
    # lines per (order, supplier) — the map-side combine it replaces
    # removed almost nothing, while the former plan re-shuffled the
    # per-(order, supplier) table a second time.  No explicit
    # partition COUNT: a count pins the exchange against AQE
    # coalescing (REPARTITION_BY_NUM origin), and deriving it from
    # defaultParallelism made the layout a function of the core count
    # — local[32] ran 32 near-empty aggregate tasks where local[8]
    # ran 8, the r13 scaling block's "loses to fewer cores" signature
    # (VERDICT r13 item 3).  Keyed-only repartition keeps the same
    # exchange and lets AQE size the partitions from the actual
    # shuffle bytes via the advisory target at ANY core count.
    per_os = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).cast("int").alias("is_late"),
        )
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_late").alias("late"))
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_sup"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_sup"),
    )
    sole_late = per_o.filter((F.col("n_sup") >= 2) & (F.col("n_late") == 1))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(s), sole_late.late_sup == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_WAITING_ORDERS_SQL = """
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — correlated MIN subquery with a regional
    qualifier (the fixture lacks ``partsupp``, so the supplier-part
    price list is DERIVED: each (part, supplier)'s unit cost is the
    minimum observed ``l_extendedprice / l_quantity`` on their trade
    history, the classic rate-card reconstruction).

    For every STANDARD-type part, find the EUROPE supplier offering
    the lowest derived unit cost; the correlated ``(SELECT MIN ...)``
    plus its (cost, suppkey) tie rule collapse to one lexicographic
    ``min(struct(cost, suppkey))`` per part — the tie rule that makes
    the top-20 a total order (the oracle keeps the naive decorrelated
    aggregate-and-join-back form).

    Determinism: unit cost is ONE IEEE double division per line (bit
    identical on both engines), MIN of identical doubles is identical,
    and the final ordering ties on the integer part key.

    Scale: the struct-min is a lineitem-sized partial aggregate that
    combines map-side; everything after it is part-table-sized and the
    dimension joins broadcast — the only big shuffle is the partkey
    aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    # the EUROPE membership resolves against the driver-side dim
    # catalog (memoized one-action collect, sources/tables.py) to a
    # literal isin over s_nationkey — pushable into the supplier scan,
    # and two fewer broadcast builds than the nation⋈region chain
    eu_sup = s.filter(
        F.col("s_nationkey").isin(nations_in_region(spark, sf_dir, "EUROPE"))
    ).select("s_suppkey", "s_name")
    # per-part minima are independent across parts, so the part-type
    # slice pushes below the aggregate: join the fact table down to the
    # qualifying parts before any shuffle (an INNER join carrying
    # p_name, not a semi — the identical projection+filter subtree then
    # canonicalizes equal to nothing else, and p is scanned once; the
    # oracle leaves the filter in its natural outer position).
    #
    # The correlated MIN + tie rule is ONE lexicographic struct-min per
    # part: min(struct(cost, suppkey)) over ALL of a part's lines IS
    # (min unit cost, lowest suppkey achieving it) — the per-(part,
    # supplier) MIN, the per-part MIN-of-MINs, the (cost, suppkey)
    # tie-break join-back, and the ranked window all collapse into a
    # single map-side-combining aggregate with ONE exchange (the
    # former plan paid the (partkey, suppkey) aggregate exchange PLUS
    # a partkey window exchange).  s_name rides INSIDE the struct
    # (compared only on a (cost, suppkey) tie, which the unique
    # suppkey forecloses), so no join-back to eu_sup is needed at all
    # — the former second broadcast build of eu_sup (not even
    # reusable: its other site pruned s_name away) disappears.
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_name")), li.l_partkey == p.p_partkey)
        .join(F.broadcast(eu_sup), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.min(
                F.struct(
                    (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
                    F.col("l_suppkey").alias("sk"),
                    F.col("s_name").alias("s_name"),
                )
            ).alias("win"),
            F.first("p_name").alias("p_name"),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            F.col("win.s_name").alias("s_name"),
            F.col("win.unit_cost").alias("unit_cost"),
        )
        .orderBy("unit_cost", "p_partkey")
        .limit(20)
    )


_MIN_COST_SUPPLIER_SQL = """
WITH eu_sup AS (
  SELECT s_suppkey, s_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem JOIN eu_sup ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, MIN(unit_cost) AS min_cost FROM offers GROUP BY l_partkey
), winner AS (
  SELECT o.l_partkey AS p_key, MIN(o.l_suppkey) AS s_suppkey,
         MIN(b.min_cost) AS unit_cost
  FROM offers o JOIN best b
    ON o.l_partkey = b.l_partkey AND o.unit_cost = b.min_cost
  GROUP BY o.l_partkey
)
SELECT p_partkey, p_name, s_name, unit_cost
FROM winner
JOIN part ON p_key = p_partkey
JOIN eu_sup USING (s_suppkey)
WHERE p_type = 'STANDARD'
ORDER BY unit_cost, p_partkey
LIMIT 20
"""


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — HAVING against a GLOBAL scalar subquery.

    Per-part traded value (exact decimal sum of l_extendedprice) over
    suppliers of one nation, keeping parts whose value exceeds TWICE
    the nation's average per-part value — the uncorrelated scalar
    becomes ONE aggregated (total, n_parts) row broadcast into the
    plan via crossJoin, never a driver round-trip.  (TPC-H Q11 scales
    its fixed fraction by SF for exactly this reason; the
    count-adaptive form keeps the selectivity scale-stable without
    knowing SF.)  The HAVING comparison runs on the EXACT decimal sums
    (both engines), so the cut line cannot drift with summation order;
    only the emitted value is rounded.

    Scale: one lineitem aggregate (map-side combine), then everything
    is part-sized; the global total re-aggregates the per-part table,
    not the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    # per_part is SELF-REFERENCED (the global-total broadcast derives
    # from it and cross-joins back), and AQE's stage dedup misses the
    # re-aliased copy of a HashAggregate-topped subtree — but NOT an
    # exchange-topped one.  Topping the part-sized aggregate with an
    # explicit l_partkey repartition makes the shared subtree an
    # exchange, so AQE stage reuse feeds BOTH consumers (the total
    # broadcast and the HAVING probe) from one map output: one
    # lineitem scan, no cache, no cache-population job.  Round-9 A/B
    # (fresh process per config, sf0.1 AND 10x, hash-identical at
    # sf0.01): repartition 5 jobs vs lazy-cache 7 vs rollup-pyramid 6;
    # walls equal at 10x (2.37 vs 2.38 s).  The extra exchange moves
    # only part-sized 16-byte rows — cheaper than cache churn at any
    # scale (EXPERIMENTS.md round 9).
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(exact_sum("l_extendedprice").alias("val"))
        # keyed-only (r14): an explicit count pins the exchange against
        # AQE coalescing and made the layout a function of core count;
        # REPARTITION_BY_COL keeps the exchange-topped stage reuse and
        # lets AQE size the part-sized table's partitions from bytes.
        .repartition("l_partkey")
    )
    total = per_part.agg(
        F.sum("val").alias("tot"), F.count(F.lit(1)).alias("np")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") * F.col("np") > F.col("tot") * 2)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("val"), 2).cast("double").alias("stock_value"),
        )
        # no LIMIT -> no ORDER BY: the full set is the answer and a
        # global sort is a wasted range exchange (+ sampling job)
    )


_IMPORTANT_STOCK_SQL = """
WITH per_part AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS val
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 7
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey,
       CAST(ROUND(val, 2) AS DOUBLE) AS stock_value
FROM per_part
WHERE val * (SELECT COUNT(*) FROM per_part) > (SELECT SUM(val) FROM per_part) * 2
ORDER BY stock_value DESC, p_partkey
"""


def q_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — nested IN over a correlated-threshold
    aggregate, resolved as two aggregation levels + a SEMI join chain.

    "Dominant suppliers" of small parts: suppliers who shipped more
    than 30% of a part's total 1997 volume (parts with p_size <= 10).
    The inner correlated threshold (``0.5 * SUM(...) WHERE same part``
    in Q20) is the per-part total joined back to the per-(part,
    supplier) aggregate; the outer IN becomes a semi-join into
    supplier.  All quantities are integers, so the 30% comparison is
    exact cross-engine in integer arithmetic (qty * 10 > tot * 3).

    Scale: ONE shuffle of the filtered fact slice, keyed on partkey,
    feeds the whole correlated pipeline — the (part, supplier)
    aggregate runs exchange-free on it (hash(partkey) satisfies the
    (partkey, suppkey) clustering: equal pairs share a partkey), the
    per-part total is a window SUM over the same partitioning (no
    re-shuffle, no join-back), and only the supplier-sized dominant
    set re-keys.  The explicit pk-repartition trades the partial
    aggregate away, but the (pk, sk) groups are near-unique per map
    partition (~6 lines per pair spread across the cluster), so the
    map-side combine it replaces removed almost nothing — while the
    former plan's extra (pk, sk) exchange, partkey re-aggregate, and
    equality join-back each shuffled the same table again.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1997-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = load_table(spark, sf_dir, "supplier")
    ps_qty = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .select("l_partkey", "l_suppkey", "l_quantity")
        # keyed-only (r14): same AQE-coalescible trade as
        # q_waiting_orders — one exchange feeds the whole correlated
        # pipeline, sized from actual shuffle bytes at any core count
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
    )
    tot = F.sum("qty").over(Window.partitionBy("l_partkey"))
    dominant = (
        ps_qty.withColumn("tot", tot)
        .filter(F.col("qty") * 10 > F.col("tot") * 3)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts_dominated"))
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey)
        .select("s_name", "n_parts_dominated")
        .orderBy(F.col("n_parts_dominated").desc(), "s_name")
        .limit(25)
    )


_EXCESS_INVENTORY_SQL = """
WITH ps_qty AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 10)
  GROUP BY l_partkey, l_suppkey
), part_tot AS (
  SELECT l_partkey, SUM(qty) AS tot FROM ps_qty GROUP BY l_partkey
), dominant AS (
  SELECT l_suppkey, COUNT(*) AS n_parts_dominated
  FROM ps_qty JOIN part_tot USING (l_partkey)
  WHERE qty * 10 > tot * 3
  GROUP BY l_suppkey
)
SELECT s_name, n_parts_dominated
FROM supplier JOIN dominant ON s_suppkey = l_suppkey
ORDER BY n_parts_dominated DESC, s_name
LIMIT 25
"""


def q_orders_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary
    quartile scores per purchasing customer, the standard warehouse
    segmentation pass (score 4 = best quartile).

    Quartile CUTS, not ntile ranks: each metric's q25/q50/q75 come
    from ONE exact-percentile aggregate over the per-customer table
    and score = 1 + Σ(metric > cut).  That is (a) tie-stable — equal
    metrics always score equally, where ntile splits ties by rank —
    and (b) ulp-robust across engines: an interpolated cut lies
    strictly BETWEEN two consecutive order statistics (or exactly ON
    one when the rank position is integral), and no data value exists
    strictly between consecutive order statistics, so a last-ulp
    interpolation difference between Spark's percentile and DuckDB's
    percentile_cont can never flip a ``>`` comparison.  Monetary
    compares the DOUBLE cast of the exact-decimal sum (identical on
    both engines by construction).

    Scale shape: one orders scan -> per-customer aggregate, topped
    with a custkey repartition so AQE stage reuse feeds BOTH consumers
    (the 1-row cuts aggregate and the scoring probe) from one map
    output — the q_important_stock / q_skew_keys trick.  The 9 cut
    values ride ONE broadcast row.
    """
    o = load_table(spark, sf_dir, "orders")
    per = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max(epoch_s("o_orderdate")).alias("last_s"),
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("m_dec"),
        )
        .select(
            "c_custkey",
            "last_s",
            "n_orders",
            F.col("m_dec").cast("double").alias("monetary"),
        )
        # keyed-only (r14): AQE-coalescible exchange-topped reuse —
        # see q_waiting_orders
        .repartition("c_custkey")
    )
    fracs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    cuts = per.agg(
        F.percentile(F.col("last_s").cast("double"), fracs).alias("rq"),
        F.percentile(F.col("n_orders").cast("double"), fracs).alias("fq"),
        F.percentile(F.col("monetary"), fracs).alias("mq"),
    )

    def score(col, q):
        v = F.col(col).cast("double")
        s = F.lit(1)
        for i in (1, 2, 3):
            s = s + F.when(v > F.element_at(q, i), 1).otherwise(0)
        return s.cast("long")

    return (
        per.crossJoin(F.broadcast(cuts))
        .select(
            "c_custkey",
            "last_s",
            "n_orders",
            F.round("monetary", 2).alias("monetary"),
            score("last_s", F.col("rq")).alias("r_score"),
            score("n_orders", F.col("fq")).alias("f_score"),
            score("monetary", F.col("mq")).alias("m_score"),
        )
        .withColumn(
            "segment",
            (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")),
        )
    )


_ORDERS_RFM_SQL = """
WITH per AS (
  SELECT o_custkey AS c_custkey,
         CAST(FLOOR(epoch(MAX(o_orderdate))) AS BIGINT) AS last_s,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
), cuts AS (
  SELECT
    percentile_cont([0.25, 0.5, 0.75]) WITHIN GROUP
      (ORDER BY CAST(last_s AS DOUBLE)) AS rq,
    percentile_cont([0.25, 0.5, 0.75]) WITHIN GROUP
      (ORDER BY CAST(n_orders AS DOUBLE)) AS fq,
    percentile_cont([0.25, 0.5, 0.75]) WITHIN GROUP
      (ORDER BY monetary) AS mq
  FROM per
), scored AS (
  SELECT c_custkey, last_s, n_orders, ROUND(monetary, 2) AS monetary,
    CAST(1 + (CAST(last_s AS DOUBLE) > rq[1])::INT
           + (CAST(last_s AS DOUBLE) > rq[2])::INT
           + (CAST(last_s AS DOUBLE) > rq[3])::INT AS BIGINT) AS r_score,
    CAST(1 + (CAST(n_orders AS DOUBLE) > fq[1])::INT
           + (CAST(n_orders AS DOUBLE) > fq[2])::INT
           + (CAST(n_orders AS DOUBLE) > fq[3])::INT AS BIGINT) AS f_score,
    CAST(1 + (per.monetary > mq[1])::INT + (per.monetary > mq[2])::INT
           + (per.monetary > mq[3])::INT AS BIGINT) AS m_score
  FROM per CROSS JOIN cuts
)
SELECT *, r_score * 100 + f_score * 10 + m_score AS segment FROM scored
"""


QUERIES = {
    "q_orders_rfm": q_orders_rfm,
    "q_profit_by_nation": q_profit_by_nation,
    "q_priority_shipping": q_priority_shipping,
    "q_parts_supplier_count": q_parts_supplier_count,
    "q_waiting_orders": q_waiting_orders,
    "q_sub_scalar_avg": q_sub_scalar_avg,
    "q_sub_exists": q_sub_exists,
    "q_sub_not_exists": q_sub_not_exists,
    "q_sub_in_agg": q_sub_in_agg,
    "q_sub_top_supplier": q_sub_top_supplier,
    "q_nation_pairs": q_nation_pairs,
    "q_market_share": q_market_share,
    "q_custdist": q_custdist,
    "q_growth_trend": q_growth_trend,
    "q_local_volume": q_local_volume,
    "q_revenue_forecast": q_revenue_forecast,
    "q_returned_items": q_returned_items,
    "q_promo_share": q_promo_share,
    "q_basket_revenue": q_basket_revenue,
    "q_min_cost_supplier": q_min_cost_supplier,
    "q_important_stock": q_important_stock,
    "q_excess_inventory": q_excess_inventory,
}

ORACLES = {
    "q_profit_by_nation": _PROFIT_BY_NATION_SQL,
    "q_priority_shipping": _PRIORITY_SHIPPING_SQL,
    "q_parts_supplier_count": _PARTS_SUPPLIER_COUNT_SQL,
    "q_waiting_orders": _WAITING_ORDERS_SQL,
    "q_sub_scalar_avg": _SUB_SCALAR_AVG_SQL,
    "q_sub_exists": _SUB_EXISTS_SQL,
    "q_sub_not_exists": _SUB_NOT_EXISTS_SQL,
    "q_sub_in_agg": _SUB_IN_AGG_SQL,
    "q_sub_top_supplier": _SUB_TOP_SUPPLIER_SQL,
    "q_nation_pairs": _NATION_PAIRS_SQL,
    "q_market_share": _MARKET_SHARE_SQL,
    "q_custdist": _CUSTDIST_SQL,
    "q_growth_trend": _GROWTH_TREND_SQL,
    "q_local_volume": _LOCAL_VOLUME_SQL,
    "q_revenue_forecast": _REVENUE_FORECAST_SQL,
    "q_returned_items": _RETURNED_ITEMS_SQL,
    "q_promo_share": _PROMO_SHARE_SQL,
    "q_basket_revenue": _BASKET_REVENUE_SQL,
    "q_min_cost_supplier": _MIN_COST_SUPPLIER_SQL,
    "q_important_stock": _IMPORTANT_STOCK_SQL,
    "q_orders_rfm": _ORDERS_RFM_SQL,
    "q_excess_inventory": _EXCESS_INVENTORY_SQL,
}
