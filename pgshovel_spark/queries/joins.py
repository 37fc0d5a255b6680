"""Join operators (SURVEY.md §2.C).

Join strategy posture for 100 TB:

- Equi-joins are declared, never hand-scheduled: Catalyst + AQE pick
  broadcast vs sort-merge per actual sizes, re-planning at runtime.
- Dimension tables (region/nation/customer/part/supplier) are
  broadcast-eligible; ``q_join_broadcast`` pins the hint form and
  tests assert BroadcastHashJoinExec in the plan.
- The range self-join is key-bounded (per user) so the quadratic
  residual never crosses partitions; skew is AQE's problem.
- The as-of join avoids the O(LxR) blow-up entirely (see
  operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgshovel_spark.functions.determinism import dec, dsum, epoch_s, exact_sum
from pgshovel_spark.operators.asof import asof_join
from pgshovel_spark.operators.topk import topk_global
from pgshovel_spark.sources.tables import (
    load_table,
    nation_name_expr,
    nations_in_region,
)


def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders x customer."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "c_name", "o_totalprice"
    )


_JOIN_INNER_SQL = """
SELECT o_orderkey, o_custkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (TPC-H Q5 analog): revenue per nation for
    ASIA-region customers, orders in 1996-1998.

    The two catalog dims resolve driver-side (dim_catalog — the
    InSubqueryExec/metastore pattern): the ASIA filter becomes an
    ``isin`` PUSHED INTO the customer scan and the nation name a
    literal-map projection, replacing two broadcast-join builds whose
    rows never change.  The two fact joins stay Catalyst-planned
    (AQE picks broadcast for customer locally; shuffle at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    revenue = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    asia = nations_in_region(spark, sf_dir, "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c.filter(F.col("c_nationkey").isin(asia)), o.o_custkey == c.c_custkey)
        .filter(
            F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1998-12-31").cast("timestamp"),
            )
        )
        .groupBy(nation_name_expr(spark, sf_dir, F.col("c_nationkey")).alias("n_name"))
        .agg(
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_JOIN_STAR_SQL = """
SELECT
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
GROUP BY n_name
"""


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the part dimension — same answer as the
    plain join; tests assert the BroadcastHashJoin physical op."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum("l_quantity", 2).alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_JOIN_BROADCAST_SQL = """
SELECT
  p_brand,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(24,6))), 2) AS DOUBLE) AS total_qty,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer + aggregate: customers with zero orders preserved."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice", 2), F.lit(0.0)).alias("total_spent"),
        )
    )


_JOIN_LEFT_SQL = """
SELECT
  c_custkey,
  c_name,
  COUNT(o_orderkey) AS n_orders,
  COALESCE(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE), 0.0) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-user click counts vs purchase counts."""
    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("p_user_id"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return clicks.join(
        purchases, clicks.user_id == purchases.p_user_id, "full_outer"
    ).select(
        F.coalesce("user_id", "p_user_id").alias("user_id"),
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
    )


_JOIN_FULL_SQL = """
WITH clicks AS (
  SELECT user_id, COUNT(*) AS n_clicks FROM events WHERE event_type = 'click' GROUP BY user_id
), purchases AS (
  SELECT user_id, COUNT(*) AS n_purchases FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT
  COALESCE(clicks.user_id, purchases.user_id) AS user_id,
  COALESCE(n_clicks, 0) AS n_clicks,
  COALESCE(n_purchases, 0) AS n_purchases
FROM clicks FULL OUTER JOIN purchases ON clicks.user_id = purchases.user_id
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi (EXISTS): customers having at least one 'P' order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti (NOT EXISTS): customers with no 'P' order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""


def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range residual: lineitems shipped >60 days after order
    date (residual evaluated post-join, no extra shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(
            o,
            # INTERVAL arithmetic, not date_add: date_add truncates a
            # timestamp to DATE (midnight), silently diverging from
            # the oracle's o_orderdate + INTERVAL 60 DAY whenever an
            # order timestamp carries a time-of-day
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            epoch_s("l_shipdate").alias("ship_s"),
            epoch_s("o_orderdate").alias("order_s"),
        )
    )


_JOIN_THETA_SQL = """
SELECT
  l_orderkey,
  CAST(l_linenumber AS BIGINT) AS l_linenumber,
  CAST(FLOOR(epoch(l_shipdate)) AS BIGINT) AS ship_s,
  CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS order_s
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
"""


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range self-join: same-user event pairs within 5 minutes.

    The equi-key (user_id) bounds the quadratic residual to one
    partition's worth of rows per user — this is the scalable shape
    for range joins: equi-prefix first, inequality residual second.
    """
    e = load_table(spark, sf_dir, "events")
    a = e.select("user_id", F.col("event_id").alias("id1"), F.col("ts").alias("ts1"))
    b = e.select(
        F.col("user_id").alias("user_id_b"),
        F.col("event_id").alias("id2"),
        F.col("ts").alias("ts2"),
    )
    us1, us2 = F.unix_micros(F.col("ts1")), F.unix_micros(F.col("ts2"))
    pairs = a.join(
        b,
        (F.col("user_id") == F.col("user_id_b"))
        & (F.col("id1") < F.col("id2"))
        & (us2 - us1 > 0)
        & (us2 - us1 <= 300_000_000),
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


_JOIN_RANGE_SQL = """
SELECT a.user_id, COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP)) > 0
 AND epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP)) <= 300000000
GROUP BY a.user_id
"""


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest purchase (by same user) at or before each
    error event.  Spark side: operators.asof_join (union+window, no
    quadratic blow-up).  Oracle: DuckDB native ASOF JOIN."""
    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "ts",
        F.col("value").alias("purchase_value"),
    )
    joined = asof_join(
        errors,
        purchases,
        on=["user_id"],
        order_col="ts",
        right_tiebreak="purchase_id",
        right_value_cols=["purchase_id", "purchase_value"],
        how="inner",
    )
    return joined.select(
        "event_id",
        "user_id",
        epoch_s("ts").alias("error_s"),
        "purchase_id",
        F.round("purchase_value", 2).alias("purchase_value"),
    )


_JOIN_ASOF_SQL = """
SELECT
  e.event_id,
  e.user_id,
  CAST(FLOOR(epoch(e.ts)) AS BIGINT) AS error_s,
  p.event_id AS purchase_id,
  ROUND(p.value, 2) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


#: as-of staleness bound (seconds): a feature older than this is stale
_ASOF_TOL_S = 1800


def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS BOUND — the feature-store
    point-in-time lookup: each error event takes the latest same-user
    purchase at-or-before it, but only if that purchase is at most
    {_ASOF_TOL_S} s old; older matches surface as NULLs (the row
    survives — a missing feature, not a missing event).

    Semantics note: "latest within the window" == "latest overall,
    filtered by the window" (the as-of match IS the maximum — if it
    is too stale, nothing in the window can match), so the tolerance
    composes as a post-join mask over operators/asof.py with zero
    extra data movement; the oracle composes DuckDB's native ASOF
    LEFT JOIN the same way.  All arithmetic in integer epoch seconds.
    """
    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "ts",
        F.col("ts").alias("purchase_ts"),
    )
    joined = asof_join(
        errors,
        purchases,
        on=["user_id"],
        order_col="ts",
        right_tiebreak="purchase_id",
        right_value_cols=["purchase_id", "purchase_ts"],
        how="left",
    )
    stale = epoch_s("ts") - epoch_s("purchase_ts")
    fresh = stale <= _ASOF_TOL_S
    return joined.select(
        "event_id",
        "user_id",
        epoch_s("ts").alias("error_s"),
        F.when(fresh, F.col("purchase_id")).alias("purchase_id"),
        F.when(fresh, epoch_s("purchase_ts")).alias("purchase_s"),
        F.when(fresh, stale).cast("long").alias("staleness_s"),
    )


# Oracle is an explicit windowed latest-row subquery, NOT DuckDB's
# native ASOF LEFT JOIN: ASOF has no tie-break among equal-timestamp
# purchases, so two same-user purchases at one ts would make the
# oracle's purchase_id nondeterministic; ROW_NUMBER ordered by
# (ts DESC, event_id DESC) pins the same winner the Spark side's
# right_tiebreak=purchase_id picks (ADVICE r9).
_JOIN_ASOF_TOLERANCE_SQL = f"""
WITH m AS (
  SELECT e.event_id, e.user_id, e.ts AS error_ts,
         p.event_id AS p_id, p.ts AS p_ts,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY p.ts DESC, p.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'error') e
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
    ON e.user_id = p.user_id AND p.ts <= e.ts
)
SELECT
  event_id,
  user_id,
  CAST(FLOOR(epoch(error_ts)) AS BIGINT) AS error_s,
  CASE WHEN FLOOR(epoch(error_ts)) - FLOOR(epoch(p_ts)) <= {_ASOF_TOL_S}
       THEN p_id END AS purchase_id,
  CASE WHEN FLOOR(epoch(error_ts)) - FLOOR(epoch(p_ts)) <= {_ASOF_TOL_S}
       THEN CAST(FLOOR(epoch(p_ts)) AS BIGINT) END AS purchase_s,
  CASE WHEN FLOOR(epoch(error_ts)) - FLOOR(epoch(p_ts)) <= {_ASOF_TOL_S}
       THEN CAST(FLOOR(epoch(error_ts)) - FLOOR(epoch(p_ts)) AS BIGINT)
       END AS staleness_s
FROM m WHERE rn = 1
"""


def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (bounded enumeration: 5 regions x 25 nations)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        F.col("r_name").alias("region_name"),
        F.col("n_name").alias("nation_name"),
        (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"),
    )


_JOIN_CROSS_SQL = """
SELECT
  r_name AS region_name,
  n_name AS nation_name,
  r_regionkey = n_regionkey AS is_home
FROM region CROSS JOIN nation
"""


def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 under a TOTAL order — planned as
    TakeOrderedAndProject (per-partition heaps, no full sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    top = topk_global(
        li,
        [
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
        10,
    )
    return top.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_extendedprice",
    )


_TOPK_GLOBAL_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 10
"""


# q_join_asof leads: its round-2 rewrite never got a driver row, so it
# must sit as early as possible in the harness's entry window.
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join (shipping priority): BUILDING-segment
    customers x unfilled orders x late-shipped lineitems, top-10 orders
    by revenue.

    Scale shape: this is the query Catalyst's join reordering +
    broadcast selection exists for.  customer (filtered to one
    segment) broadcasts into orders; the surviving orders equi-join
    lineitem on its natural key, so the only big shuffle is
    lineitem's — and the o_orderdate / l_shipdate predicates push to
    the Parquet scans, pruning row groups before any join runs.
    Revenue uses the split-accumulator exact sum (order-independent),
    and the top-10 is rank-deterministic: ORDER BY the ROUNDED exact
    revenue with a full o_orderkey tiebreak, executed as
    TakeOrderedAndProject (per-partition top-k, no global sort).
    """
    cutoff = F.lit("1998-07-01").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            orders.join(
                F.broadcast(cust), orders.o_custkey == cust.c_custkey
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(exact_sum(rev), 2).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            epoch_s("o_orderdate").alias("o_orderdate_s"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


_JOIN_MULTIWAY_SQL = """
SELECT
  o_orderkey,
  CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_s,
  o_orderpriority,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))), 2) AS DOUBLE)
    AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01'
  AND l_shipdate > TIMESTAMP '1998-07-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED join — the skew lever for joins, completing the
    q_agg_salted pair: the (small) dimension side is REPLICATED once
    per salt value and the fact side spreads each hot key across
    ``n_salt`` shuffle partitions via ``event_id % n_salt``, so one hot
    join key (events has only 5 event types — every key is hot) no
    longer lands on a single task.  The oracle is the PLAIN unsalted
    join + aggregate, certifying that salting changes the shuffle
    layout, never the answer.

    At 100 TB this is the manual fallback when AQE's skew-join split
    can't help (e.g. a broadcast-ineligible mid-size dimension with a
    few dominant keys).  Replication factor x dimension size is the
    cost; n_salt bounds the residual per-task row count.
    """
    n_salt = 8
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.min(F.expr("unix_micros(ts)")).alias("first_um"),
    )
    dim_salted = dim.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("salt")
    )
    fact = ev.select(
        "event_type",
        "value",
        (F.col("event_id") % n_salt).alias("salt"),
    )
    return (
        fact.join(F.broadcast(dim_salted), ["event_type", "salt"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("sum_value"),
            F.min("first_event_id").alias("first_event_id"),
            F.min("first_um").alias("first_um"),
        )
    )


_JOIN_SALTED_SQL = """
WITH dim AS (
  SELECT event_type,
         MIN(event_id) AS first_event_id,
         MIN(epoch_us(ts)) AS first_um
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_value,
       MIN(first_event_id) AS first_event_id,
       MIN(first_um) AS first_um
FROM events e JOIN dim ON e.event_type = dim.event_type
GROUP BY e.event_type
"""


QUERIES = {
    "q_join_salted": q_join_salted,
    "q_join_asof": q_join_asof,
    "q_join_asof_tolerance": q_join_asof_tolerance,
    "q_join_multiway": q_join_multiway,
    "q_join_inner": q_join_inner,
    "q_join_star": q_join_star,
    "q_join_broadcast": q_join_broadcast,
    "q_join_left": q_join_left,
    "q_join_full": q_join_full,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_join_theta": q_join_theta,
    "q_join_range": q_join_range,
    "q_join_cross": q_join_cross,
    "q_topk_global": q_topk_global,
}

ORACLES = {
    "q_join_salted": _JOIN_SALTED_SQL,
    "q_join_asof_tolerance": _JOIN_ASOF_TOLERANCE_SQL,
    "q_join_inner": _JOIN_INNER_SQL,
    "q_join_star": _JOIN_STAR_SQL,
    "q_join_broadcast": _JOIN_BROADCAST_SQL,
    "q_join_left": _JOIN_LEFT_SQL,
    "q_join_full": _JOIN_FULL_SQL,
    "q_join_semi": _JOIN_SEMI_SQL,
    "q_join_anti": _JOIN_ANTI_SQL,
    "q_join_theta": _JOIN_THETA_SQL,
    "q_join_range": _JOIN_RANGE_SQL,
    "q_join_asof": _JOIN_ASOF_SQL,
    "q_join_multiway": _JOIN_MULTIWAY_SQL,
    "q_join_cross": _JOIN_CROSS_SQL,
    "q_topk_global": _TOPK_GLOBAL_SQL,
}
