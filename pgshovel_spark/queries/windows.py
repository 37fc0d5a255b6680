"""Window function operators (SURVEY.md §2.E).

Each window = one shuffle on its partition keys + an in-partition
sort.  Frames (ROWS BETWEEN) are evaluated streaming within the sort,
so memory is O(frame), not O(partition) — safe for skewed users at
100 TB.  Running sums use exact-decimal accumulation (determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgshovel_spark.functions.determinism import dec, epoch_s, exact_sum
from pgshovel_spark.operators.rank import global_ntile
from pgshovel_spark.operators.topk import topk_per_group
from pgshovel_spark.sources.tables import load_table


def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per nation by balance (unique
    tiebreak chain via custkey)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


_WIN_RANK_SQL = """
SELECT
  CAST(c_nationkey AS BIGINT) AS nationkey,
  c_custkey,
  c_acctbal,
  row_number() OVER w AS rn,
  rank() OVER w AS rnk,
  dense_rank() OVER w AS drnk
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
"""


def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (exact-decimal running sum)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        epoch_s("o_orderdate").alias("order_s"),
        F.round(F.sum(dec("o_totalprice")).over(w), 2)
        .cast("double")
        .alias("cum_spend"),
    )


_WIN_RUNNING_SQL = """
SELECT
  o_orderkey,
  o_custkey,
  CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS order_s,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,6))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS cum_spend
FROM orders
"""


def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average of events.value per user (exact decimal
    frame sum / frame count — identical on both engines)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    mov = F.sum(dec("value")).over(w).cast("double") / F.count(F.lit(1)).over(w)
    return e.select(
        "event_id",
        "user_id",
        F.round(mov, 4).alias("moving_avg"),
    )


_WIN_MOVING_SQL = """
SELECT
  event_id,
  user_id,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(24,6))) OVER w AS DOUBLE)
        / COUNT(*) OVER w, 4) AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_win_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling EXACT median of daily revenue — the robust
    (outlier-insensitive) companion to q_win_moving's rolling mean;
    the frame median is an ordered-set aggregate over the window,
    which neither a running sum nor a rank can express.

    Parity: the daily revenue is the DOUBLE cast of an exact-decimal
    sum (identical both engines), and percentile/quantile_cont over
    the ≤7-row frame interpolates on DOUBLE — the q_agg_median
    argument, with the 4-dp rounding absorbing formula-ulp.

    Scale: the global ORDER BY day window is CALENDAR-BOUNDED (one row
    per day — thousands of rows at any corpus size), the documented
    exception to the no-global-window rule (q_skyline precedent); the
    fact table collapses to the daily table in one map-side-combined
    aggregate before any window runs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(F.date_trunc("day", "l_shipdate").alias("day"))
        .agg(exact_sum("l_extendedprice").alias("rev_dec"))
        .select("day", F.col("rev_dec").cast("double").alias("rev"))
    )
    return daily.select(
        epoch_s("day").alias("day_s"),
        F.round("rev", 2).alias("revenue"),
        F.round(
            F.expr(
                "percentile(rev, 0.5) OVER (ORDER BY day"
                " ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
            ),
            4,
        ).alias("med7"),
    )


_WIN_MEDIAN_SQL = """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS day,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS rev
  FROM lineitem GROUP BY 1
)
SELECT CAST(FLOOR(epoch(day)) AS BIGINT) AS day_s,
       ROUND(rev, 2) AS revenue,
       ROUND(quantile_cont(rev, 0.5) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
FROM daily
"""


def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole seconds since previous event per user; -1 for the first
    event (epoch floored BEFORE differencing on both engines)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_s = F.lag(epoch_s("ts")).over(w)
    return e.select(
        "event_id",
        "user_id",
        F.coalesce(epoch_s("ts") - prev_s, F.lit(-1)).cast("long").alias("secs_since_prev"),
    )


_WIN_LAG_SQL = """
SELECT
  event_id,
  user_id,
  COALESCE(
    CAST(FLOOR(epoch(ts)) AS BIGINT)
      - lag(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
          PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id),
    -1) AS secs_since_prev
FROM events
"""


def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles of orders by total price (total order => stable).

    Distributed two-pass rank (operators/rank.py) instead of a bare
    ``Window.orderBy`` — a global window with no partitionBy funnels the
    whole table through ONE task, which is a scale-killer at 100 TB.
    """
    # pre-project: the rank operator CACHES its input (single-execution
    # invariant), and column pruning cannot push through the cache
    # boundary — the operator materializes exactly what it is given
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    tiled = global_ntile(
        o,
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        n_buckets=4,
        bucket_col="quartile",
    )
    return tiled.select("o_orderkey", "o_totalprice", "quartile")


_WIN_NTILE_SQL = """
SELECT
  o_orderkey,
  o_totalprice,
  ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS quartile
FROM orders
"""


def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (window row_number pattern via the
    reusable topk_per_group operator)."""
    o = load_table(spark, sf_dir, "orders")
    top = topk_per_group(
        o,
        group=["o_custkey"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return top.select("o_custkey", "o_orderkey", "o_totalprice", "rn")


_WIN_TOPK_GROUP_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
"""


def q_win_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist per nation by account balance — the
    relative-standing window pair (ties share a value; the unique
    custkey tiebreak keeps the hash deterministic)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    # Emitted as MICRO-UNIT INTEGERS, not round(x, 6) doubles:
    # fractional ROUND of a double is engine-divergent at 6th-decimal
    # .5 boundaries (Spark rounds the SHORTEST decimal repr via
    # BigDecimal, DuckDB rounds the x*1e6 product), and at 600 rows
    # per partition the rank ratios hit such boundaries (found by the
    # full-registry sf0.1 parity sweep; sf0.01's 60-row partitions
    # never did).  round-to-INTEGER of the identical double is safe —
    # a shortest repr can never cross a whole-.5 boundary (x.5 is
    # exactly representable, so it is only ever the repr of itself),
    # and the rank ratios here are provably never exactly .5 micro.
    micro = lambda col: F.round(col * 1000000, 0).cast("long")  # noqa: E731
    return c.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        "c_custkey",
        micro(F.percent_rank().over(w)).alias("pct_rank_micro"),
        micro(F.cume_dist().over(w)).alias("cume_micro"),
    )


_WIN_PERCENT_SQL = """
SELECT
  CAST(c_nationkey AS BIGINT) AS nationkey,
  c_custkey,
  CAST(ROUND(percent_rank() OVER w * 1000000) AS BIGINT) AS pct_rank_micro,
  CAST(ROUND(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_micro
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
"""


def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over the full partition
    frame: each user's first, last, and second event type by the
    (ts, event_id) total order, one summary row per user.

    ``last_value`` uses the UNBOUNDED FOLLOWING frame explicitly (the
    default CURRENT ROW frame is the classic wrong-answer trap).  One
    window shuffle + a row_number filter to collapse to one row per
    user — same single-shuffle shape as the rest of the family.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.expr("unix_micros(ts)").alias("um")
    )
    w = Window.partitionBy("user_id").orderBy("um", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        e.select(
            "user_id",
            F.first("event_type").over(wfull).alias("first_type"),
            F.last("event_type").over(wfull).alias("last_type"),
            F.nth_value("event_type", 2).over(wfull).alias("second_type"),
            F.count(F.lit(1)).over(wfull).alias("n_events"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


_WIN_FIRST_LAST_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS um FROM events
), ranked AS (
  SELECT user_id,
         first_value(event_type) OVER w AS first_type,
         last_value(event_type) OVER w AS last_type,
         nth_value(event_type, 2) OVER w AS second_type,
         COUNT(*) OVER w AS n_events,
         row_number() OVER (PARTITION BY user_id ORDER BY um, event_id) AS rn
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY um, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT user_id, first_type, last_type, second_type, n_events
FROM ranked WHERE rn = 1
"""


QUERIES = {
    # changed/new-this-round first (harness checks in registration order)
    "q_win_median": q_win_median,
    "q_win_first_last": q_win_first_last,
    "q_win_ntile": q_win_ntile,
    "q_win_percent": q_win_percent,
    "q_win_rank": q_win_rank,
    "q_win_running": q_win_running,
    "q_win_moving": q_win_moving,
    "q_win_lag": q_win_lag,
    "q_win_topk_group": q_win_topk_group,
}

ORACLES = {
    "q_win_median": _WIN_MEDIAN_SQL,
    "q_win_first_last": _WIN_FIRST_LAST_SQL,
    "q_win_rank": _WIN_RANK_SQL,
    "q_win_running": _WIN_RUNNING_SQL,
    "q_win_moving": _WIN_MOVING_SQL,
    "q_win_lag": _WIN_LAG_SQL,
    "q_win_ntile": _WIN_NTILE_SQL,
    "q_win_topk_group": _WIN_TOPK_GROUP_SQL,
    "q_win_percent": _WIN_PERCENT_SQL,
}
