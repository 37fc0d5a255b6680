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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgshovel_spark.sources.tables import load_table


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint sweep over the star schema: primary-key uniqueness,
    referential integrity, domain ranges, and null checks.

    Fused plan: the referential checks ride the SAME scan as their
    fact table's row checks — orders' PK/date/FK-to-customer checks
    flow from ``orders LEFT JOIN customer(keys DISTINCT)`` (the key
    side is DEDUPED so the join stays 1:1 and preserves fact counts
    EVEN WHEN THE DIM IS DIRTY — a duplicated dim key is exactly the
    anomaly a DQ sweep exists to catch, and it gets its own
    customer_pk_unique row rather than corrupting every orders-side
    count), and both lineitem range checks plus its FK-to-orders
    check from ``lineitem LEFT JOIN orders(keys DISTINCT)``.  All
    four table legs then union into ONE padded-schema stream feeding
    ONE global aggregate: each leg tags its rows and pads the others'
    flag columns with nulls, the partial aggregate collapses every
    map partition to constant-size state before any exchange (sums
    of flags only), and the single one-row result ``stack``s out to
    the 9 constraint rows.  vs the per-leg aggregates this fuses away
    three separate final-aggregate exchange stages — at 100 TB the
    scans are the whole cost of a DQ gate, and both dim sides
    broadcast (keys only).

    PK uniqueness WITHOUT the count-distinct Expand (round-13): both
    key sets the PK checks count are ALREADY deduplicated for the RI
    probes (the broadcast sides), so ``n_distinct`` is a one-row
    count of each existing distinct table (exchange-reused with its
    probe twin) crossJoined onto the flag sums.  The former
    ``COUNT(DISTINCT dkey/dkey2)`` inside the global aggregate made
    Spark Expand the whole 4-leg union 3x and re-shuffle every
    distinct orders/customer key a SECOND time — at scale that is
    billions of already-deduplicated keys through an extra exchange,
    and at sf0.1 it was the query's dominant stage (solo 1.8-2.0 s ->
    0.8-1.2 s, Expand node gone)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")

    flag = lambda cond: cond.cast("long")  # noqa: E731
    zero = F.lit(0).cast("long")
    null_l = F.lit(None).cast("long")

    # the dim KEY side is deduped before the FK probe: the fused plan's
    # per-order counts (o_n, PK, date) ride this join and must stay 1:1
    # even when the dim itself is dirty — a duplicated c_custkey (the
    # very anomaly a DQ sweep exists to catch; it gets its own
    # customer_pk_unique row below) would otherwise inflate every
    # orders-side count and report phantom violations
    # explicit NOT NULL on the shared key tables: (1) matches
    # COUNT(DISTINCT ...) semantics exactly (ignores null keys) when
    # the counting legs below measure them, (2) matches the isnotnull
    # the join would infer on its build side anyway, so the counting
    # leg and the RI probe canonicalize to the SAME exchange subtree
    # and AQE computes the distinct once (ReusedExchange)
    ckeys = (
        c.select("c_custkey").filter(F.col("c_custkey").isNotNull()).distinct()
    )
    okeys = (
        o.select("o_orderkey").filter(F.col("o_orderkey").isNotNull()).distinct()
    )
    o_leg = (
        o.select("o_orderkey", "o_orderdate", "o_custkey")
        .join(
            ckeys,
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .select(
            F.lit(0).alias("leg"),
            flag(
                ~F.col("o_orderdate").between(
                    F.lit("1990-01-01").cast("timestamp"),
                    F.lit("2030-01-01").cast("timestamp"),
                )
            ).alias("f1"),
            flag(F.col("c_custkey").isNull()).alias("f2"),
            zero.alias("f3"),
        )
    )
    li_leg = (
        li.select("l_orderkey", "l_quantity", "l_discount")
        .join(
            okeys,
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .select(
            F.lit(1).alias("leg"),
            flag(~F.col("l_quantity").between(1, 50)).alias("f1"),
            flag(~F.col("l_discount").between(0.0, 0.5)).alias("f2"),
            flag(F.col("o_orderkey").isNull()).alias("f3"),
        )
    )
    c_leg = c.select(
        F.lit(2).alias("leg"),
        flag(F.col("c_name").isNull()).alias("f1"),
        zero.alias("f2"),
        zero.alias("f3"),
    )
    ev_leg = ev.select(
        F.lit(3).alias("leg"),
        flag(F.col("value") < 0).alias("f1"),
        zero.alias("f2"),
        zero.alias("f3"),
    )
    # two COUNTING legs: the PK checks' n_distinct is the row count of
    # the very tables the RI probes broadcast; counting them as union
    # legs keeps the whole query ONE aggregate (no crossJoin branches)
    ok_leg = okeys.select(
        F.lit(4).alias("leg"), zero.alias("f1"), zero.alias("f2"), zero.alias("f3")
    )
    ck_leg = ckeys.select(
        F.lit(5).alias("leg"), zero.alias("f1"), zero.alias("f2"), zero.alias("f3")
    )
    legs = (
        o_leg.unionByName(li_leg)
        .unionByName(c_leg)
        .unionByName(ev_leg)
        .unionByName(ok_leg)
        .unionByName(ck_leg)
    )

    n_of = lambda k: F.sum(flag(F.col("leg") == k))  # noqa: E731
    s_of = lambda k, f: F.sum(F.when(F.col("leg") == k, F.col(f)).otherwise(zero))  # noqa: E731
    sums = legs.agg(
        n_of(0).alias("o_n"),
        s_of(0, "f1").alias("o_date_viol"),
        s_of(0, "f2").alias("fkoc_viol"),
        n_of(1).alias("li_n"),
        s_of(1, "f1").alias("li_qty_viol"),
        s_of(1, "f2").alias("li_disc_viol"),
        s_of(1, "f3").alias("fklo_viol"),
        n_of(2).alias("c_n"),
        s_of(2, "f1").alias("c_name_viol"),
        n_of(3).alias("ev_n"),
        s_of(3, "f1").alias("ev_val_viol"),
        n_of(4).alias("n_ok"),
        n_of(5).alias("n_ck"),
    )
    # n - n_distinct = PK violations, identical to the former
    # COUNT(DISTINCT) over the union
    one = sums.withColumn(
        "o_pk_viol", F.col("o_n") - F.col("n_ok")
    ).withColumn("c_pk_viol", F.col("c_n") - F.col("n_ck"))
    out = one.select(
        F.expr(
            "stack(9,"
            " 'orders_pk_unique', o_n, o_pk_viol,"
            " 'orders_date_in_bounds', o_n, o_date_viol,"
            " 'orders_fk_customer', o_n, fkoc_viol,"
            " 'lineitem_qty_in_range', li_n, li_qty_viol,"
            " 'lineitem_discount_in_range', li_n, li_disc_viol,"
            " 'lineitem_fk_orders', li_n, fklo_viol,"
            " 'customer_pk_unique', c_n, c_pk_viol,"
            " 'customer_name_not_null', c_n, c_name_viol,"
            " 'events_value_non_negative', ev_n, ev_val_viol"
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
  FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o_custkey = c_custkey
  UNION ALL
  SELECT 'lineitem_fk_orders', COUNT(*),
         SUM(CAST(o_orderkey IS NULL AS BIGINT))
  FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l_orderkey = o_orderkey
  UNION ALL
  SELECT 'customer_pk_unique', COUNT(*),
         COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer
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


#: PSI parameters: fixed-width value buckets (width 50, clamped to
#: [0, 9] on BOTH ends) and a calendar cut between the reference (A) and current
#: (B) windows.  Fixed edges — not quantiles — keep the histogram
#: deterministic and mergeable; Laplace (+1) smoothing makes every
#: bucket ratio finite on both engines.
_PSI_CUT = "2024-01-15 00:00:00"
_PSI_W = 50
_PSI_NB = 10


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type — the data-drift
    monitor a training pipeline runs between a reference window and
    the current one (PSI > 0.2 = investigate).

    PSI = Σ_b (pB_b − pA_b) · ln(pB_b / pA_b) over {_PSI_NB}
    fixed-width value buckets, with Laplace-smoothed proportions
    p = (c+1)/(total+{_PSI_NB}).

    Determinism: bucket counts are exact integers (conditional
    aggregation, one scan); each bucket's float term derives from
    identical integer ratios on both engines, and the 10-term sum is
    a SEQUENTIAL FOLD over the bucket-sorted struct array (the
    q_text_entropy posture) so operand order is engine-identical.
    Scale: one corpus scan → (type, bucket)-sized aggregate; the fold
    is row-local over a 10-element array.
    """
    e = load_table(spark, sf_dir, "events")
    t1 = F.lit(_PSI_CUT).cast("timestamp")
    # clamped on BOTH ends: a negative event value would otherwise
    # land in bucket -1, making the Laplace-smoothed proportions span
    # 11 buckets and biasing the PSI (both engines shared the bug, so
    # the hash gate could never surface it)
    b = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(_PSI_NB - 1),
            F.floor(F.col("value") / _PSI_W).cast("long"),
        ),
    )
    counts = (
        e.select("event_type", b.alias("b"), (F.col("ts") < t1).alias("is_a"))
        .groupBy("event_type", "b")
        .agg(
            F.sum(F.col("is_a").cast("long")).alias("ca"),
            F.sum((~F.col("is_a")).cast("long")).alias("cb"),
        )
    )
    # Per-type totals as WINDOW sums over the (type, bucket)-sized
    # counts table — the former groupBy + join-back self-reference
    # planned the corpus scan twice under DeduplicateRelations + the
    # AQE stage-dedup miss (tools/selfref_audit.py); the window costs
    # one exchange of ~10 rows per type instead.
    wt = Window.partitionBy("event_type")
    counts = counts.select(
        "event_type",
        "b",
        "ca",
        "cb",
        F.sum("ca").over(wt).alias("ta"),
        F.sum("cb").over(wt).alias("tb"),
    )
    folded = (
        counts.groupBy("event_type", "ta", "tb")
        .agg(
            F.array_sort(F.collect_list(F.struct("b", "ca", "cb"))).alias("arr")
        )
        .select(
            "event_type",
            "ta",
            "tb",
            F.aggregate(
                "arr",
                F.lit(0.0),
                lambda acc, x: acc
                + (
                    ((x.getField("cb") + 1).cast("double") / (F.col("tb") + _PSI_NB).cast("double"))
                    - ((x.getField("ca") + 1).cast("double") / (F.col("ta") + _PSI_NB).cast("double"))
                )
                * F.log(
                    ((x.getField("cb") + 1) * (F.col("ta") + _PSI_NB)).cast("double")
                    / ((x.getField("ca") + 1) * (F.col("tb") + _PSI_NB)).cast("double")
                ),
            ).alias("psi_raw"),
        )
        .select(
            "event_type",
            F.col("ta").alias("n_ref"),
            F.col("tb").alias("n_cur"),
            (F.round("psi_raw", 6) + 0.0).alias("psi"),
        )
    )
    return folded


_DRIFT_PSI_SQL = f"""
WITH c AS (
  SELECT event_type,
         GREATEST(0, LEAST({_PSI_NB - 1},
                CAST(FLOOR(value / {_PSI_W}) AS BIGINT))) AS b,
         SUM(CASE WHEN ts < TIMESTAMP '{_PSI_CUT}' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN ts < TIMESTAMP '{_PSI_CUT}' THEN 0 ELSE 1 END) AS cb
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, CAST(SUM(ca) AS BIGINT) AS ta, CAST(SUM(cb) AS BIGINT) AS tb
  FROM c GROUP BY 1
), arrs AS (
  SELECT c.event_type, t.ta, t.tb,
         list_sort(list(ROW(b, ca, cb))) AS arr
  FROM c JOIN t USING (event_type)
  GROUP BY 1, 2, 3
)
SELECT event_type, ta AS n_ref, tb AS n_cur,
       ROUND(list_reduce(list_transform(arr, x ->
         (CAST(x[3] + 1 AS DOUBLE) / (tb + {_PSI_NB})
          - CAST(x[2] + 1 AS DOUBLE) / (ta + {_PSI_NB}))
         * LN(CAST((x[3] + 1) * (ta + {_PSI_NB}) AS DOUBLE)
              / ((x[2] + 1) * (tb + {_PSI_NB})))),
         (a, b) -> a + b), 6) + 0.0 AS psi
FROM arrs
"""


#: heavy-hitter report depth (the salting family's sizing input)
_SKEW_TOP = 20


def q_skew_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics: the top-{_SKEW_TOP} heaviest ``user_id``
    keys in events with their absolute and cumulative load share (in
    basis points, exact integer arithmetic) — the measurement that
    sizes the salting/AQE-skew levers (q_join_salted, q_agg_salted):
    a key's share_bp IS its worst-case single-task fraction under
    plain hash partitioning.

    Plan shape: ONE fact shuffle (per-key groupBy count) topped with
    an explicit user_id repartition, so AQE stage reuse feeds BOTH
    consumers — the grand-total aggregate (sum of per-key counts ==
    COUNT(*), so the total never touches the fact table again) and
    the top-k sort — from one map output: the q_important_stock trick
    (EXPERIMENTS.md round 9; runtime metrics show ONE events scan).
    The measured alternatives: rollup-with-GROUPING costs 2 more jobs
    (expand doubles the shuffle), and dropping the repartition
    re-scans the fact table (the AQE stage-dedup miss).  Everything
    after the aggregate is key-cardinality-sized; the final window
    runs over {_SKEW_TOP} rows.
    """
    e = load_table(spark, sf_dir, "events")
    per = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        # keyed-only (r14): AQE-coalescible exchange-topped reuse —
        # see q_waiting_orders
        .repartition("user_id")
    )
    total = per.agg(F.sum("n").alias("tot"))
    top = per.orderBy(F.col("n").desc(), F.col("user_id")).limit(_SKEW_TOP)
    w = Window.orderBy(F.col("n").desc(), F.col("user_id"))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("cum", F.sum("n").over(w))
        .select(
            "user_id",
            F.col("n").alias("n_events"),
            F.col("rk").cast("long").alias("rk"),
            F.expr("n * 10000 div tot").alias("share_bp"),
            F.expr("cum * 10000 div tot").alias("cum_bp"),
        )
    )


_SKEW_KEYS_SQL = f"""
WITH g AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
), t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g
), top AS (
  SELECT user_id, n FROM g
  ORDER BY n DESC, user_id LIMIT {_SKEW_TOP}
)
SELECT user_id, n AS n_events,
       row_number() OVER (ORDER BY n DESC, user_id) AS rk,
       n * 10000 // tot AS share_bp,
       CAST(SUM(n) OVER (ORDER BY n DESC, user_id) * 10000 // tot AS BIGINT)
         AS cum_bp
FROM top, t
"""


QUERIES = {
    "q_dq_checks": q_dq_checks,
    "q_drift_psi": q_drift_psi,
    "q_skew_keys": q_skew_keys,
}
ORACLES = {
    "q_dq_checks": _DQ_CHECKS_SQL,
    "q_drift_psi": _DRIFT_PSI_SQL,
    "q_skew_keys": _SKEW_KEYS_SQL,
}
