"""Invariant + plan tests for the decision-support subquery batch —
the cross-query consistency properties the per-query oracle hash
can't express (mass conservation, semi/anti complementarity,
broadcast-join physical shape)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pgshovel_spark.queries.decision import (
    q_custdist,
    q_market_share,
    q_nation_pairs,
    q_sub_exists,
    q_sub_in_agg,
    q_sub_not_exists,
    q_sub_scalar_avg,
    q_sub_top_supplier,
)
from pgshovel_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_custdist_conserves_orders_and_customers(spark):
    rows = q_custdist(spark, SF).collect()
    n_customers = load_table(spark, SF, "customer").count()
    n_orders_with_cust = (
        load_table(spark, SF, "orders")
        .join(load_table(spark, SF, "customer"), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .count()
    )
    assert sum(r.custdist for r in rows) == n_customers
    assert sum(r.c_count * r.custdist for r in rows) == n_orders_with_cust


def test_exists_counts_bounded_by_window_orders(spark):
    rows = q_sub_exists(spark, SF).collect()
    in_window = (
        load_table(spark, SF, "orders")
        .filter(
            F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1996-06-30").cast("timestamp"),
            )
        )
        .count()
    )
    assert rows
    assert 0 < sum(r.n_orders for r in rows) <= in_window


def test_not_exists_is_anti_complement(spark):
    """Customers above threshold split exactly into lapsed + active."""
    c = load_table(spark, SF, "customer")
    o = load_table(spark, SF, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    thresh_row = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("t"))
        .collect()[0]
    )
    rich = c.filter(F.col("c_acctbal") > thresh_row.t)
    n_rich = rich.count()
    n_active = rich.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").count()
    lapsed = sum(r.n_customers for r in q_sub_not_exists(spark, SF).collect())
    assert lapsed == n_rich - n_active


def test_top_supplier_revenue_is_the_max(spark):
    rows = q_sub_top_supplier(spark, SF).collect()
    assert len(rows) >= 1
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1  # ties share the max revenue


def test_market_share_in_unit_interval(spark):
    rows = q_market_share(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0


def test_scalar_avg_items_are_strict_subset(spark):
    rows = q_sub_scalar_avg(spark, SF).collect()
    total_items = sum(r.n_items for r in rows)
    n_li = load_table(spark, SF, "lineitem").count()
    assert 0 < total_items < n_li


def test_in_agg_sum_qty_exceeds_threshold(spark):
    rows = q_sub_in_agg(spark, SF).collect()
    assert rows
    assert all(r.sum_qty > 160 for r in rows)


def test_nation_pairs_volume_conserves_total(spark):
    """Every lineitem belongs to exactly one (supp, cust) nation pair,
    so pair volumes must sum to total lineitem revenue (2dp-rounded
    pieces -> compare loosely at 1e-2 * #groups)."""
    rows = q_nation_pairs(spark, SF).collect()
    total = sum(r.volume for r in rows)
    li = load_table(spark, SF, "lineitem")
    exact = li.agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(24,6)"
            )
        ).alias("s")
    ).collect()[0].s
    assert abs(total - float(exact)) < 0.01 * (len(rows) + 1)


def test_subquery_plans_broadcast_dimension_sides(spark):
    for fn in (q_sub_in_agg, q_nation_pairs, q_sub_scalar_avg):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, fn.__name__
    # the anti join's scalar threshold must be broadcast, not collected
    plan = q_sub_not_exists(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
