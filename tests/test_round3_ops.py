"""Invariant tests for the late-round-3 operator batch — bound and
plan properties the oracle hash can't express."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pgshovel_spark.queries.joins import q_join_salted
from pgshovel_spark.queries.sketches import q_sketch_quantile
from pgshovel_spark.queries.similarity import q_sim_editdist
from pgshovel_spark.queries.windows import q_win_first_last
from pgshovel_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_sketch_quantile_error_bounded_by_bucket_width(spark):
    """The exact-percentile audit that used to ride inside the
    registered query (a full percentile + global window — dropped from
    the production plan per its docstring): the k-th order statistic,
    k = ceil(q*n/1000), must fall inside the sketch's answer bucket,
    so the estimate error is bounded by the bucket width."""
    rows = q_sketch_quantile(spark, SF).collect()
    assert {r.q_milli for r in rows} == {500, 900, 990}
    vals = sorted(
        r.o_totalprice
        for r in load_table(spark, SF, "orders").select("o_totalprice").collect()
    )
    n = len(vals)
    for r in rows:
        k = -(-r.q_milli * n // 1000)  # ceil(q*n/1000)
        kth = vals[k - 1]
        assert r.bucket * 1000 <= kth < (r.bucket + 1) * 1000, (r, kth)
        assert abs(r.sketch_estimate - kth) <= 500, (r, kth)


def test_salted_join_replicates_dimension(spark):
    plan = q_join_salted(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # conservation: per-type counts match the raw table
    got = {r.event_type: r.n_events for r in q_join_salted(spark, SF).collect()}
    want = {
        r.event_type: r.c
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got == want


def test_first_last_consistency(spark):
    rows = q_win_first_last(spark, SF).collect()
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert len(rows) == n_users
    for r in rows:
        if r.n_events == 1:
            assert r.first_type == r.last_type and r.second_type is None
        else:
            assert r.second_type is not None


def test_editdist_probe_is_zero_for_itself(spark):
    rows = {r.doc_id: r for r in q_sim_editdist(spark, SF).collect()}
    assert rows[0].edit_dist == 0 and rows[0].edit_sim == 1.0
    assert all(r.edit_dist >= 0 and 0.0 <= r.edit_sim <= 1.0 for r in rows.values())
