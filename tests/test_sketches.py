"""Invariant tests for the round-3 sketch / pruning / analytics
operators — the properties the oracle hash can't express (accuracy
bounds, one-sided error, mass conservation)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pgshovel_spark.queries.aggregates import q_agg_salted
from pgshovel_spark.queries.sketches import (
    _HLL_M,
    _HLL_WBITS,
    _tok_occurrences,
    q_bloom_prune,
    q_gap_islands,
    q_sketch_cms,
    q_sketch_hll,
    q_text_zipf,
)
from pgshovel_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_hll_estimate_within_theory_bound(spark):
    rows = q_sketch_hll(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.buckets_nonzero <= _HLL_M
        # registers are 1..WBITS+1, so their sum is bounded
        assert r.buckets_nonzero <= r.sum_registers <= _HLL_M * (_HLL_WBITS + 1)
        # m=64 -> standard error 1.04/sqrt(64) = 13%; allow 4 sigma on
        # the small fixture vocabularies
        assert abs(r.hll_estimate - r.n_exact) / r.n_exact < 0.52, (
            r.lang,
            r.n_exact,
            r.hll_estimate,
        )


def test_cms_error_is_one_sided(spark):
    rows = q_sketch_cms(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.cms_est >= r.true_cnt, (r.lang, r.t)
        assert r.overage == r.cms_est - r.true_cnt


def test_bloom_has_no_false_negatives(spark):
    rows = q_bloom_prune(spark, SF).collect()
    assert rows
    for r in rows:
        # every customer with orders passes the filter; extras are FPs
        assert r.n_bloom_pass >= r.n_with_orders
        assert r.n_false_pos == r.n_bloom_pass - r.n_with_orders
        assert r.n_customers >= r.n_bloom_pass


def test_zipf_conserves_token_mass_and_octave_bounds(spark):
    rows = q_text_zipf(spark, SF).collect()
    total = (
        _tok_occurrences(spark, SF).count()
    )
    assert sum(r.token_mass for r in rows) == total
    for r in rows:
        assert (1 << r.octave) <= r.min_cnt <= r.max_cnt < (1 << (r.octave + 1))
        assert r.n_types >= 1


def test_gap_islands_conserve_events(spark):
    rows = q_gap_islands(spark, SF).collect()
    n_events = load_table(spark, SF, "events").count()
    assert sum(r.island_len * r.n_islands for r in rows) == n_events
    for r in rows:
        assert r.min_span_us <= r.max_span_us
        if r.island_len == 1:
            assert r.min_span_us == 0 and r.max_span_us == 0


def test_salted_agg_equals_plain_agg(spark):
    salted = {r.event_type: (r.n_events, r.sum_value) for r in q_agg_salted(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    plain = {
        r.event_type: (r.n, round(r.s, 2))
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double").alias("s"),
        )
        .collect()
    }
    assert salted == plain


def test_hll_small_range_ln_agrees_across_engines(spark):
    """The HLL small-range correction 64*ln(64/V) is the sketch
    family's ONE libm call; V (empty registers) has only 63 possible
    values, so exhaustively prove the 2dp-rounded value is identical
    on both engines — no half-ulp boundary can flip a registered
    result (queries/sketches.py module header)."""
    import duckdb

    rows = spark.sql(
        "SELECT v, ROUND(64.0 * ln(64.0 / v), 2) AS est"
        " FROM (SELECT explode(sequence(1, 63)) AS v)"
    ).collect()
    got = {r.v: r.est for r in rows}
    want = {
        int(v): float(e)
        for v, e in duckdb.sql(
            "SELECT v, ROUND(64.0 * ln(64.0 / v), 2) AS est"
            " FROM (SELECT unnest(generate_series(1, 63)) AS v)"
        ).fetchall()
    }
    assert got == want
