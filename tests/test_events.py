"""Invariant tests for the event-analytics batch and the
prefix-filtered exact Jaccard join — cross-query conservation
properties and the losslessness claim the oracle hash also proves."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pgshovel_spark.queries.events import (
    q_agg_outliers,
    q_event_attribution,
    q_event_transitions,
)
from pgshovel_spark.queries.similarity import q_sim_jaccard_prefix
from pgshovel_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_attribution_conserves_purchases(spark):
    rows = q_event_attribution(spark, SF).collect()
    n_purchases = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r.n_purchases for r in rows) == n_purchases
    channels = {r.channel for r in rows}
    assert channels <= {"view", "click", "signup", "error", "direct"}


def test_transitions_conserve_events_and_probabilities(spark):
    rows = q_event_transitions(spark, SF).collect()
    n_events = load_table(spark, SF, "events").count()
    assert sum(r.n for r in rows) == n_events
    by_src: dict[str, float] = {}
    for r in rows:
        by_src[r.prev_type] = by_src.get(r.prev_type, 0.0) + r.p
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-3, (src, total)
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert sum(r.n for r in rows if r.prev_type == "START") == n_users


def test_outliers_all_exceed_three_sigma(spark):
    rows = q_agg_outliers(spark, SF).collect()
    assert rows
    assert all(abs(r.z) > 3 for r in rows)


def test_prefix_join_matches_naive_spark_join(spark):
    """Losslessness cross-check INSIDE Spark (the oracle proves it
    cross-engine): candidate pruning must retain exactly the pairs a
    naive all-pairs token join finds at the same threshold."""
    got = {
        (r.id1, r.id2, r.shared, r.union_sz)
        for r in q_sim_jaccard_prefix(spark, SF).collect()
    }
    d = load_table(spark, SF, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(
                F.split(F.lower("text"), "[ \\t\\n\\x0B\\f\\r]+")
            )
        ).alias("t"),
    ).filter(F.col("t") != "")
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = tok.select("lang", F.col("doc_id").alias("id1"), "t")
    b = tok.select(
        F.col("lang").alias("lb"), F.col("doc_id").alias("id2"), F.col("t").alias("tb")
    )
    naive = (
        a.join(b, (F.col("lang") == F.col("lb")) & (F.col("t") == F.col("tb")) & (F.col("id1") < F.col("id2")))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("shared"))
        .join(sizes.select(F.col("doc_id").alias("id1"), F.col("sz").alias("s1")), "id1")
        .join(sizes.select(F.col("doc_id").alias("id2"), F.col("sz").alias("s2")), "id2")
        .select(
            "id1", "id2", "shared", (F.col("s1") + F.col("s2") - F.col("shared")).alias("union_sz")
        )
        .filter(10 * F.col("shared") >= 9 * F.col("union_sz"))
    )
    want = {(r.id1, r.id2, r.shared, r.union_sz) for r in naive.collect()}
    assert got == want
