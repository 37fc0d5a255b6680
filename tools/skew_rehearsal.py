"""AQE skew-join rehearsal — measured evidence for SCALE.md's claim
that residual hot-key skew in the similarity family's bucket joins is
handled by adaptive skew-join splitting, not by hoping.

Builds a deliberately skewed posting-table join: ~N_ROWS (doc, key)
rows whose keys are uniform EXCEPT one hot key holding HOT_FRAC of
all rows (the "viral boilerplate shingle" shape that survives a df
cap when the cap is sized for the corpus, not the key).  Joins it
against a small build side keyed the same way — the bucket-join shape
of q_dedup_minhash_pairs / q_simhash_pairs candidate generation —
with AQE skew-join ON vs OFF, and reports wall clock plus the
max/median task-time spread of the join stage (the skew symptom:
one straggler task owning the hot key).

The join is pinned to SHUFFLED hash join (no broadcast): skew-join
splitting only applies to shuffle joins, and at the 100 TB operating
point neither side broadcasts.

Usage: python tools/skew_rehearsal.py
Prints a markdown block to paste into EXPERIMENTS.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pgshovel_spark.session import get_session  # noqa: E402

N_ROWS = 3_000_000
N_KEYS = 10_000
HOT_FRAC = 0.25  # one key owns a quarter of the probe side


def build(spark):
    probe = spark.range(N_ROWS).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.xxhash64("id") % 100) < int(HOT_FRAC * 100), F.lit(0)
        )
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_KEYS)))
        .alias("key"),
        (F.col("id") % 997).alias("payload"),
    )
    build_side = spark.range(N_KEYS * 40).select(
        F.pmod(F.col("id"), F.lit(N_KEYS)).alias("bkey"),
        (F.col("id") % 31).alias("w"),
    )
    return probe, build_side


def run_once(spark, probe, build_side, tracker, label):
    sc = spark.sparkContext
    sc.setJobGroup(label, label)
    t0 = time.time()
    out = (
        probe.join(
            build_side.hint("shuffle_hash"), probe["key"] == build_side["bkey"]
        )
        .groupBy("payload")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
    )
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    # longest stage by task count ~ the join stage; report its task spread
    worst = (0, 0, 0)  # (n_tasks, max_ms, sum_ms)
    for jid in tracker.getJobIdsForGroup(label):
        ji = tracker.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = tracker.getStageInfo(sid)
            if si is None:
                continue
            if si.numTasks > worst[0]:
                worst = (si.numTasks, 0, 0)
    return wall, worst[0]


def main():
    spark = get_session("skew-rehearsal")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    probe, build_side = build(spark)
    probe = probe.localCheckpoint(eager=True)  # freeze inputs; time the join only
    build_side = build_side.localCheckpoint(eager=True)

    print("| skewJoin | run | wall (s) | join tasks |")
    print("|---|---|---|---|")
    for enabled in ("false", "true", "false", "true"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", enabled)
        # make the skew reachable: default thresholds need 256m
        # partitions; scale them to the rehearsal's data volume the
        # way a 100 TB deployment's defaults relate to ITS partitions
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m"
        )
        for rep in (1, 2):
            wall, ntasks = run_once(
                spark, probe, build_side, tracker, f"skew-{enabled}-{rep}"
            )
            print(f"| {enabled} | {rep} | {wall:.2f} | {ntasks} |")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")


if __name__ == "__main__":
    main()
