"""Bench-REPLICA job profiler: measures per-query job counts the way
bench.py records them — shared artifacts prebuilt (warm), but every
persisted block dropped before each timed run (bench's
_drop_stale_blocks housekeeping), so per-query materialize() caches
repopulate inside the measured window.  tools/jobprof.py measures the
warm-cache steady state instead; BENCH_DETAIL's spark_jobs matches
THIS tool's numbers.

Usage: python tools/benchprof.py [--sf DIR] [--runs N] q_name [...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.queries import all_artifacts, all_queries  # noqa: E402
from pgshovel_spark.session import get_session  # noqa: E402


def drop_blocks(sc) -> None:
    jmap = sc._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    ids = []
    while it.hasNext():
        ids.append(it.next().getKey())
    for rid in ids:
        sc._jsc.sc().unpersistRDD(rid, True)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 2
    while args and args[0].startswith("--"):
        if args[0] == "--sf":
            sf_dir = args[1]
        elif args[0] == "--runs":
            runs = int(args[1])
        args = args[2:]
    names = args
    spark = get_session("benchprof")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = all_queries()

    for name, build in all_artifacts().items():
        build(spark, sf_dir)

    # same untimed schema pre-touch as bench.py — without it the first
    # query touching each table absorbs a one-off footer/listing job
    from pgshovel_spark.sources.tables import dim_catalog, load_tables

    load_tables(spark, sf_dir)
    dim_catalog(spark, sf_dir)

    for name in names:
        # codegen warm-up at the smallest fixture, like bench.py
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        for run in range(1, runs + 1):
            drop_blocks(sc)
            g = f"{name}#{run}"
            sc.setJobGroup(g, g)
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            jids = tracker.getJobIdsForGroup(g)
            print(f"== {name} run{run}: {wall:.2f}s, {len(jids)} jobs", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
