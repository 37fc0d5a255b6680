"""Per-job profile of one or more registered queries.

Usage: python tools/jobprof.py [--sf DIR] q_name [q_name ...]

Prebuilds the shared scratch artifacts (so queries run WARM, the
steady state bench.py now reports), then runs each query once cold
(at sf0.001, codegen warm-up) and twice at the target scale, printing
every Spark job the timed runs launched: duration, stage count, task
count.  This is the diagnosis loop for the job-count audit — a query
whose count exceeds its natural action count is re-executing a shared
subtree or paying avoidable AQE stage materializations.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.queries import all_artifacts, all_queries  # noqa: E402
from pgshovel_spark.session import get_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    names = args
    spark = get_session("jobprof")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = all_queries()

    for name, build in all_artifacts().items():
        build(spark, sf_dir)

    for name in names:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        for run in (1, 2):
            g = f"{name}#{run}"
            sc.setJobGroup(g, g)
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            jids = sorted(tracker.getJobIdsForGroup(g))
            print(f"== {name} run{run}: {wall:.2f}s, {len(jids)} jobs")
            for j in jids:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                tasks = dur = 0
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        tasks += si.numTasks
                print(f"   job {j}: stages={list(ji.stageIds)} tasks={tasks}")
    spark.stop()


if __name__ == "__main__":
    main()
