"""Per-job diagnostics for one query under bench conditions: prints each
Spark job's stages so the exchange that caused it can be identified.

Usage: python tools/jobdesc.py [--sf DIR] q_name [...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.queries import all_artifacts, all_queries  # noqa: E402
from pgshovel_spark.session import get_session  # noqa: E402
from tools.benchprof import drop_blocks  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    spark = get_session("jobdesc")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = all_queries()
    for name, build in all_artifacts().items():
        build(spark, sf_dir)
    # pre-touch every table schema like bench.py so listing jobs don't bill
    from pgshovel_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).schema
    for name in args:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        drop_blocks(sc)
        g = f"{name}#d"
        sc.setJobGroup(g, g)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        jids = sorted(tracker.getJobIdsForGroup(g))
        print(f"== {name}: {len(jids)} jobs")
        for j in jids:
            info = tracker.getJobInfo(j)
            stages = []
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si:
                    stages.append(f"{sid}:{si.name.splitlines()[0][:90]} n={si.numTasks}")
            print(f"  job {j}: " + (" | ".join(stages) or "?"))
    spark.stop()


if __name__ == "__main__":
    main()
