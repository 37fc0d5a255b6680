"""Solo artifact-build profiler: times each requested artifact build
the way bench.py does — scratch cleared first, then the build runs
fresh inside a labeled job group — repeated N times so the number is
a distribution, not one draw.

Usage: python tools/artprof.py [--sf DIR] [--runs N] name [...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.operators.scratch import clear_scratch  # noqa: E402
from pgshovel_spark.queries import all_artifacts  # noqa: E402
from pgshovel_spark.session import get_session  # noqa: E402
from tools.benchprof import drop_blocks  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    while args and args[0].startswith("--"):
        if args[0] == "--sf":
            sf_dir = args[1]
        elif args[0] == "--runs":
            runs = int(args[1])
        args = args[2:]
    names = args
    spark = get_session("artprof")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    arts = all_artifacts()

    # untimed schema pre-touch, like bench.py
    from pgshovel_spark.sources.tables import dim_catalog, load_tables

    load_tables(spark, sf_dir)
    dim_catalog(spark, sf_dir)

    # warm codegen at the smallest fixture, like bench.py's warm-up
    warm = "/root/testdata/sf0.001"
    for name in names:
        arts[name](spark, warm)

    for run in range(1, runs + 1):
        clear_scratch(spark, sf_dirs=[sf_dir])
        drop_blocks(sc)
        for name in names:
            g = f"artifact:{name}#{run}"
            sc.setJobGroup(g, g)
            t0 = time.time()
            arts[name](spark, sf_dir)
            wall = time.time() - t0
            jids = tracker.getJobIdsForGroup(g)
            print(f"== artifact:{name} run{run}: {wall:.2f}s, {len(jids)} jobs", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
