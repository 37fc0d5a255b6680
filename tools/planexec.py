"""Print the POST-EXECUTION adaptive plan (final AQE plan) for queries —
shows which exchanges/broadcasts actually materialized as query stages.

Usage: python tools/planexec.py [--sf DIR] q_name [...]
"""

from __future__ import annotations

import sys
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
    spark = get_session("planexec")
    qs = all_queries()
    for name, build in all_artifacts().items():
        build(spark, sf_dir)
    from pgshovel_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).schema
    for name in args:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(f"===== {name}")
        for line in plan.splitlines():
            u = line
            if any(
                k in u
                for k in (
                    "Exchange",
                    "BroadcastExchange",
                    "ReusedExchange",
                    "Scan",
                    "AdaptiveSparkPlan",
                    "Subquery",
                    "Join",
                    "Window",
                    "HashAggregate",
                    "Coalesce",
                    "TakeOrdered",
                    "InMemory",
                )
            ):
                print(line[:200])
    spark.stop()


if __name__ == "__main__":
    main()
