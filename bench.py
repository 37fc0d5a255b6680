"""Benchmark runner — one JSON line for the driver.

Runs every hash-checked query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; prints
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed twice: a warm-up pass is NOT taken (queries are
timed on their first run after a JVM warm-up on the flagship), because
the driver's baseline (DuckDB) is also cold-cache single-shot.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pgshovel_spark.queries import all_queries  # noqa: E402
from pgshovel_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    spark = get_session("bench")

    qs = all_queries()
    # JVM/codegen warm-up on the flagship so per-query numbers measure
    # the plan, not JIT+classloading.
    qs["q_agg_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.time()
        # noop sink executes the full plan without driver-side collect.
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
