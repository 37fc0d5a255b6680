"""Registry-wide physical-plan linter — the scale-discipline gate.

Analyzes (without executing) every registered query's physical plan at
sf0.001 and flags the anti-patterns that break at 100 TB:

- ``CartesianProduct``: a non-broadcast cross join — quadratic data
  movement.  (BroadcastNestedLoopJoin over a 1-row aggregate is the
  intended broadcast-scalar pattern and is allowed.)
- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan — the
  slow path this engine bans; Arrow batches (``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas``) are allowed.
- Non-vectorized parquet scans (``Batched: false`` on a FileScan):
  the columnar reader fell back to row-by-row decoding, usually a
  schema problem.

Run: ``python tools/plan_lint.py`` — prints one line per violation and
exits non-zero if any; tests/test_plans.py runs the same sweep.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"

#: (pattern, why it is banned)
_BANNED = [
    ("CartesianProduct", "non-broadcast cross join (quadratic shuffle)"),
    ("BatchEvalPython", "row-at-a-time Python UDF (use Arrow/pandas_udf)"),
]


def lint_plan(plan: str) -> list[str]:
    out = []
    for pat, why in _BANNED:
        if pat in plan:
            out.append(f"{pat}: {why}")
    for m in re.finditer(r"Batched: false", plan):
        out.append("FileScan Batched: false (non-vectorized parquet read)")
        break
    return out


def lint_all(spark=None) -> dict[str, list[str]]:
    from pgshovel_spark.queries import all_queries
    from pgshovel_spark.session import get_session

    spark = spark or get_session("plan-lint")
    violations: dict[str, list[str]] = {}
    for name, fn in all_queries().items():
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = lint_plan(plan)
        if bad:
            violations[name] = bad
    return violations


def main() -> None:
    violations = lint_all()
    for name, bad in sorted(violations.items()):
        for b in bad:
            print(f"VIOLATION {name}: {b}")
    print(f"{len(violations)} queries with violations")
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
