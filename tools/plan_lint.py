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
- Defeated column pruning: a FileScan whose ReadSchema covers >= 75%
  of a >= 6-column table.  At 100 TB the scan IS the query cost; a
  wide read on a narrow projection means an opaque boundary (UDF,
  ``select("*")``, cache cut) blocked Catalyst's pruning.  Queries
  that GENUINELY consume most of a table are allowlisted explicitly
  (``_WIDE_SCAN_OK``) after human review — tools/scan_audit.py prints
  the full per-scan width report that feeds that review.

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

#: Reviewed wide reads: (query, table) pairs whose plans genuinely
#: consume >= 75% of the table's columns (verified by reading the
#: query: all five non-payload event columns are load-bearing).
_WIDE_SCAN_OK = {
    ("q_cdc_latest_state", "events"),
    ("q_event_attribution", "events"),
    ("q_join_asof", "events"),
}

_WIDE_FRACTION = 0.75
_MIN_TABLE_WIDTH = 6

_SCAN_RE = re.compile(
    r"FileScan parquet \[(?P<cols>[^\]]*)\][^\n]*?"
    r"Location: InMemoryFileIndex[^\n]*?\[[^\]]*?/(?P<table>\w+)\.parquet",
    re.DOTALL,
)


def lint_plan(plan: str, name: str = "", widths: dict[str, int] | None = None) -> list[str]:
    out = []
    for pat, why in _BANNED:
        if pat in plan:
            out.append(f"{pat}: {why}")
    for m in re.finditer(r"Batched: false", plan):
        out.append("FileScan Batched: false (non-vectorized parquet read)")
        break
    for m in _SCAN_RE.finditer(plan):
        table = m.group("table")
        total = (widths or {}).get(table, 0)
        if total < _MIN_TABLE_WIDTH or (name, table) in _WIDE_SCAN_OK:
            continue
        n = len([c for c in m.group("cols").split(",") if c.strip()])
        if n >= _WIDE_FRACTION * total:
            out.append(
                f"wide scan: {table} reads {n}/{total} columns "
                "(column pruning defeated? allowlist after review)"
            )
    return out


def lint_all(spark=None) -> dict[str, list[str]]:
    from pgshovel_spark.queries import all_queries
    from pgshovel_spark.session import get_session
    from tools.scan_audit import table_widths

    spark = spark or get_session("plan-lint")
    # Spark truncates the FileScan attribute list at
    # spark.sql.debug.maxToStringFields (default 25) to "... N more
    # fields" — on any table wider than ~25 columns the wide-scan
    # count would undercount and the defeated-pruning lint would
    # silently never fire.  Raise it for the lint session so the
    # bracketed list is complete on every table width.
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    widths = table_widths(spark, SF)
    violations: dict[str, list[str]] = {}
    for name, fn in all_queries().items():
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = lint_plan(plan, name, widths)
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
