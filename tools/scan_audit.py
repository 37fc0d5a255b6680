"""Registry-wide scan-width audit — column-pruning evidence.

For every registered query, walks the optimized physical plan's
parquet FileScans and compares each scan's ReadSchema width against
the table's full schema width.  At 100 TB the scan is the dominant
cost, and a scan that reads columns the query never uses means
Catalyst's column pruning was defeated (usually by an opaque UDF
boundary, a ``select("*")``, or a cache cut below the projection).

Prints one line per (query, table) scan:

    q_name  table=lineitem read=4/16 cols [l_extendedprice, ...]

and a FLAG section for scans reading >= the flag fraction of a wide
table's columns.  Wide reads are not automatically wrong (profile /
DQ queries genuinely touch most columns) — the flag list is for human
review; tests/test_plans.py pins the reviewed allowlist so a pruning
regression fails CI.

Run: ``python tools/scan_audit.py [--sf DIR]``.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"
FLAG_FRACTION = 0.75  # scans reading >= this fraction of a table get flagged
MIN_TABLE_WIDTH = 6  # narrow tables (region/nation) can't be "unpruned"

_SCAN_RE = re.compile(
    r"FileScan parquet \[(?P<cols>[^\]]*)\][^\n]*?"
    r"Location: InMemoryFileIndex[^\n]*?\[[^\]]*?/(?P<table>\w+)\.parquet",
    re.DOTALL,
)


def table_widths(spark, sf_dir: str) -> dict[str, int]:
    from pgshovel_spark.sources.tables import TABLES, load_table

    return {t: len(load_table(spark, sf_dir, t).columns) for t in TABLES}


def scans_of(df) -> list[tuple[str, list[str]]]:
    """(table, read columns) for every parquet FileScan in the plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for m in _SCAN_RE.finditer(plan):
        cols = [c.split("#")[0].strip() for c in m.group("cols").split(",") if c.strip()]
        out.append((m.group("table"), cols))
    return out


def audit(spark=None, sf_dir: str = SF):
    from pgshovel_spark.queries import all_queries
    from pgshovel_spark.session import get_session

    spark = spark or get_session("scan-audit")
    # complete FileScan attribute lists on any table width (default 25
    # truncates to "... N more fields" and undercounts wide reads)
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    widths = table_widths(spark, sf_dir)
    rows = []  # (query, table, n_read, n_total, cols)
    for name, fn in all_queries().items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # pragma: no cover - registry queries all build
            print(f"ERROR building {name}: {e}", file=sys.stderr)
            continue
        for table, cols in scans_of(df):
            if table not in widths:
                continue
            rows.append((name, table, len(cols), widths[table], cols))
    return rows


def main() -> None:
    sf_dir = SF
    args = sys.argv[1:]
    if args and args[0] == "--sf":
        sf_dir = args[1]
    rows = audit(sf_dir=sf_dir)
    flagged = []
    for name, table, n, total, cols in sorted(rows):
        line = f"{name}  table={table} read={n}/{total}"
        if total >= MIN_TABLE_WIDTH and n >= FLAG_FRACTION * total:
            flagged.append((name, table, n, total, cols))
        print(line)
    print(f"\n{len(rows)} scans audited across the registry")
    if flagged:
        print(f"\nFLAGGED (>= {FLAG_FRACTION:.0%} of a >= {MIN_TABLE_WIDTH}-col table):")
        for name, table, n, total, cols in flagged:
            print(f"  {name}  {table} {n}/{total}: {', '.join(sorted(set(cols)))}")
    sys.exit(0)


if __name__ == "__main__":
    main()
