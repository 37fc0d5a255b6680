"""Registry-wide audit for DUPLICATED SUBTREES in executed plans.

Round-8 finding (EXPERIMENTS.md): when a query joins a table to a
broadcast DERIVED FROM ITSELF, DeduplicateRelations re-aliases one
occurrence and AQE's stage-level dedup then misses the canonically
identical exchanges — the whole subtree (including the corpus scan)
plans and EXECUTES twice.  Locally that is a hidden job or two; at
100 TB it is a second pass over the corpus.

This audit executes every registry query at sf0.001 and counts, per
parquet location, how many DISTINCT attribute-id sets its FileScans
carry in the FINAL adaptive plan: >1 set for the same file means the
scan subtree was duplicated (intentional self-joins read through a
cache or carry different predicates; those are listed for review, not
auto-failed).

Usage: python tools/selfref_audit.py [--sf DIR] [q_name ...]
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.queries import all_queries  # noqa: E402
from pgshovel_spark.session import get_session  # noqa: E402

_SCAN = re.compile(
    r"FileScan parquet \[([^\]]*)\].*?Location: [A-Za-z]+\(\d+ paths?\)\[([^\]]+)\]"
    r".*?PushedFilters: \[([^\]]*)\].*?ReadSchema: (\S+)"
)


def _strip_ids(s: str) -> str:
    return re.sub(r"#\d+L?", "", s)


def scan_sets(plan: str) -> dict[str, list]:
    """location -> (id_sets, work_sigs): how many distinct attribute-id
    sets the location's scans carry, and how many distinct
    (PushedFilters, ReadSchema) work signatures.  id_sets > work_sigs
    means IDENTICAL scan work was planned more than once (true
    duplication); id_sets == work_sigs > 1 means the scans do
    different work (intentional self-join / different slices)."""
    # Parse only the FINAL adaptive plan: AdaptiveSparkPlan.toString
    # appends an "== Initial Plan ==" section that still shows the
    # pre-reuse duplicate subtree — a stage AQE actually fed from a
    # ReusedExchange would be double-counted from that section (seen
    # on q_important_stock's exchange-topped per-part aggregate, whose
    # runtime metrics show the lineitem scan executing exactly once).
    plan = plan.split("== Initial Plan ==")[0]
    ids_by_loc: dict[str, set[str]] = defaultdict(set)
    work_by_loc: dict[str, set[str]] = defaultdict(set)
    for cols, loc, filt, schema in _SCAN.findall(plan):
        loc = loc.split(",")[0]
        ids_by_loc[loc].add(",".join(sorted(re.findall(r"#(\d+)L?", cols))))
        work_by_loc[loc].add(_strip_ids(filt) + "|" + schema)
    return {
        loc: (len(ids_by_loc[loc]), len(work_by_loc[loc])) for loc in ids_by_loc
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    spark = get_session("selfref_audit")
    qs = all_queries()
    names = args or list(qs)
    flagged = []
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - audit keeps going
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            continue
        waste = {}
        divergent = {}
        for loc, (n_ids, n_work) in scan_sets(plan).items():
            if n_ids > n_work:
                waste[loc] = (n_ids, n_work)
            elif n_ids > 1:
                divergent[loc] = n_ids
        if waste:
            flagged.append((name, waste))
            pretty = ", ".join(
                f"{Path(loc).name} planned x{n} for {w} work signature(s)"
                for loc, (n, w) in sorted(waste.items())
            )
            print(f"WASTE {name}: {pretty}")
        elif divergent:
            pretty = ", ".join(
                f"{Path(loc).name} x{n}" for loc, n in sorted(divergent.items())
            )
            print(f"ok-divergent {name}: {pretty}")
    print(f"\n{len(flagged)} queries with identical scan work planned twice "
          f"(out of {len(names)} checked)")


if __name__ == "__main__":
    main()
