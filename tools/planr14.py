"""Dump .explain("formatted") for named queries to plans/r14/<q>_<tag>.txt.

Also supports ``--executed``: runs the query to completion first and
dumps the POST-EXECUTION adaptive plan (final AQE stages — the
evidence form VERDICT r13 item 7 asks for on any AQE-dependent claim)
to plans/r14/<q>_<tag>_executed.txt.

Usage: python tools/planr14.py [--executed] <tag> q_name [...]
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.queries import all_artifacts, all_queries  # noqa: E402
from pgshovel_spark.session import get_session  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    args = sys.argv[1:]
    executed = False
    if args and args[0] == "--executed":
        executed = True
        args = args[1:]
    tag = args[0]
    names = args[1:]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_session("planr14")
    qs = all_queries()
    arts = all_artifacts()
    if executed:
        # artifacts must exist for consuming queries to execute
        for _n, build in arts.items():
            build(spark, SF)
    for name in names:
        if name.startswith("artifact:"):
            df = arts[name.split(":", 1)[1]](spark, SF)
        else:
            df = qs[name](spark, SF)
        safe = name.replace(":", "_")
        if executed:
            # collect() executes THIS DataFrame's QueryExecution — a
            # sink write wraps the plan in a different QueryExecution
            # and the final AQE plan would never materialize on df's
            # own (the round-9 plansnap gotcha).
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            (out_dir / f"{safe}_{tag}_executed.txt").write_text(plan)
            print(f"wrote {safe}_{tag}_executed.txt")
        else:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{safe}_{tag}.txt").write_text(buf.getvalue())
            print(f"wrote {safe}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
