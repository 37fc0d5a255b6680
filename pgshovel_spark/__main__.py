"""CLI entry point — the engine's operational surface.

The reference shipped a `pgshovel` CLI for administration
(create-set/upgrade — ZooKeeper + trigger install); this engine's
operations are queries and pipelines, so the CLI surfaces those:

    python -m pgshovel_spark list
    python -m pgshovel_spark run q_agg_pricing_summary --sf-dir /root/testdata/sf0.01 [--limit 20]
    python -m pgshovel_spark sql "SELECT count(*) FROM lineitem" --sf-dir ...
    python -m pgshovel_spark bench [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pgshovel_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries (H = oracle-checked)")

    run = sub.add_parser("run", help="run one named query, print rows")
    run.add_argument("name")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=20)
    run.add_argument("--explain", action="store_true", help="print the physical plan instead")

    sql = sub.add_parser("sql", help="run ad-hoc SQL over the registered views")
    sql.add_argument("query")
    sql.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sql.add_argument("--limit", type=int, default=20)

    sub.add_parser("bench", help="time every query; one JSON line")

    args = ap.parse_args(argv)

    from pgshovel_spark.queries import all_oracles, all_queries

    if args.cmd == "list":
        oracles = all_oracles()
        for name in sorted(all_queries()):
            print(f"{name}  [{'H' if name in oracles else 'R'}]")
        return 0

    from pgshovel_spark.session import get_session

    if args.cmd == "run":
        qs = all_queries()
        if args.name not in qs:
            print(f"unknown query {args.name!r}; `list` shows all", file=sys.stderr)
            return 2
        spark = get_session("cli")
        df = qs[args.name](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        else:
            t0 = time.time()
            df.show(args.limit, truncate=False)
            print(f"[{time.time() - t0:.2f}s]", file=sys.stderr)
        return 0

    if args.cmd == "sql":
        from pgshovel_spark.sources.tables import register_views

        spark = get_session("cli")
        register_views(spark, args.sf_dir)
        spark.sql(args.query).show(args.limit, truncate=False)
        return 0

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
