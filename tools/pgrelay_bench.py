"""Live-Postgres relay throughput — how fast the capture path moves
committed mutations from a real server into the envelope DataFrame.

The reference relay's published operating class is 10^3-10^4 events/s
per shard (BASELINE.md).  This bench commits N single-row mutations
(plus a bulk wave) to a scratch PostgreSQL, then times the full
capture hop: ``pg_logical_slot_peek_changes`` over the wire client +
test_decoding parse + envelope DataFrame materialization + advance.

What it measures (and what it deliberately doesn't): the DECODE+PARSE
path is a serial driver-side control-plane read — WAL is commit-
ordered, so a slot cannot fan out; per-database sharding is the scale
lever, same as the reference.  Executor fan-out starts after the
parse, which this bench bills too (createDataFrame + count).

Usage: python tools/pgrelay_bench.py [n_rows]
Prints a markdown row set for EXPERIMENTS.md and one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.session import get_session  # noqa: E402
from pgshovel_spark.sources import pglogical as pgl  # noqa: E402
from pgshovel_spark.sources.pgwire import ScratchPostgres  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_session("pgrelay_bench")
    results = {}
    with ScratchPostgres() as p:
        with p.connect() as c:
            c.query(
                "create table relay_bench(id bigint primary key,"
                " v text, score float8)"
            )
            pgl.create_slot(p, "bench_slot")

            # warm-up pull outside the timed waves: Spark session,
            # Arrow path, and from_json codegen bill here (the same
            # first-touch discipline bench.py applies)
            c.query("insert into relay_bench values (0, 'warm', 0.0)")
            df, lsn = pgl.pull_changes(
                spark, p, "bench_slot", key_cols={"relay_bench": ["id"]}
            )
            df.count()
            pgl.advance(p, "bench_slot", lsn)

            # wave 1: one bulk transaction of n rows (bootstrap-style)
            t0 = time.time()
            c.query(
                f"insert into relay_bench select g, 'payload_' || g, g / 7.0"
                f" from generate_series(1, {n}) g"
            )
            commit_s = time.time() - t0

            t0 = time.time()
            df, lsn = pgl.pull_changes(
                spark, p, "bench_slot", key_cols={"relay_bench": ["id"]}
            )
            rows = df.count()
            pull_s = time.time() - t0
            pgl.advance(p, "bench_slot", lsn)
            assert rows == n, (rows, n)
            results["bulk_txn"] = {
                "rows": n,
                "commit_sec": round(commit_s, 2),
                "capture_sec": round(pull_s, 2),
                "capture_rows_per_sec": int(n / pull_s),
            }

            # wave 2: update storm (before+after images, replica identity full)
            c.query("alter table relay_bench replica identity full")
            t0 = time.time()
            c.query(
                f"update relay_bench set score = score + 1"
                f" where id between 1 and {n}"
            )
            commit_s = time.time() - t0
            t0 = time.time()
            df, lsn = pgl.pull_changes(
                spark, p, "bench_slot", key_cols={"relay_bench": ["id"]}
            )
            rows = df.count()
            pull_s = time.time() - t0
            pgl.advance(p, "bench_slot", lsn)
            assert rows == n, (rows, n)
            results["update_full_images"] = {
                "rows": n,
                "commit_sec": round(commit_s, 2),
                "capture_sec": round(pull_s, 2),
                "capture_rows_per_sec": int(n / pull_s),
            }

            # wave 3: many small transactions (OLTP shape, 2k txns)
            n_txn = 2000
            t0 = time.time()
            for i in range(n_txn):
                c.query(
                    f"insert into relay_bench values"
                    f" ({n + 1 + i}, 'oltp_{i}', {i}.5)"
                )
            commit_s = time.time() - t0
            t0 = time.time()
            df, lsn = pgl.pull_changes(
                spark, p, "bench_slot", key_cols={"relay_bench": ["id"]}
            )
            rows = df.count()
            pull_s = time.time() - t0
            pgl.advance(p, "bench_slot", lsn)
            assert rows == n_txn, (rows, n_txn)
            results["small_txns"] = {
                "rows": n_txn,
                "commit_sec": round(commit_s, 2),
                "capture_sec": round(pull_s, 2),
                "capture_rows_per_sec": int(n_txn / pull_s),
                "txns_per_sec_committed": int(n_txn / commit_s),
            }
            pgl.drop_slot(p, "bench_slot")

            # wave 4: the SAME bulk-txn shape through binary pgoutput
            # (SQL-function transport) — the production plugin's decode
            # cost vs test_decoding's text parse
            from pgshovel_spark.sources import pgoutput as po

            po.create_publication(p, "bench_pub", ["relay_bench"])
            po.create_slot_pgoutput(p, "bench_po")
            t0 = time.time()
            c.query(
                f"insert into relay_bench select g + 10000000,"
                f" 'pgout_' || g, g / 7.0 from generate_series(1, {n}) g"
            )
            commit_s = time.time() - t0
            t0 = time.time()
            df, lsn = po.pull_changes_pgoutput(
                spark, p, "bench_po", "bench_pub"
            )
            rows = df.count()
            pull_s = time.time() - t0
            pgl.advance(p, "bench_po", lsn)
            assert rows == n, (rows, n)
            results["pgoutput_bulk_txn"] = {
                "rows": n,
                "commit_sec": round(commit_s, 2),
                "capture_sec": round(pull_s, 2),
                "capture_rows_per_sec": int(n / pull_s),
            }
            pgl.drop_slot(p, "bench_po")

            # wave 5: pgoutput over the REAL walsender transport
            # (START_REPLICATION CopyBoth stream + status update)
            po.create_slot_pgoutput(p, "bench_ws")
            rc = po.PgReplicationConnection(p)
            try:
                stream = rc.start_replication("bench_ws", "bench_pub")
                c.query(
                    f"insert into relay_bench select g + 20000000,"
                    f" 'walsnd_' || g, g / 7.0 from generate_series(1, {n}) g"
                )
                t0 = time.time()
                changes = stream.read(max_seconds=120.0)
                pull_s = time.time() - t0
                stream.send_status(stream.wal_end)
                stream.stop()
            finally:
                rc.close()
            assert len(changes) == n, (len(changes), n)
            results["pgoutput_walsender"] = {
                "rows": n,
                "capture_sec": round(pull_s, 2),
                "capture_rows_per_sec": int(n / pull_s),
            }
            pgl.drop_slot(p, "bench_ws")

    print("| wave | rows | commit s | capture s | capture rows/s |")
    print("|---|---|---|---|---|")
    for k, r in results.items():
        print(
            f"| {k} | {r['rows']} | {r.get('commit_sec', '-')} |"
            f" {r['capture_sec']} | {r['capture_rows_per_sec']} |"
        )
    print(json.dumps({"pgrelay": results}))


if __name__ == "__main__":
    main()
