"""Bootstrap-then-stream handoff throughput — the day-one CDC
operation measured end to end on a live server.

Scenario (the test_pg_atomic_bootstrap_stream_handoff drill at bench
scale): N pre-loaded rows, the slot created WITH its exported snapshot
(``exported_slot_snapshot`` — CREATE_REPLICATION_SLOT ... (SNAPSHOT
'export') on the walsender connection), the native batch source
bootstraps on that snapshot while a concurrent writer commits M more
rows, then the native streaming source drains exactly those M from the
slot.  Exactness is asserted structurally: the bootstrap sees exactly
the N pre-consistent-point rows, the stream delivers exactly the M
post-point rows, zero overlap — no idempotent sink absorbing anything.

Usage: python tools/pg_handoff_bench.py [n_boot] [m_stream]
Prints a markdown row and one JSON line (merge into PGRELAY.json
under "pg_bootstrap_handoff").
"""

from __future__ import annotations

import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.session import get_session  # noqa: E402
from pgshovel_spark.sources import pglogical as pgl  # noqa: E402
from pgshovel_spark.sources import pgoutput as po  # noqa: E402
from pgshovel_spark.sources.pgdatasource import register_pgshovel  # noqa: E402
from pgshovel_spark.sources.pgwire import ScratchPostgres  # noqa: E402


def main() -> None:
    n_boot = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    m_stream = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    spark = get_session("pg_handoff_bench")
    register_pgshovel(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")

    with ScratchPostgres() as p:
        with p.connect() as c:
            c.query(
                "create table hob_src(id bigint primary key, v text,"
                " score float8)"
            )
            c.query(
                f"insert into hob_src select g, 'boot_' || g, g / 7.0"
                f" from generate_series(1, {n_boot}) g"
            )
        po.create_publication(p, "hob_pub", ["hob_src"])

        t_all = time.time()
        t0 = time.time()
        ctx = po.exported_slot_snapshot(p, "hob_slot")
        cpoint, snap = ctx.__enter__()
        slot_create_s = time.time() - t0
        boot_rows = 0
        try:
            # concurrent writer: commits DURING the bootstrap scan, in
            # 1k-row transactions — all after the consistent point
            def writer():
                with p.connect() as c:
                    for lo in range(0, m_stream, 1000):
                        c.query(
                            f"insert into hob_src select g + {n_boot},"
                            f" 'live_' || g, g / 7.0 from"
                            f" generate_series({lo + 1}, {lo + 1000}) g"
                        )

            wt = threading.Thread(target=writer)
            wt.start()
            t0 = time.time()
            boot_rows = (
                spark.read.format("pgshovel")
                .option("sockdir", p.sockdir)
                .option("table", "hob_src")
                .option("partition_col", "id")
                .option("num_partitions", "8")
                .option("snapshot", snap)
                .load()
                .count()
            )
            boot_s = time.time() - t0
            wt.join()
        finally:
            ctx.__exit__(None, None, None)
        assert boot_rows == n_boot, (boot_rows, n_boot)

        # stream half: drain the slot through the native source; the
        # foreachBatch counter tracks (rows, min id, max id) so the
        # zero-overlap claim is structural, not count-only
        seen = {"rows": 0, "min": None, "max": None}
        lock = threading.Lock()

        def land(batch_df, _bid):
            from pyspark.sql import functions as F

            agg = batch_df.agg(
                F.count("*"),
                F.min(F.col("after")["id"].cast("long")),
                F.max(F.col("after")["id"].cast("long")),
            ).collect()[0]
            with lock:
                seen["rows"] += agg[0]
                if agg[0]:
                    seen["min"] = (
                        agg[1] if seen["min"] is None else min(seen["min"], agg[1])
                    )
                    seen["max"] = (
                        agg[2] if seen["max"] is None else max(seen["max"], agg[2])
                    )

        t0 = time.time()
        q = (
            spark.readStream.format("pgshovel")
            .option("sockdir", p.sockdir)
            .option("slot", "hob_slot")
            .option("publication", "hob_pub")
            .load()
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", f"{p.sockdir}/ck_hob")
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            while seen["rows"] < m_stream and time.time() - t0 < 120:
                time.sleep(0.2)
            stream_s = time.time() - t0
        finally:
            q.stop()
        total_s = time.time() - t_all
        assert seen["rows"] == m_stream, (seen, m_stream)
        assert seen["min"] == n_boot + 1 and seen["max"] == n_boot + m_stream, seen
        pgl.drop_slot(p, "hob_slot")

    row = {
        "boot_rows": n_boot,
        "stream_rows": m_stream,
        "slot_create_export_sec": round(slot_create_s, 2),
        "bootstrap_scan_sec": round(boot_s, 2),
        "bootstrap_rows_per_sec": int(n_boot / boot_s),
        "stream_drain_sec": round(stream_s, 2),
        "stream_rows_per_sec": int(m_stream / stream_s),
        "total_handoff_sec": round(total_s, 2),
        "zero_overlap": True,
        "note": (
            "exported_slot_snapshot handoff: native batch source on the"
            " slot's own exported snapshot under a concurrent writer,"
            " then the native stream drains exactly the post-point rows"
            " (ids structurally disjoint — no idempotence absorbing)"
        ),
    }
    print("| half | rows | sec | rows/s |")
    print("|---|---|---|---|")
    print(f"| bootstrap | {n_boot} | {row['bootstrap_scan_sec']} | {row['bootstrap_rows_per_sec']} |")
    print(f"| stream | {m_stream} | {row['stream_drain_sec']} | {row['stream_rows_per_sec']} |")
    print(json.dumps({"pg_bootstrap_handoff": row}))


if __name__ == "__main__":
    main()
