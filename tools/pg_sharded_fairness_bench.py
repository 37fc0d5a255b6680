"""Backpressure fairness across shards — does one hot shard starve
its siblings, and does ``max_changes`` bound the tail?

The round-12 verdict named the risk: a micro-batch is a BARRIER over
its input partitions, so a hot shard's huge batch sets the trigger's
wall-clock and every light shard's freshly-committed rows wait for the
next trigger.  This bench measures that tail directly:

- shard 0 (HOT): a pre-committed backlog of ``--hot-rows`` rows in ONE
  transaction (the worst case — with ``max_changes`` set this also
  exercises intra-commit chunking);
- shards 1..N-1 (LIGHT): trickle writers committing one timestamped
  row every ``--light-period-ms``;
- metric: per-row capture latency of LIGHT rows (land wall-clock minus
  the row's committed client timestamp) while the hot backlog drains,
  plus the hot drain time itself.

Run it twice — ``--max-changes 0`` (unbounded: the whole hot backlog
is one batch) vs ``--max-changes 50000`` (bounded batches interleave
light deliveries) — and compare light p50/p95.

Usage: python tools/pg_sharded_fairness_bench.py [--shards 8]
       [--hot-rows 500000] [--max-changes 50000] [--run-secs 90]
Prints one JSON line (merge into PGRELAY.json under
"pglive_stream_sharded_fairness").
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.session import get_session  # noqa: E402
from pgshovel_spark.sources import pgoutput as po  # noqa: E402
from pgshovel_spark.sources.pgdatasource import register_pgshovel  # noqa: E402
from pgshovel_spark.sources.pgwire import ScratchPostgres  # noqa: E402


def light_writer(params, stop, period_ms):
    with params.connect() as c:
        i = 0
        while not stop.is_set():
            now_ms = int(time.time() * 1000)
            c.query(f"insert into fair_t values ({i}, {now_ms})")
            i += 1
            time.sleep(period_ms / 1000.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--hot-rows", type=int, default=500_000)
    ap.add_argument("--max-changes", type=int, default=50_000)
    ap.add_argument("--light-period-ms", type=int, default=200)
    ap.add_argument("--run-secs", type=int, default=90)
    args = ap.parse_args()
    n = args.shards

    spark = get_session("pg_sharded_fairness")
    register_pgshovel(spark)

    with ScratchPostgres() as p:
        names = [f"fair_{i}" for i in range(n)]
        with p.connect() as c:
            for nm in names:
                c.query(f"create database {nm}")
        prms = {nm: dataclasses.replace(p, database=nm) for nm in names}
        for nm, pp in prms.items():
            with pp.connect() as c:
                c.query(
                    "create table fair_t(id bigint primary key,"
                    " ts_ms bigint)"
                )
            po.create_publication(pp, "fair_pub", ["fair_t"])
            po.create_slot_pgoutput(pp, f"slot_{nm}")
        hot = names[0]
        with prms[hot].connect() as c:
            # ONE transaction: the worst-case hot backlog
            c.query(
                "insert into fair_t select g, 0"
                f" from generate_series(1, {args.hot_rows}) g"
            )

        lock = threading.Lock()
        seen = {"hot": 0, "light_lat_ms": [], "batches": 0,
                "hot_batch_max": 0, "t_hot_drained": None}
        t_start = time.time()
        hot_slot = f"slot_{hot}"

        def land(batch_df, _bid):
            rows = batch_df.groupBy("publisher").agg(
                {"seq": "count"}
            ).collect()
            now_ms = int(time.time() * 1000)
            lats = [
                now_ms - int(r["ts"])
                for r in batch_df.selectExpr(
                    "publisher", "after['ts_ms'] as ts"
                ).collect()
                if r["publisher"] != hot_slot and int(r["ts"]) > 0
            ]
            with lock:
                seen["batches"] += 1
                seen["light_lat_ms"].extend(lats)
                for r in rows:
                    cnt = r["count(seq)"]
                    if r["publisher"] == hot_slot:
                        seen["hot"] += cnt
                        seen["hot_batch_max"] = max(
                            seen["hot_batch_max"], cnt
                        )
                        if (seen["hot"] >= args.hot_rows
                                and seen["t_hot_drained"] is None):
                            seen["t_hot_drained"] = time.time() - t_start

        shards_opt = json.dumps(
            [
                {"slot": f"slot_{nm}", "publication": "fair_pub",
                 "database": nm}
                for nm in names
            ]
        )
        src = (
            spark.readStream.format("pgshovel")
            .option("sockdir", p.sockdir)
            .option("shards", shards_opt)
        )
        if args.max_changes:
            src = src.option("max_changes", str(args.max_changes))
        q = (
            src.load()
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", f"{p.sockdir}/ck_fair")
            .trigger(processingTime="300 milliseconds")
            .start()
        )

        stop = threading.Event()
        threads = [
            threading.Thread(
                target=light_writer,
                args=(prms[nm], stop, args.light_period_ms),
            )
            for nm in names[1:]
        ]
        for t in threads:
            t.start()
        deadline = time.time() + args.run_secs
        while time.time() < deadline:
            with lock:
                if (seen["t_hot_drained"] is not None
                        and len(seen["light_lat_ms"]) >= 50):
                    break
            time.sleep(0.5)
        stop.set()
        for t in threads:
            t.join()
        q.stop()

        lats = sorted(seen["light_lat_ms"])

        def pct(q_):
            return int(lats[min(len(lats) - 1, int(len(lats) * q_))])

        out = {
            "shards": n,
            "hot_rows": args.hot_rows,
            "max_changes": args.max_changes or None,
            "hot_drain_sec": (
                round(seen["t_hot_drained"], 1)
                if seen["t_hot_drained"] is not None
                else None
            ),
            "hot_batch_max_rows": seen["hot_batch_max"],
            "light_rows": len(lats),
            "light_lat_p50_ms": pct(0.50) if lats else None,
            "light_lat_p95_ms": pct(0.95) if lats else None,
            "light_lat_max_ms": int(lats[-1]) if lats else None,
            "batches": seen["batches"],
            "note": (
                "1 hot shard (single-txn backlog) + N-1 light trickle"
                " shards; light latency = land wall minus committed"
                " client ts while the hot backlog drains"
            ),
        }
        print(json.dumps({"pglive_stream_sharded_fairness": out}))


if __name__ == "__main__":
    main()
