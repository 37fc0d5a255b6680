"""Streaming-layer throughput/latency bench (round 9).

§2.H is equivalence-tested against batch analogs but had no measured
number.  This tool drives three representative stateful pipelines from
a RATE source at two input rates and reports steady-state throughput
and per-batch latency from ``StreamingQuery.recentProgress``:

- ``dedup``: dropDuplicatesWithinWatermark over a 50%-duplicate key
  stream (the idempotent-consumption operator, RocksDB-backed state);
- ``sessionize``: session_window groupBy per user (closed-session
  emission, append mode after watermark);
- ``jdbc_merge``: foreachBatch latest-per-key + executed ANSI MERGE on
  an embedded Derby warehouse (the CDC hand-off sink) — the end-to-end
  exactly-once path, bottlenecked by the per-batch transaction.

Protocol: pipelines run SEQUENTIALLY in one local[32] process (each
query stopped before the next starts); per (pipeline, rate) the query
runs ~RUN_SECS, the first two micro-batches are discarded as warm-up,
and the remaining batches report mean processedRowsPerSecond and mean
triggerExecution ms.  Steady-state rates are comparable across runs in
a way single walls are not (the scheduler-floor argument of
BASELINE.md does not apply: each batch amortizes the floor).

Usage: python tools/streambench.py [--run-secs 25]
Writes STREAMBENCH.json at the repo root and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from pgshovel_spark.session import get_session  # noqa: E402
from pgshovel_spark.streaming.ops import sessionize_stream, stream_dedup  # noqa: E402
from pgshovel_spark.streaming.sinks import JdbcMergeSink  # noqa: E402

RATES = (50_000, 200_000)
N_USERS = 5_000


def rate_events(spark, rows_per_second: int) -> DataFrame:
    """Rate source shaped like the events table: 50% duplicate
    event_ids (value div 2) so the dedup operator has real work."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", 8)
        .load()
        .select(
            (F.col("value") / 2).cast("long").alias("event_id"),
            F.pmod(F.col("value"), F.lit(N_USERS)).cast("long").alias("user_id"),
            F.col("timestamp").alias("ts"),
            (F.pmod(F.col("value"), F.lit(97)) / 97.0).alias("value"),
        )
    )


def run_pipeline(spark, name: str, rate: int, run_secs: int, work: str) -> dict:
    src = rate_events(spark, rate)
    ckpt = tempfile.mkdtemp(prefix=f"sb_{name}_{rate}_")
    if name == "dedup":
        out = stream_dedup(src, ["event_id"], ts_col="ts", watermark="30 seconds")
        q = (
            out.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .start()
        )
    elif name == "sessionize":
        out = sessionize_stream(src, gap="2 seconds", watermark="2 seconds")
        q = (
            out.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
    elif name == "jdbc_merge":
        url = f"jdbc:derby:{work}/sb_{rate};create=true"
        jvm = spark._jvm
        con = jvm.java.sql.DriverManager.getConnection(url)
        st = con.createStatement()
        st.executeUpdate(
            "CREATE TABLE user_state (user_id BIGINT PRIMARY KEY,"
            " um BIGINT, event_id BIGINT, val DOUBLE)"
        )
        st.close()
        con.close()
        cols = ["USER_ID", "UM", "EVENT_ID", "VAL"]
        sink = JdbcMergeSink(
            url,
            "user_state",
            keys=["USER_ID"],
            order_cols=["UM", "EVENT_ID"],
            columns=cols,
            connection_factory=lambda: jvm.java.sql.DriverManager.getConnection(url),
            driver="org.apache.derby.jdbc.EmbeddedDriver",
            staging_table=f"stage_{rate}",
        )
        shaped = src.select(
            F.col("user_id").alias("USER_ID"),
            F.unix_micros("ts").alias("UM"),
            F.col("event_id").alias("EVENT_ID"),
            F.col("value").alias("VAL"),
        )
        q = (
            shaped.writeStream.foreachBatch(sink.apply)
            .option("checkpointLocation", ckpt)
            .start()
        )
    else:
        raise ValueError(name)

    time.sleep(run_secs)
    prog = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    q.awaitTermination(30)
    # steady state: drop the first two micro-batches (cold codegen/state)
    steady = [p for p in prog[2:] if p.get("numInputRows", 0) > 0]
    if not steady:
        steady = prog[-1:]

    def mean(xs):
        xs = [x for x in xs if x is not None]
        return round(sum(xs) / len(xs), 1) if xs else None

    return {
        "pipeline": name,
        "input_rate": rate,
        "n_batches": len(steady),
        "total_input_rows": int(sum(p.get("numInputRows", 0) for p in steady)),
        "processed_rows_per_sec": mean(
            [p.get("processedRowsPerSecond") for p in steady]
        ),
        "batch_ms_mean": mean(
            [p.get("durationMs", {}).get("triggerExecution") for p in steady]
        ),
        "batch_ms_max": max(
            p.get("durationMs", {}).get("triggerExecution", 0) for p in steady
        ),
        "state_rows": max(
            (
                s.get("numRowsTotal", 0)
                for p in steady
                for s in p.get("stateOperators", [])
            ),
            default=0,
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-secs", type=int, default=25)
    args = ap.parse_args()
    spark = get_session("streambench", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sb_derby_")
    rows = []
    for name in ("dedup", "sessionize", "jdbc_merge"):
        for rate in RATES:
            r = run_pipeline(spark, name, rate, args.run_secs, work)
            print(f"done {name}@{rate}: {r}", file=sys.stderr)
            rows.append(r)
    out = {
        "protocol": (
            f"rate source, sequential pipelines, {args.run_secs}s each, "
            "first 2 batches discarded; local[32]"
        ),
        "rows": rows,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "STREAMBENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("| pipeline | input rate (rows/s) | processed rows/s | batch mean ms | batch max ms | state rows |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['pipeline']} | {r['input_rate']} | "
            f"{r['processed_rows_per_sec']} | {r['batch_ms_mean']} | "
            f"{r['batch_ms_max']} | {r['state_rows']} |"
        )


if __name__ == "__main__":
    main()
