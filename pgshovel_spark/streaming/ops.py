"""Streaming operators (SURVEY.md §2.H).

Each has a hash-checked batch analog in pgshovel_spark.queries.cdc;
tests/test_streaming.py asserts stream==batch equivalence, which is
how correctness is pinned for ops DuckDB can't oracle.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pgshovel_spark.functions.determinism import exact_sum


def tumbling_counts(
    stream: DataFrame, ts_col: str = "ts", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling 1-hour aggregate with watermark (PgQ tick batching
    analog).  Late rows beyond the watermark are dropped — the
    streaming-only behavior the batch analog can't express."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(exact_sum("value"), 2).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("hour_s"),
            "n_events",
            "sum_value",
        )
    )


def stream_ohlc(
    stream: DataFrame, ts_col: str = "ts", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming OHLC candlesticks per (event_type, hour) — the
    incremental form of the batch ``q_ts_resample``.

    Open/close are ``min_by``/``max_by`` over the (um, event_id)
    struct — ASSOCIATIVE, MERGEABLE state (unlike the batch
    row_number formulation, which needs a total sort), so partial
    candles merge correctly across triggers and shuffle partials;
    the (um, event_id) key is the same total order the batch query
    ranks by, so a closed window's candle equals the batch row
    exactly.  State per open window is O(1): two (key, value) pairs,
    min/max, count and the split-long exact sum."""
    key = F.struct(
        F.expr(f"unix_micros({ts_col})").alias("um"), F.col("event_id")
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(exact_sum("value"), 2).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("bucket_s"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    stream: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "30 days"
) -> DataFrame:
    """Idempotent consumption under at-least-once delivery:
    first-occurrence keep per key within the watermark horizon.  State
    size is bounded by the watermark — the knob that keeps this
    feasible on an unbounded 100 TB stream."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def sessionize_stream(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows per user (transaction-framing analog): emits
    one row per closed session."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).cast("long").alias("start_s"),
            F.unix_timestamp(F.col("w.end")).cast("long").alias("end_s"),
            "n_events",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    interval: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream INNER join within a time interval: pair each left
    row with right rows of the same key where ``left_ts <= right_ts <=
    left_ts + interval`` (click→conversion attribution shape).

    Both sides carry watermarks and the join condition bounds event
    time in BOTH directions, so Spark can expire join state — the
    requirement that makes stream-stream joins feasible on unbounded
    input (state is O(watermark window), not O(stream)).  ``left_ts``
    and ``right_ts`` must be distinct column names; the key column is
    taken from the left side in the output.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            "left and right streams share non-key columns "
            f"{sorted(overlap)}; rename or project them before joining "
            "(the output would contain ambiguous duplicates)"
        )
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark).withColumnRenamed(
        key, "__rkey"
    )
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {interval}"))
    )
    return l.join(r, cond).drop("__rkey")


def validate_sequences(
    batch: DataFrame, carry: DataFrame | None = None
) -> DataFrame:
    """Sequence validation + publisher fencing (batch form, usable
    inside foreachBatch — mirrors the reference consumer's
    sequences state machine):

    1. FENCE: keep only rows from each publisher's max epoch.
    2. GAP CHECK: per (publisher, epoch), dense seq must increment by
       1; returns rows annotated with ``seq_gap`` (a gap means a
       corrupt/lossy stream — the reference raises; callers decide).

    A single batch cannot see across micro-batch boundaries — the
    dominant real loss mode (a message dropped BETWEEN batches) and
    the fencing hazard (a late batch carrying only an already-fenced
    old epoch) are both invisible per-batch.  ``carry`` closes that:
    pass a (publisher, epoch, seq) frame holding each stream's
    validated high-water marks (e.g. the previous result's
    ``groupBy(publisher, epoch).agg(max(seq))``, persisted in the
    sink's own table).  Carry rows participate as PHANTOMS: they seed
    the lag window (so the first row after a boundary gap flags) and
    the epoch fence (so stale epochs stay fenced), and are excluded
    from the returned rows.
    """
    src = batch.withColumn("__phantom", F.lit(False))
    if carry is not None:
        src = src.unionByName(
            carry.select("publisher", "epoch", "seq").withColumn(
                "__phantom", F.lit(True)
            ),
            allowMissingColumns=True,
        )
    max_epoch = src.groupBy("publisher").agg(F.max("epoch").alias("max_epoch"))
    fenced = src.join(
        F.broadcast(max_epoch), "publisher"
    ).filter(F.col("epoch") == F.col("max_epoch")).drop("max_epoch")
    w = Window.partitionBy("publisher", "epoch").orderBy("seq")
    return (
        fenced.withColumn(
            "seq_gap",
            F.when(
                F.lag("seq").over(w).isNotNull()
                & (F.col("seq") - F.lag("seq").over(w) != 1),
                True,
            ).otherwise(False),
        )
        .filter(~F.col("__phantom"))
        .drop("__phantom")
    )


#: Output schema of assemble_transactions.
TXN_SCHEMA = StructType(
    [
        StructField("txid", LongType()),
        StructField("n_mutations", LongType()),
        StructField("tables", StringType()),
        StructField("committed_at", TimestampType()),
        StructField("status", StringType()),  # committed | rolled_back | abandoned
    ]
)


def assemble_transactions(changes: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Transaction assembly (the reference relay's Begin->Mutation*->
    Commit framing) as an applyInPandasWithState operator.

    Buffers mutations per txid; emits one summary row when a COMMIT
    marker arrives (op == 'COMMIT'), discards on 'ROLLBACK', and —
    when ``timeout_ms`` is set — emits status='abandoned' when the
    state times out (the reference's abandoned-transaction hazard
    made explicit).

    ``timeout_ms=None`` (default) uses NoTimeout: uncommitted
    transactions stay buffered.  Use a timeout on long-running
    production streams; note that with availableNow replays a pending
    processing-time timeout keeps the query alive until it fires, so
    bounded test replays should leave it off.

    Completed transactions leave a TOMBSTONE in state (status string)
    rather than vanishing: under at-least-once delivery a straggler
    duplicate arriving in a later micro-batch would otherwise
    RE-CREATE the transaction and eventually emit a second,
    contradictory 'abandoned' summary for an already-committed txid.
    Tombstoned groups absorb duplicates silently; with ``timeout_ms``
    set the tombstone expires (without emission) after the same
    duration, bounding state.

    CHECKPOINT COMPATIBILITY: the tombstone added a third state field
    (``stateStructType`` is now ``n LONG, tables STRING, fin STRING``;
    it was ``n LONG, tables STRING`` before).  Spark's state store
    cannot deserialize rows written under the old layout — restarting
    a streaming query from a pre-tombstone checkpoint fails at state
    decode.  Use a FRESH ``checkpointLocation`` when upgrading across
    this change (replay the landing/source from the desired offset).
    """

    def assemble(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (txid,) = key
        if state.hasTimedOut:
            n, tables, fin = state.get if state.exists else (0, "", None)
            state.remove()
            if fin:  # expired tombstone: already reported, stay silent
                return
            yield pd.DataFrame(
                {
                    "txid": [txid],
                    "n_mutations": [n],
                    "tables": [tables],
                    "committed_at": [pd.NaT],
                    "status": ["abandoned"],
                }
            )
            return
        n, tables, fin = state.get if state.exists else (0, "", None)
        if fin:
            # duplicate mutations for a finished transaction: absorb,
            # keep the tombstone armed
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
            return
        table_set = set(tables.split(",")) - {""}
        done = None
        commit_ts = None
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                if row["op"] == "COMMIT":
                    done, commit_ts = "committed", row["ts"]
                elif row["op"] == "ROLLBACK":
                    done = "rolled_back"
                else:
                    n += 1
                    table_set.add(row["table"])
        if done is not None:
            state.update((0, "", done))  # tombstone
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
            if done == "committed":
                yield pd.DataFrame(
                    {
                        "txid": [txid],
                        "n_mutations": [n],
                        "tables": [",".join(sorted(table_set))],
                        "committed_at": [commit_ts],
                        "status": ["committed"],
                    }
                )
        else:
            state.update((n, ",".join(sorted(table_set)), None))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

    return changes.groupBy("txid").applyInPandasWithState(
        assemble,
        outputStructType=TXN_SCHEMA,
        stateStructType="n LONG, tables STRING, fin STRING",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


#: one output row per purchase: the credited channel and its value
ATTRIBUTION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("channel", StringType()),
        StructField("value", DoubleType()),
        StructField("um", LongType()),
    ]
)


def attribute_last_touch(
    events: DataFrame, window_us: int = 7 * 86_400_000_000
) -> DataFrame:
    """Streaming last-touch attribution — the stateful analog of the
    hash-checked batch q_event_attribution: per user, the most recent
    prior non-purchase event within ``window_us`` credits each
    purchase, else 'direct'.

    State per user is ONE (touch_type, touch_um) tuple — O(users)
    state however long the stream runs, no buffered history.  Rows
    within a micro-batch are processed in (um, event_id) order;
    equivalence with the batch query holds when micro-batches arrive
    in event-time order (the file-replay harness guarantees it; a
    production deployment adds a watermark upstream for reordering
    slack).
    """
    src = events.select(
        "user_id",
        "event_type",
        "value",
        "event_id",
        F.expr("unix_micros(ts)").alias("um"),
    )

    def attr(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        tt, tum = state.get if state.exists else ("", -1)
        out_ch, out_val, out_um = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["um", "event_id"])
            for _, row in pdf.iterrows():
                if row["event_type"] == "purchase":
                    fresh = tum >= 0 and tum >= row["um"] - window_us
                    out_ch.append(tt if fresh else "direct")
                    out_val.append(row["value"])
                    out_um.append(row["um"])
                else:
                    tt, tum = row["event_type"], row["um"]
        state.update((tt, tum))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_ch),
                "channel": out_ch,
                "value": out_val,
                "um": out_um,
            }
        )

    return src.groupBy("user_id").applyInPandasWithState(
        attr,
        outputStructType=ATTRIBUTION_SCHEMA,
        stateStructType="tt STRING, tum LONG",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RESERVOIR_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("weight", LongType()),
        StructField("priority", DoubleType()),
    ]
)

#: Knuth multiplicative constant — the SAME priority derivation as the
#: batch q_sample_weighted (training.py), computed SPARK-SIDE below so
#: stream and batch keys are bit-identical.
_RES_KNUTH = 2654435761


def weighted_reservoir(
    docs: DataFrame, k: int = 100, buckets: int = 16
) -> DataFrame:
    """Streaming weighted sampling without replacement — the stateful
    analog of the batch ``q_sample_weighted`` (Efraimidis-Spirakis
    exponential race over the deterministic Knuth-hash uniform).

    Two-level top-k, the scale shape: rows hash into ``buckets``
    groups; each group's state is its running k-smallest (priority,
    doc_id) set — O(k) floats per bucket FOREVER, no history.  A row
    is EMITTED the moment it enters its bucket's current top-k;
    because priorities are immutable and a bucket's top-k only ever
    tightens, every member of the true global top-k is emitted at its
    arrival batch, so the exact global sample at any point is the
    k-smallest over all emissions — one tiny batch query over the
    sink (asserted ≡ q_sample_weighted in tests/test_streaming.py).

    The priority is computed with the same Spark expressions as the
    batch query BEFORE the stateful step, so stream and batch agree
    bit-for-bit; the pandas state function does only order
    maintenance, no float math.
    """
    h = (
        (F.col("doc_id") % F.lit(2**31)) * F.lit(_RES_KNUTH)
    ) % F.lit(2**32) % F.lit(1000000) + F.lit(1)
    u = h.cast("double") / F.lit(1000001.0)
    src = docs.select(
        F.expr(f"pmod(doc_id, {buckets})").alias("bucket"),
        "doc_id",
        "lang",
        F.col("n_chars").alias("weight"),
        (-F.log(u) / F.col("n_chars").cast("double")).alias("priority"),
    )

    def keep(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import bisect

        (bucket,) = key
        ps, ids = state.get if state.exists else ([], [])
        # state as parallel sorted lists (worst = last); tuples compare
        # lexicographically so ties resolve by doc_id like the batch
        best = sorted(zip(ps, ids))
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["priority", "doc_id"])
            for row in pdf.itertuples(index=False):
                entry = (row.priority, row.doc_id)
                if len(best) < k or entry < best[-1]:
                    bisect.insort(best, entry)
                    del best[k:]
                    out.append(
                        (bucket, row.doc_id, row.lang, row.weight, row.priority)
                    )
        state.update(([p for p, _ in best], [i for _, i in best]))
        yield pd.DataFrame(
            out, columns=["bucket", "doc_id", "lang", "weight", "priority"]
        )

    return src.groupBy("bucket").applyInPandasWithState(
        keep,
        outputStructType=RESERVOIR_SCHEMA,
        stateStructType="ps array<double>, ids array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
