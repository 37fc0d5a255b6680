"""CDC / stream-analog operators (SURVEY.md §2.G-H batch analogs).

These are the batch-checkable forms of the reference's actual runtime
semantics (pgshovel consumer behaviors — latest-state materialization,
idempotent dedup, transaction/session framing, tick batching).  The
streaming layer (pgshovel_spark.streaming) reuses the same logic via
Structured Streaming; these batch queries pin its correctness through
the DuckDB oracle (reference behavior reconstructed from public
knowledge of disqus/pgshovel — relay/consumer framing; snapshot was
empty, see SURVEY.md Provenance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgshovel_spark.functions.determinism import dec, epoch_s, exact_sum
from pgshovel_spark.operators.scratch import materialize
from pgshovel_spark.sources.tables import load_table


def q_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state materialization: the consumer's 'apply mutations,
    keep current row per key' compaction, as a ranked window.

    At 100 TB this is one shuffle on the key; with date-partitioned
    input, AQE prunes to recent partitions when a watermark column is
    available.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            epoch_s("ts").alias("last_ts_s"),
            F.col("event_type").alias("last_type"),
            F.round("value", 2).alias("last_value"),
        )
    )


_CDC_LATEST_STATE_SQL = """
SELECT
  user_id,
  event_id AS last_event_id,
  CAST(FLOOR(epoch(ts)) AS BIGINT) AS last_ts_s,
  event_type AS last_type,
  ROUND(value, 2) AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence dedup per (user_id, event_type) — the batch
    analog of streaming dropDuplicatesWithinWatermark (idempotent
    consumption under at-least-once delivery)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", epoch_s("ts").alias("first_ts_s"))
    )


_STREAM_DEDUP_SQL = """
SELECT user_id, event_type, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS first_ts_s
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events
)
WHERE rn = 1
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization (batch analog of both streaming
    session_window and the reference's transaction framing): lag ->
    gap flag -> running sum = session index -> per-session rollup.

    Gap rule is ``>=`` (a 30:00.000000 gap SPLITS): Spark's streaming
    session_window is half-open [ts, ts+gap), so an event exactly gap
    later is a new session — the batch analog must match for the
    stream==batch equivalence tests to hold."""
    e = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_flag = (
        F.when(
            F.unix_micros(F.col("ts"))
            - F.unix_micros(F.lag("ts").over(w_order))
            >= 30 * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
    )
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_session = e.withColumn("gap", gap_flag).withColumn(
        "session_idx", F.sum("gap").over(w_run).cast("long")
    )
    return with_session.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        epoch_s(F.min("ts")).alias("start_s"),
        epoch_s(F.max("ts")).alias("end_s"),
    )


_SESSIONIZE_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                   - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                       PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                  >= 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS gap
  FROM events
), numbered AS (
  SELECT *, CAST(SUM(gap) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_idx
  FROM ordered
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS start_s,
       CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS end_s
FROM numbered
GROUP BY user_id, session_idx
"""


def q_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (batch analog of streaming
    window(); window.start == date_trunc('hour', ts))."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        e.groupBy(win.alias("w"))
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


_WIN_TUMBLING_SQL = """
SELECT
  CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
  COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
"""


def q_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1 hour every 30 minutes — every event lands in
    exactly two windows.  Oracle: UNION ALL of the two phase-shifted
    hourly bucketings."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        e.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(exact_sum("value"), 2).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("win_start_s"),
            "n_events",
            "sum_value",
        )
    )


_WIN_SLIDING_SQL = """
WITH b AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT)
         - (CAST(FLOOR(epoch(ts)) AS BIGINT) % 1800) AS half_bucket,
         value
  FROM events
), both_windows AS (
  SELECT half_bucket AS win_start_s, value FROM b
  UNION ALL
  SELECT half_bucket - 1800 AS win_start_s, value FROM b
)
SELECT win_start_s, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_value
FROM both_windows
GROUP BY win_start_s
"""


def q_cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-record derivation: each event becomes a mutation row with
    (before, after) values per user — the shape of the reference's
    MutationOperation {old, new} stream, derived batch-side.  op is
    INSERT for a user's first event, UPDATE after."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        epoch_s("ts").alias("ts_s"),
        F.when(prev.isNull(), "INSERT").otherwise("UPDATE").alias("op"),
        F.round(prev, 2).alias("before_value"),
        F.round("value", 2).alias("after_value"),
    )


_CDC_CHANGELOG_SQL = """
SELECT
  event_id,
  user_id,
  CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
  CASE WHEN lag(value) OVER w IS NULL THEN 'INSERT' ELSE 'UPDATE' END AS op,
  ROUND(lag(value) OVER w, 2) AS before_value,
  ROUND(value, 2) AS after_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
"""


#: snapshot-diff cut point: state as of T1 vs current state.
_SNAPDIFF_T1 = "2024-01-15 00:00:00"


def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the replication-audit op: compare each user's
    latest state AS OF {_SNAPDIFF_T1} against their current latest
    state and emit the per-key changelog (added / changed keys with
    old and new event ids; unchanged keys are suppressed).

    Spark shape: ONE aggregate, no window, no self-join — both
    snapshots fall out of a single groupBy(user) pass as
    ``max(struct(epoch, event_id))`` (total order, so "latest" is
    deterministic) with the as-of snapshot a conditional max over the
    same rows.  The oracle computes each snapshot with a ranked
    window and FULL-joins them — the naive two-pass form.  At 100 TB:
    one shuffle of (user, 16-byte struct) partials; map-side combine
    reduces each partition to one row per user first.
    """
    e = load_table(spark, sf_dir, "events")
    um = F.unix_micros(F.col("ts"))
    t1 = F.unix_micros(F.lit(_SNAPDIFF_T1).cast("timestamp"))
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.max(F.struct(um.alias("um"), F.col("event_id").alias("eid"))).alias(
                "b"
            ),
            F.max(
                F.when(um <= t1, F.struct(um.alias("um"), F.col("event_id").alias("eid")))
            ).alias("a"),
        )
    )
    return (
        per_user.select(
            "user_id",
            F.when(F.col("a").isNull(), F.lit("added"))
            .when(F.col("a.eid") != F.col("b.eid"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change_type"),
            F.col("a.eid").alias("old_event_id"),
            F.col("b.eid").alias("new_event_id"),
        )
        .filter(F.col("change_type") != "unchanged")
    )


_CDC_SNAPSHOT_DIFF_SQL = f"""
WITH b AS (
  SELECT user_id, event_id AS new_event_id FROM (
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1
), a AS (
  SELECT user_id, event_id AS old_event_id FROM (
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
    FROM events WHERE ts <= TIMESTAMP '{_SNAPDIFF_T1}') WHERE rn = 1
)
SELECT b.user_id,
       CASE WHEN a.user_id IS NULL THEN 'added'
            WHEN a.old_event_id <> b.new_event_id THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       a.old_event_id, b.new_event_id
FROM b LEFT JOIN a USING (user_id)
WHERE CASE WHEN a.user_id IS NULL THEN 'added'
           WHEN a.old_event_id <> b.new_event_id THEN 'changed'
           ELSE 'unchanged' END <> 'unchanged'
"""


def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, events in the trailing hour
    (inclusive) — Spark's rangeBetween needs a numeric ordering, so
    the frame is over epoch seconds; DuckDB uses RANGE INTERVAL on a
    second-truncated timestamp (identical frame membership)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s("ts"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.round(F.sum(dec("value")).over(w), 2).cast("double").alias("sum_trailing_1h"),
    )


_WIN_RANGE_FRAME_SQL = """
SELECT
  event_id,
  user_id,
  COUNT(*) OVER w AS n_trailing_1h,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(24,6))) OVER w, 2) AS DOUBLE) AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('second', CAST(ts AS TIMESTAMP))
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build from the change stream — the CDC
    consumer's "temporal table" materialization: each per-user value
    change becomes a version row with a validity interval
    [valid_from, valid_to), the current version open-ended (NULL).

    One user-key window (lead over the (um, event_id) total order) —
    the same single shuffle every warehouse SCD2 merge pays; row
    numbering gives the version counter.  All integer microseconds.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("um", "event_id")
    src = e.select(
        "user_id", "event_id", F.round("value", 2).alias("value"),
        F.expr("unix_micros(ts)").alias("um"),
    )
    return src.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        "value",
        F.col("um").alias("valid_from_us"),
        F.lead("um").over(w).alias("valid_to_us"),
    ).withColumn("is_current", F.col("valid_to_us").isNull())


_SCD2_INTERVALS_SQL = """
SELECT user_id,
       row_number() OVER w AS version,
       ROUND(value, 2) AS value,
       epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER w AS valid_to_us,
       lead(epoch_us(ts)) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
"""


def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with LOCF (last observation carried
    forward): per user, one row per HOUR bucket between the user's
    first and last event, carrying the most recent event value at or
    before the bucket's end — the hypertable resample/interpolate op.

    Plan: per-user bounds (one agg) -> sequence+explode generates the
    hourly spine row-locally -> spine UNIONs with the events and ONE
    (um, marker)-ordered window carries the last value forward (events
    sort before the spine row at the same instant).  One user-key
    shuffle; spine size is bounded by the time span, not the event
    count.
    """
    hour_us = 3_600_000_000
    # two consumers (bounds agg + the tagged union) — cache the 4-col
    # projection so events is scanned once
    e = materialize(
        load_table(spark, sf_dir, "events").select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            F.expr("unix_micros(ts)").alias("um"),
        )
    )
    bounds = e.groupBy("user_id").agg(
        (F.floor(F.min("um") / hour_us) * hour_us).cast("long").alias("h0"),
        (F.floor(F.max("um") / hour_us) * hour_us).cast("long").alias("h1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0") + hour_us, F.col("h1") + hour_us, F.lit(hour_us))
        ).alias("bucket_end_us"),
    )
    # event_id joins the ordering as the deterministic tiebreak (same
    # contract as SCD2/attribution/sessionize): if two same-user events
    # ever share a timestamp with different values, the carried-forward
    # value must not be engine- or run-dependent.  Spine rows carry -1
    # (the marker already orders them after same-instant events).
    tagged = e.select(
        "user_id", F.col("um").alias("t"), F.lit(0).alias("marker"),
        F.col("event_id").alias("ev"), "value"
    ).unionAll(
        spine.select(
            "user_id", F.col("bucket_end_us").alias("t"), F.lit(1).alias("marker"),
            F.lit(-1).cast("long").alias("ev"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "marker", "ev")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged.select(
        "user_id", "t", "marker",
        F.last("value", ignorenulls=True).over(w).alias("locf_value"),
    )
    return (
        filled.filter(F.col("marker") == 1)
        .select(
            "user_id",
            (F.col("t") - hour_us).alias("bucket_us"),
            "locf_value",
        )
    )


_TS_GAPFILL_SQL = """
WITH e AS (
  SELECT user_id, event_id, ROUND(value, 2) AS value, epoch_us(ts) AS um FROM events
), bounds AS (
  SELECT user_id,
         CAST(FLOOR(MIN(um) / 3600000000) * 3600000000 AS BIGINT) AS h0,
         CAST(FLOOR(MAX(um) / 3600000000) * 3600000000 AS BIGINT) AS h1
  FROM e GROUP BY user_id
), spine AS (
  SELECT user_id,
         unnest(generate_series(h0 + 3600000000, h1 + 3600000000, 3600000000))
           AS bucket_end_us
  FROM bounds
), tagged AS (
  SELECT user_id, um AS t, 0 AS marker, event_id AS ev, value FROM e
  UNION ALL
  SELECT user_id, bucket_end_us, 1, -1, NULL FROM spine
), filled AS (
  SELECT user_id, t, marker,
         last_value(value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, marker, ev
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
  FROM tagged
)
SELECT user_id, t - 3600000000 AS bucket_us, locf_value
FROM filled WHERE marker = 1
"""


#: watermark delay for q_late_events (seconds behind the running max)
_LATE_WM_S = 300

#: arrival-sequence rows per prefix-max bucket: the parallelism knob of
#: the two-pass running max (NOT a semantics knob — any value gives the
#: same answer).  64k keeps the boundary table 65536× smaller than the
#: corpus.
_LATE_BUCKET = 1 << 16


def q_late_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark drop accounting, batch-checkable: replay events in
    ARRIVAL order (event_id — the capture sequence) and flag each one
    that arrives more than {_LATE_WM_S} s of EVENT TIME behind the
    running high-water mark — exactly the rows a streaming watermark
    of that delay would drop.  Per event_type: arrivals, late count,
    late share in exact basis points, and the worst lateness — the
    sizing table for choosing `withWatermark` delays (too tight loses
    data, too loose bloats state).

    Strictly-before running max (frame ends at 1 PRECEDING) so an
    event never competes with itself; all arithmetic in integer epoch
    seconds.

    Scale (round-11 restructure, the rank.py treatment): a window
    partitioned by the 5-value event_type would funnel ALL events
    through 5 tasks — a near-global sort wearing a partition key.  The
    running max is instead computed as a bucketed two-pass prefix max:
    (1) bucket arrivals by ``event_id div {_LATE_BUCKET}`` — a PURE
    FUNCTION of the row, so unlike repartitionByRange there is no
    sampled-boundary divergence and nothing to materialize — and run
    the strictly-before max per (event_type, bucket), |types|×|buckets|
    -way parallel; (2) reduce each bucket to its max and prefix-max
    the strictly-earlier buckets per type — a boundary table 65536×
    smaller than the corpus (its per-type window sorts ~1.5M tiny rows
    per type at 100 TB, not the corpus) — then broadcast it back:
    hwm = greatest(within-bucket strictly-before max, previous-buckets
    max).  One corpus-sized hash exchange total; the final |types|-row
    aggregate reuses nothing heavier than a map-side partial.
    """
    e = load_table(spark, sf_dir, "events")
    ts_s = epoch_s("ts")
    b = e.select(
        "event_type",
        "event_id",
        ts_s.alias("t"),
        F.expr(f"event_id div {_LATE_BUCKET}").alias("bkt"),
    )
    w_in = (
        Window.partitionBy("event_type", "bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn("local_hwm", F.max("t").over(w_in))
    # selfref-audit adjudication (round 11): the boundary aggregate
    # plans the events scan a SECOND time — deliberately.  The
    # duplicate is a column-pruned scan + MAP-SIDE-COMBINED aggregate
    # (boundary-table-sized shuffle, 65536x reduction), strictly
    # cheaper than the alternatives: sharing the window exchange
    # re-executes the full (type, bkt) sort per branch
    # (DeduplicateRelations re-aliases the self-reference, so the
    # exchanges are not recognized as identical — the known AQE
    # stage-dedup miss), and materialize() would persist a
    # corpus-sized frame for a one-off diagnostic.  Same accepted
    # shape as q_join_range's documented-final row.
    bmax = b.groupBy("event_type", "bkt").agg(F.max("t").alias("bkt_max"))
    w_pre = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = bmax.select(
        "event_type", "bkt", F.max("bkt_max").over(w_pre).alias("prev_hwm")
    )
    tagged = (
        local.join(F.broadcast(prev), ["event_type", "bkt"])
        # greatest() skips NULLs: first row of a bucket has NULL
        # local_hwm, first bucket of a type has NULL prev_hwm, and the
        # very first arrival of a type has both NULL -> hwm NULL ->
        # late_by 0, exactly the old single-window semantics.
        .withColumn("hwm", F.greatest("local_hwm", "prev_hwm"))
        .withColumn(
            "late_by",
            F.when(
                F.col("hwm") - F.col("t") > _LATE_WM_S,
                F.col("hwm") - F.col("t"),
            ).otherwise(F.lit(0)),
        )
    )
    return tagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("late_by") > 0).cast("long")).alias("n_late"),
        F.expr(
            f"sum(cast(late_by > 0 as long)) * 10000 div count(1)"
        ).alias("late_bp"),
        F.max("late_by").alias("max_late_s"),
    )


_LATE_EVENTS_SQL = f"""
WITH tagged AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
         MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
  FROM events
),
scored AS (
  SELECT event_type,
         CASE WHEN hwm - t > {_LATE_WM_S} THEN hwm - t ELSE 0 END AS late_by
  FROM tagged
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN late_by > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN late_by > 0 THEN 1 ELSE 0 END) * 10000
            // COUNT(*) AS BIGINT) AS late_bp,
       MAX(late_by) AS max_late_s
FROM scored GROUP BY event_type
"""


QUERIES = {
    # changed / never-driver-checked first (registration order is the
    # harness's check order)
    "q_late_events": q_late_events,
    "q_cdc_snapshot_diff": q_cdc_snapshot_diff,
    "q_scd2_intervals": q_scd2_intervals,
    "q_ts_gapfill": q_ts_gapfill,
    "q_sessionize": q_sessionize,
    "q_win_tumbling": q_win_tumbling,
    "q_win_sliding": q_win_sliding,
    "q_cdc_latest_state": q_cdc_latest_state,
    "q_cdc_changelog": q_cdc_changelog,
    "q_win_range_frame": q_win_range_frame,
    "q_stream_dedup": q_stream_dedup,
}

ORACLES = {
    "q_late_events": _LATE_EVENTS_SQL,
    "q_cdc_snapshot_diff": _CDC_SNAPSHOT_DIFF_SQL,
    "q_scd2_intervals": _SCD2_INTERVALS_SQL,
    "q_ts_gapfill": _TS_GAPFILL_SQL,
    "q_cdc_latest_state": _CDC_LATEST_STATE_SQL,
    "q_cdc_changelog": _CDC_CHANGELOG_SQL,
    "q_win_range_frame": _WIN_RANGE_FRAME_SQL,
    "q_stream_dedup": _STREAM_DEDUP_SQL,
    "q_sessionize": _SESSIONIZE_SQL,
    "q_win_tumbling": _WIN_TUMBLING_SQL,
    "q_win_sliding": _WIN_SLIDING_SQL,
}
