"""Event-stream analytics operators (SURVEY.md §2 product-analytics
surface, extending the funnel/cohort/sessionize family).

Shapes that matter at 100 TB of events:

- Everything here is ONE scan of events plus ONE user-key shuffle
  (window or groupBy) — the attribution and transition queries never
  join events to itself.
- Time is integer microseconds end-to-end (``unix_micros`` /
  ``epoch_us``): window edges and ties resolve identically on both
  engines, per the determinism contract.
- Per-user window ordering is the TOTAL order (um, event_id), so
  row-frame semantics are engine-independent even under timestamp
  ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgshovel_spark.functions.determinism import dsum, exact_sum
from pgshovel_spark.functions.determinism import iratio
from pgshovel_spark.operators.scratch import materialize
from pgshovel_spark.sources.tables import load_table

_WEEK_US = 7 * 86_400_000_000


def q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent PRIOR non-purchase event within 7 days, else 'direct'.

    One pass: a per-user row window ordered by (um, event_id) carries
    the last non-purchase (channel, time) via ``last(..., ignorenulls)``
    over UNBOUNDED PRECEDING..1 PRECEDING; purchase rows then decide
    row-locally whether that touch is fresh enough.  No self-join, no
    second shuffle — the classic attribution query that event
    warehouses otherwise write as an as-of join.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr("unix_micros(ts)").alias("um"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("um", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_type = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    touch_um = F.last(
        F.when(F.col("event_type") != "purchase", F.col("um")), ignorenulls=True
    ).over(w)
    purchases = (
        e.select("event_type", "value", "um", touch_type.alias("tt"), touch_um.alias("tum"))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("tum") >= F.col("um") - F.lit(_WEEK_US), F.col("tt")
            )
            .otherwise(F.lit("direct"))
            .alias("channel"),
            "value",
        )
    )
    return purchases.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        dsum("value", 2).alias("attributed_value"),
    )


_EVENT_ATTRIBUTION_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS um
  FROM events
), touched AS (
  SELECT event_type, value, um,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY um, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tt,
         last_value(CASE WHEN event_type <> 'purchase' THEN um END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY um, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tum
  FROM ev
)
SELECT CASE WHEN tum >= um - {_WEEK_US} THEN tt ELSE 'direct' END AS channel,
       COUNT(*) AS n_purchases,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE)
         AS attributed_value
FROM touched
WHERE event_type = 'purchase'
GROUP BY 1
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: counts and within-source probabilities for each
    (prev_type -> event_type) edge; a session's first event
    transitions from 'START'.

    One user-key window (lag) + one tiny groupBy; the probability
    denominator is a window over the 26-row transition table, not a
    second scan.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.expr("unix_micros(ts)").alias("um")
    )
    w = Window.partitionBy("user_id").orderBy("um", "event_id")
    seq = e.select(
        F.coalesce(F.lag("event_type").over(w), F.lit("START")).alias("prev_type"),
        "event_type",
    )
    counts = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wsrc = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        iratio(F.col("n"), F.sum("n").over(wsrc), 4).alias("p"),
    )


_EVENT_TRANSITIONS_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS um FROM events
), seq AS (
  SELECT COALESCE(lag(event_type)
           OVER (PARTITION BY user_id ORDER BY um, event_id), 'START')
           AS prev_type,
         event_type
  FROM ev
), counts AS (
  SELECT prev_type, event_type, COUNT(*) AS n
  FROM seq GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       CAST((n * 20000 + SUM(n) OVER (PARTITION BY prev_type)) // (SUM(n) OVER (PARTITION BY prev_type) * 2) AS DOUBLE) / 10000.0 AS p
FROM counts
"""


def q_agg_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outliers (|z| > 3) of event value per event type.

    Two-pass shape: a per-type moment aggregate (mean and E[x^2] from
    EXACT decimal sums — value is 2dp so value^2 is exact at 4dp),
    broadcast back over the scan; the z computation and filter are
    row-local.  sqrt/divide run on bit-identical doubles on both
    engines, so the |z| > 3 cut is deterministic.
    """
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        (exact_sum("value").cast("double") / F.count(F.lit(1))).alias("mean"),
        (
            exact_sum(F.col("value") * F.col("value")).cast("double")
            / F.count(F.lit(1))
        ).alias("ex2"),
    )
    stats = stats.select(
        "event_type",
        "mean",
        F.sqrt(F.col("ex2") - F.col("mean") * F.col("mean")).alias("sd"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("sd")
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 3).alias("z"),
        )
    )


_AGG_OUTLIERS_SQL = """
WITH stats AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS mean,
         CAST(SUM(CAST(value * value AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)
           AS ex2
  FROM events GROUP BY event_type
), sd AS (
  SELECT event_type, mean, sqrt(ex2 - mean * mean) AS sd FROM stats
)
SELECT event_id, e.event_type, value,
       ROUND((value - mean) / sd, 3) AS z
FROM events e JOIN sd ON e.event_type = sd.event_type
WHERE abs((value - mean) / sd) > 3
"""


_HOUR_US = 3_600_000_000


def q_ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (event_type, hour) candlesticks —
    open/high/low/close of ``value`` plus count and exact sum, the
    standard time-series resample a metrics warehouse materializes.

    ONE shuffle: both row_number windows and the final aggregate hash
    on the same (event_type, bucket) key, so the windows sort within
    the one exchange and the aggregate reuses the child distribution.
    Open/close are selected by row_number over the TOTAL order
    (um, event_id) — timestamp ties cannot flip the candle on either
    engine — and emitted as the stored doubles (bit-exact on both
    sides); only the sum is a computed float, rounded via the decimal
    path.  Buckets are integer hour indexes of integer microseconds:
    no timezone, no date truncation semantics to disagree on.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.expr("unix_micros(ts)").alias("um"),
    )
    e = e.withColumn(
        "bucket_s", (F.expr(f"um div {_HOUR_US}") * 3600).cast("long")
    )
    wo = Window.partitionBy("event_type", "bucket_s").orderBy("um", "event_id")
    wc = Window.partitionBy("event_type", "bucket_s").orderBy(
        F.col("um").desc(), F.col("event_id").desc()
    )
    return (
        e.select(
            "event_type",
            "bucket_s",
            "value",
            F.row_number().over(wo).alias("rko"),
            F.row_number().over(wc).alias("rkc"),
        )
        .groupBy("event_type", "bucket_s")
        .agg(
            F.max(F.when(F.col("rko") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rkc") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("sum_value"),
        )
    )


_TS_RESAMPLE_SQL = f"""
WITH b AS (
  SELECT event_type,
         (epoch_us(ts) // {_HOUR_US}) * 3600 AS bucket_s,
         value,
         ROW_NUMBER() OVER (PARTITION BY event_type, epoch_us(ts) // {_HOUR_US}
                            ORDER BY epoch_us(ts), event_id) AS rko,
         ROW_NUMBER() OVER (PARTITION BY event_type, epoch_us(ts) // {_HOUR_US}
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rkc
  FROM events
)
SELECT event_type, CAST(bucket_s AS BIGINT) AS bucket_s,
       MAX(CASE WHEN rko = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rkc = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_value
FROM b GROUP BY event_type, bucket_s
"""

_SKY_BUCKET = 100_000  # coarse-prune bucket width: 10^5 cents


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline) of users by total spend and event
    count — the multi-criteria selection operator a curation pipeline
    uses to pick non-dominated examples ("no other user is >= on both
    axes and > on one").

    Scalable two-phase shape (the distributed-skyline standard):

    1. COARSE PRUNE, fully parallel: bucket total cents by a fixed
       width, take each bucket's max count (one small groupBy), sweep
       the running max over strictly-higher buckets (a window over
       the BUCKET table — bucket-count-sized, not user-sized), and
       broadcast the per-bucket threshold back: any user whose count
       fails the threshold of a strictly-richer bucket is dominated
       and drops before the exact pass.  Sound: bucket' > bucket
       implies cents' > cents for every member pair.
    2. EXACT SWEEP on the surviving near-frontier set (expected tiny):
       per-cents max count, running max over cents descending, keep
       cents groups that strictly beat every richer group; skyline
       members are the survivors' (cents, max-count) holders — equal
       (cents, count) ties all survive, as dominance is strict.

    All-integer dominance arithmetic (exact decimal cents, counts), so
    the frontier is bit-deterministic; the oracle is the O(n^2)
    NOT-EXISTS definition — same set by construction.
    """
    e = load_table(spark, sf_dir, "events")
    # The per-user profile is a SELF-REFERENCED subtree: the plan joins
    # u to a broadcast DERIVED FROM u (bprev), so DeduplicateRelations
    # re-aliases one occurrence and AQE's stage dedup then misses the
    # canonically-equal exchanges — both sides re-shuffle (measured:
    # two user_id ShuffleQueryStages; same miss as the LSH banding
    # self-join, EXPERIMENTS.md round 8).  For self-join shapes the
    # round-7 "exchange reuse is free, never cache" rule's premise
    # fails, so u IS cached — LAZILY, because the two consumers are
    # strictly sequential (the probe can't start before bprev's
    # broadcast is built), so the build populates the cache with no
    # race and no separate population action; the corpus is scanned
    # once.  User-count rows, far below the corpus.
    u = materialize(
        e.groupBy("user_id")
        .agg(
            (exact_sum("value") * 100).cast("long").alias("total_cents"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("bk", F.expr(f"total_cents div {_SKY_BUCKET}"))
    )
    b = u.groupBy("bk").agg(F.max("n_events").alias("bmax"))
    wb = Window.orderBy(F.col("bk").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # coalesce(1) before each bounded-table sweep: the running max
    # over the bucket table is a global window, and a bare
    # Window.orderBy would insert a single-partition EXCHANGE of the
    # same few rows (one more AQE stage job per sweep); coalesce is a
    # narrow dependency into the one task that tiny table deserves
    # (the operators/rank.py prefix-sum precedent).
    bprev = b.coalesce(1).select("bk", F.max("bmax").over(wb).alias("pmax"))
    # cand (frontier-sized) feeds the exact sweep and the membership
    # join; its own cost above the reused u-exchange is one broadcast
    # join + filter — cheaper to recompute per branch than to persist.
    # cand is the pruned NEAR-FRONTIER set — tiny at any scale by the
    # operator's own phase-1 design — so the ENTIRE exact sweep runs
    # per-row in ONE narrow coalesce(1) task with two range-frame
    # windows: pm = best count among strictly-richer candidates
    # (integer cents, so RANGE ... -1 PRECEDING under DESC means
    # cents' >= cents+1), gm = best count among equal-cents peers; a
    # row is on the frontier iff it HOLDS its cents group's max and
    # beats every richer group.  This replaces the old group-sweep +
    # broadcast + membership join pair, so cand has ONE consumer and
    # u exactly two (the bprev build and the probe) — the shape whose
    # exchange reuse is measured (a third u consumer re-materialized
    # the user shuffle under AQE's dedup miss; see EXPERIMENTS.md
    # round 8).
    cand = u.join(F.broadcast(bprev), "bk").filter(
        F.col("pmax").isNull() | (F.col("n_events") > F.col("pmax"))
    )
    w_richer = Window.orderBy(F.col("total_cents").desc()).rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_peers = Window.orderBy(F.col("total_cents").desc()).rangeBetween(
        Window.currentRow, Window.currentRow
    )
    return (
        cand.coalesce(1)
        .select(
            "user_id",
            "total_cents",
            "n_events",
            F.max("n_events").over(w_richer).alias("pm"),
            F.max("n_events").over(w_peers).alias("gm"),
        )
        .filter(
            (F.col("n_events") == F.col("gm"))
            & (F.col("pm").isNull() | (F.col("n_events") > F.col("pm")))
        )
        .select("user_id", "total_cents", "n_events")
    )


_SKYLINE_SQL = """
WITH u AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(24,6))) * 100 AS BIGINT) AS total_cents,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, total_cents, n_events
FROM u a
WHERE NOT EXISTS (
  SELECT 1 FROM u b
  WHERE b.total_cents >= a.total_cents AND b.n_events >= a.n_events
    AND (b.total_cents > a.total_cents OR b.n_events > a.n_events)
)
"""


#: EWMA smoothing factor: 1/4 is exactly representable in binary, so
#: the fold's products stay reproducible float ops on both engines
_EWMA_ALPHA = 0.25

#: truncation depth: weights beyond 12 steps are < (3/4)^12 ~ 3% —
#: the bounded-frame form of the (inherently recursive) EWMA
_EWMA_W = 12


def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated EWMA of hourly event volume per event type — the
    exponentially-weighted smoother a metrics pipeline runs next to
    the moving average.  The true EWMA is RECURSIVE (state_t =
    a*x_t + (1-a)*state_{t-1}) and inexpressible as a plain window
    aggregate; the standard bounded form folds the last {_EWMA_W}
    frame values left-to-right with the same recurrence, which both
    engines express as an ORDERED frame collect + deterministic left
    fold (Spark ``aggregate`` over a windowed ``collect_list``,
    DuckDB ``list_reduce`` over a windowed ``list`` — verified
    same-direction folds, round-6 cross-engine notes).  alpha = 1/4
    keeps every product an exact binary float op; output rounded 4dp.

    Scale: one (type, hour) aggregate collapses the fact table to the
    calendar-bounded hourly series; the window and its ≤{_EWMA_W}-row
    frames run per event type over that tiny table.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type",
            (F.expr(f"unix_micros(ts) div {_HOUR_US}") * 3600)
            .cast("long")
            .alias("bucket_s"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    frame = F.expr(
        f"collect_list(x) OVER (PARTITION BY event_type ORDER BY bucket_s"
        f" ROWS BETWEEN {_EWMA_W - 1} PRECEDING AND CURRENT ROW)"
    )
    ewma = F.aggregate(
        F.expr("slice(frame, 2, size(frame))"),
        F.element_at(F.col("frame"), 1),
        lambda acc, x: acc * F.lit(1 - _EWMA_ALPHA) + x * F.lit(_EWMA_ALPHA),
    )
    return (
        hourly.withColumn("frame", frame)
        .select(
            "event_type",
            "bucket_s",
            F.col("x").cast("long").alias("n_events"),
            F.round(ewma, 4).alias("ewma"),
        )
    )


_TS_EWMA_SQL = f"""
WITH hourly AS (
  SELECT event_type,
         CAST((epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US}) * 3600
              AS BIGINT) AS bucket_s,
         CAST(COUNT(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
), framed AS (
  SELECT event_type, bucket_s, x,
         list(x) OVER (PARTITION BY event_type ORDER BY bucket_s
                       ROWS BETWEEN {_EWMA_W - 1} PRECEDING AND CURRENT ROW)
           AS frame
  FROM hourly
)
SELECT event_type, bucket_s, CAST(x AS BIGINT) AS n_events,
       ROUND(list_reduce(frame,
             (acc, v) -> acc * {1 - _EWMA_ALPHA} + v * {_EWMA_ALPHA}), 4)
         AS ewma
FROM framed
"""


def q_user_periodicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival regularity — the bot-vs-human behavioral
    signal (a scripted client fires on a timer: coefficient of
    variation of its gaps collapses toward 0; organic activity is
    bursty).  Emits gap count, mean gap, cv² in basis points, and the
    periodic flag — ALL in exact integer arithmetic on whole-second
    gaps (cv² = population-variance/mean² = (n·Σg² − (Σg)²)/(Σg)², so
    the flag is the integer comparison 100·(nΣg²−(Σg)²) < (Σg)² —
    no float ever decides a row).

    Scale: one user-key window (lag) + one per-user aggregate on the
    SAME key — the second hash requirement is satisfied by the
    window's exchange, so one shuffle total.  Σg² stays < 2^63 for
    gaps to ~10^6 s over ~10^4 events/user; beyond that the sums move
    to DECIMAL, same contract as exact_sum.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    from pgshovel_spark.functions.determinism import epoch_s

    gaps = (
        e.select("user_id", "ts", "event_id")
        .withColumn("gap", epoch_s("ts") - F.lag(epoch_s("ts")).over(w))
        .filter(F.col("gap").isNotNull())
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).alias("s2"),
    ).filter((F.col("n_gaps") >= 3) & (F.col("s1") > 0))
    # s1 > 0 guards the cv² division: a user whose >=4 events all land
    # inside one epoch second has every whole-second gap = 0, so s1 = 0
    # and x div 0 errors under ANSI mode (and in the oracle).  Zero-span
    # users carry no periodicity signal — excluded, mirrored in the SQL.
    varnum = F.col("n_gaps") * F.col("s2") - F.col("s1") * F.col("s1")
    return agg.select(
        "user_id",
        "n_gaps",
        iratio("s1", "n_gaps", 2).alias("mean_gap_s"),
        F.expr("(n_gaps * s2 - s1 * s1) * 10000 div (s1 * s1)").alias("cv2_bp"),
        (varnum * 100 < F.col("s1") * F.col("s1")).alias("is_periodic"),
    )


_USER_PERIODICITY_SQL = """
WITH g AS (
  SELECT user_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT)
           - lag(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS gap
  FROM events
), agg AS (
  SELECT user_id, COUNT(*) AS n_gaps,
         CAST(SUM(gap) AS BIGINT) AS s1,
         CAST(SUM(gap * gap) AS BIGINT) AS s2
  FROM g WHERE gap IS NOT NULL
  GROUP BY user_id HAVING COUNT(*) >= 3
)
SELECT user_id, n_gaps,
       CAST((s1 * 200 + n_gaps) // (n_gaps * 2) AS DOUBLE) / 100.0
         AS mean_gap_s,
       (n_gaps * s2 - s1 * s1) * 10000 // (s1 * s1) AS cv2_bp,
       (n_gaps * s2 - s1 * s1) * 100 < s1 * s1 AS is_periodic
FROM agg WHERE s1 > 0
"""


QUERIES = {
    "q_user_periodicity": q_user_periodicity,
    "q_ts_ewma": q_ts_ewma,
    "q_ts_resample": q_ts_resample,
    "q_skyline": q_skyline,
    "q_event_attribution": q_event_attribution,
    "q_event_transitions": q_event_transitions,
    "q_agg_outliers": q_agg_outliers,
}

ORACLES = {
    "q_user_periodicity": _USER_PERIODICITY_SQL,
    "q_ts_ewma": _TS_EWMA_SQL,
    "q_ts_resample": _TS_RESAMPLE_SQL,
    "q_skyline": _SKYLINE_SQL,
    "q_event_attribution": _EVENT_ATTRIBUTION_SQL,
    "q_event_transitions": _EVENT_TRANSITIONS_SQL,
    "q_agg_outliers": _AGG_OUTLIERS_SQL,
}
