"""Change-record model + stream sources.

The change schema mirrors the reference's MutationOperation protobuf
(id, table, operation, old/new rows, txid, timestamp) plus the
Message envelope's per-publisher dense sequence — reconstructed from
public knowledge of pgshovel's streams.proto/common.proto (snapshot
empty; SURVEY.md §1.1).  Rows travel as map<string,string> in the
schema-agnostic generic path, mirroring the reference trigger's
text-serialization of non-scalar Postgres types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Generic change record (SURVEY.md §1.1 "Mutation record").
CHANGE_SCHEMA = StructType(
    [
        StructField("op", StringType()),            # INSERT | UPDATE | DELETE
        StructField("table", StringType()),
        StructField("key", MapType(StringType(), StringType())),
        StructField("before", MapType(StringType(), StringType())),
        StructField("after", MapType(StringType(), StringType())),
        StructField("txid", LongType()),
        StructField("ts", TimestampType()),
        StructField("publisher", StringType()),
        StructField("epoch", LongType()),           # publisher generation (fencing)
        StructField("seq", LongType()),             # dense per-publisher sequence
    ]
)


def file_change_stream(
    spark: SparkSession, path: str, schema: StructType | None = None, max_files: int = 1
) -> DataFrame:
    """Deterministic dev/test stream source: replay parquet files from
    ``path`` one file per micro-batch (stand-in for Kafka/JDBC; the
    reference's relay consumed PgQ batches the same way — bounded
    chunks in commit order).

    Production swap-in is one format change — every downstream operator
    is source-agnostic::

        (spark.readStream.format("kafka")
             .option("kafka.bootstrap.servers", servers)
             .option("subscribe", topic)
             .option("startingOffsets", "earliest")
             .load()
             .select(F.from_json(F.col("value").cast("string"),
                                 CHANGE_SCHEMA).alias("c"))
             .select("c.*"))

    (Requires the spark-sql-kafka package on the cluster; not bundled
    in this sandbox, hence the file source in tests.)"""
    return (
        spark.readStream.schema(schema or CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def kafka_reader_options(conf: dict) -> dict[str, str]:
    """The complete option block for a Kafka change-stream source —
    pure config, unit-testable without a broker.  The reference relay
    publishes change batches to a Kafka topic; Structured Streaming's
    built-in ``format("kafka")`` is the production consumer, so
    deployment is THIS dict plus the spark-sql-kafka package on the
    cluster classpath — no engine code changes."""
    opts = {
        "kafka.bootstrap.servers": conf["servers"],
        "startingOffsets": conf.get("starting_offsets", "earliest"),
        # the upsert sink is idempotent on (publisher, epoch, seq), so
        # at-least-once delivery after a data-loss gap is recoverable;
        # fail fast only when the caller asks for strictness.
        "failOnDataLoss": str(conf.get("fail_on_data_loss", False)).lower(),
    }
    if "topic_pattern" in conf:
        opts["subscribePattern"] = conf["topic_pattern"]
    else:
        opts["subscribe"] = conf["topic"]
    if "max_offsets_per_trigger" in conf:
        opts["maxOffsetsPerTrigger"] = str(conf["max_offsets_per_trigger"])
    if "group_id_prefix" in conf:
        opts["groupIdPrefix"] = conf["group_id_prefix"]
    return opts


def stream_source(spark: SparkSession, conf: dict) -> DataFrame:
    """Config-dispatched change-stream source: ``conf["format"]`` picks
    file (deterministic replay, dev/test), rate (load generator), or
    kafka (production message bus) — every downstream operator is
    source-agnostic, so switching a deployment from file replay to the
    bus is configuration, not code.

    The kafka branch is config-complete (kafka_reader_options) and
    parses the value envelope into CHANGE_SCHEMA columns; it needs the
    spark-sql-kafka package on the cluster classpath (absent in this
    sandbox — the contract test drives the file branch through this
    same dispatch and asserts the kafka branch's option assembly)."""
    fmt = conf.get("format", "file")
    if fmt == "file":
        return file_change_stream(
            spark, conf["path"], conf.get("schema"), conf.get("max_files", 1)
        )
    if fmt == "rate":
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(conf.get("rows_per_second", 100)))
            .load()
        )
    if fmt == "kafka":
        reader = spark.readStream.format("kafka")
        for k, v in kafka_reader_options(conf).items():
            reader = reader.option(k, v)
        return parse_change_envelope(reader.load(), conf.get("schema"))
    raise ValueError(f"unknown stream source format {fmt!r}")


#: to_json truncates timestamps to millis unless pinned — the envelope
#: wire contract keeps FULL microsecond precision both directions.
_WIRE_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

#: The exact column set ``format("kafka").load()`` presents (public
#: Structured Streaming Kafka integration guide) — the record layout
#: ``to_kafka_records`` emits, so recorded batches are schema-identical
#: to what a live broker source would deliver.
KAFKA_RECORD_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def to_kafka_records(
    changes: DataFrame, topic: str = "pgshovel.changes", n_partitions: int = 8
) -> DataFrame:
    """The PRODUCER half of the Kafka seam: serialize CHANGE_SCHEMA
    change records into the exact record layout ``format("kafka")``
    presents on the consumer side (key/value binary, topic, partition,
    offset, timestamp, timestampType) — pgshovel's relay publishes
    mutation batches to a bus in this shape.

    Contract choices a real deployment cares about:
    - record KEY = ``table|<json key map>`` so a partitioner keyed on
      it preserves per-entity ordering (the same guarantee the
      reference relay gets from PgQ batch order per table),
    - partition = pmod(hash(key), n) — deterministic, entity-sticky,
    - offset = the envelope's dense per-publisher ``seq``,
    - value = full-precision JSON (microsecond timestamps pinned by
      ``_WIRE_TS_FMT``; the default to_json would truncate to millis
      and break decode/re-encode byte parity).

    With a broker + spark-sql-kafka jar this frame writes out via
    ``.write.format("kafka")`` unchanged; without one it records to
    parquet, and ``parse_change_envelope`` over the recording is
    byte-identical to the kafka branch's post-``load()`` plan — the
    strongest parity evidence the sandbox allows.
    """
    key = F.concat(
        F.col("table"), F.lit("|"), F.coalesce(F.to_json("key"), F.lit("{}"))
    )
    return changes.select(
        F.encode(key, "UTF-8").alias("key"),
        F.encode(
            F.to_json(
                F.struct(*[F.col(f.name) for f in CHANGE_SCHEMA.fields]),
                {"timestampFormat": _WIRE_TS_FMT},
            ),
            "UTF-8",
        ).alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.hash(key), F.lit(n_partitions)).cast("int").alias("partition"),
        F.col("seq").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )


def parse_change_envelope(
    raw: DataFrame, schema: StructType | None = None
) -> DataFrame:
    """Decode Kafka wire rows (binary ``value`` plus
    key/topic/partition/offset/timestamp envelope columns) into
    CHANGE_SCHEMA change records — the exact projection the kafka
    branch of ``stream_source`` applies after ``.load()``.

    Factored out so the parse/schema contract is testable WITHOUT a
    broker: the contract test feeds recorded Kafka-shaped batch rows
    through this function and asserts parity with the file-source
    branch; the only surface left untested in the sandbox is
    ``format("kafka").load()`` itself (a Spark built-in).

    Malformed JSON yields a NULL struct -> NULL columns (Spark
    from_json PERMISSIVE), which the downstream idempotent upsert
    drops on its NULL-key filter rather than poisoning the batch.
    Works on both batch and streaming DataFrames.

    Timestamp decode is LENIENT on purpose: pinning ``timestampFormat``
    to the strict microsecond pattern inside from_json would disable
    Spark's datetime-parse fallback, so an envelope whose ``ts`` lacks
    a fractional second (Spark's own default to_json omits ``.000``
    for whole-second values) or a zone offset — common from legacy /
    third-party bus producers at this public ingestion seam — would
    silently decode to NULL and then poison ordering/dedup downstream.
    Timestamp-typed fields are therefore parsed as STRINGS and
    converted with try_to_timestamp(strict wire format) falling back
    to Spark's lenient ISO-8601 parser; only the PRODUCER side
    (``to_kafka_records``) keeps the strict format, preserving
    round-trip byte parity."""
    sch = schema or CHANGE_SCHEMA
    wire_schema = StructType(
        [
            StructField(
                f.name,
                StringType() if isinstance(f.dataType, TimestampType) else f.dataType,
                f.nullable,
            )
            for f in sch.fields
        ]
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), wire_schema).alias("c")
    ).select("c.*")
    for f in sch.fields:
        if isinstance(f.dataType, TimestampType):
            parsed = parsed.withColumn(
                f.name,
                F.coalesce(
                    F.try_to_timestamp(F.col(f.name), F.lit(_WIRE_TS_FMT)),
                    F.try_to_timestamp(F.col(f.name)),
                ),
            )
    return parsed


def mutations_from_events(events: DataFrame) -> DataFrame:
    """Adapt the events fixture into change records (each event = an
    UPSERT of that user's latest state) so streaming tests exercise
    the change-record schema without a Postgres."""
    return events.select(
        F.lit("UPDATE").alias("op"),
        F.lit("events").alias("table"),
        F.create_map(F.lit("user_id"), F.col("user_id").cast("string")).alias("key"),
        F.lit(None).cast(MapType(StringType(), StringType())).alias("before"),
        F.create_map(
            F.lit("event_type"), F.col("event_type"),
            F.lit("value"), F.col("value").cast("string"),
        ).alias("after"),
        F.col("event_id").alias("txid"),
        F.col("ts"),
        F.lit("publisher-1").alias("publisher"),
        F.lit(1).cast("long").alias("epoch"),
        F.col("event_id").alias("seq"),
    )
