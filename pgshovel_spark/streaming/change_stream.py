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
