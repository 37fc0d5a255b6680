"""Streaming sinks: exactly-once-style delivery on Spark primitives.

The reference publishes PgQ batches to Kafka and only then calls
``finish_batch`` (at-least-once + consumer idempotence).  The Spark
equivalent: ``foreachBatch`` + ``checkpointLocation`` gives replayable
batch ids; the sink below makes the apply idempotent (merge by key),
so replays converge — the same end-to-end contract.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def run_to_memory(stream: DataFrame, name: str, output_mode: str = "append"):
    """Run a streaming query to completion over all available input
    (availableNow) into an in-memory table; returns the query after
    awaiting termination.  Test/dev harness — the streaming analog of
    ``collect()``."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def upsert_foreach_batch(
    stream: DataFrame,
    target_dir: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    checkpoint_dir: str | None = None,
):
    """Latest-state upsert sink: each micro-batch merges into a keyed
    Parquet table, keeping the newest row per key by ``order_cols``.

    Plain-Parquet merge (read + union + rank + overwrite) because this
    environment has no transactional table format; on a real deployment
    the foreachBatch body becomes a Delta/Iceberg MERGE with the same
    key semantics.  Idempotent: replaying a batch converges to the
    same table.
    """
    keys = list(keys)
    order_cols = list(order_cols)
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="pgshovel-ckpt-")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tmp_target = target_dir + ".staging"
        if os.path.exists(os.path.join(target_dir, "_SUCCESS")):
            current = spark.read.parquet(target_dir)
            merged = current.unionByName(batch_df.select(*current.columns))
        else:
            merged = batch_df
        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        latest.write.mode("overwrite").parquet(tmp_target)
        spark.read.parquet(tmp_target).write.mode("overwrite").parquet(target_dir)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
