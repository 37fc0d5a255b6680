"""Incremental CDC ingest — the engine's replacement for pgshovel's
trigger + PgQ capture (reconstructed from public knowledge; SURVEY.md
§2.A "JDBC source").

pgshovel installs a trigger per configured table and drains batches
from PgQ.  Spark cannot (and per BASELINE.json should not) replicate
in-database WAL/trigger mechanics; the idiomatic equivalent is
high-watermark incremental pulls: repeatedly read rows with
``cursor_col > last_seen`` and feed each chunk downstream as a
micro-batch.  With a JDBC URL this runs against a live database;
the same loop over a file-backed snapshot function drives tests.

At scale: per-pull predicate pushdown happens in the database
(``WHERE cursor > ?``), reads parallelize via JDBC partitioning
options (partitionColumn/num Partitions), and the watermark persists
in the checkpoint directory so restarts resume exactly.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ReplicationSet:
    """A named group of tables captured from one source — the engine's
    analog of pgshovel's ReplicationSetConfiguration {database, tables}
    (protobuf -> plain dataclass-ish config; no ZooKeeper: config is
    just data handed to the runtime)."""

    def __init__(
        self,
        name: str,
        tables: dict[str, dict],
        checkpoint_dir: str | None = None,
    ) -> None:
        # tables: {table_name: {"cursor_col": str, "key_cols": [str, ...]}}
        self.name = name
        self.tables = tables
        self.checkpoint_dir = checkpoint_dir

    def watermark_path(self, table: str) -> str | None:
        if not self.checkpoint_dir:
            return None
        return os.path.join(self.checkpoint_dir, f"{self.name}.{table}.watermark.json")


def jdbc_snapshot_reader(
    spark: SparkSession, url: str, table: str, options: dict | None = None
) -> Callable[[object], DataFrame]:
    """Build a snapshot-read function over JDBC: given a watermark
    value, return rows with cursor beyond it.  The predicate is pushed
    into the database query (dbtable subquery), so each pull scans
    only new rows server-side."""

    def read(watermark, cursor_col: str = "id") -> DataFrame:
        pred = "" if watermark is None else f" WHERE {cursor_col} > {watermark!r}"
        reader = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", f"(SELECT * FROM {table}{pred}) AS src")
        )
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        return reader.load()

    return read


def incremental_pulls(
    snapshot_read: Callable[[object], DataFrame],
    cursor_col: str,
    watermark_file: str | None = None,
    max_pulls: int | None = None,
) -> Iterator[DataFrame]:
    """Drive high-watermark incremental ingest: yield one DataFrame of
    new rows per pull, persisting the watermark between pulls (the
    engine's ``pgq.finish_batch``).  Stops when a pull returns no new
    rows (or after ``max_pulls``).

    The snapshot_read callable abstracts the source: JDBC in
    production (jdbc_snapshot_reader), a parquet-backed lambda in
    tests — identical loop either way.
    """
    watermark = None
    if watermark_file and os.path.exists(watermark_file):
        with open(watermark_file) as f:
            watermark = json.load(f)["watermark"]
    pulls = 0
    while max_pulls is None or pulls < max_pulls:
        batch = snapshot_read(watermark)
        hi = batch.agg(F.max(cursor_col).alias("hi")).collect()[0].hi
        if hi is None:
            return
        yield batch
        watermark = hi
        if watermark_file:
            os.makedirs(os.path.dirname(watermark_file) or ".", exist_ok=True)
            with open(watermark_file, "w") as f:
                json.dump({"watermark": watermark}, f)
        pulls += 1
