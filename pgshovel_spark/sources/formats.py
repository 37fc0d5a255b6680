"""Additional batch formats + partitioned sinks.

Parquet is canonical (sources.tables); these cover the remaining
ingest/egress surface an engine user needs: schema-explicit CSV/JSON
readers (never schema inference in production paths — one pass over
100 TB just to guess types is a bug, and inferred types drift) and a
date-partitioned Parquet writer (the layout that makes partition
pruning work at scale — SCALE.md).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with an explicit schema (required: inference double-scans
    and guesses).  FAILFAST by default — PERMISSIVE silently nulls
    every cell that doesn't parse, which corrupts ingest without a
    trace; pass mode='PERMISSIVE' explicitly to accept that."""
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", options.pop("mode", "FAILFAST"))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str, **options: str
) -> DataFrame:
    """JSON-lines with an explicit schema.  FAILFAST by default (see
    read_csv)."""
    reader = spark.read.schema(schema).option("mode", options.pop("mode", "FAILFAST"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) managed table — the layout that makes
    repeated fact-fact joins SHUFFLE-FREE.

    Both sides of a join bucketed by the join key into the same bucket
    count are already co-partitioned on disk; Spark's sort-merge join
    then runs with NO Exchange on either side (asserted in
    tests/test_plans.py).  At 100 TB this converts every recurring join
    on the bucketing key from a full-table shuffle into a local merge —
    the single biggest recurring-cost saver in a warehouse.  Sorting
    within buckets (``sort_cols``) additionally removes the Sort.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC reader — ORC carries its own schema (like Parquet), so no
    explicit schema is required; predicate pushdown and column pruning
    work the same way (spark.sql.orc.filterPushdown is on by default).
    """
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC writer with optional directory partitioning (zlib default;
    pass compression via df.write options upstream if needed)."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row", **options: str
) -> DataFrame:
    """XML reader (Spark 4 native ``format("xml")`` — the donated
    spark-xml module, no external jar).  ``rowTag`` selects the
    repeating element; nested elements land as structs/arrays, and
    attributes surface as ``_attr`` columns.  Schema inference scans
    the files once — pass an explicit ``schema`` via options-free
    ``spark.read.schema(...).format("xml")`` upstream for the
    production two-pass-avoiding shape; at 100 TB use a fixed schema
    and directory partitioning exactly like the JSON path."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML writer (one element per row under ``rootTag``)."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def read_evolving(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Parquet reader for tables whose schema has WIDENED over time
    (columns added by newer writers): ``mergeSchema`` unions the file
    footers' schemas; missing columns read as NULL in older files.
    Costs one footer pass over the file listing — acceptable for
    occasional evolving tables, wrong as a default (keep canonical
    tables on the single-schema fast path)."""
    reader = spark.read.option("mergeSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-file compaction — rewrite a parquet directory into files of
    ~``target_file_mb`` and atomically swap it in.  Returns the new
    file count.

    Streaming sinks and incremental ingest accrete small files; at
    100 TB the resulting open/seek amplification dominates scan cost
    (a 256 MB target keeps row groups large enough for effective
    row-group pruning).  Unpartitioned: file count = ceil(bytes /
    target) via round-robin repartition.  Partitioned: repartition BY
    the partition columns so each partition's rows land in one task →
    one file per partition directory (round-robin here would emit
    n_files × n_partitions small files — the exact problem compaction
    exists to fix).  Swap is rename-based with crash recovery: if a
    previous compact died between the two renames, the backup dir is
    restored before anything else runs.
    """
    import math
    import os
    import shutil

    staging = path + ".compact"
    backup = path + ".old"
    # crash recovery: backup exists and path missing -> restore backup
    if os.path.isdir(backup) and not os.path.isdir(path):
        os.rename(backup, path)
    for leftover in (staging, backup):
        shutil.rmtree(leftover, ignore_errors=True)

    src = Path(path)
    target_bytes = target_file_mb * 1024 * 1024
    total = sum(f.stat().st_size for f in src.rglob("*.parquet"))
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    if partition_cols:
        # target_file_mb is enforced via maxRecordsPerFile (estimated
        # from on-disk bytes/row).  The row count comes from the
        # parquet FOOTERS driver-side (num_rows per file) — df.count()
        # is NOT metadata-only with aggregate pushdown off (the
        # default) and would add a second full scan to every
        # compaction.
        import pyarrow.parquet as pq

        n_records = sum(
            pq.ParquetFile(str(f)).metadata.num_rows
            for f in src.rglob("*.parquet")
        )
        rec_bytes = max(1, total // max(1, n_records))
        max_rec = max(1, target_bytes // rec_bytes)
        w = (
            df.repartition(*partition_cols)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", int(max_rec))
            .partitionBy(*partition_cols)
        )
    else:
        w = df.repartition(n_files).write.mode("overwrite")
    w.parquet(staging)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return len(list(Path(path).rglob("*.parquet")))


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    cluster_by: list[str] | None = None,
    bloom_cols: dict[str, int] | None = None,
    **options: str,
) -> None:
    """Partitioned Parquet writer — the production layout: one
    directory level per partition column so Catalyst prunes partitions
    before reading a byte.  Caller picks columns with sane cardinality
    (date/month, not a raw key).

    Two optional data-skipping levers BELOW the partition level
    (measured, EXPERIMENTS.md round 7):

    - ``cluster_by``: sort within partitions so row-group min/max
      ranges on the sort columns are disjoint — a range filter then
      decodes only the matching groups (18x fewer rows on a month
      filter; requires the session's TIMESTAMP_MICROS encoding for
      timestamp columns, since INT96 carries no stats).
    - ``bloom_cols``: ``{column: expected_ndv}`` writes a parquet
      bloom filter per row group for high-cardinality POINT-LOOKUP
      columns that clustering can't also serve (only one sort order
      exists) — an equality probe skips groups whose bloom rejects
      the value (6.5x fewer rows decoded on an unsorted key lookup).
    """
    if cluster_by:
        # Sort by (partition cols, cluster cols) together: the file
        # writer REQUIRES its input ordered by the partition columns
        # and re-sorts by them alone if it isn't — which would destroy
        # a bare cluster_by sort.  The combined order satisfies the
        # writer's requirement AND survives into the written row
        # groups.
        df = df.sortWithinPartitions(*partition_cols, *cluster_by)
    w = df.write.mode(mode).partitionBy(*partition_cols)
    for k, v in options.items():
        w = w.option(k, v)
    for col, ndv in (bloom_cols or {}).items():
        w = w.option(f"parquet.bloom.filter.enabled#{col}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{col}", str(ndv)
        )
    w.parquet(path)


def with_date_partition(df: DataFrame, ts_col: str, name: str = "p_date") -> DataFrame:
    """Add a day-granularity partition column from an event-time
    column (the standard time-partitioned fact layout)."""
    return df.withColumn(name, F.date_format(F.col(ts_col), "yyyy-MM-dd"))
