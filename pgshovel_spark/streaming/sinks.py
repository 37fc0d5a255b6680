"""Streaming sinks: exactly-once-style delivery on Spark primitives.

The reference publishes PgQ batches to Kafka and only then calls
``finish_batch`` (at-least-once + consumer idempotence).  The Spark
equivalent: ``foreachBatch`` + ``checkpointLocation`` gives replayable
batch ids; the sink below makes the apply idempotent (merge by key),
so replays converge — the same end-to-end contract.
"""

from __future__ import annotations

import os
import shutil
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


def _has_table(d: str) -> bool:
    """A USABLE persisted table: committed (_SUCCESS) AND holding at
    least one data file — a 0-row write leaves only _SUCCESS, and
    reading such a dir throws UNABLE_TO_INFER_SCHEMA."""
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        return False
    for _root, _dirs, files in os.walk(d):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _latest_rows(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """Newest row per key by order_cols — the shared dedup rank used by
    every upsert sink (one definition, one contract)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _run_foreach_batch(stream: DataFrame, apply_batch, checkpoint_dir: str):
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
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
        staging = target_dir + ".staging"
        backup = target_dir + ".old"
        # Crash recovery: a previous apply may have died mid-swap.  If
        # the target is gone/incomplete but a complete staging exists,
        # promote it — prior state is never silently dropped.
        if not _has_table(target_dir) and _has_table(staging):
            if os.path.exists(target_dir):
                shutil.rmtree(target_dir)
            os.rename(staging, target_dir)
        for leftover in (staging, backup):
            if os.path.exists(leftover):
                shutil.rmtree(leftover)
        if batch_df.isEmpty():
            return  # a 0-row write would leave a data-file-less table
        if _has_table(target_dir):
            current = spark.read.parquet(target_dir)
            merged = current.unionByName(batch_df.select(*current.columns))
        else:
            merged = batch_df
        latest = _latest_rows(merged, keys, order_cols)
        # Write the new table beside the old one, then swap via two
        # renames (atomic on POSIX; any crash window is covered by the
        # recovery above).  Real deployments on object stores use a
        # transactional format's MERGE instead — see docstring.
        latest.write.mode("overwrite").parquet(staging)
        if os.path.exists(target_dir):
            os.rename(target_dir, backup)
        os.rename(staging, target_dir)
        if os.path.exists(backup):
            shutil.rmtree(backup)

    return _run_foreach_batch(stream, apply_batch, checkpoint_dir)


def merge_upsert_foreach_batch(
    stream: DataFrame,
    target_dir: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    n_buckets: int = 16,
    checkpoint_dir: str | None = None,
):
    """MERGE-shaped upsert: rewrite ONLY the key-bucket partitions a
    micro-batch touches, not the whole table.

    The state table is partitioned by ``__kb = pmod(xxhash64(keys),
    n_buckets)``.  Each batch (1) computes its affected buckets — a
    ≤ n_buckets distinct scan of the (small) batch, (2) reads just
    those partitions back (directory-level partition pruning), (3)
    merges + ranks latest-per-key, and (4) writes the merged buckets to
    a staging dir and swaps each affected bucket dir in via
    rename-away/rename-in (crash windows healed by a recovery pass —
    NOT dynamic partition overwrite, whose in-place commit can drop a
    bucket's untouched keys on a crash).  Untouched buckets are never
    read or rewritten — per-batch upkeep is O(changed keys), not
    O(table), which is what MERGE gives you on Delta/Iceberg.  At
    100 TB, size n_buckets so one bucket ≈ a few GB.

    ``n_buckets`` is a TABLE property, not a call option: it is
    persisted beside the table on first write and later calls must
    match (a different count would re-bucket new keys while stale rows
    linger in old buckets — silent duplicate keys).

    Idempotent like upsert_foreach_batch: replaying a batch converges.
    """
    keys = list(keys)
    order_cols = list(order_cols)
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="pgshovel-ckpt-")
    kb = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")

    staging_root = target_dir + ".staging"
    bak_root = target_dir + ".bak"
    meta_path = target_dir + ".meta.json"

    def _check_meta() -> None:
        import json

        if os.path.exists(meta_path):
            with open(meta_path) as f:
                stored = json.load(f)
            if stored.get("n_buckets") != n_buckets:
                raise ValueError(
                    f"state table was bucketed with n_buckets="
                    f"{stored.get('n_buckets')}; got {n_buckets} — rebucket "
                    "the table (rewrite) instead of changing the call option"
                )
        else:
            os.makedirs(os.path.dirname(meta_path) or ".", exist_ok=True)
            with open(meta_path, "w") as f:
                json.dump({"n_buckets": n_buckets, "keys": keys}, f)

    def _recover() -> None:
        """Heal an interrupted bucket swap: a bucket dir still in .bak
        whose target dir is missing was renamed away but never replaced
        — restore it so no key's state is ever lost."""
        if os.path.isdir(bak_root):
            for d in os.listdir(bak_root):
                src = os.path.join(bak_root, d)
                dst = os.path.join(target_dir, d)
                if d.startswith("__kb=") and not os.path.exists(dst):
                    os.rename(src, dst)
            shutil.rmtree(bak_root, ignore_errors=True)
        shutil.rmtree(staging_root, ignore_errors=True)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover()
        _check_meta()
        if batch_df.isEmpty():
            return  # a 0-row first write would leave a data-file-less table
        b = batch_df.withColumn("__kb", kb)
        if not _has_table(target_dir):
            # first batch: plain partitioned write
            b_latest = _latest_rows(b, keys, order_cols)
            b_latest.write.mode("overwrite").partitionBy("__kb").parquet(target_dir)
            return
        buckets = [r["__kb"] for r in b.select("__kb").distinct().collect()]
        if not buckets:
            return
        current = spark.read.parquet(target_dir).filter(F.col("__kb").isin(buckets))
        latest = _latest_rows(
            current.unionByName(b.select(*current.columns)), keys, order_cols
        )
        # Write the merged buckets BESIDE the table, then swap each
        # affected bucket dir via rename-away / rename-in.  _recover()
        # restores any bucket a crash left renamed-away, so the WRITER
        # never loses a key — but an external reader scanning the table
        # between such a crash and the stream's restart can observe the
        # missing bucket.  True reader isolation needs a transactional
        # table format (Delta/Iceberg MERGE), per the module docstring.
        latest.write.mode("overwrite").partitionBy("__kb").parquet(staging_root)
        os.makedirs(bak_root, exist_ok=True)
        for d in os.listdir(staging_root):
            if not d.startswith("__kb="):
                continue
            tgt = os.path.join(target_dir, d)
            bak = os.path.join(bak_root, d)
            if os.path.exists(tgt):
                os.rename(tgt, bak)
            os.rename(os.path.join(staging_root, d), tgt)
        shutil.rmtree(bak_root, ignore_errors=True)
        shutil.rmtree(staging_root, ignore_errors=True)

    return _run_foreach_batch(stream, apply_batch, checkpoint_dir)
