"""Session-scoped shared-artifact store: parquet scratch tables and
reliable checkpoints.

Shared derived tables (the token / shingle posting tables, per-lang
token counts, the dedup cluster map) used to be memoized
``localCheckpoint``s.  A localCheckpoint lives only in executor block
managers with TRUNCATED lineage: on a real cluster, one lost executor
invalidates every later consumer of the artifact for the rest of the
session — the Spark runtime itself warns "cannot be recomputed after
unpersisting".  Writing the artifact as parquet under a session
scratch directory keeps the build-once / reuse-everywhere economics
while adding storage durability, and it is exactly the "persist the
posting table once" shape a production pipeline uses at 100 TB: the
scratch root stands in for the artifact location in object storage
(set it to an s3://... / hdfs://... URI on a cluster), consumers are
plain parquet scans with full column pruning and predicate pushdown,
and a lost executor re-reads from storage instead of failing the
session.

Two more helpers: ``materialize`` marks a per-query multi-branch
subtree cached WITH lineage intact (compute once, recoverable from
the plan), and ``truncate`` is a reliable checkpoint into the scratch
root for iterative algorithms that must cut lineage while keeping the
round table on storage.

Everything here is driver-light: paths and a dict of DataFrame
handles; no data ever reaches the driver.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

#: Scratch root.  Repo-local so the sandboxed test/bench runs never
#: write outside the repo; on a cluster, point this at shared storage.
SCRATCH_ROOT = Path(__file__).resolve().parents[2] / ".scratch"

#: (applicationId, artifact key) -> parquet-backed DataFrame handle.
_BUILT: dict[tuple[str, str], DataFrame] = {}


def _app_dir(spark: SparkSession) -> Path:
    app = spark.sparkContext.applicationId
    d = SCRATCH_ROOT / app
    if not d.is_dir():
        # First scratch touch of this session: garbage-collect scratch
        # left by FINISHED sessions.  Age-gated (24 h) so a CONCURRENT
        # session's live artifacts are never deleted — its dir mtime is
        # recent even though its appId differs; truly stale piles from
        # old runs still clear themselves.  Best-effort.
        import time

        cutoff = time.time() - 24 * 3600
        if SCRATCH_ROOT.is_dir():
            for stale in SCRATCH_ROOT.iterdir():
                try:
                    if stale.name != app and stale.stat().st_mtime < cutoff:
                        shutil.rmtree(stale, ignore_errors=True)
                except OSError:
                    pass
        d.mkdir(parents=True, exist_ok=True)
    return d


def scratch_table(
    spark: SparkSession, name: str, sf_dir: str, build
) -> DataFrame:
    """Return the shared artifact ``name`` for ``sf_dir``, building it
    once per session: ``build(spark, sf_dir) -> DataFrame`` runs on
    first touch, its result is written as parquet under the session
    scratch dir, and every consumer (this call and all later ones)
    gets a plain parquet scan of it — durable, lineage-free to
    recompute, column-prunable."""
    key = (spark.sparkContext.applicationId, f"{name}::{sf_dir}")
    got = _BUILT.get(key)
    if got is None:
        # one directory per (artifact, fixture): sf_dir slug keeps scales
        # apart when one session touches several fixtures (tests do)
        slug = f"{name}__{abs(hash(sf_dir)) % 10**10}"
        path = _app_dir(spark) / slug
        if not (path / "_SUCCESS").exists():
            build(spark, sf_dir).write.mode("overwrite").parquet(str(path))
        got = spark.read.parquet(str(path))
        _BUILT[key] = got
    # (Re-)mark the handle cached: consumers typically fan the artifact
    # into several plan branches, and a cached scan feeds them all from
    # memory instead of re-decoding parquet per branch.  Lineage stays
    # intact (it IS the parquet scan), so an evicted/unpersisted/lost
    # block silently re-reads from storage — durable, unlike a
    # localCheckpoint.  Idempotent, and cheap to re-call after external
    # housekeeping (e.g. bench.py's between-query unpersist).
    try:
        got.persist(StorageLevel.MEMORY_AND_DISK)
    except Exception:  # pragma: no cover - already cached with other level
        pass
    return got


def clear_scratch(spark: SparkSession) -> None:
    """Drop every memoized artifact handle and its files (bench uses
    this between its warm-up and timed phases so the timed run builds
    artifacts at the timed scale inside a timed window)."""
    _BUILT.clear()
    app = spark.sparkContext.applicationId
    d = SCRATCH_ROOT / app
    for child in d.iterdir() if d.is_dir() else ():
        if child.name != "checkpoints":
            shutil.rmtree(child, ignore_errors=True)


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Mark a per-query subtree consumed by several sibling plan
    branches as cached (memory, spilling to disk), so the subtree
    computes once instead of once per branch — Catalyst reuses
    exchanges, not shared subplans.  Lineage stays intact: an evicted
    or lost block recomputes from the plan, so unlike a
    ``localCheckpoint`` this is safe on a real cluster and produces no
    truncated-lineage state.  Lazy by default (the first consuming job
    populates the cache — concurrent branches dedup via block-level
    locking); ``eager=True`` forces population now at the cost of one
    extra job."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        df.count()
    return df


def truncate(df: DataFrame) -> DataFrame:
    """Reliable checkpoint into the scratch root: cut the lineage of an
    ITERATIVE algorithm's round table so plans stay flat across rounds,
    while the round data lands on storage — a lost executor re-reads
    instead of stranding the iteration (a localCheckpoint here would).

    Sets the context checkpoint dir lazily so the call also works
    under an externally owned SparkSession (the correctness driver's)."""
    spark = df.sparkSession
    sc = spark.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(str(_app_dir(spark) / "checkpoints"))
    return df.checkpoint(eager=True)
