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

import datetime
import decimal
import json
import numbers
import os
import re
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def sql_literal(v: object, style: str = "ansi") -> str:
    """Render a watermark value as a safe SQL literal for the remote
    database (JDBC pushdown predicates can't use bind parameters from
    Spark's dbtable subquery, so literals must be escaped here — never
    via bare ``repr`` interpolation).

    ``style`` selects the temporal-literal grammar — the one place the
    engines we target genuinely disagree (found live by the dialect
    conformance harness, tests/test_dialect.py): ANSI/Postgres accept
    ``TIMESTAMP '...'`` typed literals, while Derby's parser rejects
    them and requires the function form ``TIMESTAMP('...')``.  All
    other literal classes render identically.
    """
    if style not in ("ansi", "derby"):
        raise ValueError(f"unknown literal style {style!r}")
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, numbers.Integral):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        if not v.is_finite():
            raise ValueError(f"non-finite watermark cannot be a SQL literal: {v!r}")
        return str(v)
    if isinstance(v, numbers.Real):
        f = float(v)
        if f != f or f in (float("inf"), float("-inf")):
            raise ValueError(f"non-finite watermark cannot be a SQL literal: {v!r}")
        return repr(f)
    if isinstance(v, datetime.datetime):
        body = v.isoformat(sep=" ")
        if style == "derby":
            return f"TIMESTAMP('{body}')"
        return f"TIMESTAMP '{body}'"
    if isinstance(v, datetime.date):
        if style == "derby":
            return f"DATE('{v.isoformat()}')"
        return f"DATE '{v.isoformat()}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


class ReplicationSet:
    """A named group of tables captured from one source — the RUNTIME
    view of a replication set (watermark paths for the pull loop).

    The validated, versioned source of truth is
    ``sources.administration.SetConfig``; constructing a non-empty
    ReplicationSet runs the same validation, so a config that the
    administration layer would reject cannot reach the runtime.
    """

    def __init__(
        self,
        name: str,
        tables: dict[str, dict],
        checkpoint_dir: str | None = None,
    ) -> None:
        # tables: {table_name: {"cursor_col": str, "key_cols": [str, ...]}}
        if tables:
            from pgshovel_spark.sources import administration as admin

            admin._validate(
                admin.SetConfig(
                    name=name,
                    tables={
                        t: admin.TableConfig(**spec) for t, spec in tables.items()
                    },
                )
            )
        self.name = name
        self.tables = tables
        self.checkpoint_dir = checkpoint_dir

    def watermark_path(self, table: str) -> str | None:
        if not self.checkpoint_dir:
            return None
        return os.path.join(self.checkpoint_dir, f"{self.name}.{table}.watermark.json")


def cursor_subquery(
    table: str, cursor_col: str, watermark: object, style: str = "ansi"
) -> str:
    """The pushdown subquery a high-watermark pull sends to the remote
    database as the JDBC ``dbtable``.  Pure function so the generated
    SQL is unit-testable without a live database."""
    if not _IDENT.fullmatch(cursor_col):
        raise ValueError(f"cursor_col is not a plain identifier: {cursor_col!r}")
    # the table name is spliced into remote SQL just like cursor_col —
    # validate BOTH identifiers (schema-qualified allowed), or a caller
    # bypassing administration's validation carries an injection hole
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?", table):
        raise ValueError(f"table is not a plain identifier: {table!r}")
    pred = (
        ""
        if watermark is None
        else f" WHERE {cursor_col} > {sql_literal(watermark, style)}"
    )
    return f"(SELECT * FROM {table}{pred}) AS src"


def jdbc_snapshot_reader(
    spark: SparkSession,
    url: str,
    table: str,
    options: dict | None = None,
    style: str | None = None,
) -> Callable[[object], DataFrame]:
    """Build a snapshot-read function over JDBC: given a watermark
    value, return rows with cursor beyond it.  The predicate is pushed
    into the database query (dbtable subquery), so each pull scans
    only new rows server-side.  ``style`` picks the literal grammar
    (sources/dialect.py); when omitted it is inferred from the URL
    scheme so the Derby test rigs and Postgres production configs both
    work unannotated."""
    if style is None:
        style = "derby" if url.startswith("jdbc:derby") else "ansi"

    def read(watermark, cursor_col: str = "id") -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", cursor_subquery(table, cursor_col, watermark, style))
        )
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        return reader.load()

    # explicit protocol marker: the pull loop passes ITS cursor column
    # to readers that declare this, without signature sniffing (which
    # goes blind through functools.partial / **kwargs wrappers and
    # would silently re-split the pushdown column from the loop's max)
    read.accepts_cursor_col = True
    return read


def parallel_bootstrap_options(
    partition_col: str,
    lower: int,
    upper: int,
    num_partitions: int,
    snapshot_id: str | None = None,
) -> dict[str, str]:
    """JDBC reader options for the PARALLEL initial table copy — the
    scale path of bootstrap: N partition readers, each its own
    connection, splitting ``partition_col`` into ``num_partitions``
    ranges.

    ``snapshot_id`` wires the readers to ONE Postgres exported
    snapshot (``pg_export_snapshot()`` on the coordinating
    connection): Spark's JDBC ``sessionInitStatement`` executes on
    EVERY partition's connection right after it opens, so each reader
    issues ``SET TRANSACTION SNAPSHOT`` before its range scan and all
    N ranges observe the same MVCC instant — without it, a row moving
    between ranges mid-copy is read twice or lost.  The
    per-connection execution guarantee (one init per partition
    connection) is proven LIVE on Derby in
    tests/test_dialect.py::test_parallel_bootstrap_session_init; the
    Postgres-specific statement text needs a live server and is the
    declared 'snapshot-export' quirk (sources/dialect.py).
    """
    if not _IDENT.fullmatch(partition_col):
        raise ValueError(f"partition_col is not a plain identifier: {partition_col!r}")
    opts = {
        "partitionColumn": partition_col,
        "lowerBound": str(int(lower)),
        "upperBound": str(int(upper)),
        "numPartitions": str(int(num_partitions)),
    }
    if snapshot_id is not None:
        if "'" in snapshot_id:
            raise ValueError(f"malformed snapshot id: {snapshot_id!r}")
        opts["sessionInitStatement"] = (
            "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; "
            f"SET TRANSACTION SNAPSHOT '{snapshot_id}'"
        )
    return opts


def _encode_watermark(v: object) -> dict:
    """JSON-safe watermark encoding with a type tag so a restart
    restores the exact Python type (datetime/date/Decimal cursors would
    otherwise crash json.dump or come back as bare strings and be
    rendered as the wrong SQL literal type)."""
    if isinstance(v, datetime.datetime):
        return {"type": "datetime", "value": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"type": "date", "value": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"type": "decimal", "value": str(v)}
    return {"type": "plain", "value": v}


def _decode_watermark(d: dict) -> object:
    t, v = d["type"], d["value"]
    if t == "datetime":
        return datetime.datetime.fromisoformat(v)
    if t == "date":
        return datetime.date.fromisoformat(v)
    if t == "decimal":
        return decimal.Decimal(v)
    return v


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

    DEPLOYMENT CONSTRAINT for TIMESTAMP cursors: the watermark value
    round-trips through the driver's JVM/OS timezone (JDBC
    getTimestamp → naive Python datetime → rendered literal).  Run
    the driver with a FIXED-OFFSET timezone (UTC — the standard JDBC
    guidance; session.py pins it): on a DST zone, a cursor value in
    the ambiguous repeated hour can read back an hour high and the
    next pull's ``> watermark`` predicate would silently skip that
    hour's rows.  Monotone integer cursors carry no such hazard.

    The snapshot_read callable abstracts the source: JDBC in
    production (jdbc_snapshot_reader), a parquet-backed lambda in
    tests — identical loop either way.  Cursor-aware readers OPT IN by
    setting ``accepts_cursor_col = True`` on the callable
    (jdbc_snapshot_reader's do): they then receive THIS loop's cursor
    column, so the server-side pushdown predicate and the loop's
    max() always name the same column — the dialect harness caught a
    non-integer cursor silently comparing against the reader's
    default column otherwise.  A signature sniff backstops legacy
    readers that declare the keyword without the marker, but the
    marker is authoritative because ``inspect.signature`` goes blind
    through functools.partial / **kwargs wrappers — exactly the
    mismatch the explicit protocol exists to prevent.
    """

    import inspect

    takes_cursor = getattr(snapshot_read, "accepts_cursor_col", None)
    if takes_cursor is None:
        try:
            takes_cursor = (
                "cursor_col" in inspect.signature(snapshot_read).parameters
            )
        except (TypeError, ValueError):  # builtins / C callables
            takes_cursor = False

    def _read(wm):
        if takes_cursor:
            return snapshot_read(wm, cursor_col=cursor_col)
        return snapshot_read(wm)  # single-arg readers (file-backed rigs)

    watermark = None
    if watermark_file and os.path.exists(watermark_file):
        # A corrupt watermark file (crash mid-write of a NON-atomic
        # writer, disk-full truncation) must degrade to a FULL re-pull
        # (watermark None), never a wedged loop: the consumer contract
        # is at-least-once, so re-delivery is safe and an idempotent
        # sink absorbs it.  The writer below is atomic (tmp + rename),
        # so this path only fires for files damaged by outside causes.
        # Only CORRUPTION (bad json/shape) and a vanished file degrade;
        # any other OSError (EACCES, NFS blip) re-raises — a transient
        # read failure is a config/infra error, and silently resetting
        # to None would trigger a full source re-pull that masks it
        # (very expensive at scale).
        try:
            with open(watermark_file) as f:
                raw = json.load(f)["watermark"]
            watermark = _decode_watermark(raw) if isinstance(raw, dict) else raw
        except (ValueError, KeyError, TypeError, FileNotFoundError):
            # TypeError included: valid-JSON-but-wrong-shape content
            # (e.g. a top-level list, or a non-string inside the typed
            # envelope) must ALSO degrade to the full re-pull, never a
            # restart-wedging crash
            watermark = None
    pulls = 0
    while max_pulls is None or pulls < max_pulls:
        # Pin the batch before reading its max: the JDBC read is lazy,
        # and re-executing it for the consumer could see rows inserted
        # AFTER the watermark scan (delivered now AND next pull =
        # duplicates).  persist() makes the max() action materialize the
        # snapshot the consumer will also read; rows that arrive later
        # simply surface in the next pull.
        batch = _read(watermark).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            hi = batch.agg(F.max(cursor_col).alias("hi")).collect()[0].hi
            if hi is None:
                return
            yield batch
        finally:
            batch.unpersist()
        watermark = hi
        if watermark_file:
            # Atomic commit: write-temp + rename, so a crash at ANY
            # instant leaves either the previous watermark or the new
            # one — never a torn file.  A torn watermark would crash
            # every restart (json error) until manually deleted; with
            # rename the worst case is re-pulling one batch
            # (at-least-once, idempotent sink).
            os.makedirs(os.path.dirname(watermark_file) or ".", exist_ok=True)
            tmp = watermark_file + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"watermark": _encode_watermark(watermark)}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, watermark_file)
        pulls += 1


# ------------------------------------------------- snapshot bootstrap

def mvcc_visible(txid_col, xmin: int, xmax: int, xip: list[int]):
    """Postgres MVCC visibility of a transaction in snapshot
    {xmin, xmax, xip}: txid < xmin committed-and-visible; >= xmax not
    yet assigned at snapshot time; in xip in-progress at snapshot time
    (hence invisible even though < xmax).  Returns a boolean Column.

    This is the visibility rule pgshovel's PgQ batches carry
    (Snapshot {min(xmin), max(xmax), active(xip)} per batch, SURVEY.md
    §1.1) — reconstructed from public Postgres MVCC semantics; the
    reference snapshot is empty, so no file:line citation is possible.
    """
    c = F.col(txid_col) if isinstance(txid_col, str) else txid_col
    vis = c < F.lit(xmax)
    if xip:
        vis = vis & ~c.isin(list(xip))
    # txid < xmin is visible UNCONDITIONALLY (every txn below xmin had
    # completed at snapshot time), even against a malformed xip entry.
    return (c < F.lit(xmin)) | vis


def bootstrap_consistent_state(
    snapshot_df: DataFrame,
    changes_df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    txid_col: str = "txid",
    xmin: int = 0,
    xmax: int = 0,
    xip: list[int] | None = None,
) -> DataFrame:
    """Consistent initial load: combine a table dump taken at MVCC
    snapshot {xmin, xmax, xip} with the mutation stream, applying ONLY
    mutations NOT already reflected in the dump (txid invisible to the
    snapshot), then keep the newest row per key.  The change-stream
    consumer can then resume from the stream position with an
    idempotent upsert sink — replayed mutations the dump already
    reflects change nothing, which is the whole point of doing the
    filter by MVCC visibility instead of by wall-clock.

    Scale shape: one visibility filter (row-local) + the same
    rank-per-key merge the upsert sinks use; the snapshot side is a
    plain (column-pruned, partition-pruned) batch read.
    """
    xip = xip or []
    # a NULL txid is a malformed change row: ~mvcc_visible(NULL)
    # evaluates NULL and the filter would SILENTLY drop the mutation
    # (a lost update in the bootstrapped state) — fail loudly instead
    vis = mvcc_visible(txid_col, xmin, xmax, xip)
    guarded = F.when(
        F.col(txid_col).isNull(),
        F.raise_error(
            F.lit("bootstrap_consistent_state: change row with NULL txid")
        ).cast("boolean"),
    ).otherwise(vis)
    post = changes_df.filter(~guarded)
    # Source-precedence tiebreak: a post-snapshot mutation that TIES
    # the snapshot row on every order column must still win (it is by
    # construction newer — it was invisible to the snapshot), else
    # row_number picks a nondeterministic winner on ties.
    cols = snapshot_df.columns
    tagged = (
        snapshot_df.select(*cols)
        .withColumn("__src", F.lit(0))
        .unionByName(post.select(*cols).withColumn("__src", F.lit(1)))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols], F.col("__src").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
