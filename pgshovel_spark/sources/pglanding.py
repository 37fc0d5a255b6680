"""Landing-zone bridge: live Postgres capture → Structured Streaming.

The capture side of the live stack (pglogical/pgoutput) is a serial
driver loop by design (WAL is commit-ordered); Structured Streaming
wants a replayable, checkpointable SOURCE.  This module is the
production join between them, the architecture
tools/pglive_streambench.py measures end-to-end:

  writers → slot → LandingCapture (peek → land parquet → advance)
          → landing_stream (file source) → any streaming consumer
          → e.g. foreachBatch executed-MERGE sink

Why a landing zone instead of wiring the slot straight into a custom
source: the parquet landing gives the stream a REPLAYABLE offset log
(file names), which is what lets the streaming checkpoint provide
exactly-once downstream while the slot's own watermark only promises
at-least-once into the landing.  A real deployment would point the
landing at object storage (or swap in the Kafka topic the relay
publishes to — to_kafka_records emits that exact record layout);
the consumer side is identical either way.

Watermark contract: ``advance`` runs AFTER the landing file is
durably written — "committed downstream" here means "landed".  A
crash between write and advance replays the batch into a SECOND
landing file; the envelope's (publisher, epoch, seq) identity plus
the idempotent MERGE sinks absorb the duplicates (the documented
at-least-once + idempotent-apply contract).

``seq`` rebasing: the envelope's dense per-pull seq restarts at 0
each batch; the capture loop rebases it onto a global monotone offset
(persisted in the landing dir) so the MERGE newer-guard sees one
total order across batches — the role per-partition offsets play on
a real bus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgshovel_spark.sources.pglogical import advance, pull_changes
from pgshovel_spark.sources.pgoutput import pull_changes_pgoutput
from pgshovel_spark.streaming.change_stream import CHANGE_SCHEMA

__all__ = ["LandingCapture", "landing_stream"]


class LandingCapture:
    """Pull → land → advance loop writing slot batches as parquet
    directories under ``landing_dir``.

    ``publication`` set → binary pgoutput; otherwise the
    test_decoding path with ``key_cols``.  One instance per slot
    (slots are serial); scale-out is per-database sharding with one
    capture loop each, exactly like the reference relay.

    ``transport="walsender"`` (pgoutput only) holds one persistent
    CopyBoth replication session instead of per-pull SQL-function
    calls — the production transport, measured ~3.6× the SQL
    transport's decode rate (PGRELAY.json) because the server pushes
    binary frames instead of re-decoding from the slot's restart
    point on every pull.  The watermark is the Standby Status Update
    (confirmed_flush_lsn) sent AFTER landing — the same at-least-once
    contract as peek/advance.
    """

    def __init__(
        self,
        spark: SparkSession,
        params,
        slot: str,
        landing_dir: str,
        publication: str | None = None,
        key_cols: dict[str, list[str]] | None = None,
        proto_version: int = 1,
        streaming: bool = False,
        transport: str = "sql",
    ):
        if transport not in ("sql", "walsender"):
            raise ValueError(f"unknown transport {transport!r}")
        if transport == "walsender" and publication is None:
            raise ValueError("walsender transport requires a publication")
        self.spark = spark
        self.params = params
        self.slot = slot
        self.landing_dir = landing_dir
        self.publication = publication
        self.key_cols = key_cols
        self.proto_version = proto_version
        self.streaming = streaming
        self.transport = transport
        self._repl = None  # lazy (PgReplicationConnection, stream, rels)
        os.makedirs(landing_dir, exist_ok=True)
        self._seq_file = os.path.join(landing_dir, "_seq_base")
        self.seq_base = self._read_seq()
        self.batches = 0

    def _read_seq(self) -> int:
        try:
            with open(self._seq_file) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def _write_seq(self) -> None:
        tmp = self._seq_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(self.seq_base))
        os.replace(tmp, self._seq_file)

    def _walsender(self):
        if self._repl is None:
            from pgshovel_spark.sources.pgoutput import (
                PgReplicationConnection,
            )

            rc = PgReplicationConnection(self.params)
            stream = rc.start_replication(
                self.slot,
                self.publication,
                proto_version=self.proto_version,
                streaming=self.streaming,
            )
            self._repl = (rc, stream, {})
        return self._repl

    def close(self) -> None:
        """Tear down the persistent walsender session (no-op on the
        SQL transport)."""
        if self._repl is not None:
            rc, stream, _ = self._repl
            try:
                stream.stop()
            finally:
                rc.close()
            self._repl = None

    def _land(self, df, n: int) -> None:
        """Crash-safe landing: write under a glob-invisible temp name,
        rename into place atomically, THEN persist the seq base.  A
        crash anywhere in between replays into the same slot — and the
        replayed pull is UNBOUNDED, so it may be a strict SUPERSET of
        the directory already renamed (new transactions committed
        after the crash).  The replay therefore REPLACES the existing
        directory rather than skipping it: skipping would confirm the
        extra rows without landing them.  The streaming consumer may
        have read the old part file already; the replacement's rows
        re-deliver, and the idempotent MERGE sinks absorb the overlap
        (the documented at-least-once contract into the landing).
        landing_stream's ``b_*`` glob never sees temp dirs, so partial
        writes are invisible."""
        import shutil

        out = os.path.join(self.landing_dir, f"b_{self.seq_base:016d}")
        tmp = os.path.join(self.landing_dir, f"_tmp_b_{self.seq_base:016d}")
        df.withColumn(
            "seq", F.col("seq") + F.lit(self.seq_base)
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(out, ignore_errors=True)  # crash-replay leftover
        os.rename(tmp, out)  # atomic on a local/posix filesystem
        self.seq_base += n
        self._write_seq()
        self.batches += 1

    def pull_once(self, max_seconds: float = 2.0) -> int:
        """One capture → land → confirm cycle; returns rows landed
        (0 = slot idle).  The landing write precedes the watermark
        confirmation (advance / Standby Status Update), so a crash in
        between replays the batch (at-least-once into the landing;
        the stream's checkpoint is exactly-once after it)."""
        if self.transport == "walsender":
            import time

            from pgshovel_spark.sources.pglogical import _envelope_df

            from pgshovel_spark.sources.pgwire import PgError

            parsed: list[dict] = []
            deadline = time.time() + max_seconds
            while time.time() < deadline:
                try:
                    rc, stream, rels = self._walsender()
                    got = stream.read(
                        max_seconds=max(0.1, deadline - time.time()),
                        relations=rels,
                    )
                except (ConnectionError, OSError, PgError) as e:
                    # walsender died (failover, pg_terminate_backend
                    # = FATAL 57P01/57P02 ErrorResponse, network drop
                    # = socket error): drop the session AND any
                    # un-landed parse — the slot's confirmed_flush_lsn
                    # replays everything not yet send_status'd, so a
                    # fresh session resumes losslessly (at-least-once;
                    # the envelope identity dedupes the overlap
                    # downstream).  Genuine protocol errors re-raise.
                    if isinstance(e, PgError) and not (
                        e.sqlstate.startswith("57P")
                        or e.sqlstate.startswith("08")
                    ):
                        raise
                    self.close()
                    parsed = []
                    continue
                if not got:
                    break
                parsed.extend(got)
            if not parsed:
                return 0
            n = len(parsed)
            self._land(
                _envelope_df(self.spark, parsed, self.slot, 0), n
            )
            _rc, stream, _rels = self._repl
            stream.send_status(stream.wal_end)
            return n
        if self.publication is not None:
            df, max_lsn = pull_changes_pgoutput(
                self.spark,
                self.params,
                self.slot,
                self.publication,
                proto_version=self.proto_version,
                streaming=self.streaming,
            )
        else:
            df, max_lsn = pull_changes(
                self.spark, self.params, self.slot, self.key_cols
            )
        if max_lsn is None:
            return 0
        # the envelope builder stamps the driver-known row count; a
        # count() here would re-run the whole envelope pipeline
        n = getattr(df, "_pgshovel_nrows", None)
        if n is None:
            n = df.count()
        if n:
            self._land(df, n)
        advance(self.params, self.slot, max_lsn)
        return n

    def drain(self, max_pulls: int = 1000) -> int:
        """Pull until the slot is idle; returns total rows landed."""
        total = 0
        for _ in range(max_pulls):
            n = self.pull_once()
            if n == 0:
                return total
            total += n
        return total


def landing_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """Structured Streaming source over a LandingCapture directory —
    CHANGE_SCHEMA rows in landed order.  Each capture pull lands one
    DIRECTORY, and the file stream source does not recurse, so the
    path globs one level down.

    ``ignoreMissingFiles`` is ON because of the capture side's
    crash-replay contract (``LandingCapture._land``): a replay REPLACES
    an already-visible ``b_*`` directory with a superset batch, so a
    consumer that indexed the old part file but had not yet processed
    it would otherwise die with FileNotFoundException.  The replaced
    file's rows re-deliver under the new part name and the idempotent
    MERGE sinks absorb the overlap (the documented at-least-once
    contract into the landing)."""
    return (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("ignoreMissingFiles", "true")
        .parquet(os.path.join(landing_dir, "b_*"))
    )
