"""Native Spark streaming source for live Postgres logical decoding —
``spark.readStream.format("pgshovel")`` via PySpark 4.1's public
Python DataSource API (``pyspark.sql.datasource``).

This replaces the parquet-landing indirection (sources/pglanding.py —
slot -> parquet files -> file stream) with a CHECKPOINT-NATIVE source:
Spark's own offset log is the only watermark.  The reader exposes the
replication slot through ``SimpleDataSourceStreamReader`` — the API
Spark provides precisely for driver-coordinated, inherently-serial
sources (a slot decodes WAL in commit order; ordering IS the
contract) — and the engine's two-phase peek/advance discipline maps
1:1 onto the API's replay contract:

- ``read(start)``     = non-destructive PEEK of the slot, filtered to
                        positions after ``start`` (at-least-once pull);
- ``commit(end)``     = ``pg_replication_slot_advance`` to the last
                        consumed COMMIT lsn — the slot watermark moves
                        only after Spark has durably committed the
                        batch, so a crash anywhere replays losslessly;
- ``readBetweenOffsets(start, end)``
                      = deterministic re-peek of an uncommitted range
                        after a query restart (the data is still in
                        the slot because commit() never ran for it).

Offsets are LSN-backed and JSON-serializable:

    ``{"lsn": <commit lsn as int>, "idx": <next change index within
       that commit>, "seq": <dense global change sequence>}``

POSITION DESIGN (the subtle part): logical decoding emits WHOLE
transactions in COMMIT order, so a change's own WAL record lsn is NOT
monotone across a stream — a transaction that started early and
committed late arrives with change lsns LOWER than everything already
delivered.  Offsets therefore key on the transaction's COMMIT-record
lsn (stamped on every change by both parsers as ``commit_lsn``) plus
the change's index within its transaction — the same (commit_lsn,
sequence) discipline production CDC connectors use.  A peeked batch
always contains whole transactions (parsers buffer until COMMIT), so
batch boundaries never split a transaction and ``commit(end)`` can
safely advance the slot to ``end.lsn``.

The ``seq`` component continues the envelope's dense per-publisher
sequence ACROSS batches and restarts (it rides in the checkpointed
offset), so downstream (epoch, seq)-ordered MERGE sinks need no
landing-side rebasing.

Scale posture: the slot pull is control-plane and serial BY PROTOCOL
(one walsender/slot decodes in commit order); sharding happens per
database with one slot+source each, and executor fan-out happens after
the source hands rows to Spark (the runner converts them to Arrow
batches).  Both in-core plugins are supported over the SQL transport
(``pg_logical_slot_peek[_binary]_changes``): ``pgoutput`` (the
production plugin, binary, publication-filtered, protocol v1/v2 with
streamed in-progress transactions) and ``test_decoding``.  The
walsender transport stays in sources/pglanding.py — its push stream
cannot re-read an arbitrary uncommitted range, which
``readBetweenOffsets`` requires.

Reference behavior (SURVEY.md §1.1/§2.A [recalled]): pgshovel's relay
tails a capture queue and republishes mutation batches with dense
sequence numbers; this source is that relay re-expressed as a Spark
streaming source with Spark's checkpoint as the delivery ledger.

Usage::

    from pgshovel_spark.sources.pgdatasource import register_pgshovel
    register_pgshovel(spark)
    df = (spark.readStream.format("pgshovel")
          .option("sockdir", params.sockdir)
          .option("slot", "my_slot")
          .option("publication", "my_pub")      # pgoutput (default)
          .load())                               # CHANGE_SCHEMA rows

NOTE: the DataSource class is pickled BY REFERENCE into Spark's
python runner process — ``pgshovel_spark`` must be importable there
(run from the repo root or export PYTHONPATH=/root/repo, the same
rule every mapInPandas stage already obeys).
"""

from __future__ import annotations

import json
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

__all__ = ["PgShovelDataSource", "register_pgshovel"]


def _opt(options, key: str, default=None):
    v = options.get(key)
    return default if v is None else v


class PgShovelSimpleStreamReader(SimpleDataSourceStreamReader):
    """Driver-side slot reader implementing the peek/advance contract.

    One fresh wire connection per pull (the simple-query protocol's
    slot functions) — no long-lived session to fail over; a dead
    server simply fails the trigger and the next one re-peeks from
    ``confirmed_flush_lsn``.
    """

    def __init__(self, options):
        from pgshovel_spark.sources.pgwire import PgParams

        sockdir = _opt(options, "sockdir")
        if not sockdir:
            raise ValueError("pgshovel source requires option 'sockdir'")
        self.params = PgParams(
            sockdir=sockdir,
            database=_opt(options, "database", "postgres"),
            user=_opt(options, "user", "postgres"),
            port=int(_opt(options, "port", "5432")),
        )
        self.slot = _opt(options, "slot")
        if not self.slot:
            raise ValueError("pgshovel source requires option 'slot'")
        self.plugin = _opt(options, "plugin", "pgoutput")
        if self.plugin not in ("pgoutput", "test_decoding"):
            raise ValueError(f"unknown plugin {self.plugin!r}")
        self.publication = _opt(options, "publication")
        if self.plugin == "pgoutput" and not self.publication:
            raise ValueError("plugin=pgoutput requires option 'publication'")
        self.proto_version = int(_opt(options, "proto_version", "1"))
        self.streaming = _opt(options, "streaming", "false").lower() == "true"
        self.publisher = _opt(options, "publisher", self.slot)
        self.epoch = int(_opt(options, "epoch", "0"))
        kc = _opt(options, "key_cols")
        self.key_cols = json.loads(kc) if kc else None
        mc = _opt(options, "max_changes")
        # upto_nchanges bounds RAW decoded rows per peek; Postgres
        # completes the in-flight transaction past the limit, so a
        # bounded peek still returns whole transactions.
        self.max_changes = int(mc) if mc else None

    # -- offset algebra ----------------------------------------------------

    def initialOffset(self) -> dict:
        # Position 0: everything decodable from the slot's
        # confirmed_flush_lsn onward is new.  seq starts dense at 0.
        return {"lsn": 0, "idx": 0, "seq": 0}

    def _peek_parse(self) -> list:
        from pgshovel_spark.sources.pglogical import (
            _check_slot,
            parse_test_decoding,
        )

        limit = "null" if self.max_changes is None else str(self.max_changes)
        with self.params.connect() as c:
            if self.plugin == "pgoutput":
                from pgshovel_spark.sources.pgoutput import (
                    _check_publication,
                    parse_pgoutput,
                )

                _check_publication(self.publication)
                opts = f"'proto_version', '{self.proto_version}'"
                if self.streaming:
                    opts += ", 'streaming', 'on'"
                res = c.query(
                    "select lsn::text, xid::text, data from"
                    " pg_logical_slot_peek_binary_changes"
                    f"('{_check_slot(self.slot)}', null, {limit}, {opts},"
                    f" 'publication_names', '{self.publication}')"
                )[0]
                raw = [(l, int(x), d) for l, x, d in res.rows]
                return parse_pgoutput(raw)
            res = c.query(
                "select lsn::text, xid::text, data from"
                " pg_logical_slot_peek_changes"
                f"('{_check_slot(self.slot)}', null, {limit},"
                " 'include-timestamp', 'on')"
            )[0]
            raw = [(l, int(x), d) for l, x, d in res.rows]
            return parse_test_decoding(raw, self.key_cols)

    def _row(self, ch: dict, seq: int) -> tuple:
        from pgshovel_spark.sources.pgwire import _dec_tstz

        ts = ch.get("ts")
        if isinstance(ts, str):
            ts = _dec_tstz(ts)
        txid = ch.get("txid")
        return (
            ch["op"],
            ch["table"],
            ch["key"],
            ch["before"],
            ch["after"],
            int(txid) if txid is not None else None,
            ts,
            self.publisher,
            self.epoch,
            seq,
        )

    def _slice(
        self, changes: list, start: dict, upto: dict | None
    ) -> tuple[list, dict]:
        """Rows strictly inside (start, upto] by (commit_lsn, idx)
        position, with dense seq continuation; returns (rows, end)."""
        from pgshovel_spark.sources.pgoutput import lsn_to_int

        rows: list[tuple] = []
        lsn, idx, seq = start["lsn"], start["idx"], start["seq"]
        prev_c, j = None, 0
        for ch in changes:
            c_lsn = lsn_to_int(ch["commit_lsn"])
            j = j + 1 if c_lsn == prev_c else 0
            prev_c = c_lsn
            if (c_lsn, j) < (start["lsn"], start["idx"]):
                continue  # already delivered in an earlier batch
            if upto is not None and (c_lsn, j) >= (upto["lsn"], upto["idx"]):
                break
            rows.append(self._row(ch, seq))
            seq += 1
            lsn, idx = c_lsn, j + 1
        return rows, {"lsn": lsn, "idx": idx, "seq": seq}

    # -- SimpleDataSourceStreamReader contract ------------------------------

    #: rows per emitted Arrow RecordBatch (bounds IPC message size on
    #: an unbounded first read over a large backlog)
    _ARROW_CHUNK = 65536

    def _to_batches(self, rows: list) -> list:
        """Column-build Arrow RecordBatches from row tuples.  read()
        may return ``Iterator[pa.RecordBatch]`` instead of tuples
        (public DataSource contract); the runner then ships the
        batches verbatim instead of re-converting row-at-a-time in
        ``records_to_arrow_batches`` — measured 4x cheaper on the
        40k-row capture cycles this source runs (EXPERIMENTS.md r11).
        """
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        from pgshovel_spark.streaming.change_stream import CHANGE_SCHEMA

        sch = to_arrow_schema(CHANGE_SCHEMA)
        out = []
        for lo in range(0, len(rows), self._ARROW_CHUNK):
            chunk = rows[lo : lo + self._ARROW_CHUNK]
            cols = list(zip(*chunk))
            arrays = [
                pa.array(list(cols[i]), type=sch.field(i).type)
                for i in range(len(sch))
            ]
            out.append(pa.RecordBatch.from_arrays(arrays, schema=sch))
        return out

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        rows, end = self._slice(self._peek_parse(), start, None)
        # list iterator: the prefetch wrapper copy.copy()s it for the
        # cache, which a generator would not survive
        return iter(self._to_batches(rows)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        rows, got = self._slice(self._peek_parse(), start, end)
        if got["seq"] != end["seq"]:
            # The slot can no longer reproduce the planned range —
            # only possible if something advanced it past data Spark
            # never committed (operator error / external consumer).
            # Surfacing loudly beats silently shipping a short batch.
            raise RuntimeError(
                f"slot {self.slot!r} cannot replay offsets "
                f"{start} .. {end}: got seq {got['seq']}, "
                f"expected {end['seq']} (slot advanced externally?)"
            )
        return iter(self._to_batches(rows))

    def commit(self, end: dict) -> None:
        # Move the slot watermark to the last consumed commit record.
        # Batches hold whole transactions, so end.lsn is always a
        # commit boundary; advance is monotone server-side (never
        # moves backwards), so replayed commits after a restart are
        # no-ops.
        if end.get("lsn"):
            from pgshovel_spark.sources.pglogical import advance
            from pgshovel_spark.sources.pgoutput import lsn_to_str

            advance(self.params, self.slot, lsn_to_str(end["lsn"]))


class PgShovelDataSource(DataSource):
    """``format("pgshovel")`` — live Postgres logical-decoding CDC as
    a first-class Spark streaming source emitting CHANGE_SCHEMA rows.

    Options: sockdir (required), slot (required), database, user,
    port, plugin (pgoutput | test_decoding), publication (required
    for pgoutput), proto_version, streaming ('true' enables protocol
    v2 in-progress transaction streaming), publisher, epoch,
    key_cols (JSON table->pk-list map, test_decoding only),
    max_changes (bound raw rows per peek).
    """

    @classmethod
    def name(cls) -> str:
        return "pgshovel"

    def schema(self) -> StructType:
        from pgshovel_spark.streaming.change_stream import CHANGE_SCHEMA

        return CHANGE_SCHEMA

    def simpleStreamReader(self, schema: StructType):
        return PgShovelSimpleStreamReader(self.options)


def register_pgshovel(spark) -> None:
    """Register the source on a session: idempotent, no jars."""
    spark.dataSource.register(PgShovelDataSource)
