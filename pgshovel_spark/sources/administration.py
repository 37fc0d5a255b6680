"""Replication-set administration — the engine's analog of pgshovel's
``administration.py`` lifecycle (create_set / update_set /
upgrade_cluster; reconstructed from public knowledge, SURVEY.md §3.1 E1).

The reference validates a protobuf ReplicationSetConfiguration, writes
a VERSIONED node to ZooKeeper, and installs capture triggers.  The
Spark-native equivalent has no in-database footprint (capture is
pull-based, sources/cdc.py), so administration reduces to: validate
the config, persist it with a monotonically increasing version, and
bump the publisher EPOCH on ownership changes so stale writers are
fenced (streaming/ops.py validate_sequences drops rows from older
epochs).

Storage is one immutable JSON file PER VERSION (``<set>.v<N>.json``),
each claimed with ``O_CREAT|O_EXCL`` — version N can be created by
exactly one writer, which makes update_set's compare-and-set genuinely
atomic on a local/NFS-with-O_EXCL filesystem (the ZooKeeper
versioned-write analog), not a read-then-write race.  The version
history doubles as the audit trail.  On a real deployment point the
directory at shared storage.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
from dataclasses import dataclass, field

#: dot-free on purpose — matches cdc.cursor_subquery's identifier rule,
#: so a config that validates here cannot fail later at pull time.
_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


class ConfigError(ValueError):
    """Invalid replication-set configuration."""


@dataclass
class TableConfig:
    cursor_col: str
    key_cols: list[str]
    columns: list[str] | None = None  # None = all columns
    #: registered source schema {column: spark type simpleString} —
    #: the reference surface sources/drift.py diffs each pull's
    #: observed schema against; None = not yet schema-monitored
    #: (drift monitoring bootstraps it from the first pull).
    column_types: dict[str, str] | None = None


@dataclass
class SetConfig:
    name: str
    tables: dict[str, TableConfig] = field(default_factory=dict)
    version: int = 0
    epoch: int = 0


def _validate(cfg: SetConfig) -> None:
    if not _IDENT.fullmatch(cfg.name or ""):
        raise ConfigError(f"set name is not a plain identifier: {cfg.name!r}")
    if not cfg.tables:
        raise ConfigError("a replication set needs at least one table")
    for tbl, tc in cfg.tables.items():
        if not _IDENT.fullmatch(tbl):
            raise ConfigError(f"table name is not a plain identifier: {tbl!r}")
        if not _IDENT.fullmatch(tc.cursor_col):
            raise ConfigError(f"{tbl}: bad cursor_col {tc.cursor_col!r}")
        if not tc.key_cols:
            raise ConfigError(f"{tbl}: key_cols must be non-empty")
        for c in tc.key_cols + (tc.columns or []) + list(tc.column_types or {}):
            if not _IDENT.fullmatch(c):
                raise ConfigError(f"{tbl}: bad column name {c!r}")
        if tc.columns is not None:
            missing = set(tc.key_cols) - set(tc.columns)
            if missing:
                raise ConfigError(
                    f"{tbl}: key_cols {sorted(missing)} not in captured columns"
                )


def _vpath(admin_dir: str, name: str, version: int) -> str:
    return os.path.join(admin_dir, f"{name}.v{version}.json")


#: payload column width for the SQL backends — sized for realistic
#: SetConfigs (dozens of tables with drift-populated column_types);
#: Derby VARCHAR caps at 32672, PostgreSQL is unconstrained.  claim()
#: pre-checks the encoded length so an oversized config fails with a
#: CLEAR error instead of a driver-specific truncation exception.
_PAYLOAD_MAX = 32000


def _check_payload_len(name: str, version: int, body: str) -> str:
    if len(body) > _PAYLOAD_MAX:
        raise ConfigError(
            f"config {name} v{version} payload is {len(body)} chars —"
            f" exceeds the SQL backends' {_PAYLOAD_MAX}-char column;"
            " split the set or use the file/ZooKeeper backend"
        )
    return body


class CoordinatorBackend:
    """Versioned-config store contract — the coordination seam.

    ``claim(name, version, payload)`` must be an ATOMIC exactly-one-
    winner operation: of any number of concurrent claimants for the
    same (name, version), exactly one succeeds and the rest raise
    ConfigError.  Everything above this seam (create/update/epoch
    fencing) is backend-agnostic, so moving a deployment from the
    file backend to ZooKeeper/etcd is configuration, not code — the
    reference's versioned-ZNode writes map onto the same three calls.
    """

    def latest_version(self, name: str) -> int:
        raise NotImplementedError

    def claim(self, name: str, version: int, payload: dict) -> None:
        raise NotImplementedError

    def read(self, name: str, version: int) -> dict:
        raise NotImplementedError


class FileBackend(CoordinatorBackend):
    """One immutable JSON file per version, claimed with
    ``O_CREAT|O_EXCL`` — atomic on a local or NFS-with-O_EXCL
    filesystem.  Right for single-admin-host deployments and tests;
    NOT multi-driver-safe on object stores (no exclusive create) —
    use the ZooKeeper backend there."""

    def __init__(self, admin_dir: str):
        self.admin_dir = admin_dir

    def latest_version(self, name: str) -> int:
        pat = re.compile(re.escape(name) + r"\.v(\d+)\.json\Z")
        best = 0
        if os.path.isdir(self.admin_dir):
            for f in os.listdir(self.admin_dir):
                m = pat.fullmatch(f)
                if m:
                    best = max(best, int(m.group(1)))
        return best

    def claim(self, name: str, version: int, payload: dict) -> None:
        os.makedirs(self.admin_dir, exist_ok=True)
        path = _vpath(self.admin_dir, name, version)
        # Write the payload to a temp file FIRST, then link it into
        # place: os.link is the atomic exclusive-create (EEXIST on a
        # lost race, like O_EXCL) AND it lands the complete payload in
        # one step.  The previous O_EXCL-create-then-dump left a
        # claimed-but-empty version file if the writer died mid-dump —
        # unrepairable, because the claim itself forbids rewriting.
        tmp = f"{path}.tmp.{os.getpid()}.{id(payload):x}"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise ConfigError(
                f"version conflict: {name} v{version} was created concurrently"
            ) from None
        finally:
            os.unlink(tmp)

    def read(self, name: str, version: int) -> dict:
        with open(_vpath(self.admin_dir, name, version)) as f:
            return json.load(f)


class SqliteBackend(CoordinatorBackend):
    """Second fully-executable backend (beyond FileBackend), proving
    the seam is genuinely backend-agnostic: versioned configs live in
    one sqlite database, and the atomic exactly-one-winner claim is a
    plain ``INSERT`` against the ``(name, version)`` PRIMARY KEY —
    sqlite serializes writers with a database lock, so of any number
    of concurrent claimants (threads OR processes sharing the file)
    exactly one insert commits and the rest hit the unique constraint.
    Right for a small multi-process admin host; the ZooKeeper backend
    remains the multi-HOST production path."""

    def __init__(self, db_path: str):
        self.db_path = db_path
        os.makedirs(os.path.dirname(db_path) or ".", exist_ok=True)
        with self._conn() as con:
            con.execute(
                "CREATE TABLE IF NOT EXISTS set_config ("
                " name TEXT NOT NULL, version INTEGER NOT NULL,"
                " payload TEXT NOT NULL, PRIMARY KEY (name, version))"
            )

    @contextlib.contextmanager
    def _conn(self):
        """Per-operation connection that is COMMITTED (or rolled back)
        AND CLOSED on exit — sqlite3's own context manager only
        commits/rolls back, leaving the handle to refcount reclamation
        and the database lock exposed to GC timing."""
        import sqlite3

        # generous busy timeout: concurrent claimants queue on the
        # database write lock instead of erroring spuriously
        con = sqlite3.connect(self.db_path, timeout=30.0)
        try:
            with con:  # transaction scope: commit / rollback
                yield con
        finally:
            con.close()

    def latest_version(self, name: str) -> int:
        with self._conn() as con:
            row = con.execute(
                "SELECT COALESCE(MAX(version), 0) FROM set_config WHERE name = ?",
                (name,),
            ).fetchone()
        return int(row[0])

    def claim(self, name: str, version: int, payload: dict) -> None:
        import sqlite3

        try:
            with self._conn() as con:
                con.execute(
                    "INSERT INTO set_config (name, version, payload)"
                    " VALUES (?, ?, ?)",
                    (name, version, json.dumps(payload, sort_keys=True)),
                )
        except sqlite3.IntegrityError:
            raise ConfigError(
                f"version conflict: {name} v{version} was created concurrently"
            ) from None

    def read(self, name: str, version: int) -> dict:
        with self._conn() as con:
            row = con.execute(
                "SELECT payload FROM set_config WHERE name = ? AND version = ?",
                (name, version),
            ).fetchone()
        if row is None:
            raise FileNotFoundError(f"{name} v{version} not found")
        return json.loads(row[0])


class JdbcBackend(CoordinatorBackend):
    """Third executable backend: versioned configs in any JDBC
    database, the exactly-one-winner claim again a plain INSERT
    against the (name, version) PRIMARY KEY — the database's own
    constraint enforcement is the coordinator, so ANY number of
    concurrent claimants across hosts resolve to one winner.

    Takes a ``java.sql.Connection`` (duck-typed; tests pass one from
    Spark's own JVM via py4j, pointed at embedded Derby — a REAL
    multi-user SQL engine executing real PreparedStatements).  A
    production deployment hands it a pooled connection to the admin
    Postgres; the SQL below is deliberately dialect-free."""

    def __init__(self, conn):
        self._con = conn
        st = conn.createStatement()
        try:
            st.executeUpdate(
                "CREATE TABLE set_config ("
                " name VARCHAR(128) NOT NULL, version INT NOT NULL,"
                f" payload VARCHAR({_PAYLOAD_MAX}) NOT NULL,"
                " PRIMARY KEY (name, version))"
            )
        except Exception as e:
            # tolerate ONLY the already-exists race (CREATE IF NOT
            # EXISTS isn't portable); a dead connection or missing
            # privilege must surface HERE, not as a confusing
            # 'table does not exist' on the first claim
            msg = str(e).lower()
            if "exist" not in msg and "x0y32" not in msg and "42p07" not in msg:
                raise
        finally:
            st.close()

    def latest_version(self, name: str) -> int:
        ps = self._con.prepareStatement(
            "SELECT COALESCE(MAX(version), 0) FROM set_config WHERE name = ?"
        )
        try:
            ps.setString(1, name)
            rs = ps.executeQuery()
            rs.next()
            return int(rs.getInt(1))
        finally:
            ps.close()

    def claim(self, name: str, version: int, payload: dict) -> None:
        ps = self._con.prepareStatement(
            "INSERT INTO set_config (name, version, payload) VALUES (?, ?, ?)"
        )
        try:
            ps.setString(1, name)
            ps.setInt(2, version)
            ps.setString(
                3,
                _check_payload_len(
                    name, version, json.dumps(payload, sort_keys=True)
                ),
            )
            ps.executeUpdate()
        except Exception as e:  # duplicate-key from the remote engine
            if "23505" in str(e) or "duplicate" in str(e).lower():
                raise ConfigError(
                    f"version conflict: {name} v{version} was created concurrently"
                ) from None
            raise
        finally:
            ps.close()

    def read(self, name: str, version: int) -> dict:
        ps = self._con.prepareStatement(
            "SELECT payload FROM set_config WHERE name = ? AND version = ?"
        )
        try:
            ps.setString(1, name)
            ps.setInt(2, version)
            rs = ps.executeQuery()
            if not rs.next():
                raise FileNotFoundError(f"{name} v{version} not found")
            return json.loads(rs.getString(1))
        finally:
            ps.close()


class PgWireBackend(CoordinatorBackend):
    """Fourth executable backend, on the reference's ACTUAL database:
    versioned configs in live PostgreSQL through the engine's own
    wire-protocol client (sources/pgwire.py — no psycopg2/JDBC jar).
    The exactly-one-winner claim is the same dialect-free INSERT
    against the (name, version) PRIMARY KEY; the server's constraint
    enforcement coordinates ANY number of claimant processes.

    One instance holds ONE wire session (single-threaded by design,
    like a raw libpq conn) — concurrent claimants each construct
    their own backend over the shared picklable ``PgParams``, which is
    exactly how multiple pgshovel drivers share an admin database.
    """

    def __init__(self, params):
        from pgshovel_spark.sources.pgwire import PgError

        self._PgError = PgError
        self._con = params.connect()
        try:
            self._con.query(
                "CREATE TABLE IF NOT EXISTS set_config ("
                " name VARCHAR(128) NOT NULL, version INT NOT NULL,"
                f" payload VARCHAR({_PAYLOAD_MAX}) NOT NULL,"
                " PRIMARY KEY (name, version))"
            )
        except PgError as e:
            # IF NOT EXISTS still races on the catalog's unique index:
            # two claimants creating the very first table can surface
            # 42P07 (duplicate_table) OR 23505 (duplicate key on
            # pg_class/pg_type) — either means the other driver won.
            if e.sqlstate not in ("42P07", "23505"):
                raise

    @staticmethod
    def _s(v: str) -> str:
        return "'" + v.replace("'", "''") + "'"

    def latest_version(self, name: str) -> int:
        return int(
            self._con.one(
                "SELECT COALESCE(MAX(version), 0) FROM set_config"
                f" WHERE name = {self._s(name)}"
            )
        )

    def claim(self, name: str, version: int, payload: dict) -> None:
        body = _check_payload_len(name, version, json.dumps(payload, sort_keys=True))
        try:
            self._con.query(
                "INSERT INTO set_config (name, version, payload) VALUES "
                f"({self._s(name)}, {int(version)}, {self._s(body)})"
            )
        except self._PgError as e:
            if e.sqlstate == "23505":  # unique_violation
                raise ConfigError(
                    f"version conflict: {name} v{version} was created concurrently"
                ) from None
            raise

    def read(self, name: str, version: int) -> dict:
        res = self._con.query(
            "SELECT payload FROM set_config WHERE name = "
            f"{self._s(name)} AND version = {int(version)}"
        )[0]
        if not res.rows:
            raise FileNotFoundError(f"{name} v{version} not found")
        return json.loads(res.rows[0][0])

    def close(self) -> None:
        self._con.close()


class ZooKeeperBackend(CoordinatorBackend):
    """Multi-driver-safe production backend: a ZNode ``create()`` is
    totally ordered by the ZooKeeper ensemble, so it IS the atomic
    claim — the same primitive the reference's administration used.
    Config-complete here; needs the ``kazoo`` client on the driver
    (absent in this sandbox, hence the import gate)."""

    def __init__(self, hosts: str, root: str = "/pgshovel/sets"):
        try:
            from kazoo.client import KazooClient
        except ImportError as e:  # pragma: no cover - kazoo not bundled
            raise ImportError(
                "ZooKeeperBackend needs the 'kazoo' package on the driver; "
                "pass a FileBackend admin_dir for single-host deployments"
            ) from e
        self.root = root.rstrip("/")
        self._zk = KazooClient(hosts=hosts)  # pragma: no cover
        self._zk.start()  # pragma: no cover

    def _path(self, name: str, version: int) -> str:  # pragma: no cover
        return f"{self.root}/{name}/v{version}"

    def latest_version(self, name: str) -> int:  # pragma: no cover
        base = f"{self.root}/{name}"
        if not self._zk.exists(base):
            return 0
        versions = [
            int(c[1:])
            for c in self._zk.get_children(base)
            if re.fullmatch(r"v\d+", c)
        ]
        return max(versions, default=0)

    def claim(self, name, version, payload) -> None:  # pragma: no cover
        from kazoo.exceptions import NodeExistsError

        try:
            self._zk.create(
                self._path(name, version),
                json.dumps(payload, sort_keys=True).encode(),
                makepath=True,
            )
        except NodeExistsError:
            raise ConfigError(
                f"version conflict: {name} v{version} was created concurrently"
            ) from None

    def read(self, name, version) -> dict:  # pragma: no cover
        data, _stat = self._zk.get(self._path(name, version))
        return json.loads(data)


def _backend(store: CoordinatorBackend | str) -> CoordinatorBackend:
    """Accept an admin_dir path (file backend, the historical API) or
    any CoordinatorBackend."""
    return store if isinstance(store, CoordinatorBackend) else FileBackend(store)


def _to_payload(cfg: SetConfig) -> dict:
    return {
        "name": cfg.name,
        "version": cfg.version,
        "epoch": cfg.epoch,
        "tables": {
            t: {"cursor_col": tc.cursor_col, "key_cols": tc.key_cols,
                "columns": tc.columns, "column_types": tc.column_types}
            for t, tc in cfg.tables.items()
        },
    }


def _from_payload(d: dict) -> SetConfig:
    return SetConfig(
        name=d["name"],
        version=d["version"],
        epoch=d["epoch"],
        tables={
            t: TableConfig(
                cursor_col=tc["cursor_col"],
                key_cols=list(tc["key_cols"]),
                columns=list(tc["columns"]) if tc["columns"] is not None else None,
                # absent in pre-drift payloads -> None (not yet monitored)
                column_types=(
                    dict(tc["column_types"])
                    if tc.get("column_types") is not None
                    else None
                ),
            )
            for t, tc in d["tables"].items()
        },
    )


def create_set(store: CoordinatorBackend | str, cfg: SetConfig) -> SetConfig:
    """Validate and persist a NEW replication set at version 1, epoch 0.
    Refuses to overwrite an existing set (use update_set); the v1 claim
    is atomic, so two concurrent create_set calls cannot both win."""
    be = _backend(store)
    _validate(cfg)
    if be.latest_version(cfg.name) > 0:
        raise ConfigError(f"set {cfg.name!r} already exists; use update_set")
    cfg.version, cfg.epoch = 1, 0
    be.claim(cfg.name, 1, _to_payload(cfg))
    return cfg


def get_set(store: CoordinatorBackend | str, name: str) -> SetConfig:
    be = _backend(store)
    v = be.latest_version(name)
    if v == 0:
        raise FileNotFoundError(f"no such replication set: {name!r}")
    return _from_payload(be.read(name, v))


def update_set(
    store: CoordinatorBackend | str, cfg: SetConfig, expect_version: int | None = None
) -> SetConfig:
    """Validate and persist a config change as version current+1.
    Compare-and-set is enforced by the backend's atomic claim of the
    new version: if another admin claimed it first, this call raises
    instead of silently overwriting.  ``expect_version`` additionally
    pins the base version the caller read."""
    be = _backend(store)
    _validate(cfg)
    current = get_set(be, cfg.name)
    if expect_version is not None and current.version != expect_version:
        raise ConfigError(
            f"version conflict: expected {expect_version}, found {current.version}"
        )
    cfg.version = current.version + 1
    cfg.epoch = current.epoch
    be.claim(cfg.name, cfg.version, _to_payload(cfg))
    return cfg


def bump_epoch(store: CoordinatorBackend | str, name: str) -> SetConfig:
    """Fence the previous publisher generation: bump the epoch (and
    version, atomically claimed).  Consumers using validate_sequences
    keep only rows from each publisher's max epoch, so messages from a
    stale relay that resumes after a failover are dropped."""
    be = _backend(store)
    cfg = get_set(be, name)
    cfg.epoch += 1
    cfg.version += 1
    be.claim(name, cfg.version, _to_payload(cfg))
    return cfg
