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
epochs).  Storage is a plain JSON file per set under the admin
directory — the coordination-free stand-in for the ZooKeeper node; on
a real deployment point it at shared storage.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from dataclasses import dataclass, field

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*\Z")


class ConfigError(ValueError):
    """Invalid replication-set configuration."""


@dataclass
class TableConfig:
    cursor_col: str
    key_cols: list[str]
    columns: list[str] | None = None  # None = all columns


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
        for c in tc.key_cols + (tc.columns or []):
            if not _IDENT.fullmatch(c):
                raise ConfigError(f"{tbl}: bad column name {c!r}")
        if tc.columns is not None:
            missing = set(tc.key_cols) - set(tc.columns)
            if missing:
                raise ConfigError(
                    f"{tbl}: key_cols {sorted(missing)} not in captured columns"
                )


def _path(admin_dir: str, name: str) -> str:
    return os.path.join(admin_dir, f"{name}.set.json")


def _write_atomic(path: str, payload: dict) -> None:
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
        os.replace(tmp, path)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _to_payload(cfg: SetConfig) -> dict:
    return {
        "name": cfg.name,
        "version": cfg.version,
        "epoch": cfg.epoch,
        "tables": {
            t: {"cursor_col": tc.cursor_col, "key_cols": tc.key_cols,
                "columns": tc.columns}
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
            )
            for t, tc in d["tables"].items()
        },
    )


def create_set(admin_dir: str, cfg: SetConfig) -> SetConfig:
    """Validate and persist a NEW replication set at version 1, epoch 0.
    Refuses to overwrite an existing set (use update_set)."""
    _validate(cfg)
    path = _path(admin_dir, cfg.name)
    if os.path.exists(path):
        raise ConfigError(f"set {cfg.name!r} already exists; use update_set")
    cfg.version, cfg.epoch = 1, 0
    _write_atomic(path, _to_payload(cfg))
    return cfg


def get_set(admin_dir: str, name: str) -> SetConfig:
    with open(_path(admin_dir, name)) as f:
        return _from_payload(json.load(f))


def update_set(
    admin_dir: str, cfg: SetConfig, expect_version: int | None = None
) -> SetConfig:
    """Validate and persist a config change, bumping the version.
    ``expect_version`` gives compare-and-set semantics (the ZooKeeper
    versioned-write analog): a concurrent admin's update is detected
    instead of silently overwritten."""
    _validate(cfg)
    current = get_set(admin_dir, cfg.name)
    if expect_version is not None and current.version != expect_version:
        raise ConfigError(
            f"version conflict: expected {expect_version}, found {current.version}"
        )
    cfg.version = current.version + 1
    cfg.epoch = current.epoch
    _write_atomic(_path(admin_dir, cfg.name), _to_payload(cfg))
    return cfg


def bump_epoch(admin_dir: str, name: str) -> SetConfig:
    """Fence the previous publisher generation: bump the epoch (and
    version).  Consumers using validate_sequences keep only rows from
    each publisher's max epoch, so messages from a stale relay that
    resumes after a failover are dropped."""
    cfg = get_set(admin_dir, name)
    cfg.epoch += 1
    cfg.version += 1
    _write_atomic(_path(admin_dir, name), _to_payload(cfg))
    return cfg
