"""Replication-set administration lifecycle tests (SURVEY.md §3.1 E1 analog)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest

from pgshovel_spark.sources.administration import (
    ConfigError,
    SetConfig,
    TableConfig,
    bump_epoch,
    create_set,
    get_set,
    update_set,
)


def _cfg(name="orders_set"):
    return SetConfig(
        name=name,
        tables={
            "orders": TableConfig(cursor_col="o_orderkey", key_cols=["o_orderkey"]),
            "events": TableConfig(
                cursor_col="ts", key_cols=["event_id"],
                columns=["event_id", "user_id", "ts"],
            ),
        },
    )


def test_create_get_roundtrip(tmp_path):
    d = str(tmp_path)
    created = create_set(d, _cfg())
    assert (created.version, created.epoch) == (1, 0)
    got = get_set(d, "orders_set")
    assert got == created


def test_create_refuses_overwrite(tmp_path):
    d = str(tmp_path)
    create_set(d, _cfg())
    with pytest.raises(ConfigError, match="already exists"):
        create_set(d, _cfg())


def test_update_bumps_version_and_cas(tmp_path):
    d = str(tmp_path)
    create_set(d, _cfg())
    cfg = _cfg()
    cfg.tables["orders"].key_cols = ["o_orderkey"]
    updated = update_set(d, cfg, expect_version=1)
    assert updated.version == 2
    with pytest.raises(ConfigError, match="version conflict"):
        update_set(d, _cfg(), expect_version=1)


def test_bump_epoch_fences(tmp_path):
    d = str(tmp_path)
    create_set(d, _cfg())
    fenced = bump_epoch(d, "orders_set")
    assert (fenced.epoch, fenced.version) == (1, 2)


@pytest.mark.parametrize(
    "breaker",
    [
        lambda c: setattr(c, "name", "bad name"),
        lambda c: c.tables.clear(),
        lambda c: setattr(c.tables["orders"], "cursor_col", "id; DROP"),
        lambda c: setattr(c.tables["orders"], "key_cols", []),
        lambda c: setattr(
            c.tables["events"], "columns", ["user_id", "ts"]  # key not captured
        ),
    ],
)
def test_validation_rejects_bad_configs(tmp_path, breaker):
    cfg = _cfg()
    breaker(cfg)
    with pytest.raises(ConfigError):
        create_set(str(tmp_path), cfg)
