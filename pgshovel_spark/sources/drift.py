"""Schema-drift detection for the CDC loop — the missing half of the
versioned-configuration lifecycle (SURVEY.md §1.2: the reference treats
schema change as "explicit migration" of a versioned config; pgshovel's
``upgrade_cluster`` re-publishes configurations when the capture
surface changes [recalled]).

A high-watermark pull observes the source table's CURRENT schema on
every batch.  When the upstream DBA runs ``ALTER TABLE`` between
pulls, the observed schema diverges from the registered
``TableConfig`` — the first operational surprise a real CDC user
hits, and silent breakage if undetected (a new column is silently
dropped; a removed column kills the downstream merge).

``SchemaDriftMonitor`` diffs observed vs registered per pull and
emits one ``DriftChange`` row per (table, change_kind, column).  The
response is a configured POLICY:

* ``halt`` (default): raise ``SchemaDriftError`` — the conservative
  production posture; a human re-publishes the config (the
  reference's explicit-migration stance).
* ``widen``: ADDED columns are auto-accepted by publishing a new
  config version through the administration layer's compare-and-set
  (``update_set`` — the claim of version N+1 is atomic, so two racing
  monitors cannot both widen; the loser re-reads and finds the column
  already registered).  DROPPED or TYPE-CHANGED columns still halt:
  widening is monotone, never destructive.

Scale notes: the diff runs on DRIVER-side metadata (two small dicts —
the DataFrame schema Spark already fetched from JDBC metadata, and
the registered config), never on data; a fleet of pull loops adds
zero executor work.  Identifier comparison is case-folded because SQL
engines case-fold unquoted identifiers (Derby/Postgres report
metadata in their preferred case while configs are written in
lowercase).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from pgshovel_spark.sources.administration import (
    ConfigError,
    CoordinatorBackend,
    SetConfig,
    get_set,
    update_set,
)


class SchemaDriftError(RuntimeError):
    """Observed source schema diverged from the registered config
    under the ``halt`` policy (or non-widenable drift under ``widen``)."""

    def __init__(self, changes: list["DriftChange"]):
        self.changes = changes
        super().__init__(
            "schema drift: "
            + ", ".join(f"{c.change_kind} {c.table}.{c.column}" for c in changes)
        )


@dataclass(frozen=True)
class DriftChange:
    table: str
    change_kind: str  # 'added' | 'dropped' | 'type_changed'
    column: str
    before: str | None  # registered type (None for 'added')
    after: str | None  # observed type (None for 'dropped')


def observed_schema(df: DataFrame) -> dict[str, str]:
    """Lower-cased {column: spark simpleString type} of a batch —
    driver-side metadata only, no action."""
    return {f.name.lower(): f.dataType.simpleString() for f in df.schema.fields}


def detect_drift(
    table: str,
    registered: dict[str, str],
    observed: dict[str, str],
) -> list[DriftChange]:
    """Diff two lower-cased {column: type} maps into DriftChange rows,
    deterministically ordered (kind, column)."""
    reg = {k.lower(): v for k, v in registered.items()}
    obs = {k.lower(): v for k, v in observed.items()}
    changes: list[DriftChange] = []
    for col in sorted(obs.keys() - reg.keys()):
        changes.append(DriftChange(table, "added", col, None, obs[col]))
    for col in sorted(reg.keys() - obs.keys()):
        changes.append(DriftChange(table, "dropped", col, reg[col], None))
    for col in sorted(reg.keys() & obs.keys()):
        if reg[col] is not None and reg[col] != obs[col]:
            changes.append(DriftChange(table, "type_changed", col, reg[col], obs[col]))
    return changes


def drift_rows(spark: SparkSession, changes: list[DriftChange]) -> DataFrame:
    """The change list as a DataFrame — the audit row a pipeline sinks
    next to its ingest metrics."""
    return spark.createDataFrame(
        [(c.table, c.change_kind, c.column, c.before, c.after) for c in changes],
        "table string, change_kind string, column string,"
        " before string, after string",
    )


class SchemaDriftMonitor:
    """Per-pull schema gate over one replication set.

    The registered per-table schema lives in the set config's
    ``TableConfig.column_types`` ({column: spark type}); when absent
    (legacy configs), the FIRST observed schema is adopted and
    published via CAS, so monitoring self-bootstraps.
    """

    def __init__(
        self,
        store: CoordinatorBackend | str,
        set_name: str,
        policy: str = "halt",
    ) -> None:
        if policy not in ("halt", "widen"):
            raise ValueError(f"unknown drift policy: {policy!r}")
        self.store = store
        self.set_name = set_name
        self.policy = policy

    def check(self, table: str, batch: DataFrame) -> list[DriftChange]:
        """Gate one pull's batch: returns the (possibly empty) drift
        row list on success; raises SchemaDriftError per policy.

        Re-reads the latest config each pull so a concurrent widen by
        another monitor (or an admin's migration) is honored without a
        restart — the same freshness rule the reference's consumers
        get from watching the config ZNode [recalled].
        """
        return self.check_schema(table, observed_schema(batch))

    def check_schema(
        self, table: str, obs: dict[str, str]
    ) -> list[DriftChange]:
        """Same gate over an already-observed {column: type} map — the
        entry point for sources that probe schema without a Spark
        read (the live-Postgres wire probe,
        pglogical.pg_observed_schema)."""
        obs = {k.lower(): v for k, v in obs.items()}
        cfg = get_set(self.store, self.set_name)
        tc = cfg.tables.get(table)
        if tc is None:
            raise ConfigError(f"table {table!r} not in set {self.set_name!r}")
        if tc.column_types is None:
            # bootstrap: adopt the first observed schema under CAS
            self._publish(cfg, table, obs)
            return []
        changes = detect_drift(table, tc.column_types, obs)
        if not changes:
            return changes
        if self.policy == "halt":
            raise SchemaDriftError(changes)
        non_widenable = [c for c in changes if c.change_kind != "added"]
        if non_widenable:
            raise SchemaDriftError(non_widenable)
        widened = dict({k.lower(): v for k, v in tc.column_types.items()})
        for c in changes:
            widened[c.column] = c.after
        self._publish(cfg, table, widened)
        return changes

    def _publish(self, cfg: SetConfig, table: str, types: dict[str, str]) -> None:
        """CAS-publish the new per-table schema as config version N+1.
        A losing racer gets ConfigError from the atomic claim; the
        winner's schema is re-read on the next pull, so losing is
        benign — re-check against the fresh config."""
        cfg.tables[table].column_types = dict(sorted(types.items()))
        try:
            update_set(self.store, cfg, expect_version=cfg.version)
        except ConfigError:
            latest = get_set(self.store, self.set_name)
            if latest.tables[table].column_types != cfg.tables[table].column_types:
                raise


def pulls_with_drift_check(
    pulls,
    monitor: SchemaDriftMonitor,
    table: str,
):
    """Wrap an ``incremental_pulls`` iterator with the per-pull schema
    gate: yields (batch, drift_changes) pairs; raises per policy.  The
    gate runs BEFORE the batch is yielded, so a halted pull never
    reaches the downstream merge half-processed."""
    for batch in pulls:
        changes = monitor.check(table, batch)
        yield batch, changes
