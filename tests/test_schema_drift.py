"""Schema-drift detection (sources/drift.py): unit diffs, and the
live-Derby end-to-end — ALTER TABLE between incremental pulls must
surface as drift rows and drive the configured policy (halt or
CAS-published widen), the executable form of the reference's
``upgrade_cluster`` explicit-migration lifecycle [recalled]."""

from __future__ import annotations

import pytest

from pgshovel_spark.sources.administration import (
    ConfigError,
    SetConfig,
    TableConfig,
    create_set,
    get_set,
)
from pgshovel_spark.sources.cdc import incremental_pulls, jdbc_snapshot_reader
from pgshovel_spark.sources.drift import (
    DriftChange,
    SchemaDriftError,
    SchemaDriftMonitor,
    detect_drift,
    drift_rows,
    observed_schema,
    pulls_with_drift_check,
)

# ------------------------------------------------------------- unit diffs


def test_detect_drift_added_dropped_type_changed():
    reg = {"id": "int", "v": "double", "gone": "string"}
    obs = {"ID": "int", "v": "string", "extra": "bigint"}
    got = detect_drift("t", reg, obs)
    assert got == [
        DriftChange("t", "added", "extra", None, "bigint"),
        DriftChange("t", "dropped", "gone", "string", None),
        DriftChange("t", "type_changed", "v", "double", "string"),
    ]


def test_detect_drift_clean_and_case_insensitive():
    assert detect_drift("t", {"A": "int"}, {"a": "int"}) == []


def test_drift_rows_dataframe(spark):
    df = drift_rows(
        spark, [DriftChange("t", "added", "c", None, "int")]
    )
    assert df.columns == ["table", "change_kind", "column", "before", "after"]
    assert df.count() == 1


# ----------------------------------------------------- policy state machine


def _mk_set(tmp_path, types):
    store = str(tmp_path / "admin")
    create_set(
        store,
        SetConfig(
            name="s1",
            tables={"t1": TableConfig("id", ["id"], column_types=types)},
        ),
    )
    return store


def test_monitor_bootstraps_registered_schema(spark, tmp_path):
    store = _mk_set(tmp_path, None)
    batch = spark.createDataFrame([(1, 2.0)], "id int, v double")
    mon = SchemaDriftMonitor(store, "s1")
    assert mon.check("t1", batch) == []
    cfg = get_set(store, "s1")
    assert cfg.version == 2  # bootstrap published under CAS
    assert cfg.tables["t1"].column_types == {"id": "int", "v": "double"}


def test_monitor_halt_policy_raises(spark, tmp_path):
    store = _mk_set(tmp_path, {"id": "int", "v": "double"})
    mon = SchemaDriftMonitor(store, "s1", policy="halt")
    drifted = spark.createDataFrame([(1, 2.0, "x")], "id int, v double, w string")
    with pytest.raises(SchemaDriftError) as ei:
        mon.check("t1", drifted)
    assert ei.value.changes == [DriftChange("t1", "added", "w", None, "string")]


def test_monitor_widen_publishes_new_version(spark, tmp_path):
    store = _mk_set(tmp_path, {"id": "int", "v": "double"})
    mon = SchemaDriftMonitor(store, "s1", policy="widen")
    drifted = spark.createDataFrame([(1, 2.0, "x")], "id int, v double, w string")
    changes = mon.check("t1", drifted)
    assert [c.change_kind for c in changes] == ["added"]
    cfg = get_set(store, "s1")
    assert cfg.version == 2
    assert cfg.tables["t1"].column_types == {
        "id": "int", "v": "double", "w": "string",
    }
    # second pull with the same (now registered) schema: clean
    assert mon.check("t1", drifted) == []


def test_monitor_widen_never_accepts_drops(spark, tmp_path):
    store = _mk_set(tmp_path, {"id": "int", "v": "double"})
    mon = SchemaDriftMonitor(store, "s1", policy="widen")
    narrowed = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(SchemaDriftError) as ei:
        mon.check("t1", narrowed)
    assert ei.value.changes == [DriftChange("t1", "dropped", "v", "double", None)]
    assert get_set(store, "s1").version == 1  # nothing published


def test_unknown_table_and_bad_policy(spark, tmp_path):
    store = _mk_set(tmp_path, None)
    with pytest.raises(ValueError):
        SchemaDriftMonitor(store, "s1", policy="yolo")
    mon = SchemaDriftMonitor(store, "s1")
    with pytest.raises(ConfigError):
        mon.check("nope", spark.range(1))


# ------------------------------------------------- live Derby end-to-end


def test_alter_table_between_pulls_live_derby(spark, tmp_path):
    """The full loop on a real database: pull 1 bootstraps the
    registered schema; ALTER TABLE ADD COLUMN upstream; pull 2 under
    ``widen`` emits the drift row AND CAS-publishes the widened config;
    a ``halt`` monitor on the same set refuses the same batch."""
    jvm = spark._jvm
    db = str(tmp_path / "driftdb")
    url = f"jdbc:derby:{db};create=true"
    con = jvm.java.sql.DriverManager.getConnection(url)
    st = con.createStatement()
    st.executeUpdate("CREATE TABLE items (id INT PRIMARY KEY, v DOUBLE)")
    for i in range(1, 4):
        st.executeUpdate(f"INSERT INTO items VALUES ({i}, {i * 1.5})")

    store = str(tmp_path / "admin")
    create_set(
        store,
        SetConfig(name="items_set", tables={"items": TableConfig("id", ["id"])}),
    )
    reader = jdbc_snapshot_reader(
        spark, url, "items", {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    )
    mon = SchemaDriftMonitor(store, "items_set", policy="widen")
    it = pulls_with_drift_check(
        incremental_pulls(reader, "ID"), mon, "items"
    )

    batch1, drift1 = next(it)
    assert batch1.count() == 3
    assert drift1 == []  # bootstrap pull: schema adopted, no drift
    reg = get_set(store, "items_set").tables["items"].column_types
    assert set(reg) == {"id", "v"}

    # upstream migration between pulls
    st.executeUpdate("ALTER TABLE items ADD COLUMN tag VARCHAR(10)")
    st.executeUpdate("INSERT INTO items VALUES (4, 6.0, 'new')")

    batch2, drift2 = next(it)
    assert [(c.change_kind, c.column) for c in drift2] == [("added", "tag")]
    assert batch2.count() == 1  # watermark pushdown still exact
    cfg = get_set(store, "items_set")
    assert cfg.tables["items"].column_types["tag"] == "string"
    assert cfg.version == 3  # v1 create, v2 bootstrap, v3 widen

    # a conservative consumer on the SAME set halts on the next delta
    st.executeUpdate("ALTER TABLE items ADD COLUMN extra INT")
    st.executeUpdate("INSERT INTO items VALUES (5, 7.5, 'x', 9)")
    halt_it = pulls_with_drift_check(
        incremental_pulls(reader, "ID"),
        SchemaDriftMonitor(store, "items_set", policy="halt"),
        "items",
    )
    with pytest.raises(SchemaDriftError) as ei:
        next(halt_it)
    assert [(c.change_kind, c.column) for c in ei.value.changes] == [
        ("added", "extra")
    ]
    st.close()
    con.close()
