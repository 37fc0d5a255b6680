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


def test_drift_widen_flows_into_jdbc_merge_e2e(spark, tmp_path):
    """The COMPOSED pipeline across a mid-stream migration: JDBC
    incremental capture -> per-pull drift gate (widen policy) ->
    executed ANSI MERGE on a live Derby target, continuously.

    Pull 1 bootstraps and merges; ALTER TABLE ADD COLUMN lands
    upstream; pull 2 emits the drift row, CAS-publishes the widened
    config, the TARGET evolves from the drift changes, and the merge
    continues under the new column; pull 3 proves the loop keeps
    running post-migration.  A replay of the widened batch leaves the
    target unchanged (the newer-guard half of exactly-once)."""
    from pgshovel_spark.streaming.sinks import JdbcMergeSink

    jvm = spark._jvm
    url = f"jdbc:derby:{tmp_path}/e2edb;create=true"
    con = jvm.java.sql.DriverManager.getConnection(url)
    st = con.createStatement()
    st.executeUpdate("CREATE TABLE items (id INT PRIMARY KEY, v DOUBLE)")
    st.executeUpdate("CREATE TABLE items_tgt (id INT PRIMARY KEY, v DOUBLE)")
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
    pulls = pulls_with_drift_check(
        incremental_pulls(reader, "ID"),
        SchemaDriftMonitor(store, "items_set", policy="widen"),
        "items",
    )

    def mk_sink(cols):
        return JdbcMergeSink(
            url,
            "items_tgt",
            keys=["ID"],
            order_cols=["ID"],
            columns=cols,
            connection_factory=lambda: jvm.java.sql.DriverManager.getConnection(url),
            driver="org.apache.derby.jdbc.EmbeddedDriver",
            staging_table="drift_stage",
        )

    def target_rows():
        c = jvm.java.sql.DriverManager.getConnection(url)
        s = c.createStatement()
        cols = "id, v" + (", tag" if target_rows.widened else "")
        rs = s.executeQuery(f"SELECT {cols} FROM items_tgt ORDER BY id")
        out = []
        while rs.next():
            row = [rs.getInt(1), rs.getDouble(2)]
            if target_rows.widened:
                row.append(rs.getString(3))
            out.append(tuple(row))
        rs.close(); s.close(); c.close()
        return out

    target_rows.widened = False

    sink = mk_sink(["ID", "V"])
    batch1, drift1 = next(pulls)
    assert drift1 == []
    sink.apply(batch1.select("ID", "V"), 0)
    assert target_rows() == [(1, 1.5), (2, 3.0), (3, 4.5)]

    # mid-stream upstream migration
    st.executeUpdate("ALTER TABLE items ADD COLUMN tag VARCHAR(10)")
    st.executeUpdate("INSERT INTO items VALUES (4, 6.0, 'd4')")

    batch2, drift2 = next(pulls)
    assert [(c.change_kind, c.column) for c in drift2] == [("added", "tag")]
    # widened config was published BEFORE the batch reached us
    cfg = get_set(store, "items_set")
    assert cfg.tables["items"].column_types["tag"] == "string"
    # the pipeline reacts: evolve the target from the drift rows and
    # widen the sink's column list, then keep merging
    for c in drift2:
        assert c.change_kind == "added"
        st.executeUpdate(f"ALTER TABLE items_tgt ADD COLUMN {c.column} VARCHAR(10)")
    target_rows.widened = True
    sink = mk_sink(["ID", "V", "TAG"])
    sink.apply(batch2.select("ID", "V", "TAG"), 1)

    # the loop keeps running under the new schema
    st.executeUpdate("INSERT INTO items VALUES (5, 7.5, 'd5')")
    batch3, drift3 = next(pulls)
    assert drift3 == []
    sink.apply(batch3.select("ID", "V", "TAG"), 2)

    want = [
        (1, 1.5, None),
        (2, 3.0, None),
        (3, 4.5, None),
        (4, 6.0, "d4"),
        (5, 7.5, "d5"),
    ]
    assert target_rows() == want

    # replaying the widened batch is a no-op (newer-guard idempotence)
    sink.apply(batch2.select("ID", "V", "TAG"), 99)
    assert target_rows() == want
    st.close()
    con.close()
