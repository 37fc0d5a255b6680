"""End-to-end CDC pipeline: the full reference user story on Spark.

administration (create_set → config) → high-watermark incremental
pulls driven BY that config → latest-state merge → epoch fencing after
a failover (bump_epoch) drops the stale publisher's rows.  Each piece
has unit tests; this proves they compose.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from pgshovel_spark.sources.administration import (
    SetConfig,
    TableConfig,
    bump_epoch,
    create_set,
    get_set,
)
from pgshovel_spark.sources.cdc import incremental_pulls
from pgshovel_spark.streaming.ops import validate_sequences


def _latest(df, key_cols, order_cols):
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return df.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")


def test_cdc_pipeline_end_to_end(spark, tmp_path):
    admin_dir = str(tmp_path / "admin")
    cfg = create_set(
        admin_dir,
        SetConfig(
            name="accounts",
            tables={"accounts": TableConfig(cursor_col="seq", key_cols=["acct"])},
        ),
    )
    table_dir = str(tmp_path / "db" / "accounts")
    wfile = str(tmp_path / "ckpt" / "accounts.watermark.json")

    # "database" state v1: 3 accounts
    spark.createDataFrame(
        [(1, 1, 100.0), (2, 2, 200.0), (3, 3, 300.0)],
        "acct long, seq long, bal double",
    ).write.mode("overwrite").parquet(table_dir)

    def read(watermark):
        df = spark.read.parquet(table_dir)
        cur = cfg.tables["accounts"].cursor_col
        return df if watermark is None else df.filter(F.col(cur) > watermark)

    state = None
    for batch in incremental_pulls(
        read, cfg.tables["accounts"].cursor_col, watermark_file=wfile, max_pulls=5
    ):
        merged = batch if state is None else state.unionByName(batch)
        state = _latest(merged, ["acct"], ["seq"]).localCheckpoint(eager=True)
    assert {r.acct: r.bal for r in state.collect()} == {1: 100.0, 2: 200.0, 3: 300.0}

    # database moves on: acct 2 updated (seq 4) — a restart pulls ONLY it
    spark.createDataFrame(
        [(2, 4, 250.0)], "acct long, seq long, bal double"
    ).write.mode("append").parquet(table_dir)
    pulled = [
        sorted((r.acct, r.seq) for r in b.collect())
        for b in incremental_pulls(
            read, cfg.tables["accounts"].cursor_col, watermark_file=wfile, max_pulls=5
        )
    ]
    assert pulled == [[(2, 4)]]

    # failover: new relay generation; stale publisher rows get fenced
    fenced_cfg = bump_epoch(admin_dir, "accounts")
    assert get_set(admin_dir, "accounts").epoch == fenced_cfg.epoch == 1
    changes = spark.createDataFrame(
        [
            ("p1", 0, 10, 2, 999.0),   # stale epoch-0 relay replaying old data
            ("p1", fenced_cfg.epoch, 1, 2, 250.0),
            ("p1", fenced_cfg.epoch, 2, 3, 333.0),
        ],
        "publisher string, epoch long, seq long, acct long, bal double",
    )
    kept = validate_sequences(changes)
    rows = {(r.acct): (r.epoch, r.bal) for r in kept.collect()}
    assert rows == {2: (1, 250.0), 3: (1, 333.0)}  # epoch-0 row dropped


def test_bootstrap_then_stream_equals_full_replay(spark, tmp_path):
    """Round-5 composition check: MVCC snapshot bootstrap →
    change-stream replay through the idempotent merge sink equals a
    full-history replay.  This is the complete consumer lifecycle —
    initial load from a dump taken mid-stream, then streaming merge of
    everything from the stream position, with an overlap window the
    sink's newest-row-per-key rank must absorb."""
    from pgshovel_spark.sources.cdc import bootstrap_consistent_state, mvcc_visible
    from pgshovel_spark.streaming.change_stream import file_change_stream
    from pgshovel_spark.streaming.sinks import SnapshotParquetMergeSink

    # mutation history: (k, v, txid); snapshot at xmax=8, txids 5,7 in flight
    rows = [
        (1, "a1", 1), (2, "b1", 2), (1, "a2", 3), (3, "c1", 4),
        (2, "b2", 5), (3, "c2", 6), (1, "a3", 7), (4, "d1", 8),
        (2, "b3", 9), (5, "e1", 10), (1, "a4", 11),
    ]
    hist = spark.createDataFrame(rows, "k long, v string, txid long")
    xmin, xmax, xip = 1, 8, [5, 7]
    w = Window.partitionBy("k").orderBy(F.col("txid").desc())
    dump = (
        hist.filter(mvcc_visible("txid", xmin, xmax, xip))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    # initial load: dump + mutations invisible to the snapshot
    state0 = bootstrap_consistent_state(
        dump, hist, keys=["k"], order_cols=["txid"],
        xmin=xmin, xmax=xmax, xip=xip,
    )
    target = str(tmp_path / "state")
    sink = SnapshotParquetMergeSink(target, ["k"], ["txid"])
    sink.apply(state0, 0)

    # stream the tail from an OVERLAPPING position (txid >= 7): the
    # sink's rank-per-key merge must absorb the replayed rows
    tail_dir = str(tmp_path / "tail")
    hist.filter(F.col("txid") >= 7).repartition(1).write.parquet(tail_dir)
    stream = file_change_stream(
        spark, tail_dir, schema=hist.schema, max_files=10
    )
    sink.run(stream, str(tmp_path / "ckpt"))

    got = {(r.k, r.v) for r in spark.read.parquet(target).collect()}
    full = {
        (r.k, r.v)
        for r in hist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == full == {(1, "a4"), (2, "b3"), (3, "c2"), (4, "d1"), (5, "e1")}


def test_cdc_pipeline_end_to_end_live_jdbc(spark, tmp_path):
    """The SAME user story with the database side REAL: an embedded
    Derby table plays the Postgres source — administration config →
    jdbc_snapshot_reader (real format("jdbc") reads with pushdown) →
    incremental pulls with watermark-file persistence across loop
    restarts → latest-state merge → final state equals the live
    table's latest row per key.  Every hop a production deployment
    makes except the network."""
    from pgshovel_spark.sources.administration import SetConfig, TableConfig, create_set
    from pgshovel_spark.sources.cdc import incremental_pulls, jdbc_snapshot_reader

    cfg = create_set(
        str(tmp_path / "admin"),
        SetConfig(
            name="accounts",
            tables={"accounts": TableConfig(cursor_col="seq", key_cols=["acct"])},
        ),
    )
    url = f"jdbc:derby:{tmp_path}/srcdb;create=true"
    jvm = spark._jvm
    con = jvm.java.sql.DriverManager.getConnection(url)
    st = con.createStatement()
    st.executeUpdate(
        "CREATE TABLE accounts (seq INT PRIMARY KEY, acct INT, bal DOUBLE)"
    )
    for seq, acct, bal in [(1, 1, 100.0), (2, 2, 200.0), (3, 3, 300.0)]:
        st.executeUpdate(f"INSERT INTO accounts VALUES ({seq}, {acct}, {bal})")

    jdbc_read = jdbc_snapshot_reader(
        spark, url, "accounts",
        {"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )

    def read(watermark):
        return jdbc_read(watermark, cursor_col=cfg.tables["accounts"].cursor_col)

    wfile = str(tmp_path / "ckpt" / "accounts.watermark.json")
    cur = cfg.tables["accounts"].cursor_col.upper()

    state = None
    for batch in incremental_pulls(read, cur, watermark_file=wfile, max_pulls=5):
        state = batch if state is None else state.unionByName(batch)
    state = _latest(state, ["ACCT"], [cur])
    assert {(r.ACCT, r.BAL) for r in state.collect()} == {
        (1, 100.0), (2, 200.0), (3, 300.0),
    }

    # live mutations: update acct 2, insert acct 4 — then a FRESH loop
    # (restart) resumes from the watermark file and sees only the delta
    for seq, acct, bal in [(4, 2, 250.0), (5, 4, 400.0)]:
        st.executeUpdate(f"INSERT INTO accounts VALUES ({seq}, {acct}, {bal})")
    delta_rows = 0
    for batch in incremental_pulls(read, cur, watermark_file=wfile, max_pulls=5):
        delta_rows += batch.count()
        state = state.drop("__rn").unionByName(batch) if "__rn" in state.columns else state.unionByName(batch)
    assert delta_rows == 2
    final = _latest(state, ["ACCT"], [cur])
    assert {(r.ACCT, r.BAL) for r in final.collect()} == {
        (1, 100.0), (2, 250.0), (3, 300.0), (4, 400.0),
    }
    st.close()
    con.close()


def test_replication_set_multi_table_live_pull(spark, tmp_path):
    """The reference's capture UNIT is the replication SET — several
    tables advancing independent watermarks under one named config.
    Live on Derby: a 2-table set with HETEROGENEOUS cursor types (an
    integer sequence and a microsecond timestamp), one pull loop per
    table driven off ReplicationSet.watermark_path, live inserts into
    BOTH tables, then a process 'restart' (fresh loops) that resumes
    each table from ITS OWN watermark file and sees exactly its own
    delta — no cross-table bleed, no re-delivery."""
    import datetime

    from pgshovel_spark.sources.cdc import (
        ReplicationSet,
        incremental_pulls,
        jdbc_snapshot_reader,
    )

    rset = ReplicationSet(
        "shop",
        {
            "orders_src": {"cursor_col": "seq", "key_cols": ["okey"]},
            "audit_src": {"cursor_col": "at_ts", "key_cols": ["aid"]},
        },
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    url = f"jdbc:derby:{tmp_path}/shopdb;create=true"
    jvm = spark._jvm
    con = jvm.java.sql.DriverManager.getConnection(url)
    st = con.createStatement()
    st.executeUpdate("CREATE TABLE orders_src (seq INT PRIMARY KEY, okey INT, amt DOUBLE)")
    st.executeUpdate("CREATE TABLE audit_src (at_ts TIMESTAMP, aid INT, what VARCHAR(20))")
    for seq, okey, amt in [(1, 10, 5.0), (2, 11, 6.0)]:
        st.executeUpdate(f"INSERT INTO orders_src VALUES ({seq}, {okey}, {amt})")
    base = datetime.datetime(2026, 4, 1, 9, 0, 0)
    ps = con.prepareStatement("INSERT INTO audit_src VALUES (?, ?, ?)")
    for i in range(3):
        ps.setTimestamp(1, jvm.java.sql.Timestamp.valueOf(
            (base + datetime.timedelta(microseconds=i)).isoformat(sep=" ")))
        ps.setInt(2, i)
        ps.setString(3, f"ev{i}")
        ps.executeUpdate()

    opts = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    readers = {
        t: jdbc_snapshot_reader(spark, url, t, opts) for t in rset.tables
    }

    def pull_all():
        """One sweep over the set: {table: rows_delivered}."""
        out = {}
        for t, spec in rset.tables.items():
            n = 0
            for batch in incremental_pulls(
                readers[t],
                spec["cursor_col"].upper(),
                watermark_file=rset.watermark_path(t),
                max_pulls=4,
            ):
                n += batch.count()
            out[t] = n
        return out

    assert pull_all() == {"orders_src": 2, "audit_src": 3}

    # live mutations on both tables
    st.executeUpdate("INSERT INTO orders_src VALUES (3, 12, 7.0)")
    ps.setTimestamp(1, jvm.java.sql.Timestamp.valueOf(
        (base + datetime.timedelta(microseconds=3)).isoformat(sep=" ")))
    ps.setInt(2, 3)
    ps.setString(3, "ev3")
    ps.executeUpdate()

    # 'restart': fresh loops resume per-table from their own files
    assert pull_all() == {"orders_src": 1, "audit_src": 1}
    # idempotent: nothing new -> nothing delivered
    assert pull_all() == {"orders_src": 0, "audit_src": 0}
    st.close()
    con.close()
