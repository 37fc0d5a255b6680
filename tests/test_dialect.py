"""JDBC dialect conformance harness.

The Derby matrix executes LIVE (embedded engine from Spark's own
classpath): for every TypeCase the harness creates a table, inserts
the samples through a parameterized PreparedStatement (bind values,
never literals — so the write path cannot mask literal-rendering bugs
on the read path), then asserts

1. Spark's ``format("jdbc")`` read maps the column to the declared
   Catalyst type,
2. the values round-trip bit-exact, and
3. for cursor-eligible kinds, the ``sql_literal`` pushdown predicate
   executed SERVER-SIDE selects exactly the rows strictly above each
   sample watermark (the incremental-pull contract, per type).

The Postgres matrix cannot execute here (no server); its cases are
asserted structurally complete and its generated pushdown SQL
well-formed, and its two live-only deltas are pinned as declared
quirks so a regression that drops the documentation fails a test.
"""

from __future__ import annotations

import datetime
import decimal

import pytest

from pgshovel_spark.sources.cdc import (
    incremental_pulls,
    jdbc_snapshot_reader,
    sql_literal,
)
from pgshovel_spark.sources.dialect import (
    DERBY,
    DIALECTS,
    LOGICAL_KINDS,
    POSTGRES,
    conformance_cases,
)


def _derby_conn(spark, tmp_path, name):
    url = DERBY.url_template.format(path=str(tmp_path / name))
    jvm = spark._jvm
    return url, jvm.java.sql.DriverManager.getConnection(url)


def _bind(ps, i, v, jvm):
    """Bind a Python sample onto a JDBC PreparedStatement parameter."""
    if isinstance(v, bool):
        ps.setBoolean(i, v)
    elif isinstance(v, int):
        ps.setLong(i, v)
    elif isinstance(v, float):
        ps.setDouble(i, v)
    elif isinstance(v, decimal.Decimal):
        ps.setBigDecimal(i, jvm.java.math.BigDecimal(str(v)))
    elif isinstance(v, datetime.datetime):
        ps.setTimestamp(i, jvm.java.sql.Timestamp.valueOf(v.isoformat(sep=" ")))
    elif isinstance(v, datetime.date):
        ps.setDate(i, jvm.java.sql.Date.valueOf(v.isoformat()))
    else:
        ps.setString(i, str(v))


@pytest.mark.parametrize("kind", LOGICAL_KINDS)
def test_derby_type_roundtrip_and_pushdown(spark, tmp_path, kind):
    case = DERBY.type_case(kind)
    url, con = _derby_conn(spark, tmp_path, f"conf_{kind}")
    jvm = spark._jvm
    st = con.createStatement()
    st.executeUpdate(DERBY.ddl("t_conf", {"id": "int32", "cur": kind}))
    ps = con.prepareStatement("INSERT INTO t_conf VALUES (?, ?)")
    for i, v in enumerate(case.samples):
        ps.setInt(1, i)
        _bind(ps, 2, v, jvm)
        ps.executeUpdate()

    df = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", DERBY.driver)
        .option("dbtable", "t_conf")
        .load()
    )
    # 1. type mapping
    got_type = dict(df.dtypes)["CUR"]
    assert got_type == case.spark_type, f"{kind}: {got_type} != {case.spark_type}"
    # 2. value round-trip (bit-exact; CHAR keeps its pad)
    got = sorted(
        (r.CUR.ljust(8) if kind == "char_padded" else r.CUR)
        for r in df.collect()
    )
    want = sorted(
        v.ljust(8) if kind == "char_padded" else v for v in case.samples
    )
    assert got == want, f"{kind}: {got} != {want}"

    # 3. watermark pushdown per sample: server-side `cur > literal`
    #    must select exactly the strictly-greater samples
    if case.cursor:
        read = jdbc_snapshot_reader(
            spark, url, "t_conf", {"driver": DERBY.driver}
        )
        for wm in case.samples:
            pulled = read(wm, cursor_col="cur")
            got_n = pulled.count()
            want_n = sum(1 for v in case.samples if v > wm)
            assert got_n == want_n, f"{kind} wm={wm!r}: {got_n} != {want_n}"
    # literal equality: the rendered literal must parse AND compare
    # equal to the bound value (catches precision truncation)
    for v in case.samples:
        if isinstance(v, float):
            continue  # repr-rendered doubles legitimately differ in SQL text
        rs = st.executeQuery(
            f"SELECT COUNT(*) FROM t_conf WHERE cur = "
            f"{sql_literal(v, DERBY.literal_style)}"
        )
        rs.next()
        assert rs.getInt(1) >= 1, f"{kind}: literal {sql_literal(v)} matched 0 rows"
    st.close()
    con.close()


def test_derby_timestamp_cursor_full_pull_loop(spark, tmp_path):
    """The incremental loop end-to-end on a TIMESTAMP cursor with
    sub-second precision — the exact case where literal rendering
    truncation would re-deliver or skip rows."""
    url, con = _derby_conn(spark, tmp_path, "tsloop")
    jvm = spark._jvm
    st = con.createStatement()
    st.executeUpdate(DERBY.ddl("ev", {"id": "int32", "cur": "timestamp_micros"}))
    ps = con.prepareStatement("INSERT INTO ev VALUES (?, ?)")
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    for i in range(5):
        ps.setInt(1, i)
        _bind(ps, 2, base + datetime.timedelta(microseconds=i), jvm)
        ps.executeUpdate()

    read = jdbc_snapshot_reader(spark, url, "ev", {"driver": DERBY.driver})
    wm_file = str(tmp_path / "wm.json")
    it = incremental_pulls(read, "cur", watermark_file=wm_file)
    assert next(it).count() == 5
    # micro-offset rows inserted between pulls: a second-truncating
    # literal would re-pull all 5 (or miss the new 3)
    for i in range(5, 8):
        ps.setInt(1, i)
        _bind(ps, 2, base + datetime.timedelta(microseconds=i), jvm)
        ps.executeUpdate()
    second = next(it)
    assert sorted(r.ID for r in second.collect()) == [5, 6, 7]
    st.close()
    con.close()


def test_postgres_matrix_complete_and_sql_well_formed():
    """The Postgres dialect covers every logical kind, every cursor
    kind generates a syntactically plausible pushdown subquery, and
    the two live-only deltas stay declared."""
    kinds = {t.kind for t in POSTGRES.types}
    assert kinds == set(LOGICAL_KINDS)
    n_sub = 0
    for case, subqueries in conformance_cases(POSTGRES):
        for sq in subqueries:
            assert sq.startswith("(SELECT * FROM t_conf WHERE cur > ")
            assert sq.endswith(") AS src")
            assert "''" in sq or "'" not in sq.split(">", 1)[1] or sq.count("'") % 2 == 0
            n_sub += 1
    assert n_sub > 0
    tags = {q[0] for q in POSTGRES.quirks}
    assert {"jsonb", "snapshot-export"} <= tags
    # DDL generation is total over the matrix
    ddl = POSTGRES.ddl("t_conf", {c.kind: c.kind for c in POSTGRES.types})
    assert "NUMERIC(20,4)" in ddl and "DOUBLE PRECISION" in ddl


def test_dialect_registry_and_derby_quirks():
    assert set(DIALECTS) == {"derby", "postgres"}
    assert {q[0] for q in DERBY.quirks} == {
        "no-snapshot-export",
        "identifier-case",
    }
    # every dialect's cursor-capable kinds agree (the pull loop is
    # dialect-agnostic; a kind that can cursor on one engine but not
    # the other would need a per-dialect code path we don't have)
    derby_cursors = {t.kind for t in DERBY.types if t.cursor}
    pg_cursors = {t.kind for t in POSTGRES.types if t.cursor}
    assert derby_cursors == pg_cursors


def test_parallel_bootstrap_session_init(spark, tmp_path):
    """The parallel-bootstrap seam, proven live: a partitioned JDBC
    read opens one connection per partition, and Spark executes
    ``sessionInitStatement`` on EVERY one of them — the exact hook
    ``SET TRANSACTION SNAPSHOT`` needs so N Postgres range readers
    share one exported snapshot.  Derby can't run the Postgres
    statement, so the init here is an INSERT into a log table: the
    row count after the read IS the number of connections that ran
    the init (>= the partition count), and the partitioned read's
    rows must equal the unpartitioned read's exactly."""
    from pgshovel_spark.sources.cdc import parallel_bootstrap_options

    url, con = _derby_conn(spark, tmp_path, "pboot")
    st = con.createStatement()
    st.executeUpdate("CREATE TABLE src (id INT PRIMARY KEY, v DOUBLE)")
    st.executeUpdate("CREATE TABLE conn_log (marker INT)")
    for i in range(1, 101):
        st.executeUpdate(f"INSERT INTO src VALUES ({i}, {i * 0.5})")

    opts = parallel_bootstrap_options("id", 1, 101, 4)
    opts["sessionInitStatement"] = "INSERT INTO conn_log VALUES (1)"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", DERBY.driver)
        .option("dbtable", "src")
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    part = reader.load()
    assert part.rdd.getNumPartitions() == 4
    got = sorted(r.ID for r in part.collect())
    assert got == list(range(1, 101))

    rs = st.executeQuery("SELECT COUNT(*) FROM conn_log")
    rs.next()
    n_inits = rs.getInt(1)
    assert n_inits >= 4, f"init ran on only {n_inits} connections"
    st.close()
    con.close()


def test_parallel_bootstrap_snapshot_statement():
    """The Postgres form: snapshot_id composes the REPEATABLE READ +
    SET TRANSACTION SNAPSHOT init statement; malformed ids are
    rejected (the id lands inside a SQL literal)."""
    import pytest as _pytest

    from pgshovel_spark.sources.cdc import parallel_bootstrap_options

    opts = parallel_bootstrap_options(
        "id", 0, 1000, 8, snapshot_id="00000003-0000001B-1"
    )
    assert opts["numPartitions"] == "8"
    assert (
        opts["sessionInitStatement"]
        == "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; "
        "SET TRANSACTION SNAPSHOT '00000003-0000001B-1'"
    )
    with _pytest.raises(ValueError):
        parallel_bootstrap_options("id", 0, 1, 2, snapshot_id="x' --")
    with _pytest.raises(ValueError):
        parallel_bootstrap_options("id; DROP TABLE x", 0, 1, 2)


def test_literal_grammar_property_live_derby(spark, tmp_path):
    """Generative conformance for the literal grammar on a LIVE parser:
    arbitrary microsecond timestamps, decimals, and adversarial strings
    (quotes, backslashes, unicode) rendered by sql_literal(style=derby)
    must parse AND select exactly the row the driver bound — across the
    whole value space, not just the curated matrix samples."""
    import datetime as _dt
    import decimal as _dec

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    url, con = _derby_conn(spark, tmp_path, "prop")
    jvm = spark._jvm
    st_ = con.createStatement()
    st_.executeUpdate(
        "CREATE TABLE p_conf (id INT PRIMARY KEY, ts TIMESTAMP, "
        "dc DECIMAL(20,6), tx VARCHAR(120))"
    )
    ps = con.prepareStatement("INSERT INTO p_conf VALUES (?, ?, ?, ?)")
    counter = [0]

    @settings(
        max_examples=30,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        ts=st.datetimes(
            min_value=_dt.datetime(1753, 1, 1),
            max_value=_dt.datetime(9999, 12, 30),
        ),
        dc=st.decimals(
            min_value=_dec.Decimal("-99999999999999.999999"),
            max_value=_dec.Decimal("99999999999999.999999"),
            allow_nan=False,
            allow_infinity=False,
            places=6,
        ),
        tx=st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"
            ),
            min_size=0,
            max_size=40,
        ),
    )
    def check(ts, dc, tx):
        counter[0] += 1
        i = counter[0]
        ps.setInt(1, i)
        ps.setTimestamp(2, jvm.java.sql.Timestamp.valueOf(ts.isoformat(sep=" ")))
        ps.setBigDecimal(3, jvm.java.math.BigDecimal(str(dc)))
        ps.setString(4, tx)
        ps.executeUpdate()
        for col, val in (("ts", ts), ("dc", dc), ("tx", tx)):
            lit = sql_literal(val, "derby")
            rs = st_.executeQuery(
                f"SELECT COUNT(*) FROM p_conf WHERE id = {i} AND {col} = {lit}"
            )
            rs.next()
            assert rs.getInt(1) == 1, f"{col}={val!r} literal={lit}"

    check()
    st_.close()
    con.close()


# ---------------------------------------------------------------- postgres
# Pure-Python validator of the ANSI/Postgres literal grammar (ISO 9075
# lexical rules as Postgres applies them with the default
# standard_conforming_strings=on: the ONLY escape inside a string
# literal is the doubled quote — backslashes are ordinary characters).
# This machine-checks the declared Postgres deltas without a server:
# every literal sql_literal(style="ansi") emits must tokenize as ONE
# complete literal (nothing can leak past the closing quote) and must
# decode back to the exact value rendered.

import re as _re

_PG_NUM = _re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")
_PG_TS_BODY = _re.compile(
    r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d{1,6})?$"
)
_PG_DATE_BODY = _re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _pg_scan_string(sql: str) -> tuple[str, int]:
    """Scan one standard-conforming string literal from sql[0:].
    Returns (decoded value, chars consumed); raises on malformed."""
    assert sql[0] == "'", f"not a string literal: {sql[:20]!r}"
    out, i = [], 1
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            if i + 1 < len(sql) and sql[i + 1] == "'":
                out.append("'")
                i += 2
                continue
            return "".join(out), i + 1
        out.append(ch)
        i += 1
    raise AssertionError(f"unterminated string literal: {sql[:40]!r}")


def pg_parse_literal(sql: str):
    """Parse EXACTLY one Postgres literal (no trailing text allowed);
    returns the decoded Python value."""
    import datetime as _dt
    import decimal as _dec

    up = sql.upper()
    if up in ("TRUE", "FALSE"):
        return up == "TRUE"
    for kw, body_re, conv in (
        ("TIMESTAMP ", _PG_TS_BODY, lambda b: _dt.datetime.fromisoformat(b)),
        ("DATE ", _PG_DATE_BODY, lambda b: _dt.date.fromisoformat(b)),
    ):
        if up.startswith(kw):
            rest = sql[len(kw):]
            body, used = _pg_scan_string(rest)
            assert used == len(rest), f"trailing text after typed literal: {sql!r}"
            assert body_re.match(body), f"body not ISO for {kw.strip()}: {body!r}"
            return conv(body)
    if sql.startswith("'"):
        val, used = _pg_scan_string(sql)
        assert used == len(sql), f"text leaks past closing quote: {sql!r}"
        assert "\\'" not in sql[1:-1].replace("''", ""), "backslash-escape reliance"
        return val
    assert _PG_NUM.match(sql), f"not a Postgres numeric literal: {sql!r}"
    return _dec.Decimal(sql)


def test_postgres_literal_grammar_over_type_matrix():
    """Every cursor sample in the Postgres TypeCase matrix renders to a
    literal the pure-Python ISO/Postgres parser accepts and decodes
    back to the same value, and every generated pushdown subquery
    embeds it with balanced quoting."""
    import datetime as _dt
    import decimal as _dec

    pg = DIALECTS["postgres"]
    assert pg.literal_style == "ansi"
    for t, subqueries in conformance_cases(pg):
        for v in t.samples:
            lit = sql_literal(v, pg.literal_style)
            got = pg_parse_literal(lit)
            if isinstance(v, bool):
                assert got is v
            elif isinstance(v, _dt.datetime):
                assert got == v
            elif isinstance(v, _dt.date):
                assert got == v
            elif isinstance(v, str):
                assert got == v
            elif isinstance(v, float):
                assert float(got) == v
            else:
                assert _dec.Decimal(got) == _dec.Decimal(v)
        for sq in subqueries:
            # the subquery's quote characters must balance: an odd
            # count would mean a sample escaped its literal
            assert sq.count("'") % 2 == 0


def test_postgres_literal_grammar_property():
    """Generative version over the full value space (the Derby live
    property test's twin, machine-checked against the grammar table
    instead of a live parser): adversarial strings with quotes,
    backslashes and unicode; arbitrary microsecond timestamps;
    wide decimals."""
    import datetime as _dt
    import decimal as _dec

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        v=st.one_of(
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
                max_size=60,
            ),
            st.datetimes(
                min_value=_dt.datetime(1, 1, 1),
                max_value=_dt.datetime(9999, 12, 31, 23, 59, 59, 999999),
            ),
            st.dates(),
            st.decimals(allow_nan=False, allow_infinity=False, places=6),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.booleans(),
        )
    )
    def check(v):
        lit = sql_literal(v, "ansi")
        got = pg_parse_literal(lit)
        if isinstance(v, bool):
            assert got is v
        elif isinstance(v, _dt.datetime):
            assert got == v
        elif isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            assert got == v
        elif isinstance(v, str):
            assert got == v
        else:
            assert _dec.Decimal(got) == _dec.Decimal(v)

    check()
