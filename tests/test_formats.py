"""CSV/JSON readers + partitioned-writer round trips, including the
partition-pruning contract the layout exists for."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pgshovel_spark.sources.formats import (
    read_csv,
    read_json,
    with_date_partition,
    write_partitioned,
)
from pgshovel_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_csv_round_trip(spark, tmp_path):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    p = str(tmp_path / "orders_csv")
    orders.write.option("header", "true").csv(p)
    back = read_csv(
        spark,
        p,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    assert back.count() == orders.count()
    assert dict(back.dtypes)["o_totalprice"] == "double"


def test_json_round_trip(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "n_chars")
    p = str(tmp_path / "docs_json")
    docs.write.json(p)
    back = read_json(spark, p, "doc_id long, lang string, n_chars long")
    assert back.count() == docs.count()
    assert back.filter(F.col("lang") == "en").count() > 0


def test_partitioned_write_and_pruning(spark, tmp_path):
    events = load_table(spark, SF, "events")
    p = str(tmp_path / "events_part")
    write_partitioned(with_date_partition(events, "ts"), p, ["p_date"])
    back = spark.read.parquet(p)
    assert back.count() == events.count()
    # partition pruning: a p_date filter must reach PartitionFilters,
    # not the data scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("p_date") == "2024-01-05").explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "p_date" in plan.split("PartitionFilters")[1][:200]
    one_day = back.filter(F.col("p_date") == "2024-01-05").count()
    assert 0 < one_day < events.count()


def test_orc_roundtrip_partitioned(spark, tmp_path):
    from pgshovel_spark.sources.formats import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02"), (3, "a", "2024-01-01")],
        "id long, tag string, p_date string",
    )
    path = str(tmp_path / "orc_tbl")
    write_orc(df, path, partition_cols=["p_date"])
    back = read_orc(spark, path)
    # partition-dir values come back type-inferred (DATE); normalize
    assert sorted((r.id, r.tag, str(r.p_date)) for r in back.collect()) == [
        (1, "a", "2024-01-01"),
        (2, "b", "2024-01-02"),
        (3, "a", "2024-01-01"),
    ]
    # partition pruning surface exists: directory per p_date
    import os

    assert any(d.startswith("p_date=") for d in os.listdir(path))


def test_read_evolving_merges_widened_schema(spark, tmp_path):
    from pgshovel_spark.sources.formats import read_evolving

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(path)
    got = {r.id: (r.v, r.score) for r in read_evolving(spark, path).collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_compact_reduces_file_count_and_preserves_rows(spark, tmp_path):
    import os

    from pgshovel_spark.sources.formats import compact

    path = str(tmp_path / "frag")
    # 20 tiny files
    for i in range(20):
        spark.createDataFrame(
            [(i * 10 + j, f"r{i}") for j in range(10)], "id long, tag string"
        ).coalesce(1).write.mode("append").parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before >= 20
    before_rows = sorted(r.id for r in spark.read.parquet(path).collect())

    n_after = compact(spark, path, target_file_mb=256)
    assert n_after == 1
    after_rows = sorted(r.id for r in spark.read.parquet(path).collect())
    assert after_rows == before_rows
    assert not os.path.exists(path + ".compact")
    assert not os.path.exists(path + ".old")


def test_partitioned_writer_bloom_and_cluster_levers(spark, tmp_path):
    """The write_partitioned data-skipping levers, measured on decoded
    rows (the scan node's numOutputRows = rows surviving row-group
    skipping, before the exact Filter): clustering serves range
    filters, blooms serve point lookups on a different column — both
    below the partition level."""
    from pyspark.sql import functions as F

    from pgshovel_spark.sources.formats import with_date_partition, write_partitioned
    from pgshovel_spark.sources.tables import load_table

    li = with_date_partition(
        load_table(spark, "/root/testdata/sf0.01", "lineitem"),
        "l_shipdate",
        "p_year",
    ).withColumn("p_year", F.substring("p_year", 1, 4))
    plain = str(tmp_path / "plain")
    tuned = str(tmp_path / "tuned")
    # small row groups on BOTH sides so skipping is possible at this SF
    li.coalesce(1).write.mode("overwrite").option(
        "parquet.block.size", 16384
    ).partitionBy("p_year").parquet(plain)
    write_partitioned(
        li.coalesce(1),
        tuned,
        ["p_year"],
        cluster_by=["l_orderkey"],
        bloom_cols={"l_partkey": 2000},
        **{"parquet.block.size": "16384"},
    )

    def decoded(path, pred):
        df = spark.read.parquet(path).filter(pred)
        n = len(df.collect())
        out = []

        def walk(node):
            if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
                walk(node.executedPlan())
                return
            m = node.metrics().iterator()
            while m.hasNext():
                kv = m.next()
                if kv._1() == "numOutputRows" and "Scan" in node.nodeName():
                    out.append(kv._2().value())
            ch = node.children().iterator()
            while ch.hasNext():
                walk(ch.next())

        walk(df._jdf.queryExecution().executedPlan())
        return n, sum(out)

    # point lookup on the bloom column: same answer, fewer decoded rows
    some_key = li.select("l_partkey").first()[0]
    pred = F.col("l_partkey") == some_key
    n_p, dec_p = decoded(plain, pred)
    n_t, dec_t = decoded(tuned, pred)
    assert n_p == n_t and n_p > 0
    assert dec_t < dec_p, (dec_t, dec_p)

    # range filter on the cluster column: fewer decoded rows too
    lo, hi = 100, 400
    pred = (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)
    n_p, dec_p = decoded(plain, pred)
    n_t, dec_t = decoded(tuned, pred)
    assert n_p == n_t and n_p > 0
    assert dec_t < dec_p, (dec_t, dec_p)


def test_xml_round_trip(spark, tmp_path):
    """Spark 4 native XML (no external jar): typed round-trip incl. a
    nested struct, special characters escaped, rowTag honored."""
    from pyspark.sql import functions as F

    from pgshovel_spark.sources.formats import read_xml, write_xml

    df = spark.createDataFrame(
        [(1, "a < b & 'c'", 1.5), (2, "plain", -2.25)],
        "id long, note string, score double",
    ).withColumn("meta", F.struct(F.lit("v1").alias("tag"), F.col("id").alias("src")))
    path = str(tmp_path / "xml_rt")
    write_xml(df, path, row_tag="rec", root_tag="recs")
    back = read_xml(spark, path, row_tag="rec")
    got = {
        (r.id, r.note, r.score, r.meta.tag, r.meta.src)
        for r in back.collect()
    }
    assert got == {(1, "a < b & 'c'", 1.5, "v1", 1), (2, "plain", -2.25, "v1", 2)}
