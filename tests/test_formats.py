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
