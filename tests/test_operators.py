"""Unit tests for composed operators (asof, topk) on crafted frames."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import datetime as dt

from pyspark.sql import functions as F

from pgshovel_spark.operators.asof import asof_join
from pgshovel_spark.operators.topk import topk_per_group

D = dt.datetime


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, D(2024, 1, 1, 10, 0), "a"),   # before any right row
            (2, D(2024, 1, 1, 12, 0), "b"),   # exactly at a right ts
            (3, D(2024, 1, 1, 15, 0), "c"),   # after several
        ],
        "lid long, ts timestamp, tag string",
    ).withColumn("k", F.lit(1))
    right = spark.createDataFrame(
        [
            (10, D(2024, 1, 1, 11, 0), 1.0),
            (11, D(2024, 1, 1, 12, 0), 2.0),  # ties left row 2's ts
            (12, D(2024, 1, 1, 12, 0), 3.0),  # same ts: higher rid wins
            (13, D(2024, 1, 1, 14, 0), 4.0),
        ],
        "rid long, ts timestamp, val double",
    ).withColumn("k", F.lit(1))
    return left, right


def test_asof_inner_semantics(spark):
    left, right = _frames(spark)
    out = {
        r.lid: (r.rid, r.val)
        for r in asof_join(
            left, right, on=["k"], order_col="ts", right_tiebreak="rid",
            right_value_cols=["rid", "val"], how="inner",
        ).collect()
    }
    assert 1 not in out, "left row before any right row drops in inner"
    assert out[2] == (12, 3.0), "equal-ts rights match; max tiebreak wins"
    assert out[3] == (13, 4.0)


def test_asof_left_semantics(spark):
    left, right = _frames(spark)
    out = {
        r.lid: r.rid
        for r in asof_join(
            left, right, on=["k"], order_col="ts", right_tiebreak="rid",
            right_value_cols=["rid", "val"], how="left",
        ).collect()
    }
    assert out[1] is None, "left keeps unmatched rows with NULLs"
    assert out[2] == 12 and out[3] == 13


def test_asof_empty_right(spark):
    left, right = _frames(spark)
    empty = right.filter(F.lit(False))
    inner = asof_join(
        left, empty, on=["k"], order_col="ts", right_tiebreak="rid",
        right_value_cols=["rid", "val"], how="inner",
    )
    assert inner.count() == 0
    left_out = asof_join(
        left, empty, on=["k"], order_col="ts", right_tiebreak="rid",
        right_value_cols=["rid", "val"], how="left",
    )
    assert left_out.count() == left.count()


def test_topk_per_group_rank_and_cutoff(spark):
    df = spark.createDataFrame(
        [(g, i, float(100 - i)) for g in (1, 2) for i in range(5)],
        "g long, i long, score double",
    )
    out = topk_per_group(df, ["g"], [F.col("score").desc(), F.col("i").asc()], 2)
    rows = sorted((r.g, r.rn, r.i) for r in out.collect())
    assert rows == [(1, 1, 0), (1, 2, 1), (2, 1, 0), (2, 2, 1)]
