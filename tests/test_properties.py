"""Property-based tests (hypothesis) for composed operators.

The asof_join is checked against a brute-force per-row reference on
random inputs — the union+window composition must equal the O(LxR)
definition for every generated case (tie-heavy inputs included).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pgshovel_spark.operators.asof import asof_join
from pgshovel_spark.operators.skew import salted_agg

BASE = dt.datetime(2024, 1, 1)

# small key/time domains on purpose: forces collisions and ties
keys = st.integers(min_value=0, max_value=2)
times = st.integers(min_value=0, max_value=10)

left_rows = st.lists(
    st.tuples(keys, times), min_size=0, max_size=8, unique=True
)
right_rows = st.lists(
    st.tuples(keys, times), min_size=0, max_size=8, unique=True
)


def brute_force_asof(left, right):
    """Reference semantics: greatest right (ord, tiebreak) <= left ord
    within the key; inner."""
    out = {}
    for i, (lk, lt) in enumerate(left):
        cands = [(rt, rid) for rid, (rk, rt) in enumerate(right) if rk == lk and rt <= lt]
        if cands:
            out[i] = max(cands)[1]
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=left_rows, right=right_rows)
def test_asof_matches_brute_force(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(left)] or
        [(0, -99, BASE)],  # placeholder avoids empty-frame schema issues
        "lid long, k long, ts timestamp",
    )
    if not left:
        ldf = ldf.filter(F.lit(False))
    rdf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(right)] or
        [(0, -99, BASE)],
        "rid long, k long, ts timestamp",
    )
    if not right:
        rdf = rdf.filter(F.lit(False))
    got = {
        r.lid: r.rid
        for r in asof_join(
            ldf, rdf, on=["k"], order_col="ts", right_tiebreak="rid",
            right_value_cols=["rid"], how="inner",
        ).collect()
    }
    want = brute_force_asof(left, right)
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    )
)
def test_salted_agg_equals_plain_agg(spark, rows):
    df = spark.createDataFrame(rows, "k long, v long")
    plain = {
        (r.k): (r.n, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": ("sum", F.count(F.lit(1))),
                "total": ("sum", F.sum("v")),
                "mx": ("max", F.max("v")),
            },
            n_salts=4,
        ).collect()
    }
    assert plain == salted
