"""Document-frequency cap tests for the exact pair generators.

q_sim_jaccard / q_sim_ngram / q_sim_containment drop join keys with
document frequency > _DF_CAP before their blocking self-join — the
standard guard that keeps exact pair generation from going quadratic
on ubiquitous keys at scale.  The production cap (1000) never binds on
the small fixtures, so these tests shrink it to 2, where most fixture
keys are dropped, and assert:

- Spark and the DuckDB oracle (templated with the same cap) still
  hash-match — i.e. the cap is applied identically on both engines;
- the cap actually binds (some keys dropped, output differs from the
  uncapped run);
- the capped feature space really is bounded (max df <= cap), the
  plan-level guarantee that no posting list explodes.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.queries import curation, similarity
from pgshovel_spark.sources.tables import TABLES
from tools.selfcheck import canonical

SF = "/root/testdata/sf0.001"
TINY_CAP = 2


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_jaccard_cap_parity_and_binds(spark, oracle_con, monkeypatch):
    uncapped_rows = similarity.q_sim_jaccard(spark, SF).count()
    monkeypatch.setattr(similarity, "_DF_CAP", TINY_CAP)
    sdf = similarity.q_sim_jaccard(spark, SF).toPandas()
    odf = oracle_con.sql(similarity._sim_jaccard_sql(TINY_CAP)).df()
    assert canonical(sdf) == canonical(odf)
    assert len(sdf) != uncapped_rows  # the cap binds on this fixture


def test_ngram_cap_parity(spark, oracle_con, monkeypatch):
    monkeypatch.setattr(similarity, "_DF_CAP", TINY_CAP)
    sdf = similarity.q_sim_ngram(spark, SF).toPandas()
    odf = oracle_con.sql(similarity._sim_ngram_sql(TINY_CAP)).df()
    assert canonical(sdf) == canonical(odf)


def test_containment_cap_parity(spark, oracle_con, monkeypatch):
    monkeypatch.setattr(similarity, "_DF_CAP", TINY_CAP)
    sdf = curation.q_sim_containment(spark, SF).toPandas()
    odf = oracle_con.sql(curation._sim_containment_sql(TINY_CAP)).df()
    assert canonical(sdf) == canonical(odf)


def test_capped_feature_space_is_bounded(spark):
    """The guarantee the cap exists for: after the df semi-join, no
    join key's posting list exceeds the cap, so the self-join emits at
    most cap^2/2 rows per key at ANY corpus size."""
    raw = similarity._tok_distinct(spark, SF)
    dfreq = raw.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("df"))
    n_hot = dfreq.filter(F.col("df") > TINY_CAP).count()
    assert n_hot > 0  # fixture has keys the tiny cap must drop
    capped_max = (
        raw.join(
            dfreq.filter(F.col("df") <= TINY_CAP).select("lang", "t"), ["lang", "t"]
        )
        .groupBy("lang", "t")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df").alias("m"))
        .collect()[0]["m"]
    )
    assert capped_max <= TINY_CAP
