"""Oracle parity at sf0.001 — the same check the driver runs at sf0.01.

Every hash-checked query is compared against its DuckDB oracle:
row count, sorted column names, and an order-insensitive value hash.
This is the primary correctness gate (SURVEY.md §5.2.1).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.queries import all_oracles, all_queries
from pgshovel_spark.sources.tables import TABLES
from tools.selfcheck import canonical

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_hash_parity(spark, oracle_con, name):
    sdf = _QUERIES[name](spark, SF).toPandas()
    odf = oracle_con.sql(_ORACLES[name]).df()
    assert canonical(sdf) == canonical(odf)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(spark, name):
    assert len(_QUERIES[name](spark, SF).toPandas()) >= 0
