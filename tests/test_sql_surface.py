"""Ad-hoc SQL surface (SURVEY.md §3.2 B2): every table registered as a
temp view so users can run arbitrary spark.sql over the catalog."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.sources.tables import TABLES, register_views

SF = "/root/testdata/sf0.001"


def test_register_views_and_query(spark):
    register_views(spark, SF)
    for t in TABLES:
        assert spark.sql(f"SELECT COUNT(*) AS c FROM {t}").collect()[0].c > 0
    # a join through the SQL surface produces the same answer as the
    # DataFrame path
    got = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3
        """
    ).collect()
    assert len(got) == 3 and all(r.n > 0 for r in got)


def test_events_view_has_timestamp_type(spark):
    register_views(spark, SF)
    dtypes = dict(spark.table("events").dtypes)
    assert dtypes["ts"] == "timestamp", "ns->us conversion must apply to the view"
