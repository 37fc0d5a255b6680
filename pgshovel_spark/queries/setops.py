"""Set operations (SURVEY.md §2.F).

Operand rows are (user_id, day) pairs — click-days vs purchase-days —
so INTERSECT/EXCEPT are non-trivial at every scale factor (at sf>=0.01
every user has every event TYPE, so user-granularity set ops would
degenerate to all/empty).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgshovel_spark.sources.tables import load_table


def _day_pairs(spark, sf_dir, event_type: str) -> DataFrame:
    """(user_id, epoch-seconds-of-day) rows for one event type."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == event_type).select(
        "user_id",
        F.unix_timestamp(F.date_trunc("day", "ts")).cast("long").alias("day_s"),
    )


_DAY_PAIRS_SQL = """
SELECT user_id, CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s
FROM events WHERE event_type = '{t}'
"""


def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag) — reduced to per-key multiplicities so the
    result hashes deterministically."""
    bag = _day_pairs(spark, sf_dir, "click").unionAll(
        _day_pairs(spark, sf_dir, "purchase")
    )
    return bag.groupBy("user_id", "day_s").agg(F.count(F.lit(1)).alias("n_rows"))


_UNION_ALL_SQL = f"""
SELECT user_id, day_s, COUNT(*) AS n_rows
FROM (
  {_DAY_PAIRS_SQL.format(t="click")}
  UNION ALL
  {_DAY_PAIRS_SQL.format(t="purchase")}
)
GROUP BY user_id, day_s
"""


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT of the same two sides."""
    return (
        _day_pairs(spark, sf_dir, "click")
        .union(_day_pairs(spark, sf_dir, "purchase"))
        .distinct()
    )


_UNION_DISTINCT_SQL = f"""
{_DAY_PAIRS_SQL.format(t="click")}
UNION
{_DAY_PAIRS_SQL.format(t="purchase")}
"""


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): user-days with both a click and a purchase."""
    return _day_pairs(spark, sf_dir, "click").intersect(
        _day_pairs(spark, sf_dir, "purchase")
    )


_INTERSECT_SQL = f"""
{_DAY_PAIRS_SQL.format(t="click")}
INTERSECT
{_DAY_PAIRS_SQL.format(t="purchase")}
"""


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): user-days that clicked but never purchased."""
    return _day_pairs(spark, sf_dir, "click").subtract(
        _day_pairs(spark, sf_dir, "purchase")
    )


_EXCEPT_SQL = f"""
{_DAY_PAIRS_SQL.format(t="click")}
EXCEPT
{_DAY_PAIRS_SQL.format(t="purchase")}
"""


QUERIES = {
    "q_union_all": q_union_all,
    "q_union_distinct": q_union_distinct,
    "q_intersect": q_intersect,
    "q_except": q_except,
}

ORACLES = {
    "q_union_all": _UNION_ALL_SQL,
    "q_union_distinct": _UNION_DISTINCT_SQL,
    "q_intersect": _INTERSECT_SQL,
    "q_except": _EXCEPT_SQL,
}
