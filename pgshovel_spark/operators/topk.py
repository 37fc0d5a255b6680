"""Top-k operators.

``topk_global`` relies on Spark's TakeOrderedAndProject physical
operator: each partition keeps a k-sized heap, only k rows per
partition reach the driver-side merge — no global sort at any scale.

``topk_per_group`` is the window row_number pattern: one shuffle on
the group keys, rank within partition, filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_global(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. ``order`` must be a TOTAL order (unique tiebreak
    chain) for a deterministic result — Appendix A.5."""
    return df.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_name: str = "rn",
) -> DataFrame:
    """Top-k rows per group, rank exposed as ``rank_name`` (BIGINT)."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_name, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_name) <= k)
    )
