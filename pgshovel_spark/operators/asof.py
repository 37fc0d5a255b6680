"""As-of join — no native Spark operator; composed from union + window.

Semantics (inner, backward): for each left row, attach the single
right row with the greatest ``order_col`` <= left's ``order_col``
within the same ``on`` keys — DuckDB's ``ASOF JOIN`` with
``right.ts <= left.ts``.

Why union+window instead of join+filter+row_number: a naive
``left.join(right, keys & (r.ts <= l.ts))`` explodes to O(|L|x|R|)
per key before ranking.  The union approach is a single sort per key
partition — O((|L|+|R|) log) work, one shuffle on the keys, and no
intermediate blow-up; at 100 TB this is the difference between a plan
that runs and one that OOMs.  (The same merge-sort idea underlies
as-of implementations in columnar engines generally.)

Tie rule: right rows at the SAME order value as a left row match
(<=), with the last right row in (order_col, tiebreak) order winning;
callers should pre-dedupe right rows per (keys, order_col) if that
ambiguity matters to them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    order_col: str,
    right_tiebreak: str,
    right_value_cols: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join of ``right`` onto ``left``.

    ``right_tiebreak``: a right-side column breaking ties between
    right rows sharing the same order value (greatest wins).  Left
    rows need no tiebreak — each produces its own output row.

    Returns ``left.*`` plus ``right_value_cols`` (NULL-filled rows
    dropped when ``how='inner'``, kept when ``'left'``).
    """
    on = list(on)
    lcols = left.columns
    tie_type = right.schema[right_tiebreak].dataType
    # Right values travel as ONE nullable struct so last(ignorenulls)
    # carries a single right ROW forward — per-column fills could stitch
    # together values from different right rows when some are NULL, and
    # a NULL in the first value column would break the inner filter.
    r_struct = F.struct(*[F.col(c) for c in right_value_cols])
    l_tagged = left.select(
        *on,
        F.col(order_col).alias("__ord"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tie_type).alias("__tie"),
        F.struct(*lcols).alias("__lrow"),
        F.lit(None).cast(
            right.select(r_struct.alias("__rv")).schema["__rv"].dataType
        ).alias("__rv"),
    )
    # Equi-join NULL semantics: a right row with a NULL join key (or a
    # NULL order value) can never match — NULL = NULL is not true in
    # the ASOF JOIN this implements.  Window.partitionBy would
    # otherwise co-locate NULL-key rows of BOTH sides and fabricate
    # matches; filtering the right side alone preserves left rows
    # (they surface unmatched, NULL-filled under how='left').
    r_pred = F.col(order_col).isNotNull()
    for k in on:
        r_pred = r_pred & F.col(k).isNotNull()
    r_tagged = right.filter(r_pred).select(
        *on,
        F.col(order_col).alias("__ord"),
        F.lit(0).alias("__side"),
        F.col(right_tiebreak).alias("__tie"),
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType).alias("__lrow"),
        r_struct.alias("__rv"),
    )
    # Right rows sort BEFORE left rows at equal __ord (side 0 < 1), so
    # an inclusive (<=) match sees same-timestamp right rows; NULL
    # left-side ties sort first within a side (irrelevant to lefts).
    w = (
        Window.partitionBy(*on)
        .orderBy("__ord", "__side", F.col("__tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "__side",
        "__lrow",
        F.last("__rv", ignorenulls=True).over(w).alias("__rv"),
    )
    matched = filled.filter(F.col("__side") == 1)
    if how == "inner":
        matched = matched.filter(F.col("__rv").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return matched.select(
        *[F.col("__lrow").getField(c).alias(c) for c in lcols],
        *[F.col("__rv").getField(c).alias(c) for c in right_value_cols],
    )
