"""Determinism helpers for Spark <-> DuckDB hash matching.

Why decimals: the testdata's money columns are exact 2-decimal values
(measured), so per-row products of up to three of them are exact at 6
decimals.  Summing doubles is order-dependent (Spark's partial
aggregation order differs from DuckDB's), which can flip a rounded
2-dp digit near a .005 boundary.  Casting the per-row measure to
DECIMAL(24,6) makes the sum EXACT and order-independent on both
engines; rounding then happens in decimal (half-up on both), and the
final cast back to DOUBLE is exact.  See SURVEY.md Appendix A.

At scale this costs nothing material: decimal aggregation is still
whole-stage-codegen JVM arithmetic with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Wide enough for sum inputs like o_totalprice^2 (~2.5e11) at 6dp.
DEC = "decimal(24,6)"


def dec(c: Column | str) -> Column:
    """Cast a (conceptually <=6-decimal) double column to exact decimal."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def dsum(c: Column | str, nd: int = 2) -> Column:
    """Order-independent SUM: exact decimal sum, round, back to double.

    Oracle SQL equivalent::

        CAST(ROUND(SUM(CAST(x AS DECIMAL(24,6))), nd) AS DOUBLE)
    """
    return F.round(F.sum(dec(c)), nd).cast("double")


def dsum_raw(c: Column | str) -> Column:
    """Exact decimal sum cast to double WITHOUT rounding (for ratios)."""
    return F.sum(dec(c)).cast("double")


def exact_avg(c: Column | str, nd: int = 4) -> Column:
    """Order-independent AVG = exact-decimal sum / count, rounded.

    Oracle SQL equivalent::

        ROUND(CAST(SUM(CAST(x AS DECIMAL(24,6))) AS DOUBLE) / COUNT(x), nd)
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.round(F.sum(dec(c)).cast("double") / F.count(c), nd)


def dround(c: Column, nd: int, in_scale: int = 6) -> Column:
    """Round a per-row double that is conceptually exact at ``in_scale``
    decimals: route through decimal so half-way cases resolve the same
    way on both engines (DuckDB: ``CAST(ROUND(CAST(x AS DECIMAL(24,6)),
    nd) AS DOUBLE)``)."""
    return F.round(c.cast(f"decimal(24,{in_scale})"), nd).cast("double")


def epoch_s(c: Column | str) -> Column:
    """Timestamp -> whole epoch seconds as BIGINT (oracle:
    ``CAST(FLOOR(epoch(ts)) AS BIGINT)``).  ``unix_timestamp`` floors
    sub-second parts, matching FLOOR(epoch) for post-1970 data."""
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_timestamp(c).cast("long")
