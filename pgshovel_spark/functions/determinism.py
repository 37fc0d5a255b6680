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

from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Wide enough for sum inputs like o_totalprice^2 (~2.5e11) at 6dp.
DEC = "decimal(24,6)"


def dec(c: Column | str) -> Column:
    """Cast a (conceptually <=6-decimal) double column to exact decimal."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def exact_sum(c: Column | str) -> Column:
    """Exact order-independent SUM via a SPLIT LONG ACCUMULATOR.

    ``SUM(DECIMAL(24,6))`` needs a >18-digit aggregation buffer, which
    kicks Spark's hash aggregate off the Tungsten fixed-width fast path
    onto boxed java BigDecimal adds (~4x slower per update, measured).
    Instead the exact per-row decimal is split into
    ``floor(v)`` (long) and ``(v - floor(v)) * 1e6`` (long micro-units,
    in [0, 1e6)); each half sums in a plain LONG buffer inside
    whole-stage codegen, and the halves recombine EXACTLY in decimal on
    the (tiny) aggregated result:

        sum = SUM(int_part) + SUM(frac_micro) / 1e6

    Null rows drop from both halves together, so SUM-over-empty stays
    NULL.  Overflow bounds (int64): |Σ floor(v)| < 9.2e18 — for
    money-scale inputs (|v| ≤ 1e6) that is ~1e13 rows per group, far
    past 100 TB — and row count per group < 9.2e12 for the micro half.
    For wider magnitudes (e.g. squared measures in q_agg_stats) use
    ``dsum``/``dec`` which trade speed for a 38-digit buffer.

    Value identical to ``SUM(CAST(x AS DECIMAL(24,6)))`` — same oracle
    SQL as ``dsum``.
    """
    c = F.col(c) if isinstance(c, str) else c
    # Pure double/long per-row math (whole-stage codegen, no boxed
    # decimal until the final tiny recombination).  floor() on double is
    # exact below 2^53; the frac half rounds (x - floor(x)) * 1e6 HALF_UP
    # to a long — exact because a ≤6-dp value times 1e6 is ≥ 0.5 away
    # from the next integer while the accumulated double error is < 1e-4.
    # If x sits an ulp below an integer, frac rounds to exactly 1e6 and
    # the recombination absorbs it as a carry — still exact.
    #
    # HALF_UP is spelled `cast(x*1e6 + 0.5 as long)` (truncation toward
    # zero == floor on the nonnegative frac), NOT F.round: Spark's
    # Round on DoubleType routes every row through a boxed BigDecimal —
    # measured 3x slower end-to-end on the flagship aggregate at sf0.1
    # (0.95s -> 0.33s) with bit-identical sums (0 differing rows across
    # all fixture measures; the two forms only diverge on an exact
    # binary x.5, which a ≤6-dp input cannot produce).
    ip = F.floor(c).cast("long")
    fp = ((c - F.floor(c)) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    micro = F.lit(Decimal("0.000001")).cast("decimal(6,6)")
    return F.sum(ip).cast("decimal(38,6)") + (
        F.sum(fp).cast("decimal(20,0)") * micro
    )


def dsum(c: Column | str, nd: int = 2, *, wide: bool = False) -> Column:
    """Order-independent SUM: exact decimal sum, round, back to double.

    Oracle SQL equivalent::

        CAST(ROUND(SUM(CAST(x AS DECIMAL(24,6))), nd) AS DOUBLE)

    Default path is the split-long ``exact_sum`` (Tungsten fast path).
    CONTRACT: inputs must be conceptually ≤6-decimal values with
    |v| ≲ 1e9 (the fixture's money columns; beyond that the micro-
    rounding margin erodes).  For wider magnitudes — squared measures,
    micro-denominated counters — pass ``wide=True`` to use the 38-digit
    boxed-decimal buffer, which is slower but unconditional.
    """
    s = F.sum(dec(c)) if wide else exact_sum(c)
    return F.round(s, nd).cast("double")


def dsum_raw(c: Column | str, *, wide: bool = False) -> Column:
    """Exact decimal sum cast to double WITHOUT rounding (for ratios)."""
    s = F.sum(dec(c)) if wide else exact_sum(c)
    return s.cast("double")


def exact_avg(c: Column | str, nd: int = 4) -> Column:
    """Order-independent AVG = exact-decimal sum / count, rounded.

    Oracle SQL equivalent::

        ROUND(CAST(SUM(CAST(x AS DECIMAL(24,6))) AS DOUBLE) / COUNT(x), nd)
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.round(exact_sum(c).cast("double") / F.count(c), nd)


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


def iratio(num: Column | str, den: Column | str, nd: int = 4) -> Column:
    """``round(num/den, nd)`` for NON-NEGATIVE INTEGER columns computed
    in exact integer arithmetic, returned as double.

    ``F.round(num/den, nd)`` on the double quotient is engine-divergent
    when the true ratio's decimal expansion lands exactly on a
    ``5·10^-(nd+1)`` boundary (the quotient double is inexact there;
    Spark rounds its SHORTEST decimal repr via BigDecimal while DuckDB
    rounds the ``x·10^nd`` product — they can land on opposite sides).
    Integer half-up rounding has no such boundary ambiguity::

        q = (num·10^nd·2 + den) div (den·2)      -- exact half-up
        result = q / 10^nd                        -- same IEEE op both

    Oracle SQL equivalent (DuckDB ``//`` floors = ``div`` truncates for
    the non-negative inputs this contract requires)::

        CAST((num*2*POW + den) // (den*2) AS DOUBLE) / POW

    VALIDITY CONTRACT (callers must guarantee; violations silently
    degrade, they don't raise):

    * ``den >= 1``.  den = 0 divides by zero — Spark's pmod/div return
      NULL while DuckDB ``//`` errors, so the engines don't even agree
      on the failure mode.  Every current caller divides by a count
      that its own filter/grouping makes >= 1.
    * ``num < 2^53 / (2·10^nd)`` (for nd=4: ~4.5e8) — beyond it the
      exactness proof breaks in two stages: ``num·2·10^nd`` above 2^53
      makes the final double division inexact (wrong last digit
      possible), and above 2^63 the long multiply wraps.  Counts and
      token sums at the fixture scales sit far below the bound; a
      caller aggregating e.g. microsecond sums at 100 TB must pre-scale
      the ratio (divide both sides by a common unit) or use decimal
      division (``dround`` on an exact decimal quotient) instead.
    """
    num = F.col(num) if isinstance(num, str) else num
    den = F.col(den) if isinstance(den, str) else den
    scale = 10 ** nd
    a = num.cast("long") * (2 * scale) + den.cast("long")
    b = den.cast("long") * 2
    # exact integer division: (a - a mod b) is divisible by b, and the
    # double division of two exactly-divisible longs < 2^53 is exact
    half_up = ((a - F.pmod(a, b)) / b).cast("long")
    return half_up.cast("double") / F.lit(float(scale))


def iratio_sql(num: str, den: str, nd: int = 4) -> str:
    """The DuckDB rendering of :func:`iratio` (same half-up integer
    arithmetic; use identical aliases both sides)."""
    scale = 10 ** nd
    return (
        f"CAST(({num} * {2 * scale} + {den}) // ({den} * 2) AS DOUBLE)"
        f" / {scale}.0"
    )


#: Knuth multiplicative hash constant (2^32 * phi) — THE deterministic
#: sampling hash every membership/bucket decision in the repo uses.
KNUTH = 2654435761


def knuth_bucket(col: Column | str, mod: int) -> Column:
    """Deterministic bucket in [0, mod) from a non-negative integer id:
    ``((id % 2^31) * KNUTH) % 2^32 % mod``.  The % 2^31 pre-reduction
    is load-bearing (an unreduced multiply wraps BIGINT); this is the
    ONE definition the sampling family shares — previously five inline
    copies that an edit could desynchronize."""
    col = F.col(col) if isinstance(col, str) else col
    return ((col % F.lit(2**31)) * F.lit(KNUTH)) % F.lit(2**32) % F.lit(mod)


def knuth_bucket_sql(expr: str, mod: int) -> str:
    """The DuckDB rendering of :func:`knuth_bucket` (identical BIGINT
    arithmetic)."""
    return f"(({expr} % 2147483648) * {KNUTH}) % 4294967296 % {mod}"
