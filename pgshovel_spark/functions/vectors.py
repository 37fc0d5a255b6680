"""Vector math over ``array<float>`` embedding columns.

All folds run JVM-side via higher-order functions (``zip_with`` +
``aggregate``) in strict index order, after casting to DOUBLE — this
matches DuckDB's ``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])``
bit-for-bit (SURVEY.md Appendix A.3).  No Python UDF in the hot path;
at 100 TB the same expressions vectorize inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product, folded in index order."""
    prods = F.zip_with(_d(a), _d(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm."""
    sq = F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is zero (no NaN)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)
