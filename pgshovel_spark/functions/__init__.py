"""Scalar/aggregate function helpers shared by all queries."""

from pgshovel_spark.functions.determinism import (
    DEC,
    dec,
    dround,
    dsum,
    exact_avg,
    epoch_s,
)
from pgshovel_spark.functions.textfns import norm_text, tokens
from pgshovel_spark.functions.vectors import cosine_sim, dot, l2_norm

__all__ = [
    "DEC",
    "dec",
    "dround",
    "dsum",
    "exact_avg",
    "epoch_s",
    "norm_text",
    "tokens",
    "cosine_sim",
    "dot",
    "l2_norm",
]
