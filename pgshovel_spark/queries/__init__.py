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
    curation,
    decision,
    events,
    exprs,
    joins,
    llm,
    pipeline,
    scans,
    setops,
    similarity,
    sketches,
    text,
    training,
    windows,
)

# Registration order drives the external correctness harness, which checks
# queries in this order (and may cap the number checked per run, ~50).
# Round-3 priority: every query that has never had a driver correctness
# row sits inside a 50-entry cap: (1) the pipeline/curation batch
# (registered past the round-2 window), (2) the round-3 sketch/pruning
# batch, (3) the new decision-support subquery, event-analytics, and
# prefix-filtered-join queries, (4) aggregates — carrying the round-2
# rewrites of q_agg_quantiles / q_profile_table plus the new
# q_agg_salted — and joins, led by the rewritten q_join_asof and the
# new q_join_multiway.  Position math: pipeline(1) + curation(11) +
# sketches(5) = 17, decision 18-25, events 26-28,
# q_sim_jaccard_prefix 29 (hoisted via _PRIORITY out of the similarity
# module), aggregates 30-45 (quantiles 38, profile 39), q_join_asof 46,
# q_join_multiway 47, stable joins to 50.  Long-stable r2-green
# families (similarity, text, llm, training, cdc, windows) and the
# r1-green scans/exprs/setops tails absorb any truncation; they remain
# covered by the local selfcheck hash gate + hypothesis property tests.
_MODULES = (
    pipeline,
    curation,
    sketches,
    decision,
    events,
    aggregates,
    joins,
    similarity,
    text,
    llm,
    training,
    cdc,
    windows,
    scans,
    exprs,
    setops,
)

#: Names pulled to the front of registration order right after their
#: preceding module's block, regardless of which module defines them.
#: Inserted between the `events` and `aggregates` blocks.
_PRIORITY_AFTER_EVENTS = ("q_sim_jaccard_prefix", "q_text_entropy", "q_text_unigram_ppl")

QueryFn = Callable[[SparkSession, str], DataFrame]


def _ordered(attr: str) -> dict:
    merged: dict = {}
    for mod in _MODULES:
        entries = getattr(mod, attr)
        overlap = merged.keys() & entries.keys()
        if overlap:
            raise ValueError(f"duplicate query names {overlap} in {mod.__name__}")
        merged.update(entries)
    out: dict = {}
    for mod in _MODULES:
        out.update({k: merged[k] for k in getattr(mod, attr)})
        if mod is events:
            out.update(
                {k: merged[k] for k in _PRIORITY_AFTER_EVENTS if k in merged}
            )
    return out


def all_queries() -> dict[str, QueryFn]:
    return _ordered("QUERIES")


def all_oracles() -> dict[str, str]:
    return _ordered("ORACLES")
