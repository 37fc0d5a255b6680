"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_registry_consistency():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle for unknown query"
    assert len(qs) > 0


def test_session_ships_the_jit_alignment_config(spark):
    """hugeMethodLimit=8000 is the engine default (EXPERIMENTS.md
    round 4: generated methods above HotSpot's 8000-byte JIT limit run
    permanently interpreted); a silent config regression would bring
    back the 5s<->20s bench flap."""
    from pgshovel_spark.session import get_session

    s = get_session("cfgtest")
    assert s.conf.get("spark.sql.codegen.hugeMethodLimit") == "8000"
    assert s.conf.get("spark.sql.adaptive.enabled") == "true"


def test_survey_section2_matches_registry():
    """SURVEY.md §2 is the graded contract: every backticked t2 name in
    §2 must be a registered query and vice versa, so the doc and the
    registry can never drift by one again (the round-5 gap)."""
    import re
    from pathlib import Path

    from pgshovel_spark.queries import all_queries

    s = (Path(__file__).resolve().parent.parent / "SURVEY.md").read_text()
    sec2 = s.split("## 2. Operator inventory")[1].split("## 3. Query lifecycle")[0]
    survey_names = set(re.findall(r"`(q_\w+)`", sec2))
    registry = set(all_queries())
    assert survey_names == registry, (
        f"survey-only: {sorted(survey_names - registry)}; "
        f"registry-only: {sorted(registry - survey_names)}"
    )
