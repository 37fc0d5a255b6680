"""Dump .explain("formatted") for named queries to plans/r13/<q>_<tag>.txt.

Usage: python tools/planr13.py <tag> q_name [...]
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.queries import all_artifacts, all_queries  # noqa: E402
from pgshovel_spark.session import get_session  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r13"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_session("planr13")
    qs = all_queries()
    arts = all_artifacts()
    for name in names:
        if name.startswith("artifact:"):
            df = arts[name.split(":", 1)[1]](spark, SF)
        else:
            df = qs[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        safe = name.replace(":", "_")
        (out_dir / f"{safe}_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote {safe}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
