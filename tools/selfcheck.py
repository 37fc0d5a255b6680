"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an oracle exists,
the same-named SQL on DuckDB over the same parquet tables; compares
row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, floats kept exact — the goal is
bit-identical doubles, not tolerance comparison).

Usage:
    python tools/selfcheck.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time
import traceback
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.queries import all_oracles, all_queries  # noqa: E402
from pgshovel_spark.session import get_session  # noqa: E402
from pgshovel_spark.sources.tables import TABLES  # noqa: E402


def canonical(df_pandas) -> tuple[int, list[str], str]:
    """(#rows, sorted col names, hash) — column-name-sorted, row-sorted."""
    cols = sorted(df_pandas.columns)
    df = df_pandas[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append(
            "\x1f".join("\\N" if v is None or v != v else repr(v) for v in map(norm_cell, tup))
        )
    rows.sort()
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return len(rows), cols, h


def norm_cell(v):
    """Normalize engine-specific cell types to comparable Python values."""
    import datetime

    import numpy as np

    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat()
    if isinstance(v, np.datetime64):
        return str(v)
    return v


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SELFCHECK_SF", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_session("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs, oracles = all_queries(), all_oracles()
    names = args.names or sorted(qs)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        sn, sc, sh = canonical(sdf)
        on, oc, oh = canonical(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        if ok:
            print(f"PASS  {name}: {sn} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL  {name}: spark=({sn},{sh}) oracle=({on},{oh})")
            if sc != oc:
                print(f"      cols spark={sc}\n      cols oracle={oc}")
            else:
                diff_preview(sdf, odf, sc)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


def diff_preview(sdf, odf, cols, k=4):
    """Print a few differing rows to speed up debugging."""
    s = {r for r in map(tuple, sdf[cols].astype(str).values.tolist())}
    o = {r for r in map(tuple, odf[cols].astype(str).values.tolist())}
    for label, rows in (("spark-only", s - o), ("oracle-only", o - s)):
        for r in list(rows)[:k]:
            print(f"      {label}: {r}")


if __name__ == "__main__":
    raise SystemExit(main())
