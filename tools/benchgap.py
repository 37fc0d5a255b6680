"""In-bench-vs-solo gap diagnosis (round 14, VERDICT item 2).

Replicates bench.py's FULL timed sequence — warm-up, scratch clear,
timed artifact builds, then every registry query in sorted order with
the same between-query housekeeping — but skips the DuckDB pass and
logs, per query: wall seconds, job count, and the size of the
session's CacheManager entry list BEFORE the query ran.

Hypothesis under test: bench.py's ``_drop_stale_blocks`` unpersists
RDD *blocks* but leaves every per-query ``materialize()`` entry
registered in the SQL CacheManager.  Across ~200 queries the entry
list grows into the hundreds; every later query's planning then walks
its whole logical plan against every entry (canonicalized plan
comparison), and any ACCIDENTAL match substitutes an InMemoryRelation
whose blocks were dropped — so the query re-populates a cache it
never asked for inside its timed window.  Queries with big plans and
shared family subtrees (q_sim_jaccard_prefix, q_graph_triangles)
should show the largest in-bench-vs-solo inflation.

``--clearcache`` adds ``spark.catalog.clearCache()`` to the
housekeeping (dropping the ENTRIES, not just the blocks).  Run the
tool twice — with and without — and diff the per-query walls.

Usage: python tools/benchgap.py [--sf DIR] [--clearcache] [--out FILE]
"""

from __future__ import annotations

import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.operators.scratch import clear_scratch  # noqa: E402
from pgshovel_spark.queries import all_artifacts, all_queries  # noqa: E402
from pgshovel_spark.session import get_session  # noqa: E402


def cache_entries(spark) -> int:
    """Number of registered SQL CacheManager entries (driver-side)."""
    try:
        cm = spark._jsparkSession.sharedState().cacheManager()
        return int(cm.cachedData().size())
    except Exception:
        return -1


def gc_ms(spark) -> int:
    """Cumulative JVM GC milliseconds (all collectors)."""
    try:
        beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        total = 0
        it = beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return int(total)
    except Exception:
        return -1


def heap_mb(spark) -> int:
    """Used JVM heap, MB."""
    try:
        mem = spark._jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
        return int(mem.getHeapMemoryUsage().getUsed()) // (1024 * 1024)
    except Exception:
        return -1


def drop_blocks(spark, clearcache: bool) -> None:
    """bench.py's _drop_stale_blocks, optionally + clearCache()."""
    if clearcache:
        # removes CacheManager ENTRIES and their blocks in one call
        spark.catalog.clearCache()
    sc = spark.sparkContext
    jmap = sc._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    ids = []
    while it.hasNext():
        ids.append(it.next().getKey())
    for rid in ids:
        sc._jsc.sc().unpersistRDD(rid, True)
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    clearcache = False
    out = None
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--clearcache":
            clearcache = True
            i += 1
        elif args[i] == "--out":
            out = args[i + 1]
            i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    spark = get_session("benchgap")
    qs = all_queries()
    warm_dir = "/root/testdata/sf0.001"
    for name in sorted(qs):
        qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        drop_blocks(spark, clearcache)
    clear_scratch(spark, sf_dirs=[sf_dir, warm_dir])
    drop_blocks(spark, clearcache)

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    rows: dict[str, dict] = {}

    for name, build in all_artifacts().items():
        drop_blocks(spark, clearcache)
        n_entries = cache_entries(spark)
        label = f"artifact:{name}"
        sc.setJobGroup(label, label)
        t0 = time.time()
        build(spark, sf_dir)
        rows[label] = {
            "sec": round(time.time() - t0, 3),
            "jobs": len(tracker.getJobIdsForGroup(label)),
            "cache_entries_before": n_entries,
        }

    from pgshovel_spark.sources.tables import dim_catalog, load_tables

    load_tables(spark, sf_dir)
    dim_catalog(spark, sf_dir)

    for name in sorted(qs):
        drop_blocks(spark, clearcache)
        n_entries = cache_entries(spark)
        g0 = gc_ms(spark)
        h0 = heap_mb(spark)
        sc.setJobGroup(name, name)
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        rows[name] = {
            "sec": round(time.time() - t0, 3),
            "jobs": len(tracker.getJobIdsForGroup(name)),
            "cache_entries_before": n_entries,
            "gc_ms_in_window": gc_ms(spark) - g0,
            "heap_mb_before": h0,
        }
        print(
            f"{name}: {rows[name]['sec']}s jobs={rows[name]['jobs']} "
            f"cache_entries={n_entries} gc={rows[name]['gc_ms_in_window']}ms "
            f"heap={h0}mb",
            flush=True,
        )
    total = round(sum(r["sec"] for r in rows.values()), 3)
    result = {
        "sf_dir": sf_dir,
        "clearcache": clearcache,
        "total_sec": total,
        "rows": rows,
    }
    if out:
        Path(out).write_text(json.dumps(result, indent=1, sort_keys=True) + "\n")
    print(json.dumps({"total_sec": total, "clearcache": clearcache}))
    spark.stop()


if __name__ == "__main__":
    main()
