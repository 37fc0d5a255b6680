"""Physical-plan assertions (SURVEY.md §5.2.4).

Correctness says the answer is right; these say the PLAN is right —
the properties that decide whether the same query survives a 100x
scale-up: predicate pushdown, column pruning, broadcast joins,
partial aggregation, whole-stage codegen, top-k without global sort.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    import contextlib
    import io

    df = all_queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown(spark):
    plan = _plan(spark, "q_filter_pred")
    assert "PushedFilters: [" in plan
    # at least the IN and IsNotNull filters reach the parquet scan
    assert "l_returnflag" in plan.split("PushedFilters")[1][:400]


def test_column_pruning(spark):
    plan = _plan(spark, "q_scan_project")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the 4 referenced columns are read, not all 11
    assert "l_orderkey" in read_schema and "l_returnflag" not in read_schema


def test_broadcast_join(spark):
    plan = _plan(spark, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan


def test_star_join_broadcasts_dims(spark):
    """AQE/CBO should broadcast the small dims in the star join rather
    than shuffling lineitem against nation/region."""
    plan = _plan(spark, "q_join_star")
    assert "BroadcastHashJoin" in plan


def test_partial_aggregation(spark):
    """Flagship agg must plan map-side partial aggregation (two
    HashAggregate phases) so the shuffle carries groups, not rows."""
    plan = _plan(spark, "q_agg_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_topk_no_global_sort(spark):
    plan = _plan(spark, "q_topk_global")
    assert "TakeOrderedAndProject" in plan


def test_wholestage_codegen_flagship(spark):
    import contextlib
    import io

    df = all_queries()["q_agg_pricing_summary"](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")  # formatted+AQE hides codegen pre-execution
    assert "WholeStageCodegen" in buf.getvalue()


def test_no_cartesian_in_range_join(spark):
    """The range self-join must keep its equi-prefix (user_id) as the
    join key — a cartesian product would be quadratic at scale."""
    plan = _plan(spark, "q_join_range")
    assert "CartesianProduct" not in plan


def test_asof_join_is_single_shuffle_window(spark):
    """The as-of composition must be window-based (sort within key
    partitions), not a join blow-up."""
    plan = _plan(spark, "q_join_asof")
    assert "Window" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ntile_rank_reuses_range_exchange(spark):
    """The two-pass global rank computes the range shuffle ONCE — not
    via AQE exchange reuse (which misses the re-aliased self-reference)
    but via the round-10 materialize: both the counts branch and the
    output join must read the ranged stream from the cache
    (InMemoryTableScan), which also pins ONE set of sampled range
    boundaries — the correctness invariant (operators/rank.py).  And
    no partition-spec-free Window anywhere."""
    df = all_queries()["q_win_ntile"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2, plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__gr_pid" in line, line


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key into the same bucket count
    join with NO Exchange on either side (co-located sort-merge join)."""
    from pyspark.sql import functions as F

    from pgshovel_spark.sources.formats import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        write_bucketed(a, "bkt_a", ["k"], 8, sort_cols=["k"])
        write_bucketed(b, "bkt_b", ["k"], 8, sort_cols=["k"])
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 10000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_embed_quantize_no_shuffle(spark):
    """int8 quantization is pure per-row expression work — the plan
    must contain NO Exchange of any kind (scan -> project only)."""
    plan = _plan(spark, "q_embed_quantize")
    assert "Exchange" not in plan
    assert "Scan parquet" in plan


def test_simhash_pairs_banded_join(spark):
    """Candidate generation must be a bucket equi-join on the band
    columns — never a cartesian/broadcast-nested-loop product."""
    plan = _plan(spark, "q_simhash_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_incremental_fingerprint_join(spark):
    """The round-8 one-pass form: BOTH lookup tables fold into window
    aggregates over a single hash-partitioned fingerprint shuffle — no
    joins at all, ONE documents scan, and the shuffle keys on the
    8-byte hash (never raw document text)."""
    plan = _plan(spark, "q_dedup_incremental")
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # window-only formulation
    # formatted output names each physical node once in the tree and
    # once in the detail section -> one scan node == two mentions
    import re as _re

    assert len(_re.findall(r"\(\d+\) Scan parquet", plan)) == 1  # one corpus scan
    # the exchange keys on the fingerprint hash column, not text
    # (formatted output puts the partitioning on an Arguments: line)
    exchanges = [ln for ln in plan.splitlines() if "hashpartitioning(" in ln]
    assert exchanges and all("text" not in ln for ln in exchanges)


def test_multiway_join_broadcasts_filtered_dim(spark):
    """Q3 shape: the BUILDING-filtered customer dim must broadcast
    (never shuffle lineitem against it), and both date predicates must
    reach the parquet scans."""
    plan = _plan(spark, "q_join_multiway")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    pushed = plan.split("PushedFilters")
    assert any("o_orderdate" in seg[:300] or "l_shipdate" in seg[:300] for seg in pushed[1:])


def test_bloom_prune_probe_side_never_shuffles(spark):
    """The filter state is ONE broadcast row (the 64-word bitmask map)
    cross-joined onto the probe side, plus one broadcast membership
    join for the exact audit; customer must never be exchanged before
    its aggregate (the whole point of the runtime-filter shape)."""
    plan = _plan(spark, "q_bloom_prune")
    assert "BroadcastNestedLoopJoin" in plan  # single-row mask attach
    assert plan.count("BroadcastHashJoin") >= 1  # exact audit join
    assert "CartesianProduct" not in plan
    # no exchange below the probe-side partial aggregate: the only
    # hash exchanges are the mask/audit builds and the final nationkey
    # aggregate, never customer itself
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "c_custkey" not in ln


def test_gap_islands_single_user_shuffle(spark):
    """Both windows partition by (user_id[, event_type]) — Spark must
    plan ONE hash exchange on user_id and satisfy the second window
    from the same distribution (superset keys sort, no re-exchange)."""
    plan = _plan(spark, "q_gap_islands")
    hash_exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(hash_exchanges) <= 2  # user window + final spectrum agg


def test_salted_agg_two_hash_aggregates(spark):
    """Salted plan must keep BOTH phases as hash aggregates with
    map-side combine (4 HashAggregate nodes: partial+final x 2)."""
    plan = _plan(spark, "q_agg_salted")
    assert plan.count("HashAggregate") >= 4


def test_partition_pruning_on_warehouse_layout(spark):
    """The date-partitioned warehouse claim, demonstrated: reading the
    hive-partitioned lineitem artifact with a ship_month IN-list must
    (1) carry the months in PartitionFilters, (2) plan the scan over
    EXACTLY the 3 matching directories of the ~84 on disk, and
    (3) read only those files.  This is the planning-time pruning a
    100 TB fact table lives on — filters never touching 81/84ths of
    the data."""
    from pgshovel_spark.queries import warehouse

    # force the artifact (and its ~84 month dirs) to exist
    art = warehouse._lineitem_by_month(spark, SF)
    n_months = art.select("ship_month").distinct().count()
    assert n_months > 20  # multi-year fixture -> real pruning ratio

    df = all_queries()["q_scan_partition_pruned"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:300]
    assert "ship_month" in pf
    # and the answer matches the unpartitioned scan exactly
    from pgshovel_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, SF, "lineitem")
    expect = (
        li.filter(
            F.date_format("l_shipdate", "yyyy-MM").isin(*warehouse._MONTHS)
        )
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .count()
        .collect()
    )
    got = {r.ship_month: r.n_items for r in df.collect()}
    assert got == {r.ship_month: r["count"] for r in expect}


def test_dynamic_partition_pruning_from_join(spark):
    """Runtime pruning, not just static: when the month filter lives
    on a JOINED dimension instead of the fact scan, Spark must inject
    a dynamicpruningexpression into the partitioned scan's
    PartitionFilters (DPP via the broadcast side) — the star-join
    pruning a 100 TB fact table depends on when the predicate isn't
    known until runtime."""
    from pyspark.sql import functions as F

    from pgshovel_spark.queries import warehouse

    li = warehouse._lineitem_by_month(spark, SF)
    dim = spark.createDataFrame(
        [("1997-01", 1), ("1997-02", 1), ("1996-05", 0)], "m string, flag int"
    )
    q = (
        li.join(dim.filter(F.col("flag") == 1), li.ship_month == F.col("m"))
        .groupBy("ship_month")
        .count()
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1][:300]
    assert "dynamicpruningexpression" in pf
    got = {r.ship_month for r in q.collect()}
    assert got == {"1997-01", "1997-02"}


def test_dpp_registered_query_prunes_at_runtime(spark):
    """q_scan_dpp (the REGISTERED warehouse query, oracle-checked by
    the driver) must inject dynamicpruningexpression into the
    partitioned fact scan: its month window comes from the orders
    dim at runtime, and the broadcast feeding the join doubles as the
    pruning subquery (SubqueryAdaptiveBroadcast — no second dim
    scan).  Executing it must touch only the dim's months."""
    df = all_queries()["q_scan_dpp"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1][:300]
    assert "dynamicpruningexpression" in pf
    assert "SubqueryAdaptiveBroadcast" in plan or "SubqueryBroadcast" in plan
    months = {r.ship_month for r in df.collect()}
    # H1-1997 order months exactly (URGENT orders exist every month
    # at every fixture scale)
    assert months == {f"1997-0{i}" for i in range(1, 7)}


def test_partition_pruning_never_touches_unselected_dirs(spark, tmp_path):
    """Behavioral proof that pruning happens BEFORE any file is read:
    corrupt every non-selected month's part-files in a throwaway
    partitioned copy — the month-filtered scan still answers (those
    directories are pruned at planning time), while the unfiltered
    scan, which must open them, fails."""
    from pyspark.sql import functions as F

    from pgshovel_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem").limit(2000)
    root = tmp_path / "li_by_month"
    (
        li.withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("ship_month")
        .parquet(str(root))
    )
    # capture the schema while the files are intact: a real warehouse
    # table has a catalog schema, so the scan never has to open
    # footers for inference
    schema = spark.read.parquet(str(root)).schema
    keep = {"1997-01", "1997-02", "1997-03"}
    corrupted = 0
    for d in root.iterdir():
        if d.is_dir() and d.name.split("=")[-1] not in keep:
            for part in d.glob("*.parquet"):
                part.write_bytes(b"not a parquet file")
                corrupted += 1
    assert corrupted > 5

    pruned = (
        spark.read.schema(schema).parquet(str(root))
        .filter(F.col("ship_month").isin(*sorted(keep)))
        .groupBy("ship_month")
        .count()
    )
    rows = pruned.collect()  # succeeds: corrupt dirs never opened
    assert {r.ship_month for r in rows} <= keep and rows

    import pytest as _pytest

    with _pytest.raises(Exception):
        (
            spark.read.schema(schema)
            .parquet(str(root))
            .groupBy("ship_month")
            .count()
            .collect()
        )


def test_registry_wide_plan_lint(spark):
    """No registered query's physical plan may contain a scale
    anti-pattern: CartesianProduct (non-broadcast cross join),
    BatchEvalPython (row-at-a-time Python UDF), a non-vectorized
    parquet scan, or a defeated-column-pruning wide read (a FileScan
    covering >=75% of a >=6-column table outside the reviewed
    allowlist — at 100 TB the scan is the query cost).  Analyzes plans
    only — nothing executes — so a new query that regresses onto the
    slow path fails CI immediately."""
    from tools.plan_lint import lint_all

    violations = lint_all(spark)
    assert violations == {}


def test_registered_bucketed_join_no_exchange(spark):
    """q_join_bucketed's join must be shuffle-free AND sort-free when
    broadcasts are disabled: both sides arrive bucket-clustered and
    bucket-sorted on the join key."""
    from pgshovel_spark.queries.warehouse import _bucketed_pair

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cust, orders = _bucketed_pair(spark, SF)
        c = spark.table(cust)
        o = spark.table(orders)
        joined = c.join(o, c.c_custkey == o.o_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_weighted_sample_no_shuffle(spark):
    """A-ES sampling must stay a map + TakeOrdered: row-local priority
    arithmetic, per-partition top-k merge — no Exchange, no Window,
    no nondeterministic expression."""
    plan = _plan(spark, "q_sample_weighted")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "rand" not in plan.lower()


def test_waiting_orders_no_self_join(spark):
    """Q21's double correlation must fold into per-order aggregation:
    lineitem is scanned ONCE (no semi/anti self-join probes)."""
    plan = _plan(spark, "q_waiting_orders")
    # ") Scan parquet" = one details-section header per physical scan:
    # exactly lineitem + orders + supplier
    assert plan.count(") Scan parquet") <= 3
    assert "LeftSemi" not in plan and "LeftAnti" not in plan


def test_profile_table_single_scan(spark):
    """The column profile must ride ONE lineitem scan: a single
    aggregate carrying every COUNT(DISTINCT) via Expand — not a
    crossJoin stack of per-column subtree scans."""
    plan = _plan(spark, "q_profile_table")
    assert plan.count(") Scan parquet") == 1
    assert "Expand" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_single_declarative_plan(spark):
    """PageRank's 3 iterations are ONE plan: no cartesian beyond the
    1-row n broadcast, and the adjacency table is persisted
    (InMemoryTableScan) so iterations re-read cache, not parquet."""
    plan = _plan(spark, "q_graph_pagerank")
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan


def test_dedup_chunks_hashed_join(spark):
    """Chunk dedup must join on the 8-byte xxhash64 key (fixed-width
    shuffle rows), never on chunk strings."""
    plan = _plan(spark, "q_dedup_chunks")
    assert "xxhash64" in plan


def test_cbo_join_reorder_with_table_stats(spark, tmp_path):
    """Cost-based join reordering — the Catalyst lever a 100 TB
    deployment buys with ANALYZE TABLE.  Without stats, the optimizer
    keeps the user's join order (fact JOIN orders first: a fact-sized
    intermediate); with row/column stats and CBO on, it reorders to
    join the selectively-filtered customer dimension into orders FIRST,
    so the fact table joins against an already-reduced right side.
    Pinned on the optimized logical plan (broadcasts disabled so order
    is the only lever); catalog tables land in the /tmp warehouse."""
    import shutil

    from pgshovel_spark.sources.tables import load_table

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("w_lineitem", "w_orders", "w_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # an orphaned location (killed prior session) blocks managed-
        # table creation even after DROP
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    load_table(spark, SF, "lineitem").write.mode("overwrite").saveAsTable(
        "w_lineitem"
    )
    load_table(spark, SF, "orders").write.mode("overwrite").saveAsTable(
        "w_orders"
    )
    load_table(spark, SF, "customer").write.mode("overwrite").saveAsTable(
        "w_customer"
    )
    q = """
        SELECT c.c_mktsegment, SUM(l.l_extendedprice) AS rev
        FROM w_lineitem l
        JOIN w_orders o ON l.l_orderkey = o.o_orderkey
        JOIN w_customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY c.c_mktsegment
    """

    def inner_join_tables(plan: str) -> set[str]:
        """Tables under the INNERMOST join = whichever pair the
        optimizer decided to join first.  Walks the indented tree:
        the innermost join's subtree is the run of lines strictly
        deeper-indented than the join line itself."""
        import re as _re

        lines = plan.splitlines()

        def indent(ln: str) -> int:
            return len(ln) - len(ln.lstrip(" :+-"))

        join_idxs = [i for i, ln in enumerate(lines) if "Join Inner" in ln]
        innermost = max(join_idxs, key=lambda i: indent(lines[i]))
        d = indent(lines[innermost])
        sub = []
        for ln in lines[innermost + 1 :]:
            if ln.strip() and indent(ln) <= d:
                break
            sub.append(ln)
        return set(_re.findall(r"default\.(w_\w+)", "\n".join(sub)))

    conf = spark.conf
    old = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.cbo.joinReorder.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.cbo.enabled", "true")
        conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        before = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
        assert inner_join_tables(before) == {"w_lineitem", "w_orders"}

        for t in ("w_lineitem", "w_orders", "w_customer"):
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
        after = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
        assert inner_join_tables(after) == {"w_orders", "w_customer"}
        # stats actually landed: rowCount visible on the catalog table
        st = (
            spark.table("w_orders")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .toString()
        )
        assert "rowCount" in st
        # and the reordered plan computes the same answer
        got = {tuple(r) for r in spark.sql(q).collect()}
        assert len(got) == 1
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
        for t in ("w_lineitem", "w_orders", "w_customer"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_timestamp_stats_enable_rowgroup_skipping(spark, tmp_path):
    """Parquet row-group skipping on timestamp filters — the data-
    skipping lever a 100 TB fact table buys by clustering on its
    filter column.  Two preconditions, both pinned here: (1) the
    session writes timestamps as TIMESTAMP_MICROS (Spark's legacy
    INT96 default writes NO column statistics, so NOTHING skips —
    found live this round on our own warehouse writes); (2) the
    layout is sorted/clustered on the filter column so row-group
    min/max ranges are disjoint.  Observable: the scan node's
    numOutputRows (rows DECODED after group skipping, before the
    exact Filter) collapses on the sorted layout."""
    from pyspark.sql import functions as F

    from pgshovel_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem")
    paths = {
        "unsorted": str(tmp_path / "skip_unsorted"),
        "sorted": str(tmp_path / "skip_sorted"),
    }
    li.coalesce(1).write.option("parquet.block.size", 32768).parquet(
        paths["unsorted"]
    )
    li.sort("l_shipdate").coalesce(1).write.option(
        "parquet.block.size", 32768
    ).parquet(paths["sorted"])

    # precondition: stats exist on the timestamp column at all
    import glob as _glob

    import pyarrow.parquet as _pq

    f0 = _pq.ParquetFile(_glob.glob(paths["sorted"] + "/*.parquet")[0])
    md = f0.metadata.row_group(0)
    ship = next(
        md.column(i)
        for i in range(md.num_columns)
        if "l_shipdate" in md.column(i).path_in_schema
    )
    assert ship.physical_type != "INT96"
    assert ship.statistics is not None
    assert f0.metadata.num_row_groups > 3  # enough groups to skip

    def decoded_rows(path):
        df = spark.read.parquet(path).filter(
            (F.col("l_shipdate") >= "1997-03-01")
            & (F.col("l_shipdate") < "1997-06-01")
        )
        rows = df.collect()
        out = []

        def walk(node):
            if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
                walk(node.executedPlan())
                return
            m = node.metrics().iterator()
            while m.hasNext():
                kv = m.next()
                if kv._1() == "numOutputRows" and "Scan" in node.nodeName():
                    out.append(kv._2().value())
            ch = node.children().iterator()
            while ch.hasNext():
                walk(ch.next())

        walk(df._jdf.queryExecution().executedPlan())
        return len(rows), sum(out)

    n_u, dec_u = decoded_rows(paths["unsorted"])
    n_s, dec_s = decoded_rows(paths["sorted"])
    assert n_u == n_s and n_u > 0  # same answer
    # the sorted layout decodes a small fraction of the table
    assert dec_s < 0.5 * dec_u, (dec_s, dec_u)


def test_no_duplicate_scan_work_on_swept_queries(spark):
    """Regression guard for the round-8 self-reference sweep: none of
    the fixed queries may again plan IDENTICAL scan work (same
    PushedFilters + ReadSchema on the same location) more than once —
    the DeduplicateRelations + AQE-stage-dedup miss that hid a second
    corpus pass (tools/selfref_audit.py)."""
    from tools.selfref_audit import scan_sets

    fixed = [
        "q_dedup_incremental",
        "q_dedup_chunks",
        "q_agg_mad_outliers",
        "q_drift_psi",
        "q_pipeline_curate",
        "q_important_stock",
        "q_sim_ann_ivf",
        "q_text_tfidf",
        "q_skyline",
    ]
    qs = all_queries()
    for name in fixed:
        df = qs[name](spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        waste = {
            loc: (n_ids, n_work)
            for loc, (n_ids, n_work) in scan_sets(plan).items()
            if n_ids > n_work
        }
        assert not waste, f"{name} re-plans identical scan work: {waste}"
