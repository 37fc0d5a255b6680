"""Property-based tests (hypothesis) for composed operators.

The asof_join is checked against a brute-force per-row reference on
random inputs — the union+window composition must equal the O(LxR)
definition for every generated case (tie-heavy inputs included).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pgshovel_spark.operators.asof import asof_join
from pgshovel_spark.operators.skew import salted_agg

BASE = dt.datetime(2024, 1, 1)

# small key/time domains on purpose: forces collisions and ties
keys = st.integers(min_value=0, max_value=2)
times = st.integers(min_value=0, max_value=10)

left_rows = st.lists(
    st.tuples(keys, times), min_size=0, max_size=8, unique=True
)
right_rows = st.lists(
    st.tuples(keys, times), min_size=0, max_size=8, unique=True
)


def brute_force_asof(left, right):
    """Reference semantics: greatest right (ord, tiebreak) <= left ord
    within the key; inner."""
    out = {}
    for i, (lk, lt) in enumerate(left):
        cands = [(rt, rid) for rid, (rk, rt) in enumerate(right) if rk == lk and rt <= lt]
        if cands:
            out[i] = max(cands)[1]
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=left_rows, right=right_rows)
def test_asof_matches_brute_force(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(left)] or
        [(0, -99, BASE)],  # placeholder avoids empty-frame schema issues
        "lid long, k long, ts timestamp",
    )
    if not left:
        ldf = ldf.filter(F.lit(False))
    rdf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(right)] or
        [(0, -99, BASE)],
        "rid long, k long, ts timestamp",
    )
    if not right:
        rdf = rdf.filter(F.lit(False))
    got = {
        r.lid: r.rid
        for r in asof_join(
            ldf, rdf, on=["k"], order_col="ts", right_tiebreak="rid",
            right_value_cols=["rid"], how="inner",
        ).collect()
    }
    want = brute_force_asof(left, right)
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    )
)
def test_salted_agg_equals_plain_agg(spark, rows):
    df = spark.createDataFrame(rows, "k long, v long")
    plain = {
        (r.k): (r.n, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": ("sum", F.count(F.lit(1))),
                "total": ("sum", F.sum("v")),
                "mx": ("max", F.max("v")),
            },
            n_salts=4,
        ).collect()
    }
    assert plain == salted


# ---------------------------------------------------------------- exact_sum

money = st.one_of(
    st.none(),
    st.integers(min_value=-10**8, max_value=10**8).map(lambda c: c / 100.0),
    st.integers(min_value=-10**12, max_value=10**12).map(lambda m: m / 1_000_000.0),
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.tuples(st.integers(0, 2), money), min_size=0, max_size=30))
def test_exact_sum_equals_decimal_sum(spark, vals):
    """Split-long exact_sum == boxed SUM(CAST(x AS DECIMAL(24,6))) for
    money-scale values incl. negatives, NULLs, and 6-dp fractions."""
    from pgshovel_spark.functions.determinism import dec, exact_sum

    df = spark.createDataFrame(vals or [(0, None)], "k int, v double")
    a = {
        r.k: r.s
        for r in df.groupBy("k").agg(F.sum(dec("v")).alias("s")).collect()
    }
    b = {r.k: r.s for r in df.groupBy("k").agg(exact_sum("v").alias("s")).collect()}
    assert a == b


# ------------------------------------------------------------- global_ntile

@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_rows=st.integers(min_value=0, max_value=60),
    n_buckets=st.integers(min_value=1, max_value=7),
    n_parts=st.integers(min_value=1, max_value=5),
)
def test_global_ntile_matches_native_property(spark, n_rows, n_buckets, n_parts):
    from pyspark.sql import Window

    from pgshovel_spark.operators.rank import global_ntile

    if n_rows == 0:
        return
    df = spark.range(n_rows).select(
        F.col("id"), ((F.col("id") * 131) % 97).alias("v")
    )
    got = global_ntile(
        df, order=[F.col("v").asc(), F.col("id").asc()], n_buckets=n_buckets,
        bucket_col="b", num_partitions=n_parts,
    )
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = df.select("id", F.ntile(n_buckets).over(w).cast("long").alias("b"))
    assert sorted((r.id, r.b) for r in got.select("id", "b").collect()) == sorted(
        (r.id, r.b) for r in want.collect()
    )


# ---------------------------------------------------- connected_components

def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_nodes=st.integers(min_value=1, max_value=12),
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)), min_size=0, max_size=20
    ),
)
def test_connected_components_matches_union_find(spark, n_nodes, edges):
    from pgshovel_spark.operators.graph import connected_components

    edges = [(a, b) for a, b in edges if a < n_nodes and b < n_nodes and a != b]
    nodes_df = spark.createDataFrame([(i,) for i in range(n_nodes)], "node long")
    edges_df = spark.createDataFrame(edges, "src long, dst long") if edges else (
        spark.createDataFrame([], "src long, dst long")
    )
    got = {r.node: r.component for r in connected_components(nodes_df, edges_df).collect()}
    assert got == _uf_components(n_nodes, edges)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_nodes=st.integers(min_value=1, max_value=10),
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=12
    ),
)
def test_connected_components_distributed_path_property(spark, n_nodes, edges):
    """Same oracle property, local_threshold=0 — forces the
    distributed min-label rounds (the default routes every
    hypothesis-sized graph to the union-find path)."""
    from pgshovel_spark.operators.graph import connected_components

    edges = [(a, b) for a, b in edges if a < n_nodes and b < n_nodes and a != b]
    nodes_df = spark.createDataFrame([(i,) for i in range(n_nodes)], "node long")
    edges_df = spark.createDataFrame(edges, "src long, dst long") if edges else (
        spark.createDataFrame([], "src long, dst long")
    )
    got = {
        r.node: r.component
        for r in connected_components(
            nodes_df, edges_df, local_threshold=0
        ).collect()
    }
    assert got == _uf_components(n_nodes, edges)


def test_chunking_tiles_every_document(spark):
    """q_text_chunk invariants on the real fixture: chunk 0 starts at
    token 0; consecutive starts differ by exactly the stride; the last
    chunk ends exactly at the doc's token count; every width is in
    (0, W]; boundary tokens equal the tokens at those positions."""
    from pyspark.sql import functions as F

    from pgshovel_spark.functions.textfns import tokens
    from pgshovel_spark.queries import all_queries
    from pgshovel_spark.queries.governance import _CHUNK_STRIDE, _CHUNK_W
    from pgshovel_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    chunks = all_queries()["q_text_chunk"](spark, sf).collect()
    toks = {
        r.doc_id: r.a
        for r in load_table(spark, sf, "documents")
        .select("doc_id", F.filter(tokens("text"), lambda t: t != "").alias("a"))
        .collect()
    }
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {d for d, a in toks.items() if len(a) >= 1}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        a = toks[doc_id]
        assert rows[0].tok_start == 0
        for i, r in enumerate(rows):
            assert r.chunk_idx == i
            assert r.tok_start == i * _CHUNK_STRIDE
            assert 0 < r.n_chunk_toks <= _CHUNK_W
            assert r.first_tok == a[r.tok_start]
            assert r.last_tok == a[r.tok_start + r.n_chunk_toks - 1]
        last = rows[-1]
        assert last.tok_start + last.n_chunk_toks == len(a)


def test_triangle_count_matches_brute_force(spark):
    """q_graph_triangles' degree-ordered wedge closing equals the
    O(n^3) brute-force triangle count on the same projection, and its
    invariants hold: handshake (n_edges = sum(d)/2, encoded in the
    stats aggregate) and 3*triangles <= wedges."""
    from itertools import combinations

    from pgshovel_spark.queries.graph_analytics import (
        _trade_edges,
        q_graph_triangles,
    )

    SF = "/root/testdata/sf0.001"
    row = q_graph_triangles(spark, SF).collect()[0]
    # brute force over the same co-supplier projection
    e0 = _trade_edges(spark, SF).collect()
    by_supp: dict = {}
    for r in e0:
        by_supp.setdefault(r.sn, set()).add(r.cn)
    adj: dict = {}
    edges = set()
    for custs in by_supp.values():
        for u, v in combinations(sorted(custs), 2):
            edges.add((u, v))
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    tris = sum(
        1
        for (u, v) in edges
        for w in adj[u]
        if w > v and w in adj[v]
    )
    n_wedges = sum(
        len(nb) * (len(nb) - 1) // 2 for nb in adj.values()
    )
    assert row.n_edges == len(edges)
    assert row.n_triangles == tris
    assert row.n_wedges == n_wedges
    assert 3 * row.n_triangles <= row.n_wedges


def test_ann_recall_bounds_and_exact_nprobe_is_perfect(spark):
    """Recall invariants: 0 <= n_hits <= K, recall_pct = hits*100/K;
    and raising nprobe to cover EVERY list makes the IVF search exact
    (recall 100 for every probe) — the limiting-case correctness check
    for the approximate path."""
    import pgshovel_spark.queries.similarity as sim

    SF = "/root/testdata/sf0.001"
    rows = sim.q_ann_recall(spark, SF).collect()
    assert len(rows) == sim._RECALL_PROBES
    for r in rows:
        assert 0 <= r.n_hits <= sim._RECALL_K
        assert r.recall_pct == r.n_hits * 100 // sim._RECALL_K
    old = sim._RECALL_NPROBE
    try:
        sim._RECALL_NPROBE = 10  # every label list probed -> exact
        perfect = sim.q_ann_recall(spark, SF).collect()
    finally:
        sim._RECALL_NPROBE = old
    assert all(r.recall_pct == 100 for r in perfect)


def test_pagerank_matches_reference_iteration(spark):
    """q_graph_pagerank equals a driver-side reference of the same
    scaled-integer recurrence on the same edge set, and its invariants
    hold: every rank positive, and total mass stays within n truncation
    units of the initial SCALE (each of the n per-node divisions
    truncates < 1 unit; damping redistributes but never creates)."""
    from pgshovel_spark.queries.graph_analytics import (
        _PR_ITERS,
        _PR_SCALE,
        _trade_edges,
        q_graph_pagerank,
    )

    SF = "/root/testdata/sf0.001"
    got = {r.node: r.rank_e12 for r in q_graph_pagerank(spark, SF).collect()}
    e0 = _trade_edges(spark, SF).collect()
    dire: list = []
    for r in e0:
        dire.append((r.cn, r.sn))
        dire.append((r.sn, r.cn))
    deg: dict = {}
    for s, _ in dire:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    rank = {v: _PR_SCALE // n for v in deg}
    for _ in range(_PR_ITERS):
        inc: dict = {}
        for s, d in dire:
            inc[d] = inc.get(d, 0) + rank[s] // deg[s]
        rank = {
            v: (15 * _PR_SCALE) // (100 * n) + (85 * s) // 100
            for v, s in inc.items()
        }
    top = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == dict(top)
    assert all(v > 0 for v in rank.values())
    assert sum(rank.values()) <= _PR_SCALE
    assert sum(rank.values()) >= _PR_SCALE - n * (_PR_ITERS + 1) * 2


def test_pagerank_gated_shuffle_path_equals_broadcast_path(spark):
    """The broadcast size gate selects the PHYSICAL strategy only:
    forcing the above-threshold path (plain hash joins, node state
    shuffles instead of broadcasting) must return the identical
    top-20."""
    import pgshovel_spark.queries.graph_analytics as ga

    SF = "/root/testdata/sf0.001"
    via_broadcast = [tuple(r) for r in ga.q_graph_pagerank(spark, SF).collect()]
    old = ga.PR_BROADCAST_NODE_THRESHOLD
    try:
        ga.PR_BROADCAST_NODE_THRESHOLD = 0
        via_shuffle = [tuple(r) for r in ga.q_graph_pagerank(spark, SF).collect()]
    finally:
        ga.PR_BROADCAST_NODE_THRESHOLD = old
    assert via_broadcast == via_shuffle


def test_weighted_sample_is_weight_monotone_and_deterministic(spark):
    """A-ES sampler invariants: (1) re-running yields the identical
    sample (hash-derived priorities, no rand()); (2) for the same
    hash draw u, a heavier doc always outranks a lighter one
    (priority = -ln(u)/w is strictly decreasing in w), so doubling
    every weight preserves the selected set; (3) exactly k rows."""
    from pgshovel_spark.queries.training import q_sample_weighted

    SF = "/root/testdata/sf0.001"
    a = q_sample_weighted(spark, SF).collect()
    b = q_sample_weighted(spark, SF).collect()
    assert a == b
    assert len(a) == 100
    ids_a = [r.doc_id for r in a]
    # scale-invariance: priorities ordered the same under w -> 2w
    # (monotone transform), checked directly on the emitted keys
    import math

    for r in a:
        assert r.priority >= 0
        # recompute the key from its pieces: the emitted rounded value
        # matches the definition
        h = ((r.doc_id % 2**31) * 2654435761) % 2**32 % 1000000 + 1
        expect = -math.log(h / 1000001.0) / r.weight
        assert abs(expect - r.priority) < 5e-9 + 1e-9 * abs(expect)
    assert ids_a == sorted(ids_a, key=lambda i: (
        -math.log((((i % 2**31) * 2654435761) % 2**32 % 1000000 + 1) / 1000001.0)
        / next(r.weight for r in a if r.doc_id == i), i))


def test_dedup_chunks_invariants(spark):
    """q_dedup_chunks invariants: chunk counts tile each tokenized doc
    (n_chunks = ceil(n_toks / W)), 0 <= n_dup_chunks <= n_chunks, the
    ratio is the exact integer-rounded quotient, and cross-doc
    symmetry — every exact-duplicate doc pair (same normalized text)
    has dup_ratio 1.0 on both members."""
    import math

    from pgshovel_spark.queries.governance import _DCHUNK_W, q_dedup_chunks
    from pgshovel_spark.functions.textfns import tokens
    from pgshovel_spark.sources.tables import load_table

    SF = "/root/testdata/sf0.001"
    rows = {r.doc_id: r for r in q_dedup_chunks(spark, SF).collect()}
    docs = (
        load_table(spark, SF, "documents")
        .select("doc_id", F.size(F.filter(tokens("text"), lambda t: t != "")).alias("n"))
        .collect()
    )
    texts = {
        r.doc_id: r.t
        for r in load_table(spark, SF, "documents")
        .select("doc_id", F.col("text").alias("t"))
        .collect()
    }
    by_text: dict = {}
    for i, t in texts.items():
        by_text.setdefault(" ".join(t.split()), []).append(i)
    for d in docs:
        if d.n == 0:
            assert d.doc_id not in rows
            continue
        r = rows[d.doc_id]
        assert r.n_chunks == math.ceil(d.n / _DCHUNK_W)
        assert 0 <= r.n_dup_chunks <= r.n_chunks
        assert r.dup_ratio == ((r.n_dup_chunks * 2 * 10**4 + r.n_chunks)
                               // (r.n_chunks * 2)) / 10**4
    for _, ids in by_text.items():
        if len(ids) >= 2:
            for i in ids:
                assert rows[i].dup_ratio == 1.0


# ---------------------------------------------------------------------------
# Round-8 window-form rewrites vs brute force (the self-reference sweep
# replaced groupBy+join-back with window aggregates; these pin the
# equivalence on arbitrary inputs, not just the fixtures)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 6)),  # (doc_id, text-class)
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_dedup_incremental_window_form_matches_brute_force(spark, rows):
    """The one-pass window formulation == the literal spec: batch docs
    (id%5==0) flagged against the corpus (min other-partition id per
    text) and the batch itself (an earlier batch doc with same text)."""
    from pgshovel_spark.queries.similarity import _tok_distinct  # noqa: F401 (import parity)

    df = spark.createDataFrame(
        [(i, f"text {c}") for i, c in rows], "doc_id long, text string"
    )
    import pgshovel_spark.queries.curation as cur
    from pgshovel_spark.sources import tables as tbl

    # route load_table to the synthetic frame for this one query
    orig = tbl._DF_CACHE.copy()
    key = (spark.sparkContext.applicationId, "__prop__", "documents")
    tbl._DF_CACHE[key] = df
    try:
        got = {
            r.doc_id: (r.is_corpus_dup, r.dup_of, r.is_batch_dup)
            for r in cur.q_dedup_incremental(spark, "__prop__").collect()
        }
    finally:
        tbl._DF_CACHE.clear()
        tbl._DF_CACHE.update(orig)

    texts = {i: f"text {c}" for i, c in rows}
    batch = [i for i in texts if i % 5 == 0]
    corpus = {i: t for i, t in texts.items() if i % 5 != 0}
    want = {}
    for i in batch:
        dups = [j for j, t in corpus.items() if t == texts[i]]
        dup_of = min(dups) if dups else None
        earlier = [j for j in batch if texts[j] == texts[i] and j < i]
        want[i] = (1 if dup_of is not None else 0, dup_of, 1 if earlier else 0)
    assert got == want
