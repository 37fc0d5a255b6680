"""Connected components on DataFrames — the dedup-clustering primitive.

Near-duplicate detection (MinHash/LSH, SimHash, embedding cosine) emits
candidate PAIRS; a training-data pipeline then needs the transitive
closure — "keep one document per duplicate CLUSTER".  That is connected
components over the pair graph.

Two execution paths, chosen by the MEASURED edge count (one bounded
scalar over the checkpointed edge table):

* **Local union-find** (edge count <= ``local_threshold``): the pair
  graph of a dedup pass is corpus-REDUCED — banding/prefix filters
  emit a table orders of magnitude smaller than the corpus — so it
  routinely fits a single task even when the corpus is 100 TB.  One
  shuffle gathers the edge list into one partition; an Arrow-batched
  union-find (union-by-min + path compression, exact and
  order-independent) labels every endpoint in linear time.  This
  replaces O(log d) shuffle ROUNDS with one narrow shuffle — the same
  observation GraphFrames' AggregateMessages users make when the graph
  is small relative to the cluster.  2 MM edges x 16 bytes = ~32 MB in
  one task: far under executor memory, and the threshold is the
  guard.

* **Distributed min-label propagation** (above the threshold): every
  node takes the min of its own and its neighbors' labels, plus
  pointer jumping (path halving) — convergence in O(log diameter)
  rounds, each one shuffle-join + aggregate.  Lineage is truncated per
  round with localCheckpoint so plans stay flat; the round tables are
  TRANSIENT intra-query state (losing one costs a single bounded
  re-derivation — unlike a shared artifact, which lives as parquet,
  operators/scratch.py).  The convergence probe is a scalar count —
  the one legitimate driver-side action in an iterative algorithm —
  taken every PROBE_EVERY-th round (pointer jumping doubles label
  distance per round, so half-cadence probing costs at most one
  wasted round while halving the driver barriers).

Both paths produce the identical result: (node, component) with
component = min node id reachable — deterministic, engine-independent,
and expressible in DuckDB as a recursive CTE (so the operator is
hash-checkable, rare for iterative graph ops).  The threshold only
selects the physical strategy, never the answer; tests run both paths
on the same graph and assert equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Default edge-count bound for the single-task union-find path.
#: 2 MM edges is ~32 MB of (long, long) rows in one partition and
#: <1 s of union-find — far below executor memory; raise/lower per
#: deployment.  A dedup candidate graph above this bound is genuinely
#: large and takes the distributed rounds.
LOCAL_EDGE_THRESHOLD = 2_000_000


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    local_threshold: int = LOCAL_EDGE_THRESHOLD,
) -> DataFrame:
    """Min-label connected components.

    ``nodes``: one column ``node_col`` (every vertex, including
    isolated ones).  ``edges``: ``src_col``/``dst_col`` pairs, either
    orientation (symmetrized internally).  Returns (node_col,
    ``component``) with component = min reachable node id.
    """
    und = (
        edges.select(F.col(src_col).alias("__s"), F.col(dst_col).alias("__d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # One bounded scalar over the just-checkpointed table decides the
    # physical strategy (the count reads cached blocks, not the edge
    # subtree).
    if und.count() <= local_threshold:
        comp = _local_components(und)
        # isolated nodes (no edges) keep their own id as the component
        return nodes.join(
            comp, nodes[node_col] == comp["__cn"], "left"
        ).select(
            nodes[node_col],
            F.coalesce("__comp", nodes[node_col]).alias("component"),
        )

    sym = und.unionByName(
        und.select(F.col("__d").alias("__s"), F.col("__s").alias("__d"))
    ).distinct().localCheckpoint(eager=True)

    labels = nodes.select(
        F.col(node_col).alias("__n"), F.col(node_col).alias("__lab")
    ).localCheckpoint(eager=True)

    labels = _propagate(sym, labels, max_iter)
    return labels.select(F.col("__n").alias(node_col), F.col("__lab").alias("component"))


def _local_components(und: DataFrame) -> DataFrame:
    """Single-task exact union-find over the gathered edge list:
    (__cn, __comp) for every node with at least one edge.  Union-by-min
    (the smaller root becomes parent) makes each set's root its minimum
    member, so component ids match the distributed fixpoint exactly;
    path compression keeps the loop effectively linear.  The answer is
    independent of edge arrival order — safe against shuffle
    nondeterminism."""

    def uf(batches):
        import pandas as pd

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for a, b in zip(pdf["__s"].tolist(), pdf["__d"].tolist()):
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra < rb:
                    parent[rb] = ra
                elif rb < ra:
                    parent[ra] = rb
        ns = list(parent)
        yield pd.DataFrame({"__cn": ns, "__comp": [find(x) for x in ns]})

    return und.repartition(1).mapInPandas(uf, "__cn long, __comp long")


#: Convergence-probe cadence for the distributed path: probe every
#: k-th round instead of every round.  With pointer jumping, label
#: distance DOUBLES per round, so convergence lands at round
#: ~ceil(log2(diameter)); probing at half cadence halves the
#: driver-barrier count (each probe is a scheduler round-trip — the
#: thing that hurts most exactly where this path runs: genuinely huge
#: graphs on a busy cluster) at the worst-case cost of ONE wasted
#: no-op round after convergence.  A no-op round here is a join over
#: already-checkpointed node/edge tables whose agg produces zero
#: changed labels — bounded, while the saved barriers are per-round.
PROBE_EVERY = 2


def _propagate(
    sym: DataFrame, labels: DataFrame, max_iter: int, probe_every: int = PROBE_EVERY
) -> DataFrame:
    for i in range(max_iter):
        # (1) neighbor minimum — one shuffle join + partial agg
        nbr_min = (
            sym.join(labels, sym["__d"] == labels["__n"])
            .groupBy("__s")
            .agg(F.min("__lab").alias("__nbr_lab"))
        )
        cand = labels.join(nbr_min, labels["__n"] == nbr_min["__s"], "left").select(
            "__n",
            F.col("__lab").alias("__old"),
            F.least(F.col("__lab"), F.coalesce("__nbr_lab", F.col("__lab"))).alias(
                "__lab"
            ),
        )
        # (2) pointer jumping (path halving): also adopt the label OF my
        # label — doubles the distance information per round, so chains
        # collapse in O(log diameter) rounds instead of O(diameter).
        parent = cand.select(
            F.col("__n").alias("__pn"), F.col("__lab").alias("__plab")
        )
        new_labels = (
            cand.join(parent, cand["__lab"] == parent["__pn"], "left")
            .select(
                "__n",
                "__old",
                F.least(
                    F.col("__lab"), F.coalesce("__plab", F.col("__lab"))
                ).alias("__lab"),
            )
            .withColumn("__chg", F.col("__lab") != F.col("__old"))
            .drop("__old")
            .localCheckpoint(eager=True)
        )
        # Convergence probe over the just-materialized checkpoint
        # (limit(1) short-circuits), every ``probe_every``-th round —
        # plus mandatorily on the final round, so the loop can never
        # exit unconverged without max_iter being genuinely exhausted.
        labels = new_labels.drop("__chg")
        if (i + 1) % probe_every == 0 or i == max_iter - 1:
            changed = new_labels.filter(F.col("__chg")).limit(1).count()
            if changed == 0:
                break

    return labels
