"""Connected components on DataFrames — the dedup-clustering primitive.

Near-duplicate detection (MinHash/LSH, SimHash, embedding cosine) emits
candidate PAIRS; a training-data pipeline then needs the transitive
closure — "keep one document per duplicate CLUSTER".  That is connected
components over the pair graph.

Algorithm: iterative min-label propagation (the simplified large-star
step).  Every node starts labeled with itself; each round every node
takes the min of its own label and its neighbors' labels; convergence
in O(graph diameter) rounds — near-dup clusters are shallow (diameter
≤ ~4), so this terminates in a handful of rounds even at 100 TB.  Each
round is one shuffle-join + one aggregate, all DataFrame ops; lineage
is truncated per round with localCheckpoint so plans stay flat.  The
round tables are TRANSIENT intra-query state: losing one costs a
single bounded re-derivation of that round (unlike a shared artifact,
where a lost localCheckpoint poisons every later consumer — those
live as parquet scratch tables, operators/scratch.py).  A deployment
that wants rounds on storage swaps the per-round localCheckpoint
calls below for operators/scratch.truncate() (a reliable checkpoint
into the scratch root).  The
per-round convergence check is a scalar count — the one legitimate
driver-side action in an iterative algorithm.

Result: (node, component) where component = min node id reachable —
deterministic, engine-independent, and expressible in DuckDB as a
recursive CTE (so the operator is hash-checkable, rare for iterative
graph ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Min-label connected components.

    ``nodes``: one column ``node_col`` (every vertex, including
    isolated ones).  ``edges``: ``src_col``/``dst_col`` pairs, either
    orientation (symmetrized internally).  Returns (node_col,
    ``component``) with component = min reachable node id.
    """
    sym = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).unionByName(
        edges.select(F.col(dst_col).alias("__s"), F.col(src_col).alias("__d"))
    )

    sym = sym.distinct().localCheckpoint(eager=True)

    labels = nodes.select(
        F.col(node_col).alias("__n"), F.col(node_col).alias("__lab")
    ).localCheckpoint(eager=True)

    labels = _propagate(sym, labels, max_iter)
    return labels.select(F.col("__n").alias(node_col), F.col("__lab").alias("component"))


def _propagate(sym: DataFrame, labels: DataFrame, max_iter: int) -> DataFrame:
    for _ in range(max_iter):
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
        # convergence probe over the just-materialized checkpoint:
        # limit(1) short-circuits and costs far less than the full
        # join+agg round a skipped probe would let run — probe every
        # round.
        labels = new_labels.drop("__chg")
        changed = new_labels.filter(F.col("__chg")).limit(1).count()
        if changed == 0:
            break

    return labels
