"""Distributed connected components by min-label propagation.

The near-dup clustering step a training-data pipeline runs after candidate
generation: similarity pairs form a graph, each component keeps one
representative.  At 10^10 documents neither the edges nor the labels fit a
driver, so components are computed the GraphX/GraphFrames way — iterative
min-label propagation, every step an ordinary shuffle-on-node-id join:

    label(v) <- min(label(v), min over neighbors u of label(u))

converging in O(component diameter) rounds.  The driver holds only the
loop counter and a convergence count (a control action); labels/edges stay
distributed throughout.  Each round's labels are localCheckpoint()ed —
without lineage truncation the logical plan DOUBLES per iteration
(labels_new embeds labels_old twice: union + join) and plan analysis
itself OOMs after ~20 rounds; checkpointing keeps the plan O(1) per
round.  On a real cluster swap localCheckpoint for a reliable
``spark.sparkContext.setCheckpointDir`` checkpoint (localCheckpoint does
not survive executor loss).

Oracle twin: a recursive transitive-closure CTE in DuckDB
(`neardup_clusters` in plans/catalog_dedup.py) — tractable at test scale,
which is exactly what the cross-engine gate needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from the node.

    Node ids must be numeric (orderable by min).  Raises RuntimeError if
    the propagation has not converged after ``max_iter`` rounds (the
    longest shortest-path to a component's minimum bounds the rounds
    needed; 25 covers any realistically-clustered near-dup graph — chains
    longer than that mean the candidate generation is broken).
    """
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(True)
    )
    labels = (
        bidir.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(True)
    )
    for _ in range(max_iter):
        nbr = bidir.join(
            labels, bidir["v"] == labels["node"], "inner"
        ).select(F.col("u").alias("node"), "component")
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
