"""Iterative graph algorithms on DataFrames: PageRank.

Companions to operators/components.py (connected components): the
reference has no graph surface (its engine box is opaque,
Untitled Diagram.drawio:153-154), but corpus curation at 100 TB uses
link analysis for source-quality weighting -- PageRank over a
citation/co-occurrence graph is the canonical form.

Scale design: each iteration is ONE shuffle (contributions grouped by
destination) plus a broadcast-size rank update; lineage is truncated
with localCheckpoint every few iterations so the plan does not grow
linearly with iteration count (the classic iterative-Spark trap).
Edges are the big table and are never mutated -- re-used across
iterations, so a real deployment caches/bucketizes them once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Truncate lineage this often; each checkpoint is a narrow
#: (node, rank) table so the cost is small relative to the join.
_CHECKPOINT_EVERY = 3


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 8, damping: float = 0.85,
             checkpoint_every: int = _CHECKPOINT_EVERY) -> DataFrame:
    """PageRank over a directed edge list -> (node, rank).

    Ranks are scaled so they sum to the node count N (the random-surfer
    normalization): rank = (1-d) + d * sum(in-contributions), with each
    node spreading its rank uniformly over its out-edges. Dangling
    nodes (no out-edges) appear as destinations only; their mass leaks,
    which is the standard simplification when the graph is made
    symmetric upstream (as the co-purchase query does).
    """
    out_deg = edges.groupBy(src).agg(F.count("*").alias("__deg"))
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))

    for i in range(iterations):
        contribs = (
            edges.join(ranks, edges[src] == ranks["node"])
            .join(out_deg, src)
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("__deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
