"""Iterative graph algorithms on DataFrames: PageRank.

Companions to operators/components.py (connected components): the
reference has no graph surface (its engine box is opaque,
Untitled Diagram.drawio:153-154), but corpus curation at 100 TB uses
link analysis for source-quality weighting -- PageRank over a
citation/co-occurrence graph is the canonical form.

Scale design: the edge subtree (often expensive -- the co-purchase
query derives it from a self-join + distinct) is materialized ONCE
with the out-degree folded in as a per-edge weight, so each iteration
is exactly one join + ONE shuffle (contributions grouped by
destination) over a static, already-partitioned table; lineage is
truncated with localCheckpoint every few iterations so the plan does
not grow linearly with iteration count (the classic iterative-Spark
trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Truncate lineage EVERY iteration: the broadcast of the rank table
#: materializes the pending chain anyway, so deferring the checkpoint
#: would re-execute earlier iterations quadratically inside each
#: segment; each checkpoint is a narrow (node, rank) table so the
#: cost is small relative to the join.
_CHECKPOINT_EVERY = 1


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 8, damping: float = 0.85,
             checkpoint_every: int = _CHECKPOINT_EVERY,
             out_degrees: DataFrame | None = None) -> DataFrame:
    """PageRank over a directed edge list -> (node, rank).

    Ranks are scaled so they sum to the node count N (the random-surfer
    normalization): rank = (1-d) + d * sum(in-contributions), with each
    node spreading its rank uniformly over its out-edges. Dangling
    nodes (no out-edges) appear as destinations only; their mass leaks,
    which is the standard simplification when the graph is made
    symmetric upstream (as the co-purchase query does).

    ``out_degrees`` (node, degree): callers that already know each
    node's out-degree (e.g. a symmetric graph built from undirected
    pairs, where degree == undirected degree) pass it here -- the
    node-count table is broadcast-joined onto the edges, skipping the
    groupBy shuffle over the full edge list that deriving degrees
    in-operator would cost.
    """
    if out_degrees is not None:
        out_deg = F.broadcast(out_degrees.select(
            F.col("node").alias(src), F.col("degree").alias("__deg")
        ))
    else:
        out_deg = edges.groupBy(src).agg(F.count("*").alias("__deg"))
    # Materialize the static side ONCE. The edge list is often an
    # expensive subtree (the co-purchase query builds it from a
    # self-join + distinct); without this every iteration -- and every
    # branch inside an iteration -- re-executes that subtree. The
    # out-degree is folded in here too, so iterations never join it
    # again: each edge carries its contribution weight 1/deg.
    w_edges = (
        edges.join(out_deg, src)
        .select(
            F.col(src).alias("__src"), F.col(dst).alias("node"),
            (F.lit(1.0) / F.col("__deg")).alias("__w"),
        )
        .localCheckpoint(eager=True)
    )
    nodes = (
        w_edges.select(F.col("__src").alias("node"))
        .union(w_edges.select("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))

    for i in range(iterations):
        # Ranks broadcast: the node set is the small dimension of a
        # link graph (edges are the 100 TB side), so the per-iteration
        # join is map-side over the stationary edges and the shuffle
        # carries only per-partition PARTIAL sums (<= nodes/partition
        # rows), not one row per edge. For node sets too big to
        # broadcast, drop the hint and pre-bucket edges by src instead.
        contribs = (
            w_edges.join(
                F.broadcast(ranks.withColumnRenamed("node", "__src")),
                "__src",
            )
            .groupBy("node")
            .agg(F.sum(F.col("rank") * F.col("__w")).alias("contrib"))
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
