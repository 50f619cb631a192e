"""Frontier BFS — exact hop distances from a source node.

The graph shape the warehouse already has (part↔supplier sourcing,
near-dup similarity, user interaction graphs) keeps needing "how far is
everything from here" — supply-chain blast radius, similarity
neighborhoods, reachability audits.  BFS by frontier expansion is the
Pregel shape without the framework: per round, one hash join of the
CURRENT FRONTIER against the edge list plus one anti join against the
settled set.  Per-round cost is frontier-sized, not graph-sized; rounds
are bounded by ``max_hops`` (the caller's question is almost always
"within k hops", and capping makes the DuckDB recursive-CTE oracle
terminate on cyclic graphs).

Scale notes (same discipline as operators/cluster.py):
  - the settled-distance frame is re-referenced every round →
    ``truncated_checkpoint`` per round with explicit block freeing, so
    memory is bounded at any round count and the plan never grows;
  - the frontier is the ONLY thing joined against the edges — a node
    enters a frontier exactly once, so total join work across all
    rounds is O(edges reachable within max_hops);
  - the edge list is checkpointed once and reused by every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_practice_spark.plans.cache import truncated_checkpoint


def bfs_hops(
    edges: DataFrame,
    source: int,
    max_hops: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """(node, distance) for every node within ``max_hops`` of ``source``
    (distance = exact minimum hop count; the source itself is distance
    0).  Undirected by default: edges are symmetrized before expansion.
    Early-exits when a frontier empties (graph exhausted before the
    cap)."""
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).cast("long").alias("s"), F.col(dst_col).cast("long").alias("d")
    )
    if not directed:
        e = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    edge_frees: list = []
    e = truncated_checkpoint(e.distinct(), free_list=edge_frees)

    dist = spark.createDataFrame([(int(source), 0)], "node long, distance long")
    frontier = dist.select("node")
    dist_frees: list = []
    dist = truncated_checkpoint(dist, free_list=dist_frees)
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier, e["s"] == frontier["node"], "inner")
            .select(F.col("d").alias("node"))
            .distinct()
            .join(dist, on="node", how="left_anti")
            .withColumn("distance", F.lit(hop).cast("long"))
        )
        # settle this round; free the previous round's blocks eagerly
        prev_frees = list(dist_frees)
        dist_frees.clear()
        dist = truncated_checkpoint(
            dist.unionByName(nxt), free_list=dist_frees
        )
        # materializes the round AND answers "did the frontier empty?"
        n_at_hop = dist.filter(F.col("distance") == hop).count()
        for free in prev_frees:
            free()
        if n_at_hop == 0:
            break
        frontier = dist.filter(F.col("distance") == hop).select("node")
    for free in edge_frees:
        free()
    return dist
