"""Fixed-point integer PageRank — the second distributed iterative-graph
tier beside connected components (operators/cluster.py).

Why integer fixed-point: double-valued PageRank is summation-order
sensitive, so two engines (or two partitionings of the SAME engine)
produce hash-divergent low bits — the classic "data-dependent oracle
mismatch".  Representing rank in 1e-9 units as BIGINT makes every
operation exact and order-independent:

    contrib(e)  = (r_src * 85) div (100 * outdeg_src)     [floor division]
    r_dst'      = 0.15e9 + Σ contrib                       [exact int sum]

— the same move functions/money.py makes for decimal aggregates.  Both
engines floor identically on non-negative ints, so a 3-iteration run is
bit-identical between Spark and the DuckDB oracle's unrolled CTEs.

Convention: GraphX-style un-normalized PageRank (rank = 0.15 + 0.85·Σ
in-contributions; no dangling-mass redistribution) — per-iteration mass
is bounded by Σ ranks, so the BIGINT headroom at 1e-9 units holds to
~1e8-node graphs; past that, drop to 1e-6 units (same code, one
constant).

Scale shape per iteration: one shuffle joining ranks to edges on src,
one shuffle aggregating contributions on dst (both map-side combined —
the contribution sum is associative), then a left join back to the node
set.  Edges+outdeg are computed once and persisted; the rank frame is
``truncated_checkpoint``-ed each round so plan depth and stats stay
constant at any iteration count (plans/cache.py — the CC lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_practice_spark.plans.cache import (
    track_free,
    tracked_persist,
    truncated_checkpoint,
)

INIT_UNITS = 1_000_000_000  # rank 1.0 in 1e-9 units
BASE_UNITS = 150_000_000  # 0.15 in 1e-9 units


def pagerank_fixed(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Returns (node, rank_units) after ``n_iter`` exact fixed-point
    iterations.  ``edges`` must be distinct directed pairs."""
    nodes = tracked_persist(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("d"))
    # one edge-side frame carrying outdeg, built once for all iterations
    ed = tracked_persist(
        edges.join(outdeg, on=src).select(
            F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), "d"
        )
    )
    ranks = nodes.withColumn("r", F.lit(INIT_UNITS).cast("long"))
    frees: list = []
    for _ in range(n_iter):
        contribs = (
            ed.join(ranks, ed["e_src"] == ranks["node"])
            .select(
                F.col("e_dst").alias("node"),
                F.expr("(r * 85) div (100 * d)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        new_frees: list = []
        ranks = truncated_checkpoint(
            nodes.join(contribs, on="node", how="left").select(
                "node",
                (
                    F.lit(BASE_UNITS).cast("long")
                    + F.coalesce(F.col("contrib"), F.lit(0))
                ).alias("r"),
            ),
            free_list=new_frees,
        )
        # free the previous round's checkpoint blocks once this round
        # is materialized (truncated_checkpoint is eager)
        for f in frees:
            f()
        frees = new_frees
    # the FINAL round's blocks are still referenced by the returned frame —
    # hand their freer to the module tracker (released after the caller
    # materializes, via the standard release_tracked() contract)
    for f in frees:
        track_free(f)
    return ranks.select("node", F.col("r").alias("rank_units"))
