"""Triangle counting — the third iterative-graph tier beside connected
components (cluster.py) and PageRank (pagerank.py).

Triangles are the unit of graph clustering coefficients and of
community/spam detection over co-occurrence graphs (here: parts bought
together).  The naive relational form — three-way self-join of the edge
list — explodes on skewed graphs: a hub of degree d contributes O(d²)
wedge candidates, so one celebrity node dominates the whole job.

Implementation: **degree orientation** (the standard distributed
algorithm — Suri & Vassilvitskii's MR triangle counting / "forward"
algorithm).  Orient every undirected edge from its lower-ranked to its
higher-ranked endpoint, ranking nodes by (degree, id):

    u → v  iff  (deg(u), u) < (deg(v), v)

Under this orientation every node's OUT-degree is O(√m): a node with
out-degree k has k higher-ranked neighbors, each of degree ≥ deg(u) ≥ k,
which needs ≥ k²/2 edges.  Wedges are built only from co-out-neighbors,
so the wedge join is bounded by Σ C(outdeg, 2) ≤ O(m^1.5) TOTAL and
O(m) per node — a hub of degree d is the *target* of its edges, never
the wedge pivot, so skew vanishes structurally rather than via salting.
Each triangle {x, y, z} is produced exactly once: from its
lowest-ranked vertex, with the wedge arms ordered by rank.

Shuffle inventory (the 100 TB story):
  1. canonicalize + distinct           — one hash exchange on the pair
  2. degree aggregate                  — map-side combined, node-keyed
  3. attach degrees to both endpoints  — two node-keyed joins
  4. wedge self-join on the pivot      — ONE exchange of the PERSISTED
     oriented-edge frame (three operators reference it — both wedge
     arms and the closing probe — so it's materialized once; without
     the persist Spark re-derives the scan → distinct → degree-join
     pipeline per reference)
  5. closing join wedge(v,w) ⋈ edge(v,w) — one pair-keyed exchange of
     the wedge set (the O(m^1.5)-bounded intermediate)

No driver state, no iteration: triangle counting is a fixed 2-join
dataflow, so unlike CC/PageRank it needs no convergence loop at all.

Reference parity: the reference implements no graph operators (its only
joins are per-row lookups, simple_kafka_etl.py:81-131); this tier is
part of the §2.4 beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_practice_spark.plans.cache import tracked_persist


def _canonical_edges(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Undirected edge set as distinct (u, v) with u < v; self-loops and
    NULL endpoints dropped (a NULL endpoint is a malformed pair, not a
    node; a self-loop closes no triangle)."""
    a, b = F.col(a_col), F.col(b_col)
    return (
        pairs.filter(a.isNotNull() & b.isNotNull() & (a != b))
        .select(
            F.least(a, b).alias("u"),
            F.greatest(a, b).alias("v"),
        )
        .distinct()
    )


def oriented_edges(pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b") -> DataFrame:
    """Degree-oriented edges ``(src, dst, src_deg, dst_deg)`` where
    (deg(src), src) < (deg(dst), dst).  The degree columns are kept so
    downstream rank comparisons need no further join."""
    edges = _canonical_edges(pairs, a_col, b_col)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        edges.join(deg.withColumnsRenamed({"node": "u", "deg": "du"}), "u")
        .join(deg.withColumnsRenamed({"node": "v", "deg": "dv"}), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("du")).otherwise(F.col("dv")).alias("src_deg"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dst_deg"),
    )


def triangles(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    stats_key: object | None = None,
) -> DataFrame:
    """All triangles as one row ``(x, y, z)`` each, x < y < z by node id.

    Exactly-once emission: the wedge pivot is the triangle's lowest-
    RANKED vertex and the arms are rank-ordered, so each triangle has
    one generating (pivot, arm-pair); the output re-sorts the three ids
    so callers see the id-canonical form.
    """
    # The oriented edge frame is referenced three times (both wedge arms
    # + the closing probe); persist it so the scan → distinct → degree
    # join pipeline runs once, not per reference.  The frame is m-sized
    # (one row per edge, four fixed-width columns) — the thing you'd
    # materialize on a cluster anyway before a 3-reference dataflow.
    o = tracked_persist(oriented_edges(pairs, a_col, b_col))
    e1 = o.select(
        F.col("src").alias("p"),
        F.col("dst").alias("a1"),
        F.col("dst_deg").alias("d1"),
    )
    e2 = o.select(
        F.col("src").alias("p"),
        F.col("dst").alias("a2"),
        F.col("dst_deg").alias("d2"),
    )
    # arms rank-ordered: (deg, id) of arm1 strictly below arm2
    wedges = e1.join(e2, "p").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("a1") < F.col("a2")))
    )
    # The closing probe is edge-sized (m rows, two fixed-width columns);
    # the wedge stream is the O(m^1.5)-bounded side.  When the edge set
    # fits the broadcast budget, broadcasting it avoids shuffling every
    # wedge for the pair-key join — the runtime gate self-disables at
    # edge counts where the broadcast would not fit (then both sides
    # shuffle on the pair key, the honest 100 TB plan).
    from cdc_practice_spark.plans.hints import broadcast_if_small

    closing = broadcast_if_small(
        o.select(F.col("src").alias("a1"), F.col("dst").alias("a2")),
        cache_key=("triangles.edges", stats_key) if stats_key is not None else None,
    )
    tri = wedges.join(closing, ["a1", "a2"]).select("p", "a1", "a2")
    ids = F.array_sort(F.array("p", "a1", "a2"))
    return tri.select(
        ids.getItem(0).alias("x"), ids.getItem(1).alias("y"), ids.getItem(2).alias("z")
    )


def triangle_counts(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    stats_key: object | None = None,
) -> DataFrame:
    """Per-node triangle participation ``(node, tri_cnt)`` — each
    triangle credits all three vertices.  One explode + one map-side-
    combined count on top of :func:`triangles`."""
    tri = triangles(pairs, a_col, b_col, stats_key=stats_key)
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_cnt"))
    )
