"""Adversarial-graph stress for connected components — the scale proof
for the DISTRIBUTED CC tier.

Every corpus-derived near-dup graph in the suite is small enough for the
local union-find gate, so this module synthesizes the graph that tier
gating cannot dodge: >200k edges (above ``local_threshold``) combining
the two shapes that break naive CC implementations —

  - 100 chains of 256 nodes with skip edges: diameter ~127, which
    one-hop min-label propagation would need ~127 rounds for (the
    adaptive pointer-jumping path must engage);
  - 200 power-law stars, k_s = 30000 // s spokes: the s=1 hub has
    30 000 neighbors — the skew shape that makes per-key work uneven.

The construction is deterministic and closed-form, so the DuckDB oracle
computes the expected component structure WITHOUT running CC: chain node
n belongs to component (n // 256) * 256; star node of hub s belongs to
component HUB(s).  The query returns corpus-level aggregates of the
actual distributed CC output, which must match those first principles
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.operators.cluster import connected_components
from cdc_practice_spark.queries.registry import register

# Graph parameters — mirrored verbatim in the oracle SQL below.
CHAIN_LEN = 256
N_CHAINS = 100
N_HUBS = 200
STAR_C = 30_000
STAR_BASE = CHAIN_LEN * N_CHAINS  # star ids start above the chain ids
# each star gets a stride-wide id block; stride = max spokes + 1 so the
# last spoke of star s can never collide with the hub of star s+1
STAR_STRIDE = STAR_C + 1


def adversarial_edges(spark: SparkSession) -> DataFrame:
    """The deterministic stress edge set (~227k edges, ~202k nodes).

    Both chain-edge kinds (+1 and the diameter-halving +2 skips) are
    emitted from ONE explode over the id range, so a node's incident
    edges land in the SAME partition — the id-local layout every real
    edge source has (time-ordered CDC keys, range-written corpora,
    band-sorted pair output).  The r6 build unioned three separately-
    ranged frames and round-robin `repartition(16)`-ed them, which both
    paid an extra full shuffle AND scattered each node's edges across
    partitions — an artifact of the generator, not a property of the
    graph (same nodes, same edges, same diameter/skew either way)."""
    ids = spark.range(CHAIN_LEN * N_CHAINS, numPartitions=8)
    e1 = F.when(
        (F.col("id") + 1) % CHAIN_LEN != 0,
        F.struct(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")),
    )
    e2 = F.when(
        F.col("id") % CHAIN_LEN < CHAIN_LEN - 2,
        F.struct(F.col("id").alias("doc_a"), (F.col("id") + 2).alias("doc_b")),
    )
    chain = (
        ids.select(F.explode(F.array(e1, e2)).alias("e"))
        .filter(F.col("e").isNotNull())
        .select(F.col("e.doc_a").alias("doc_a"), F.col("e.doc_b").alias("doc_b"))
    )
    hubs = spark.range(1, N_HUBS + 1, numPartitions=8).select(
        F.col("id").alias("s")
    )
    stars = hubs.select(
        "s",
        F.explode(F.sequence(F.lit(1), F.floor(F.lit(STAR_C) / F.col("s")))).alias(
            "j"
        ),
    ).select(
        (F.lit(STAR_BASE) + F.col("s") * STAR_STRIDE).alias("doc_a"),
        (F.lit(STAR_BASE) + F.col("s") * STAR_STRIDE + F.col("j")).alias("doc_b"),
    )
    # coalesce, never repartition: compacts the union's 16 map partitions
    # without a shuffle and PRESERVES the id-local layout
    return chain.unionByName(stars).coalesce(16)


@register(
    "cc_adversarial_graph",
    oracle=f"""
WITH chain_nodes AS (
  SELECT i AS node, (i // {CHAIN_LEN}) * {CHAIN_LEN} AS component
  FROM range(0, {CHAIN_LEN * N_CHAINS}) t(i)
),
star_nodes AS (
  SELECT {STAR_BASE} + s * {STAR_STRIDE} + j AS node,
         {STAR_BASE} + s * {STAR_STRIDE} AS component
  FROM range(1, {N_HUBS + 1}) h(s),
       LATERAL (SELECT unnest(range(0, {STAR_C} // s + 1)) AS j) u
),
nodes AS (
  SELECT * FROM chain_nodes UNION ALL SELECT * FROM star_nodes
),
sizes AS (
  SELECT component, count(*) AS cnt FROM nodes GROUP BY component
)
SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM sizes) AS BIGINT) AS n_components,
       CAST((SELECT sum(component) FROM nodes) AS BIGINT) AS sum_component_ids,
       CAST((SELECT max(cnt) FROM sizes) AS BIGINT) AS max_component_size
""",
)
def cc_adversarial_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-tier CC under adversarial shape: long chains force
    pointer jumping (O(log d) rounds), power-law stars force skew.  The
    edge count (~227k) exceeds the 200k local gate, so this runs the
    min-label-propagation loop itself — the oracle checks its output
    against the closed-form component structure.  ``sf_dir`` is unused:
    the graph is synthetic by design (near-dup corpora at test SF never
    clear the gate)."""
    edges = adversarial_edges(spark)
    # r7: the two-phase contraction tier (partition-local union-find +
    # quotient gluing) replaces the O(log d) floor-bound propagation
    # rounds with 3 data-parallel jobs — the stress graph contracts to a
    # ~48k-edge quotient finished on the driver (measured 3.9 s → ~2 s).
    # The loop knobs remain for the fallback path (hash-scattered
    # quotients): jump from round 0 with two chained shortcuts.
    n_edges = (
        (CHAIN_LEN - 1) * N_CHAINS
        + (CHAIN_LEN - 2) * N_CHAINS
        + sum(STAR_C // s for s in range(1, N_HUBS + 1))
    )
    comp = connected_components(
        edges,
        max_iter=48,
        jump_start=0,
        jumps_per_round=2,
        n_edges_hint=n_edges,  # closed-form size: skips the gate count
    )
    # all four stats derive from the per-component sizes — ONE exchange,
    # one linear pipeline, no second scan of the labels and no crossJoin
    # (sum over nodes of component = sum over components of id × size)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum("cnt").alias("n_nodes"),
            F.count(F.lit(1)).alias("n_components"),
            F.sum(F.col("component") * F.col("cnt")).alias("sum_component_ids"),
            F.max("cnt").alias("max_component_size"),
        )
    )


def _pr_iter_cte(prev: str, cur: str) -> str:
    """One unrolled fixed-point PageRank iteration (oracle side) — the
    EXACT integer algebra of operators/pagerank.py::pagerank_fixed
    (DuckDB `//` and Spark `div` agree on non-negative BIGINTs)."""
    return f"""
{cur} AS (
  SELECT n.node,
         CAST(150000000 + coalesce(s.contrib, 0) AS BIGINT) AS r
  FROM pr_nodes n
  LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum((r.r * 85) // (100 * o.d)) AS BIGINT) AS contrib
    FROM pr_edges e
    JOIN {prev} r ON e.src = r.node
    JOIN pr_outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON n.node = s.node
)"""


_PAGERANK_ORACLE = (
    """
WITH pr_edges AS (
  SELECT DISTINCT l_partkey AS src,
         CAST(l_suppkey + 1000000 AS BIGINT) AS dst
  FROM lineitem
),
pr_nodes AS (
  SELECT src AS node FROM pr_edges UNION SELECT dst FROM pr_edges
),
pr_outdeg AS (
  SELECT src, count(*) AS d FROM pr_edges GROUP BY src
),
r0 AS (
  SELECT node, CAST(1000000000 AS BIGINT) AS r FROM pr_nodes
),"""
    + ",".join(_pr_iter_cte(f"r{i}", f"r{i + 1}") for i in range(3))
    + """
SELECT node, r AS rank_units
FROM r3
ORDER BY r DESC, node
LIMIT 20
"""
)


@register(
    "graph_triangle_count",
    oracle="""
WITH el AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM el e1
  JOIN el e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN el e3 ON e3.u = e1.v AND e3.v = e2.v
),
per_node AS (
  SELECT node, count(*) AS cnt
  FROM (SELECT unnest([x, y, z]) AS node FROM tri)
  GROUP BY node
),
tot AS (SELECT count(*) AS n FROM tri)
SELECT CAST(p.node AS BIGINT) AS node,
       CAST(p.cnt AS BIGINT) AS tri_cnt,
       CAST(t.n AS BIGINT) AS total_triangles
FROM per_node p CROSS JOIN tot t
ORDER BY p.cnt DESC, p.node
LIMIT 10
""",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (operators/triangles.py, degree orientation)
    over the parts-bought-together graph: an undirected edge links two
    parts that co-occur in an order.  Returns the 10 most triangle-dense
    parts plus the corpus triangle total — the clustering-coefficient
    numerator.  The oracle counts the same triangles by the naive
    id-ordered 3-way join (exact, independent algorithm); the engine
    side uses the oriented form whose wedge join is skew-proof at scale
    (O(√m) out-degree bound — module docstring)."""
    from cdc_practice_spark.operators.triangles import triangle_counts
    from cdc_practice_spark.plans.hints import spread_for_python
    from cdc_practice_spark.session import load_table

    # sf0.1 lineitem is a 3-row-group file → the self-join would run
    # 3-wide; one narrow repartition of the PROBE side unlocks full
    # parallelism (no-op at scale — see spread_for_python).  The build
    # side stays unspread (r13): it feeds a BroadcastExchange, so
    # repartitioning it first was one pure-overhead exchange in the plan.
    li_raw = load_table(spark, sf_dir, "lineitem")
    li = spread_for_python(li_raw)
    pairs = (
        li.select("l_orderkey", F.col("l_partkey").alias("doc_a"))
        .join(
            li_raw.select("l_orderkey", F.col("l_partkey").alias("doc_b")),
            "l_orderkey",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    per_node = triangle_counts(pairs, stats_key=sf_dir)
    # Integer floor-div (ADVICE r4): float division is exact only while
    # 3*total < 2^53; `div` keeps the total exact at any graph size.
    total = per_node.agg(
        F.expr("sum(tri_cnt) div 3").cast("long").alias("total_triangles")
    )
    return (
        per_node.select(
            F.col("node").cast("long").alias("node"),
            F.col("tri_cnt").cast("long").alias("tri_cnt"),
        )
        .crossJoin(total)
        .orderBy(F.col("tri_cnt").desc(), "node")
        .limit(10)
    )


@register("pagerank_part_supplier", oracle=_PAGERANK_ORACLE)
def pagerank_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank (operators/pagerank.py) on the
    part→supplier sourcing graph from lineitem: suppliers accumulate rank
    proportional to how many parts source through them.  3 exact
    iterations — BIGINT 1e-9-unit arithmetic makes the result bit-equal
    to the oracle's unrolled CTEs regardless of summation order or
    partitioning (the float-PageRank hash-mismatch trap).  Top-20 by
    rank with node-id tiebreak."""
    from cdc_practice_spark.operators.pagerank import pagerank_fixed
    from cdc_practice_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + 1000000).cast("long").alias("dst"),
    ).distinct()
    pr = pagerank_fixed(edges, n_iter=3)
    return pr.orderBy(F.col("rank_units").desc(), "node").limit(20)


@register(
    "graph_bfs_hops",
    oracle="""
WITH RECURSIVE g_edges AS (
  SELECT DISTINCT l_partkey AS src,
         CAST(l_suppkey + 1000000 AS BIGINT) AS dst
  FROM lineitem
),
sym AS (
  SELECT src, dst FROM g_edges
  UNION
  SELECT dst AS src, src AS dst FROM g_edges
),
bfs(node, d) AS (
  SELECT CAST(1 AS BIGINT), 0
  UNION
  SELECT e.dst, bfs.d + 1
  FROM bfs JOIN sym e ON e.src = bfs.node
  WHERE bfs.d < 3
),
settled AS (
  SELECT node, min(d) AS distance FROM bfs GROUP BY node
)
SELECT CAST(distance AS BIGINT) AS distance,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(node) AS BIGINT) AS min_node,
       CAST(max(node) AS BIGINT) AS max_node
FROM settled
GROUP BY distance
""",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BFS hop distances from part 1 over the undirected
    part↔supplier sourcing graph (operators/bfs.py): "what can a
    failure at this node reach within k hops" — the supply-chain blast
    radius question.  Frontier expansion, one hash join per round,
    per-round cost frontier-sized; capped at 3 hops so the DuckDB
    recursive-CTE oracle (min-distance over a depth-capped closure)
    terminates on this cyclic graph.  Output: per-distance node counts
    with min/max node witnesses, so a wrong frontier anywhere
    hash-fails."""
    from cdc_practice_spark.operators.bfs import bfs_hops
    from cdc_practice_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + 1000000).cast("long").alias("dst"),
    ).distinct()
    d = bfs_hops(edges, source=1, max_hops=3)
    return d.groupBy("distance").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )
