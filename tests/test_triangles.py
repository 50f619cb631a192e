"""Triangle counting (degree orientation) — exactness and skew-shape
properties vs a brute-force model."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from cdc_practice_spark.operators.triangles import (
    oriented_edges,
    triangle_counts,
    triangles,
)


def _brute_triangles(edges: set[tuple]) -> set[tuple]:
    nodes = sorted({n for e in edges for n in e})
    es = {tuple(sorted(e)) for e in edges}
    return {
        (x, y, z)
        for x, y, z in combinations(nodes, 3)
        if (x, y) in es and (x, z) in es and (y, z) in es
    }


def test_triangles_hand_graph(spark):
    # K4 on {1,2,3,4} (4 triangles) + pendant 5 + disjoint triangle {6,7,8}
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (6, 7), (7, 8), (6, 8)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {(r.x, r.y, r.z) for r in triangles(pairs).collect()}
    assert got == _brute_triangles(set(edges))
    assert len(got) == 5
    cnt = {r.node: r.tri_cnt for r in triangle_counts(pairs).collect()}
    assert cnt == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}  # pendant 5 absent


def test_triangles_exactly_once_on_messy_input(spark):
    # duplicates, reversed duplicates, self-loops, NULL endpoints — the
    # canonicalization must collapse all of it to one clean triangle
    rows = [
        (1, 2), (2, 1), (1, 2),
        (2, 3), (3, 1),
        (1, 1), (None, 2), (3, None),
    ]
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    out = triangles(pairs).collect()
    assert [(r.x, r.y, r.z) for r in out] == [(1, 2, 3)]


def test_triangles_star_has_none_and_hub_is_never_pivot(spark):
    # a pure star closes no triangles; degree orientation must point
    # every edge AT the hub (spokes are lower-ranked), so the hub's
    # out-degree — the wedge-pivot cost — is zero despite degree 50
    hub = 0
    pairs = spark.createDataFrame(
        [(hub, i) for i in range(1, 51)], "doc_a long, doc_b long"
    )
    assert triangles(pairs).count() == 0
    o = oriented_edges(pairs)
    assert o.filter(F.col("src") == hub).count() == 0
    assert o.filter(F.col("dst") == hub).count() == 50


def test_triangle_counts_random_graph_matches_brute_force(spark):
    # deterministic pseudo-random graph (LCG, no random module seed
    # drift).  Both endpoints come from the HIGH bits of ONE state:
    # consecutive low-bit LCG draws alternate parity, which silently
    # made the old version bipartite — 141 edges, zero triangles, a
    # vacuous test (caught in r5).
    state, edges = 12345, set()
    for _ in range(220):
        state = (state * 1103515245 + 12345) % (2**31)
        a = (state >> 16) % 30
        b = (state >> 7) % 30
        if a != b:
            edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
    got = {(r.x, r.y, r.z) for r in triangles(pairs).collect()}
    want = _brute_triangles(edges)
    assert got == want
    per_node = {r.node: r.tri_cnt for r in triangle_counts(pairs).collect()}
    for n in {n for t in want for n in t}:
        assert per_node[n] == sum(1 for t in want if n in t)


def test_triangle_counts_tiers_agree(spark):
    # the size gate must be purely a physical decision: local numpy tier
    # (default gate) and distributed oriented tier (gate forced off)
    # return identical rows on the same graph
    # draw both endpoints from the HIGH bits of one LCG state —
    # consecutive low-bit draws alternate parity, which makes the graph
    # bipartite (triangle-free) and the test vacuous
    state, edges = 777, set()
    for _ in range(400):
        state = (state * 1103515245 + 12345) % (2**31)
        a = (state >> 16) % 20
        b = (state >> 8) % 20
        if a != b:
            edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
    local = {(r.node, r.tri_cnt) for r in triangle_counts(pairs).collect()}
    dist = {
        (r.node, r.tri_cnt)
        for r in triangle_counts(pairs, local_threshold=0).collect()
    }
    assert local == dist and len(local) > 0


def test_triangle_counts_local_tier_string_ids(spark):
    # node ids need not be numeric — the numpy kernel compacts any dtype
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "doc_a string, doc_b string",
    )
    cnt = {r.node: r.tri_cnt for r in triangle_counts(pairs).collect()}
    assert cnt == {"a": 1, "b": 1, "c": 1}
