"""Frontier BFS (operators/bfs.py): exact hop distances, early exit,
directed/undirected semantics."""

from __future__ import annotations

from cdc_practice_spark.operators.bfs import bfs_hops


def _d(df):
    return {r.node: r.distance for r in df.collect()}


def test_bfs_hand_graph_with_cycle(spark):
    """Cycle + branch: distances are MINIMUM hops, revisits don't
    inflate, unreachable-within-cap nodes are absent."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 7)],
        "src long, dst long",
    )
    got = _d(bfs_hops(edges, source=1, max_hops=3))
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_bfs_early_exit_on_exhausted_graph(spark):
    """A component smaller than the cap settles completely and the loop
    stops — distances equal the true eccentricity profile."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = _d(bfs_hops(edges, source=1, max_hops=10))
    assert got == {1: 0, 2: 1, 3: 2}


def test_bfs_directed_vs_undirected(spark):
    """Directed mode follows edge orientation only."""
    edges = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    assert _d(bfs_hops(edges, source=1, max_hops=3, directed=True)) == {
        1: 0,
        2: 1,
    }
    assert _d(bfs_hops(edges, source=1, max_hops=3, directed=False)) == {
        1: 0,
        2: 1,
        3: 2,
    }
