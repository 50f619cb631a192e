"""Connected-components dedup clustering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.operators.cluster import connected_components, dedup_clusters


def test_chain_merges_into_one_component(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 10)],
        "doc_a long, doc_b long",
    )
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    # 10-11 connects to 20-21-22 through (22,10)
    assert comp[10] == comp[11] == comp[20] == comp[21] == comp[22] == 10


def test_dedup_clusters_keeps_representatives(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 5)], "doc_a long, doc_b long")
    out = {r.doc_id: (r.cluster_rep, r.is_kept) for r in dedup_clusters(docs, pairs).collect()}
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[5] == (1, False)
    for singleton in (0, 3, 4, 6, 7):
        assert out[singleton] == (singleton, True)
    kept = sum(1 for _, (rep, keep) in out.items() if keep)
    assert kept == 6  # 8 docs - 2 merged away


def test_unconverged_raises_not_silent(spark):
    # a 6-node chain has diameter 5; min-label propagation moves one hop
    # per round, so max_iter=2 CANNOT converge — that must surface, never
    # silently return wrong component ids
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="NOT converged"):
        connected_components(
            chain, max_iter=2, local_threshold=0, two_phase=False
        )
    # strict=False downgrades to a warning and returns the partial labels
    with pytest.warns(RuntimeWarning, match="NOT converged"):
        connected_components(
            chain, max_iter=2, strict=False, local_threshold=0, two_phase=False
        ).collect()
    # and with enough rounds the same chain converges cleanly
    comp = {
        r.node: r.component
        for r in connected_components(
            chain, max_iter=6, local_threshold=0, two_phase=False
        ).collect()
    }
    assert set(comp.values()) == {0}


def test_local_tier_preserves_string_id_type(spark):
    """The local union-find tier must emit (node, component) typed from
    the INPUT id columns — string doc ids flow through both tiers with
    the same schema, never a silently hardcoded long."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
    )
    local = connected_components(pairs)  # under the local gate
    dist = connected_components(pairs, local_threshold=0, max_iter=8)
    assert local.schema == dist.schema
    lc = {r.node: r.component for r in local.collect()}
    dc = {r.node: r.component for r in dist.collect()}
    assert lc == dc == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    # mismatched id types fail loudly, not via a silent retype
    bad = spark.createDataFrame([(1, "b")], "doc_a long, doc_b string")
    with pytest.raises(TypeError, match="share a type"):
        connected_components(bad)


def test_cc_loop_frees_checkpoint_blocks(spark):
    """Each CC round's localCheckpoint blocks must be freed when the next
    round materializes — only the FINAL labels (+ module-tracked frames)
    may remain cached after the loop, not one RDD per round."""
    from cdc_practice_spark.plans.cache import release_tracked

    release_tracked()
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    out = connected_components(
        chain, local_threshold=0, max_iter=24, two_phase=False
    )
    assert out.count() == 13
    during = jsc.getPersistentRDDs().size()
    # final labels checkpoint + at most a couple of tracked frames — NOT
    # one block set per propagation round
    assert during - before <= 3
    release_tracked()
    assert jsc.getPersistentRDDs().size() <= before


def test_truncated_checkpoint_keeps_stats_bounded(spark):
    """Regression for the iterative-plan stats explosion: plain
    localCheckpoint preserves origin statistics, so a self-referencing
    loop compounds sizeInBytes exponentially (million-digit BigInts in
    the stats visitor).  truncated_checkpoint must keep the estimate at
    a constant number of digits across rounds."""
    from pyspark.sql import functions as F

    from cdc_practice_spark.plans.cache import truncated_checkpoint

    def size_digits(df):
        s = str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        return len(s)

    cur = truncated_checkpoint(
        spark.range(100).select(
            F.col("id").alias("node"), F.col("id").alias("component")
        )
    )
    base_digits = size_digits(cur)
    for _ in range(4):
        ptr = cur.select(
            F.col("node").alias("pn"), F.col("component").alias("pc")
        )
        nxt = cur.join(ptr, cur["component"] == ptr["pn"], "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("pc"), F.col("component"))
            ).alias("component"),
        )
        cur = truncated_checkpoint(nxt)
        assert size_digits(cur) <= base_digits + 2
    assert cur.count() == 100


def test_pagerank_fixed_hand_computed(spark):
    """pagerank_fixed (operators/pagerank.py): exact integer algebra on a
    hand-computed 3-node cycle+chord graph, 2 iterations."""
    from cdc_practice_spark.operators.pagerank import pagerank_fixed
    from cdc_practice_spark.plans.cache import release_tracked

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
    )
    got = {r.node: r.rank_units for r in pagerank_fixed(edges, n_iter=2).collect()}
    release_tracked()
    # iter1: r = (1.0, 0.575, 1.425);  iter2 below (1e-9 units, floor div)
    assert got == {1: 1_361_250_000, 2: 575_000_000, 3: 1_063_750_000}


def test_pagerank_dangling_and_source_nodes(spark):
    """A node with no in-edges settles at 0.15; a dangling node (no
    out-edges) accumulates but leaks its own mass — the documented
    GraphX-style convention."""
    from cdc_practice_spark.operators.pagerank import pagerank_fixed
    from cdc_practice_spark.plans.cache import release_tracked

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r.node: r.rank_units for r in pagerank_fixed(edges, n_iter=3).collect()}
    release_tracked()
    # node1: no in-edges → 0.15 from iter1 onward
    # node2: 0.15 + 0.85 * r1;  r1 = 0.15 after iter1
    #   iter2: 0.15 + 0.85*0.15 ... iter3 same (fixed point) = 277500000
    assert got == {1: 150_000_000, 2: 277_500_000}
