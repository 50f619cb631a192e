"""Connected components over near-duplicate pairs → dedup clusters.

Pair detection (MinHash/SimHash) yields edges; corpus dedup needs the
transitive closure — if A≈B and B≈C, one representative for {A,B,C}.

Implementation: iterative min-label propagation (the standard
large-graph connected-components algorithm on a relational engine):

    label(v) ← v
    repeat: label(v) ← min(label(v), min over neighbors u of label(u))

Each round is one join + one aggregate (all key-partitioned, no driver
state); the diameter of near-dup clusters is tiny in practice (dup
chains, not long paths), so convergence takes a handful of rounds —
``max_iter`` bounds it and convergence is detected with a cheap count.
At 100 TB this is exactly GraphX/GraphFrames' CC algorithm shape,
without the dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_practice_spark.plans.cache import tracked_persist, truncated_checkpoint


def _local_union_find(edges: list[tuple]) -> dict:
    """Driver-side union-find with path compression — exact min-label
    components for edge lists below the local gate.  Node ids only need
    a total order (min-label works for ints and strings alike)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
        parent.setdefault(a, find(a))
        parent.setdefault(b, find(b))
    return {n: find(n) for n in parent}


def _components_schema(pairs: DataFrame, a_col: str, b_col: str):
    """Output schema (node, component) typed from the INPUT id columns —
    hardcoding long would silently retype (or crash createDataFrame) for
    string/int ids that the distributed tier handles fine.  Both id
    columns must agree: the symmetrizing union requires it anyway."""
    from pyspark.sql.types import StructField, StructType

    fields = {f.name: f.dataType for f in pairs.schema.fields}
    ta, tb = fields[a_col], fields[b_col]
    if ta != tb:
        raise TypeError(
            f"connected_components: id columns must share a type; "
            f"got {a_col}: {ta.simpleString()}, {b_col}: {tb.simpleString()}"
        )
    return StructType(
        [StructField("node", ta), StructField("component", ta)]
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 24,
    strict: bool = True,
    local_threshold: int = 200_000,
    pointer_jumping: bool = True,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the minimum node id reachable.

    Two tiers, gated on the EDGE count — the same decision a broadcast
    join makes about its small side:
      - edges ≤ ``local_threshold``: collect the edge list (a few MB at
        the default gate) and run driver-side union-find — exact, one
        job, no per-round scheduling floor.  Near-dup edge lists are
        orders of magnitude smaller than their corpus, so this is the
        common case even at large corpus sizes.
      - above the gate: distributed min-label propagation (GraphX CC
        shape, O(diameter) rounds — property-tested equivalent to
        union-find in tests/test_cluster_properties.py).

    Min-label propagation advances one hop per round, so a cluster whose
    diameter exceeds ``max_iter`` would exit the loop with WRONG
    (unconverged) labels.  That is never silent: ``strict=True`` (default)
    raises when the final round still changed labels; ``strict=False``
    downgrades to a warning for callers that accept approximate
    components on pathological chain graphs."""
    out_schema = _components_schema(pairs, a_col, b_col)
    # The symmetrizing union references `pairs` twice, and union branches do
    # NOT common-subexpression-eliminate — an unpersisted pair-detection
    # subtree (LSH candidate join + Jaccard verify) would run once per
    # branch.  Persist the (tiny) pair list first so detection runs once.
    pairs = tracked_persist(
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    )
    n_edges = pairs.count()
    if n_edges <= local_threshold:
        comp = _local_union_find(
            [(r.src, r.dst) for r in pairs.collect()]
        )
        spark = pairs.sparkSession
        pairs.unpersist()
        return spark.createDataFrame(sorted(comp.items()), out_schema)
    # No .distinct() on the symmetrized edges: input pairs are deduped
    # with doc_a < doc_b, so symmetrization cannot create duplicates —
    # and min-label propagation is tolerant of duplicate edges anyway.
    # Dropping it removes a full exchange+aggregate stage.
    #
    # truncated_checkpoint (NOT persist) everywhere the loop
    # re-references a frame: persist caches rows but keeps the logical
    # plan, and each round references `labels` twice — the plan tree
    # DOUBLES per round, and on many-round graphs plan stringification
    # alone OOMs the driver.  Checkpointing cuts lineage to a
    # materialized RDD per round; the *truncated* variant additionally
    # resets the preserved size estimate, which otherwise compounds
    # exponentially across rounds (see plans/cache.py).  On a multi-node
    # cluster, swap for reliable checkpoint(dir) — localCheckpoint
    # storage dies with an executor.
    #
    # Each round's checkpoint supersedes the previous one: free round
    # i-1's cached blocks as soon as round i materializes (free_list
    # plumbing) instead of letting one block set per round pile up until
    # driver GC.  The final labels frame escapes to the caller, so its
    # freer is deferred to release_tracked().
    edges_frees: list = []
    edges = truncated_checkpoint(
        pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ),
        free_list=edges_frees,
    )
    # Fold the FIRST propagation hop into initialization: label(v) =
    # min(v, min neighbor id) is exactly round 1 of the loop over
    # identity labels, computed here without the per-round persist+count
    # cycle (saves one full round — near-dup graphs usually converge on
    # the very next check).
    init_nbr = edges.groupBy("src").agg(F.min("dst").alias("nbr_min"))
    label_frees: list = []
    labels = truncated_checkpoint(
        init_nbr.select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("nbr_min")).alias("component"),
        ),
        free_list=label_frees,
    )
    changed = 0
    for i in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        # one join carries BOTH the update and the convergence signal:
        # labels only ever decrease, so `changed` counts rows where the
        # new label is lower — no second old-vs-new join per round.
        upd = labels.join(
            neighbor_min, labels["node"] == neighbor_min["src"], "left"
        ).select(
            "node",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
        )
        # Adaptive pointer-jumping: one-hop propagation alone needs
        # diameter rounds — fine for near-dup clusters (tiny diameters;
        # unconditional pointer-doubling was A/B'd SLOWER there), fatal
        # for sparse long-chain graphs (e.g. low-threshold similarity
        # edges).  So after two cheap rounds haven't converged, add a
        # label shortcut per round — component(v) ← component(
        # component(v)) — which squares the propagated distance:
        # convergence in O(log diameter) rounds.  The shortcut join is
        # label-table-sized (nodes, not edges) and preserves the
        # invariant that labels are reachable minima, so the fixpoint is
        # unchanged.
        # (``pointer_jumping=False`` disables the shortcut — the A/B knob
        # tools/ab_cc.py measures; production callers leave it on.)
        if pointer_jumping and i >= 2:
            ptr = upd.select(
                F.col("node").alias("p_node"), F.col("component").alias("p_comp")
            )
            upd = upd.join(
                ptr, upd["component"] == ptr["p_node"], "left"
            ).select(
                "node",
                "_old",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("p_comp"), F.col("component")),
                ).alias("component"),
            )
        # convergence signal rides the checkpoint materialization as an
        # observe() metric — no separate count job per round
        from pyspark.sql import Observation

        obs = Observation(f"cc_round_{i}")
        upd = upd.observe(
            obs,
            F.coalesce(
                F.sum((F.col("component") < F.col("_old")).cast("long")), F.lit(0)
            ).alias("changed"),
        )
        new_frees: list = []
        upd = truncated_checkpoint(upd, free_list=new_frees)
        changed = int(obs.get["changed"])
        # round i is materialized (localCheckpoint is eager) — round
        # i-1's labels blocks are unreachable now; free them.
        for free in label_frees:
            free()
        label_frees = new_frees
        labels = upd.drop("_old")
        if changed == 0:
            break
    from cdc_practice_spark.plans.cache import track_free

    for free in edges_frees:
        free()
    for free in label_frees:
        track_free(free)
    pairs.unpersist()
    if changed != 0:
        msg = (
            f"connected_components: max_iter={max_iter} exhausted with "
            f"{changed} labels still changing — component ids are NOT "
            f"converged (cluster diameter > max_iter); raise max_iter"
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 24,
) -> DataFrame:
    """Cluster assignment for the WHOLE corpus: docs in no pair are their
    own singleton cluster.  Output: (doc_id, cluster_rep, is_kept) —
    filtering is_kept gives the deduplicated corpus."""
    comp = connected_components(pairs, max_iter=max_iter)
    assigned = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, F.col("doc_id") == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_rep"),
        )
    )
    return assigned.withColumn("is_kept", F.col("doc_id") == F.col("cluster_rep"))
