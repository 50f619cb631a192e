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
    jump_start: int = 2,
    jumps_per_round: int = 1,
    loop_aqe: bool = False,
    two_phase: bool = True,
    n_edges_hint: int | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the minimum node id reachable.

    Three tiers, gated on the EDGE count — the same decision a broadcast
    join makes about its small side:
      - edges ≤ ``local_threshold``: collect the edge list (a few MB at
        the default gate) and run driver-side union-find — exact, one
        job, no per-round scheduling floor.  Near-dup edge lists are
        orders of magnitude smaller than their corpus, so this is the
        common case even at large corpus sizes.
      - above the gate, ``two_phase=True`` (default): partition-local
        contraction — every input partition union-finds ITS edges in one
        Arrow pass (no shuffle, C-speed), then the per-partition roots
        are glued through shared nodes into a quotient graph that is
        boundary-node-sized.  A quotient under the gate finishes on the
        driver; a bigger one recurses into the propagation loop, now on
        the CONTRACTED graph.  This is the classic two-level distributed
        CC (Rastogi et al., "Finding Connected Components in MapReduce
        and Beyond"-family): exact for any graph, and on graphs with any
        edge locality (time-ordered ids, range-written corpora) the
        quotient collapses by orders of magnitude — the adversarial
        227k-edge stress graph contracts to ~3k super-edges and runs in
        3 data-parallel jobs instead of O(log d) floor-bound rounds.
      - ``two_phase=False``: distributed min-label propagation (GraphX
        CC shape, O(diameter) rounds with pointer jumping —
        property-tested equivalent to union-find in
        tests/test_cluster_properties.py).

    Min-label propagation advances one hop per round, so a cluster whose
    diameter exceeds ``max_iter`` would exit the loop with WRONG
    (unconverged) labels.  That is never silent: ``strict=True`` (default)
    raises when the final round still changed labels; ``strict=False``
    downgrades to a warning for callers that accept approximate
    components on pathological chain graphs.  (The two-phase tier is
    exact regardless of ``max_iter`` unless its quotient falls through
    to the loop.)"""
    out_schema = _components_schema(pairs, a_col, b_col)
    if (
        two_phase
        and n_edges_hint is not None
        and n_edges_hint > local_threshold
    ):
        # caller-supplied size hint says the local gate can't win, and
        # the two-phase tier consumes the edges EXACTLY once (the
        # contraction mapper) — skip the gate's persist+count job
        # entirely (a stats hint, same contract as a broadcast hint)
        return _two_phase_components(
            pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")),
            out_schema,
            max_iter=max_iter,
            strict=strict,
            local_threshold=local_threshold,
            pointer_jumping=pointer_jumping,
            jump_start=jump_start,
            jumps_per_round=jumps_per_round,
            loop_aqe=loop_aqe,
            pairs_persisted=False,
        )
    # The symmetrizing union references `pairs` twice, and union branches do
    # NOT common-subexpression-eliminate — an unpersisted pair-detection
    # subtree (LSH candidate join + Jaccard verify) would run once per
    # branch.  Persist the (tiny) pair list first so detection runs once.
    pairs = tracked_persist(
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    )
    # Gate-and-fetch in ONE action (r12, same trick as the two-phase
    # quotient gate): ``limit(threshold+1).collect()`` returns ALL rows
    # when fewer exist, so an under-gate edge list is already in hand —
    # the old count-then-collect shape paid two jobs over the persisted
    # pairs (each a full scheduling round on the floor-bound dedup
    # paths).  Over the gate we know only "too big", which is all the
    # distributed tiers need; the loop tier re-counts the persisted
    # pairs below for its partition sizing.
    if n_edges_hint is not None and n_edges_hint > local_threshold:
        n_edges = n_edges_hint
    else:
        head = pairs.limit(local_threshold + 1).collect()
        n_edges = len(head)
    if n_edges <= local_threshold:
        comp = _local_union_find([(r.src, r.dst) for r in head])
        spark = pairs.sparkSession
        pairs.unpersist()
        return spark.createDataFrame(sorted(comp.items()), out_schema)
    if two_phase:
        return _two_phase_components(
            pairs,
            out_schema,
            max_iter=max_iter,
            strict=strict,
            local_threshold=local_threshold,
            pointer_jumping=pointer_jumping,
            jump_start=jump_start,
            jumps_per_round=jumps_per_round,
            loop_aqe=loop_aqe,
        )
    if n_edges_hint is None or n_edges_hint <= local_threshold:
        # the gate fetch is TRUNCATED at threshold+1 — the loop tier's
        # partition sizing needs the real edge count (one cheap job over
        # the persisted pairs; only reachable with two_phase=False)
        n_edges = pairs.count()
    # Per-round cost is the whole game here (each round is floor-bound,
    # not data-bound), so the loop body is stripped to TWO key-partitioned
    # operators plus the optional shortcut joins:
    #
    #   - SELF-LOOPS folded into the (symmetrized) edge set: with
    #     (v, v) ∈ E, new_label(v) = min over N(v)∪{v} of label(u) is ONE
    #     join + ONE aggregate — the old shape's separate
    #     labels⋈neighbor_min left join (which existed only to carry the
    #     node's own label and the convergence delta) disappears.
    #   - edges are PERSISTED pre-partitioned on the probe key (dst),
    #     not checkpointed: localCheckpoint erases outputPartitioning,
    #     which silently re-exchanged the static edge set every round.
    #   - LOOP-SCOPED execution conf (restored in a finally):
    #       * AQE off — every AQE query stage is a scheduling barrier
    #         with a driver re-plan, and a CC round is 3 joins + an agg
    #         of KNOWN, edge-proportional size; there is nothing for the
    #         runtime re-optimizer to learn, so its per-stage latency is
    #         pure floor tax.  Measured on the 227k-edge stress graph:
    #         2.3 s/round with AQE → 0.7 s/round without (same plan
    #         shapes).  Callers on genuinely skewed billion-edge graphs
    #         can re-enable via ``loop_aqe=True`` for skew-join splits.
    #       * shuffle partitions sized from the measured edge count
    #         (~128k joined rows per task, floor 8, capped at the
    #         session setting) — per-round cost is task-scheduling
    #         bound, so 32 near-empty tasks per stage cost more than 8
    #         right-sized ones; at real scale the same formula yields
    #         the session cap, i.e. full cluster parallelism.
    #   - convergence rides the checkpoint materialization as an
    #     observe() metric: the label multiset only moves downward, so
    #     sum(xxhash64(node, component)) is a type-generic fixpoint
    #     detector — equal sums across consecutive rounds ⇔ no label
    #     changed (up to a ~2⁻⁶⁴ per-round hash-cancellation, which the
    #     strict contract accepts and documents).  No second join, no
    #     count job.
    #
    # No .distinct() anywhere in the edge build: input pairs are deduped
    # with doc_a < doc_b (symmetrization cannot create duplicates), and
    # min-label propagation is tolerant of duplicate edges anyway.
    #
    # truncated_checkpoint (NOT persist) on the per-round labels: persist
    # caches rows but keeps the logical plan, and each round references
    # `labels` multiple times — the plan tree grows geometrically and
    # plan stringification alone OOMs the driver on many-round graphs.
    # Checkpointing cuts lineage to a materialized RDD per round; the
    # *truncated* variant additionally resets the preserved size estimate
    # (see plans/cache.py).  On a multi-node cluster, swap for reliable
    # checkpoint(dir) — localCheckpoint storage dies with an executor.
    # Round i-1's blocks are freed as soon as round i materializes.
    # self-loops are NOT deduped: min-label is idempotent under duplicate
    # edges, and the distinct would cost a build-time exchange+aggregate
    # that buys nothing (it only shrinks the per-round join by the
    # duplicate-loop fraction, which the floor dominates anyway)
    spark = pairs.sparkSession
    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(8, -(-4 * n_edges // 131_072))
    try:
        loop_parts = min(loop_parts, int(saved_parts))
    except (TypeError, ValueError):
        pass  # e.g. "auto" — keep the derived value
    spark.conf.set("spark.sql.adaptive.enabled", "true" if loop_aqe else "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        loops = pairs.select("src", F.col("src").alias("dst")).unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("dst").alias("dst"))
        )
        edges = tracked_persist(
            pairs.unionByName(
                pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .unionByName(loops)
            .repartition("dst")
        )
        # Fold the FIRST propagation hop into initialization: label(v) =
        # min over N(v)∪{v} (self-loop included) is exactly round 1 of the
        # loop over identity labels.
        from pyspark.sql import Observation

        label_frees: list = []
        obs0 = Observation("cc_round_init")
        labels = truncated_checkpoint(
            edges.groupBy("src")
            .agg(F.min("dst").alias("component"))
            .withColumnRenamed("src", "node")
            .observe(obs0, F.sum(F.xxhash64("node", "component").cast("decimal(38,0)")).alias("sig")),
            free_list=label_frees,
        )
        prev_sig = obs0.get["sig"]
        changed = 0 if max_iter == 0 else 1
        for i in range(max_iter):
            # no join-strategy hint: with the loop conf pinned (AQE off,
            # right-sized exchanges) the static planner's partitioned
            # join is already the cheapest round shape — a forced
            # broadcast would rebuild a labels-sized broadcast relation
            # on the driver three times per round.
            upd = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy("src")
                .agg(F.min("component").alias("component"))
                .withColumnRenamed("src", "node")
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
            #
            # ``jump_start``/``jumps_per_round`` tune the tradeoff: the
            # default (start after 2 plain rounds, 1 shortcut/round) wins on
            # tiny-diameter near-dup graphs where convergence is immediate
            # and a shortcut join is pure overhead; a caller that KNOWS its
            # graph is deep (the adversarial stress query) jumps from round
            # 0 with 2 chained shortcuts — each extra shortcut multiplies
            # the propagated distance again (d → ~4(d+1) per round instead
            # of ~2(d+1)), so round count drops from log2 to log4 of the
            # diameter while each round only adds one more label-table-sized
            # join inside the same job.
            if pointer_jumping and i >= jump_start:
                for _ in range(jumps_per_round):
                    ptr = upd.select(
                        F.col("node").alias("p_node"), F.col("component").alias("p_comp")
                    )
                    upd = upd.join(
                        ptr, upd["component"] == ptr["p_node"], "left"
                    ).select(
                        "node",
                        F.least(
                            F.col("component"),
                            F.coalesce(F.col("p_comp"), F.col("component")),
                        ).alias("component"),
                    )
            # (Batching k rounds per checkpoint was A/B'd and REJECTED: the
            # un-materialized intermediate round is referenced ~3× by the
            # next round's joins, and join branches do not CSE — the chain
            # re-EXECUTES the shared subtree per reference, 3× wall time at
            # k=2.  One checkpoint per round is the floor.)
            # convergence signal rides the checkpoint materialization as an
            # observe() metric — no separate count job and no old-vs-new
            # join: labels only move downward, so the multiset fixpoint test
            # "no label changed" ⇔ equal xxhash64 sums across rounds
            obs = Observation(f"cc_round_{i}")
            upd = upd.observe(
                obs, F.sum(F.xxhash64("node", "component").cast("decimal(38,0)")).alias("sig")
            )
            new_frees: list = []
            upd = truncated_checkpoint(upd, free_list=new_frees)
            sig = obs.get["sig"]
            changed = 0 if sig == prev_sig else 1
            prev_sig = sig
            # round i is materialized (localCheckpoint is eager) — round
            # i-1's labels blocks are unreachable now; free them.
            for free in label_frees:
                free()
            label_frees = new_frees
            labels = upd
            if changed == 0:
                break
        from cdc_practice_spark.plans.cache import track_free

        for free in label_frees:
            track_free(free)
        edges.unpersist()
        pairs.unpersist()
    finally:
        # the returned labels are checkpoint-materialized, so every job
        # that ran under the loop conf is already done — downstream
        # consumers plan under the caller's restored settings.
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
    if changed != 0:
        msg = (
            f"connected_components: max_iter={max_iter} exhausted with "
            f"labels still changing on the final round — component ids "
            f"are NOT converged (cluster diameter > max_iter); raise "
            f"max_iter"
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def _two_phase_components(
    pairs: DataFrame,
    out_schema,
    max_iter: int,
    strict: bool,
    local_threshold: int,
    pointer_jumping: bool,
    jump_start: int,
    jumps_per_round: int,
    loop_aqe: bool,
    pairs_persisted: bool = True,
) -> DataFrame:
    """Partition-local contraction + quotient gluing (the two_phase tier
    of ``connected_components`` — see its docstring).

    Phase 1 (no shuffle): each input partition runs driver-grade
    union-find over ITS edge subset inside one Arrow batch iterator —
    the per-partition generator sees every batch of exactly one
    partition, so the local components are exact for the subgraph the
    partition holds.  Output: (node, root) rows, root = min node of the
    node's partition-local component.  Edges are NEVER repartitioned
    first: the input's natural layout (range-generated ids, band-sorted
    pair output, time-ordered CDC keys) is precisely the locality the
    contraction exploits.

    Phase 2 (one exchange): group the mapping by node — a node seen by
    k partitions carries k roots, and those roots are provably in one
    global component (they share this node), so each multi-root node
    emits star edges (root → min root).  The quotient graph over roots
    is boundary-node-sized: driver union-find when it fits the gate,
    else the propagation loop on the CONTRACTED graph (recursion with
    ``two_phase=False`` — a second contraction pass could not shrink a
    hash-scattered quotient further).

    Exactness: partition-local contraction is a congruence (it only
    merges nodes already connected), and two local components belong to
    one global component iff a chain of shared nodes links them — which
    is exactly the quotient's connectivity.  Property-tested equivalent
    to union-find in tests/test_cluster_properties.py."""
    spark = pairs.sparkSession
    id_type = out_schema[0].dataType.simpleString()

    def gen(batches):
        import pandas as pd

        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        e = pd.concat(chunks)
        comp = _local_union_find(
            list(zip(e["src"].tolist(), e["dst"].tolist()))
        )
        yield pd.DataFrame(
            {"node": list(comp.keys()), "root": list(comp.values())}
        )

    mapping = tracked_persist(
        pairs.mapInPandas(gen, f"node {id_type}, root {id_type}")
    )
    # one exchange: per-node root set + its minimum (the glue lead)
    per_node = tracked_persist(
        mapping.groupBy("node")
        .agg(F.collect_set("root").alias("roots"))
        .select("node", "roots", F.array_min("roots").alias("lead"))
    )
    super_edges = tracked_persist(
        per_node.filter(F.size("roots") > 1)
        .select(F.explode("roots").alias("src"), F.col("lead").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    # gate-and-fetch in ONE action: ≤ threshold rows means we already
    # hold the complete quotient (limit t+1 returns ALL rows when fewer
    # exist); only an over-the-gate quotient pays a second job
    head = super_edges.limit(local_threshold + 1).collect()
    n_super = len(head)
    if n_super == 0:
        out = per_node.select("node", F.col("lead").alias("component"))
    else:
        if n_super <= local_threshold:
            import pandas as pd

            glue = _local_union_find([(r["src"], r["dst"]) for r in head])
            items = sorted(glue.items())
            # pandas → Arrow path: ~10× faster than a list-of-tuples
            # createDataFrame at the quotient sizes this tier sees
            glue_df = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "g_root": [k for k, _ in items],
                        "g_final": [v for _, v in items],
                    }
                ),
                schema=f"g_root {id_type}, g_final {id_type}",
            )
        else:
            # quotient still above the gate: finish with the propagation
            # loop on the CONTRACTED graph
            glue_df = connected_components(
                super_edges,
                a_col="src",
                b_col="dst",
                max_iter=max_iter,
                strict=strict,
                local_threshold=local_threshold,
                pointer_jumping=pointer_jumping,
                jump_start=jump_start,
                jumps_per_round=jumps_per_round,
                loop_aqe=loop_aqe,
                two_phase=False,
                # n_super is TRUNCATED at the gate (limit t+1), so it
                # must not size the loop's shuffle partitions — pass no
                # hint and let the fallback count the persisted quotient
                # (one cheap job) instead of underpartitioning (r7
                # ADVICE)
                n_edges_hint=None,
            ).select(
                F.col("node").alias("g_root"),
                F.col("component").alias("g_final"),
            )
        # every root of a node glues to the same final id, so looking up
        # the lead alone is sufficient (and keeps the join 1:1)
        out = (
            per_node.join(
                F.broadcast(glue_df)
                if n_super <= local_threshold
                else glue_df,
                per_node["lead"] == F.col("g_root"),
                "left",
            )
            .select(
                "node",
                F.coalesce(F.col("g_final"), F.col("lead")).alias("component"),
            )
        )
    if pairs_persisted:
        pairs.unpersist()
    # callers reference the labels more than once (stats + sizes + the
    # dedup join); the loop tier returns a materialized checkpoint, so
    # this tier persists for the same multi-reference contract
    return tracked_persist(out)


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
