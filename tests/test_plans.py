"""Physical-plan regression tests — the 100 TB properties.

Correctness tests prove the right answer; these prove the right PLAN:
filters pushed into scans, column pruning, one-exchange CDC pipelines,
broadcast dims, TakeOrderedAndProject for top-k.  A regression here
means a query got slower at scale even if sf0.01 still passes.
"""

from __future__ import annotations

import re

import pytest

from cdc_practice_spark.plans.explain import plan_string
from cdc_practice_spark.queries import registry

registry.load_all()


def plan_of(spark, sf_dir, name: str, mode: str = "extended") -> str:
    return plan_string(registry.QUERIES[name](spark, sf_dir), mode)


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 11-column fact scan reads only the 7 needed
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m and "l_orderkey" not in m.group(1) and "l_partkey" not in m.group(1)
    assert "HashAggregate" in plan and "partial_sum" in plan  # map-side combine


def test_snapshot_single_exchange(spark, sf_dir):
    """The whole CDC snapshot pipeline (dedup + change_type + carry +
    latest-per-key) must run on ONE exchange and ONE sort."""
    plan = plan_of(spark, sf_dir, "cdc_current_snapshot", "formatted")
    body = plan.split("\n\n")[0]  # tree section
    assert body.count("Exchange") == 1
    assert body.count("Sort") == 1


def test_history_single_exchange(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "cdc_history", "formatted")
    body = plan.split("\n\n")[0]
    assert body.count("Exchange") == 1


def test_topk_uses_take_ordered(spark, sf_dir):
    """orderBy+limit must compile to TakeOrderedAndProject (per-partition
    heaps), never a global Sort."""
    for q in ("q2_topk_changes", "tpch_q3_shipping_priority", "top_customers_by_spend"):
        plan = plan_of(spark, sf_dir, q)
        assert "TakeOrderedAndProject" in plan, q


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan  # supplier×nation×region dim side
    # the ASIA region filter must prune before the join, not after
    assert re.search(r"r_name.*ASIA|ASIA.*r_name", plan)


def test_equality_filter_pushed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_filter_equality")
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)" in plan


def test_semi_anti_joins_in_plan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_semi_anti_part_usage")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_no_cartesian_in_lsh(spark, sf_dir):
    """The minhash candidate join must be an equality join on band keys —
    an O(N²) cartesian product here would be a scale catastrophe."""
    plan = plan_of(spark, sf_dir, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q10_filters_pushed_and_topk(spark, sf_dir):
    """Q10: both the orders date window and the lineitem returnflag
    filter must reach their parquet scans; the final top-20 must be a
    TakeOrderedAndProject, not a global sort."""
    plan = plan_of(spark, sf_dir, "tpch_q10_returned_items")
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "TakeOrderedAndProject" in plan


def test_q19_derives_single_side_filters(spark, sf_dir):
    """Q19's OR-of-ANDs spans both join sides; Catalyst must still derive
    the per-side implications and push them into the scans (a scan
    reading every part row here would read 25x too much at 100 TB)."""
    plan = plan_of(spark, sf_dir, "tpch_q19_disjunctive_revenue")
    # part scan: brand/size disjunction pushed
    assert "Or(Or(And(EqualTo(p_brand,Brand#12)" in plan
    # lineitem scan: quantity-range disjunction pushed
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan


def test_q18_semi_join_shape(spark, sf_dir):
    """Q18's IN-subquery must plan as a semi join against the
    HAVING-filtered aggregate — never a full join that duplicates
    lineitem rows before re-aggregating."""
    plan = plan_of(spark, sf_dir, "tpch_q18_large_volume_orders")
    assert "LeftSemi" in plan


def test_q22_anti_join_and_broadcast_scalar(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q22_idle_rich_customers")
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # recent-orders filter pushed


def test_q3_broadcast_is_size_gated(spark, sf_dir):
    """q3's fact-side broadcast must be decided by a runtime row count,
    not a hard-coded hint: above the threshold the li⋈orders join must
    fall back to a shuffle join (AQE's domain), below it the measured
    broadcast win is kept.  A hint that must be hand-removed at 100 TB
    is a latent scale-killer."""
    from cdc_practice_spark.queries.analytics import tpch_q3_shipping_priority
    from cdc_practice_spark.plans.explain import plan_string

    # threshold 0: building_orders "too big" → the code must inject NO
    # broadcast hint for it; the only ResolvedHint left in the logical
    # plan is the genuinely-dim customer side.  (At test scale Catalyst
    # may still pick broadcast from its own size estimates — that's its
    # call to make, and AQE's to revise; what we assert is that WE no
    # longer force it.)
    def analyzed_hints(plan: str) -> int:
        section = plan.split("== Analyzed Logical Plan ==")[1].split("==")[0]
        return section.count("ResolvedHint (strategy=broadcast)")

    gated = plan_string(tpch_q3_shipping_priority(spark, sf_dir, 0))
    assert analyzed_hints(gated) == 1

    # default threshold at test scale: runtime count passes → hint kept
    # (the measured win) and the physical join is a broadcast
    hinted = plan_string(tpch_q3_shipping_priority(spark, sf_dir))
    assert analyzed_hints(hinted) == 2
    assert "BroadcastHashJoin" in hinted


def test_range_join_is_equi_join(spark, sf_dir):
    """The interval-containment join must hash/sort-merge on the user_id
    equality key with the time range as residual — a nested-loop here is
    O(N²) at scale."""
    plan = plan_of(spark, sf_dir, "range_join_post_purchase")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_memo_view_returns_same_plan_and_pins_confs(spark, sf_dir):
    """memo_view caches the logical plan per (session, key) and re-pins
    the execution-time confs even on a memo hit (a hostile caller may
    flip the session timezone between queries)."""
    from cdc_practice_spark.session import load_table, memo_view

    calls = []

    def build():
        calls.append(1)
        return load_table(spark, sf_dir, "events").select("event_id")

    a = memo_view(spark, ("test_view", sf_dir), build)
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        b = memo_view(spark, ("test_view", sf_dir), build)
        assert b is a and len(calls) == 1
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark._cps_view_cache.pop(("test_view", sf_dir), None)


def test_spread_for_python_gates_on_parallelism(spark, sf_dir):
    """Coarse inputs (single-row-group parquet scans as ONE task) get a
    round-robin exchange before Python map stages; already-wide inputs
    pass through with NO added exchange."""
    from cdc_practice_spark.plans.hints import spread_for_python
    from cdc_practice_spark.session import load_table

    p = spark.sparkContext.defaultParallelism
    coarse = load_table(spark, sf_dir, "documents")
    assert coarse.rdd.getNumPartitions() < p
    spread = spread_for_python(coarse)
    assert spread.rdd.getNumPartitions() == p

    wide = coarse.repartition(p)
    assert spread_for_python(wide) is wide  # no-op, no extra exchange


def test_bloom_reduce_join_filters_before_exchange(spark, sf_dir):
    """runtime_bloom_semijoin: the Bloom membership predicate must sit on
    the FACT side below the join exchange (that's the whole point — fewer
    rows shuffle), stay all-JVM (no Python eval), and actually reduce the
    fact rows to ~|matches| + fpp."""
    from cdc_practice_spark.plans.runtime_filter import (
        bloom_reduce_join,
        build_bloom_row,
        might_contain,
    )
    from cdc_practice_spark.session import load_table
    from pyspark.sql import functions as F

    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    words_row, n_bits = build_bloom_row(dim, "c_custkey")
    # the probe predicate is pure codegen: getbit/element_at over the
    # 1-row-broadcast bitmap column — no BatchEvalPython / ArrowEvalPython
    probe = orders.join(F.broadcast(words_row)).filter(
        might_contain("o_custkey", "__bloom_words", n_bits)
    )
    plan = plan_string(probe, "extended")
    assert "Python" not in plan and "getbit" in plan
    n_fact = orders.count()
    n_surv = probe.count()
    n_true = orders.join(dim, orders.o_custkey == dim.c_custkey).count()
    # no false negatives + fpp bounded: survivors within 1% of fact rows
    # above the true matches (16 bits/key, k=5 → ~0.1% expected)
    assert n_true <= n_surv <= n_true + max(10, n_fact // 100)
    # exactness of the full reduced join
    got = sorted(
        (r.o_custkey, r.o_totalprice)
        for r in bloom_reduce_join(orders, dim, "o_custkey", "c_custkey").collect()
    )
    want = sorted(
        (r.o_custkey, r.o_totalprice)
        for r in orders.join(dim, orders.o_custkey == dim.c_custkey).collect()
    )
    assert got == want


def test_cap_per_source_pushes_partial_window_group_limit(spark, sf_dir):
    """corpus_cap_per_source's rnk<=10 filter must become a PARTIAL
    WindowGroupLimit BELOW the source-key exchange — each map partition
    ships at most k rows per source, so a billion-doc source never
    materializes a full sort (the top-k-per-group scale property)."""
    plan = plan_of(spark, sf_dir, "corpus_cap_per_source")
    m = re.search(
        r"WindowGroupLimit .*?row_number\(\), 10, Partial", plan
    )
    assert m, "partial WindowGroupLimit missing"
    # the Partial group-limit must appear AFTER (i.e. below) the exchange
    # in the printed tree: Exchange line precedes it
    exch = plan.index("Exchange hashpartitioning(source")
    assert m.start() > exch


def test_triangle_wedge_join_has_no_cartesian(spark, sf_dir):
    """graph_triangle_count: the wedge self-join and closing join must
    both be key-equi joins — a cartesian/nested-loop here is the naive
    all-pairs plan the degree orientation exists to avoid."""
    plan = plan_of(spark, sf_dir, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    # the only BroadcastNestedLoopJoin allowed is the final 1-row
    # total_triangles crossJoin
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_weighted_sample_is_shuffle_free_topk(spark, sf_dir):
    """corpus_weighted_sample must lower to TakeOrderedAndProject over a
    pure projection — per-partition heaps, no Exchange anywhere (the
    exact-k sample never globally sorts the corpus)."""
    plan = plan_of(spark, sf_dir, "corpus_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    phys = plan[plan.index("== Physical Plan =="):]
    assert "Exchange" not in phys


def test_bm25_map_side_zero_exchange(spark, sf_dir):
    """BM25 scoring (r6 shape) is one codegen'd map-side projection:
    per-term boundary-regex counts fold into Σ contrib(tf_t, df_t) with
    every corpus statistic an index-metadata literal, so the whole plan
    is scan → filter → project → TakeOrderedAndProject — NO exchange,
    NO join, no global sort, no window.  The r5 shape (df broadcast
    join + per-doc aggregation) must not creep back."""
    plan = plan_of(spark, sf_dir, "text_bm25_topk", "formatted")
    body = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in body
    assert "Exchange" not in body
    assert "Join" not in body


def test_fused_incremental_mv_two_exchanges(spark, sf_dir):
    """The r5 fused one-pass MV refresh must keep exactly two exchanges:
    the key-partitioned max_by aggregation and the group aggregation —
    the six-exchange separate-frames shape must not creep back."""
    plan = plan_of(spark, sf_dir, "cdc_incremental_mv", "formatted")
    body = plan.split("\n\n")[0]
    assert body.count("Exchange") <= 2, body.count("Exchange")


def test_topk_mv_fused_single_group_aggregation(spark, sf_dir):
    """topk_mv (r6 fused shape): one LINEAR pipeline — the stored
    prefix, every delta statistic, AND the endangered-group re-derived
    prefix all come out of one exchange-on-group sort (two conditional
    running-count ranks over the same ordering) feeding one aggregation.
    ZERO joins of any kind and exactly two exchanges (per-key max_by,
    per-group window+agg); the r5 shapes — chained FullOuter sort-merge
    joins, then a broadcast semi-join re-derive branch — must not creep
    back."""
    plan = plan_of(spark, sf_dir, "cdc_incremental_topk_mv", "formatted")
    body = plan.split("\n\n")[0]
    assert "Join" not in body, body
    assert body.count("Exchange") <= 2, body.count("Exchange")
    assert body.count("Sort (") <= 3, body  # key-agg ride + one group sort


def test_rag_chunking_is_shuffle_free(spark, sf_dir):
    """Sliding-window chunking must stay map-side only: tokenize →
    generate offsets → slice, with NO exchange anywhere — chunk rows
    land partition-local to their documents."""
    plan = plan_of(spark, sf_dir, "rag_chunk_overlap", "formatted")
    body = plan.split("\n\n")[0]
    assert "Exchange" not in body, body


def test_token_budget_mix_single_source_exchange(spark, sf_dir):
    """The token-budget cumsum pays exactly one exchange (hash on
    source for the per-source window) — the quality/token projection
    must not add its own."""
    plan = plan_of(spark, sf_dir, "corpus_token_budget_mix", "formatted")
    body = plan.split("\n\n")[0]
    assert body.count("Exchange") <= 1, body


def test_phash_near_dup_no_cartesian(spark, sf_dir):
    """The perceptual-hash pair join must stay a banded equi-join —
    never a cartesian/nested-loop pair enumeration."""
    plan = plan_of(spark, sf_dir, "multimodal_phash_near_dup", "formatted")
    body = plan.split("\n\n")[0]
    assert "CartesianProduct" not in body


def test_hybrid_rrf_no_cartesian_and_take_ordered(spark, sf_dir):
    """Each retrieval leg must end in TakeOrdered (no global sort of
    the corpus) and the fusion must not degrade to a cartesian pair
    join (the only nested-loop allowed is the 1-row corpus-stats
    broadcast inside the BM25 leg)."""
    plan = plan_of(spark, sf_dir, "hybrid_retrieval_rrf", "formatted")
    body = plan.split("\n\n")[0]
    assert "CartesianProduct" not in body
    assert "TakeOrderedAndProject" in body


def test_retro_audit_broadcasts_benchmark_no_cartesian(spark, sf_dir):
    """streaming_corpus_retro_audit (r9): the new benchmark's gram set
    must arrive as a BROADCAST side of an equality join — never a
    shuffle of the admitted grams against it, never a nested loop —
    and the audit's own plan must read the store's parquet, not rerun
    the stream."""
    plan = plan_of(spark, sf_dir, "streaming_corpus_retro_audit")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_purge_apply_output_reads_store_only(spark, sf_dir):
    """corpus_purge_apply's RESULT plan is a plain scan+sort over the
    purged store's disposition parquet — the purge work happened in the
    maintenance op, not in the query plan (no joins, no corpus scan)."""
    plan = plan_of(spark, sf_dir, "corpus_purge_apply")
    assert "FileScan parquet" in plan
    assert "documents.parquet" not in plan
    assert "Join" not in plan


def test_hard_negatives_partial_window_group_limit(spark, sf_dir):
    """embedding_hard_negatives: the rank<=5 filter must become a
    PARTIAL WindowGroupLimit below the anchor exchange (each map
    partition ships 5 rows per anchor), and the 4-anchor side must
    broadcast — never shuffle the corpus against it."""
    plan = plan_of(spark, sf_dir, "embedding_hard_negatives")
    m = re.search(r"WindowGroupLimit .*?row_number\(\), 5, Partial", plan)
    assert m, "partial WindowGroupLimit missing"
    exch = plan.index("Exchange hashpartitioning(anchor_id")
    assert m.start() > exch
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_filtered_topk_prunes_to_chosen_cells(spark, sf_dir):
    """ann_filtered_topk: the chosen-cell set must PUSH into the
    embeddings scan (partition pruning on a cell-partitioned layout),
    the lang filter into the documents scan, and the top-k must be a
    TakeOrderedAndProject — no global sort, no unpruned store read."""
    plan = plan_of(spark, sf_dir, "ann_filtered_topk")
    assert re.search(r"PushedFilters: \[.*(In|EqualTo)\(label", plan), (
        "cell filter not pushed into the embeddings scan"
    )
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,en\)", plan), (
        "metadata filter not pushed into the documents scan"
    )
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan  # id join broadcasts at this size


def test_txn_gate_aggs_are_map_side_combined(spark, sf_dir):
    """cdc_txn_boundary_apply: both per-txn count aggregations must be
    partial (map-side combined) HashAggregates — the txn-metadata pass
    must never ship raw feed rows to the reduce side."""
    plan = plan_of(spark, sf_dir, "cdc_txn_boundary_apply")
    assert len(re.findall(r"partial_count", plan)) >= 2, (
        "per-txn counts not map-side combined"
    )
