"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the noop sink (no driver-side
collect — measures the distributed plan, not result transfer).  A small
sf0.001 warmup run first amortizes JVM/codegen startup out of the
measured numbers, mirroring steady-state cluster behavior.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_practice_spark.plans.cache import release_tracked
from cdc_practice_spark.queries import registry
from cdc_practice_spark.session import get_spark

HEADLINE = [
    # CDC core (the reference's semantic surface)
    "cdc_current_snapshot",
    "cdc_history",
    "cdc_user_stats",
    # CDC scale tiers (r4/r5): temporal join, delta-maintained MVs
    "cdc_scd2_asof_join",
    "cdc_incremental_mv",
    "cdc_incremental_topk_mv",
    # relational analytics
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q18_large_volume_orders",
    "tpch_q21_waiting_suppliers",
    "top_customers_by_spend",
    "runtime_bloom_semijoin",
    "window_rank_orders",
    "event_time_tumbling_agg",
    # event-sequence + time-series operators
    "event_sessionization",
    "asof_purchase_attribution",
    "timeseries_resample_ffill",
    # training-data pipeline operators
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_minhash_clusters",
    "text_quality",
    "corpus_quality_filter",
    "ngram_lm_score",
    "pack_sequences_greedy",
    "ann_cosine_topk",
    "hybrid_retrieval_rrf",
    "embedding_topk_pairs",
    "embedding_quantize_int8",
    "semantic_dedup_keep",
    # r7: the composed curation chain (lang-id → quality → dedup →
    # decontaminate → mix → pack) — what a real corpus run executes;
    # one documents scan feeds all six stages (plan-tested)
    "corpus_e2e_pipeline",
    # distributed-tier CC stress: synthetic >200k-edge power-law +
    # long-chain graph (queries/graph_queries.py) — sf-independent; its
    # DuckDB oracle twin is the CLOSED-FORM expected structure, not a CC
    # computation, so exclude it from engine-vs-engine ratio readings
    # (see BENCHNOTES; tools/ab_cc.py has the real A/B).
    "cc_adversarial_graph",
    # second graph headline: unlike cc_adversarial_graph, its DuckDB
    # twin RUNS the triangle computation (naive 3-way join), so this is
    # a true engine-vs-engine entry — oriented wedge join vs naive.
    "graph_triangle_count",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    registry.load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup at the smallest sf: JVM + whole-stage-codegen + parquet
    # footer caches.  Generalized r13 (VERDICT r12 ask #4): codegen is
    # keyed on PLAN SHAPE, not data volume, and the graph queries'
    # first-execution JIT alone is ~7 s — running every headline shape
    # once at sf0.001 (untimed, like the two-query warmup before it)
    # makes each min-of-N repeat a steady-state measurement, which is
    # what a warm cluster executes.  Data caches are released after, so
    # the timed repeats still compute everything from parquet.
    for name in HEADLINE:
        fn = registry.QUERIES.get(name)
        if fn is not None:
            materialize(fn(spark, "/root/testdata/sf0.001"))
            release_tracked()
    # Python-worker pre-warm (r13 — VERDICT r12 ask #8): the first
    # mapInPandas stage of a session pays one python daemon fork +
    # pandas/numpy import PER CORE (~5-15 s across 32 workers), which is
    # session setup, not query work — a steady-state cluster has warm
    # workers.  One tiny batch per core spawns and warms them all here
    # so no measured repeat carries it.
    def _warm(batches):
        import numpy  # noqa: F401 — pay the kernel imports once
        import pandas  # noqa: F401

        yield from batches

    spark.range(
        spark.sparkContext.defaultParallelism,
        numPartitions=spark.sparkContext.defaultParallelism,
    ).mapInPandas(_warm, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        best = None
        for _ in range(repeats):  # min-of-N: steady-state (run 1 pays codegen)
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            release_tracked()  # drop operator-internal caches between runs
        per_query[name] = round(best, 3)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                # driver-verifiable environment echo (r13 — VERDICT r12
                # ask #2): the effective core count the session actually
                # runs with (local[$SPARK_GRAFT_CPUS] → defaultParallelism)
                # and the resolved data dir, so the scaling probe can
                # confirm the env contract was honored.  NOTE for the
                # c8-vs-c32 comparison: at sf0.1 every headline query is
                # sub-second and scheduling-floor-bound (single-file
                # fixtures, fixed 32 shuffle partitions), so ratios ≈ 1
                # are expected — the probe distinguishes cores only on
                # ≥1 s queries (see BENCHNOTES).
                "cpus_effective": spark.sparkContext.defaultParallelism,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
