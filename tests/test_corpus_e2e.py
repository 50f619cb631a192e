"""Composed end-to-end corpus pipeline (r7): single-scan plan proof,
row conservation, and load-bearing stage funnel.

The chain (lang-id → quality P25 → MinHash keep-best dedup →
decontaminate → temperature mix → greedy pack) is hash-verified against
the DuckDB oracle by the registry gate; these tests pin the two claims
the oracle can't see — that the whole chain reads `documents` exactly
once, and that the stages PARTITION the corpus (every doc lands in
exactly one kept/dropped bucket).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_practice_spark.queries.pipeline_queries import corpus_e2e_stages


def _walk_direct_scans(node, caches):
    """Count FileSourceScanExec over documents reachable WITHOUT
    crossing a cache boundary; cached child plans met at boundaries are
    appended to ``caches`` for the caller to walk separately."""
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        return _walk_direct_scans(node.initialPlan(), caches)
    if cls == "InMemoryTableScanExec":
        caches.append(node.relation().cacheBuilder().cachedPlan())
        return 0
    if cls == "FileSourceScanExec":
        return 1 if "documents" in node.toString() else 0
    n = 0
    it = node.children().iterator()
    while it.hasNext():
        n += _walk_direct_scans(it.next(), caches)
    return n


def test_e2e_pipeline_single_documents_scan(spark, sf_dir):
    """The composed pipeline touches the raw corpus EXACTLY once: the
    final packed plan has zero direct `documents` file scans (every leaf
    is a persisted feature frame), and among all distinct cached plans
    reachable through the cache graph exactly ONE (the single-pass
    feature projection) scans `documents`."""
    st = corpus_e2e_stages(spark, sf_dir)
    caches = []
    direct = _walk_direct_scans(
        st["s6_packed"]._jdf.queryExecution().executedPlan(), caches
    )
    assert direct == 0, "final plan must not re-scan documents"

    doc_caches = 0
    visited: set[str] = set()
    frontier = list(caches)
    while frontier:
        c = frontier.pop()
        key = c.toString()
        if key in visited:
            continue
        visited.add(key)
        inner: list = []
        if _walk_direct_scans(c, inner) > 0:
            doc_caches += 1
        frontier.extend(inner)
    assert doc_caches == 1, (
        f"exactly one cached plan may scan documents, found {doc_caches}"
    )


def test_e2e_pipeline_row_conservation(spark, sf_dir):
    """Every input document lands in EXACTLY one disposition bucket:
    dropped-by-lang, dropped-by-quality, dropped-as-duplicate,
    dropped-contaminated, dropped-by-mix, or kept (packed).  A doc lost
    between stages (or duplicated by a bad join) breaks the partition."""
    st = corpus_e2e_stages(spark, sf_dir)
    ids = {
        name: {r["doc_id"] for r in st[name].select("doc_id").collect()}
        for name in (
            "s0_base",
            "s1_lang",
            "s2_quality",
            "s3_dedup",
            "s4_decontam",
            "s5_mix",
            "s6_packed",
        )
    }
    buckets = [
        ids["s0_base"] - ids["s1_lang"],       # dropped_lang
        ids["s1_lang"] - ids["s2_quality"],    # dropped_quality
        ids["s2_quality"] - ids["s3_dedup"],   # dropped_dup
        ids["s3_dedup"] - ids["s4_decontam"],  # dropped_contaminated
        ids["s4_decontam"] - ids["s5_mix"],    # dropped_mix
        ids["s5_mix"],                         # kept
    ]
    # each stage is a subset chain (no doc re-appears downstream)
    assert ids["s1_lang"] <= ids["s0_base"]
    assert ids["s2_quality"] <= ids["s1_lang"]
    assert ids["s3_dedup"] <= ids["s2_quality"]
    assert ids["s4_decontam"] <= ids["s3_dedup"]
    assert ids["s5_mix"] <= ids["s4_decontam"]
    # packing is a relabeling of the mix survivors, not a filter
    assert ids["s6_packed"] == ids["s5_mix"]
    # the buckets partition the corpus: disjoint and covering
    assert sum(len(b) for b in buckets) == len(ids["s0_base"])
    union = set().union(*buckets)
    assert union == ids["s0_base"]


def test_e2e_pipeline_every_stage_load_bearing(spark, sf_dir):
    """Each stage must DROP at least one document at the test SF —
    otherwise its oracle verification is vacuous (the r6
    streaming_heavy_hitters lesson)."""
    st = corpus_e2e_stages(spark, sf_dir)
    counts = {
        name: st[name].count()
        for name in (
            "s0_base",
            "s1_lang",
            "s2_quality",
            "s3_dedup",
            "s4_decontam",
            "s5_mix",
        )
    }
    order = [
        "s0_base",
        "s1_lang",
        "s2_quality",
        "s3_dedup",
        "s4_decontam",
        "s5_mix",
    ]
    for prev, cur in zip(order, order[1:]):
        assert counts[cur] < counts[prev], (
            f"{cur} dropped nothing ({counts[cur]} == {counts[prev]})"
        )
    assert counts["s5_mix"] > 0
    # packing produces multiple bins per source (capacity is binding)
    n_bins = st["s6_packed"].select("source", "bin_id").distinct().count()
    n_sources = st["s6_packed"].select("source").distinct().count()
    assert n_bins > n_sources


def test_e2e_incremental_disposition_partitions_batch(spark, sf_dir):
    """Incremental ingest: every batch doc appears EXACTLY once with a
    valid disposition; kept docs carry bin assignments, dropped ones
    don't; and every stage drops at least one doc at the test SF (the
    oracle gate is load-bearing for each stage)."""
    from pyspark.sql import functions as F

    from cdc_practice_spark.queries.pipeline_queries import (
        _INCR_BATCH_MOD,
        corpus_e2e_incremental,
    )
    from cdc_practice_spark.session import load_table

    rows = corpus_e2e_incremental(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_batch = docs.filter(F.col("doc_id") % _INCR_BATCH_MOD == 3).count()
    assert len(rows) == n_batch
    assert len({r.doc_id for r in rows}) == n_batch
    stages = {
        "dropped_lang",
        "dropped_quality",
        "dropped_dup",
        "dropped_contaminated",
        "dropped_mix",
        "kept",
    }
    seen = {r.disposition for r in rows}
    assert seen <= stages
    assert seen == stages, f"some stage never fired: {stages - seen}"
    for r in rows:
        if r.disposition == "kept":
            assert r.bin_id is not None and r.bin_fill is not None
        else:
            assert r.bin_id is None and r.bin_fill is None

def test_decontaminate_catches_partial_copy_fp_misses(spark):
    """The r8 8-gram rule is strictly stronger where it matters: a doc
    that EMBEDS a benchmark passage (shared 8-gram) but differs as a
    whole document (different sorted-distinct-token fingerprint — the
    r7 rule's key) must be dropped, while a doc merely sharing
    vocabulary with the benchmark (same token SET, no 8-token span in
    common — which the old fp rule wrongly dropped) must survive."""
    from cdc_practice_spark.operators.corpus import (
        corpus_features,
        decontaminate,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (100, "bench", bench_text),
        # partial copy: new prefix + the full benchmark 8-gram
        (1, "web", "totally unrelated preamble text " + bench_text),
        # vocabulary-only overlap: same token SET as the benchmark,
        # different order → same fp, zero shared 8-grams
        (2, "web", "theta eta zeta epsilon delta gamma beta alpha"),
        # clean doc
        (3, "web", "completely different words with no overlap at all"),
    ]
    feats = corpus_features(
        spark.createDataFrame(rows, ["doc_id", "source", "text"])
    ).persist()
    bench = (
        feats.filter(F.col("doc_id") == 100)
        .select(F.explode("g8").alias("g"))
        .distinct()
    )
    kept = {
        r["doc_id"]
        for r in decontaminate(
            feats.filter(F.col("doc_id") != 100), bench
        ).collect()
    }
    assert kept == {2, 3}, kept
    # sanity: doc 2 shares the benchmark's fp (the old rule would have
    # dropped it), doc 1 does not (the old rule would have missed it)
    fps = {r["doc_id"]: r["fp"] for r in feats.select("doc_id", "fp").collect()}
    assert fps[2] == fps[100] and fps[1] != fps[100]
