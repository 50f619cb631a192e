"""Similarity-search operator semantics + IVF/batch consistency with the
exact baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.operators import similarity as S
from cdc_practice_spark.session import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def qvec(emb):
    return list(emb.filter(F.col("vec_id") == 0).head().embedding)


def test_brute_force_self_is_top1(emb, qvec):
    top = S.brute_force_topk(emb, qvec, k=5).collect()
    assert top[0].vec_id == 0
    assert top[0].cosine == 1.0
    assert all(top[i].cosine >= top[i + 1].cosine for i in range(4))


def test_ivf_matches_brute_force_top1(emb, qvec):
    """With nprobe covering the query's own cell, IVF recalls the exact
    top result (and usually most of the top-k)."""
    exact = [r.vec_id for r in S.brute_force_topk(emb, qvec, k=10).collect()]
    approx = [r.vec_id for r in S.ivf_topk(emb, qvec, k=10, nprobe=3).collect()]
    assert approx[0] == exact[0] == 0
    # IVF scans a subset, so it returns a subset-ranking: every id it
    # returns must appear in the exact full ranking order-consistently
    assert set(approx) <= set(
        r.vec_id for r in S.brute_force_topk(emb, qvec, k=500).collect()
    )


def test_blocked_pairs_symmetric_and_bounded(emb):
    pairs = S.topk_similar_pairs(emb, k=10).collect()
    assert len(pairs) == 10
    for r in pairs:
        assert r.id_a < r.id_b
        assert -1.0 <= r.cosine <= 1.0


def test_pandas_pairs_match_expression_variant(emb):
    """The GEMM applyInPandas implementation and the pure-JVM expression
    variant must agree exactly (round-6 + identical tiebreaks)."""
    fast = [(r.id_a, r.id_b, r.cosine) for r in S.topk_similar_pairs(emb, k=15).collect()]
    ref = [
        (r.id_a, r.id_b, r.cosine)
        for r in S.topk_similar_pairs_expr(emb, k=15).collect()
    ]
    assert fast == ref


def test_batch_scorer_matches_exact(emb, spark):
    """mapInPandas numpy scorer agrees with the JVM-expression cosine to
    float tolerance."""
    qm = [list(r.embedding) for r in emb.filter(F.col("vec_id") < 2).orderBy("vec_id").collect()]
    batch = {r.vec_id: r for r in S.batch_topk_mapinpandas(emb, qm).collect()}
    # vec 0 and 1 must best-match themselves with cosine 1
    assert batch[0].best_query == 0 and abs(batch[0].best_cosine - 1.0) < 1e-9
    assert batch[1].best_query == 1 and abs(batch[1].best_cosine - 1.0) < 1e-9
    exact0 = {
        r.vec_id: r.cosine for r in S.brute_force_topk(emb, qm[0], k=500).collect()
    }
    for vid, r in list(batch.items())[:50]:
        if r.best_query == 0:
            assert abs(exact0[vid] - r.best_cosine) < 1e-5


def test_ivf_assign_matches_expression_twin(emb):
    """The r12 Arrow assignment kernel must reproduce the JVM
    literal-distance expression BIT-FOR-BIT (cells partition persisted
    stores; dist2 feeds decimal-summed drift stats)."""
    from cdc_practice_spark.operators import similarity as Si
    from cdc_practice_spark.functions.vectors import to_double

    cents = Si.kmeans_centroids(emb, k=8, n_iter=1)
    got = {
        r.vec_id: (r.cell, r.dist2)
        for r in Si.ivf_assign(emb, cents).collect()
    }
    v = to_double(F.col("embedding"))
    emb_v = emb.select("vec_id", v.alias("v"))
    want = {
        r.vec_id: (r.cell, r.dist2)
        for r in emb_v.withColumn("_d", Si._ivf_dists_col(cents))
        .select(
            "vec_id",
            (F.array_position(F.col("_d"), F.array_min(F.col("_d"))) - 1)
            .cast("int")
            .alias("cell"),
            F.array_min(F.col("_d")).alias("dist2"),
        )
        .collect()
    }
    assert got == want


def test_kmeans_assignment_properties(emb):
    """k-means index build: every vector gets exactly one cell in
    [0, k); the init vectors 0..k-1 end up in the cell whose centroid
    they seeded or a better one; objective (sum dist2) does not increase
    when iterating more."""
    out1 = S.kmeans_fit_assign(emb, k=4, n_iter=1).collect()
    out2 = S.kmeans_fit_assign(emb, k=4, n_iter=2).collect()
    n = emb.count()
    assert len(out1) == len(out2) == n
    assert {r.cell for r in out2} <= set(range(4))
    obj1 = sum(r.dist2 for r in out1)
    obj2 = sum(r.dist2 for r in out2)
    assert obj2 <= obj1 + 1e-6  # Lloyd's monotonicity


def test_kmeans_deterministic_across_runs(emb):
    a = sorted((r.vec_id, r.cell, r.dist2) for r in S.kmeans_fit_assign(emb, k=4, n_iter=2).collect())
    b = sorted((r.vec_id, r.cell, r.dist2) for r in S.kmeans_fit_assign(emb, k=4, n_iter=2).collect())
    assert a == b


def test_ivf_probe_prunes_partitioned_index(spark, sf_dir, tmp_path):
    """The docstring claim in ivf_topk, proven: with the embedding
    corpus laid out partitioned by cell (the IVF-lists-as-directories
    layout for 100 TB), the probe's cell filter becomes PARTITION
    pruning — the scan plan lists only the probed cells' directories,
    and the result is identical to probing the unpartitioned table."""
    from pyspark.sql import functions as F

    from cdc_practice_spark.operators.similarity import ivf_topk
    from cdc_practice_spark.plans.explain import plan_string
    from cdc_practice_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf_index")
    emb.write.partitionBy("label").parquet(idx)
    part_emb = spark.read.parquet(idx).select("vec_id", "embedding", "label")

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    want = [(r.vec_id, r.cosine) for r in ivf_topk(emb, qv, k=10, nprobe=3).collect()]
    got_df = ivf_topk(part_emb, qv, k=10, nprobe=3)
    got = [(r.vec_id, r.cosine) for r in got_df.collect()]
    assert got == want

    plan = plan_string(got_df)
    # the final probe scan must carry partition filters on label
    assert "PartitionFilters: [" in plan
    m = [ln for ln in plan.splitlines() if "PartitionFilters: [label" in ln or
         ("PartitionFilters" in ln and "label" in ln)]
    assert m, plan[:1500]


def test_pq_encode_shape_and_code_range(emb):
    """PQ codes: m entries, each in [0, ksub); stored norm matches the
    exact vector norm — the compression contract (8 bytes + norm vs 256
    raw bytes)."""
    import math

    from cdc_practice_spark.operators import quantization as Q

    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=1)
    assert len(cb) == 8 and len(cb[0]) == 16 and len(cb[0][0]) == 8
    rows = Q.pq_encode(emb, cb).limit(50).collect()
    want_ids = [r.vec_id for r in rows]
    raw = {
        r.vec_id: list(r.embedding)
        for r in emb.filter(F.col("vec_id").isin(want_ids)).collect()
    }
    for r in rows:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)
        expect = round(math.sqrt(sum(float(x) ** 2 for x in raw[r.vec_id])), 6)
        assert abs(r.norm - expect) < 1e-5


def test_pq_recall_beats_floor_and_is_deterministic(emb, qvec):
    """ADC shortlist + exact rerank recovers ≥ half of the exact top-10
    (the ann_pq_recall decision threshold), and two independent train
    runs produce identical codebooks (round-6 + first-k init)."""
    from cdc_practice_spark.operators import quantization as Q

    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=2)
    assert cb == Q.pq_train(emb, m=8, ksub=16, n_iter=2)
    pq_ids = {r.vec_id for r in Q.pq_topk(emb, cb, qvec, k=10, shortlist=50).collect()}
    exact_ids = {r.vec_id for r in S.brute_force_topk(emb, qvec, k=10).collect()}
    assert len(pq_ids & exact_ids) >= 5
    assert 0 in pq_ids  # the query vector itself must survive quantization


def test_pq_rerank_scores_are_exact_cosine(emb, qvec):
    """Whatever the shortlist contains, the RETURNED scores are exact:
    every (id, cosine) pair must equal the brute-force score for that id."""
    from cdc_practice_spark.operators import quantization as Q

    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=1)
    got = {r.vec_id: r.cosine for r in Q.pq_topk(emb, cb, qvec, k=10).collect()}
    exact = {
        r.vec_id: r.cosine
        for r in S.brute_force_topk(emb, qvec, k=len(got) + 490).collect()
    }
    for vid, cos in got.items():
        assert cos == exact[vid]


def test_centroid_outliers_flags_planted_outlier(spark):
    # 3 tight vectors near e1 + one near-orthogonal outlier per label:
    # the outlier must rank first (lowest cosine to the centroid)
    import math

    rows = []
    for label in (0, 1):
        base = [0.0] * 8
        base[label] = 1.0
        for i in range(3):
            v = list(base)
            v[7] = 0.01 * i
            rows.append((label * 10 + i, v, label))
        out = [0.0] * 8
        out[6 - label] = 1.0  # orthogonal direction
        rows.append((label * 10 + 9, out, label))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    from cdc_practice_spark.operators.similarity import centroid_outliers

    got = centroid_outliers(emb, k=1, dim=8).collect()
    assert {(r.label, r.vec_id, r.rnk) for r in got} == {(0, 9, 1), (1, 19, 1)}
    for r in got:
        assert r.cos_centroid < 0.5  # far from centroid, not a tie artifact


def test_centroid_outliers_rank_is_partition_stable(spark):
    # same data, different partitioning → identical output (round-6 +
    # id tiebreak determinism claim)
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(60)
    ]
    emb1 = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    emb2 = emb1.repartition(13)
    from cdc_practice_spark.operators.similarity import centroid_outliers

    a = sorted(map(tuple, centroid_outliers(emb1, k=4, dim=8).collect()))
    b = sorted(map(tuple, centroid_outliers(emb2, k=4, dim=8).collect()))
    assert a == b


def test_rp_lsh_recall_floor_sublinear_and_deterministic(emb, qvec):
    """LSH-bucketed ANN: recall@10 ≥ the decision threshold, candidates
    strictly fewer than the corpus (sublinearity), self-hit recovered,
    and two runs return identical rows (fixed seed, sign cuts)."""
    got = S.rp_lsh_topk(emb, qvec, k=10).collect()
    ids = {r.vec_id for r in got}
    exact_ids = {r.vec_id for r in S.brute_force_topk(emb, qvec, k=10).collect()}
    assert len(ids & exact_ids) >= 5
    assert 0 in ids  # the query vector hashes into its own bucket
    n_total = emb.count()
    assert 0 < got[0].n_candidates < n_total
    again = S.rp_lsh_topk(emb, qvec, k=10).collect()
    assert [(r.vec_id, r.cosine) for r in got] == [
        (r.vec_id, r.cosine) for r in again
    ]


def test_rp_lsh_scores_are_exact_cosine(emb, qvec):
    """Rerank honesty: returned cosines equal the brute-force score for
    the same id — LSH only prunes candidates, never changes scores."""
    got = {r.vec_id: r.cosine for r in S.rp_lsh_topk(emb, qvec, k=10).collect()}
    exact = {
        r.vec_id: r.cosine
        for r in S.brute_force_topk(emb, qvec, k=600).collect()
    }
    for vid, cos in got.items():
        assert cos == exact[vid]


def test_rp_lsh_signature_kernel_matches_driver_math(emb):
    """The Arrow GEMM signature pass must agree with a direct numpy
    recomputation on a sample — a bit-order or sign-convention drift
    between index side and query side silently zeroes recall."""
    import numpy as np

    planes = S.rp_lsh_planes(64, 8, 2, seed=7)
    sigs = {
        (r.vec_id, r.table): r.sig
        for r in S.rp_lsh_signatures(emb.limit(20), planes).collect()
    }
    raw = {r.vec_id: np.asarray(list(r.embedding), float) for r in emb.limit(20).collect()}
    for (vid, t), sig in sigs.items():
        bits = (raw[vid] @ planes[t].T) > 0
        want = 0
        for j in range(8):
            want = (want << 1) | int(bits[j])
        assert sig == want, (vid, t)


def test_rp_lsh_ingest_is_batch_sized_and_equals_rebuild(emb, spark):
    """rp_lsh_ingest must (a) produce a merged store row-identical to a
    from-scratch rebuild over corpus ∪ batch, and (b) hash ONLY the
    arriving batch: with the corpus index persisted, the merged plan
    contains exactly ONE Arrow (mapInPandas) signature pass — the
    batch's — everything else reads the cache."""
    from cdc_practice_spark.plans.cache import tracked_persist

    planes = S.rp_lsh_planes(64, 8, 4, seed=7)
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    idx = tracked_persist(S.rp_lsh_signatures(corpus, planes))
    idx.count()
    merged = S.rp_lsh_ingest(batch, idx, planes)

    rebuilt = S.rp_lsh_signatures(emb, planes)
    assert merged.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(merged).count() == 0

    # count Arrow passes OUTSIDE cache boundaries: the plan STRING would
    # also print the corpus pass inside the InMemoryRelation's cached
    # child, so walk the tree and stop at InMemoryTableScanExec
    def arrow_passes(node):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            return arrow_passes(node.initialPlan())
        if cls == "InMemoryTableScanExec":
            return 0
        n = 1 if cls == "MapInPandasExec" else 0
        it = node.children().iterator()
        while it.hasNext():
            n += arrow_passes(it.next())
        return n

    root = merged._jdf.queryExecution().executedPlan()
    assert arrow_passes(root) == 1, (
        "ingest must hash only the batch (one Arrow pass)"
    )
    assert "InMemoryTableScan" in root.toString()


def test_compact_ann_store_preserves_queries_and_bounds_reads(emb, spark, tmp_path):
    """compact_ann_store (r8 — VERDICT r7 ask #3) must fold the ingest
    delta into the bucketed store with query results IDENTICAL before
    and after, touch only the delta's buckets, delete the delta, and be
    idempotent against a partially-applied fold (full-row dedup)."""
    import os
    import shutil

    planes = S.rp_lsh_planes(64, 8, 4, seed=7)
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    store_path = str(tmp_path / "store")
    delta_path = str(tmp_path / "delta")
    S.rp_lsh_signatures(corpus, planes).repartition(
        8, "table", "sig"
    ).write.partitionBy("table", "sig").parquet(store_path)
    S.rp_lsh_signatures(batch, planes).coalesce(1).write.parquet(delta_path)

    untouched_before = {}  # mtimes of bucket dirs the delta can't touch
    delta_rows = spark.read.parquet(delta_path)
    touched = {
        (r["table"], r["sig"])
        for r in delta_rows.select("table", "sig").distinct().collect()
    }
    for t_dir in os.listdir(store_path):
        if not t_dir.startswith("table="):
            continue
        t = int(t_dir.split("=")[1])
        for s_dir in os.listdir(os.path.join(store_path, t_dir)):
            s = int(s_dir.split("=")[1])
            if (t, s) not in touched:
                p = os.path.join(store_path, t_dir, s_dir)
                untouched_before[p] = os.stat(p).st_mtime_ns

    def read_all():
        rows = [spark.read.parquet(store_path)]
        if os.path.isdir(delta_path):
            rows.append(spark.read.parquet(delta_path))
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return sorted((r.vec_id, r.table, r.sig) for r in out.collect())

    before = read_all()
    # simulate a partially-applied previous fold: one touched bucket
    # already contains its delta rows — compaction must not double them
    t0, s0 = sorted(touched)[0]
    pre = delta_rows.filter((F.col("table") == t0) & (F.col("sig") == s0))
    pre.select("vec_id").write.mode("append").parquet(
        os.path.join(store_path, f"table={t0}", f"sig={s0}")
    )

    # pin the TOUCHED-BUCKETS tier (frac > 1 disables the full tier)
    n = S.compact_ann_store(
        spark, store_path, delta_path, n_bucket_files=8, full_rewrite_frac=1.1
    )
    assert n > 0
    assert not os.path.isdir(delta_path), "delta must be deleted"
    after = read_all()
    assert after == before, "fold must not change the queryable row set"
    # untouched buckets were neither rewritten nor deleted
    for p, mtime in untouched_before.items():
        assert os.path.isdir(p)
        assert os.stat(p).st_mtime_ns == mtime, f"untouched bucket rewritten: {p}"


def test_compact_ann_store_full_tier_preserves_rows(emb, spark, tmp_path):
    """The full-rewrite tier (wide bucket spread): one whole-store swap,
    row set identical, delta gone, and the self-heal path restores a
    store stranded between the two renames."""
    import os
    import shutil

    planes = S.rp_lsh_planes(64, 8, 4, seed=7)
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    store_path = str(tmp_path / "store")
    delta_path = str(tmp_path / "delta")
    S.rp_lsh_signatures(corpus, planes).repartition(
        8, "table", "sig"
    ).write.partitionBy("table", "sig").parquet(store_path)
    S.rp_lsh_signatures(batch, planes).coalesce(1).write.parquet(delta_path)
    before = sorted(
        (r.vec_id, r.table, r.sig)
        for r in spark.read.parquet(store_path)
        .unionByName(spark.read.parquet(delta_path))
        .collect()
    )
    # force the full tier
    n = S.compact_ann_store(
        spark, store_path, delta_path, n_bucket_files=8, full_rewrite_frac=0.0
    )
    assert n == len(before)
    assert not os.path.isdir(delta_path)
    assert not os.path.isdir(store_path + ".old")
    after = sorted(
        (r.vec_id, r.table, r.sig)
        for r in spark.read.parquet(store_path).collect()
    )
    assert after == before
    # simulate the between-renames crash window: store renamed away
    os.rename(store_path, store_path + ".old")
    spark.createDataFrame(
        [(999999, 0, 1)], "vec_id long, table int, sig long"
    ).coalesce(1).write.parquet(delta_path)
    n2 = S.compact_ann_store(
        spark, store_path, delta_path, n_bucket_files=8, full_rewrite_frac=1.1
    )
    assert n2 >= 1
    healed = sorted(
        (r.vec_id, r.table, r.sig)
        for r in spark.read.parquet(store_path).collect()
    )
    assert set(before) < set(healed), "self-heal must restore the store"


def test_rp_lsh_ingest_dedup_replays_is_idempotent(emb, spark):
    """With dedup_replays=True a re-delivered batch adds ZERO rows (the
    documented at-least-once guard); with the default exactly-once path
    the caller owns delivery semantics."""
    from cdc_practice_spark.plans.cache import tracked_persist

    planes = S.rp_lsh_planes(64, 8, 2, seed=7)
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    idx = tracked_persist(S.rp_lsh_signatures(corpus, planes))
    idx.count()
    once = tracked_persist(S.rp_lsh_ingest(batch, idx, planes))
    n_once = once.count()
    twice = S.rp_lsh_ingest(batch, once, planes, dedup_replays=True)
    assert twice.count() == n_once
    assert twice.exceptAll(once).count() == 0


def test_ann_store_multi_cycle_lifecycle_with_crashes(
    emb, qvec, spark, tmp_path, monkeypatch
):
    """r9 (VERDICT r8 ask #8): the full maintenance lifecycle — ingest →
    compact → ingest → compact → query — with a crash INJECTED inside
    each tier's swap window.  After every heal+refold the store must be
    row-identical to a from-scratch rebuild, and the served top-k must
    match a query over freshly-computed signatures."""
    import os
    import shutil

    planes = S.rp_lsh_planes(64, 8, 4, seed=7)
    corpus = emb.filter(F.col("vec_id") % 7 < 5)
    b1 = emb.filter(F.col("vec_id") % 7 == 5)
    b2 = emb.filter(F.col("vec_id") % 7 == 6)
    store_path = str(tmp_path / "store")
    delta_path = str(tmp_path / "delta")
    S.rp_lsh_signatures(corpus, planes).repartition(
        8, "table", "sig"
    ).write.partitionBy("table", "sig").parquet(store_path)

    def rows_of(df):
        return sorted((r.vec_id, r.table, r.sig) for r in df.collect())

    def rebuild(vectors):
        return rows_of(S.rp_lsh_signatures(vectors, planes))

    # ---- cycle 1: ingest b1, crash in the TOUCHED tier's per-bucket
    # window (between rename-aside and replace) ----
    S.rp_lsh_signatures(b1, planes).coalesce(1).write.parquet(delta_path)
    orig_replace = os.replace

    def boom_replace(src, dst, *a, **k):
        if str(tmp_path) in str(dst) and "sig=" in str(dst):
            raise RuntimeError("injected crash: touched-tier swap window")
        return orig_replace(src, dst, *a, **k)

    monkeypatch.setattr(os, "replace", boom_replace)
    try:
        S.compact_ann_store(
            spark, store_path, delta_path,
            n_bucket_files=8, full_rewrite_frac=1.1,
        )
        raise AssertionError("injected crash did not fire")
    except RuntimeError as e:
        assert "injected crash" in str(e)
    monkeypatch.setattr(os, "replace", orig_replace)
    # an aside must exist and the live bucket be gone (the crash window)
    asides = [
        os.path.join(store_path, t, s)
        for t in os.listdir(store_path)
        if t.startswith("table=")
        for s in os.listdir(os.path.join(store_path, t))
        if s.startswith("_old.sig=")
    ]
    assert asides, "crash must strand at least one aside"
    # a reader BEFORE any heal: load_ann_store heals and serves exactly
    # the pre-fold store (no lost bucket, no duplicate rows)
    healed = rows_of(S.load_ann_store(spark, store_path))
    assert healed == rebuild(corpus)
    assert os.path.isdir(delta_path), "delta must survive the crash"
    # refold to completion
    n = S.compact_ann_store(
        spark, store_path, delta_path, n_bucket_files=8, full_rewrite_frac=1.1
    )
    assert n > 0 and not os.path.isdir(delta_path)
    assert rows_of(S.load_ann_store(spark, store_path)) == rebuild(
        corpus.unionByName(b1)
    )

    # ---- cycle 2: ingest b2, crash in the FULL tier's between-renames
    # window (store renamed away, tmp not yet renamed in) ----
    S.rp_lsh_signatures(b2, planes).coalesce(1).write.parquet(delta_path)
    orig_rename = os.rename

    def boom_rename(src, dst, *a, **k):
        if str(src).endswith(".compacting"):
            raise RuntimeError("injected crash: full-tier swap window")
        return orig_rename(src, dst, *a, **k)

    monkeypatch.setattr(os, "rename", boom_rename)
    try:
        S.compact_ann_store(
            spark, store_path, delta_path,
            n_bucket_files=8, full_rewrite_frac=0.0,
        )
        raise AssertionError("injected crash did not fire")
    except RuntimeError as e:
        assert "injected crash" in str(e)
    monkeypatch.setattr(os, "rename", orig_rename)
    assert not os.path.isdir(store_path), "crash window: store is away"
    assert os.path.isdir(store_path + ".old")
    # reader heals the stranded store
    healed = rows_of(S.load_ann_store(spark, store_path))
    assert healed == rebuild(corpus.unionByName(b1))
    n = S.compact_ann_store(
        spark, store_path, delta_path, n_bucket_files=8, full_rewrite_frac=0.0
    )
    everything = corpus.unionByName(b1).unionByName(b2)
    assert rows_of(S.load_ann_store(spark, store_path)) == rebuild(everything)
    shutil.rmtree(store_path + ".old", ignore_errors=True)

    # ---- query identity after 2 folds + 2 heals ----
    served = S.rp_lsh_topk_from_index(
        everything, S.load_ann_store(spark, store_path), planes, qvec, k=5
    ).collect()
    fresh = S.rp_lsh_topk_from_index(
        everything, S.rp_lsh_signatures(everything, planes), planes, qvec, k=5
    ).collect()
    assert [r.vec_id for r in served] == [r.vec_id for r in fresh]


def test_rp_lsh_erase_touches_only_named_buckets(emb, spark, tmp_path, monkeypatch):
    """rp_lsh_erase (r9): erase == rebuild-over-remaining, erased ids
    gone, UNTOUCHED buckets byte-untouched (mtime), idempotent re-run,
    and the per-bucket crash window heals with no data loss."""
    import os

    planes = S.rp_lsh_planes(64, 6, 4, seed=7)
    erase = emb.filter(F.col("vec_id") % 5 == 4)
    remaining = emb.filter(F.col("vec_id") % 5 != 4)
    store_path = str(tmp_path / "store")
    S.rp_lsh_signatures(emb, planes).repartition(
        8, "table", "sig"
    ).write.partitionBy("table", "sig").parquet(store_path)

    touched = {
        (int(r["table"]), int(r["sig"]))
        for r in S.rp_lsh_signatures(erase, planes)
        .select("table", "sig")
        .distinct()
        .collect()
    }
    untouched_before = {}
    for t_dir in os.listdir(store_path):
        if not t_dir.startswith("table="):
            continue
        t = int(t_dir.split("=")[1])
        for s_dir in os.listdir(os.path.join(store_path, t_dir)):
            s = int(s_dir.split("=")[1])
            if (t, s) not in touched:
                p = os.path.join(store_path, t_dir, s_dir)
                untouched_before[p] = os.stat(p).st_mtime_ns

    n = S.rp_lsh_erase(spark, store_path, erase, planes)
    assert n > 0
    got = sorted(
        (r.vec_id, r.table, r.sig)
        for r in S.load_ann_store(spark, store_path).collect()
    )
    want = sorted(
        (r.vec_id, r.table, r.sig)
        for r in S.rp_lsh_signatures(remaining, planes).collect()
    )
    assert got == want
    for p, mtime in untouched_before.items():
        assert os.path.isdir(p) and os.stat(p).st_mtime_ns == mtime, (
            f"untouched bucket rewritten: {p}"
        )
    # idempotent: nothing left to erase
    assert S.rp_lsh_erase(spark, store_path, erase, planes) == 0

    # crash window: second store, fail the bucket replace mid-erase
    store2 = str(tmp_path / "store2")
    S.rp_lsh_signatures(emb, planes).repartition(
        8, "table", "sig"
    ).write.partitionBy("table", "sig").parquet(store2)
    orig_replace = os.replace

    def boom(src, dst, *a, **k):
        if str(tmp_path) in str(dst) and "sig=" in str(dst):
            raise RuntimeError("injected crash: erase swap window")
        return orig_replace(src, dst, *a, **k)

    monkeypatch.setattr(os, "replace", boom)
    try:
        S.rp_lsh_erase(spark, store2, erase, planes)
        raise AssertionError("injected crash did not fire")
    except RuntimeError as e:
        assert "injected crash" in str(e)
    monkeypatch.setattr(os, "replace", orig_replace)
    import shutil

    shutil.rmtree(store2 + ".erasing", ignore_errors=True)
    # a reader read-repairs via the pending erase journal: the erased
    # subjects NEVER reappear, even though the physical deletion is
    # incomplete (r9 review: the heal alone resurrected them)
    assert os.path.isdir(os.path.join(store2, "_erase_journal"))
    healed = sorted(
        (r.vec_id, r.table, r.sig)
        for r in S.load_ann_store(spark, store2).collect()
    )
    assert healed == want
    # re-running (journal-driven, empty new set) completes the deletion
    assert S.rp_lsh_erase(spark, store2, erase.limit(0), planes) > 0
    assert not os.path.isdir(os.path.join(store2, "_erase_journal"))
    assert sorted(
        (r.vec_id, r.table, r.sig)
        for r in S.load_ann_store(spark, store2).collect()
    ) == want


# ---------------------------------------------------------------- r9 cont.
# filtered ANN, semantic decontamination, hard-negative mining


def test_filtered_topk_all_results_qualify(spark, emb, qvec):
    """Every returned row satisfies the metadata filter, and k rows come
    back even though the filter empties parts of the probe order."""
    qual = emb.filter(F.col("vec_id") % 2 == 0)
    rows = S.ivf_filtered_topk(emb, qual, qvec, k=10).collect()
    assert len(rows) == 10
    assert all(r.vec_id % 2 == 0 for r in rows)
    assert all(rows[i].cosine >= rows[i + 1].cosine for i in range(len(rows) - 1))


def test_filtered_topk_expands_past_empty_best_cell(spark, emb, qvec):
    """The under-fill scenario fixed-nprobe IVF fails: the query vector's
    own cell (the best-ranked probe) holds ZERO qualified vectors, yet
    the adaptive expansion still returns k rows — all from other cells."""
    own_cell = emb.filter(F.col("vec_id") == 0).head().label
    qual = emb.filter(F.col("label") != own_cell)
    rows = S.ivf_filtered_topk(emb, qual, qvec, k=10).collect()
    assert len(rows) == 10
    labels = {
        r.label
        for r in emb.filter(
            F.col("vec_id").isin([x.vec_id for x in rows])
        ).collect()
    }
    assert own_cell not in labels


def test_filtered_topk_returns_all_when_fewer_than_k(spark, emb, qvec):
    """Fewer qualified vectors than k: the expansion walks every cell and
    returns the whole qualified set, exactly once each."""
    qual = emb.filter(F.col("vec_id") % 97 == 3)  # a handful of vectors
    n_qual = qual.count()
    assert 0 < n_qual < 10
    rows = S.ivf_filtered_topk(emb, qual, qvec, k=10).collect()
    assert len(rows) == n_qual
    assert len({r.vec_id for r in rows}) == n_qual


def test_hard_negatives_labels_differ_and_match_numpy(spark, sf_dir):
    """The mined negatives are cross-label only, ranked correctly, and
    anchor 0's list matches an exact numpy brute force (round-6 + id
    tiebreak — the same contract the oracle pins)."""
    import numpy as np

    from cdc_practice_spark.queries.similarity_queries import (
        embedding_hard_negatives,
    )

    out = embedding_hard_negatives(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    by_anchor = {}
    for r in out:
        assert labels[r.negative_id] != labels[r.anchor_id]
        by_anchor.setdefault(r.anchor_id, []).append(r)
    assert set(by_anchor) == {0, 1, 2, 3}
    for rows in by_anchor.values():
        assert [r.rank for r in sorted(rows, key=lambda x: x.rank)] == [1, 2, 3, 4, 5]

    rows = emb.select("vec_id", "label", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    labs = np.array([r.label for r in rows])
    M = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    a0 = Mn[ids == 0][0]
    cos = np.round(Mn @ a0, 6)
    mask = labs != labs[ids == 0][0]
    cand = sorted(
        zip(-cos[mask], ids[mask])
    )[:5]
    expect = [(int(i), float(-c)) for c, i in cand]
    got = [
        (r.negative_id, r.cosine)
        for r in sorted(by_anchor[0], key=lambda x: x.rank)
    ]
    assert got == expect


def test_semantic_decontamination_matches_numpy(spark, sf_dir):
    """Flag set == exact numpy GEMM at tau: same ids, same argmax
    benchmark attribution, same round-6 cosines."""
    import numpy as np

    from cdc_practice_spark.queries.similarity_queries import (
        _SEM_DECON_TAU,
        corpus_decontaminate_semantic,
    )

    out = {
        r.vec_id: (r.bench_id, r.cosine)
        for r in corpus_decontaminate_semantic(spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    bmask = ids % 97 == 0
    order = np.argsort(ids[bmask])
    B, bids = Mn[bmask][order], ids[bmask][order]
    S_ = Mn[~bmask] @ B.T
    best = S_.argmax(axis=1)
    mc = np.round(S_.max(axis=1), 6)
    expect = {
        int(i): (int(bids[b]), float(c))
        for i, b, c in zip(ids[~bmask], best, mc)
        if c >= _SEM_DECON_TAU
    }
    assert out == expect


def test_lsh_filtered_search_widens_probe_radius(spark, emb, qvec):
    """A selective filter starves the standard Hamming-1 probe below k:
    the filtered store query must WIDEN its radius (reported) and still
    return only qualified vectors, never silently under-fill while
    qualified vectors remain."""
    planes = S.rp_lsh_planes(len(qvec), n_planes=8, n_tables=8)
    sigs = S.rp_lsh_signatures(emb, planes)

    # standard-depth candidates for comparison
    base = (
        sigs.filter(S.rp_lsh_probe_cond(planes, qvec, multiprobe=1))
        .select("vec_id")
        .distinct()
    )
    # a filter keeping ~1/40 of the corpus — sparse enough that the
    # radius-1 candidate ∩ filter set is < 10
    qual = emb.filter(F.col("vec_id") % 40 == 7)
    n_base_qual = base.join(qual.select("vec_id"), "vec_id", "left_semi").count()
    assert n_base_qual < 10  # the scenario is real on this fixture

    rows = S.rp_lsh_filtered_topk_from_index(
        qual, sigs, planes, qvec, k=10, max_probe=2
    ).collect()
    assert rows, "expansion must surface candidates"
    assert rows[0].probe_radius == 2
    assert rows[0].n_candidates > n_base_qual
    qual_ids = {r.vec_id for r in qual.select("vec_id").collect()}
    assert all(r.vec_id in qual_ids for r in rows)


def test_stream_ann_ingest_kill_resume_exactly_once(spark, sf_dir):
    """Kill-resume for the streaming ANN ingest sink (r10): stop after
    the first committed epoch, resume from the checkpoint to
    completion.  The accreted store must be row-identical to a
    from-scratch signature pass over corpus ∪ batch — no lost epoch,
    no duplicated (id, table) row — and compaction folds the deltas
    without changing a row."""
    import os
    import tempfile
    import time as _time

    from cdc_practice_spark.operators import similarity as S
    from cdc_practice_spark.queries.similarity_queries import (
        _split_embeddings_into_files,
    )
    from cdc_practice_spark.queries.streaming_queries import TMP_ROOT
    from cdc_practice_spark.session import load_table
    from cdc_practice_spark.streaming.ann_ingest import (
        compact_ann_ingest_store,
        load_ann_ingest_sigs,
        seed_ann_ingest,
        stream_ann_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    planes = S.rp_lsh_planes(64, n_planes=6, n_tables=4)

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="ann_stream_kill_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    _split_embeddings_into_files(spark, batch, src, n_files=3)
    store = os.path.join(work, "store")
    ckpt = os.path.join(work, "ckpt")
    seed_ann_ingest(spark, corpus, planes, store)

    def run(kill):
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_ann_ingest(spark, stream, planes, store, ckpt)
        if kill:
            deadline = _time.time() + 120
            while _time.time() < deadline:
                done = [p for p in q.recentProgress if p["numInputRows"] > 0]
                if done and not q.status["isTriggerActive"]:
                    break
                _time.sleep(0.1)
            q.stop()
        q.awaitTermination()

    run(kill=True)
    mid = load_ann_ingest_sigs(spark, store).count()
    run(kill=False)  # resume

    sigs = load_ann_ingest_sigs(spark, store)
    rebuilt = S.rp_lsh_signatures(emb, planes)
    assert sigs.exceptAll(rebuilt).isEmpty()
    assert rebuilt.exceptAll(sigs).isEmpty()
    assert mid <= sigs.count()
    # one row per (id, table) — the replay-dedup invariant
    assert (
        sigs.groupBy("vec_id", "table")
        .count()
        .filter(F.col("count") > 1)
        .isEmpty()
    )
    # compaction folds without changing a row
    n = compact_ann_ingest_store(spark, store)
    folded = load_ann_ingest_sigs(spark, store)
    assert n == folded.count()
    assert folded.exceptAll(rebuilt).isEmpty()
    assert rebuilt.exceptAll(folded).isEmpty()
    # the fold left one base generation
    deltas = [d for d in os.listdir(store) if d.startswith("sig_delta_v")]
    assert len(deltas) == 1


def test_ivf_rebuild_identity_and_drift_decisions(spark, sf_dir):
    """The re-cluster job's contract (r10): ivf_rebuild over the merged
    store is row-identical to a from-scratch kmeans_fit_assign over the
    same vectors (serving code swaps stores with no special cases), and
    the drift report is symmetric — comparing a build's stats with
    themselves fires nothing."""
    from cdc_practice_spark.operators import similarity as S
    from cdc_practice_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    _cents, rebuilt = S.ivf_rebuild(emb, k=8, n_iter=2)
    fresh = S.kmeans_fit_assign(emb, k=8, n_iter=2)
    assert rebuilt.exceptAll(fresh).isEmpty()
    assert fresh.exceptAll(rebuilt).isEmpty()

    stats = S.ivf_cell_stats(rebuilt)
    r = S.ivf_drift_report(stats, stats).collect()[0]
    assert not r.share_drift and not r.dist_drift
    assert r.max_share_build_ppm == r.max_share_now_ppm
    assert r.mean_dist2_build_micro == r.mean_dist2_now_micro


def test_stream_ivf_ingest_kill_resume_and_drift(spark, sf_dir):
    """Kill-resume for the streaming IVF sink (r10): stop after the
    first committed epoch, resume to completion — the accreted
    assignments equal one batch assign over everything arrived, the
    persisted stats sidecar equals a recompute, and the drift report
    off the on-disk sidecars fires for the OOD batch."""
    import os
    import tempfile
    import time as _time

    from cdc_practice_spark.operators import similarity as S
    from cdc_practice_spark.queries.similarity_queries import (
        _split_embeddings_into_files,
    )
    from cdc_practice_spark.queries.streaming_queries import TMP_ROOT
    from cdc_practice_spark.session import load_table
    from cdc_practice_spark.streaming.ann_ingest import (
        ivf_ingest_drift,
        load_ivf_ingest_assignments,
        seed_ivf_ingest,
        stream_ivf_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 4).select("vec_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 5 == 4).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(0.3) + F.lit(1.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    cents = S.kmeans_centroids(corpus, k=8, n_iter=2)

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="ivf_stream_kill_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    _split_embeddings_into_files(spark, batch, src, n_files=3)
    from cdc_practice_spark.operators import quantization as Q

    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=1)
    store = os.path.join(work, "store")
    ckpt = os.path.join(work, "ckpt")
    seed_ivf_ingest(spark, corpus, cents, store, codebook=cb)

    def run(kill):
        stream = (
            spark.readStream.schema(emb.select("vec_id", "embedding").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_ivf_ingest(spark, stream, cents, store, ckpt, codebook=cb)
        if kill:
            deadline = _time.time() + 120
            while _time.time() < deadline:
                done = [p for p in q.recentProgress if p["numInputRows"] > 0]
                if done and not q.status["isTriggerActive"]:
                    break
                _time.sleep(0.1)
            q.stop()
        q.awaitTermination()

    run(kill=True)
    run(kill=False)  # resume

    stored = load_ivf_ingest_assignments(spark, store)
    rebuilt = S.ivf_assign(corpus.unionByName(batch), cents)
    assert stored.exceptAll(rebuilt).isEmpty()
    assert rebuilt.exceptAll(stored).isEmpty()
    # persisted sidecar == recompute (resolved through the pointer file
    # — the r11 atomic-swap layout)
    sidecar = {
        (r.cell): (r.n, r.sum_dist2)
        for r in S.read_stats_sidecar(spark, store, "_cell_stats").collect()
    }
    fresh = {
        (r.cell): (r.n, r.sum_dist2)
        for r in S.ivf_cell_stats(stored).collect()
    }
    assert sidecar == fresh
    rep = ivf_ingest_drift(spark, store).collect()[0]
    assert rep.share_drift and rep.dist_drift
    # r11: the PQ codes tier survived the kill-resume exactly-once too —
    # accreted codes equal one batch encode over everything arrived,
    # with the same id set as the assignments
    from cdc_practice_spark.streaming.ann_ingest import load_ivf_ingest_codes

    stored_codes = load_ivf_ingest_codes(spark, store)
    want_codes = (
        Q.pq_encode(corpus.unionByName(batch), cb)
        .join(stored.select("vec_id", "cell"), "vec_id")
        .select("vec_id", "cell", "codes", "norm")
    )
    assert stored_codes.exceptAll(want_codes).isEmpty()
    assert want_codes.exceptAll(stored_codes).isEmpty()


def test_ivf_drift_maintenance_noop_and_rebuild(spark, sf_dir):
    """The r11 alarm→action loop (VERDICT r10 ask #3): a clean store's
    maintenance run is a LEDGERED NO-OP (manifest byte-identical,
    assignments untouched); after an OOD ingest the alarm fires, the
    orchestrated rebuild swaps the store to the fresh-build identity,
    resets the baseline (second run = no-op again), and persists the
    new frozen centroids."""
    import os
    import tempfile

    from cdc_practice_spark.operators import similarity as S
    from cdc_practice_spark.orchestration import JobSpec, read_ledger
    from cdc_practice_spark.queries.streaming_queries import TMP_ROOT
    from cdc_practice_spark.session import load_table
    from cdc_practice_spark.streaming.ann_ingest import (
        append_ivf_ingest_batch,
        ivf_drift_maintenance,
        load_centroids,
        load_ivf_ingest_assignments,
        seed_ivf_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 4).select("vec_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 5 == 4).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(0.3) + F.lit(1.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    cents = S.kmeans_centroids(corpus, k=8, n_iter=2)
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="ivf_maint_t_", dir=TMP_ROOT)
    store = os.path.join(work, "store")
    runs = os.path.join(work, "runs")
    seed_ivf_ingest(spark, corpus, cents, store)
    assert load_centroids(store) == cents  # seed persists the params

    manifest_path = os.path.join(store, "_INGEST_MANIFEST")
    before = open(manifest_path).read()

    # clean store: no alarm, no-op, but the decision IS ledgered
    dec = ivf_drift_maintenance(spark, store, corpus, runs)
    assert dec == {"alarm": False, "rebuilt": False, "run_id": dec["run_id"]}
    assert open(manifest_path).read() == before  # store untouched
    led = read_ledger(JobSpec(name="ivf_drift_rebuild", run_root=runs))
    assert [r["state"] for r in led][-1] == "success"
    assert "no-op" in led[-1]["result"]

    # OOD ingest → alarm → orchestrated rebuild
    append_ivf_ingest_batch(spark, store, batch, cents, epoch=0)
    merged = corpus.unionByName(batch)
    dec2 = ivf_drift_maintenance(spark, store, merged, runs)
    assert dec2["alarm"] and dec2["rebuilt"]
    stored = load_ivf_ingest_assignments(spark, store)
    fresh_cents, fresh = S.ivf_rebuild(merged, k=8, n_iter=2)
    assert stored.exceptAll(fresh).isEmpty()
    assert fresh.exceptAll(stored).isEmpty()
    assert load_centroids(store) == fresh_cents  # swapped params
    # lease released: a follow-up maintenance run acquires cleanly,
    # and the reset baseline makes it a no-op
    dec3 = ivf_drift_maintenance(spark, store, merged, runs)
    assert not dec3["alarm"] and not dec3["rebuilt"]
    led = read_ledger(JobSpec(name="ivf_drift_rebuild", run_root=runs))
    assert [r["state"] for r in led if r["state"] != "running"] == [
        "success", "success", "success"
    ]


def test_ivf_pq_topk_deterministic_recall_and_composition(emb, qvec):
    """IVF-PQ (r11): two runs are identical (determinism); the composed
    probe equals pq_topk restricted to the probed cells (the
    composition IS the two operators, no third semantics); recall@10
    clears the decision floor; serving from a persisted cell-carrying
    codes table matches on-the-fly encoding."""
    from cdc_practice_spark.operators import quantization as Q

    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=2)
    a = [(r.vec_id, r.cosine) for r in
         Q.ivf_pq_topk(emb, cb, qvec, k=10, nprobe=5, shortlist=200).collect()]
    b = [(r.vec_id, r.cosine) for r in
         Q.ivf_pq_topk(emb, cb, qvec, k=10, nprobe=5, shortlist=200).collect()]
    assert a == b
    # composition: identical to PQ over the probed subset
    cells = S._ranked_cells(emb, qvec, "label", "embedding", limit=5)
    probed = emb.filter(F.col("label").isin(cells))
    want = [(r.vec_id, r.cosine) for r in
            Q.pq_topk(probed, cb, qvec, k=10, shortlist=200).collect()]
    assert a == want
    # recall floor vs full-corpus exact (sweep-tuned: 7/9/6 at the SFs)
    exact = {r.vec_id for r in S.brute_force_topk(emb, qvec, k=10).collect()}
    assert len({v for v, _ in a} & exact) >= 5
    # precomputed codes path
    codes = Q.pq_encode(emb, cb, keep_cols=("label",))
    c = [(r.vec_id, r.cosine) for r in
         Q.ivf_pq_topk(emb, cb, qvec, k=10, nprobe=5, shortlist=200, codes=codes).collect()]
    assert c == a


def test_swap_stats_sidecar_generations_and_legacy_fallback(spark, tmp_path):
    """r11 (r10 ADVICE): sidecar publication is a staged generation dir
    + pointer os.replace — after N swaps exactly one generation dir
    remains, the pointer always resolves to a complete table, and the
    reader still accepts the pre-r11 un-pointered legacy layout."""
    import os

    store = str(tmp_path / "store")
    os.makedirs(store)
    for i in range(3):
        S.swap_stats_sidecar(
            store,
            spark.createDataFrame([(i, i + 10, None)], "cell int, n long, sum_dist2 decimal(24,6)"),
            "_cell_stats",
        )
        got = {r.cell for r in S.read_stats_sidecar(spark, store, "_cell_stats").collect()}
        assert got == {i}
    gens = sorted(d for d in os.listdir(store) if d.startswith("_cell_stats_g"))
    # current + immediately-superseded survive (one-swap grace window
    # for in-flight lazy readers); older generations reclaimed
    assert gens == ["_cell_stats_g1", "_cell_stats_g2"]
    with open(os.path.join(store, "_cell_stats.ptr")) as fh:
        assert fh.read().strip() == "_cell_stats_g2"
    # legacy layout (pre-r11 store): plain dir, no pointer
    legacy = str(tmp_path / "legacy")
    os.makedirs(legacy)
    spark.createDataFrame([(9, 1, None)], "cell int, n long, sum_dist2 decimal(24,6)").coalesce(
        1
    ).write.parquet(os.path.join(legacy, "_cell_stats"))
    got = {r.cell for r in S.read_stats_sidecar(spark, legacy, "_cell_stats").collect()}
    assert got == {9}


def test_ivf_pq_probe_prunes_partitioned_codes_store(spark, sf_dir, tmp_path):
    """The IVF-PQ scale claim, proven on plans: with BOTH the vectors
    and the persisted codes table laid out partitioned by cell, the
    probe's cell filter is PARTITION pruning on both scans — only the
    probed cells' directories are listed — and the result is identical
    to the unpartitioned run."""
    from cdc_practice_spark.operators import quantization as Q
    from cdc_practice_spark.plans.explain import plan_string
    from cdc_practice_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=1)

    vec_dir = str(tmp_path / "vectors")
    emb.write.partitionBy("label").parquet(vec_dir)
    part_emb = spark.read.parquet(vec_dir).select("vec_id", "embedding", "label")
    codes_dir = str(tmp_path / "codes")
    Q.pq_encode(emb, cb, keep_cols=("label",)).write.partitionBy("label").parquet(
        codes_dir
    )
    part_codes = spark.read.parquet(codes_dir).select(
        "vec_id", "codes", "norm", "label"
    )

    want = [
        (r.vec_id, r.cosine)
        for r in Q.ivf_pq_topk(emb, cb, qv, k=10, nprobe=3).collect()
    ]
    got_df = Q.ivf_pq_topk(part_emb, cb, qv, k=10, nprobe=3, codes=part_codes)
    got = [(r.vec_id, r.cosine) for r in got_df.collect()]
    assert got == want

    plan = plan_string(got_df)
    pruned = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "label" in ln
    ]
    # both the codes scan (ADC stage) and the vector scan (rerank) prune
    assert len(pruned) >= 2, plan[:2000]


def test_stream_ivf_ingest_maintains_pq_codes_tier(spark, sf_dir):
    """r11: a codebook-bearing streaming IVF ingest accretes the PQ
    codes delta per epoch alongside assignments (identical id sets,
    same manifest commit), and the accreted codes equal one batch
    pq_encode over everything arrived; store-served IVF-PQ equals the
    direct composition over the same frozen parameters."""
    import os
    import tempfile

    from cdc_practice_spark.operators import quantization as Q
    from cdc_practice_spark.queries.similarity_queries import (
        _split_embeddings_into_files,
    )
    from cdc_practice_spark.queries.streaming_queries import TMP_ROOT
    from cdc_practice_spark.session import load_table
    from cdc_practice_spark.streaming.ann_ingest import (
        ivf_pq_topk_from_store,
        load_ivf_ingest_assignments,
        load_ivf_ingest_codes,
        seed_ivf_ingest,
        stream_ivf_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 4).select("vec_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 5 == 4).select("vec_id", "embedding")
    cents = S.kmeans_centroids(corpus, k=8, n_iter=2)
    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=1)

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="ivf_pq_stream_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    _split_embeddings_into_files(spark, batch, src, n_files=2)
    store = os.path.join(work, "store")
    seed_ivf_ingest(spark, corpus, cents, store, codebook=cb)
    stream = (
        spark.readStream.schema(emb.select("vec_id", "embedding").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ivf_ingest(
        spark, stream, cents, store, os.path.join(work, "ckpt"), codebook=cb
    )
    q.awaitTermination()

    stored_codes = load_ivf_ingest_codes(spark, store)
    merged = corpus.unionByName(batch)
    want_codes = Q.pq_encode(merged, cb).join(
        load_ivf_ingest_assignments(spark, store).select("vec_id", "cell"),
        "vec_id",
    ).select("vec_id", "cell", "codes", "norm")
    assert stored_codes.exceptAll(want_codes).isEmpty()
    assert want_codes.exceptAll(stored_codes).isEmpty()
    # codes and assignments cover the same ids
    a_ids = {r.vec_id for r in load_ivf_ingest_assignments(spark, store).select("vec_id").collect()}
    c_ids = {r.vec_id for r in stored_codes.select("vec_id").collect()}
    assert a_ids == c_ids
    # served query returns k rows with exact scores
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    got = ivf_pq_topk_from_store(spark, store, merged, cb, qv, k=10)
    rows = got.collect()
    assert len(rows) == 10
    exact = {r.vec_id: r.cosine for r in S.brute_force_topk(merged, qv, k=500).collect()}
    for r in rows:
        assert r.cosine == exact[r.vec_id]  # rerank scores are exact


def test_ivf_codes_tier_is_store_level_contract(spark, sf_dir):
    """review r11: the PQ codes tier is a store invariant — appending
    without the codebook to a codes-bearing store raises (the epoch's
    ids would be invisible to served queries), appending WITH a
    codebook to a codes-less store raises (partial tier), and a
    codebook-less drift rebuild of a codes store raises instead of
    destroying the tier.  Legacy bare _centroids.json still loads."""
    import os
    import tempfile

    import pytest as _pytest

    from cdc_practice_spark.operators import quantization as Q
    from cdc_practice_spark.queries.streaming_queries import TMP_ROOT
    from cdc_practice_spark.session import load_table
    from cdc_practice_spark.streaming.ann_ingest import (
        append_ivf_ingest_batch,
        ivf_drift_maintenance,
        load_centroids,
        seed_ivf_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 4).select("vec_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 5 == 4).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(0.3) + F.lit(1.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    cents = S.kmeans_centroids(corpus, k=8, n_iter=2)
    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=1)
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="codes_contract_", dir=TMP_ROOT)

    with_codes = os.path.join(work, "with_codes")
    seed_ivf_ingest(spark, corpus, cents, with_codes, codebook=cb)
    with _pytest.raises(ValueError, match="codes tier"):
        append_ivf_ingest_batch(spark, with_codes, batch, cents, epoch=0)
    # maintenance guard: force an alarm first (OOD epoch WITH codes),
    # then a codebook-less rebuild must refuse to destroy the tier
    append_ivf_ingest_batch(
        spark, with_codes, batch, cents, epoch=0, codebook=cb
    )
    merged = corpus.unionByName(batch)
    with _pytest.raises(ValueError, match="codes tier"):
        ivf_drift_maintenance(
            spark, with_codes, merged, os.path.join(work, "runs2")
        )

    without_codes = os.path.join(work, "without_codes")
    seed_ivf_ingest(spark, corpus, cents, without_codes)
    with _pytest.raises(ValueError, match="no codes tier"):
        append_ivf_ingest_batch(
            spark, without_codes, batch, cents, epoch=0, codebook=cb
        )

    # legacy layout: bare _centroids.json (pre-r11 store) still resolves
    legacy = os.path.join(work, "legacy")
    seed_ivf_ingest(spark, corpus, cents, legacy)
    os.rename(
        os.path.join(legacy, "_centroids.v-1.json"),
        os.path.join(legacy, "_centroids.json"),
    )
    assert load_centroids(legacy) == cents


def test_append_ivf_ingest_batch_redelivery_and_conflict_guard(spark, sf_dir):
    """r11 ADVICE medium: the batch append enforces the SAME append-only
    contract as the streaming sink — a redelivered batch (same ids,
    new epoch) adds NOTHING (no duplicate assignment/codes rows, no
    double-counted cell stats skewing the drift alarm, no duplicate ids
    in served top-k), and a re-embedded id (same id, different vector)
    raises instead of silently keeping the stale rows."""
    import os
    import tempfile

    import pytest as _pytest

    from cdc_practice_spark.operators import quantization as Q
    from cdc_practice_spark.queries.streaming_queries import TMP_ROOT
    from cdc_practice_spark.streaming.ann_ingest import (
        append_ivf_ingest_batch,
        load_ivf_ingest_assignments,
        load_ivf_ingest_codes,
        seed_ivf_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 4).select("vec_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 5 == 4).select("vec_id", "embedding")
    cents = S.kmeans_centroids(corpus, k=8, n_iter=2)
    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=1)
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="ivf_append_guard_", dir=TMP_ROOT)
    store = os.path.join(work, "store")
    seed_ivf_ingest(spark, corpus, cents, store, codebook=cb)

    append_ivf_ingest_batch(spark, store, batch, cents, epoch=0, codebook=cb)
    rows_before = sorted(
        (r.vec_id, r.cell)
        for r in load_ivf_ingest_assignments(spark, store).collect()
    )
    stats_before = {
        r.cell: (r.n, r.sum_dist2)
        for r in S.read_stats_sidecar(spark, store, "_cell_stats").collect()
    }
    n_ids = len({v for v, _c in rows_before})
    assert len(rows_before) == n_ids  # unique before redelivery

    # redelivery at a NEW epoch id (an at-least-once bus re-sending a
    # whole batch): must be a committed-but-empty epoch, not duplicates
    append_ivf_ingest_batch(spark, store, batch, cents, epoch=1, codebook=cb)
    rows_after = sorted(
        (r.vec_id, r.cell)
        for r in load_ivf_ingest_assignments(spark, store).collect()
    )
    assert rows_after == rows_before
    stats_after = {
        r.cell: (r.n, r.sum_dist2)
        for r in S.read_stats_sidecar(spark, store, "_cell_stats").collect()
    }
    assert stats_after == stats_before
    codes = load_ivf_ingest_codes(spark, store)
    assert codes.count() == codes.select("vec_id").distinct().count()

    # re-embedded id (same id, different vector) → raise, not drop
    reembedded = batch.limit(3).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(0.3) + F.lit(1.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    with _pytest.raises(ValueError, match="re-embedded"):
        append_ivf_ingest_batch(
            spark, store, reembedded, cents, epoch=2, codebook=cb
        )


def test_stream_ivf_ingest_unseeded_root_persists_centroids(spark, sf_dir):
    """r11 ADVICE low: a store created SOLELY by the streaming sink (no
    seed) must still be servable — the first commit persists the frozen
    centroids at the base generation, so ivf_pq_topk_from_store works;
    and load_centroids on a store with no committed epochs raises a
    descriptive error instead of an opaque min()/FileNotFoundError."""
    import os
    import tempfile

    import pytest as _pytest

    from cdc_practice_spark.operators import quantization as Q
    from cdc_practice_spark.queries.similarity_queries import (
        _split_embeddings_into_files,
    )
    from cdc_practice_spark.queries.streaming_queries import TMP_ROOT
    from cdc_practice_spark.streaming.ann_ingest import (
        ivf_pq_topk_from_store,
        load_centroids,
        stream_ivf_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = S.kmeans_centroids(emb, k=8, n_iter=2)
    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=1)
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="ivf_unseeded_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    _split_embeddings_into_files(spark, emb, src, n_files=2)
    store = os.path.join(work, "store")
    ckpt = os.path.join(work, "ckpt")

    os.makedirs(store, exist_ok=True)
    with _pytest.raises(ValueError, match="no committed epochs"):
        load_centroids(store)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ivf_ingest(spark, stream, cents, store, ckpt, codebook=cb)
    q.awaitTermination()

    assert load_centroids(store) == cents
    qvec = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    served = ivf_pq_topk_from_store(
        spark, store, emb, cb, qvec, k=5, nprobe=8, shortlist=50
    ).collect()
    assert len(served) == 5


def test_ivf_pq_batch_one_codes_scan_and_store_twin(spark, sf_dir):
    """r12 batched serving (VERDICT r11 ask #3): N queries must cost ONE
    scan of the codes store — the probe frame broadcasts against it —
    and the store-served batch wrapper must agree with the per-query
    store path for every query."""
    import os
    import tempfile

    from cdc_practice_spark.operators import quantization as Q
    from cdc_practice_spark.queries.streaming_queries import TMP_ROOT
    from cdc_practice_spark.session import load_table
    from cdc_practice_spark.streaming.ann_ingest import (
        ivf_pq_topk_batch_from_store,
        ivf_pq_topk_from_store,
        seed_ivf_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=1)
    qdata = [
        (i, [float(x) for x in r.embedding])
        for i, r in enumerate(
            emb.filter(F.col("vec_id").isin([3, 11, 29])).orderBy("vec_id").collect()
        )
    ]
    queries = spark.createDataFrame(qdata, "qid long, qvec array<double>")

    # ONE scan of a persisted codes table for all N queries
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="pq_batch_", dir=TMP_ROOT)
    codes_path = os.path.join(work, "codes")
    Q.pq_encode(emb, cb, keep_cols=("label",)).write.parquet(codes_path)
    codes = spark.read.parquet(codes_path)
    cents = Q.ivf_centroid_rows(emb, dim=len(qdata[0][1]))
    plan = (
        Q.ivf_pq_topk_batch(
            emb, cb, queries, cents, k=5, nprobe=3, shortlist=20, codes=codes
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("codes") >= 1
    assert plan.count(codes_path) == 1, f"codes store scanned != once:\n{plan}"

    # store-served twin: batch == per-query loop, id/cosine/rank-exact
    store = os.path.join(work, "store")
    seed_ivf_ingest(
        spark, emb.select("vec_id", "embedding"),
        [v for _c, v in cents], store, codebook=cb,
    )
    got = {
        (r.qid, r.rank): (r.vec_id, r.cosine)
        for r in ivf_pq_topk_batch_from_store(
            spark, store, emb, cb, queries, k=5, nprobe=3, shortlist=20
        ).collect()
    }
    want = {}
    for i, qv in qdata:
        rows = ivf_pq_topk_from_store(
            spark, store, emb, cb, qv, k=5, nprobe=3, shortlist=20
        ).collect()
        for rank, r in enumerate(rows, 1):
            want[(i, rank)] = (r.vec_id, r.cosine)
    assert got == want


def test_knn_graph_exact_tiers_identical(spark, sf_dir):
    """r12 kNN graph: the expr tier, the Arrow GEMM tier (forced), and
    a multi-block GEMM run must produce the IDENTICAL edge set — same
    cosines, same ranks (the size gate is an implementation detail;
    the full-hash oracle exercises whichever tier the SF lands on).
    Every node has exactly k edges and no self edge survives."""
    from cdc_practice_spark.operators.similarity import knn_graph_exact
    from cdc_practice_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    expr = knn_graph_exact(emb, k=3, gemm_from=10**9).collect()
    gemm = knn_graph_exact(emb, k=3, gemm_from=0).collect()
    blocked = knn_graph_exact(
        emb, k=3, gemm_from=0, block_rows=max(1, n // 4), n_rows=n
    ).collect()
    assert sorted(map(tuple, expr)) == sorted(map(tuple, gemm))
    assert sorted(map(tuple, expr)) == sorted(map(tuple, blocked))
    per = {}
    for r in expr:
        assert r.qid != r.nbr_id
        per[r.qid] = per.get(r.qid, 0) + 1
    assert len(per) == n and set(per.values()) == {3}


def test_knn_graph_ivf_matches_single_query_path(spark, sf_dir):
    """The IVF-PQ graph tier must agree with the single-query serving
    path: for sampled nodes, the graph's edges equal ivf_pq_topk(k+1)
    minus the self hit (same ids, cosines, dense ranks)."""
    from cdc_practice_spark.operators import quantization as Q
    from cdc_practice_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=2)
    cents = Q.ivf_centroid_rows(emb, dim=64)
    g = {
        r.qid: r
        for r in Q.knn_graph_ivf_pq(
            emb, cb, cents, k=4, nprobe=5, shortlist=200
        )
        .groupBy("qid")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("rank", "nbr_id", "cosine"))
            ).alias("edges")
        )
        .collect()
    }
    for qid in (1, 29):
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).head().embedding
        ]
        single = [
            (r.vec_id, r.cosine)
            for r in Q.ivf_pq_topk(
                emb, cb, qv, k=5, nprobe=5, shortlist=200
            ).collect()
            if r.vec_id != qid
        ][:4]
        got = [(e.nbr_id, e.cosine) for e in g[qid].edges]
        assert got == single, (qid, got, single)
        assert [e.rank for e in g[qid].edges] == list(range(1, len(got) + 1))


def test_knn_graph_from_store_nodes_and_codes_contract(spark, sf_dir):
    """r12 store-served graph: the graph's node set is exactly the
    store's assigned ids (corpus + appended batch — the maintenance
    currency claim), and batch serving off a codes-less store raises
    the store-level contract error instead of silently serving an
    empty ADC tier."""
    import os
    import tempfile

    import pytest

    from cdc_practice_spark.operators import quantization as Q
    from cdc_practice_spark.operators.similarity import kmeans_centroids
    from cdc_practice_spark.queries.streaming_queries import TMP_ROOT
    from cdc_practice_spark.session import load_table
    from cdc_practice_spark.streaming.ann_ingest import (
        append_ivf_ingest_batch,
        ivf_pq_topk_batch_from_store,
        knn_graph_from_store,
        seed_ivf_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 4).select("vec_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 5 == 4).select("vec_id", "embedding")
    cents = kmeans_centroids(corpus, k=8, n_iter=1)
    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=1)
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="kgs_t_", dir=TMP_ROOT)

    store = os.path.join(work, "with_codes")
    seed_ivf_ingest(spark, corpus, cents, store, codebook=cb)
    append_ivf_ingest_batch(spark, store, batch, cents, epoch=0, codebook=cb)
    g = knn_graph_from_store(spark, store, emb, cb, k=3, nprobe=5, shortlist=50)
    nodes = {r.qid for r in g.select("qid").distinct().collect()}
    want = {r.vec_id for r in emb.select("vec_id").collect()}
    assert nodes == want  # every assigned id, batch epoch included

    bare = os.path.join(work, "no_codes")
    seed_ivf_ingest(spark, corpus, cents, bare)  # no codebook -> no codes tier
    qs = emb.limit(1).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    with pytest.raises(ValueError, match="codes tier"):
        ivf_pq_topk_batch_from_store(spark, bare, emb, cb, qs)


def test_hard_negatives_graph_tiers_and_mask(spark, sf_dir):
    """exclude_col generalizes the self-mask: both tiers produce the
    identical label-excluded edge set, and no edge ever joins two
    same-label vectors."""
    from cdc_practice_spark.operators.similarity import knn_graph_exact
    from cdc_practice_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    expr = knn_graph_exact(
        emb, k=3, exclude_col="label", gemm_from=10**9
    ).collect()
    gemm = knn_graph_exact(emb, k=3, exclude_col="label", gemm_from=0).collect()
    assert sorted(map(tuple, expr)) == sorted(map(tuple, gemm))
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in expr:
        assert r.qid != r.nbr_id
        assert labels[r.qid] != labels[r.nbr_id]
