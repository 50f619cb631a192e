"""Similarity search over an embedding column (array<float>).

Two tiers:
  1. brute-force cosine top-k — the exact baseline.  Scales linearly:
     the query vector broadcasts, scoring is one codegen'd projection,
     top-k is TakeOrderedAndProject (per-partition heaps, no global sort).
  2. IVF (inverted-file) — the 100 TB path: partition vectors into
     coarse cells (here: the precomputed ``label`` clustering, i.e. the
     output of a k-means run, which is how IVF lists are built), keep a
     centroid table (tiny, broadcast), probe only the nprobe nearest
     cells.  Search cost drops from O(N) to O(N · nprobe / ncells).

A Pandas-UDF batch scorer (Arrow → numpy matmul) covers the
many-queries×many-vectors case where per-row JVM expressions would
re-walk the query matrix per row.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_practice_spark.functions.vectors import (
    cosine,
    lit_double_array,
    to_double,
)
from cdc_practice_spark.plans.cache import tracked_persist


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector.  The query vector is
    a literal array (broadcast into codegen); result is (vec_id, cosine)
    with deterministic id tiebreak."""
    q = lit_double_array(query_vec)
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(to_double(F.col(vec_col)), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def ivf_centroid_df(
    embeddings: DataFrame,
    dim: int,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """The (cell, centroid array<double>) frame ``_ranked_cells`` ranks
    against — factored out (r13) so a caller serving MANY point queries
    against one index can compute (and persist) the groupBy average
    once instead of once per query; the ranking expression over it is
    unchanged, so probe order is bit-identical."""
    dvec = to_double(F.col(vec_col))
    return (
        embeddings.select(F.col(cell_col).alias("cell"), dvec.alias("v"))
        .groupBy("cell")
        .agg(
            F.array(
                *[F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(dim)]
            ).alias("centroid"),
        )
    )


def _ranked_cells(
    embeddings: DataFrame,
    query_vec: list[float],
    cell_col: str,
    vec_col: str = "embedding",
    limit: "int | None" = None,
    centroids_df: "DataFrame | None" = None,
) -> list:
    """Cells in centroid-cosine order vs the query — THE deterministic
    probe ranking both IVF entry points share: centroids are a groupBy
    average, ranked on ROUND-6 cosine with a cell-id tiebreak (centroid
    averages are float-order-sensitive across engines/partitionings; at
    1e-6 granularity the order is engine-deterministic and therefore
    oracle-able).  ncells rows — index metadata, driver-sized.  Pass
    ``centroids_df`` (an ``ivf_centroid_df`` frame, ideally persisted)
    to skip re-aggregating the centroids per query — same expression,
    same rows, one aggregation instead of N."""
    dim = len(query_vec)
    centroids = (
        ivf_centroid_df(embeddings, dim, cell_col, vec_col)
        if centroids_df is None
        else centroids_df
    )
    q = lit_double_array(query_vec)
    ranked = centroids.select(
        "cell", F.round(cosine(F.col("centroid"), q), 6).alias("sim")
    ).orderBy(F.col("sim").desc(), F.col("cell"))
    if limit is not None:
        ranked = ranked.limit(limit)
    return [r.cell for r in ranked.collect()]


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF approximate top-k: rank cells by centroid cosine
    (_ranked_cells — the shared deterministic probe order), scan only
    the nprobe best cells.  Centroids are a groupBy over the (assumed
    precomputed) cell assignment — at index-build time this is k-means;
    here the fixture's ``label`` column IS the cell id.

    The centroid table is tiny (ncells rows) and evaluated driver-side
    into a literal IN-list, so the cell filter pushes into the parquet
    scan (partition pruning when the table is partitioned by cell —
    exactly how you'd lay out 100 TB of embeddings)."""
    best_cells = _ranked_cells(
        embeddings, query_vec, cell_col, vec_col, limit=nprobe
    )
    probed = embeddings.filter(F.col(cell_col).isin(best_cells))
    return brute_force_topk(probed, query_vec, k, id_col, vec_col)


def ivf_filtered_topk(
    embeddings: DataFrame,
    qualified: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Predicate-filtered IVF top-k — vector search with a metadata
    filter ("top-k most similar AMONG documents matching X"), the
    filtered-search mode every production vector store exposes.

    Fixed-nprobe IVF breaks under filters: a selective predicate can
    empty the best cells and return fewer than k rows.  The standard
    fix (FAISS IDSelector / Milvus filtered search) is ADAPTIVE probe
    expansion: rank cells by centroid cosine as usual, then keep
    probing cells in that order until the cells already chosen hold at
    least k qualified vectors.  The rule used here — choose every cell
    whose PRECEDING chosen cells hold < k qualified rows — is a pure
    function of (centroid ranking, per-cell qualified counts), so the
    result is deterministic and oracle-able, unlike "expand until the
    driver saw enough".

    ``embeddings`` is the full store (the IVF index is built over
    everything); ``qualified`` is the metadata-filtered subset (same
    schema).  Per-cell qualified counts are one map-side-combinable
    groupBy; both the centroid table and the count table are
    ncells-sized driver metadata — exactly what an ANN service keeps in
    its index stats, so at 100 TB the driver walk reads cached stats
    and only the chosen cells' partitions are ever scanned (partition
    pruning on cell_col, same layout as ivf_topk)."""
    ranked = _ranked_cells(embeddings, query_vec, cell_col, vec_col)
    counts = {
        r.cell: r.c
        for r in qualified.groupBy(F.col(cell_col).alias("cell"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    chosen, seen = [], 0
    for cell in ranked:
        if seen >= k:
            break
        chosen.append(cell)
        seen += counts.get(cell, 0)
    probed = qualified.filter(F.col(cell_col).isin(chosen))
    return brute_force_topk(probed, query_vec, k, id_col, vec_col)


def rp_lsh_planes(dim: int, n_planes: int, n_tables: int, seed: int = 7):
    """Deterministic random-hyperplane banks (one bank per hash table).
    Sign patterns of Gaussian projections approximate angular locality:
    P[same bit] = 1 − θ/π (Charikar's SimHash bound), so vectors at
    small angle collide in some table with high probability."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def rp_lsh_signatures(
    embeddings: DataFrame,
    planes,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, sig) — bit-packed sign signature per hash table, one
    Arrow GEMM pass (batch_matrix @ planes.T per table; the planes array
    is a closure constant of O(tables·planes·dim) floats, never a join
    side).  At 100 TB this is the index-build scan; signatures land in a
    (table, sig)-bucketable layout and the corpus is never pairwise
    compared."""
    import pandas as pd  # noqa: F401 (local, mirrors module convention)

    n_tables, n_planes = planes.shape[0], planes.shape[1]

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            ids = pdf[id_col].to_numpy()
            frames = []
            for t in range(n_tables):
                bits = (E @ planes[t].T) > 0
                sig = np.zeros(len(E), np.int64)
                for j in range(n_planes):
                    sig = (sig << 1) | bits[:, j].astype(np.int64)
                frames.append(
                    pd.DataFrame({id_col: ids, "table": np.int32(t), "sig": sig})
                )
            yield pd.concat(frames)

    return embeddings.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, table int, sig long"
    )


def rp_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """LSH-bucketed approximate top-k (the SURVEY's 'LSH-bucketed
    variant' beside IVF): candidates are the union of the query's
    bucket — plus, with ``multiprobe=1``, every bucket at Hamming
    distance 1 from it (standard multi-probe LSH: perturbing the QUERY's
    signature buys the recall of extra tables without growing the
    index) — across ``n_tables`` hyperplane banks, then exact-cosine
    reranked; never an all-pairs pass.  Returns (vec_id, cosine,
    n_candidates) where n_candidates is the pre-rerank candidate count
    (the sublinearity witness the recall query asserts on).  Measured on
    the fixtures (near-isotropic synthetic embeddings — the HARD case
    for angular LSH): recall@10 = 6/8/9 at sf0.001/0.01/0.1 touching
    ≤30% of the corpus."""
    dim = len(query_vec)
    planes = rp_lsh_planes(dim, n_planes, n_tables, seed)
    sigs = rp_lsh_signatures(embeddings, planes, id_col, vec_col)
    return rp_lsh_topk_from_index(
        embeddings, sigs, planes, query_vec, k, multiprobe, id_col, vec_col
    )


def rp_lsh_probe_cond(planes, query_vec, multiprobe: int = 1):
    """The query's multi-probe bucket predicate over a (table, sig)
    signature store — same sign-cut kernel as the index build, run
    driver-side (O(tables·planes) work, no data touched)."""
    import numpy as np

    n_tables, n_planes = planes.shape[0], planes.shape[1]
    qv = np.asarray(query_vec, dtype=np.float64)
    cond = None
    for t in range(n_tables):
        bits = (qv @ planes[t].T) > 0
        s = 0
        for j in range(n_planes):
            s = (s << 1) | int(bits[j])
        want = [s]
        if multiprobe >= 1:
            want += [s ^ (1 << j) for j in range(n_planes)]
        if multiprobe >= 2:
            want += [
                s ^ (1 << i) ^ (1 << j)
                for i in range(n_planes)
                for j in range(i + 1, n_planes)
            ]
        leg = (F.col("table") == t) & F.col("sig").isin(want)
        cond = leg if cond is None else (cond | leg)
    return cond


def rp_lsh_topk_from_index(
    embeddings: DataFrame,
    index_sigs: DataFrame,
    planes,
    query_vec: list[float],
    k: int = 10,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k served from a PREBUILT (id, table, sig) signature store —
    the query path of an ANN service, split out from ``rp_lsh_topk`` so
    an incrementally-maintained store (``rp_lsh_ingest``) serves queries
    without rehashing the corpus."""
    cond = rp_lsh_probe_cond(planes, query_vec, multiprobe)
    cand_ids = tracked_persist(index_sigs.filter(cond).select(id_col).distinct())
    n_cand = cand_ids.count()  # index-sized job; also the sublinearity stat
    cands = embeddings.join(cand_ids, on=id_col, how="left_semi")
    return brute_force_topk(cands, query_vec, k, id_col, vec_col).withColumn(
        "n_candidates", F.lit(n_cand).cast("long")
    )


def rp_lsh_filtered_topk_from_index(
    qualified: DataFrame,
    index_sigs: DataFrame,
    planes,
    query_vec: list[float],
    k: int = 10,
    max_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Metadata-FILTERED top-k served from the prebuilt signature store
    — the LSH sibling of ivf_filtered_topk: a selective filter can
    empty the query's buckets, so the probe expands its Hamming RADIUS
    (exact bucket → radius 1 → radius 2 …) until the candidate ∩
    qualified set holds >= k vectors or max_probe exhausts.  The
    expansion is a pure function of candidate counts (index-sized
    jobs), so results are deterministic and the radius is reported.

    ``qualified`` is the metadata-filtered subset (id + vector); the
    store is probed with partition-pruned (table, sig) predicates as
    usual, and only candidates that pass the filter are ever reranked.
    At 100 TB: each widening touches O(tables × radius-combos) more
    bucket partitions, never the full store."""
    # radius starts at the service's STANDARD probe depth (1 — the same
    # Hamming-1 multiprobe rp_lsh_topk uses for its recall), and widens
    # only on under-fill: the expansion exists to survive selective
    # filters, not to replace the baseline probe depth
    cand_ids, n_cand, radius = None, 0, 1
    for depth in range(1, max_probe + 1):
        cond = rp_lsh_probe_cond(planes, query_vec, multiprobe=depth)
        if cand_ids is not None:
            # the widened probe supersedes the prior radius's candidate
            # set — release it now (r10, r9 ADVICE) instead of caching
            # up to max_probe dead DataFrames until release_tracked
            cand_ids.unpersist()
        cand_ids = (
            index_sigs.filter(cond)
            .select(id_col)
            .distinct()
            .join(qualified.select(id_col), on=id_col, how="left_semi")
        )
        cand_ids = tracked_persist(cand_ids)
        n_cand, radius = cand_ids.count(), depth
        if n_cand >= k:
            break
    cands = qualified.join(cand_ids, on=id_col, how="left_semi")
    return (
        brute_force_topk(cands, query_vec, k, id_col, vec_col)
        .withColumn("n_candidates", F.lit(n_cand).cast("long"))
        .withColumn("probe_radius", F.lit(radius).cast("int"))
    )


def rp_lsh_ingest(
    new_vectors: DataFrame,
    index_sigs: DataFrame,
    planes,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dedup_replays: bool = False,
) -> DataFrame:
    """Append a NEW batch of vectors into an existing signature store at
    O(batch) cost — the ANN twin of ``operators/dedup.py::
    incremental_dedup``: only the arriving vectors are hashed (one Arrow
    GEMM pass over the batch), the indexed corpus is never rescanned or
    re-signed.  Returns the merged (id, table, sig) store; because the
    signature of a vector depends only on the fixed planes, ingest
    followed by any query is EXACTLY equivalent to a from-scratch
    rebuild over corpus ∪ batch (asserted by the
    ``ann_incremental_ingest`` oracle query and tests).  At 100 TB the
    union is a partition append into the (table, sig)-bucketed store
    (tools/ab_ann.py --ingest measures the flat cost).

    INPUT CONTRACT (r7 ADVICE): the default path assumes EXACTLY-ONCE
    batch delivery — a re-delivered batch would duplicate its signature
    rows and break the ingest==rebuild row identity.  Callers on an
    at-least-once bus pass ``dedup_replays=True``: already-present batch
    ids are detected with one broadcast semi probe of the index (the
    batch's id set broadcasts — never an index-sized shuffle) and their
    rows are dropped before the union, making ingest idempotent."""
    new_sigs = rp_lsh_signatures(new_vectors, planes, id_col, vec_col)
    if dedup_replays:
        # anti-join on the full (id, table) PAIR, not the id alone (r8
        # ADVICE): a prior delivery that crashed after writing only a
        # subset of an id's table rows is REPAIRED by the replay — the
        # missing table rows pass the anti-join, the present ones are
        # skipped.  `present` is batch-bounded (batch ids × n_tables),
        # still broadcast-sized.
        present = (
            index_sigs.join(
                F.broadcast(new_vectors.select(id_col).distinct()),
                id_col,
                "left_semi",
            )
            .select(id_col, "table")
            .distinct()
        )
        new_sigs = new_sigs.join(
            F.broadcast(present), [id_col, "table"], "left_anti"
        )
    return index_sigs.unionByName(new_sigs)


def compact_ann_store(
    spark,
    store_path: str,
    delta_path: str,
    n_bucket_files: int = 256,
    full_rewrite_frac: float = 0.3,
) -> int:
    """Fold the LSM-style ingest delta files into the (table, sig)-
    bucketed signature store — the maintenance twin of
    ``streaming/corpus.py::compact_ingest_index`` (r7 VERDICT ask #3):
    without it an ANN service's read amplification grows by one delta
    scan per ingested batch forever.

    Two fold tiers, picked by the delta's bucket spread (measured in
    tools/ab_ann.py --ingest):

    - TOUCHED BUCKETS ONLY (spread ≤ ``full_rewrite_frac`` of the
      store's buckets — clustered or small batches, the shape real
      embedding traffic has): the delta's distinct (table, sig) pairs
      (a delta-sized driver list) prune the store read to just those
      bucket partitions; each touched bucket is rewritten via a tmp-dir
      write and per-bucket directory swap, untouched buckets are
      neither read nor written — O(delta + touched buckets), not
      O(store).
    - FULL REWRITE (spread above the threshold — a uniform batch over
      few-thousand-bucket stores spreads across ~all of them, where
      per-bucket swapping degenerates to a store rewrite PLUS one
      filesystem swap per bucket — measured 161 s of mostly swap-loop
      overhead): store ∪ delta is rewritten once and the WHOLE store
      directory is swapped in two renames.

    Run on a quiescent store (no concurrent queries/ingests — same
    single-writer discipline as the dedup-index compaction; a query
    racing the swap could briefly miss a bucket or the store).

    Crash-idempotent: both tiers full-row-dedup before writing (the
    store's invariant is one row per (id, table) — ``dedup_replays``
    exists to preserve it), so re-running after a crash collapses
    already-folded rows instead of doubling them; the full tier's
    between-renames window (store temporarily absent, ``.old`` present)
    self-heals at the next call; the delta dir is deleted last.
    Returns the merged row count of the rewritten buckets."""
    heal_ann_store(store_path)

    delta = spark.read.parquet(delta_path)
    touched = [
        (int(r["table"]), int(r["sig"]))
        for r in delta.select("table", "sig").distinct().collect()
    ]
    if not touched:  # empty delta: nothing to fold
        shutil.rmtree(delta_path)
        return 0
    existing = []
    for t in os.listdir(store_path):
        if not t.startswith("table="):
            continue
        for s in os.listdir(os.path.join(store_path, t)):
            if s.startswith("sig="):
                existing.append(
                    (int(t.split("=")[1]), int(s.split("=")[1]))
                )
    spread = len(set(touched) & set(existing)) / max(len(existing), 1)
    store = spark.read.parquet(store_path)
    tmp = store_path + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    if spread > full_rewrite_frac:
        # full tier: one rewrite, ONE directory swap (not one per
        # bucket — the per-bucket loop at ~16k buckets is pure
        # filesystem overhead when nearly everything is touched)
        merged = store.unionByName(delta).dropDuplicates()
        merged.repartition(n_bucket_files, "table", "sig").write.mode(
            "overwrite"
        ).partitionBy("table", "sig").parquet(tmp)
        n = int(spark.read.parquet(tmp).count())
        old = store_path + ".old"
        os.rename(store_path, old)
        os.rename(tmp, store_path)
        shutil.rmtree(old)
        shutil.rmtree(delta_path)
        return n
    rewrite = sorted(set(touched))
    by_table: dict[int, list[int]] = {}
    for t, s in rewrite:
        by_table.setdefault(t, []).append(s)
    cond = None
    for t, sigs in by_table.items():
        leg = (F.col("table") == t) & F.col("sig").isin(sigs)
        cond = leg if cond is None else (cond | leg)
    merged = store.filter(cond).unionByName(delta).dropDuplicates()
    merged.repartition(n_bucket_files, "table", "sig").write.mode(
        "overwrite"
    ).partitionBy("table", "sig").parquet(tmp)
    n = int(spark.read.parquet(tmp).count())
    for t, s in rewrite:
        src = os.path.join(tmp, f"table={t}", f"sig={s}")
        dst = os.path.join(store_path, f"table={t}", f"sig={s}")
        if not os.path.isdir(src):
            continue  # dedup emptied the bucket (degenerate input)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        # rename-aside rather than delete-then-replace: a crash between
        # the two steps leaves the bucket's only copy as the aside, which
        # heal_ann_store restores (delete-then-replace would lose the
        # bucket's pre-existing rows forever).  The aside is UNDERSCORE-
        # prefixed (r8 ADVICE): Spark's partition discovery skips _names,
        # so a reader hitting the store before the heal runs never sees
        # a mixed-type 'sig' partition value or stale duplicate rows.
        bucket_old = _ann_bucket_aside(dst)
        if os.path.isdir(dst):
            os.rename(dst, bucket_old)
        os.replace(src, dst)
        shutil.rmtree(bucket_old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(delta_path)
    return n


def _ann_bucket_aside(bucket_dir: str) -> str:
    d, b = os.path.split(bucket_dir)
    return os.path.join(d, "_old." + b)


def heal_ann_store(store_path: str) -> None:
    """Restore an ANN-store compaction interrupted in any crash window —
    runs at compaction entry AND in the load path (``load_ann_store``),
    so a store is never read half-swapped (r8 ADVICE):

      - full tier, between its two renames: the store dir is missing but
        its ``.old`` twin exists — rename it back;
      - full tier, after the swap: a stale ``.old`` twin — drop it;
      - touched tier, between a bucket's rename-aside and replace: the
        live bucket is missing, its ``_old.sig=N`` aside holds the only
        copy — rename it back; live bucket present ⇒ the aside is stale
        — drop it.  (Asides are underscore-prefixed so partition
        discovery ignores them even before this walk runs.)"""
    old = store_path + ".old"
    if not os.path.isdir(store_path) and os.path.isdir(old):
        os.rename(old, store_path)
    shutil.rmtree(old, ignore_errors=True)
    if not os.path.isdir(store_path):
        return
    jrn = _erase_journal_path(store_path)
    if not os.path.isdir(jrn) and os.path.isdir(jrn + ".old"):
        os.rename(jrn + ".old", jrn)  # crash mid-journal-update
    for stale in (jrn + ".old", jrn + ".staging"):
        shutil.rmtree(stale, ignore_errors=True)
    for t in os.listdir(store_path):
        tp = os.path.join(store_path, t)
        if not t.startswith("table=") or not os.path.isdir(tp):
            continue
        for s in os.listdir(tp):
            if s.startswith("_old.sig="):
                aside = os.path.join(tp, s)
                twin = os.path.join(tp, s[len("_old."):])
            elif s.startswith("sig=") and s.endswith(".old"):
                # legacy pre-r9 aside naming — same restore-or-drop rule
                # (left behind by a crash under the old code, and a bare
                # listing would mis-parse 'sig=5.old' as a bucket)
                aside = os.path.join(tp, s)
                twin = aside[: -len(".old")]
            else:
                continue
            if os.path.isdir(twin):
                shutil.rmtree(aside)
            else:
                os.rename(aside, twin)


def _erase_journal_path(store_path: str) -> str:
    # underscore-prefixed: invisible to Spark's partition discovery
    return os.path.join(store_path, "_erase_journal")


def load_ann_store(spark, store_path: str) -> DataFrame:
    """Read the bucketed (id, table, sig) signature store, healing any
    interrupted compaction first — the reader-side half of the crash
    protocol (the aside naming keeps even an un-healed store readable;
    the heal makes it exact).  A pending ERASE journal (a deletion that
    crashed mid-apply) is read-repaired: its ids are anti-joined out of
    the returned frame, so erased subjects never reappear in query
    results even before the next ``rp_lsh_erase`` call completes the
    physical deletion."""
    heal_ann_store(store_path)
    df = spark.read.parquet(store_path)
    jrn = _erase_journal_path(store_path)
    if os.path.isdir(jrn):
        pending = spark.read.parquet(jrn).select(df.columns[0]).distinct()
        df = df.join(F.broadcast(pending), df.columns[0], "left_anti")
    return df


def rp_lsh_erase(
    spark,
    store_path: str,
    erase_vectors: DataFrame,
    planes,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bucket_files: int = 8,
) -> int:
    """GDPR-style erasure from the bucketed signature store at
    O(erase + touched buckets) — the ANN sibling of the snapshot/MV
    key-erasure family (cdc/incremental.py) and the content-purge
    (streaming/corpus.py::purge_ingest_docs): a deletion request must
    remove the subjects' rows from DERIVED stores too, not only the
    primary table.

    The erased ids' signatures are recomputed from their vectors (one
    O(erase) GEMM — the deletion request arrives with, or joins to, the
    primary embedding rows), which names the EXACT (table, sig) buckets
    holding their rows: only those bucket partitions are read
    (partition-pruned scan), anti-joined, and swapped via the same
    underscore-prefixed rename-aside protocol as compaction — untouched
    buckets are neither read nor written, and a bucket emptied by the
    erase is deleted.

    Crash-durable (review r9): the erase set's signatures are JOURNALED
    inside the store before any mutation and removed only after the
    last bucket swap, so a crash can never silently un-apply the
    deletion — ``load_ann_store`` read-repairs pending journal ids out
    of every read, and the next rp_lsh_erase call (even with an empty
    new set) unions the journal and completes the physical deletion.
    Returns the number of signature rows removed in THIS call."""
    heal_ann_store(store_path)
    new_sigs = rp_lsh_signatures(erase_vectors, planes, id_col, vec_col)
    jrn = _erase_journal_path(store_path)
    if os.path.isdir(jrn):
        new_sigs = new_sigs.unionByName(
            spark.read.parquet(jrn)
        ).dropDuplicates()
    sigs = tracked_persist(new_sigs)
    touched = sorted(
        (int(r["table"]), int(r["sig"]))
        for r in sigs.select("table", "sig").distinct().collect()
    )
    if not touched:
        return 0
    # journal FIRST — the commit that makes the deletion durable
    staging = jrn + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    sigs.write.mode("overwrite").parquet(staging)
    if os.path.isdir(jrn):
        os.rename(jrn, jrn + ".old")
    os.rename(staging, jrn)
    shutil.rmtree(jrn + ".old", ignore_errors=True)
    by_table: dict[int, list[int]] = {}
    for t, s in touched:
        by_table.setdefault(t, []).append(s)
    cond = None
    for t, ss in by_table.items():
        leg = (F.col("table") == t) & F.col("sig").isin(ss)
        cond = leg if cond is None else (cond | leg)
    store = spark.read.parquet(store_path)
    hit = store.filter(cond)
    n_erased = int(
        hit.join(
            F.broadcast(sigs.select(id_col).distinct()), id_col, "left_semi"
        ).count()
    )
    if n_erased == 0:
        shutil.rmtree(jrn, ignore_errors=True)  # nothing pending remains
        return 0
    kept = hit.join(
        F.broadcast(sigs.select(id_col).distinct()), id_col, "left_anti"
    )
    tmp = store_path + ".erasing"
    shutil.rmtree(tmp, ignore_errors=True)
    kept.repartition(n_bucket_files, "table", "sig").write.mode(
        "overwrite"
    ).partitionBy("table", "sig").parquet(tmp)
    for t, s in touched:
        src = os.path.join(tmp, f"table={t}", f"sig={s}")
        dst = os.path.join(store_path, f"table={t}", f"sig={s}")
        if not os.path.isdir(dst):
            continue  # the erase ids hashed to a bucket the store lacks
        aside = _ann_bucket_aside(dst)
        os.rename(dst, aside)
        if os.path.isdir(src):
            os.replace(src, dst)  # rewritten bucket
        # else: the erase emptied the bucket — it simply stays deleted
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(jrn, ignore_errors=True)  # last: the erase is complete
    return n_erased


def kmeans_fit_assign(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means — the IVF index-BUILD step (ivf_topk
    assumes a precomputed cell assignment; this is where it comes from).

    Spark-first shape: each iteration is one codegen'd projection
    (distances to k literal centroids — no join, no shuffle) plus one
    groupBy(cell) average (single shuffle of k×dim partials).  The only
    driver-side state is the k×dim centroid matrix itself — the same
    index-build-time collect ivf_topk already does, O(k·dim) bytes, NOT
    data-sized.  At 100 TB this is exactly how you build IVF lists:
    iterate on a sample, then one final assignment pass over the corpus.

    Determinism (for the DuckDB oracle): init = the first k vectors by
    id; distances and centroid averages round to 6 decimals before every
    argmin/compare; ties break on the lower cell id (array_position
    returns the FIRST match).  Output: (vec_id, cell, dist2).

    Raises if any cell empties out (can't happen on the fixtures; a real
    deployment re-seeds the cell — deterministic handling would differ
    per engine, so it's an error here rather than silent divergence)."""
    cents = kmeans_centroids(embeddings, k, n_iter, id_col, vec_col)
    return ivf_assign(embeddings, cents, id_col, vec_col)


def _ivf_dists_col(centroids):
    ds = []
    for c in centroids:
        lit_c = lit_double_array(c)
        d = F.aggregate(
            F.zip_with(F.col("v"), lit_c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        ds.append(F.round(d, 6))
    return F.array(*ds)


def _ivf_assign_np(V, C):
    """numpy twin of ``_ivf_dists_col`` + argmin/array_min (r12): per
    (row, cell) lane the squared differences accumulate in ascending-
    dimension order from 0.0 (the HOF left fold — elementwise IEEE ops
    are order-identical), distances round through the exact JVM HALF_UP
    twin, argmin takes the first minimum (array_position's tie rule).
    Returns (cell int32 array, dist2 float64 array).  Parity pinned in
    tests/test_similarity.py::test_ivf_assign_matches_expression_twin."""
    import numpy as np

    from cdc_practice_spark.operators.quantization import _round6_exact_np

    n = V.shape[0]
    k = C.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for t in range(V.shape[1]):
        d = V[:, t : t + 1] - C[:, t][None, :]
        acc += d * d
    r = _round6_exact_np(acc)
    cell = np.argmin(r, axis=1)
    return cell.astype(np.int32), r[np.arange(n), cell]


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """The Lloyd's-iterations half of ``kmeans_fit_assign``, exposed so
    the learned centroid matrix can be FROZEN and reused — the IVF
    index's trained parameters (k×dim floats, driver-sized by
    definition).  Same determinism contract as kmeans_fit_assign."""
    emb = embeddings.select(F.col(id_col), to_double(F.col(vec_col)).alias("v"))
    # deterministic init: the first k vectors by id (equals ids 0..k-1
    # on the full fixture, so the kmeans-build oracle is unchanged)
    cents = [
        [float(x) for x in r.v]
        for r in emb.orderBy(id_col).limit(k).collect()
    ]
    if len(cents) != k:
        raise ValueError(f"need at least {k} vectors for deterministic init")
    # Assignment runs in the Arrow/numpy kernel (r12, same reasoning as
    # pq_train): the k×dim literal-distance expression is CodegenFallback
    # (interpreted per element per row per iteration); the kernel is the
    # bit-exact twin (_ivf_assign_np) and the centroid update stays the
    # same JVM aggregate over identical (cell, v) rows in the same order.
    import numpy as np
    import pandas as pd

    for _ in range(n_iter):
        C = np.asarray(cents, dtype=np.float64)

        def gen(batches, C=C):
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.array(pdf["v"].tolist(), dtype=np.float64)
                cell, _ = _ivf_assign_np(V, C)
                yield pd.DataFrame({"cell": cell, "v": list(V)})

        assigned = emb.select("v").mapInPandas(
            gen, "cell int, v array<double>"
        )
        new_cents = (
            assigned.groupBy("cell")
            .agg(*[F.round(F.avg(F.col("v")[i]), 6).alias(f"c{i}")
                   for i in range(len(cents[0]))])
            .collect()
        )
        if len(new_cents) != k:
            raise RuntimeError(
                f"k-means cell emptied out ({len(new_cents)}/{k} survive) — "
                "re-seed with a different k or init"
            )
        cents = [
            [float(r[f"c{i}"]) for i in range(len(cents[0]))]
            for r in sorted(new_cents, key=lambda r: r.cell)
        ]
    return cents


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-frozen-centroid assignment — the O(batch) INGEST half of
    IVF maintenance (the IVF twin of ``rp_lsh_ingest``): an arriving
    batch is assigned under the FROZEN trained centroids in one
    codegen'd projection (distances to k literal centroids — no join,
    no shuffle, the corpus is never re-assigned), so
    ingest-then-union ≡ assigning corpus ∪ batch from scratch under the
    same centroids (the invariant ``ann_ivf_ingest`` oracles).
    Re-clustering (centroid drift) is the separate, rarer re-build job
    — exactly the frozen-stats discipline the corpus pipeline uses.
    Output: (id, cell, dist2), ties to the lower cell id.

    Runs in the Arrow/numpy kernel (r12 — the bit-exact twin of the
    k×dim literal-distance expression, which was CodegenFallback and
    therefore interpreted per element per row; parity pinned in
    tests/test_similarity.py)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    C = np.asarray(centroids, dtype=np.float64)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["_v"].tolist(), dtype=np.float64)
            cell, dist2 = _ivf_assign_np(V, C)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "cell": cell, "dist2": dist2}
            )

    id_field = next(f for f in embeddings.schema.fields if f.name == id_col)
    schema = StructType(
        [
            id_field,
            StructField("cell", IntegerType()),
            StructField("dist2", DoubleType()),
        ]
    )
    # No spread_for_python here (r12 lesson): its partition probe
    # (df.rdd) EXECUTES the upstream AQE query stages, and ivf_assign's
    # callers pass complex frames (store unions, arriving batches) —
    # the probe re-ran the whole upstream once per call.  The kernel is
    # numpy-vectorized (~µs/row), so narrow local inputs don't need the
    # widening the interpreted paths did; at scale inputs arrive with
    # real partition counts.
    return embeddings.select(
        F.col(id_col), to_double(F.col(vec_col)).alias("_v")
    ).mapInPandas(gen, schema)


def ivf_cell_stats(assignments: DataFrame) -> DataFrame:
    """Per-cell index statistics from an (id, cell, dist2) assignment —
    the metadata an IVF service persists AT INGEST so centroid drift is
    observable without touching the vectors: (cell, n, sum_dist2).
    dist2 is round-6 at assignment (ivf_assign), summed as DECIMAL so
    the stat is order-exact; ncells rows — index-sized, one map-side-
    combinable aggregate."""
    return assignments.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("dist2").cast("decimal(24,6)")).alias("sum_dist2"),
    )


def ivf_drift_report(build_stats: DataFrame, now_stats: DataFrame) -> DataFrame:
    """Centroid-drift report for a frozen-centroid IVF store (r10 —
    VERDICT r9 ask #5): compares the index stats AT BUILD time with the
    stats after ingest has accreted under the frozen centroids.  A
    long-lived ingest degrades recall silently — arriving vectors that
    don't match the trained distribution pile into few cells (probe
    imbalance) and sit far from their centroids (quantization error) —
    so the two metrics every IVF deployment watches are surfaced here:

      - ``max_share_ppm``: the largest cell's share of the store, in
        integer parts-per-million (probe cost ∝ the probed cells'
        share, so a growing max share is the imbalance alarm);
      - ``mean_dist2_micro``: mean squared assign-distance in integer
        micro units (floor; the quantization-error alarm).

    Decision rule (the re-cluster trigger): share drift fires when the
    max share grew past 1.2× build, distance drift past 1.1× build —
    integer cross-multiplication, no float compare.  All inputs are
    ncells-row stats frames; the report is one row of driver-sized
    metadata, exactly what a monitoring system scrapes."""

    def roll(stats: DataFrame, tag: str) -> DataFrame:
        return stats.agg(
            F.sum("n").cast("long").alias(f"n_{tag}"),
            F.max("n").cast("long").alias(f"max_n_{tag}"),
            F.sum("sum_dist2").alias(f"d_{tag}"),
        )

    b, c = roll(build_stats, "b"), roll(now_stats, "c")
    joined = b.crossJoin(c)
    # loud failure on a meaningless baseline (review r10): empty stats
    # roll to NULL aggregates, and every downstream div/compare would
    # emit NULL drift booleans — a monitoring consumer testing the flag
    # would see falsy None and the alarm would silently never fire
    head = joined.head()
    if not head.n_b or not head.n_c:
        raise ValueError(
            "ivf_drift_report: empty stats frame (build n="
            f"{head.n_b}, now n={head.n_c}) — a drift report against an "
            "empty store is meaningless; build the index first"
        )
    return (
        joined
        .select(
            F.expr("max_n_b * 1000000 div n_b").alias("max_share_build_ppm"),
            F.expr("max_n_c * 1000000 div n_c").alias("max_share_now_ppm"),
            F.expr(
                "cast(d_b * 1000000 as decimal(38,0)) div n_b"
            ).cast("long").alias("mean_dist2_build_micro"),
            F.expr(
                "cast(d_c * 1000000 as decimal(38,0)) div n_c"
            ).cast("long").alias("mean_dist2_now_micro"),
        )
        .select(
            "*",
            (
                F.col("max_share_now_ppm") * 10
                > F.col("max_share_build_ppm") * 12
            ).alias("share_drift"),
            (
                F.col("mean_dist2_now_micro") * 10
                > F.col("mean_dist2_build_micro") * 11
            ).alias("dist_drift"),
        )
    )


def swap_stats_sidecar(store_dir: str, stats: DataFrame, name: str = "_cell_stats") -> None:
    """Atomically publish a stats sidecar (r10 ADVICE: rmtree+rename is
    NOT atomic — a scrape between the two calls saw no sidecar at all).
    The manifest pattern instead: stage the frame at a fresh generation
    dir ``{name}_g{n}`` no pointer references, then commit by
    ``os.replace`` of the one-line pointer file ``{name}.ptr``.  A
    reader always resolves a complete generation, and the IMMEDIATELY
    SUPERSEDED generation survives one more swap (GC'd at N+2, not N+1)
    so a lazy DataFrame that resolved the pointer just before a swap
    can still finish its scan — only generations two swaps old are
    reclaimed (review r11: resolve and scan are not atomic)."""
    ptr = os.path.join(store_dir, name + ".ptr")
    prev = None
    gen = 0
    if os.path.exists(ptr):
        with open(ptr) as fh:
            prev = fh.read().strip()
        gen = int(prev.rsplit("_g", 1)[1]) + 1
    staged = f"{name}_g{gen}"
    stats.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(store_dir, staged)
    )
    tmp = ptr + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(staged)
    os.replace(tmp, ptr)
    for d in os.listdir(store_dir):
        if d.startswith(name + "_g") and d not in (staged, prev):
            shutil.rmtree(os.path.join(store_dir, d), ignore_errors=True)


def read_stats_sidecar(spark, store_dir: str, name: str = "_cell_stats") -> DataFrame:
    """Resolve a sidecar through its pointer file (legacy un-pointered
    ``{name}`` dirs still readable for stores written before r11)."""
    ptr = os.path.join(store_dir, name + ".ptr")
    if os.path.exists(ptr):
        with open(ptr) as fh:
            return spark.read.parquet(os.path.join(store_dir, fh.read().strip()))
    return spark.read.parquet(os.path.join(store_dir, name))


def append_ivf_assignments(
    spark, store_dir: str, assignments: DataFrame, batch_id: str
) -> None:
    """Persist a batch's (id, cell, dist2) assignment rows AND the
    store's refreshed per-cell stats sidecar — the at-ingest bookkeeping
    that makes drift observable later without rescanning assignments:
    ``assign_v{batch_id}`` holds the rows, ``_cell_stats`` (pointer-file
    atomic swap) the cumulative ivf_cell_stats over everything appended
    so far.  Stats are recomputed from the appended dirs (ncells-row
    aggregate over id-pruned columns), not incrementally guessed — the
    sidecar can always be dropped and rebuilt."""
    os.makedirs(store_dir, exist_ok=True)
    assignments.write.mode("overwrite").parquet(
        os.path.join(store_dir, f"assign_v{batch_id}")
    )
    swap_stats_sidecar(
        store_dir, ivf_cell_stats(load_ivf_assignments(spark, store_dir))
    )


def load_ivf_assignments(spark, store_dir: str) -> DataFrame:
    paths = [
        os.path.join(store_dir, d)
        for d in sorted(os.listdir(store_dir))
        if d.startswith("assign_v")
    ]
    return spark.read.parquet(*paths)


def load_ivf_stats(spark, store_dir: str) -> DataFrame:
    """The persisted per-cell stats sidecar — what a monitoring system
    scrapes and what ivf_drift_report compares across time."""
    return read_stats_sidecar(spark, store_dir, "_cell_stats")


def ivf_rebuild(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The re-cluster job a fired drift alarm triggers: re-fit the
    centroids over the CURRENT corpus (standing + everything ingested
    since) and re-assign the whole store under them — touched = every
    row, by design: this is the rare batch job the frozen-centroid
    discipline (ivf_assign) defers to, not the ingest path.  Returns
    (centroids, assignments); the post-rebuild assignment is identical
    to a from-scratch kmeans_fit_assign over the same vectors (pinned
    in tests/test_similarity.py), so serving code swaps stores with no
    special cases.  At 100 TB: the fit iterates on the same one-
    projection-plus-one-aggregate plan as the original build (driver
    traffic stays k×dim), and the re-assign is one codegen'd pass."""
    cents = kmeans_centroids(embeddings, k, n_iter, id_col, vec_col)
    return cents, ivf_assign(embeddings, cents, id_col, vec_col)


def topk_similar_pairs(
    embeddings: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Top-k most-similar pairs, blocked within IVF cells: one Arrow
    batch per cell, one numpy matmul for all intra-cell pairs, per-cell
    top-k with the exact global tiebreak order, then a tiny global top-k.

    This is the scale shape: cells are processed independently (an
    applyInPandas shuffle on the cell key), pair scoring is a vectorized
    GEMM instead of per-pair expression evaluation (measured ~5×), and
    only k rows per cell reach the final merge.  Matches the expression
    implementation (kept below as topk_similar_pairs_expr) bit-for-bit
    at round-6."""
    import numpy as np
    import pandas as pd

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        M = np.vstack(pdf[vec_col].map(np.asarray)).astype("float64")
        n = np.linalg.norm(M, axis=1)
        ids = pdf[id_col].to_numpy()
        S = (M @ M.T) / np.outer(n, n)
        iu = np.triu_indices(len(ids), 1)
        c = np.round(S[iu], 6)
        a = np.minimum(ids[iu[0]], ids[iu[1]])
        b = np.maximum(ids[iu[0]], ids[iu[1]])
        # per-cell top-k under the GLOBAL order (cosine desc, id_a, id_b)
        order = np.lexsort((b, a, -c))[:k]
        return pd.DataFrame({"id_a": a[order], "id_b": b[order], "cosine": c[order]})

    return (
        embeddings.select(
            F.col(id_col).alias(id_col),
            F.col(vec_col).alias(vec_col),
            F.col(cell_col).alias("cell"),
        )
        .groupBy("cell")
        .applyInPandas(per_cell, "id_a long, id_b long, cosine double")
        .orderBy(F.col("cosine").desc(), "id_a", "id_b")
        .limit(k)
    )


def threshold_similar_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """All intra-cell pairs with round-6 cosine >= threshold — the pair
    generator for embedding-level semantic dedup (pairs feed connected
    components, operators/cluster.py).  Same cell-blocked GEMM shape as
    topk_similar_pairs, but emitting the full above-threshold edge list
    instead of a top-k: edge count is what the closure needs, and the
    threshold filter applies INSIDE the Arrow batch, so only true
    near-dup edges ever leave the Python worker."""
    import numpy as np
    import pandas as pd

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        M = np.vstack(pdf[vec_col].map(np.asarray)).astype("float64")
        n = np.linalg.norm(M, axis=1)
        ids = pdf[id_col].to_numpy()
        S = (M @ M.T) / np.outer(n, n)
        iu = np.triu_indices(len(ids), 1)
        c = np.round(S[iu], 6)
        keep = c >= threshold
        a = np.minimum(ids[iu[0]][keep], ids[iu[1]][keep])
        b = np.maximum(ids[iu[0]][keep], ids[iu[1]][keep])
        return pd.DataFrame({"id_a": a, "id_b": b, "cosine": c[keep]})

    return (
        embeddings.select(
            F.col(id_col).alias(id_col),
            F.col(vec_col).alias(vec_col),
            F.col(cell_col).alias("cell"),
        )
        .groupBy("cell")
        .applyInPandas(per_cell, "id_a long, id_b long, cosine double")
    )


def topk_similar_pairs_expr(
    embeddings: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    block: bool = True,
) -> DataFrame:
    """Pure-JVM-expression variant of topk_similar_pairs (no Python) —
    kept as the cross-check reference and for clusters where Python
    workers are undesirable."""
    # Precompute per-row norms BEFORE the self-join: cosine inside the
    # pair projection would otherwise recompute both norms per pair
    # (measured 3× on the bench).  The division stays dot/(na*nb) —
    # bit-identical to the oracle's formula.
    from cdc_practice_spark.functions.vectors import dot, norm

    base = embeddings.select(
        F.col(id_col).alias("vid"),
        to_double(F.col(vec_col)).alias("v"),
        F.col(cell_col).alias("cell"),
    ).withColumn("nrm", norm(F.col("v")))
    base = tracked_persist(base)
    a = base.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), "cell",
    )
    b = base.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "cell",
    )
    joined = (
        a.join(b, "cell") if block else a.crossJoin(b.drop("cell"))
    ).filter(F.col("id_a") < F.col("id_b"))
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("id_a"), F.col("id_b"))
        .limit(k)
    )


def knn_graph_exact(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 16_384,
    n_rows: int | None = None,
    dim: int | None = None,
    gemm_from: int = 1024,
    exclude_col: str | None = None,
) -> DataFrame:
    """EXACT kNN graph over the whole corpus — every vector's top-k
    neighbors by round-6 cosine (id tiebreak), self excluded: the
    ground-truth graph behind semantic-dedup connected components,
    retrieval eval, and curriculum/diversity sampling.  Returns
    (qid, nbr_id, cosine, rank), exactly k rows per node.

    Two tiers behind one contract (identical edges — the size gate is
    pinned by a tier-equality test and the full-hash oracle exercises
    BOTH across the SFs):

      - ``n ≤ gemm_from``: relational block GEMM — the query block
        broadcasts against one corpus scan, unrolled codegen cosine,
        per-query top-k via a rank-filtered window.  Fine for small
        corpora, but the BroadcastNestedLoopJoin this compiles to does
        NOT participate in whole-stage codegen, so every pair pays an
        interpreted projection + row materialization — measured
        DNF-class at sf1 (234 s for 20k×20k even with the dot
        unrolled).
      - ``n > gemm_from``: Arrow GEMM (the pandas_batch_scorer
        discipline) — query blocks of ``block_rows`` vectors are
        collected driver-side (block-bounded, ~8 MB at 16k×64) and
        each mapInPandas partition runs ONE numpy matmul per Arrow
        batch against the whole block.  Per (batch, query) only rows
        whose ROUNDED cosine ties-or-beats the batch's k-th best
        (self masked first) are emitted — keep-with-ties makes the
        partial exact: any dropped row is strictly beaten by ≥ k rows
        on the rounded value alone, so it cannot enter the global
        top-k under (cosine DESC, id ASC).  The final window re-ranks
        the bounded candidate stream.

    Exactness is inherently O(n²) compute; the blocking bounds memory
    and the GEMM tier puts the n² inner loop into BLAS instead of the
    expression interpreter.  The SUBLINEAR path for the same graph is
    ``knn_graph_ivf_pq`` (quantization.py) over the compressed codes
    store.

    ``n_rows``/``dim`` let callers that already know the corpus shape
    skip the sizing lookups.

    ``exclude_col`` generalizes the self-mask: pairs whose query and
    candidate share that column's value are excluded BEFORE the top-k
    cut — with the IVF cell / class label it turns the graph into
    corpus-wide HARD-NEGATIVE mining (top-k nearest with a DIFFERENT
    label, the contrastive-training mining step), with the same
    exactness argument."""
    n = int(n_rows if n_rows is not None else embeddings.count())
    if n > gemm_from:
        return _knn_graph_gemm(
            embeddings, k, id_col, vec_col, block_rows, n, exclude_col
        )
    return _knn_graph_expr(embeddings, k, id_col, vec_col, dim, exclude_col)


def _knn_graph_expr(
    embeddings: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    dim: int | None,
    exclude_col: str | None = None,
) -> DataFrame:
    """The relational tier (see knn_graph_exact): one broadcast block,
    unrolled-dot projection, rank-filtered window (partial
    WindowGroupLimit below the qid exchange)."""
    from pyspark.sql import Window

    from cdc_practice_spark.functions.vectors import dot, dot_unrolled, norm

    if dim is None:
        head = embeddings.select(vec_col).head()
        dim = len(head[0]) if head else 0
    pair_dot = (lambda a, b: dot_unrolled(a, b, dim)) if dim else dot
    exc = ([F.col(exclude_col).alias("_x")] if exclude_col else [])
    base = tracked_persist(
        embeddings.select(
            F.col(id_col).alias("_id"), to_double(F.col(vec_col)).alias("_v"),
            *exc,
        ).withColumn("_nrm", norm(F.col("_v")))
    )
    qs = base.select(
        F.col("_id").alias("qid"),
        F.col("_v").alias("_qv"),
        F.col("_nrm").alias("_qn"),
        *([F.col("_x").alias("_qx")] if exclude_col else []),
    )
    pair_ok = F.col("qid") != F.col("_id")
    if exclude_col:
        pair_ok = pair_ok & (F.col("_qx") != F.col("_x"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        base.crossJoin(F.broadcast(qs))
        .filter(pair_ok)
        .select(
            "qid",
            F.col("_id").alias("nbr_id"),
            F.round(
                pair_dot(F.col("_v"), F.col("_qv"))
                / (F.col("_nrm") * F.col("_qn")),
                6,
            ).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _round6_half_up(S):
    """numpy twin of Spark's F.round(_, 6) (HALF_UP, away from zero) —
    np.round would round half-to-even and could diverge on exact
    .xxxxxx5 boundaries."""
    import numpy as np

    return np.sign(S) * np.floor(np.abs(S) * 1e6 + 0.5) / 1e6


def _knn_graph_gemm(
    embeddings: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    block_rows: int,
    n: int,
    exclude_col: str | None = None,
) -> DataFrame:
    """The Arrow GEMM tier (see knn_graph_exact).  The driver loop is
    n/block_rows iterations — block-count-sized, holding ONE block's
    matrix at a time; the corpus is repartitioned by COMPUTE (input
    files are tiny relative to the n² work, so file-driven splits
    under-parallelize — measured 2 tasks for a 20k-vector corpus)."""
    from pyspark.sql import Window

    exc = ([F.col(exclude_col).alias("_x")] if exclude_col else [])
    base = tracked_persist(
        embeddings.select(
            F.col(id_col).alias("_id"), to_double(F.col(vec_col)).alias("_v"),
            *exc,
        )
    )
    sc = embeddings.sparkSession.sparkContext
    parts = max(
        base.rdd.getNumPartitions(), min(n, sc.defaultParallelism * 2)
    )
    corpus = base.repartition(parts)
    nblocks = max(1, -(-n // block_rows))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    out = None
    for b in range(nblocks):
        rows = (
            base.filter(F.pmod(F.col("_id"), F.lit(nblocks)) == b)
            .orderBy("_id")
            .collect()
        )  # ONE block: ≤ block_rows × dim floats at the driver
        part = corpus.mapInPandas(
            _gemm_topk_partials(
                [int(r["_id"]) for r in rows],
                [list(r["_v"]) for r in rows],
                k,
                [r["_x"] for r in rows] if exclude_col else None,
            ),
            schema="qid long, nbr_id long, cosine double",
        )
        out = part if out is None else out.unionByName(part)
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _gemm_topk_partials(qids, qvecs, k, qexcl=None):
    """mapInPandas partial for the GEMM tier: per Arrow batch, one
    matmul against the query block, self (and same-``qexcl`` pairs)
    masked, then per query keep every row whose ROUNDED cosine
    ties-or-beats the batch's k-th best (keep-with-ties ⇒ the partial
    is exact under (cosine DESC, id ASC); see knn_graph_exact)."""
    import numpy as np
    import pandas as pd

    qm = np.asarray(qvecs, dtype=np.float64)
    qid_arr = np.asarray(qids, dtype=np.int64)
    qex_arr = None if qexcl is None else np.asarray(qexcl)
    qnorm = np.linalg.norm(qm, axis=1)
    qnorm[qnorm == 0.0] = 1.0

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack(pdf["_v"].map(np.asarray)).astype(np.float64)
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            mn = np.linalg.norm(M, axis=1)
            mn[mn == 0.0] = 1.0
            # single division by the norm PRODUCT — the expr tier
            # computes dot/(na*nb); (d/a)/b differs in the last ulp
            S = _round6_half_up((M @ qm.T) / (mn[:, None] * qnorm[None, :]))
            S[ids[:, None] == qid_arr[None, :]] = -np.inf  # mask self
            if qex_arr is not None:
                ex = pdf["_x"].to_numpy()
                S[ex[:, None] == qex_arr[None, :]] = -np.inf
            kk = min(k, S.shape[0])
            thr = np.partition(S, -kk, axis=0)[-kk, :]  # per-query k-th best
            keep = S >= thr[None, :]
            keep &= np.isfinite(S)  # masked self rows never emit
            r, q = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "qid": qid_arr[q],
                    "nbr_id": ids[r],
                    "cosine": S[r, q],
                }
            )

    return gen


def pandas_batch_scorer(query_matrix):
    """Arrow-vectorized batch scorer: returns a mapInPandas function that
    appends, per input row batch, the max cosine against ``query_matrix``
    (numpy [nq, dim]) and the argmax query index.  This is the fast path
    when scoring against MANY query vectors at once — numpy does one
    matmul per Arrow batch instead of nq aggregates per row."""
    import numpy as np

    qm = np.asarray(query_matrix, dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            M = np.vstack(pdf["embedding"].map(np.asarray)).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            S = Mn @ qn.T  # [batch, nq]
            out = pdf[["vec_id"]].copy()
            out["best_query"] = S.argmax(axis=1).astype("int32")
            out["best_cosine"] = S.max(axis=1)
            yield out

    return score


def batch_topk_mapinpandas(
    embeddings: DataFrame, query_matrix
) -> DataFrame:
    """mapInPandas wrapper around pandas_batch_scorer (schema:
    vec_id long, best_query int, best_cosine double)."""
    return embeddings.select("vec_id", "embedding").mapInPandas(
        pandas_batch_scorer(query_matrix),
        schema="vec_id long, best_query int, best_cosine double",
    )


def centroid_outliers(
    embeddings: DataFrame,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Bottom-k vectors per cell by cosine to their own cell centroid —
    embedding-space curation: the vectors farthest from their cluster
    center are the mislabel / noise / contamination candidates a
    training pipeline reviews or drops.

    Shape: one groupBy(cell) centroid aggregate (k×dim partials,
    map-side combined), one BROADCAST join of the ncells-row centroid
    table back onto the corpus (never a shuffle of the vectors), one
    codegen'd cosine projection, and a bottom-k window whose rank filter
    Spark pushes to a partial WindowGroupLimit below the cell exchange —
    so a billion-vector cell ships k rows per map partition, not a full
    sort.  Cosine is rounded to 6 decimals before ranking (id tiebreak)
    so the order is engine- and partitioning-deterministic.
    """
    from pyspark.sql import Window

    dvec = to_double(F.col(vec_col))
    cent = (
        embeddings.select(F.col(cell_col).alias("cell"), dvec.alias("v"))
        .groupBy("cell")
        .agg(
            F.array(*[F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(dim)]).alias(
                "centroid"
            )
        )
    )
    # Broadcast only when a measured count says the ncells×dim centroid
    # table fits (ADVICE r4: an unconditional hint is the scale trap
    # hints.py documents — a high-cardinality cell column would force-
    # broadcast an arbitrarily large table).
    from cdc_practice_spark.plans.hints import broadcast_if_small

    scored = (
        embeddings.join(
            broadcast_if_small(cent), F.col(cell_col) == F.col("cell"), "inner"
        )
        .select(
            F.col(cell_col),
            F.col(id_col),
            F.round(cosine(dvec, F.col("centroid")), 6).alias("cos_centroid"),
        )
    )
    w = Window.partitionBy(cell_col).orderBy(F.col("cos_centroid"), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            cell_col, id_col, "cos_centroid", F.col("rnk").cast("long").alias("rnk")
        )
    )
