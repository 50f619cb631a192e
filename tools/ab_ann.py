"""A/B: LSH-bucketed ANN vs brute-force scan at 1M×64 vectors — the
scale evidence for operators/similarity.py::rp_lsh_topk beyond the
2k-row fixtures.

The honest comparison is QUERY-time with a PREBUILT index (an ANN
service hashes once at ingest): the index stores (sig, vec_id,
embedding) partitioned by (table, sig), so a query's multi-probe is
pure planning-time partition pruning — it opens ONLY the probed bucket
directories and never touches the base table (the vectors ride inside
the buckets; storage = n_tables × corpus, the standard LSH trade).
Brute force reads every vector every query.

Two layout lessons this file encodes (both measured here first):
- one file per bucket: ``repartition("table", "sig")`` before the
  partitionBy write.  Without it every write task leaves a fragment in
  every bucket dir (32 files/bucket → a 72-bucket probe scheduled
  2301 tasks and took 21 s; with it the same probe is ~dozens of
  tasks).  At 100 TB the same rule sizes buckets to row-group scale.
- bucket granularity must track corpus size: 8-plane buckets (256)
  pulled 32% of a 1M clustered corpus; 12-plane (4096) pulls the
  query's own cluster plus its sign-boundary neighbors only.

Data is CLUSTERED (256 centers + noise), the shape real embedding
corpora have and the regime LSH is built for; the fixtures' isotropic
vectors are its worst case (queries/similarity_queries.py documents
that).

Measured (local[32], min-of-3 query time, recall@10 vs brute):
  1M×64: brute 1.14 s — lsh 1.05 s, 2.30% candidates, recall 10/10
  4M×64: brute 3.64 s — lsh 1.23 s, 2.28% candidates, recall 10/10
Brute grows linearly with the corpus; the probe stays near the job
floor (it reads ~52 bucket files regardless of corpus size) — the
divergence that makes the store the 100 TB path.

Usage: python tools/ab_ann.py [n_vectors] [n_clusters]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_POS_ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
N = int(_POS_ARGS[0]) if _POS_ARGS else 1_000_000
N_CLUSTERS = int(_POS_ARGS[1]) if len(_POS_ARGS) > 1 else 256
DIM, N_PLANES, N_TABLES, K = 64, 12, 4, 10
WORK = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".tmp", "ab_ann")


def main() -> None:
    import numpy as np

    from cdc_practice_spark.operators import similarity as S
    from cdc_practice_spark.session import get_spark

    spark = get_spark("ab-ann")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)
    emb_path, sig_path = os.path.join(WORK, "emb"), os.path.join(WORK, "sig")

    # -- ingest: clustered vectors (vectorized; one rng per batch, one
    # center matrix per executor — not one rng per row, which was 200 s
    # of the first cut's ingest) --
    centers_global = np.array(
        [np.random.default_rng(c).standard_normal(DIM) for c in range(N_CLUSTERS)]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(2**32 + int(ids[0]))
            vecs = centers_global[ids % N_CLUSTERS] + 0.15 * rng.standard_normal(
                (len(ids), DIM)
            )
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [v.astype("float32").tolist() for v in vecs]}
            )

    t0 = time.perf_counter()
    spark.range(N).toDF("id").mapInPandas(
        gen, schema="vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)
    planes = S.rp_lsh_planes(DIM, N_PLANES, N_TABLES)
    sig = S.rp_lsh_signatures(emb, planes).join(emb, on="vec_id")
    # one file per occupied bucket — see module docstring
    sig.repartition(256, "table", "sig").write.mode("overwrite").partitionBy(
        "table", "sig"
    ).parquet(sig_path)
    print(f"ingest (vectors + bucketed signature store): {time.perf_counter() - t0:.1f}s")

    from pyspark.sql import functions as F

    qv = np.asarray(
        emb.filter(F.col("vec_id") == 0).head().embedding, dtype=np.float64
    )

    # -- A: brute force, full scan per query --
    def brute():
        return S.brute_force_topk(emb, qv.tolist(), k=K).collect(), N

    # -- B: multi-probe on the prebuilt store (partition-pruned read;
    # vectors come out of the buckets, no base-table join) --
    store = spark.read.parquet(sig_path)

    def lsh():
        cond = None
        for t in range(N_TABLES):
            bits = (qv @ planes[t].T) > 0
            s = 0
            for j in range(N_PLANES):
                s = (s << 1) | int(bits[j])
            want = [s] + [s ^ (1 << j) for j in range(N_PLANES)]
            leg = (F.col("table") == t) & F.col("sig").isin(want)
            cond = leg if cond is None else (cond | leg)
        cand = store.filter(cond).dropDuplicates(["vec_id"])
        rows = S.brute_force_topk(cand, qv.tolist(), k=K).collect()
        return rows, cand.count()

    exact_ids = None
    for label, fn in (("brute", brute), ("lsh", lsh)):
        best, rows, ncand = None, None, None
        for _ in range(3):
            t0 = time.perf_counter()
            rows, ncand = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ids = {r.vec_id for r in rows}
        if label == "brute":
            exact_ids = ids
        print(f"{label}: {best:.2f}s  candidates={ncand}/{N} "
              f"({100.0 * ncand / N:.2f}%)"
              + ("" if label == "brute"
                 else f"  recall@{K}={len(ids & exact_ids)}/{K}"))


def main_ingest() -> None:
    """A/B for operators/similarity.py::rp_lsh_ingest (r7 VERDICT ask
    #4): ingest a FIXED 10k-vector batch into prebuilt stores of growing
    corpus size, vs rebuilding the store from scratch each time.  The
    claim: ingest cost is flat in corpus size (only the batch is
    hashed), while rebuild grows linearly.

    The ingest write path is LSM-style: the batch's signatures land as
    ONE unpartitioned delta file beside the bucketed store, and queries
    read store ∪ delta (partition-pruned probe on the store + a full
    scan of the small delta) until a compaction folds deltas into the
    buckets.  A first cut appended INTO the bucketed layout directly and
    paid 60 s of commit overhead for a 10k-row batch — 10k one-row
    files across 16k partition dirs; the delta file is the fix, and it
    is exactly ``rp_lsh_ingest``'s union semantics on disk.

    The fold (r8): data is CLUSTERED like main()'s — the shape real
    embedding traffic has — so a batch drawn from a few clusters
    touches FEW buckets and compact_ann_store's touched-buckets tier
    rewrites only those; a uniform batch spreads over ~every bucket and
    the full-rewrite tier degenerates to one store rewrite.

    Measured (local[32], 250k corpus, 10k batch, 16k-bucket store):
      clustered batch: ingest 23 s, fold 71 s touching 92,550 bucket
        rows (9% of the store — the touched-tier claim);
      uniform batch:   ingest  6 s, fold = one store rewrite (~230 s,
        dominated by the 16k tiny bucket files this LOCAL layout has;
        at production bucket sizing the rewrite is row-group-sequential).
    Amortization rule either way: fold every N batches with N sized so
    the amortized fold stays under the ingest cost — reads meanwhile
    pay one extra small delta scan per unfolded batch.

    Usage: python tools/ab_ann.py --ingest [corpus_sizes ...]
    """
    import numpy as np
    from pyspark.sql import functions as F  # noqa: F401

    from cdc_practice_spark.operators import similarity as S
    from cdc_practice_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[2:]] or [250_000, 1_000_000, 4_000_000]
    batch_n = 10_000
    spark = get_spark("ab-ann-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    planes = S.rp_lsh_planes(DIM, N_PLANES, N_TABLES)
    # NOT module-level N_CLUSTERS: in --ingest mode _POS_ARGS[1] is the
    # second CORPUS SIZE, which would build a millions-wide center
    # matrix and silently de-cluster the corpus
    n_centers = 256
    centers_global = np.array(
        [np.random.default_rng(c).standard_normal(DIM) for c in range(n_centers)]
    )

    def mk(n, offset=0, n_clusters=n_centers):
        def gen(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                ids = pdf["id"].to_numpy() + offset
                rng = np.random.default_rng(2**32 + int(ids[0]))
                vecs = centers_global[
                    ids % n_clusters
                ] + 0.15 * rng.standard_normal((len(ids), DIM))
                yield pd.DataFrame(
                    {
                        "vec_id": ids,
                        "embedding": [
                            v.astype("float32").tolist() for v in vecs
                        ],
                    }
                )

        return spark.range(n).toDF("id").mapInPandas(
            gen, schema="vec_id long, embedding array<float>"
        )

    for n in sizes:
        store_path = os.path.join(WORK, f"ingest_store_{n}")
        delta_path = os.path.join(WORK, f"ingest_delta_{n}")
        shutil.rmtree(store_path, ignore_errors=True)
        shutil.rmtree(delta_path, ignore_errors=True)
        corpus = mk(n)
        t0 = time.perf_counter()
        S.rp_lsh_signatures(corpus, planes).repartition(
            256, "table", "sig"
        ).write.mode("overwrite").partitionBy("table", "sig").parquet(store_path)
        t_build = time.perf_counter() - t0

        # clustered batch (8 clusters): the real-traffic fold shape
        batch = mk(batch_n, offset=n, n_clusters=8)
        t0 = time.perf_counter()
        # the incremental path: hash ONLY the batch, one delta file
        S.rp_lsh_signatures(batch, planes).coalesce(1).write.mode(
            "append"
        ).parquet(delta_path)
        t_ingest = time.perf_counter() - t0
        total = (
            spark.read.parquet(store_path).count()
            + spark.read.parquet(delta_path).count()
        )
        t0 = time.perf_counter()
        n_merged = S.compact_ann_store(spark, store_path, delta_path)
        t_fold = time.perf_counter() - t0
        total_after = spark.read.parquet(store_path).count()
        assert total_after == total, (total_after, total)
        print(
            f"corpus={n:>9,}  rebuild={t_build:6.1f}s  "
            f"ingest({batch_n:,})={t_ingest:5.1f}s  "
            f"fold[clustered]={t_fold:5.1f}s ({n_merged:,} bucket rows "
            f"touched)  store_rows={total:,}",
            flush=True,
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ingest":
        main_ingest()
    else:
        main()
