"""A/B: retroactive purge cost vs the never-admitted rebuild (SCALE.md r9).

Builds the streaming ingest store for the sf dir's arriving batch
(doc_id % 7 == 3, 3 micro-batches), then measures:

  A. purge_ingest_docs of the retro-audit-flagged docs (in-place, the
     O(purge + affected-source rows) claim), and
  B. the from-scratch rebuild that never admitted them (seed + full
     re-stream — what a team without the purge op must run).

Usage: python tools/ab_purge.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from cdc_practice_spark.queries.streaming_queries import (
        TMP_ROOT,
        _corpus_ingest_store,
        _new_benchmark_grams,
    )
    from cdc_practice_spark.streaming.corpus import (
        load_admitted_grams,
        load_ingest_dispositions,
        purge_ingest_docs,
    )

    t0 = time.time()
    store0 = _corpus_ingest_store(spark, sf_dir)
    build_s = time.time() - t0
    bench2 = _new_benchmark_grams(spark, sf_dir)
    purge_ids = (
        load_admitted_grams(spark, store0)
        .select("doc_id", F.explode("g8").alias("g"))
        .join(F.broadcast(bench2), "g")
        .select("doc_id")
        .distinct()
    )
    n_flagged = purge_ids.count()
    n_rows = load_ingest_dispositions(spark, store0).count()

    # A: in-place purge on a clone
    work = tempfile.mkdtemp(prefix="ab_purge_", dir=TMP_ROOT)
    store = os.path.join(work, "store")
    shutil.copytree(store0, store)
    t0 = time.time()
    n = purge_ingest_docs(spark, store, purge_ids)
    purge_s = time.time() - t0

    # B: never-admitted rebuild = seed + full re-stream (the initial
    # build is the faithful proxy: same seed scan, same 3 epochs)
    from cdc_practice_spark.plans.hints import _STATS_CACHE

    for k in list(_STATS_CACHE):
        if k[0] == "corpus_ingest_store":
            del _STATS_CACHE[k]
    t0 = time.time()
    _corpus_ingest_store(spark, sf_dir)
    rebuild_s = time.time() - t0

    print(
        f"sf={sf_dir} store_rows={n_rows} flagged={n_flagged} purged={n} | "
        f"initial build {build_s:.1f}s | PURGE {purge_s:.1f}s | "
        f"never-admitted REBUILD {rebuild_s:.1f}s | "
        f"speedup {rebuild_s / max(purge_s, 1e-9):.1f}x"
    )


if __name__ == "__main__":
    main()
