"""Stage-attribution profile of corpus_e2e_pipeline: materialize each
stage frame through the noop sink separately (cold session each marked
run is NOT the point — this is a relative attribution, run 2 is the
steady-state read) and print per-stage seconds.

Because downstream stages re-run upstream plans except across the
tracked_persist boundaries, per-stage DELTAS here are attribution hints,
not exact costs.  Run on an idle box.

Usage: python tools/profile_e2e.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from cdc_practice_spark.plans.cache import release_tracked
    from cdc_practice_spark.queries.pipeline_queries import corpus_e2e_stages
    from cdc_practice_spark.session import get_spark

    spark = get_spark("profile-e2e")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    order = [
        "s0_base",
        "s2_quality",
        "s3_dedup",
        "s4_decontam",
        "s5_mix",
        "s6_packed",
    ]
    for r in range(repeats):
        release_tracked()
        stages = corpus_e2e_stages(spark, sf_dir)
        prev = 0.0
        t_start = time.perf_counter()
        print(f"--- run {r} (cumulative; delta = this stage + unpersisted upstream) ---")
        for name in order:
            spark.sparkContext.setJobDescription(f"e2e:{name}")
            t0 = time.perf_counter()
            mat(stages[name])
            dt = time.perf_counter() - t0
            print(f"  {name:14s} {dt:7.3f} s")
        total = time.perf_counter() - t_start
        print(f"  {'TOTAL':14s} {total:7.3f} s")
        spark.sparkContext.setJobDescription(None)

    # the bench-identical single-shot timing for reference
    for r in range(repeats):
        release_tracked()
        t0 = time.perf_counter()
        mat(corpus_e2e_stages(spark, sf_dir)["s6_packed"])
        print(f"single-shot s6 run {r}: {time.perf_counter() - t0:.3f} s")


if __name__ == "__main__":
    main()
