"""Time EVERY registered query through the noop sink at one SF — the
full-registry timing sweep the optimization round uses to find the
expensive operators beyond bench.py's headline set.

One timed materialization per query (plus an untimed warmup of two
cheap queries), release_tracked() between queries.  Prints a sorted
table and writes JSON.

Usage: python tools/time_all_queries.py [sf_dir] [out_json] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/time_all_queries.json"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from cdc_practice_spark.plans.cache import release_tracked
    from cdc_practice_spark.queries import registry
    from cdc_practice_spark.session import get_spark

    registry.load_all()
    spark = get_spark("time-all")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup: JVM/codegen/parquet footers
    mat(registry.QUERIES["cdc_current_snapshot"](spark, "/root/testdata/sf0.001"))
    mat(registry.QUERIES["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001"))

    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        best = None
        try:
            for _ in range(repeats):
                spark.sparkContext.setJobDescription(f"time:{name}")
                t0 = time.perf_counter()
                mat(fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                release_tracked()
        except Exception as exc:  # noqa: BLE001 — record and continue
            errs[name] = f"{type(exc).__name__}: {exc}"
            release_tracked()
            continue
        times[name] = round(best, 3)
        print(f"{best:8.3f}  {name}", flush=True)

    spark.sparkContext.setJobDescription(None)
    with open(out_json, "w") as f:
        json.dump({"sf_dir": sf_dir, "times": times, "errors": errs}, f, indent=1)
    print(f"\ntotal {sum(times.values()):.1f} s over {len(times)} queries")
    if errs:
        print(f"ERRORS ({len(errs)}):")
        for k, v in errs.items():
            print(f"  {k}: {v}")
    print("\nslowest 25:")
    for k, v in sorted(times.items(), key=lambda x: -x[1])[:25]:
        print(f"{v:8.3f}  {k}")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
