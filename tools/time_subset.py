"""Time a SUBSET of registered queries through the noop sink — the
focused sibling of time_all_queries.py for A/B-ing one family without
paying the full 224-query sweep.

Usage: python tools/time_subset.py <sf_dir> <out_json> <name> [<name> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    out_json = sys.argv[2]
    names = sys.argv[3:]

    from cdc_practice_spark.plans.cache import release_tracked
    from cdc_practice_spark.queries import registry
    from cdc_practice_spark.session import get_spark

    registry.load_all()
    spark = get_spark("time-subset")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    mat(registry.QUERIES["cdc_current_snapshot"](spark, "/root/testdata/sf0.001"))
    mat(registry.QUERIES["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001"))

    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name in names:
        fn = registry.QUERIES[name]
        try:
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            mat(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            release_tracked()
        except Exception as exc:  # noqa: BLE001 — record and continue
            errs[name] = f"{type(exc).__name__}: {exc}"
            release_tracked()
            continue
        times[name] = round(dt, 3)
        print(f"{dt:8.3f}  {name}", flush=True)

    spark.sparkContext.setJobDescription(None)
    with open(out_json, "w") as f:
        json.dump({"sf_dir": sf_dir, "times": times, "errors": errs}, f, indent=1)
    print(f"\ntotal {sum(times.values()):.1f} s over {len(times)} queries")
    if errs:
        print(f"ERRORS ({len(errs)}):")
        for k, v in errs.items():
            print(f"  {k}: {v}")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
