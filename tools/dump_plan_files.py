"""Dump .explain('formatted') for named queries (default: every bench.py
headline) into plans/r13/<query>_<tag>.txt — the before/after evidence
files the optimization round commits.

Usage: python tools/dump_plan_files.py <tag> [sf_dir] [query ...]
       e.g. python tools/dump_plan_files.py before /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3:]

    import bench

    from cdc_practice_spark.plans.cache import release_tracked
    from cdc_practice_spark.queries import registry
    from cdc_practice_spark.session import get_spark

    registry.load_all()
    spark = get_spark("dump-plan-files")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)

    names = only or bench.HEADLINE
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"skip {name}: not registered")
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} [{tag}]\n\n")
            f.write(plan)
        release_tracked()
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
