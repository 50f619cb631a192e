"""Bench regression guard (VERDICT r4 ask #7).

Absolute BENCH totals swing ±30% with box load (r4's pack_sequences
"regression" was noise), so the guard compares per-query Spark/DuckDB
RATIOS — both engines run on the same box in the same minute, so load
cancels — against a committed floor table, and fails loudly only on a
real >1.5× ratio regression.

Usage:
    python tools/bench_guard.py            # check vs tools/bench_floor.json
    python tools/bench_guard.py --update   # re-measure and rewrite floors
    python tools/bench_guard.py sf_dir [--update] [--repeats N]

Exit 1 on any regression; prints a per-query table either way.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLOOR_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_floor.json")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
# ratio must stay below committed_ratio * SLACK (ratio-of-ratios bound)
SLACK = 1.5


def measure(sf_dir: str, repeats: int) -> dict[str, dict[str, float]]:
    import duckdb

    import bench
    import __spark_entry__ as e
    from cdc_practice_spark.plans.cache import release_tracked
    from cdc_practice_spark.queries import registry
    from cdc_practice_spark.session import get_spark

    registry.load_all()
    spark = get_spark("bench-guard")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = e.oracle_sql()

    def best_of(fn) -> float:
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            release_tracked()
        return best

    out: dict[str, dict[str, float]] = {}
    for name in bench.HEADLINE:
        q = registry.QUERIES.get(name)
        sql = oracles.get(name)
        if q is None or sql is None:
            continue
        s = best_of(lambda: bench.materialize(q(spark, sf_dir)))
        d = best_of(lambda: con.sql(sql).fetchall())
        spark.catalog.clearCache()
        out[name] = {"spark": round(s, 3), "duckdb": round(d, 3), "ratio": round(s / d, 3)}
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    update = "--update" in sys.argv
    repeats = 3
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    measured = measure(sf_dir, repeats)

    if update or not os.path.exists(FLOOR_PATH):
        with open(FLOOR_PATH, "w") as f:
            json.dump({"sf_dir": sf_dir, "ratios": {k: v["ratio"] for k, v in measured.items()}}, f, indent=1, sort_keys=True)
        print(f"floor table written: {FLOOR_PATH} ({len(measured)} queries)")
        return 0

    floors = json.load(open(FLOOR_PATH))["ratios"]
    regressions = []
    print("| query | ratio | floor | bound | verdict |")
    print("|---|---|---|---|---|")
    for name, m in measured.items():
        floor = floors.get(name)
        if floor is None:
            print(f"| {name} | {m['ratio']:.2f} | (new) | - | new |")
            continue
        bound = floor * SLACK
        bad = m["ratio"] > bound
        if bad:
            regressions.append(name)
        print(
            f"| {name} | {m['ratio']:.2f} | {floor:.2f} | {bound:.2f} | "
            f"{'REGRESSION' if bad else 'ok'} |"
        )
    if regressions:
        print(f"\nFAIL: {len(regressions)} ratio regression(s): {', '.join(regressions)}")
        return 1
    print("\nall ratios within bound")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
