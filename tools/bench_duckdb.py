"""Side-by-side throughput evidence: times every bench.py headline query
on Spark (noop sink) AND its DuckDB oracle twin at the same SF, prints a
markdown table + totals.  This is the honest version of BASELINE.md's
"within 2× of DuckDB at sf0.1" bound — run it after perf changes.

Usage: python tools/bench_duckdb.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import bench
    import __spark_entry__ as e

    from cdc_practice_spark.queries import registry
    from cdc_practice_spark.session import get_spark

    registry.load_all()
    spark = get_spark("bench-duckdb")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = e.oracle_sql()

    from cdc_practice_spark.plans.cache import release_tracked

    def best_of(fn) -> float:
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            release_tracked()  # cold-per-run: no warm operator caches
        return best

    rows, s_tot, d_tot = [], 0.0, 0.0
    for name in bench.HEADLINE:
        q = registry.QUERIES.get(name)
        sql = oracles.get(name)
        if q is None or sql is None:
            continue
        s = best_of(lambda: bench.materialize(q(spark, sf_dir)))
        d = best_of(lambda: con.sql(sql).fetchall())
        spark.catalog.clearCache()
        s_tot += s
        d_tot += d
        rows.append((name, s, d))
    print(f"| query | spark s | duckdb s | ratio |")
    print(f"|---|---|---|---|")
    for name, s, d in rows:
        print(f"| {name} | {s:.3f} | {d:.3f} | {s / d:.2f}x |")
    print(
        f"| **TOTAL** | **{s_tot:.3f}** | **{d_tot:.3f}** | "
        f"**{s_tot / d_tot:.2f}x** |"
    )


if __name__ == "__main__":
    main()
