"""Side-by-side Spark-vs-DuckDB run of the bench headliners at an
arbitrary sf dir — built for the `.sf1` floor-amortization measurement
(VERDICT r5 #4; results committed at tools/sf1_results.json and analyzed
in BENCHNOTES.md "Round 6").  Chunked (lo/hi over bench.HEADLINE) so a
long tail query can get its own invocation/budget; appends each query's
best-of-N into the output JSON as it lands, so a killed run loses at
most the in-flight query.

Usage: python tools/bench_sf1.py <sf_dir> <out.json> [lo] [hi] [repeats]
       e.g. python tools/make_sf1.py && \
            python tools/bench_sf1.py .sf1 /tmp/sf1_results.json 0 34 2
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> None:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 10**9
    repeats = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    import duckdb

    import bench
    import __spark_entry__ as e
    from cdc_practice_spark.plans.cache import release_tracked
    from cdc_practice_spark.queries import registry
    from cdc_practice_spark.session import get_spark

    registry.load_all()
    spark = get_spark("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    tables = "region nation customer supplier part orders lineitem events documents embeddings"
    for t in tables.split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = e.oracle_sql()

    def best_of(fn):
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            release_tracked()
        return best

    out = json.load(open(out_path)) if os.path.exists(out_path) else {}
    for name in bench.HEADLINE[lo:hi]:
        q, sql = registry.QUERIES.get(name), oracles.get(name)
        if q is None or sql is None:
            continue
        s = best_of(
            lambda: q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        )
        d = best_of(lambda: con.execute(sql).fetchall())
        out[name] = {"spark": round(s, 3), "duck": round(d, 3)}
        json.dump(out, open(out_path, "w"))
        print(name, out[name], flush=True)
    print("CHUNK DONE", lo, hi)


if __name__ == "__main__":
    main()
