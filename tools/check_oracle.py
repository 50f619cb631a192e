"""Local stand-in for the driver's correctness harness.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names,
and an order-insensitive value hash (rows sorted, columns sorted by
name — mirroring the driver's described compare).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v) -> str:
    if v is None or v != v:  # NaN
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def frame_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        ",".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    from cdc_practice_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        finally:
            from cdc_practice_spark.plans.cache import release_tracked

            release_tracked()
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {ex}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            hs, ho = frame_hash(sdf), frame_hash(odf)
            if hs != ho:
                problems.append(f"hash {hs} != {ho}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
            # show a diff sample
            try:
                sk = sdf.reindex(sorted(sdf.columns), axis=1).astype(str)
                ok = odf.reindex(sorted(odf.columns), axis=1).astype(str)
                sset = {tuple(r) for r in sk.itertuples(index=False)}
                oset = {tuple(r) for r in ok.itertuples(index=False)}
                print("   spark-only:", list(sset - oset)[:2])
                print("   oracle-only:", list(oset - sset)[:2])
            except Exception:
                pass
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    print(f"\n{len(failures)} failures" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
