"""Cold-run timing for the memoized trainer queries (BENCHNOTES r9).

The tokenizer trainers memoize their learned vocabulary per corpus, so
bench repeats would measure the memo; this runs ONE query in a fresh
process (memo empty by construction) and prints the cold wall time.

Usage: python tools/cold_train.py <query> [sf_dir]
"""

import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, ".")
    import __spark_entry__ as e

    t0 = time.time()
    n = e.queries()[name](spark, sf_dir).count()
    print(f"COLD {name}: {n} rows in {time.time() - t0:.2f} s")


if __name__ == "__main__":
    main()
