"""A/B: runtime Bloom semi-join reduction vs plain sort-merge join, at
the shape the technique targets — a fact table joining a SELECTIVE dim
that is too big (here: forbidden) to broadcast.

At bench SF the bloom build's extra jobs are pure overhead (the dim
broadcasts anyway — see BENCHNOTES); this script disables broadcast and
scales the fact up so the exchange is the cost, which is the 100 TB
regime.  Synthesizes:

  fact: n_rows rows, key uniform over [0, key_space)
  dim:  every key divisible by `stride` → selectivity 1/stride

Equivalence (bloom-reduced == plain, row count + grouped sum) is
asserted before timing.  Run:  python tools/ab_bloom.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_practice_spark.plans.runtime_filter import bloom_reduce_join
from cdc_practice_spark.session import get_spark

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
KEY_SPACE = 1_000_000
STRIDE = 20  # dim holds 5% of the key space


def main() -> None:
    spark = get_spark("ab-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    # the payload column is what the reduction is FOR: it must cross the
    # join exchange (the aggregate consumes it, so pruning can't drop it)
    fact = spark.range(N_ROWS).select(
        F.pmod(F.xxhash64("id"), F.lit(KEY_SPACE)).alias("fk"),
        (F.col("id") % 97).alias("v"),
        F.concat(F.md5(F.col("id").cast("string")), F.md5((F.col("id") + 1).cast("string")), F.md5((F.col("id") + 2).cast("string"))).alias("payload"),
    ).persist()
    dim = spark.range(0, KEY_SPACE, STRIDE).select(
        F.col("id").alias("key")
    ).persist()
    fact.count(), dim.count()

    def agg(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.length("payload")).alias("pl"),
        ).collect()[0]

    plain = agg(fact.join(dim, fact.fk == dim.key))
    bloomed = agg(bloom_reduce_join(fact, dim, "fk", "key"))
    assert (plain.n, plain.s) == (bloomed.n, bloomed.s), (plain, bloomed)
    print(f"equivalent: {plain.n} rows")

    for label, fn in [
        ("plain SMJ", lambda: agg(fact.join(dim, fact.fk == dim.key))),
        ("bloom-reduced", lambda: agg(bloom_reduce_join(fact, dim, "fk", "key"))),
    ]:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label:14s} {best:.3f}s")


if __name__ == "__main__":
    main()
