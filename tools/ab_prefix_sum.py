"""A/B: distributed two-pass prefix sum vs the naive global-window
running sum — the scale evidence for
operators/events_ops.py::distributed_running_sum.

A ``Window.orderBy(...)`` with no partitionBy funnels EVERY row through
one task (Spark even warns: "No Partition Defined for Window
operation"); the two-pass form range-partitions the order, prefix-sums
each partition in parallel, and closes the gap with an index-sized
(≤ n_partitions rows) driver prefix broadcast back.  Both produce
identical results (pinned by tests/test_events_ops.py); this measures
the wall-clock gap and proves the single-task ceiling is real.

Data: hash-derived (ts, ±1 delta) boundary stream — pure JVM
generation, deterministic.

Usage: python tools/ab_prefix_sum.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cdc_practice_spark.operators.events_ops import distributed_running_sum
    from cdc_practice_spark.plans.cache import release_tracked
    from cdc_practice_spark.session import get_spark

    spark = get_spark("ab-prefix-sum")
    spark.sparkContext.setLogLevel("ERROR")

    df = (
        spark.range(N)
        .select(
            (F.xxhash64("id") % 1_000_000_000).alias("ts"),
            F.when(F.xxhash64("id", F.lit(1)) % 2 == 0, 1)
            .otherwise(-1)
            .alias("delta"),
        )
        .persist()
    )
    df.count()

    def run(label, make, col):
        # the frame is CONSTRUCTED inside the timed region — the
        # two-pass form does its index-sized driver prefix at
        # construction, which must be part of its cost
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            frame = make()
            # checksum forces full materialization of the running column
            row = frame.agg(
                F.max(col).alias("mx"), F.sum(F.abs(F.col(col))).alias("ck")
            ).collect()[0]
            best = min(best or 1e9, time.perf_counter() - t0)
            release_tracked()
        print(f"{label}: {best:.1f}s  max={row.mx}  checksum={row.ck}")
        return row.mx, row.ck

    w = Window.orderBy("ts", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    a = run(
        "naive single-partition window",
        lambda: df.withColumn("run", F.sum("delta").over(w)),
        "run",
    )
    b = run(
        "distributed two-pass        ",
        lambda: distributed_running_sum(df, ["ts", "delta"], "delta", "run"),
        "run",
    )
    assert a == b, "results diverged"
    print("results identical")


if __name__ == "__main__":
    main()
