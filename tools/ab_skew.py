"""A/B: salted vs plain aggregation/join on a power-law key.

Synthesizes a deterministic skewed fact table (~8M rows; key 0 owns 40%
of all rows, keys 1-10 ~1% each, the tail uniform over 100k keys) and
measures, on local[32]:

  agg_plain     groupBy(key).sum/count          (partial-agg path)
  agg_salted    salted_agg_sum_count            (two-level salt)
  join_smj      sort-merge join facts⋈dim       (broadcast disabled,
                AQE skew-split ON and OFF)
  join_salted   salted_join facts⋈dim (salt=32) (broadcast disabled)

Equivalence is asserted before timing (salted results == plain results).
Run:  python tools/ab_skew.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_practice_spark.operators.skew import salted_agg_sum_count, salted_join
from cdc_practice_spark.session import get_spark

N_KEYS = 100_000


def synth_facts(spark, n_rows: int):
    """Deterministic power-law: p=id%1000 → p<400: key 0; p<500: keys
    1-10; else uniform tail.  value_units is an int64 fixed-point."""
    return spark.range(n_rows).select(
        F.when(F.col("id") % 1000 < 400, F.lit(0))
        .when(F.col("id") % 1000 < 500, (F.col("id") % 10 + 1))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .alias("key"),
        (F.col("id") % 1000).cast("long").alias("value_units"),
        F.col("id"),
    )


def synth_dim(spark):
    return spark.range(N_KEYS).select(
        F.col("id").alias("key"), F.sha2(F.col("id").cast("string"), 256).alias("attr")
    )


def timed(label, thunk, repeats=2):
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        thunk()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:55s} {best:7.3f} s")
    return best


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    spark = get_spark("ab-skew")
    spark.sparkContext.setLogLevel("ERROR")
    facts = synth_facts(spark, n_rows).persist()
    dim = synth_dim(spark).persist()
    print(f"rows={facts.count():,} keys≈{N_KEYS:,} hot-key share≈40%")

    # --- equivalence gates -------------------------------------------------
    plain_agg = facts.groupBy("key").agg(
        F.sum("value_units").alias("units_sum"), F.count(F.lit(1)).alias("n_rows")
    )
    salted = salted_agg_sum_count(facts, "key", F.col("value_units"), salt=32,
                                  salt_source="id")
    diff = plain_agg.join(salted, "key").filter(
        (plain_agg["units_sum"] != salted["units_sum"])
        | (plain_agg["n_rows"] != salted["n_rows"])
    )
    assert diff.count() == 0, "salted agg != plain agg"

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    j_plain = facts.join(dim, "key").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("attr")).alias("s")
    )
    j_salted = salted_join(facts, dim, "key", salt=32, fact_salt_col="id").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("attr")).alias("s")
    )
    assert j_plain.collect() == j_salted.collect(), "salted join != plain join"
    print("equivalence: OK (agg + join)\n")

    # --- timings -----------------------------------------------------------
    results = {}
    results["agg_plain"] = timed(
        "agg plain groupBy (partial agg)", lambda: materialize(plain_agg)
    )
    results["agg_salted"] = timed(
        "agg salted two-level (salt=32)", lambda: materialize(salted)
    )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["join_smj_noaqe"] = timed(
        "join SMJ, AQE skew-split OFF", lambda: materialize(j_plain)
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["join_smj_aqe"] = timed(
        "join SMJ, AQE skew-split ON", lambda: materialize(j_plain)
    )
    results["join_salted"] = timed(
        "join salted (salt=32)", lambda: materialize(j_salted)
    )

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    facts.unpersist()
    dim.unpersist()
    import json

    print("\n" + json.dumps({"n_rows": n_rows, **{k: round(v, 3) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
