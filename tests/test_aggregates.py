"""Approximate-aggregate accuracy + salted-join equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.operators.skew import salted_join
from cdc_practice_spark.session import load_table


def test_approx_distinct_within_tolerance(spark, sf_dir):
    from cdc_practice_spark.queries.aggregates_queries import approx_distinct_parts

    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: (r.p, r.s)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("p"),
            F.countDistinct("l_suppkey").alias("s"),
        )
        .collect()
    }
    rows = approx_distinct_parts(spark, sf_dir).collect()
    assert {r.l_returnflag for r in rows} == set(exact)
    for r in rows:
        # the query emits the tolerance DECISION (|approx-exact|/exact <= 5%)
        # so the oracle can hash-compare it; assert both the decision and
        # that the exact counts it carries agree with an independent compute
        assert r.parts_within_tol and r.suppliers_within_tol
        p, s = exact[r.l_returnflag]
        assert (r.exact_parts, r.exact_suppliers) == (p, s)


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must be a pure physical rewrite — same rows out."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_mktsegment")
    salted = salted_join(
        orders, cust, key="o_custkey", salt=8, fact_salt_col="o_orderkey"
    ).select("o_orderkey", "c_mktsegment")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    """A single hot key lands in multiple salt buckets."""
    hot = spark.range(1000).select(
        F.lit(42).alias("k"), F.col("id").alias("row_id")
    )
    dim = spark.createDataFrame([(42, "x")], "k long, v string")
    out = salted_join(hot, dim, key="k", salt=8, fact_salt_col="row_id")
    assert out.count() == 1000
    n_salts = (
        hot.withColumn("_salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts == 8


def test_fixed_point_money_equals_decimal_sums(spark):
    """functions/money.py contract: int64 fixed-point sums + post-agg
    decimal rounding are penny-identical to decimal(12,2) sums for
    2-decimal-valued doubles, including half-cent product rounding."""
    from pyspark.sql import functions as F

    from cdc_practice_spark.functions import money as M

    # adversarial values: .005 products, max-ish magnitudes, zero
    vals = [(1, 0.01, 0.05), (2, 104999.99, 0.10), (3, 0.0, 0.00),
            (4, 12345.67, 0.07), (5, 99999.99, 0.03), (6, 0.05, 0.10)]
    df = spark.createDataFrame(vals, "id long, price double, disc double")
    got = df.agg(
        M.sum_fixed_as_double(M.fixed("price"), 2).alias("s2"),
        M.sum_fixed_as_double(
            M.fixed("price") * (100 - M.fixed("disc")), 4
        ).alias("s4"),
    ).head()
    want = df.agg(
        F.round(F.sum(F.col("price").cast("decimal(12,2)")), 2)
        .cast("double").alias("s2"),
        F.round(
            F.sum(
                F.col("price").cast("decimal(12,2)")
                * (F.lit(1) - F.col("disc").cast("decimal(4,2)"))
            ),
            2,
        ).cast("double").alias("s4"),
    ).head()
    assert got.s2 == want.s2
    assert got.s4 == want.s4


def test_fixed_point_property_random_feeds(spark):
    """Property: for random 2-decimal prices/discounts the fixed-point
    path equals the decimal path on every grouped sum."""
    import random

    from pyspark.sql import functions as F

    from cdc_practice_spark.functions import money as M

    rng = random.Random(42)
    rows = [
        (i % 7, round(rng.uniform(0, 150000), 2), round(rng.uniform(0, 0.10), 2))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "g int, price double, disc double")
    units = M.fixed("price") * (100 - M.fixed("disc"))
    got = {
        r.g: r.rev
        for r in df.groupBy("g")
        .agg(M.sum_fixed_as_double(units, 4).alias("rev"))
        .collect()
    }
    want = {
        r.g: r.rev
        for r in df.groupBy("g")
        .agg(
            F.round(
                F.sum(
                    F.col("price").cast("decimal(12,2)")
                    * (F.lit(1) - F.col("disc").cast("decimal(4,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("rev")
        )
        .collect()
    }
    assert got == want
