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
    approx = {
        r.l_returnflag: (r.approx_parts, r.approx_suppliers)
        for r in approx_distinct_parts(spark, sf_dir).collect()
    }
    for flag, (p, s) in exact.items():
        ap, asup = approx[flag]
        assert abs(ap - p) / p < 0.10
        assert abs(asup - s) / s < 0.10


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
