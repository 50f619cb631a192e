"""Bucketed co-located join: same results, NO exchange in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.plans.explain import physical_tree
from cdc_practice_spark.session import load_table
from cdc_practice_spark.sources.bucketed import bucketed_join_ready, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    bucketed_join_ready(spark)
    write_bucketed(
        load_table(spark, sf_dir, "orders"), "orders_b", "o_orderkey", 8
    )
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(li, "lineitem_b", "o_orderkey", 8)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    o, l = bucketed_tables
    # disable broadcast so the co-location (not a broadcast) is what
    # removes the shuffle — at 100 TB neither side broadcasts anyway
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(o).join(spark.table(l), "o_orderkey").groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        tree = physical_tree(joined)
        # the join itself must not shuffle either side: the only
        # exchange allowed is the final tiny aggregation's
        assert "SortMergeJoin" in tree
        join_part = tree.split("HashAggregate")[-1]
        assert "Exchange" not in join_part
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed_tables):
    o, l = bucketed_tables
    bucketed = (
        spark.table(o)
        .join(spark.table(l), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
