"""Extended relational surface (§2.4 checklist depth): outer/semi/anti
joins, HAVING, distinct aggregation, CUBE, subqueries, CASE/date scalar
functions, union-all over heterogeneous branches.

Same scale rules as analytics.py: dims broadcast, facts shuffle on their
natural keys, every aggregate decimal-exact then rounded to double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.functions import money as M
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table


def _dec(col: str, prec: int = 12, scale: int = 2) -> Column:
    return F.col(col).cast(f"decimal({prec},{scale})")


def _dbl(c: Column, scale: int = 2) -> Column:
    return F.round(c, scale).cast("double")


@register(
    "join_left_outer_order_counts",
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders,
       CAST(round(coalesce(sum(CAST(o_totalprice AS DECIMAL(12,2))), 0), 2) AS DOUBLE) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
""",
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join keeping order-less customers (count(col) skips
    the null-extended rows — the classic outer-join aggregate)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                M.sum_fixed_as_double(M.fixed("o_totalprice"), 2), F.lit(0.0)
            ).alias("total_spend"),
        )
    )


@register(
    "join_semi_anti_part_usage",
    oracle="""
SELECT
  (SELECT count(*) FROM part WHERE p_partkey IN (SELECT l_partkey FROM lineitem)) AS n_used,
  (SELECT count(*) FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)) AS n_unused
""",
)
def join_semi_anti_part_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI joins (EXISTS / NOT EXISTS) — the engine
    forms of the reference's per-row existence probes (P4,
    simple_kafka_etl.py:128-131), set-oriented."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey")
    )
    used = part.join(li, "p_partkey", "left_semi").agg(
        F.count(F.lit(1)).alias("n_used")
    )
    unused = part.join(li, "p_partkey", "left_anti").agg(
        F.count(F.lit(1)).alias("n_unused")
    )
    return used.crossJoin(unused)


@register(
    "having_big_spenders",
    oracle="""
SELECT o_custkey,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS spend,
       count(*) AS n_orders,
       count(DISTINCT o_orderpriority) AS n_priorities
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 15
""",
)
def having_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING + distinct aggregation in one pass."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            M.sum_fixed_as_double(M.fixed("o_totalprice"), 2).alias("spend"),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "cube_nation_segment",
    oracle="""
SELECT n_name, c_mktsegment,
       count(*) AS n_customers,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (n_name, c_mktsegment)
""",
)
def cube_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over a broadcast dim join — all four grouping-set levels in
    one shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .cube("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            M.sum_fixed_as_double(M.fixed("c_acctbal"), 2).alias("total_balance"),
        )
    )


@register(
    "scalar_subquery_above_avg_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
""",
)
def scalar_subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (uncorrelated → one extra tiny
    aggregate job, broadcast as a literal into the scan filter)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_ssq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM _orders_ssq
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM _orders_ssq)
        """
    )


@register(
    "case_and_date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS order_dow,  -- DuckDB Sunday=0, Spark Sunday=1
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders
WHERE year(o_orderdate) = 1997
""",
)
def case_and_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction/arithmetic + CASE — codegen'd scalars; the year
    predicate folds to a date-range scan filter."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.year("o_orderdate") == 1997).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


@register(
    "union_all_account_events",
    oracle="""
SELECT 'customer' AS entity, c_custkey AS key, c_acctbal AS amount FROM customer
UNION ALL
SELECT 'supplier' AS entity, s_suppkey AS key, s_acctbal AS amount FROM supplier
""",
)
def union_all_account_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL over heterogeneous sources aligned to one schema."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("entity"),
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("amount"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("entity"),
        F.col("s_suppkey").alias("key"),
        F.col("s_acctbal").alias("amount"),
    )
    return cust.unionByName(supp)


@register(
    "pivot_status_by_priority",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
       CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS n_high,
       CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS n_medium,
       CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS n_notspec,
       CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS n_low
FROM orders
GROUP BY o_orderstatus
""",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (crosstab): priorities become columns.  The explicit value
    list keeps it a single pass (no distinct-values pre-query) — the
    form that scales."""
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .agg(F.count(F.lit(1)))
    )
    renames = {
        "1-URGENT": "n_urgent",
        "2-HIGH": "n_high",
        "3-MEDIUM": "n_medium",
        "4-NOT SPECIFIED": "n_notspec",
        "5-LOW": "n_low",
    }
    out = pivoted
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out.select(
        "o_orderstatus",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in renames.values()],
    )


@register(
    "fuzzy_brand_match",
    oracle="""
SELECT p_partkey, p_brand,
       CAST(levenshtein(p_brand, 'Brand#33') AS INTEGER) AS edit_dist
FROM part
WHERE levenshtein(p_brand, 'Brand#33') <= 2
""",
)
def fuzzy_brand_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching via edit distance — the scalar-function tier
    of near-dup detection (both engines implement the same classic
    Wagner-Fischer levenshtein)."""
    part = load_table(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_brand"), F.lit("Brand#33"))
    return (
        part.select("p_partkey", "p_brand", dist.cast("int").alias("edit_dist"))
        .filter(F.col("edit_dist") <= 2)
    )


@register(
    "window_lag_lead_order_gaps",
    oracle="""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(date_diff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS BIGINT) AS days_since_prev,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
         AS running_spend
FROM orders
WHERE o_custkey < 100
""",
)
def window_lag_lead_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows beyond ranking: lag + running sum over the same
    (key, time) sort — one shuffle, one sort, two window functions."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast(
            "bigint"
        ).alias("days_since_prev"),
        F.round(
            F.sum(M.fixed("o_totalprice")).over(w_run).cast("decimal(38,0)")
            / F.lit(100).cast("decimal(3,0)"),
            2,
        ).cast("double").alias("running_spend"),
    )
