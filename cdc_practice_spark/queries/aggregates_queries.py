"""Statistical aggregates: exact percentiles (oracle — Spark
``percentile`` and DuckDB ``quantile_cont`` share the linear-interpolation
definition) and sketch-based approximate distinct (HLL — rows-only with a
tolerance test, since a sketch has no SQL twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table


@register(
    "percentile_price_stats",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
       round(stddev_samp(l_extendedprice), 4) AS price_stddev,
       round(avg(l_quantity), 6) AS mean_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def percentile_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles + stddev.  percentile() is a sort-based
    aggregate per group — at 100 TB prefer approx_percentile (t-digest)
    unless exactness is required; both surfaces exist here (see
    approx_distinct_parts for the sketch tier)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.avg("l_quantity"), 6).alias("mean_qty"),
    )


@register(
    "approx_distinct_parts",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
       TRUE AS parts_within_tol,
       TRUE AS suppliers_within_tol
FROM lineitem
GROUP BY l_returnflag
""",
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch per order status — the
    constant-memory cardinality tier for 100 TB (exact distinct shuffles
    every key; HLL merges fixed-size sketches map-side).

    An HLL estimate can never hash-match a SQL twin raw, so the query
    emits the DECISION instead: the exact counts (both engines agree)
    plus a boolean per sketch — |approx − exact| / exact ≤ 0.05 — that
    the oracle asserts as TRUE.  A sketch drifting out of tolerance
    flips the boolean and fails the hash compare, which is exactly the
    regression the rows-only check could never catch.  (rsd=0.02, so
    the 5%% bound holds with wide margin; also tolerance-tested in
    tests/test_aggregates.py.)"""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_suppliers"),
        F.countDistinct("l_partkey").cast("long").alias("exact_parts"),
        F.countDistinct("l_suppkey").cast("long").alias("exact_suppliers"),
    )
    tol = lambda a, e: (
        F.abs(F.col(a).cast("double") - F.col(e).cast("double"))
        / F.col(e).cast("double")
        <= F.lit(0.05)
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_suppliers",
        tol("approx_parts", "exact_parts").alias("parts_within_tol"),
        tol("approx_suppliers", "exact_suppliers").alias("suppliers_within_tol"),
    )


@register(
    "histogram_order_totals",
    oracle="""
WITH rng AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
)
SELECT CAST(CASE WHEN o_totalprice >= hi THEN 20
            ELSE floor((o_totalprice - lo) * 20.0 / (hi - lo)) + 1 END
            AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)), 2)
            AS DOUBLE) AS total
FROM orders, rng
GROUP BY bucket
""",
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width numeric histogram via width_bucket — the profiling
    primitive behind distribution dashboards.  The min/max range is one
    tiny aggregate broadcast back (scalar-subquery shape); the bucketing
    itself is a pure projection feeding a 21-key aggregate: one scan,
    one map-side-combined shuffle."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    rng = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    return (
        orders.crossJoin(F.broadcast(rng))
        .select(
            # same arithmetic as the oracle, literally — width_bucket's
            # internal formula could differ by an ulp at bucket edges
            F.when(F.col("o_totalprice") >= F.col("hi"), F.lit(20))
            .otherwise(
                F.floor(
                    (F.col("o_totalprice") - F.col("lo"))
                    * 20.0
                    / (F.col("hi") - F.col("lo"))
                )
                + 1
            )
            .cast("long")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast(
                    "decimal(18,2)"
                ),
                2,
            )
            .cast("double")
            .alias("total"),
        )
    )
