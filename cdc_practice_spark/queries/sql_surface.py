"""SQL surface: the reference's read path is analysts running SQL against
the warehouse (psql — README.md:102-108, SURVEY.md §3.3).  This module
registers the engine's derived tables as session views so the same
queries run verbatim via spark.sql, plus TPC-H-shaped SQL-first queries
(correlated EXISTS, filter-aggregate, conditional-ratio aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.cdc import (
    build_current,
    build_history,
    build_user_stats,
    change_feed_from_events,
)
from cdc_practice_spark.functions import money as M
from cdc_practice_spark.queries.registry import ORACLES, register
from cdc_practice_spark.session import TABLES, load_table


def create_warehouse_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the base fixtures AND the CDC warehouse tables as views:
    after this, spark.sql('SELECT * FROM bank_accounts_current ...') runs
    the reference's analyst queries verbatim."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    feed = change_feed_from_events(spark.table("events"))
    build_history(feed).createOrReplaceTempView("bank_accounts_history")
    build_current(feed).createOrReplaceTempView("bank_accounts_current")
    build_user_stats(spark.table("bank_accounts_history")).createOrReplaceTempView(
        "user_account_stats"
    )


@register(
    "sql_surface_recent_changes",
    oracle="""
WITH feed AS (
  SELECT event_id AS kafka_offset, user_id AS original_id, value,
         ts AS registered_at,
         CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted
  FROM events
),
typed AS (
  SELECT *, CASE WHEN __deleted = 'true' THEN 'DELETE'
                 WHEN lag(__deleted) OVER w IS NULL
                   OR lag(__deleted) OVER w = 'true' THEN 'INSERT'
                 ELSE 'UPDATE' END AS change_type
  FROM feed WINDOW w AS (PARTITION BY original_id ORDER BY kafka_offset)
)
SELECT original_id, change_type, value,
       epoch_us(registered_at) AS change_timestamp_us
FROM typed
ORDER BY registered_at DESC, kafka_offset DESC
LIMIT 10
""",
)
def sql_surface_recent_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The README's first analyst query (README.md:106) run VERBATIM as
    SQL against the registered warehouse views — proving the read path
    is a real SQL surface, not only a DataFrame API."""
    create_warehouse_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT original_id, change_type, value,
               unix_micros(CAST(change_timestamp AS TIMESTAMP)) AS change_timestamp_us
        FROM bank_accounts_history
        ORDER BY change_timestamp DESC, kafka_offset DESC
        LIMIT 10
        """
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter-aggregate — every predicate pushes to
    the scan, no shuffle at all beyond the final scalar agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * F.col("l_discount").cast("decimal(4,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q4_late_shipments",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
""",
)
def tpch_q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → left-semi hash join (the
    set-oriented form of the reference's per-row existence probes)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_q4_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_q4_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM _q4_orders
        WHERE EXISTS (
          SELECT 1 FROM _q4_lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        )
        GROUP BY o_orderpriority
        """
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
SELECT round(
         100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(l_extendedprice AS DECIMAL(12,2))
                       * (1 - CAST(l_discount AS DECIMAL(4,2)))
                  ELSE 0 END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
         6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate <  TIMESTAMP '1997-10-01'
""",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-ratio aggregate over a broadcast dim
    join (part is the dimension; at 100 TB it may need the shuffle path —
    AQE decides, the logical plan doesn't pin it)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_units = M.fixed("l_extendedprice") * (100 - M.fixed("l_discount"))
    promo_units = F.when(F.col("p_type").like("PROMO%"), rev_units).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * M.sum_fixed_exact_double(promo_units, 4)
                / M.sum_fixed_exact_double(rev_units, 4),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "grouping_sets_revenue",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS grouping_level,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
         AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                        (l_linestatus), ())
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() disambiguation (rollup and
    cube are special cases — registered separately; this is the general
    form, run through spark.sql on a registered view).  One Expand over
    the scan feeds one shuffle keyed by (keys, grouping_id): exactly the
    rollup plan shape, set count × data in the exchange."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
                 AS grouping_level,
               CAST(round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                              * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                          / 10000.0, 2) AS DOUBLE) AS revenue
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                                (l_linestatus), ())
    """)


@register(
    "variant_props_stats",
    oracle="""
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(count(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                  THEN 1 END) AS BIGINT) AS k_gt50
FROM events
GROUP BY event_type
""",
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4): parse_json
    once into a binary-encoded variant, then typed variant_get field
    extraction — the modern engine path for schema-less JSON columns
    (vs. per-access string re-parsing).  The parse and both extractions
    fuse into one codegen'd projection before the (tiny) agg."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.sum("k").alias("k_sum"),
        F.count(F.when(F.col("k") > 50, 1)).alias("k_gt50"),
    )


@register(
    "recursive_cte_order_chains",
    oracle="""
WITH RECURSIVE ordered AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
succ AS (
  SELECT a.o_custkey, a.rn, a.o_orderdate,
         b.o_orderdate AS next_date, b.rn AS next_rn
  FROM ordered a
  LEFT JOIN ordered b ON b.o_custkey = a.o_custkey AND b.rn = a.rn + 1
),
chain AS (
  SELECT o_custkey, rn, o_orderdate, 1 AS depth
  FROM ordered
  WHERE rn = 1 AND o_orderdate < TIMESTAMP '1995-03-01'
  UNION ALL
  SELECT s.o_custkey, s.next_rn, s.next_date, c.depth + 1
  FROM chain c
  JOIN succ s ON s.o_custkey = c.o_custkey AND s.rn = c.rn
  WHERE s.next_date IS NOT NULL
    AND s.next_date <= s.o_orderdate + INTERVAL 30 DAY
    AND c.depth < 10
)
SELECT o_custkey, CAST(max(depth) AS BIGINT) AS chain_len
FROM chain
GROUP BY o_custkey
""",
)
def recursive_cte_order_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE, verbatim through
    spark.sql): per customer, walk consecutive orders while each gap is
    <= 30 days starting from a first order before 1995-03; report the
    chain length.  Successor edges are precomputed ONCE with a window
    (correlated NOT-EXISTS inside a recursive join is unsupported AND
    would rescan orders per step); the recursion then walks the edge
    table — each step one join whose working set shrinks as chains
    terminate.  Identical SQL runs on both engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rc")
    return spark.sql(ORACLES["recursive_cte_order_chains"].replace("FROM orders", "FROM orders_rc"))


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice_r AS o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey,
         CAST(round(CAST(o_totalprice AS DECIMAL(12,2)), 2) AS DOUBLE)
           AS o_totalprice_r
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) t
WHERE c.c_custkey < 100
"""


@register("lateral_top_orders_per_customer", oracle=_LATERAL_SQL)
def lateral_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-3 orders per customer), verbatim
    SQL on both engines.  Catalyst decorrelates the per-row LIMIT into a
    DomainJoin + window — NOT a per-customer rescan of orders — so the
    plan is one key-partitioned join + rank filter at any scale; DuckDB
    plans its own lateral unnesting.  Two engines, two decorrelation
    strategies, one answer."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


@register(
    "dq_expectations_orders",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       count(*) = count(DISTINCT o_orderkey) AS pk_unique,
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_custkey,
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
         AS n_fk_orphans,
       bool_and(o_totalprice > 0) AS totalprice_positive,
       bool_and(o_orderdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31')
         AS orderdate_in_range,
       bool_and(o_orderstatus IN ('O', 'F', 'P')) AS status_in_domain
FROM orders
""",
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the dbt-test / Great-Expectations
    surface): primary-key uniqueness, null rate, referential integrity
    (anti-join orphan count), domain and range invariants — each a
    single boolean/count so violations are oracle-detectable.  Shape:
    one pass over the fact (all checks fold into one aggregate) + one
    broadcast anti join for the FK probe; at 100 TB this is the same
    scan the ingest job already pays, so expectations ride along free."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orphans = (
        orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"], "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_fk_orphans"))
    )
    checks = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) == F.countDistinct("o_orderkey")).alias("pk_unique"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("n_null_custkey"),
        F.bool_and(F.col("o_totalprice") > 0).alias("totalprice_positive"),
        F.bool_and(
            F.col("o_orderdate").between("1992-01-01", "1998-12-31")
        ).alias("orderdate_in_range"),
        F.bool_and(F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "status_in_domain"
        ),
    )
    return checks.crossJoin(orphans).select(
        "n_rows",
        "pk_unique",
        "n_null_custkey",
        "n_fk_orphans",
        "totalprice_positive",
        "orderdate_in_range",
        "status_in_domain",
    )
