"""Deeper TPC-H relational breadth: Q7/Q10/Q13/Q18/Q19/Q22 shapes
adapted to the fixture schemas (TESTDATA.md — trimmed TPC-H: no
l_shipmode/l_commitdate, no c_phone/o_comment, synthetic NATION_n
names).  Each keeps the defining plan shape of its TPC-H original:

  Q7  — double-dimension join (supplier-nation x customer-nation) with a
        disjunctive nation-pair predicate and year rollup.
  Q10 — returned-item revenue top-k: fact-fact join narrowed by a date
        window + returnflag before the customer rollup.
  Q13 — distribution-of-distributions: LEFT OUTER join, count per
        customer, then count per count.
  Q18 — large-volume orders: HAVING-filtered fact aggregate semi-joined
        back to its parents.
  Q19 — OR-of-ANDs pushdown: three brand/size/quantity conjuncts that
        must all reach the scans as one disjunctive filter.
  Q22 — anti-join + uncorrelated scalar subquery (customers with money
        but no orders), grouped by nation key in lieu of phone prefix.
  Q2  — correlated MIN subquery decorrelated to a window over the join.
  Q11 — per-key aggregate filtered by a fraction of its own global total.
  Q15 — argmax over an aggregate view (max broadcast back as filter).
  Q17 — correlated per-group AVG threshold, decorrelated via semi join
        + pre-aggregate.
  Q9  — 5-way join profit rollup (LIKE-pruned part dim, supplier-nation
        broadcast, year extract), mixed-scale int64 fixed-point.

Scale notes: facts shuffle once on their join key; nation (25 rows) is
always broadcast; customer joins stay shuffle joins (broadcastable at
test SF, not at 100 TB — AQE decides).  All money aggregates are
decimal-exact then rounded to double (registry.py conventions).
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


_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


def _revenue() -> Column:
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))


def _rev_units() -> Column:
    """revenue in exact 1e-4 int64 units (functions/money.py fast path)."""
    return M.fixed("l_extendedprice") * (100 - M.fixed("l_discount"))


@register(
    "tpch_q7_nation_volume",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         {_REVENUE_SQL} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
     OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same 25-row nation dim joins TWICE under
    different roles (supplier side, customer side) — both broadcast, so
    the disjunctive nation-pair predicate evaluates map-side and prunes
    the fact rows before the orderkey shuffle."""
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    pair |= (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(
            F.broadcast(
                supplier.join(F.broadcast(ns), supplier["s_nationkey"] == ns["s_nk"])
            ),
            li["l_suppkey"] == supplier["s_suppkey"],
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            customer.join(F.broadcast(nc), customer["c_nationkey"] == nc["c_nk"]),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(M.sum_fixed_as_double(_rev_units(), 4).alias("revenue"))
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       CAST(round(sum({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: both scan filters (date window on orders,
    returnflag on lineitem) push into parquet BEFORE the orderkey
    shuffle; top-k compiles to TakeOrderedAndProject."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(M.sum_fixed_as_double(_rev_units(), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q13_order_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (o_comment filter dropped — column absent from
    the fixture): LEFT OUTER join preserving order-less customers, then
    a distribution-of-the-distribution.  Two shuffles by necessity
    (custkey, then c_count); the second input is one row per customer,
    already tiny."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q18_large_volume_orders",
    oracle="""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(round(CAST(o_totalprice AS DECIMAL(12,2)), 2) AS DOUBLE) AS totalprice,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 300
)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
""",
)
def tpch_q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the HAVING subquery aggregates lineitem by
    orderkey, and the surviving (few) keys semi-join back — Spark plans
    the IN as a left-semi join whose build side is the filtered
    aggregate, small enough for AQE to broadcast at runtime."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(M.sum_fixed_as_double(M.fixed("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _dbl(_dec("o_totalprice")).alias("totalprice"),
            "total_qty",
        )
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(round(sum({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
""",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (l_shipmode/p_container terms dropped — columns
    absent): an OR-of-ANDs spanning both join sides.  Catalyst derives
    the single-side implications (p_brand IN (...), l_quantity BETWEEN
    1 AND 50) and pushes them into each scan; the full disjunction
    evaluates after the join."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    def term(brand: str, lo_sz: int, hi_sz: int, lo_q: int, hi_q: int) -> Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(lo_sz, hi_sz)
            & F.col("l_quantity").between(lo_q, hi_q)
        )

    cond = (
        term("Brand#12", 1, 15, 1, 20)
        | term("Brand#23", 10, 30, 10, 30)
        | term("Brand#34", 20, 50, 20, 50)
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .filter(cond)
        .agg(M.sum_fixed_as_double(_rev_units(), 4).alias("revenue"))
    )


@register(
    "tpch_q22_idle_rich_customers",
    oracle="""
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
""",
)
def tpch_q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nation key stands in for the absent phone
    prefix; 'no orders at all' relaxed to 'no orders since 2000' so the
    fixture — where every customer has orders — still exercises the
    path): uncorrelated scalar subquery (global avg balance, broadcast
    and folded into the scan filter) + anti join against recent orders
    (NOT EXISTS), then a small rollup."""
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("_avg_bal"))
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .drop("_avg_bal")
        .join(orders, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            M.sum_fixed_as_double(M.fixed("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH costs AS (
  SELECT p_partkey, p_brand, p_type, s_suppkey, s_name, s_acctbal,
         min(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
  FROM part
  JOIN lineitem ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_size = 15
)
SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name,
       CAST(round(CAST(s_acctbal AS DECIMAL(12,2)), 2) AS DOUBLE) AS acctbal
FROM costs
WHERE s_acctbal = min_bal
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp table — lineitem links parts to
    suppliers; acctbal stands in for supplycost): for each size-15 part,
    the supplier(s) with the minimum balance.  The correlated MIN
    subquery decorrelates to a window over the join — one shuffle on
    partkey, no re-join of the aggregate."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    from pyspark.sql.window import Window

    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.round(F.col("s_acctbal").cast("decimal(12,2)"), 2)
            .cast("double")
            .alias("acctbal"),
        )
        .distinct()
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS part_value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey,
       CAST(round(part_value, 2) AS DOUBLE) AS part_value
FROM per_part
WHERE part_value > (SELECT sum(part_value) * 0.0005 FROM per_part)
""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-key aggregate filtered by a FRACTION OF THE
    GLOBAL TOTAL — the aggregate feeds both branches, so the engine
    computes it once, derives the tiny global sum, and broadcasts the
    threshold back (no second scan of lineitem).

    Fixed-point: price×quantity is exact at 1e-4 units in int64; the
    global total of e4 units could overflow int64 at extreme scale, so
    the (already aggregated, one-row-per-part) values convert to decimal
    BEFORE the global sum — the slow decimal path touches N_parts rows,
    not N_lineitems."""
    li = load_table(spark, sf_dir, "lineitem")
    units = M.fixed("l_extendedprice") * M.fixed("l_quantity")  # 1e-4 units
    per_part = (
        li.groupBy("l_partkey")
        .agg(F.sum(units).alias("_u"))
        .withColumn(
            "part_value_dec",
            F.col("_u").cast("decimal(38,0)") / F.lit(10_000).cast("decimal(9,0)"),
        )
    )
    threshold = per_part.agg(
        (F.sum("part_value_dec") * F.lit(0.0005)).alias("_thr")
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value_dec") > F.col("_thr"))
        .select(
            "l_partkey",
            F.round(F.col("part_value_dec"), 2).cast("double").alias("part_value"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue 'view' is computed once; its MAX is
    a one-row broadcast joined back as the filter (the classic
    argmax-over-aggregate — never a self-join of two full aggregations)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev_units = M.fixed("l_extendedprice") * (100 - M.fixed("l_discount"))
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev_units).alias("_u"))
        .withColumn(
            "rev_dec",
            F.col("_u").cast("decimal(38,0)") / F.lit(10_000).cast("decimal(9,0)"),
        )
    )
    mx = revenue.agg(F.max("rev_dec").alias("_mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_dec") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_dec"), 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
SELECT CAST(round(sum(CAST(l1.l_extendedprice AS DECIMAL(12,2))) / 7.0, 2) AS DOUBLE)
         AS avg_yearly
FROM lineitem l1
JOIN part ON p_partkey = l1.l_partkey
WHERE p_brand = 'Brand#23'
  AND l1.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey)
""",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (p_container term dropped — column absent): the
    correlated per-part AVG subquery decorrelates into a pre-aggregate
    joined back on partkey.  The per-part averages for the FILTERED
    brand come from re-scanning only matching parts' lineitems (semi
    join first), so the aggregate side is small enough for AQE to
    broadcast."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left_semi"
    )
    per_part_avg = brand_li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("_qty_thr")
    )
    return (
        brand_li.join(per_part_avg, brand_li["l_partkey"] == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_qty_thr"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")) / 7.0, 2
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
SELECT nation, o_year,
       CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(4,2)))
           - CAST(p_retailprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.10 AS DECIMAL(3,2))
           AS amount
  FROM part
  JOIN lineitem ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp — supply cost modeled as 10% of
    p_retailprice per unit): 5-way join, LIKE-filtered part dim,
    supplier-nation rollup by order year.  part (LIKE-pruned) and
    supplier⋈nation broadcast; the only big shuffle is
    lineitem⋈orders on orderkey.  Profit units: revenue at 1e-4 minus
    cost at 1e-5 (retail·qty·0.1) — both exact int64, combined at the
    common 1e-5 scale so one long SUM carries the whole expression."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    # revenue: ext_e2 * (100-disc_e2) * 10  → 1e-5 units
    # cost:    retail_e2 * qty_e2 = retail·qty·1e4 = (retail·qty·0.1)·1e5
    #          → already 1e-5 units of the 10%-of-retail cost
    rev_e5 = M.fixed("l_extendedprice") * (100 - M.fixed("l_discount")) * 10
    cost_e5 = M.fixed("p_retailprice") * M.fixed("l_quantity")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(
            F.broadcast(supp.join(F.broadcast(nation),
                                  supp["s_nationkey"] == F.col("n_nationkey"))),
            li["l_suppkey"] == supp["s_suppkey"],
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(M.sum_fixed_as_double(rev_e5 - cost_e5, 5).alias("sum_profit"))
    )
