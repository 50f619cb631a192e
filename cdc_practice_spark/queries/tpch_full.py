"""The last five TPC-H shapes (Q8/Q12/Q16/Q20/Q21), completing the
22-query surface (SURVEY.md §2.4 joins/subqueries checklist; the other
17 live in analytics.py / sql_surface.py / relational_more.py /
tpch_more.py).  Adapted to the trimmed fixture schema (TESTDATA.md):

  Q8  — national market share: a conditional-ratio aggregate over the
        deepest join tree in the suite (lineitem x part x supplier x
        orders x customer x nation x nation x region).
  Q12 — shipmode/priority split: fact-fact join + two conditional
        counts; l_linestatus stands in for the absent l_shipmode and
        ship-lag >= 60 days for the absent commit/receipt dates.
  Q16 — supplier-count distribution: distinct (part, supplier) pairs
        from lineitem stand in for the absent partsupp table; the
        "complaints" exclusion becomes a NOT-IN anti join on suppliers
        with negative balance.
  Q20 — dominant-supplier promotion: nested aggregate subqueries —
        per-(part,supplier) shipped quantity vs half of the part's
        total, semi-joined back to suppliers.
  Q21 — suppliers who kept orders waiting: the double-correlated
        EXISTS / NOT-EXISTS shape, decorrelated into one per-order
        aggregate (supplier count, late-supplier count) that rides a
        single orderkey shuffle; "late" = shipped > 365 days after the
        order date (no l_receiptdate/l_commitdate in the fixture).

Scale notes: every query shuffles facts at most once per join key;
nation/region (25/5 rows) always broadcast; the Q16 pair-distinct and
Q20/Q21 per-key aggregates have map-side partial aggregation, so the
exchanges carry combined rows, not raw lineitem.  Money math follows
registry.py conventions (exact int64 fixed-point, round-then-double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.functions import money as M
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table

_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


def _rev_units():
    """revenue in exact 1e-4 int64 units (functions/money.py fast path)."""
    return M.fixed("l_extendedprice") * (100 - M.fixed("l_discount"))


@register(
    "tpch_q8_market_share",
    oracle=f"""
SELECT o_year,
       CAST(round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                       AS DOUBLE)
                  / CAST(sum(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         {_REVENUE_SQL} AS volume,
         n2.n_name AS nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the deepest join tree in the suite feeding a
    conditional-ratio aggregate.  part (type-filtered) and
    supplier-with-nation broadcast and prune lineitem map-side; the
    ASIA region restriction folds into a broadcast nation-region dim
    that prunes customers BEFORE the custkey shuffle.  The two exact
    decimal sums divide after aggregation (2 rows), so the hash is
    summation-order-proof."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select(F.col("n_nationkey").alias("c_nk"))
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    customer = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("c_nk"))
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol_units = _rev_units()
    target_units = F.when(F.col("nation") == "NATION_3", vol_units).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp_nation), li["l_suppkey"] == supp_nation["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                M.sum_fixed_exact_double(target_units, 4)
                / M.sum_fixed_exact_double(vol_units, 4),
                6,
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@register(
    "tpch_q12_priority_by_status",
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND date_diff('day', o_orderdate, l_shipdate) >= 60
GROUP BY l_linestatus
""",
)
def tpch_q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + a pair of complementary
    conditional counts split by order priority.  l_linestatus stands in
    for the absent l_shipmode; "late receipt" becomes ship-lag >= 60
    days, which needs the join (it spans both tables) and so cannot
    push to a scan — exactly Q12's defining residual.  The shipdate
    year window DOES push into the lineitem scan."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .select("l_orderkey", "l_shipdate", "l_linestatus")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.datediff("l_shipdate", "o_orderdate") >= 60)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q16_supplier_count",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) partsupp
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'ECONOMY%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: count-distinct suppliers per part class.  The
    absent partsupp table is derived as DISTINCT (l_partkey, l_suppkey)
    — one shuffle with map-side combine, the same exchange the
    count-distinct would need anyway.  The "complaints" NOT IN becomes
    a broadcast anti join (negative-balance suppliers: a handful of
    rows), and the part predicates prune the dim before its join."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").like("ECONOMY%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    complainers = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(
            F.broadcast(complainers),
            pairs["l_suppkey"] == complainers["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(part), pairs["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_dominant_supplier",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_partkey AS pk, l_suppkey, sum(l_quantity) AS supp_qty
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_partkey, l_suppkey
  ) per_supp
  WHERE supp_qty > 0.5 * (
    SELECT sum(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = per_supp.pk
      AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l2.l_shipdate <  TIMESTAMP '1998-01-01'
  )
)
  AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_1')
""",
)
def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested aggregate subqueries semi-joined back to
    suppliers.  The absent partsupp.availqty threshold becomes "shipped
    more than half the part's 1997 volume".  The correlated inner SUM
    decorrelates into a window over the (part, supplier) aggregate —
    the per-part total is the sum of per-supplier sums, so one
    (partkey, suppkey) shuffle + one partkey window replace the
    oracle's O(parts x lineitem) rescan.  Suppliers then semi-join the
    few surviving keys (AQE broadcasts them at runtime)."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
    )
    from pyspark.sql import Window

    per_part_supp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_part_supp.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nation1 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_1")
        .select("n_nationkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation1), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    return supplier.join(
        dominant, supplier["s_suppkey"] == dominant["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND date_diff('day', o_orderdate, l1.l_shipdate) > 365
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND date_diff('day', o3.o_orderdate, l3.l_shipdate) > 365)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the double-correlated EXISTS / NOT-EXISTS.
    Decorrelated into ONE per-order aggregate: a row of supplier s
    qualifies iff its order has another supplier (n_supp > 1) and s is
    the only late one (n_late_supp = 1, s itself being late).  That
    aggregate and the join back to the late rows ride a single orderkey
    shuffle — the oracle's two correlated rescans of lineitem collapse
    into map-side combined counts.  "Late" = shipped > 365 days after
    the order date (fixture has no receipt/commit dates); top-k
    compiles to TakeOrderedAndProject."""
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(orders_f, li["l_orderkey"] == orders_f["o_orderkey"]).withColumn(
        "is_late", (F.datediff("l_shipdate", "o_orderdate") > 365).cast("int")
    )
    # Pre-aggregate to (order, supplier) grain first: the two distinct
    # counts then become plain count/sum (no Expand doubling the rows),
    # and the qualify join happens at the pre-agg grain instead of the
    # line level.  Both aggregates and the join ride ONE orderkey-side
    # shuffle; late-line multiplicity survives as n_late_lines.
    lv = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("any_late"),
        F.sum("is_late").alias("n_late_lines"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey")
    qualifying = (
        lv.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late_supp", F.sum("any_late").over(w))
        .filter(
            (F.col("any_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .select("l_suppkey", "n_late_lines")
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qualifying.join(
            F.broadcast(supplier), qualifying["l_suppkey"] == supplier["s_suppkey"]
        )
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )
