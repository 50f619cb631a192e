"""Second relational-depth tier: window frame variants (ntile /
percent_rank / cume_dist / RANGE frames), ordered string aggregation,
deterministic stratified sampling, a time-range join, and the
salted two-level skew-proof aggregate.

Scale notes per query in the docstrings; shared conventions follow
registry.py (identical aliases both engines, decimal-exact money,
epoch-µs timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_practice_spark.functions import money as M
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table


@register(
    "window_frames_suite",
    oracle="""
WITH o AS (
  SELECT *, CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders WHERE o_custkey < 50
)
SELECT o_orderkey, o_custkey,
       ntile(4) OVER w AS spend_quartile,
       CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pct_rank,
       CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS cume,
       floor((2 * sum(cents) OVER w3 + count(*) OVER w3)
             / (2.0 * count(*) OVER w3)) / 100 AS trailing3_avg_price
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
       w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def window_frames_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function frame variants beyond ranking/lag (§2.4 depth):
    ntile quartiles, percent_rank, cume_dist, and a trailing-3 ROWS
    frame average — all sharing the minimum number of sorts.

    The frame average is computed in EXACT integer cents with HALF_UP
    via ``(2·sum + n) // (2n)`` rather than avg(decimal)/avg(double):
    a 2-row frame of 2-decimal prices can average to exactly .005,
    where a double accumulator (DuckDB's avg over DECIMAL) lands at
    .00499…96 and rounds DOWN while exact decimal rounds UP — a
    cent-level engine divergence only visible once the data has such a
    frame (surfaced at sf0.1, invisible at sf0.01).  Integer math is
    bit-identical everywhere; quotients here stay ≤1e9, far inside
    double's exact-integer range, so floor(a/b) is safe."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w3 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    sum_c = F.sum(cents).over(w3)
    cnt = F.count(F.lit(1)).over(w3)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.round(F.percent_rank().over(w), 6).cast("double").alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).cast("double").alias("cume"),
        (F.floor((2 * sum_c + cnt) / (2.0 * cnt)) / 100).alias(
            "trailing3_avg_price"
        ),
    )


@register(
    "string_agg_accounts",
    oracle="""
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       string_agg(c_name, ',' ORDER BY c_custkey) AS sample_names
FROM customer
WHERE c_custkey <= 200
GROUP BY c_nationkey, c_mktsegment
""",
)
def string_agg_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): collect_list under an
    explicit sort spec, then array_join.  The deterministic ORDER BY
    inside the aggregate is what makes the output hashable — unordered
    listagg is nondeterministic under shuffle.  Scale: list size is
    bounded by the group's row count — cap the id range (as here) or
    slice the sorted array when groups can be huge."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("c_custkey", "c_name"))
                ).getField("c_name"),
                ",",
            ).alias("sample_names"),
        )
    )


@register(
    "stratified_sample_stats",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sampled_spend
FROM orders
WHERE CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || ':sample'), 1, 15)
           AS BIGINT) % 100 < 10
GROUP BY o_orderpriority
""",
)
def stratified_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% hash sample with per-stratum stats — the
    reproducible alternative to TABLESAMPLE/rand() sampling: membership
    is a pure function of the key, so samples are stable across runs,
    engines, and retries (the property audit pipelines need).  Pure
    map-side filter + one small aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":sample"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return (
        orders.filter(bucket < 10)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            M.sum_fixed_as_double(M.fixed("o_totalprice"), 2).alias("sampled_spend"),
        )
    )


@register(
    "range_join_post_purchase",
    oracle="""
SELECT p.event_id AS purchase_id,
       CAST(count(*) AS BIGINT) AS n_follow,
       CAST(sum(CASE WHEN f.event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors
FROM events p JOIN events f
  ON f.user_id = p.user_id
 AND f.ts >  p.ts
 AND f.ts <= p.ts + INTERVAL 1 HOUR
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
""",
)
def range_join_post_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range join (interval containment): all same-user events in
    the hour after each purchase, with a post-purchase error count.
    The equality key (user_id) makes this a hash join with a range
    residual — NEVER a nested-loop: the equi-part shuffles as usual and
    the time predicate evaluates post-probe.  At 100 TB add a time
    bucket to the equi-key ((user, hour-bucket), probe ±1 bucket) so a
    single hot user can't blow up one task; here user cardinality
    already bounds each probe."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return (
        events.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("ts") > F.col("p_ts"))
            & (F.col("ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_follow"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("n_errors"),
        )
    )


@register(
    "skew_salted_user_value",
    oracle="""
SELECT skew_key,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
FROM (
  SELECT CASE WHEN user_id < 75 THEN -1 ELSE user_id END AS skew_key, value
  FROM events
) t
GROUP BY skew_key
""",
)
def skew_salted_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation under the oracle gate: half the users
    collapse onto one pathological hot key (-1), then the two-level
    salted aggregate (operators/skew.py::salted_agg_sum_count) spreads
    it over 32 sub-keys — level 1 shuffles (key, salt), level 2 combines
    ≤32 tiny partials per key.  Same answer as a plain GROUP BY (the
    oracle), but no single reducer ever sees the hot key whole — the
    difference between finishing and straggling at 100 TB."""
    from cdc_practice_spark.operators.skew import salted_agg_sum_count

    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") < 75, F.lit(-1))
        .otherwise(F.col("user_id"))
        .alias("skew_key"),
        "value",
        "event_id",
    )
    agg = salted_agg_sum_count(
        ev, "skew_key", M.fixed("value"), salt=32, salt_source="event_id"
    )
    return agg.select(
        "skew_key",
        "n_rows",
        (
            F.round(
                F.col("units_sum").cast("decimal(38,0)") / F.lit(100).cast("decimal(3,0)"),
                2,
            ).cast("double")
        ).alias("sum_value"),
    )


@register(
    "unpivot_part_metrics",
    oracle="""
SELECT p_partkey, metric, CAST(round(CAST(value AS DECIMAL(12,2)), 2) AS DOUBLE) AS value
FROM (
  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
  UNION ALL
  SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
) u
""",
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the inverse of pivot): wide part metrics to long
    (key, metric, value) rows — the layout feature stores and metric
    pipelines ingest.  Compiles to Expand (each input row emits one row
    per metric in the same task): zero shuffles, linear at any scale."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["retailprice", "size"],
        variableColumnName="metric",
        valueColumnName="value",
    ).select(
        "p_partkey",
        "metric",
        F.round(F.col("value").cast("decimal(12,2)"), 2).cast("double").alias("value"),
    )


@register(
    "window_range_interval_frame",
    oracle="""
SELECT event_id, user_id,
       CAST(round(CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS DECIMAL(18,2)), 2) AS DOUBLE) AS rolling_1h_value
FROM events
WHERE event_type = 'click'
""",
)
def window_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user rolling 1-hour value sum —
    frames bounded by EVENT-TIME distance, not row counts (ROWS frames
    are in window_frames_suite).  One shuffle on user_id; the frame
    scan is a sliding pointer over the sorted partition.  Decimal-exact
    sum, so ties in ts ordering can't wobble the hash (RANGE frames
    include ALL peer rows at equal ts, making the frame sum
    order-independent by construction).

    Frame key is unix_micros(ts) with a ±3.6e9 µs bound — NOT a cast to
    whole seconds: the oracle's INTERVAL 1 HOUR frame compares at full
    timestamp precision, so truncating to seconds would shift inclusion
    of boundary rows whenever ts carries sub-second components."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("decimal(18,2)"),
            2,
        )
        .cast("double")
        .alias("rolling_1h_value"),
    )


@register(
    "runtime_bloom_semijoin",
    oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS sum_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderpriority
""",
)
def runtime_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter semi-join reduction (plans/runtime_filter.py):
    orders ⋈ segment-filtered customers, with the fact side pre-filtered
    by a hand-built Bloom bitmap over the dim keys BEFORE the join
    exchange — the shuffle-volume play Spark's own runtime.bloomFilter
    makes when the filtered dim outgrows broadcast.  Exact by
    construction (no false negatives; the join kills false positives):
    the oracle is the plain join."""
    from cdc_practice_spark.plans.runtime_filter import bloom_reduce_join

    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    joined = bloom_reduce_join(
        orders,
        dim,
        "o_custkey",
        "c_custkey",
        cache_key=("bloom_dim_rows", sf_dir, "customer:BUILDING"),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        M.sum_fixed_as_double(M.fixed("o_totalprice"), 2).alias("sum_price"),
    )
