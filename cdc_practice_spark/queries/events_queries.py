"""Event-sequence analytics: sessionization and as-of join, each with a
DuckDB oracle (the as-of oracle uses DuckDB's native ASOF JOIN — a good
independent check that the union-trick implementation matches the
textbook semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.operators.events_ops import asof_join, session_stats
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table


@register(
    "event_sessionization",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       count(*) AS n_events,
       min(ts_us) AS session_start_us,
       max(ts_us) AS session_end_us,
       round((max(ts_us) - min(ts_us)) / 1000000.0, 6) AS duration_s,
       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
FROM sessioned
GROUP BY user_id, session_seq
""",
)
def event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization + per-session stats.  One shuffle on
    the user key; boundary flags + cumulative sum stream through the
    sorted run (operators/events_ops.py)."""
    ev = load_table(spark, sf_dir, "events")
    return session_stats(ev, gap_minutes=30)


@register(
    "asof_purchase_attribution",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
s AS (SELECT * FROM events WHERE event_type = 'signup')
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS purchase_ts_us,
       p.value,
       s.event_id AS asof_event_id,
       epoch_us(s.ts) AS asof_ts_us
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
""",
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the user's latest signup
    at-or-before it (NULL if none).  Union-trick implementation — one
    shuffle, no range join (operators/events_ops.py::asof_join); the
    oracle is DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(
        purchases,
        signups,
        key="user_id",
        left_time="ts",
        right_time="ts",
        right_payload=["event_id"],
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return joined.select(
        "event_id",
        "user_id",
        us("ts").alias("purchase_ts_us"),
        "value",
        F.col("asof_event_id"),
        us("asof_time").alias("asof_ts_us"),
    )


@register(
    "session_window_native",
    oracle="""
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id,
       min(ts_us) AS window_start_us,
       max(ts_us) + 30 * 60 * 1000000 AS window_end_us,
       count(*) AS n_events
FROM sessioned
GROUP BY user_id, session_seq
""",
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation (the Structured
    Streaming session primitive, run in batch): rows within a 30-min gap
    merge into one [first_ts, last_ts + gap) window per user.  Unlike
    the lag/cumsum composition (event_sessionization), this is one
    `groupBy(session_window(...))` — Spark plans a specialized
    UpdatingSessionsExec that merges sessions inside the same
    (key-partitioned) sort, and the identical operator carries over to
    `readStream` unchanged.  The oracle reconstructs the same windows
    via the lag/cumsum closure — two independent algorithms, one
    answer."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts"), "30 minutes")
    return (
        ev.groupBy(F.col("user_id"), sw.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("window_start_us"),
            F.unix_micros(F.col("w.end").cast("timestamp")).alias("window_end_us"),
            "n_events",
        )
    )


@register(
    "event_funnel_conversion",
    oracle="""
WITH u1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
u2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN u1 ON e.user_id = u1.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > u1.t1
  GROUP BY e.user_id
),
u3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
  FROM events e JOIN u2 ON e.user_id = u2.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > u2.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
       (SELECT count(*) FROM u1) AS n_signup,
       (SELECT count(*) FROM u2) AS n_signup_click,
       (SELECT count(*) FROM u3) AS n_full_funnel,
       (SELECT CAST(coalesce(sum(u3.t3 - u1.t1), 0) AS BIGINT)
        FROM u3 JOIN u1 ON u3.user_id = u1.user_id) AS total_conversion_us
""",
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (signup → click → purchase, each stage
    STRICTLY after the previous stage's first completion): the canonical
    product-analytics query.  Three user-keyed aggregations — every
    groupBy/join shuffles on the SAME key, so the plan repartitions once
    and reuses it; stage frames shrink monotonically (u2 ⊆ u1 keys)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    u1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    u2 = (
        ev.filter(F.col("event_type") == "click")
        .join(u1, on="user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    u3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(u2, on="user_id")
        .filter(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    conv = u3.join(u1, on="user_id").agg(
        F.coalesce(F.sum(F.col("t3") - F.col("t1")), F.lit(0)).alias(
            "total_conversion_us"
        )
    )
    return (
        ev.agg(F.countDistinct("user_id").alias("n_users"))
        .crossJoin(u1.agg(F.count(F.lit(1)).alias("n_signup")))
        .crossJoin(u2.agg(F.count(F.lit(1)).alias("n_signup_click")))
        .crossJoin(u3.agg(F.count(F.lit(1)).alias("n_full_funnel")))
        .crossJoin(conv)
    )


@register(
    "event_retention_cohorts",
    oracle="""
WITH active AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
  FROM events
),
firsts AS (
  SELECT user_id, min(week) AS cohort_week FROM active GROUP BY user_id
)
SELECT f.cohort_week,
       a.week - f.cohort_week AS week_offset,
       count(*) AS n_users
FROM active a JOIN firsts f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
)
def event_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-active epoch-week,
    counted in every later week they return — the other canonical
    product-analytics shape.  Two user-keyed aggregations sharing one
    exchange; the (cohort, offset) matrix is weeks², never data-sized.
    (active is DISTINCT per (user, week), so count(*) == distinct
    users.)"""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id",
        # integer `div`, NOT double `/` + cast: a double quotient landing
        # within 1 ulp of an integer boundary truncates differently than
        # the oracle's exact `//` — the data-dependent mismatch class
        F.expr("unix_micros(cast(ts as timestamp)) div 604800000000").alias("week"),
    ).distinct()
    firsts = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        active.join(firsts, on="user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "session_peak_concurrency",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
),
sessions AS (
  SELECT user_id, session_seq,
         min(ts_us) AS s, max(ts_us) AS e
  FROM sessioned GROUP BY user_id, session_seq
),
bounds AS (
  SELECT s AS ts, 1 AS delta FROM sessions
  UNION ALL
  SELECT e + 1 AS ts, -1 AS delta FROM sessions
),
swept AS (
  SELECT ts, CAST(sum(delta) OVER (ORDER BY ts, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS conc
  FROM bounds
)
SELECT (SELECT max(conc) FROM swept) AS peak_concurrency,
       (SELECT min(ts) FROM swept
        WHERE conc = (SELECT max(conc) FROM swept)) AS first_peak_ts_us,
       (SELECT count(*) FROM sessions) AS n_sessions
""",
)
def session_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously active sessions (capacity-planning
    staple): 30-minute-gap sessions become [start, end] intervals, a
    sweep-line of ±1 boundaries is prefix-summed, and the answer is the
    max with the first instant it is reached.

    The scale point is the prefix sum: there is NO single-partition
    global window anywhere — operators/events_ops.py::
    distributed_running_sum range-partitions the boundary stream,
    running-sums within each partition in parallel, and closes the gap
    with an index-sized (≤ n_partitions rows) driver prefix of
    per-partition totals broadcast back.  The DuckDB oracle sweeps the
    same boundaries with an ordinary global window."""
    from cdc_practice_spark.operators.events_ops import (
        peak_concurrency,
        session_stats,
    )

    ev = load_table(spark, sf_dir, "events")
    sessions = session_stats(ev, gap_minutes=30)
    return peak_concurrency(sessions)
