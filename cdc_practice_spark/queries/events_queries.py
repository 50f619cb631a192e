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
