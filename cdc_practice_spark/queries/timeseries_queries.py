"""Time-series resampling query (oracle-checked forward-fill grid)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.operators.timeseries import resample_forward_fill
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table

_STEP_US = 6 * 3600 * 1_000_000  # 6-hour grid


@register(
    "timeseries_resample_ffill",
    oracle=f"""
WITH obs AS (
  SELECT user_id AS k, epoch_us(ts) AS t_us, value AS v, 1 AS is_event
  FROM events
),
bounds AS (
  SELECT k, min(t_us) AS t0, max(t_us) AS t1 FROM obs GROUP BY k
),
grid AS (
  SELECT k,
         unnest(generate_series(
           CAST(ceil(t0 / {_STEP_US}.0) * {_STEP_US} AS BIGINT),
           t1, {_STEP_US})) AS t_us
  FROM bounds
),
u AS (
  SELECT k, t_us, v, is_event FROM obs
  UNION ALL
  SELECT k, t_us, NULL, 0 FROM grid
),
f AS (
  SELECT *,
         last_value(v IGNORE NULLS)
           OVER (PARTITION BY k ORDER BY t_us, is_event DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
  FROM u
)
SELECT k AS user_id, t_us AS slot_us, ff AS value
FROM f WHERE is_event = 0
""",
)
def timeseries_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 6-hour grid with forward-filled values — the hypertable
    regularization step (operators/timeseries.py; one shuffle per key,
    grid generated JVM-side)."""
    ev = load_table(spark, sf_dir, "events")
    return resample_forward_fill(ev, step_minutes=6 * 60)


@register(
    "timeseries_zscore_anomalies",
    oracle="""
WITH w AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
         avg(value) OVER f AS mu,
         stddev_samp(value) OVER f AS sd,
         count(*) OVER f AS n_window
  FROM events
  WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, ts_us,
       CAST(round(CAST(value AS DECIMAL(12,2)), 2) AS DOUBLE) AS value,
       round(CAST((value - mu) / sd AS DOUBLE), 4) AS zscore
FROM w
WHERE n_window >= 5 AND sd > 0 AND abs((value - mu) / sd) > 2
""",
)
def timeseries_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection (the monitoring twin of the
    resample tier): each event scored against the mean/stddev of its
    user's previous ≤9 events — a PRECEDING-only frame, so the score is
    causally valid (no self-inclusion, no lookahead).  One key-partition
    window; at 100 TB this is the same single exchange every other
    per-user window rides.  Warm-up guard (≥5 priors) keeps early-window
    variance noise out of the flag set."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    f = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-9, -1)
    )
    scored = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("value"),
        F.avg("value").over(f).alias("mu"),
        F.stddev_samp("value").over(f).alias("sd"),
        F.count(F.lit(1)).over(f).alias("n_window"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        scored.filter((F.col("n_window") >= 5) & (F.col("sd") > 0) & (F.abs(z) > 2))
        .select(
            "user_id",
            "event_id",
            "ts_us",
            F.round(F.col("value").cast("decimal(12,2)"), 2)
            .cast("double")
            .alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )
