"""Time-series resampling query (oracle-checked forward-fill grid)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
