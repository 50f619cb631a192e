"""Event-sequence operators: sessionization and as-of join.

Both are implemented with the shuffle-minimal patterns that survive
100 TB:

- **Sessionization**: gap > threshold ⇒ new session, assigned by a
  cumulative sum of boundary flags over (key, time) — one shuffle on the
  key, one sort, streaming through sorted runs.  (The streaming twin is
  ``F.session_window`` with a watermark.)

- **As-of join** (each left row matched to the latest right row at or
  before it): implemented by the UNION trick — tag both sides, union,
  window over (key, time) carrying the last right-side payload forward,
  keep left rows.  One shuffle on the key; no range-explosion join, no
  per-row subquery.  This is the standard scalable as-of plan (a naive
  range join is O(left × right-per-key)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign session ids: a session breaks when the gap since the key's
    previous event exceeds ``gap_minutes``.  Adds ``session_seq`` (1-based
    per key) and ``session_id`` (key-qualified string)."""
    w = Window.partitionBy(key).orderBy(time_col, order_tiebreak)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # gap arithmetic in epoch-µs integers: exact, and identical in the
    # SQL oracle (epoch_us) — no float/timezone wobble.
    ts_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_minutes * 60 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        events.withColumn("_new_session", is_new)
        .withColumn("session_seq", F.sum("_new_session").over(w_run))
        .withColumn(
            "session_id",
            F.concat_ws("-", F.col(key).cast("string"), F.col("session_seq")),
        )
        .drop("_new_session")
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregate over sessionized events: bounds, size,
    value sum.  groupBy on (key, session_seq) — map-side combinable."""
    s = sessionize(events, key, time_col, gap_minutes)
    ts_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    return s.groupBy(key, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_us).alias("session_start_us"),
        F.max(ts_us).alias("session_end_us"),
        F.round((F.max(ts_us) - F.min(ts_us)) / 1_000_000.0, 6).alias("duration_s"),
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("sum_value"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_time <= left_time`` for the same key (NULLs if none).

    UNION trick: right rows sort before left rows at equal timestamps
    (side=0 vs 1), a last(ignorenulls) window carries the right payload
    forward, then left rows are kept.  One shuffle on the key."""
    lcols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_payload],
        F.lit(None).cast(right.schema[right_time].dataType).alias("_rt"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("_left"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
        F.col(right_time).alias("_rt"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "_k",
        "_t",
        "_side",
        "_left",
        F.last("_rt", ignorenulls=True).over(w).alias("_matched_t"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in right_payload
        ],
    ).filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        # epoch-µs arithmetic (NTZ has no direct numeric cast)
        within = (
            F.unix_micros(F.col("_t").cast("timestamp"))
            - F.unix_micros(F.col("_matched_t").cast("timestamp"))
        ) <= int(tolerance_seconds * 1_000_000)
        carried = carried.select(
            "_k",
            "_t",
            "_side",
            "_left",
            F.when(within, F.col("_matched_t")).alias("_matched_t"),
            *[F.when(within, F.col(f"_c_{c}")).alias(f"_c_{c}") for c in right_payload],
        )
    out_cols: list[Column] = [F.col(f"_left.{c}").alias(c) for c in lcols]
    out_cols.append(F.col("_matched_t").alias("asof_time"))
    out_cols += [F.col(f"_c_{c}").alias(f"asof_{c}") for c in right_payload]
    return carried.select(*out_cols)
