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


def distributed_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
    n_partitions: int = 32,
) -> DataFrame:
    """Global running sum WITHOUT a single-partition window — the
    distributed two-pass prefix-sum every sweep-line algorithm needs:

      pass 1: range-partition on the global order, per-partition running
              sum (window partitioned by the PHYSICAL partition id —
              parallel, spill-safe);
      pass 2: per-partition totals (≤ n_partitions rows) collect to the
              driver, exclusive-prefix there, and broadcast back as
              offsets.

    A naive ``Window.orderBy(...)`` with no partition key funnels the
    whole table through ONE task — the exact anti-pattern this replaces;
    cost here is one range exchange + an index-sized driver pass.
    Output: input columns + ``out_col``."""
    ranged = df.repartitionByRange(n_partitions, *[F.col(c) for c in order_cols])
    ranged = ranged.withColumn("_pid", F.spark_partition_id())
    from cdc_practice_spark.plans.cache import tracked_persist

    ranged = tracked_persist(ranged)
    totals = sorted(
        (r._pid, r._tot)
        for r in ranged.groupBy("_pid")
        .agg(F.sum(value_col).alias("_tot"))
        .collect()
    )
    off, offsets = 0, []
    for pid, tot in totals:
        offsets.append((pid, off))
        off += tot or 0
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_run", F.sum(value_col).over(w))
        .join(F.broadcast(off_df), on="_pid")
        .withColumn(out_col, F.col("_run") + F.col("_off"))
        .drop("_pid", "_run", "_off")
    )


def peak_concurrency(
    intervals: DataFrame,
    start_col: str = "session_start_us",
    end_col: str = "session_end_us",
) -> DataFrame:
    """Sweep-line peak concurrency over closed intervals [start, end]:
    +1 boundary at start, −1 at end + 1, distributed running sum over
    the boundary order (ts, delta — retirements before arrivals at the
    same instant), then max + first time the max is reached.  One row:
    (peak_concurrency, first_peak_ts_us, n_sessions)."""
    from cdc_practice_spark.plans.cache import tracked_persist

    b = intervals.select(
        F.col(start_col).alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        intervals.select(
            (F.col(end_col) + 1).alias("ts"), F.lit(-1).alias("delta")
        )
    )
    running = tracked_persist(
        distributed_running_sum(b, ["ts", "delta"], "delta", "conc")
    )
    n_sessions = intervals.count()
    peak = running.agg(F.max("conc").alias("p")).collect()[0].p
    first = (
        running.filter(F.col("conc") == peak)
        .agg(F.min("ts").alias("t"))
        .collect()[0]
        .t
    )
    spark = intervals.sparkSession
    return spark.createDataFrame(
        [(int(peak), int(first), int(n_sessions))],
        "peak_concurrency long, first_peak_ts_us long, n_sessions long",
    )
