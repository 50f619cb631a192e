"""Time-series resampling: regularize an irregular event stream onto a
fixed grid with forward-fill — the feature-engineering step between an
event log and a model-ready hypertable.

Scale shape: the grid is generated per key with sequence+explode (pure
JVM, proportional to output size, no driver loop), the union+window
forward-fill is the same one-shuffle carry pattern the CDC pipeline uses
(cdc/history.py) — per-key, order-local, no global state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_forward_fill(
    events: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    step_minutes: int = 60,
) -> DataFrame:
    """Per key: an even ``step_minutes`` grid from its first to its last
    event, each grid point carrying the latest value at-or-before it.

    Output: (key, slot_us, value). Keys whose ceil-aligned first slot
    falls after their last event (e.g. a single event at a non-aligned
    timestamp) produce an empty grid and are dropped — the same contract
    as SQL ``generate_series(start, stop)`` with start > stop."""
    step_us = step_minutes * 60 * 1_000_000
    ts_us = F.unix_micros(F.col(time_col).cast("timestamp"))

    obs = events.select(
        F.col(key).alias("k"),
        ts_us.alias("t_us"),
        F.col(value_col).alias("v"),
        F.lit(1).alias("is_event"),
    )

    # per-key grid: ceil-align the first slot so grid points are
    # key-independent epoch multiples of the step (joinable across keys)
    bounds = obs.groupBy("k").agg(
        F.min("t_us").alias("t0"), F.max("t_us").alias("t1")
    )
    first_slot = (F.ceil(F.col("t0") / step_us) * step_us).cast("long")
    # F.sequence raises on start > stop; generate_series returns empty.
    # Guard with an empty array (explode drops the key) so a key whose
    # only event sits between two grid lines doesn't crash the job.
    safe_seq = F.when(
        first_slot <= F.col("t1"),
        F.sequence(first_slot, F.col("t1"), F.lit(step_us)),
    ).otherwise(F.array().cast("array<long>"))
    grid = bounds.select(
        "k",
        F.explode(safe_seq).alias("t_us"),
    ).select(
        "k", "t_us", F.lit(None).cast("double").alias("v"), F.lit(0).alias("is_event")
    )

    # union + carry: events sort before grid points at equal timestamps
    # (is_event desc) so a slot landing exactly on an event picks it up
    u = obs.unionByName(grid)
    w = (
        Window.partitionBy("k")
        .orderBy("t_us", F.col("is_event").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("ff", F.last("v", ignorenulls=True).over(w))
    return (
        filled.filter(F.col("is_event") == 0)
        .select(
            F.col("k").alias(key),
            F.col("t_us").alias("slot_us"),
            F.col("ff").alias(value_col),
        )
    )
