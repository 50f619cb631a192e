"""Forward-fill resampling semantics."""

from __future__ import annotations

from datetime import datetime

import pytest

from cdc_practice_spark.operators.timeseries import resample_forward_fill


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_forward_fill_grid(spark):
    rows = [
        (0, ts("2024-01-01T00:30:00"), 1, "a", 10.0, "{}"),
        (1, ts("2024-01-01T02:15:00"), 1, "a", 20.0, "{}"),
        (2, ts("2024-01-01T05:59:00"), 1, "a", 30.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r.slot_us: r.value
        for r in resample_forward_fill(df, step_minutes=60).collect()
    }
    base = int(ts("2024-01-01T01:00:00").timestamp() * 1e6)
    hour = 3600 * 1_000_000
    # grid starts at the first aligned slot after 00:30 → 01:00
    assert set(out) == {base + i * hour for i in range(5)}  # 01:00..05:00
    assert out[base] == 10.0          # 01:00 carries 00:30's value
    assert out[base + hour] == 10.0   # 02:00 still 10.0 (02:15 is later)
    assert out[base + 2 * hour] == 20.0
    assert out[base + 4 * hour] == 20.0  # 05:00 before 05:59


def test_slot_on_event_takes_event_value(spark):
    rows = [
        (0, ts("2024-01-01T01:00:00"), 1, "a", 5.0, "{}"),
        (1, ts("2024-01-01T02:00:00"), 1, "a", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r.slot_us: r.value
        for r in resample_forward_fill(df, step_minutes=60).collect()
    }
    t1 = int(ts("2024-01-01T01:00:00").timestamp() * 1e6)
    t2 = int(ts("2024-01-01T02:00:00").timestamp() * 1e6)
    assert out[t1] == 5.0  # event exactly on the slot is visible to it
    assert out[t2] == 7.0


def test_single_event_key_off_grid_drops_not_crashes(spark):
    # one key whose only event sits between grid lines (ceil-aligned first
    # slot > last event ts) must yield no rows, not IllegalArgumentException;
    # a healthy key in the same frame must still resample normally
    rows = [
        (0, ts("2024-01-01T00:30:00"), 1, "a", 10.0, "{}"),  # lone, off-grid
        (1, ts("2024-01-01T00:10:00"), 2, "a", 1.0, "{}"),
        (2, ts("2024-01-01T02:20:00"), 2, "a", 2.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = resample_forward_fill(df, step_minutes=60).collect()
    assert {r.user_id for r in out} == {2}  # key 1 dropped like generate_series
    vals = {r.slot_us: r.value for r in out}
    hour = 3600 * 1_000_000
    base = int(ts("2024-01-01T01:00:00").timestamp() * 1e6)
    assert set(vals) == {base, base + hour}
    assert vals[base] == 1.0 and vals[base + hour] == 1.0


def test_aligned_single_event_key_kept(spark):
    # a lone event exactly on a grid line is its own (only) slot
    rows = [(0, ts("2024-01-01T03:00:00"), 7, "a", 9.0, "{}")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = resample_forward_fill(df, step_minutes=60).collect()
    assert len(out) == 1
    assert out[0].value == 9.0
