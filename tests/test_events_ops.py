"""Sessionization and as-of join semantics on hand-crafted sequences."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.operators.events_ops import asof_join, session_stats, sessionize


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: two sessions (45-min gap between events 2 and 3)
        (0, ts("2024-01-01T10:00:00"), 1, "view", 1.0, "{}"),
        (1, ts("2024-01-01T10:10:00"), 1, "click", 2.0, "{}"),
        (2, ts("2024-01-01T10:29:00"), 1, "purchase", 3.0, "{}"),
        (3, ts("2024-01-01T11:14:01"), 1, "view", 4.0, "{}"),
        # user 2: one event
        (4, ts("2024-01-01T09:00:00"), 2, "signup", 5.0, "{}"),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )


def test_sessionize_boundaries(ev):
    s = {r.event_id: r.session_seq for r in sessionize(ev).collect()}
    assert s[0] == s[1] == s[2] == 1
    assert s[3] == 2  # 45:01 gap > 30 min
    assert s[4] == 1


def test_sessionize_exact_30min_gap_is_same_session(spark):
    rows = [
        (0, ts("2024-01-01T10:00:00"), 1, "a", 0.0, "{}"),
        (1, ts("2024-01-01T10:30:00"), 1, "b", 0.0, "{}"),  # exactly 30:00
        (2, ts("2024-01-01T11:00:01"), 1, "c", 0.0, "{}"),  # 30:01 → breaks
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    s = {r.event_id: r.session_seq for r in sessionize(df).collect()}
    assert s[0] == s[1] == 1 and s[2] == 2


def test_session_stats(ev):
    stats = {
        (r.user_id, r.session_seq): r for r in session_stats(ev).collect()
    }
    s1 = stats[(1, 1)]
    assert s1.n_events == 3
    assert s1.duration_s == 29 * 60.0
    assert s1.sum_value == 6.0
    assert stats[(1, 2)].n_events == 1
    assert stats[(2, 1)].duration_s == 0.0


def test_sessionization_properties_on_fixture(spark, sf_dir):
    """Invariants over the real fixture: sessions partition the events;
    intra-session gaps ≤ 30 min; inter-session boundaries > 30 min."""
    from cdc_practice_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev)
    assert s.count() == ev.count()  # partition of the event set
    rows = sorted(
        s.select("user_id", "session_seq", "ts", "event_id").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    prev = None
    for r in rows:
        if prev is not None and prev.user_id == r.user_id:
            gap = (r.ts - prev.ts).total_seconds()
            if r.session_seq == prev.session_seq:
                assert gap <= 30 * 60
            else:
                assert gap > 30 * 60
                assert r.session_seq == prev.session_seq + 1
        prev = r


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"), "p1"), (1, ts("2024-01-01T12:00:00"), "p2"),
         (2, ts("2024-01-01T10:00:00"), "p3")],
        "user_id long, ts timestamp_ntz, name string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:00:00"), 100), (1, ts("2024-01-01T11:00:00"), 200),
         (3, ts("2024-01-01T08:00:00"), 300)],
        "user_id long, ts timestamp_ntz, rid int",
    )
    out = {
        r.name: (r.asof_rid, r.asof_time)
        for r in asof_join(
            left, right, "user_id", "ts", "ts", right_payload=["rid"]
        ).collect()
    }
    assert out["p1"] == (100, ts("2024-01-01T09:00:00"))  # 11:00 is later → 09:00
    assert out["p2"] == (200, ts("2024-01-01T11:00:00"))  # latest at-or-before
    assert out["p3"] == (None, None)  # no right rows for user 2


def test_asof_join_equal_timestamp_matches(spark):
    """right row AT the left timestamp matches (<=, not <)."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"), "p")], "user_id long, ts timestamp_ntz, name string"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"), 7)], "user_id long, ts timestamp_ntz, rid int"
    )
    r = asof_join(left, right, "user_id", "ts", "ts", ["rid"]).head()
    assert r.asof_rid == 7


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T12:00:00"), "p")], "user_id long, ts timestamp_ntz, name string"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:00:00"), 7)], "user_id long, ts timestamp_ntz, rid int"
    )
    r = asof_join(
        left, right, "user_id", "ts", "ts", ["rid"], tolerance_seconds=3600
    ).head()
    assert r.asof_rid is None  # 3h gap > 1h tolerance


def test_distributed_running_sum_equals_global_window(spark):
    """The two-pass prefix sum must equal a naive single-partition
    global window — including negative deltas, duplicate order keys,
    and partition counts that don't divide the data evenly."""
    import random

    from pyspark.sql import Window

    from cdc_practice_spark.operators.events_ops import distributed_running_sum

    rng = random.Random(7)
    rows = [(rng.randrange(0, 500), rng.choice([-1, 1])) for _ in range(4000)]
    df = spark.createDataFrame(rows, "ts long, delta int")
    w = Window.orderBy("ts", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = [
        (r.ts, r.delta, r.run)
        for r in df.withColumn("run", F.sum("delta").over(w))
        .orderBy("ts", "delta")
        .collect()
    ]
    for nparts in (1, 5, 32):
        got = [
            (r.ts, r.delta, r.running)
            for r in distributed_running_sum(
                df, ["ts", "delta"], "delta", n_partitions=nparts
            )
            .orderBy("ts", "delta")
            .collect()
        ]
        # duplicate (ts, delta) keys make per-row pairing ambiguous, but
        # the multiset of (key, running) triples is order-determined
        assert sorted(got) == sorted(want), f"n_partitions={nparts}"


def test_peak_concurrency_hand_case(spark):
    """Three overlapping intervals with a known peak of 3, and touching
    intervals (end == next start) counted as concurrent (closed
    intervals)."""
    from cdc_practice_spark.operators.events_ops import peak_concurrency

    iv = spark.createDataFrame(
        [(0, 10), (5, 15), (9, 12), (20, 30), (30, 40)],
        "session_start_us long, session_end_us long",
    )
    row = peak_concurrency(iv).collect()[0]
    assert row.peak_concurrency == 3
    assert row.first_peak_ts_us == 9
    assert row.n_sessions == 5
