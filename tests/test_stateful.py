"""applyInPandasWithState: incremental per-user state equals the batch
recomputation after a multi-batch streaming replay."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.cdc import change_feed_from_events
from cdc_practice_spark.queries.streaming_queries import (
    TMP_ROOT,
    split_events_into_files,
)
from cdc_practice_spark.session import load_table
from cdc_practice_spark.streaming.pipeline import read_events_stream
from cdc_practice_spark.streaming.stateful import running_user_state


def test_stateful_running_user_state(spark, sf_dir):
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="state_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)

    feed = change_feed_from_events(read_events_stream(spark, src))
    q = (
        running_user_state(feed)
        .writeStream.format("memory")
        .queryName("user_state")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode emits one row per key per batch → keep the final one
    # (highest n_events per key is the last emission)
    got = {
        r.user_id: r
        for r in spark.table("user_state")
        .orderBy("n_events")
        .collect()
    }

    batch_feed = change_feed_from_events(load_table(spark, sf_dir, "events"))
    expected = {
        r.user_id: r
        for r in batch_feed.groupBy(F.col("original_id").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max_by("value", "kafka_offset").alias("last_value"),
            F.max("kafka_offset").alias("last_offset"),
            F.min(F.unix_micros(F.col("registered_at").cast("timestamp"))).alias(
                "first_seen_us"
            ),
        )
        .collect()
    }
    assert set(got) == set(expected)
    for uid, e in expected.items():
        g = got[uid]
        assert g.n_events == e.n_events, uid
        assert g.last_value == e.last_value, uid
        assert g.last_offset == e.last_offset, uid
        assert g.first_seen_us == e.first_seen_us, uid


def test_session_close_on_event_time_timeout(spark, sf_dir):
    """EventTimeTimeout state expiry: sessions whose end + gap falls
    behind the final watermark must be EMITTED and their state removed;
    the emitted set equals batch gap-sessionization restricted to
    watermark-closeable sessions."""
    from cdc_practice_spark.streaming.stateful import session_close_on_timeout

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="sesstmo_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)

    q = (
        session_close_on_timeout(read_events_stream(spark, src), gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_tmo")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.user_id, r.session_start_us, r.session_end_us): r.n_events
        for r in spark.table("sess_tmo").collect()
    }
    assert streamed, "no sessions closed — timeout path never fired"

    # batch model: 30-min-gap sessions per user over event time
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    rows = sorted(
        ((r.user_id, r.us) for r in ev.collect()), key=lambda t: (t[0], t[1])
    )
    gap_us = 30 * 60 * 1_000_000
    sessions: list[tuple[int, int, int, int]] = []
    cur = None
    for uid, us in rows:
        if cur is None or uid != cur[0] or us - cur[2] > gap_us:
            if cur is not None:
                sessions.append(cur)
            cur = (uid, us, us, 1)
        else:
            cur = (uid, cur[1], us, cur[3] + 1)
    if cur is not None:
        sessions.append(cur)
    max_us = max(us for _, us in rows)
    # the final no-data batch advances the watermark to max event time;
    # only sessions strictly older than (max - gap) are guaranteed closed
    closeable = {
        (u, s, e): n for u, s, e, n in sessions if e + gap_us < max_us
    }
    for k, n in closeable.items():
        assert streamed.get(k) == n, f"session {k} missing/miscounted"
    # nothing emitted that the batch model doesn't have
    all_sessions = {(u, s, e): n for u, s, e, n in sessions}
    for k, n in streamed.items():
        assert all_sessions.get(k) == n, f"spurious session {k}"
