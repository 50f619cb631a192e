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
