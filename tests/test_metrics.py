"""observe() metrics (P12 — the reference's processed_count, engine-side)."""

from __future__ import annotations

from cdc_practice_spark.cdc import change_feed_from_events
from cdc_practice_spark.session import load_table
from cdc_practice_spark.streaming.metrics import observed_feed


def test_observed_feed_metrics(spark, sf_dir):
    feed = change_feed_from_events(load_table(spark, sf_dir, "events"))
    df, obs = observed_feed(feed)
    n = df.count()  # action → metrics materialize alongside it
    m = obs.get
    assert m["processed_count"] == n
    assert 0 < m["delete_count"] < n  # 'error' events exist
    assert m["max_offset"] == n - 1  # event_ids are the dense offsets
    exact_keys = feed.select("original_id").distinct().count()
    assert abs(m["approx_keys"] - exact_keys) / exact_keys < 0.15
