"""Property-based CDC semantics: random event sequences vs a pure-Python
reference model of the DAG's apply loop (simple_kafka_etl.py:65-188).

The model IS the reference's algorithm — a dict replayed in offset
order — so agreement here means the set-oriented window pipelines
implement exactly the row-at-a-time semantics, for arbitrary interleavings
(delete-first keys, re-inserts, single-event keys, duplicate values...).

Spark jobs are slow per example, so examples are few but each is a
whole randomized feed (many keys × many interleavings per example).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_practice_spark.cdc import (
    build_current,
    build_history,
    change_feed_from_events,
)

EVENT_TYPES = ["signup", "click", "view", "purchase", "error"]  # error == delete

feeds = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),  # user key (few keys → collisions)
        st.sampled_from(EVENT_TYPES),
        st.floats(min_value=0, max_value=100, allow_nan=False).map(
            lambda x: round(x, 2)
        ),
    ),
    min_size=1,
    max_size=120,
)


def reference_model(rows):
    """The reference's per-row apply loop, verbatim semantics."""
    current: dict[int, dict] = {}
    history = []
    for offset, (uid, etype, value, ts) in enumerate(rows):
        deleted = etype == "error"
        if deleted:
            change_type = "DELETE"
            # history DELETE row keeps last known registered_at (lookup
            # into current — simple_kafka_etl.py:141-144)
            reg = current[uid]["registered_at"] if uid in current else None
            current.pop(uid, None)
        elif uid not in current:  # existence probe → INSERT
            change_type = "INSERT"
            reg = ts
            current[uid] = {"value": value, "registered_at": ts, "updated": ts}
        else:  # UPDATE preserves registered_at
            change_type = "UPDATE"
            reg = current[uid]["registered_at"]
            current[uid].update({"value": value, "updated": ts})
        history.append((offset, uid, change_type, reg))
    return history, current


@pytest.mark.slow
@given(feeds)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cdc_matches_reference_model(spark, rows):
    base = datetime(2024, 1, 1)
    stamped = [
        (uid, etype, value, base + timedelta(minutes=i))
        for i, (uid, etype, value) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        [
            (i, ts, uid, etype, value, "{}")
            for i, (uid, etype, value, ts) in enumerate(stamped)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    feed = change_feed_from_events(df)

    model_history, model_current = reference_model(stamped)

    hist = {
        r.kafka_offset: (r.original_id, r.change_type, r.original_registered_at)
        for r in build_history(feed).collect()
    }
    assert len(hist) == len(model_history)
    for offset, uid, ctype, reg in model_history:
        got = hist[offset]
        assert got == (uid, ctype, reg), (
            f"offset {offset}: engine {got} != model {(uid, ctype, reg)}"
        )

    cur = {
        r.original_id: (r.value, r.original_registered_at, r.last_updated_at)
        for r in build_current(feed).collect()
    }
    assert set(cur) == set(model_current)
    for uid, m in model_current.items():
        assert cur[uid] == (m["value"], m["registered_at"], m["updated"]), uid
