"""Unit-level golden tests for the CDC semantics contract (SURVEY.md §2.5).

The reference's only test is an eyeball-verified e2e shell script
(test-etl-pipeline.sh); these tests encode its scenario — insert, update,
delete, re-insert, replay — as asserted expectations on a hand-crafted
change feed.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cdc_practice_spark.cdc import (
    build_current,
    build_history,
    build_user_stats,
    change_feed_from_events,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def feed(spark):
    """Key 1: insert→update→delete→re-insert→update.  Key 2: single
    insert.  Key 3: starts with a delete (partial capture).  Mirrors the
    reference e2e workload (test-etl-pipeline.sh:166-184) plus the
    re-insert edge the shell script never covers."""
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (0, ts("2024-01-01T00:00:00"), 1, "signup", 10.0, '{"k": 1}'),
        (1, ts("2024-01-01T01:00:00"), 1, "purchase", 11.0, '{"k": 2}'),
        (2, ts("2024-01-01T02:00:00"), 1, "error", 11.0, '{"k": 3}'),
        (3, ts("2024-01-01T03:00:00"), 1, "click", 12.0, '{"k": 4}'),
        (4, ts("2024-01-01T04:00:00"), 1, "view", 13.0, '{"k": 5}'),
        (5, ts("2024-01-01T00:30:00"), 2, "signup", 20.0, '{"k": 6}'),
        (6, ts("2024-01-01T00:45:00"), 3, "error", 30.0, '{"k": 7}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    return change_feed_from_events(df)


def test_change_types(feed):
    hist = build_history(feed)
    got = {
        (r.kafka_offset): r.change_type
        for r in hist.select("kafka_offset", "change_type").collect()
    }
    assert got == {
        0: "INSERT",   # first event for key 1
        1: "UPDATE",
        2: "DELETE",   # event_type 'error' → __deleted='true'
        3: "INSERT",   # re-insert after delete
        4: "UPDATE",
        5: "INSERT",   # first event for key 2
        6: "DELETE",   # delete-first key: still a DELETE row in history
    }


def test_registered_at_carry_forward(feed):
    """original_registered_at = ts of the key's most recent INSERT
    (immutable across UPDATEs, reset on re-insert —
    simple_kafka_etl.py:133-138,173)."""
    hist = build_history(feed)
    got = {r.kafka_offset: r.original_registered_at for r in hist.collect()}
    assert got[0] == ts("2024-01-01T00:00:00")
    assert got[1] == ts("2024-01-01T00:00:00")  # UPDATE preserves
    assert got[2] == ts("2024-01-01T00:00:00")  # DELETE history row keeps last known
    assert got[3] == ts("2024-01-01T03:00:00")  # re-insert resets
    assert got[4] == ts("2024-01-01T03:00:00")
    assert got[6] is None  # delete with no prior insert → unknown


def test_double_delete_does_not_leak_registered_at(spark):
    """A DELETE of an already-deleted key finds no row to look up — the
    reference probe misses, so original_registered_at is NULL, NOT the
    ts of an INSERT that a prior DELETE already erased (the hypothesis
    suite found this edge: signup→error→error)."""
    rows = [
        (0, ts("2024-01-01T00:00:00"), 1, "signup", 10.0, "{}"),
        (1, ts("2024-01-01T01:00:00"), 1, "error", 10.0, "{}"),
        (2, ts("2024-01-01T02:00:00"), 1, "error", 10.0, "{}"),
        (3, ts("2024-01-01T03:00:00"), 1, "signup", 11.0, "{}"),
        (4, ts("2024-01-01T04:00:00"), 1, "error", 11.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    hist = build_history(change_feed_from_events(df))
    got = {r.kafka_offset: r.original_registered_at for r in hist.collect()}
    assert got[0] == ts("2024-01-01T00:00:00")
    assert got[1] == ts("2024-01-01T00:00:00")  # live delete keeps last known
    assert got[2] is None                        # dead delete: probe misses
    assert got[3] == ts("2024-01-01T03:00:00")  # re-insert resets
    assert got[4] == ts("2024-01-01T03:00:00")  # live delete again


def test_current_snapshot(feed):
    cur = build_current(feed)
    rows = {r.original_id: r for r in cur.collect()}
    # key 1 live with the re-inserted lineage; key 2 live; key 3 deleted
    assert set(rows) == {1, 2}
    assert rows[1].value == 13.0
    assert rows[1].original_registered_at == ts("2024-01-01T03:00:00")
    assert rows[1].last_updated_at == ts("2024-01-01T04:00:00")
    assert rows[2].value == 20.0


def test_replay_idempotency(feed, spark):
    """Replaying the feed (union with itself) must be a no-op after the
    coordinate dedup (P3 — simple_kafka_etl.py:81-88,119-126)."""
    hist_once = build_history(feed)
    replayed = feed.unionAll(feed).dropDuplicates(
        ["kafka_topic", "kafka_partition", "kafka_offset"]
    )
    hist_twice = build_history(replayed)
    # collect-and-compare instead of exceptAll: the two frames share
    # lineage (replayed = feed ∪ feed), and exceptAll over self-referent
    # window plans hits a Spark attribute-resolution bug
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND).
    once = sorted(map(tuple, hist_once.collect()))
    twice = sorted(map(tuple, hist_twice.collect()))
    assert once == twice


def test_user_stats(feed):
    stats = {r.user_id: r for r in build_user_stats(build_history(feed)).collect()}
    assert stats[1].n_changes == 5
    assert stats[1].n_inserts == 2
    assert stats[1].n_updates == 2
    assert stats[1].n_deletes == 1
    assert stats[2].n_changes == 1
    assert stats[3].n_deletes == 1


def test_deleted_is_string(feed):
    """__deleted must stay a STRING 'true'/'false' — reference wire
    format (simple_kafka_etl.py:76,114), not boolean."""
    field = dict((f.name, f.dataType.simpleString()) for f in feed.schema.fields)
    assert field["__deleted"] == "string"


def test_malformed_payload_isolated(spark):
    """P11 error isolation: a malformed JSON payload must not abort the
    pipeline (the reference catches per-message errors and continues,
    simple_kafka_etl.py:185-188).  from_json yields NULL for the broken
    field; every other column of the row survives."""
    rows = [
        (0, ts("2024-01-01T00:00:00"), 1, "signup", 1.0, '{"k": 5}'),
        (1, ts("2024-01-01T01:00:00"), 1, "click", 2.0, "{not json!!"),
        (2, ts("2024-01-01T02:00:00"), 1, "view", 3.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    feed = change_feed_from_events(df)
    got = {r.kafka_offset: r.props_k for r in feed.collect()}
    assert got == {0: 5, 1: None, 2: None}
    # and the CDC pipeline still derives correct change types
    hist = build_history(feed)
    assert [r.change_type for r in hist.orderBy("kafka_offset").collect()] == [
        "INSERT",
        "UPDATE",
        "UPDATE",
    ]


def test_tombstone_filter(spark):
    """Null payloads (Kafka tombstones) are dropped (P1 —
    simple_kafka_etl.py:68-70)."""
    from cdc_practice_spark.cdc.feed import change_feed

    rows = [
        Row(kafka_topic="t", kafka_partition=0, kafka_offset=0, op_payload=Row(id=1)),
        Row(kafka_topic="t", kafka_partition=0, kafka_offset=1, op_payload=None),
        Row(kafka_topic="t", kafka_partition=0, kafka_offset=2, op_payload=Row(id=1)),
        Row(kafka_topic="t", kafka_partition=0, kafka_offset=2, op_payload=Row(id=1)),
    ]
    df = spark.createDataFrame(rows)
    out = change_feed(df)
    # tombstone (offset 1) dropped; redelivered offset 2 deduped → 0 and 2
    assert sorted(r.kafka_offset for r in out.collect()) == [0, 2]


def test_scd2_versions_and_delete_gap(feed):
    """SCD2 (cdc/scd2.py): live events open versions, the NEXT event of
    the key closes them (half-open), deletes open nothing — a probe in
    the delete→re-insert gap must miss."""
    from cdc_practice_spark.cdc.scd2 import asof_join_scd2, build_scd2

    dim = build_scd2(feed)
    rows = {r.version_offset: r for r in dim.collect()}
    # key 1: events 0(ins) 1(upd) 2(del) 3(re-ins) 4(upd) → 4 versions
    # key 2: one current version; key 3: delete-only → none
    assert sorted(rows) == [0, 1, 3, 4, 5]
    assert rows[0].valid_to == ts("2024-01-01T01:00:00") and not rows[0].is_current
    assert rows[1].valid_to == ts("2024-01-01T02:00:00")  # closed by the DELETE
    assert rows[4].valid_to is None and rows[4].is_current
    assert rows[5].is_current  # key 2 single insert
    # intervals per key are disjoint: probe each boundary + the gap
    probes = feed.sparkSession.createDataFrame(
        [
            (100, 1, ts("2024-01-01T01:30:00")),  # inside version 1
            (101, 1, ts("2024-01-01T02:30:00")),  # delete gap → miss
            (102, 1, ts("2024-01-01T03:00:00")),  # re-insert boundary (inclusive)
            (103, 3, ts("2024-01-01T05:00:00")),  # delete-only key → miss
        ],
        "probe_id long, user_id long, probe_ts timestamp_ntz",
    )
    j = asof_join_scd2(probes, dim, fact_key="user_id", fact_ts="probe_ts")
    got = {r.probe_id: r.version_offset for r in j.collect()}
    assert got == {100: 1, 101: None, 102: 3, 103: None}
    # one output row per probe (no amplification)
    assert j.count() == 4


# --------------------------------------------------------- r9 cont.: txn gate


def _txn_events(spark):
    """23 events, txns of 5 by event_id div 5 — txn 4 (ids 20-22) is
    short by construction (the manifest declares 3 events for it)."""
    rows = [
        (i, ts(f"2024-01-01T{i:02d}:00:00"), (i % 4) + 1,
         "error" if i % 7 == 3 else "click", float(i), '{"k": %d}' % i)
        for i in range(23)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )


def test_complete_txn_gate_drops_torn_transaction(spark):
    """Truncating the feed at offset 17 cuts txn 3 (ids 15-19) mid-way:
    the gate must keep txns 0-2 whole, drop ALL of txn 3's captured rows
    (15,16,17 — a torn transaction), and never invent txn 4."""
    from cdc_practice_spark.cdc import filter_complete_txns

    events = _txn_events(spark)
    trunc = events.filter(F.col("event_id") <= 17)
    txn = F.expr("event_id div 5")
    kept = filter_complete_txns(trunc, events, txn)
    ids = sorted(r.event_id for r in kept.collect())
    assert ids == list(range(15))


def test_complete_txn_gate_counts_not_prefix(spark):
    """The rule is count-equality, not offset-prefix: with txn 2's rows
    observed but txn 1 missing one row (a mid-feed gap — the
    multi-partition interleave case), txn 2 passes and txn 1 fails."""
    from cdc_practice_spark.cdc import filter_complete_txns

    events = _txn_events(spark)
    gappy = events.filter(
        (F.col("event_id") <= 14) & (F.col("event_id") != 7)
    )
    txn = F.expr("event_id div 5")
    kept = filter_complete_txns(gappy, events, txn)
    ids = sorted(r.event_id for r in kept.collect())
    assert ids == [0, 1, 2, 3, 4, 10, 11, 12, 13, 14]


def test_txn_gate_snapshot_equals_manual_filter(spark):
    """End-to-end: the snapshot over the gated feed is row-identical to
    building the snapshot over a manually complete-txn-filtered feed —
    no user's state ever reflects a partial transaction."""
    from cdc_practice_spark.cdc import build_current, filter_complete_txns

    events = _txn_events(spark)
    trunc = events.filter(F.col("event_id") <= 17)
    gated = filter_complete_txns(trunc, events, F.expr("event_id div 5"))
    got = build_current(change_feed_from_events(gated))
    want = build_current(
        change_feed_from_events(events.filter(F.col("event_id") <= 14))
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


# ----------------------------------------------- r9 cont.: snapshot handoff


def _handoff_events(spark):
    rows = [
        # key 1: insert, update pre-S; update post-S (carry-seed case)
        (0, ts("2024-01-01T00:00:00"), 1, "signup", 10.0, '{"k": 1}'),
        (2, ts("2024-01-01T02:00:00"), 1, "click", 11.0, '{"k": 2}'),
        (8, ts("2024-01-01T08:00:00"), 1, "view", 12.0, '{"k": 3}'),
        # key 2: pre-S insert, untouched by the tail
        (1, ts("2024-01-01T01:00:00"), 2, "signup", 20.0, '{"k": 4}'),
        # key 3: insert+delete pre-S, BOTH inside the overlap re-read —
        # naive overlay of the overlap would resurrect it
        (3, ts("2024-01-01T03:00:00"), 3, "signup", 30.0, '{"k": 5}'),
        (4, ts("2024-01-01T04:00:00"), 3, "error", 30.0, '{"k": 6}'),
        # key 4: live at S, deleted by the tail
        (5, ts("2024-01-01T05:00:00"), 4, "signup", 40.0, '{"k": 7}'),
        (7, ts("2024-01-01T07:00:00"), 4, "error", 40.0, '{"k": 8}'),
        # key 6: live at S, delete + re-insert in the tail (carry resets)
        (6, ts("2024-01-01T06:00:00"), 6, "signup", 60.0, '{"k": 9}'),
        (10, ts("2024-01-01T10:00:00"), 6, "error", 60.0, '{"k": 10}'),
        (11, ts("2024-01-01T11:00:00"), 6, "signup", 61.0, '{"k": 11}'),
        # key 5: born in the tail
        (9, ts("2024-01-01T09:00:00"), 5, "signup", 50.0, '{"k": 12}'),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )


def test_snapshot_handoff_equals_direct_build(spark):
    """Snapshot at S=6 + overlapping tail from G=2: the merged snapshot
    is row-identical to the one-pass build over the full feed."""
    from cdc_practice_spark.cdc import build_current, snapshot_handoff_current

    feed = change_feed_from_events(_handoff_events(spark))
    snap = build_current(feed.filter(F.col("kafka_offset") <= 6))
    tail = feed.filter(F.col("kafka_offset") > 2)
    got = snapshot_handoff_current(snap, tail, 6)
    want = build_current(feed)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_snapshot_handoff_edge_semantics(spark):
    """The specific failure modes the merge exists to prevent."""
    from cdc_practice_spark.cdc import build_current, snapshot_handoff_current

    feed = change_feed_from_events(_handoff_events(spark))
    snap = build_current(feed.filter(F.col("kafka_offset") <= 6))
    tail = feed.filter(F.col("kafka_offset") > 2)
    rows = {
        r.original_id: r
        for r in snapshot_handoff_current(snap, tail, 6).collect()
    }
    # no resurrection: key 3's overlap-replayed insert stays dead
    assert 3 not in rows
    # tail delete applies: key 4 gone
    assert 4 not in rows
    # carry SEEDED from the snapshot: key 1's original_registered_at is
    # its pre-S insert time, its value/last_updated from the tail update
    assert rows[1].original_registered_at == ts("2024-01-01T00:00:00")
    assert rows[1].value == 12.0
    assert rows[1].last_updated_at == ts("2024-01-01T08:00:00")
    # untouched key passes through byte-identical (incl. props_k)
    assert rows[2].value == 20.0
    assert rows[2].props_k == 4
    assert rows[2].last_updated_at == ts("2024-01-01T01:00:00")
    # re-insert in the tail RESETS the carry
    assert rows[6].original_registered_at == ts("2024-01-01T11:00:00")
    # born-in-tail key classified INSERT with its own carry
    assert rows[5].original_registered_at == ts("2024-01-01T09:00:00")


def test_complete_txn_gate_survives_redelivery(spark):
    """At-least-once bus (review finding): a redelivered event must not
    make a committed transaction read as over-complete and vanish —
    with distinct_on, txns 0-2 all release despite event 7 arriving
    twice, and the duplicate row itself passes through (downstream P3
    dedup owns row-level dedup, the gate owns txn completeness)."""
    from cdc_practice_spark.cdc import filter_complete_txns

    events = _txn_events(spark)
    dup = events.filter(F.col("event_id") == 7)
    observed = events.filter(F.col("event_id") <= 14).unionAll(dup)
    txn = F.expr("event_id div 5")
    kept = filter_complete_txns(observed, events, txn, distinct_on=["event_id"])
    ids = sorted(r.event_id for r in kept.collect())
    assert ids == sorted(list(range(15)) + [7])
    # the raw-count default WOULD drop txn 1 here (observed 6 != 5
    # declared) — pin the contrast so distinct_on stays load-bearing
    kept_raw = filter_complete_txns(observed, events, txn)
    ids_raw = sorted(r.event_id for r in kept_raw.collect())
    assert [i for i in ids_raw if 5 <= i <= 9] == []
