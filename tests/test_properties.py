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


def test_merge_batch_reapply_is_idempotent(spark):
    """The retry-safety contract every foreachBatch sink (versioned AND
    bucketed) relies on: re-applying an already-applied micro-batch to
    the resulting state is a no-op.  Covers all three event kinds
    (insert, update, delete) and the registered_at carry rule."""
    from datetime import datetime

    from cdc_practice_spark.cdc.feed import change_feed_from_events
    from cdc_practice_spark.streaming.upsert import empty_state, merge_batch

    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (0, ts(0), 1, "signup", 10.0, "{}"),
        (1, ts(1), 2, "signup", 20.0, "{}"),
        (2, ts(2), 1, "update", 11.0, "{}"),
        (3, ts(3), 2, "error", 0.0, "{}"),     # delete user 2
        (4, ts(4), 3, "signup", 30.0, "{}"),
    ]
    batch = change_feed_from_events(
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
    )
    once = merge_batch(empty_state(spark), batch)
    snap = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    first = snap(once)
    twice = merge_batch(once, batch)
    assert snap(twice) == first


def test_merge_batch_drops_stale_redelivery(spark):
    """The offset guard (r10 — r9 ADVICE): a coordinate redelivery that
    reaches merge_batch in a LATER epoch, after its offset was already
    applied, must not regress the key — and a key whose batch rows are
    ALL stale must stay in state (the anti-join keys on the post-guard
    feed, not the raw batch)."""
    from datetime import datetime

    from cdc_practice_spark.cdc.feed import change_feed_from_events
    from cdc_practice_spark.streaming.upsert import empty_state, merge_batch

    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    epoch0 = change_feed_from_events(
        spark.createDataFrame(
            [
                (0, ts(0), 1, "signup", 10.0, "{}"),
                (1, ts(1), 1, "update", 11.0, "{}"),
                (2, ts(2), 2, "signup", 20.0, "{}"),
            ],
            schema,
        )
    )
    state = merge_batch(empty_state(spark), epoch0)
    # later epoch: offset 0 redelivered (stale for key 1) alongside a
    # genuinely new event for key 2; key 1 has ONLY stale rows
    epoch1 = change_feed_from_events(
        spark.createDataFrame(
            [
                (0, ts(0), 1, "signup", 10.0, "{}"),  # stale redelivery
                (3, ts(3), 2, "update", 21.0, "{}"),
            ],
            schema,
        )
    )
    out = {
        r.original_id: (r.value, r.last_offset)
        for r in merge_batch(state, epoch1).collect()
    }
    assert out[1] == (11.0, 1)  # not regressed to the offset-0 value
    assert out[2] == (21.0, 3)  # the genuinely new event applied


def test_merge_batch_tombstone_frontier_blocks_resurrection(spark):
    """The deleted-key frontier (r11 — r10 ADVICE): a DELETEd key has
    no live state row, so the live-row offset guard alone lets a
    partial redelivery carrying the key's old INSERT but not its later
    DELETE resurrect it.  With the persisted tombstone frontier the
    stale INSERT is dropped; a genuinely NEW re-insert (offset past the
    delete) still applies."""
    from datetime import datetime

    from cdc_practice_spark.cdc.feed import change_feed_from_events
    from cdc_practice_spark.streaming.upsert import (
        empty_state,
        merge_batch,
        updated_tombstones,
    )

    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    epoch0 = change_feed_from_events(
        spark.createDataFrame(
            [
                (0, ts(0), 1, "signup", 10.0, "{}"),
                (1, ts(1), 1, "error", 0.0, "{}"),  # DELETE key 1
                (2, ts(2), 2, "signup", 20.0, "{}"),
            ],
            schema,
        )
    )
    state = merge_batch(empty_state(spark), epoch0)
    tombs = updated_tombstones(None, epoch0)
    assert {(r.original_id, r.last_offset) for r in tombs.collect()} == {(1, 1)}
    assert 1 not in {r.original_id for r in state.collect()}

    # partial redelivery: key 1's old INSERT (offset 0) WITHOUT its
    # later DELETE (offset 1) — the exact slipped-past-dedup threat
    replay = change_feed_from_events(
        spark.createDataFrame([(0, ts(0), 1, "signup", 10.0, "{}")], schema)
    )
    # without the tombstone frontier the key is resurrected (the hole)
    assert 1 in {
        r.original_id for r in merge_batch(state, replay).collect()
    }
    # with it, the stale INSERT is dropped
    guarded = merge_batch(state, replay, tombstones=tombs)
    assert 1 not in {r.original_id for r in guarded.collect()}
    # replays never advance the frontier (monotone)
    tombs2 = updated_tombstones(tombs, replay)
    assert {(r.original_id, r.last_offset) for r in tombs2.collect()} == {(1, 1)}

    # a genuinely new re-insert at offset 3 (> delete offset 1) applies
    reinsert = change_feed_from_events(
        spark.createDataFrame([(3, ts(3), 1, "signup", 12.0, "{}")], schema)
    )
    out = {
        r.original_id: (r.value, r.last_offset)
        for r in merge_batch(state, reinsert, tombstones=tombs).collect()
    }
    assert out[1] == (12.0, 3)


def test_bucketed_sink_persists_tombstone_frontier(spark, tmp_path):
    """End-to-end through apply_bucketed_merge: the delete frontier is
    persisted under manifest keys ``t{b}``, survives epochs, and blocks
    a later-epoch resurrection; state readers never see sidecar rows."""
    from datetime import datetime

    from cdc_practice_spark.cdc.feed import change_feed_from_events
    from cdc_practice_spark.streaming.pipeline import (
        apply_bucketed_merge,
        load_bucketed_state,
        load_bucketed_tombstones,
    )

    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    root = str(tmp_path / "state")
    feed = lambda rows: change_feed_from_events(  # noqa: E731
        spark.createDataFrame(rows, schema)
    )
    apply_bucketed_merge(
        spark,
        feed(
            [
                (0, ts(0), 1, "signup", 10.0, "{}"),
                (1, ts(1), 1, "error", 0.0, "{}"),
                (2, ts(2), 2, "signup", 20.0, "{}"),
            ]
        ),
        root,
        epoch_id=0,
        n_buckets=4,
    )
    assert {r.original_id for r in load_bucketed_state(spark, root).collect()} == {2}
    tombs = load_bucketed_tombstones(spark, root, list(range(4)))
    assert {(r.original_id, r.last_offset) for r in tombs.collect()} == {(1, 1)}
    # epoch 1: the partial redelivery — deleted key must NOT resurrect
    apply_bucketed_merge(
        spark,
        feed([(0, ts(0), 1, "signup", 10.0, "{}")]),
        root,
        epoch_id=1,
        n_buckets=4,
    )
    assert {r.original_id for r in load_bucketed_state(spark, root).collect()} == {2}
    # epoch 2: a real re-insert past the delete offset applies
    apply_bucketed_merge(
        spark,
        feed([(3, ts(3), 1, "signup", 12.0, "{}")]),
        root,
        epoch_id=2,
        n_buckets=4,
    )
    out = {
        r.original_id: r.value
        for r in load_bucketed_state(spark, root).collect()
    }
    assert out == {1: 12.0, 2: 20.0}


def test_bmp_roundtrip_randomized():
    """Property: synth_bmp → decode_bmp_numpy is pixel-exact for ANY
    (asset_id, width, height) — every padding/stride class, ids beyond
    the byte range."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from cdc_practice_spark.operators import multimodal as M

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=0, max_value=10**12),
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=1, max_value=9),
    )
    def check(asset_id, w, h):
        dw, dh, arr = M.decode_bmp_numpy(M.synth_bmp(asset_id, w, h))
        assert (dw, dh) == (w, h)
        ys, xs = np.mgrid[0:h, 0:w]
        expect = np.stack(
            [(asset_id + 7 * xs + 13 * ys + 31 * c) % 256 for c in range(3)],
            axis=2,
        ).astype(np.uint8)
        assert np.array_equal(arr, expect)

    check()


@pytest.mark.slow
@given(feeds)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_matches_version_model(spark, rows):
    """SCD2 (cdc/scd2.py) vs a pure-Python version model: every live
    event opens a version; ANY next event of the key closes it; deletes
    open nothing; the last open version per key is current."""
    from cdc_practice_spark.cdc.scd2 import build_scd2

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
    versions: list[list] = []
    open_v: dict[int, int] = {}
    for offset, (uid, etype, value, ts) in enumerate(stamped):
        if uid in open_v:
            versions[open_v[uid]][3] = ts
            del open_v[uid]
        if etype != "error":
            versions.append([uid, value, ts, None, offset])
            open_v[uid] = len(versions) - 1
    model = {
        v[4]: (v[0], v[1], v[2], v[3], v[3] is None) for v in versions
    }
    got = {
        r.version_offset: (
            r.original_id,
            r.value,
            r.valid_from,
            r.valid_to,
            r.is_current,
        )
        for r in build_scd2(change_feed_from_events(df)).collect()
    }
    assert got == model


@pytest.mark.slow
@given(feeds, st.integers(min_value=0, max_value=100))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_mv_matches_scratch_random_split(spark, rows, pct):
    """delta_apply_mv == from-scratch recompute for ANY feed and ANY
    split point (cdc/incremental.py delta algebra)."""
    from pyspark.sql import functions as F

    from cdc_practice_spark.cdc.incremental import current_mv, delta_apply_mv

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
    t = (len(stamped) * pct) // 100 - 1  # -1 → everything in the delta
    base_feed = feed.filter(F.col("kafka_offset") <= t)
    base_current = build_current(base_feed)
    maintained = delta_apply_mv(
        base_current,
        current_mv(base_current, "event_type"),
        feed.filter(F.col("kafka_offset") > t),
        "event_type",
    )
    snap = lambda df_: sorted(  # noqa: E731
        (r.event_type, r.n_rows, r.sum_cents)
        for r in df_.select("event_type", "n_rows", "sum_cents").collect()
    )
    assert snap(maintained) == snap(current_mv(build_current(feed), "event_type"))


@pytest.mark.slow
@given(feeds, st.integers(min_value=0, max_value=100), st.integers(min_value=0, max_value=40))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_snapshot_handoff_matches_direct_for_random_cuts(spark, rows, s_pct, g_back):
    """Bootstrap handoff == direct build for ARBITRARY snapshot points
    and overlap depths: snapshot at S (any percentile of the feed, incl.
    0 = empty snapshot and 100 = everything), tail re-read from
    G = S - g_back (overlap of any depth, incl. the whole feed).  The
    hand fixture covers the named edges; this covers the interleavings
    nobody thought to name."""
    from cdc_practice_spark.cdc import snapshot_handoff_current

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, base + timedelta(minutes=i), uid, etype, value, "{}")
            for i, (uid, etype, value) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    feed = change_feed_from_events(df)
    max_off = len(rows) - 1
    s_off = (max_off * s_pct) // 100
    g_off = max(-1, s_off - g_back)

    snap = build_current(feed.filter(feed["kafka_offset"] <= s_off))
    tail = feed.filter(feed["kafka_offset"] > g_off)
    got = {
        r.original_id: (r.value, r.props_k, r.original_registered_at,
                        r.last_updated_at)
        for r in snapshot_handoff_current(snap, tail, s_off).collect()
    }
    want = {
        r.original_id: (r.value, r.props_k, r.original_registered_at,
                        r.last_updated_at)
        for r in build_current(feed).collect()
    }
    assert got == want


@pytest.mark.slow
@given(
    feeds,
    st.integers(min_value=1, max_value=7),   # txn size
    st.integers(min_value=0, max_value=100), # observed fraction
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_txn_gate_matches_model_for_random_truncation(spark, rows, txn_size, w_pct):
    """The txn gate == a two-line Python model for arbitrary feeds, txn
    sizes, and truncation points: complete txns are exactly those whose
    observed distinct-event count equals the declared count."""
    from cdc_practice_spark.cdc import filter_complete_txns
    from pyspark.sql import functions as F

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, base + timedelta(minutes=i), uid, etype, value, "{}")
            for i, (uid, etype, value) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    w = ((len(rows) - 1) * w_pct) // 100
    observed = df.filter(F.col("event_id") <= w)
    kept = filter_complete_txns(
        observed, df, F.expr(f"event_id div {txn_size}"),
        distinct_on=["event_id"],
    )
    got = sorted(r.event_id for r in kept.collect())

    declared = {}
    for i in range(len(rows)):
        declared[i // txn_size] = declared.get(i // txn_size, 0) + 1
    obs = {}
    for i in range(w + 1):
        obs[i // txn_size] = obs.get(i // txn_size, 0) + 1
    complete = {t for t, c in obs.items() if c == declared[t]}
    want = sorted(i for i in range(w + 1) if i // txn_size in complete)
    assert got == want


def test_merge_batch_carry_col_resets_at_reinsert(spark):
    """The carry rule (streaming DROP evolution): a retired column's
    value persists through null-carrying events within a live row's
    lineage, falls back to state across batches, and RESETS at
    re-insert — including the delete-and-reinsert-in-one-batch case
    that makes naive last-non-null carry chunking-dependent."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from cdc_practice_spark.streaming.upsert import empty_state, merge_batch

    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731

    def feed(rows):
        # rows: (offset, user, value_carried, deleted)
        return spark.createDataFrame(
            [
                (o, 0, "t", u, float("nan") if v is None else v, ts(o), d)
                for (o, u, v, d) in rows
            ],
            "kafka_offset long, kafka_partition int, kafka_topic string, "
            "original_id long, value_carried double, "
            "registered_at timestamp_ntz, __deleted string",
        ).withColumn(
            "value_carried",
            F.when(F.isnan("value_carried"), None).otherwise(
                F.col("value_carried")
            ),
        )

    st = empty_state(
        spark, payload_schema="value_carried double"
    )
    # epoch 0: insert with value, then a null-carrying update
    st = merge_batch(
        st,
        feed([(0, 1, 10.0, "false"), (1, 1, None, "false")]),
        payload_cols=["value_carried"],
        carry_cols=("value_carried",),
    )
    got = {r.original_id: r.value_carried for r in st.collect()}
    assert got == {1: 10.0}  # carried through the null update
    # epoch 1: only null-carrying updates -> falls back to state
    st = merge_batch(
        st,
        feed([(2, 1, None, "false")]),
        payload_cols=["value_carried"],
        carry_cols=("value_carried",),
    )
    got = {r.original_id: r.value_carried for r in st.collect()}
    assert got == {1: 10.0}
    # epoch 2: delete + re-insert (null value) IN ONE BATCH -> the
    # re-inserted row must NOT inherit the dead row's 10.0
    st = merge_batch(
        st,
        feed([(3, 1, None, "true"), (4, 1, None, "false")]),
        payload_cols=["value_carried"],
        carry_cols=("value_carried",),
    )
    got = {r.original_id: r.value_carried for r in st.collect()}
    assert got == {1: None}
    # epoch 3: a post-reset non-null value takes over again
    st = merge_batch(
        st,
        feed([(5, 1, 42.0, "false"), (6, 1, None, "false")]),
        payload_cols=["value_carried"],
        carry_cols=("value_carried",),
    )
    got = {r.original_id: r.value_carried for r in st.collect()}
    assert got == {1: 42.0}


def test_bucketed_merge_epoch_replay_self_overwrite(spark, tmp_path):
    """r11 ADVICE: a crash BETWEEN the manifest swap and the streaming
    checkpoint commit replays the same epoch with the manifest already
    pointing touched buckets (and their tombstone sidecars) INTO the
    v{epoch} dirs the replay overwrites.  mode('overwrite') deletes the
    whole parent dir before the write job reads its inputs — a
    read-leaf-overwrite-parent primitive demonstrably fails with
    FAILED_READ_FILE.FILE_NOT_EXIST on this Spark (the self-overwrite
    check only matches exact paths); whether the full merge plan hits
    it depends on plan/scan timing, so the eager localCheckpoint pin
    makes the replay contract unconditional instead of
    plan-shape-dependent.  The replay must succeed and leave state AND
    frontier intact."""
    from datetime import datetime

    from cdc_practice_spark.cdc.feed import change_feed_from_events
    from cdc_practice_spark.streaming.pipeline import (
        apply_bucketed_merge,
        load_bucketed_state,
        load_bucketed_tombstones,
    )

    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    root = str(tmp_path / "state")
    feed = lambda rows: change_feed_from_events(  # noqa: E731
        spark.createDataFrame(rows, schema)
    )
    epoch0 = [
        (0, ts(0), 1, "signup", 10.0, "{}"),
        (1, ts(1), 1, "error", 0.0, "{}"),  # DELETE key 1
        (2, ts(2), 2, "signup", 20.0, "{}"),
    ]
    apply_bucketed_merge(spark, feed(epoch0), root, epoch_id=0, n_buckets=4)
    # delete-bearing epoch 1 — commits manifest entries t{b} → v1_tombs
    epoch1 = [
        (3, ts(3), 3, "signup", 30.0, "{}"),
        (4, ts(4), 2, "error", 0.0, "{}"),  # DELETE key 2
    ]
    apply_bucketed_merge(spark, feed(epoch1), root, epoch_id=1, n_buckets=4)
    want_state = {
        (r.original_id, r.value, r.last_offset)
        for r in load_bucketed_state(spark, root).collect()
    }
    want_tombs = {
        (r.original_id, r.last_offset)
        for r in load_bucketed_tombstones(spark, root, list(range(4))).collect()
    }
    assert want_tombs == {(1, 1), (2, 4)}

    # THE replay: same epoch id, same batch, manifest already swapped —
    # inputs for the touched buckets now live under v1 / v1_tombs
    apply_bucketed_merge(spark, feed(epoch1), root, epoch_id=1, n_buckets=4)
    got_state = {
        (r.original_id, r.value, r.last_offset)
        for r in load_bucketed_state(spark, root).collect()
    }
    got_tombs = {
        (r.original_id, r.last_offset)
        for r in load_bucketed_tombstones(spark, root, list(range(4))).collect()
    }
    assert got_state == want_state
    assert got_tombs == want_tombs
