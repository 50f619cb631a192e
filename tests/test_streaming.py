"""Structured Streaming shells: batch/stream equivalence, append+dedup
history sink, Debezium parse round-trip."""

from __future__ import annotations

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.cdc import build_current, change_feed_from_events
from cdc_practice_spark.queries.streaming_queries import (
    TMP_ROOT,
    replay_current_via_stream,
    split_events_into_files,
)
from cdc_practice_spark.session import load_table
from cdc_practice_spark.sources.kafka import (
    kafka_source_options,
    parse_debezium,
    to_debezium_json,
)
from cdc_practice_spark.streaming.pipeline import (
    read_events_stream,
    stream_history_append,
)


def test_stream_upsert_equals_batch_snapshot(spark, sf_dir):
    """The headline unification property: N micro-batch MERGE == one
    batch window pipeline."""
    streamed = replay_current_via_stream(spark, sf_dir, n_files=3)
    batch = build_current(
        change_feed_from_events(load_table(spark, sf_dir, "events"))
    )
    s = {
        r.original_id: (r.value, r.original_registered_at, r.last_updated_at)
        for r in streamed.collect()
    }
    b = {
        r.original_id: (r.value, r.original_registered_at, r.last_updated_at)
        for r in batch.collect()
    }
    assert s == b


def test_stream_history_append_dedup(spark, sf_dir):
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="hist_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=2)
    q = stream_history_append(
        read_events_stream(spark, src),
        out_dir=os.path.join(work, "hist"),
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    q.awaitTermination()
    hist = spark.read.parquet(os.path.join(work, "hist"))
    n_events = load_table(spark, sf_dir, "events").count()
    assert hist.count() == n_events
    assert hist.select("kafka_offset").distinct().count() == n_events


def test_stream_windowed_stats_equals_batch(spark, sf_dir):
    """Streaming event-time tumbling agg (complete mode, memory sink)
    equals the batch F.window aggregate — same transform, two runtimes."""
    from cdc_practice_spark.queries.analytics import event_time_tumbling_agg
    from cdc_practice_spark.streaming.pipeline import stream_windowed_stats

    work = tempfile.mkdtemp(prefix="wstats_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=2)
    q = (
        stream_windowed_stats(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("wstats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.window_start_us, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("wstats").collect()
    }
    batch = {
        (r.window_start_us, r.event_type): (r.n_events, r.sum_value)
        for r in event_time_tumbling_agg(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_checkpoint_resume_no_reprocessing(spark, sf_dir):
    """P11/exactly-once: restarting a stream from its checkpoint after
    new files arrive processes ONLY the new data — replayed history
    doesn't double-apply (the engine's answer to the reference's
    at-least-once + dedup-probe scheme, simple_kafka_etl.py:52,81-88)."""
    from cdc_practice_spark.streaming.pipeline import (
        load_current_state,
        stream_current_upsert,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="resume_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    staged = os.path.join(work, "staged")
    os.makedirs(src)
    os.makedirs(staged)
    split_events_into_files(spark, sf_dir, staged, n_files=4)
    chunks = sorted(os.listdir(staged))

    state_root = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")

    def run_once():
        q = stream_current_upsert(
            spark, read_events_stream(spark, src), state_root, ckpt
        )
        q.awaitTermination()

    # first run sees chunks 0-1
    for c in chunks[:2]:
        os.rename(os.path.join(staged, c), os.path.join(src, c))
    run_once()
    mid_keys = load_current_state(spark, state_root).count()

    # second run resumes from the checkpoint with chunks 2-3 added
    for c in chunks[2:]:
        os.rename(os.path.join(staged, c), os.path.join(src, c))
    run_once()

    final = load_current_state(spark, state_root)
    batch = build_current(
        change_feed_from_events(load_table(spark, sf_dir, "events"))
    )
    s = {r.original_id: (r.value, r.last_updated_at) for r in final.collect()}
    b = {r.original_id: (r.value, r.last_updated_at) for r in batch.collect()}
    assert s == b
    assert mid_keys > 0


def test_kill_mid_replay_then_resume_exactly_once(spark, sf_dir):
    """Durability depth (SURVEY §2.5.4): STOP the upsert stream in the
    middle of a multi-batch replay — after ≥1 committed micro-batch,
    before the rest — then resume from the checkpoint.  The final state
    must equal the batch snapshot exactly: no lost batch, no
    double-applied batch.  This is the delivery contract the reference
    approximates with auto-commit offsets + a dedup probe
    (simple_kafka_etl.py:52-55,81-88)."""
    import time

    from cdc_practice_spark.streaming.pipeline import (
        load_current_state,
        stream_current_upsert,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="kill_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=4)
    state_root = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")

    # run 1: one file per micro-batch; kill after the first batch commits
    q = stream_current_upsert(
        spark,
        read_events_stream(spark, src, max_files_per_trigger=1),
        state_root,
        ckpt,
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        done = [p for p in q.recentProgress if p["numInputRows"] > 0]
        if len(done) >= 1 and os.path.exists(os.path.join(state_root, "_MANIFEST")):
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    mid = load_current_state(spark, state_root).count()
    assert mid > 0  # genuinely mid-replay: some state, not all

    # run 2: resume from the same checkpoint to completion
    q2 = stream_current_upsert(
        spark,
        read_events_stream(spark, src, max_files_per_trigger=1),
        state_root,
        ckpt,
    )
    q2.awaitTermination()

    final = load_current_state(spark, state_root)
    batch = build_current(
        change_feed_from_events(load_table(spark, sf_dir, "events"))
    )
    s = {
        r.original_id: (r.value, r.original_registered_at, r.last_updated_at)
        for r in final.collect()
    }
    b = {
        r.original_id: (r.value, r.original_registered_at, r.last_updated_at)
        for r in batch.collect()
    }
    assert s == b


def test_kafka_source_options_mirror_reference():
    opts = kafka_source_options("broker:9092")
    assert opts["subscribe"] == "dbserver1.bankdb.bank_accounts"
    assert opts["startingOffsets"] == "earliest"  # simple_kafka_etl.py:52


def test_debezium_parse_roundtrip(spark):
    """feed → wire JSON → parse → feed preserves id/__deleted semantics
    including the string 'true'/'false' flag and tombstone skipping."""
    feed = change_feed_from_events(
        spark.createDataFrame(
            [
                (0, None, 1, "signup", 10.0, "{}"),
                (1, None, 1, "error", 10.0, "{}"),
            ],
            "event_id long, ts timestamp_ntz, user_id long, event_type string, "
            "value double, props string",
        )
    )
    wire = to_debezium_json(feed)
    kafka_like = wire.select(
        F.lit("dbserver1.bankdb.bank_accounts").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.col("value").cast("binary").alias("value"),
    )
    # add a tombstone record (null value)
    tomb = spark.createDataFrame(
        [("dbserver1.bankdb.bank_accounts", 0, 999, None)],
        "topic string, partition int, offset long, value binary",
    )
    parsed = parse_debezium(kafka_like.unionByName(tomb))
    rows = {r.kafka_offset: r for r in parsed.collect()}
    assert 999 not in rows  # tombstone skipped
    assert sorted(r["__deleted"] for r in rows.values()) == ["false", "true"]
    assert all(r.id == 1 for r in rows.values())


def test_stream_session_windows_equal_batch(spark, sf_dir):
    """Streaming session_window (complete mode over an availableNow file
    replay) produces the identical session set as the batch
    session_window_native query — one operator, two runtimes."""
    from cdc_practice_spark.queries.events_queries import session_window_native
    from cdc_practice_spark.streaming.pipeline import stream_session_windows

    work = tempfile.mkdtemp(prefix="sess_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=2)
    q = (
        stream_session_windows(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("sessw")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.user_id, r.window_start_us, r.window_end_us): r.n_events
        for r in spark.table("sessw").collect()
    }
    batch = {
        (r.user_id, r.window_start_us, r.window_end_us): r.n_events
        for r in session_window_native(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_bucketed_upsert_equals_batch_snapshot(spark, sf_dir):
    """The O(touched-buckets) incremental sink lands on EXACTLY the batch
    snapshot — same MERGE semantics, bucketed storage."""
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        stream_current_upsert_bucketed,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="bstate_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)
    q = stream_current_upsert_bucketed(
        spark,
        read_events_stream(spark, src, max_files_per_trigger=1),
        state_root=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        n_buckets=8,
    )
    q.awaitTermination()
    streamed = load_bucketed_state(spark, os.path.join(work, "state"))
    batch = build_current(
        change_feed_from_events(load_table(spark, sf_dir, "events"))
    )
    s = {
        r.original_id: (r.value, r.original_registered_at, r.last_updated_at)
        for r in streamed.collect()
    }
    b = {
        r.original_id: (r.value, r.original_registered_at, r.last_updated_at)
        for r in batch.collect()
    }
    assert s == b


def test_bucketed_upsert_skips_untouched_buckets(spark):
    """The incremental property itself — asserted against the DEFAULT
    stream_current_upsert entry point (which routes to the bucketed
    tier): an epoch whose keys all land in one bucket must leave every
    other bucket's files untouched (their manifest entries keep pointing
    at the older version directory)."""
    import json as _json

    from pyspark.sql import functions as F
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        read_events_stream,
        stream_current_upsert,  # DEFAULT entry point routes to the bucketed tier
    )

    n_buckets = 8
    # pick user ids by their bucket: xxhash64(uid) % 8
    hashes = {
        r.uid: r.b
        for r in spark.range(1, 200)
        .select(
            F.col("id").alias("uid"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(n_buckets)).cast("int").alias("b"),
        )
        .collect()
    }
    bucket_of = lambda uid: hashes[uid]  # noqa: E731
    users_a = [u for u, b in hashes.items() if b == 0][:3]   # epoch-0-only
    users_b = [u for u, b in hashes.items() if b == 1][:3]   # both epochs
    assert users_a and users_b

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="bskip_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)

    def write_chunk(idx, rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts long, user_id long, event_type string, "
                  "value double, props string"
        ).coalesce(1)
        part = os.path.join(work, f"_p{idx}")
        df.write.mode("overwrite").parquet(part)
        f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
        os.rename(os.path.join(part, f), os.path.join(src, f"chunk-{idx:03d}.parquet"))
        import shutil as _sh; import time as _t
        _sh.rmtree(part); _t.sleep(0.05)

    base_ns = 1_700_000_000_000_000_000
    rows0 = [
        (i, base_ns + i * 10**9, u, "signup", float(u), "{}")
        for i, u in enumerate(users_a + users_b)
    ]
    rows1 = [
        (100 + i, base_ns + (100 + i) * 10**9, u, "update", float(u) + 0.5, "{}")
        for i, u in enumerate(users_b)  # bucket 1 only
    ]
    write_chunk(0, rows0)
    write_chunk(1, rows1)

    state_root = os.path.join(work, "state")
    q = stream_current_upsert(
        spark,
        read_events_stream(spark, src, max_files_per_trigger=1),
        state_root=state_root,
        checkpoint_dir=os.path.join(work, "ckpt"),
        n_buckets=n_buckets,
    )
    q.awaitTermination()

    with open(os.path.join(state_root, "_MANIFEST")) as fh:
        manifest = _json.load(fh)
    # bucket 0 (users_a) untouched by epoch 1 → still the v0 directory;
    # bucket 1 rewritten by epoch 1 → newer version directory
    assert "/v0/" in manifest["0"] or manifest["0"].endswith("_bucket=0")
    v_of = lambda p: int(p.split("/v")[1].split("/")[0])  # noqa: E731
    assert v_of(manifest["0"]) == 0
    assert v_of(manifest["1"]) > 0

    final = {
        r.original_id: r.value
        for r in load_bucketed_state(spark, state_root).collect()
    }
    for u in users_a:
        assert final[u] == float(u)
    for u in users_b:
        assert final[u] == float(u) + 0.5


def test_state_store_reader_exposes_dedup_state(spark, sf_dir, tmp_path):
    """Spark 4 state data source: the dropDuplicates state behind the
    streaming corpus dedup is directly queryable — one state row per
    unique fingerprint, matching the batch distinct count.  This is the
    observability surface for debugging streaming state at scale
    (inspect skew, count keys) without touching the running query."""
    from pyspark.sql import functions as F

    from cdc_practice_spark.functions.text import fingerprint_sorted_tokens
    from cdc_practice_spark.session import load_table

    import shutil as _sh

    src = f"{sf_dir}/documents.parquet"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "in").mkdir()
    _sh.copy(src, str(tmp_path / "in" / "documents.parquet"))
    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .parquet(str(tmp_path / "in"))
        .withColumn("fingerprint", fingerprint_sorted_tokens(F.col("text")))
        .dropDuplicates(["fingerprint"])
        .select("fingerprint")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    q.start().awaitTermination()

    state = spark.read.format("statestore").load(ckpt)
    n_state = state.count()
    n_distinct = (
        load_table(spark, sf_dir, "documents")
        .select(fingerprint_sorted_tokens(F.col("text")).alias("fp"))
        .distinct()
        .count()
    )
    assert n_state == n_distinct
    # state keys ARE the fingerprints
    keys = {r.key.fingerprint for r in state.select("key").collect()}
    assert len(keys) == n_distinct


def test_stream_maintained_mv_equals_batch(spark, sf_dir):
    """The maintained-aggregate sink (stream_maintained_mv): after N
    micro-batches, the stored MV equals the from-scratch aggregate of
    the batch current snapshot — the streaming face of
    cdc/incremental.py's delta algebra."""
    from cdc_practice_spark.cdc.incremental import current_mv
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        load_mv,
        stream_maintained_mv,
    )

    work = tempfile.mkdtemp(prefix="mvsink_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)
    q = stream_maintained_mv(
        spark,
        read_events_stream(spark, src),
        state_root=os.path.join(work, "state"),
        mv_root=os.path.join(work, "mv"),
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    q.awaitTermination()
    got = {
        r.event_type: (r.n_rows, r.sum_cents)
        for r in load_mv(spark, os.path.join(work, "mv")).collect()
    }
    batch_current = build_current(
        change_feed_from_events(load_table(spark, sf_dir, "events"))
    )
    want = {
        r.event_type: (r.n_rows, r.sum_cents)
        for r in current_mv(batch_current, "event_type").collect()
    }
    assert got == want
    # the maintained snapshot agrees with the MV it claims to summarize
    state = load_bucketed_state(spark, os.path.join(work, "state"))
    assert state.count() == sum(n for n, _ in got.values())


def test_stream_maintained_mv_replay_does_not_double_apply(spark, sf_dir):
    """The MV crash-replay hazard, forced: after the run completes, the
    LAST epoch's checkpoint commit is deleted and the stream restarted —
    Spark re-invokes foreachBatch with the same epoch against state that
    already includes it.  The pre-epoch manifest/pointer snapshots must
    make the replay a no-op; without them the retractions read post-batch
    state and the MV double-applies."""
    from cdc_practice_spark.cdc.incremental import current_mv
    from cdc_practice_spark.streaming.pipeline import (
        load_mv,
        read_events_stream,
        stream_maintained_mv,
    )

    work = tempfile.mkdtemp(prefix="mvreplay_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)

    def run_once():
        q = stream_maintained_mv(
            spark,
            read_events_stream(spark, src),
            state_root=os.path.join(work, "state"),
            mv_root=os.path.join(work, "mv"),
            checkpoint_dir=os.path.join(work, "ckpt"),
        )
        q.awaitTermination()

    run_once()
    # forge the crash: last epoch applied but never committed
    commits = sorted(os.listdir(os.path.join(work, "ckpt", "commits")))
    last = [c for c in commits if not c.startswith(".")][-1]
    os.remove(os.path.join(work, "ckpt", "commits", last))
    crc = os.path.join(work, "ckpt", "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_once()

    got = {
        r.event_type: (r.n_rows, r.sum_cents)
        for r in load_mv(spark, os.path.join(work, "mv")).collect()
    }
    batch_current = build_current(
        change_feed_from_events(load_table(spark, sf_dir, "events"))
    )
    want = {
        r.event_type: (r.n_rows, r.sum_cents)
        for r in current_mv(batch_current, "event_type").collect()
    }
    assert got == want


def test_time_travel_and_vacuum(spark, sf_dir):
    """Retained per-epoch manifests give AS-OF reads without copying
    data; vacuum removes only unreferenced bucket dirs (a version dir can
    be HALF-live — deleting whole v{N} dirs would corrupt the table)."""
    from cdc_practice_spark.streaming.pipeline import (
        list_state_versions,
        load_bucketed_state,
        load_bucketed_state_at,
        read_events_stream,
        stream_current_upsert,
        vacuum_state,
    )

    work = tempfile.mkdtemp(prefix="ttvac_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)
    state_root = os.path.join(work, "state")
    q = stream_current_upsert(
        spark,
        read_events_stream(spark, src, max_files_per_trigger=1),
        state_root,
        os.path.join(work, "ckpt"),
    )
    q.awaitTermination()
    versions = list_state_versions(state_root)
    assert len(versions) == 3
    # AS-OF epoch 0 == replaying only the first chunk through the batch path
    first_file = sorted(
        f for f in os.listdir(src) if f.endswith(".parquet")
    )[0]
    ev0 = spark.read.parquet(os.path.join(src, first_file))
    from cdc_practice_spark.session import _events_ts_as_ntz

    ev0 = ev0.withColumn("ts", _events_ts_as_ntz(ev0))
    want0 = {
        r.original_id: r.value
        for r in build_current(change_feed_from_events(ev0)).collect()
    }
    got0 = {
        r.original_id: r.value
        for r in load_bucketed_state_at(spark, state_root, versions[0]).collect()
    }
    assert got0 == want0
    # vacuum keeping only the newest version: current state unchanged,
    # old manifests gone, old-only bucket dirs deleted
    current_before = {
        r.original_id: r.value
        for r in load_bucketed_state(spark, state_root).collect()
    }
    deleted = vacuum_state(state_root, keep_last=1)
    assert deleted  # something old was actually reclaimed
    current_after = {
        r.original_id: r.value
        for r in load_bucketed_state(spark, state_root).collect()
    }
    assert current_after == current_before
    assert list_state_versions(state_root) == versions[-1:]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        load_bucketed_state_at(spark, state_root, versions[0])


def test_stream_scd2_append_equals_batch(spark, sf_dir):
    """Streaming SCD2 sink (streaming/scd2_sink.py): after N micro-
    batches of close-and-append, the last-copy-wins read equals the
    batch builder over the full feed; compaction preserves it; a forged
    replay of the last epoch is a no-op."""
    from cdc_practice_spark.cdc.scd2 import build_scd2
    from cdc_practice_spark.streaming.scd2_sink import (
        compact_scd2,
        read_scd2,
        stream_scd2_append,
    )

    work = tempfile.mkdtemp(prefix="scd2sink_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)
    out_root = os.path.join(work, "dim")
    ckpt = os.path.join(work, "ckpt")

    def run_once():
        q = stream_scd2_append(
            spark, read_events_stream(spark, src), out_root, ckpt
        )
        q.awaitTermination()

    run_once()

    def snap(df):
        return sorted(
            (
                r.version_offset,
                r.original_id,
                r.value,
                r.valid_from,
                r.valid_to,
                r.is_current,
            )
            for r in df.collect()
        )

    want = snap(
        build_scd2(change_feed_from_events(load_table(spark, sf_dir, "events")))
    )
    assert snap(read_scd2(spark, out_root)) == want

    # forged crash-replay of the last epoch: delete its commit, rerun
    commits = sorted(
        c
        for c in os.listdir(os.path.join(ckpt, "commits"))
        if not c.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_once()
    assert snap(read_scd2(spark, out_root)) == want

    # compact: one epoch dir, same view, no dead copies
    compact_scd2(spark, out_root, epoch=99)
    dirs = [n for n in os.listdir(out_root) if n.startswith("e")]
    assert dirs == ["e99"]
    assert snap(read_scd2(spark, out_root)) == want
    assert spark.read.parquet(os.path.join(out_root, "e99")).count() == len(want)


def test_stream_maintained_distinct_mv_replay_does_not_double_apply(spark, sf_dir):
    """Same forced crash-replay hazard for the COUNT(DISTINCT) sink,
    which has THREE state pieces (snapshot manifest, support pointer,
    MV pointer): the last epoch's checkpoint commit is deleted and the
    stream restarted.  The pre-epoch snapshots of all three must make
    the replay idempotent — a support table read post-batch would
    double-count zero-crossings."""
    from cdc_practice_spark.cdc.incremental import distinct_mv, support_mv
    from cdc_practice_spark.streaming.pipeline import (
        load_distinct_mv,
        read_events_stream,
        stream_maintained_distinct_mv,
    )

    work = tempfile.mkdtemp(prefix="dmvreplay_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)

    def run_once():
        q = stream_maintained_distinct_mv(
            spark,
            read_events_stream(spark, src),
            state_root=os.path.join(work, "state"),
            sup_root=os.path.join(work, "sup"),
            mv_root=os.path.join(work, "mv"),
            checkpoint_dir=os.path.join(work, "ckpt"),
        )
        q.awaitTermination()

    run_once()
    commits = sorted(os.listdir(os.path.join(work, "ckpt", "commits")))
    last = [c for c in commits if not c.startswith(".")][-1]
    os.remove(os.path.join(work, "ckpt", "commits", last))
    crc = os.path.join(work, "ckpt", "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_once()

    got = {
        r.event_type: (r.n_rows, r.n_distinct)
        for r in load_distinct_mv(spark, os.path.join(work, "mv")).collect()
    }
    batch_current = build_current(
        change_feed_from_events(load_table(spark, sf_dir, "events"))
    )
    want = {
        r.event_type: (r.n_rows, r.n_distinct)
        for r in distinct_mv(batch_current, "event_type", "props_k").collect()
    }
    assert got == want
    # the maintained support table must also match from-scratch
    with open(os.path.join(work, "sup", "_SUP_POINTER")) as fh:
        sup = spark.read.parquet(fh.read().strip())
    got_sup = sorted(map(tuple, sup.collect()))
    want_sup = sorted(
        map(tuple, support_mv(batch_current, "event_type", "props_k").collect())
    )
    assert got_sup == want_sup


def test_stream_maintained_topk_mv_replay_does_not_double_apply(spark, sf_dir):
    """Forged crash-replay for the TOP-K sink: delete the last epoch's
    checkpoint commit, restart, and the maintained prefix must still
    equal the batch top-3 — a rescan against post-batch state would
    re-derive from already-applied rows."""
    from cdc_practice_spark.cdc.incremental import topk_mv
    from cdc_practice_spark.streaming.pipeline import (
        load_topk_mv,
        read_events_stream,
        stream_maintained_topk_mv,
    )

    work = tempfile.mkdtemp(prefix="tkreplay_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)

    def run_once():
        q = stream_maintained_topk_mv(
            spark,
            read_events_stream(spark, src),
            state_root=os.path.join(work, "state"),
            mv_root=os.path.join(work, "mv"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            k=3,
        )
        q.awaitTermination()

    run_once()
    commits = sorted(os.listdir(os.path.join(work, "ckpt", "commits")))
    last = [c for c in commits if not c.startswith(".")][-1]
    os.remove(os.path.join(work, "ckpt", "commits", last))
    crc = os.path.join(work, "ckpt", "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_once()

    def rows(df):
        return sorted(
            (r.event_type, tuple((e.nc, e.id) for e in r.topk), r.n_rows)
            for r in df.collect()
        )

    got = rows(load_topk_mv(spark, os.path.join(work, "mv")))
    batch_current = build_current(
        change_feed_from_events(load_table(spark, sf_dir, "events"))
    )
    want = rows(topk_mv(batch_current, "event_type", 3))
    assert got == want


def test_multitable_routing_one_pass_equals_per_table_batch(spark, sf_dir):
    """One wire stream carrying two tables' events, routed per micro-batch
    into per-table bucketed snapshots (stream_multitable_upsert): each
    table's streamed state must equal the batch snapshot built from ONLY
    that table's slice of the feed — routing must not leak rows across
    tables or drop any."""
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        stream_multitable_upsert,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="mtroute_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)
    routes = {
        # topic-per-table stand-in: route by the key's parity (every key's
        # events land wholly in one table, as a per-table topic would)
        "bank_accounts": F.col("original_id") % 2 == 0,
        "transactions": F.col("original_id") % 2 == 1,
    }
    roots = {t: os.path.join(work, f"state_{t}") for t in routes}
    q = stream_multitable_upsert(
        spark,
        read_events_stream(spark, src, max_files_per_trigger=1),
        routes=routes,
        state_roots=roots,
        checkpoint_dir=os.path.join(work, "ckpt"),
        n_buckets=8,
    )
    q.awaitTermination()
    full_feed = change_feed_from_events(load_table(spark, sf_dir, "events"))
    for table, pred in routes.items():
        streamed = {
            r.original_id: (r.value, r.original_registered_at)
            for r in load_bucketed_state(spark, roots[table]).collect()
        }
        batch = {
            r.original_id: (r.value, r.original_registered_at)
            for r in build_current(full_feed.filter(pred)).collect()
        }
        assert streamed == batch, table
    # disjoint routing: no key may appear in both states
    keys = [
        {r.original_id for r in load_bucketed_state(spark, roots[t]).collect()}
        for t in routes
    ]
    assert not (keys[0] & keys[1])


def _write_event_file(spark, path: str, rows, mtime: float) -> None:
    """One parquet file = one micro-batch (maxFilesPerTrigger=1); mtime
    staggering pins the FileStreamSource processing order."""
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    tmp = path + ".stage"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.replace(os.path.join(tmp, part), path + ".parquet")
    os.utime(path + ".parquet", (mtime, mtime))


def test_watermark_dedup_drops_redelivery_within_horizon(spark):
    """A Kafka redelivery (same coordinate triple, later micro-batch)
    arriving within the dedup watermark must be a history no-op — the
    watermark-BOUNDED state store gives the same answer as the unbounded
    one as long as redeliveries arrive inside the horizon (broker
    retention ≤ watermark, the contract documented in cdc/feed.py)."""
    import datetime as dt

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="wmdedup_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    h = dt.timedelta(hours=1)
    a = (1, t0, 101, "signup", 10.0, '{"k": 1}')
    b = (2, t0 + h, 102, "signup", 20.0, '{"k": 2}')
    c = (3, t0 + 2 * h, 103, "signup", 30.0, '{"k": 3}')
    base = time.time() - 100
    _write_event_file(spark, os.path.join(src, "f0"), [a, b], base)
    # batch 2: exact redelivery of `a` (same offset ⇒ same coordinates,
    # event time well inside the 1-day horizon) + one genuinely new event
    _write_event_file(spark, os.path.join(src, "f1"), [a, c], base + 10)
    q = stream_history_append(
        read_events_stream(spark, src),
        out_dir=os.path.join(work, "hist"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        dedup_watermark="1 day",
    )
    q.awaitTermination()
    hist = spark.read.parquet(os.path.join(work, "hist"))
    offsets = sorted(r.kafka_offset for r in hist.collect())
    assert offsets == [1, 2, 3]  # redelivered offset 1 appended once


def test_watermark_dedup_bounds_state_store(spark):
    """The point of dropDuplicatesWithinWatermark over plain
    dropDuplicates: coordinates older than the watermark are EVICTED from
    the state store, so state is O(events within horizon), not O(all
    events ever).  Three singleton batches spread over 6 h with a
    1-minute watermark must end with < 3 keys in the store (the
    unbounded variant keeps all 3 forever)."""
    import datetime as dt

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="wmstate_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=3)
    base = time.time() - 100
    for i, ts in enumerate([t0, t0 + h, t0 + 2 * h]):
        _write_event_file(
            spark,
            os.path.join(src, f"f{i}"),
            [(i + 1, ts, 200 + i, "signup", 1.0, '{"k": 1}')],
            base + 10 * i,
        )
    ckpt = os.path.join(work, "ckpt")
    q = stream_history_append(
        read_events_stream(spark, src),
        out_dir=os.path.join(work, "hist"),
        checkpoint_dir=ckpt,
        dedup_watermark="1 minute",
    )
    q.awaitTermination()
    # all three rows reach history (they are not duplicates) ...
    assert spark.read.parquet(os.path.join(work, "hist")).count() == 3
    # ... but the dedup store evicted the below-watermark coordinates:
    # after batch 3 commits, the watermark sits at t0+3h−1m, so only the
    # younger keys survive.  Bounded ⇒ strictly fewer than all 3.
    state = spark.read.format("statestore").load(ckpt)
    assert 1 <= state.count() < 3


def test_stream_heavy_hitters_guarantee_and_replay(spark, sf_dir):
    """Maintained Misra-Gries sink: after streaming N micro-batches, the
    ≤ k-row summary must (a) contain EVERY item whose true frequency
    exceeds n/(k+1) — the guarantee that survives the mergeable-summary
    rule across any batch split — and (b) never over-estimate a count.
    Then the crash-replay hazard is forced (last commit deleted, stream
    restarted): the pre-epoch pointer snapshot must make the re-applied
    epoch a no-op, byte-identical summary."""
    from cdc_practice_spark.streaming.pipeline import (
        load_heavy_hitters_mv,
        stream_heavy_hitters_mv,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="hh_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)
    k = 4

    def run_once():
        q = stream_heavy_hitters_mv(
            spark,
            read_events_stream(spark, src),
            mv_root=os.path.join(work, "mv"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            col="event_type",
            k=k,
        )
        q.awaitTermination()

    run_once()
    counters, n = load_heavy_hitters_mv(spark, os.path.join(work, "mv"))
    events = load_table(spark, sf_dir, "events")
    true_counts = {
        r.event_type: r.c
        for r in events.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    assert n == sum(true_counts.values())
    assert len(counters) <= k
    heavy = {i for i, c in true_counts.items() if c > n / (k + 1)}
    assert heavy <= set(counters)  # guarantee: heavy items always survive
    for item, w in counters.items():
        assert w <= true_counts[item]  # weights under-estimate, never over
        assert true_counts[item] - w <= n / (k + 1) + len(true_counts)

    # forge the crash: last epoch applied but never committed
    commits = sorted(os.listdir(os.path.join(work, "ckpt", "commits")))
    last = [c for c in commits if not c.startswith(".")][-1]
    os.remove(os.path.join(work, "ckpt", "commits", last))
    crc = os.path.join(work, "ckpt", "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_once()
    replayed, n2 = load_heavy_hitters_mv(spark, os.path.join(work, "mv"))
    assert (replayed, n2) == (counters, n)


def test_streaming_heavy_hitters_query_nonempty(spark, sf_dir):
    """The registered oracle query must emit a NONEMPTY heavy-hitter set
    (r6 defect: the k=3 / n/4 threshold matched zero rows at every SF,
    so the oracle hash compared two empty frames and proved nothing).
    With k=9 the fixture's 5 near-uniform event types all clear n/10,
    and every one must be in the maintained MG summary."""
    from cdc_practice_spark.queries.streaming_queries import (
        streaming_heavy_hitters,
    )

    rows = streaming_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert all(r["in_summary"] for r in rows)


def test_mv_loader_fallback_schemas_parameterized(spark, tmp_path):
    """r6 VERDICT nit: load_mv / load_distinct_mv hardcoded their
    never-written-MV empty fallback schemas to the default
    `event_type string` even though the SINKS are parameterized.  The
    loaders must now derive the empty frame from (group_col,
    group_type), matching load_topk_mv."""
    from cdc_practice_spark.streaming.pipeline import (
        load_distinct_mv,
        load_mv,
    )

    empty = load_mv(spark, str(tmp_path / "nomv"), "user_id", "bigint")
    assert empty.schema.simpleString() == (
        "struct<user_id:bigint,n_rows:bigint,sum_cents:bigint>"
    )
    assert empty.count() == 0
    empty_d = load_distinct_mv(spark, str(tmp_path / "nomv2"), "region", "int")
    assert empty_d.schema.simpleString() == (
        "struct<region:int,n_rows:bigint,n_distinct:bigint>"
    )
    assert empty_d.count() == 0


def test_txn_gated_stream_buffers_across_epochs(spark):
    """The transaction gate under trigger boundaries that cut INSIDE
    transactions: txns of 5 by event_id div 5, feed truncated at 12
    (txn 2 torn), chunked 0-7 / 8-12 so txn 1 SPANS the epoch boundary.
    Epoch 0 may release only txn 0 (txn 1 incomplete -> buffered);
    epoch 1 completes txn 1 and releases it; txn 2 stays pending
    forever.  Final state equals the batch apply over complete txns,
    and the pending buffer holds exactly the torn txn's rows."""
    import json as _json

    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        load_pending_txn_buffer,
        stream_current_upsert_txn_gated,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="txngate_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)

    base_ns = 1_700_000_000_000_000_000
    all_rows = [
        (i, base_ns + i * 10**9, (i % 3) + 1, "click", float(i), "{}")
        for i in range(15)
    ]
    truncated = [r for r in all_rows if r[0] <= 12]

    def write_chunk(idx, rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts long, user_id long, event_type string, "
                  "value double, props string"
        ).coalesce(1)
        part = os.path.join(work, f"_p{idx}")
        df.write.mode("overwrite").parquet(part)
        f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
        os.rename(os.path.join(part, f), os.path.join(src, f"chunk-{idx:03d}.parquet"))
        import shutil as _sh; import time as _t
        _sh.rmtree(part); _t.sleep(0.05)

    write_chunk(0, [r for r in truncated if r[0] <= 7])
    write_chunk(1, [r for r in truncated if r[0] > 7])

    declared = spark.createDataFrame(
        [(r[0],) for r in all_rows], "kafka_offset long"
    )
    state_root = os.path.join(work, "state")
    from cdc_practice_spark.streaming.pipeline import read_events_stream

    q = stream_current_upsert_txn_gated(
        spark,
        read_events_stream(spark, src, max_files_per_trigger=1),
        state_root=state_root,
        checkpoint_dir=os.path.join(work, "ckpt"),
        declared_offsets=declared,
        txn_size=5,
        n_buckets=8,
    )
    q.awaitTermination()

    # final state == batch snapshot over the COMPLETE txns only (0-9)
    from cdc_practice_spark.session import _events_ts_as_ntz

    complete_df = spark.createDataFrame(
        [r for r in all_rows if r[0] <= 9],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    complete_df = complete_df.withColumn("ts", _events_ts_as_ntz(complete_df))
    want = {
        (r.original_id, r.value)
        for r in build_current(change_feed_from_events(complete_df)).collect()
    }
    got = {
        (r.original_id, r.value)
        for r in load_bucketed_state(spark, state_root).collect()
    }
    assert got == want
    # the torn txn's captured rows are exactly what's pending
    pending_ids = sorted(
        r.kafka_offset for r in load_pending_txn_buffer(spark, state_root).collect()
    )
    assert pending_ids == [10, 11, 12]
    # the pending pointer carries the release frontier (txn 2)
    with open(os.path.join(state_root, "_PENDING")) as fh:
        assert _json.loads(fh.read())["frontier"] == 2
    # superseded pending buffers are collected (r10 — r9 ADVICE): at
    # most the pinned + current buffer survive, and only the newest
    # epoch's pre-pin — a long-running gated stream stays bounded
    pend_dirs = [d for d in os.listdir(state_root) if d.startswith("pend_v")]
    pins = [d for d in os.listdir(state_root) if d.startswith("_PENDING.pre_v")]
    assert len(pend_dirs) <= 2, pend_dirs
    assert len(pins) <= 1, pins


def test_txn_gated_kill_resume_exactly_once(spark, sf_dir):
    """Kill-resume for the TXN-GATED sink: stop after >=1 committed
    micro-batch, resume from the checkpoint to completion.  Both the
    final state AND the pending buffer must equal an uninterrupted
    gated run's — the pre-epoch-pinned pending pointer is what makes a
    replayed epoch recompute the identical released set, and this is
    the test that would catch it regressing."""
    import time as _time

    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        load_pending_txn_buffer,
        stream_current_upsert_txn_gated,
    )

    events = load_table(spark, sf_dir, "events")
    max_off = events.agg(F.max("event_id").alias("m")).head().m
    w = int(max_off * 0.8) + 2
    declared = events.select(F.col("event_id").alias("kafka_offset"))

    os.makedirs(TMP_ROOT, exist_ok=True)

    def run_gated(work, kill_after_first):
        src = os.path.join(work, "src")
        if not os.path.isdir(src):
            os.makedirs(src)
            split_events_into_files(
                spark, sf_dir, src, n_files=4, max_event_id=w
            )
        state_root = os.path.join(work, "state")
        q = stream_current_upsert_txn_gated(
            spark,
            read_events_stream(spark, src, max_files_per_trigger=1),
            state_root=state_root,
            checkpoint_dir=os.path.join(work, "ckpt"),
            declared_offsets=declared,
        )
        if kill_after_first:
            deadline = _time.time() + 120
            while _time.time() < deadline:
                done = [p for p in q.recentProgress if p["numInputRows"] > 0]
                if done and os.path.exists(
                    os.path.join(state_root, "_MANIFEST")
                ):
                    break
                _time.sleep(0.2)
            q.stop()
        q.awaitTermination()
        return state_root

    killed = tempfile.mkdtemp(prefix="txnkill_", dir=TMP_ROOT)
    state_root = run_gated(killed, kill_after_first=True)
    assert load_bucketed_state(spark, state_root).count() > 0  # mid-replay
    state_root = run_gated(killed, kill_after_first=False)  # resume

    clean = tempfile.mkdtemp(prefix="txnclean_", dir=TMP_ROOT)
    clean_root = run_gated(clean, kill_after_first=False)

    key = lambda df: {  # noqa: E731
        r.original_id: (r.value, r.original_registered_at, r.last_updated_at)
        for r in df.collect()
    }
    assert key(load_bucketed_state(spark, state_root)) == key(
        load_bucketed_state(spark, clean_root)
    )
    pend = lambda root: sorted(  # noqa: E731
        r.kafka_offset
        for r in load_pending_txn_buffer(spark, root).collect()
    )
    assert pend(state_root) == pend(clean_root)
    assert len(pend(state_root)) == 2  # the torn txn's captured rows


def test_bootstrapped_stream_equals_direct_build(spark):
    """Streaming bootstrap (seeded state + overlapping tail) lands on
    the direct full-feed snapshot; re-seeding an existing state is a
    no-op (a resumed stream must never clobber progressed state); the
    seed is time-travelable as manifest epoch -1."""
    import json as _json

    from cdc_practice_spark.streaming.pipeline import (
        list_state_versions,
        load_bucketed_state,
        read_events_stream,
        seed_bucketed_state,
        stream_current_upsert_bootstrapped,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="bootstrap_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)

    base_ns = 1_700_000_000_000_000_000
    rows = [
        (i, base_ns + i * 10**9, (i % 4) + 1,
         "error" if i in (3, 9) else "click", float(i), "{}")
        for i in range(12)
    ]
    from cdc_practice_spark.session import _events_ts_as_ntz

    events_raw = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, "
              "value double, props string"
    )
    events = events_raw.withColumn("ts", _events_ts_as_ntz(events_raw))
    feed = change_feed_from_events(events)
    s_off = 6
    snap = build_current(feed.filter(F.col("kafka_offset") <= s_off))

    # tail re-read from offset 4 — rows 4-6 overlap the snapshot
    def write_chunk(idx, lo, hi):
        df = events_raw.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") <= hi)
        ).coalesce(1)
        part = os.path.join(work, f"_p{idx}")
        df.write.mode("overwrite").parquet(part)
        f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
        os.rename(os.path.join(part, f), os.path.join(src, f"chunk-{idx:03d}.parquet"))
        import shutil as _sh; import time as _t
        _sh.rmtree(part); _t.sleep(0.05)

    write_chunk(0, 4, 8)
    write_chunk(1, 9, 11)

    state_root = os.path.join(work, "state")
    q = stream_current_upsert_bootstrapped(
        spark,
        read_events_stream(spark, src, max_files_per_trigger=1),
        state_root=state_root,
        checkpoint_dir=os.path.join(work, "ckpt"),
        snapshot=snap,
        snapshot_offset=s_off,
        n_buckets=8,
    )
    q.awaitTermination()

    key = lambda df: {  # noqa: E731
        r.original_id: (r.value, r.original_registered_at, r.last_updated_at)
        for r in df.collect()
    }
    assert key(load_bucketed_state(spark, state_root)) == key(
        build_current(feed)
    )
    # seed epoch -1 retained for time travel; re-seed refuses (manifest
    # unchanged)
    assert list_state_versions(state_root)[0] == -1
    with open(os.path.join(state_root, "_MANIFEST")) as fh:
        before = _json.load(fh)
    seed_bucketed_state(spark, snap, state_root, s_off, n_buckets=8)
    with open(os.path.join(state_root, "_MANIFEST")) as fh:
        assert _json.load(fh) == before


def test_txn_gate_multipartition_splits_txn_across_epochs(spark):
    """The generalized gate (stream_txn_gated_feed) over a 2-partition
    feed with partition-local offsets and carried txn ids: txn 1 SPANS
    the epoch boundary (2 of its 3 events in chunk 0), txn 3 is torn by
    the capture cut.  Epoch 0 may release only txn 0; epoch 1 completes
    txn 1 and releases 1 and 2 in commit order; txn 3 stays pending.
    No global offset sequence exists anywhere in this feed."""
    import json as _json
    from datetime import datetime

    from cdc_practice_spark.queries.streaming_queries import (
        MP_FEED_FILE_SCHEMA,
    )
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        load_pending_txn_buffer,
        stream_txn_gated_feed,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="mp_gate_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)

    # (arrival, user): txn = arrival div 3; users 1,3 -> partition 0,
    # users 2,4 -> partition 1, offsets dense per partition
    arrivals = [
        (0, 1), (1, 2), (2, 1), (3, 2), (4, 3), (5, 4),
        (6, 1), (7, 3), (8, 2), (9, 4), (10, 1),
    ]
    part_of = {1: 0, 2: 1, 3: 0, 4: 1}
    local = {0: 0, 1: 0}
    rows = []
    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    for g, u in arrivals:
        p = part_of[u]
        rows.append(
            ("t", p, local[p], u, "click", float(g), ts(g), "false",
             None, g // 3, g)
        )
        local[p] += 1

    def write_chunk(idx, chunk_rows):
        df = spark.createDataFrame(chunk_rows, MP_FEED_FILE_SCHEMA).coalesce(1)
        part = os.path.join(work, f"_p{idx}")
        df.write.mode("overwrite").parquet(part)
        f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
        os.rename(os.path.join(part, f), os.path.join(src, f"chunk-{idx:03d}.parquet"))
        import shutil as _sh
        import time as _t
        _sh.rmtree(part)
        _t.sleep(0.05)

    write_chunk(0, [r for r in rows if r[10] <= 4])   # splits txn 1
    write_chunk(1, [r for r in rows if r[10] > 4])

    declared = spark.createDataFrame(
        [(0, 3), (1, 3), (2, 3), (3, 3)], "txn long, declared_c long"
    )
    state_root = os.path.join(work, "state")
    stream = (
        spark.readStream.schema(MP_FEED_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_txn_gated_feed(
        spark,
        stream,
        state_root=state_root,
        checkpoint_dir=os.path.join(work, "ckpt"),
        declared_txn_counts=declared,
        txn_col="txn",
        n_buckets=8,
    )
    q.awaitTermination()

    got = {
        r.original_id: r.value
        for r in load_bucketed_state(spark, state_root).collect()
    }
    # released txns 0-2 = arrivals 0..8: latest per user by arrival
    assert got == {1: 6.0, 2: 8.0, 3: 7.0, 4: 5.0}
    pending = sorted(
        r._arrival for r in load_pending_txn_buffer(spark, state_root).collect()
    )
    assert pending == [9, 10]  # the torn txn only
    with open(os.path.join(state_root, "_PENDING")) as fh:
        assert _json.loads(fh.read())["frontier"] == 3


def test_txn_gate_holds_undeclared_txns(spark):
    """Review r10: a transaction whose END record has not reached the
    manifest is UNKNOWABLE, not complete — its observed events must
    hold pending, and the frontier must stop at it (a declared-side
    left join silently released such partial txns).  Also covers the
    empty-manifest start (no END records at all): everything pends."""
    from cdc_practice_spark.queries.streaming_queries import (
        MP_FEED_FILE_SCHEMA,
    )
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        load_pending_txn_buffer,
        stream_txn_gated_feed,
    )
    from datetime import datetime

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="undeclared_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    # txn 0 = arrivals 0-2 (declared), txn 1 = arrivals 3-4 (NO END
    # record yet), single partition, one chunk
    rows = [
        ("t", 0, i, (i % 2) + 1, "click", float(i), ts(i), "false",
         None, i // 3, i)
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, MP_FEED_FILE_SCHEMA).coalesce(1)
    part = os.path.join(work, "_p0")
    df.write.mode("overwrite").parquet(part)
    f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
    os.rename(os.path.join(part, f), os.path.join(src, "chunk-000.parquet"))

    declared = spark.createDataFrame([(0, 3)], "txn long, declared_c long")
    state_root = os.path.join(work, "state")
    q = stream_txn_gated_feed(
        spark,
        spark.readStream.schema(MP_FEED_FILE_SCHEMA).parquet(src),
        state_root=state_root,
        checkpoint_dir=os.path.join(work, "ckpt"),
        declared_txn_counts=declared,
        txn_col="txn",
        n_buckets=4,
    )
    q.awaitTermination()
    got = {
        r.original_id: r.value
        for r in load_bucketed_state(spark, state_root).collect()
    }
    assert got == {1: 2.0, 2: 1.0}  # txn 0 only (arrivals 0-2)
    pending = sorted(
        r._arrival
        for r in load_pending_txn_buffer(spark, state_root).collect()
    )
    assert pending == [3, 4]  # the undeclared txn held, not released

    # empty manifest: the stream starts and holds EVERYTHING
    work2 = tempfile.mkdtemp(prefix="emptyman_", dir=TMP_ROOT)
    src2 = os.path.join(work2, "src")
    os.makedirs(src2)
    import shutil as _sh
    _sh.copy(os.path.join(src, "chunk-000.parquet"),
             os.path.join(src2, "chunk-000.parquet"))
    q2 = stream_txn_gated_feed(
        spark,
        spark.readStream.schema(MP_FEED_FILE_SCHEMA).parquet(src2),
        state_root=os.path.join(work2, "state"),
        checkpoint_dir=os.path.join(work2, "ckpt"),
        declared_txn_counts=spark.createDataFrame(
            [], "txn long, declared_c long"
        ),
        txn_col="txn",
        n_buckets=4,
    )
    q2.awaitTermination()
    assert load_bucketed_state(spark, os.path.join(work2, "state")).count() == 0
    assert (
        load_pending_txn_buffer(spark, os.path.join(work2, "state")).count()
        == 5
    )


def test_vacuum_reclaims_superseded_tombstone_dirs(spark, tmp_path):
    """r11: the delete-frontier sidecar participates in vacuum — a
    tombstone bucket dir superseded by a later epoch's rewrite is
    reclaimed, the referenced one survives, and the resurrection guard
    still holds after the vacuum."""
    from datetime import datetime

    from cdc_practice_spark.streaming.pipeline import (
        apply_bucketed_merge,
        load_bucketed_state,
        load_bucketed_tombstones,
        vacuum_state,
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
    # epoch 0 deletes key 1; epoch 1 carries a NEW delete (key 2), so
    # the frontier ADVANCES and the sidecar is rewritten at v1_tombs —
    # a delete-free epoch would deliberately skip the rewrite (the
    # pay-as-you-go rule) and keep v0_tombs referenced
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
        n_buckets=2,
    )
    apply_bucketed_merge(
        spark,
        feed(
            [
                (3, ts(3), 1, "signup", 11.0, "{}"),  # re-insert key 1
                (4, ts(4), 2, "error", 0.0, "{}"),  # DELETE key 2
            ]
        ),
        root,
        epoch_id=1,
        n_buckets=2,
    )
    assert os.path.isdir(os.path.join(root, "v0_tombs"))
    deleted = vacuum_state(root, keep_last=0)
    # every v0 tombstone bucket was rewritten at epoch 1 → v0_tombs is
    # unreferenced and reclaimed; the referenced v1 ones survive
    assert any("v0_tombs" in p for p in deleted), deleted
    assert not any("v1_tombs" in p for p in deleted), deleted
    tombs = {
        (r.original_id, r.last_offset)
        for r in load_bucketed_tombstones(spark, root, [0, 1]).collect()
    }
    assert tombs == {(1, 1), (2, 4)}
    # guard still live post-vacuum: replaying key 2's pre-delete INSERT
    # must not resurrect it, and key 1's old INSERT must not regress it
    apply_bucketed_merge(
        spark,
        feed(
            [
                (0, ts(0), 1, "signup", 10.0, "{}"),
                (2, ts(2), 2, "signup", 20.0, "{}"),
            ]
        ),
        root,
        epoch_id=2,
        n_buckets=2,
    )
    out = {
        r.original_id: r.value
        for r in load_bucketed_state(spark, root).collect()
    }
    assert out == {1: 11.0}
    # the delete-free epoch paid nothing: no v2 tombstone sidecar
    assert not os.path.isdir(os.path.join(root, "v2_tombs"))
