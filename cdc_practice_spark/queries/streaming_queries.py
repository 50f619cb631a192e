"""Streaming queries — the reference's actual runtime mode (Kafka →
consumer → warehouse), exercised through Structured Streaming with an
availableNow file source standing in for the topic.

``streaming_replay_current`` replays the events fixture through the
foreachBatch MERGE upsert in N micro-batches and must land on EXACTLY
the state the batch window pipeline computes — checked against the same
DuckDB oracle as ``cdc_current_snapshot``.  This is the batch/stream
unification proof.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.queries.cdc_queries import cdc_current_snapshot
from cdc_practice_spark.queries.registry import ORACLES, register
from cdc_practice_spark.session import load_table
from cdc_practice_spark.streaming.pipeline import (
    load_current_state,
    read_events_stream,
    stream_current_upsert_full_rewrite,
)

TMP_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".tmp")


def split_events_into_files(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_files: int = 4,
    max_event_id: int | None = None,
    min_event_id: int = 0,
) -> None:
    """Split the events fixture into n single-file parquet chunks by
    event_id range, written in replay order (monotone mtimes so the file
    source's batch order matches offset order).  ``max_event_id`` /
    ``min_event_id`` bound the feed first (capture-cut / tail-re-read
    simulations)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")  # keep ts as raw nanos
    if max_event_id is not None:
        raw = raw.filter(F.col("event_id") <= max_event_id)
    if min_event_id:
        raw = raw.filter(F.col("event_id") >= min_event_id)
    n = raw.count()
    step = (n + n_files - 1) // n_files
    lo = min_event_id
    n_written = 0
    for i in range(n_files):
        # last chunk is OPEN-ENDED (r10 — r9 ADVICE): the range chunking
        # assumes dense event_ids from lo; with sparse ids, rows past
        # lo + n_files*step would otherwise fall outside every chunk and
        # silently vanish from the replay.  The written counts are
        # asserted to sum to n below, so any future gap fails loudly.
        chunk = raw.filter(F.col("event_id") >= lo + i * step)
        if i < n_files - 1:
            chunk = chunk.filter(F.col("event_id") < lo + (i + 1) * step)
        chunk = chunk.coalesce(1)
        part_dir = os.path.join(out_dir, f"_part{i}")
        chunk.write.mode("overwrite").parquet(part_dir)
        src = next(
            f for f in os.listdir(part_dir) if f.endswith(".parquet")
        )
        os.rename(
            os.path.join(part_dir, src), os.path.join(out_dir, f"chunk-{i:03d}.parquet")
        )
        n_written += spark.read.parquet(
            os.path.join(out_dir, f"chunk-{i:03d}.parquet")
        ).count()
        shutil.rmtree(part_dir)
        time.sleep(0.05)  # distinct mtimes → deterministic batch order
    assert n_written == n, (
        f"split_events_into_files: chunks hold {n_written} rows but the "
        f"bounded feed has {n} — the event_id range chunking dropped rows"
    )


def replay_current_via_stream(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> DataFrame:
    """Run the full streaming replay and return the final snapshot state."""
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="stream_replay_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    split_events_into_files(spark, sf_dir, src_dir, n_files)

    stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
    # the FULL-REWRITE tier, exercised explicitly — the default
    # stream_current_upsert routes to the bucketed tier, which has its
    # own oracle query (streaming_replay_current_bucketed)
    q = stream_current_upsert_full_rewrite(
        spark,
        stream,
        state_root=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    q.awaitTermination()
    return load_current_state(spark, os.path.join(work, "state"))


@register("streaming_replay_current", oracle=None)
def streaming_replay_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot via incremental streaming MERGE (4 micro-batches).
    Oracle: identical to cdc_current_snapshot (registered below once the
    registry is loaded)."""
    state = replay_current_via_stream(spark, sf_dir, n_files=4)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return state.select(
        "original_id",
        F.col("original_id").alias("user_id"),
        "value",
        "event_type",
        "props_k",
        us("original_registered_at").alias("original_registered_at_us"),
        us("last_updated_at").alias("last_updated_at_us"),
    )


# the streaming replay must land on the exact batch-snapshot state →
# same oracle as cdc_current_snapshot
ORACLES["streaming_replay_current"] = ORACLES["cdc_current_snapshot"]


@register("streaming_replay_current_bucketed", oracle=None)
def streaming_replay_current_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot via the BUCKETED incremental sink (3 micro-batches, 8
    hash buckets, only touched buckets rewritten per epoch — the
    lakehouse-MERGE plan shape; streaming/pipeline.py).  Must land on
    the exact batch-snapshot state: same oracle as cdc_current_snapshot
    (assigned below)."""
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        read_events_stream,
        stream_current_upsert_bucketed,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="bucketed_replay_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    split_events_into_files(spark, sf_dir, src_dir, n_files=3)
    q = stream_current_upsert_bucketed(
        spark,
        read_events_stream(spark, src_dir, max_files_per_trigger=1),
        state_root=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        n_buckets=8,
    )
    q.awaitTermination()
    state = load_bucketed_state(spark, os.path.join(work, "state"))
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return state.select(
        "original_id",
        F.col("original_id").alias("user_id"),
        "value",
        "event_type",
        "props_k",
        us("original_registered_at").alias("original_registered_at_us"),
        us("last_updated_at").alias("last_updated_at_us"),
    )


ORACLES["streaming_replay_current_bucketed"] = ORACLES["cdc_current_snapshot"]


@register("streaming_killresume_replay", oracle=None)
def streaming_killresume_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 exactly-once under the DRIVER's harness, not just pytest
    (VERDICT r4 ask #4): the upsert stream is STOPPED mid-replay — after
    the first committed micro-batch, before the rest — then resumed from
    the checkpoint to completion.  The final state must equal the batch
    snapshot exactly (no lost batch, no double-applied batch), so it
    shares cdc_current_snapshot's oracle.  The stop lands at a
    nondeterministic batch boundary; the FINAL state is deterministic
    regardless — that invariance is exactly the delivery contract."""
    import time as _time

    from cdc_practice_spark.streaming.pipeline import stream_current_upsert

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="killresume_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    split_events_into_files(spark, sf_dir, src_dir, n_files=4)
    state_root = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")

    q = stream_current_upsert(
        spark,
        read_events_stream(spark, src_dir, max_files_per_trigger=1),
        state_root,
        ckpt,
    )
    deadline = _time.time() + 120
    while _time.time() < deadline:
        done = [p for p in q.recentProgress if p["numInputRows"] > 0]
        if done and os.path.exists(os.path.join(state_root, "_MANIFEST")):
            # let the in-flight trigger finish before stopping (r9 —
            # VERDICT r8 wrong #2): interrupting the micro-batch thread
            # mid-trigger made Spark's stop-path exception formatting
            # occasionally dump an uncaught StackOverflowError
            # (java.util.regex frames) into long oracle-run logs.  The
            # result was never affected (hash-matched every time), but
            # the noise forced a re-triage per round.  Stopping at the
            # trigger boundary removes the mid-batch interrupt; the
            # MID-epoch crash direction stays covered by the forged-
            # crash replay tests (tests/test_streaming_corpus.py::
            # test_ingest_kill_resume_exactly_once deletes the commit
            # marker itself), and the stop still lands mid-REPLAY —
            # later batches have not run and must resume from the
            # checkpoint.
            if not q.status["isTriggerActive"]:
                break
        _time.sleep(0.1)
    q.stop()
    q.awaitTermination()

    q2 = stream_current_upsert(
        spark,
        read_events_stream(spark, src_dir, max_files_per_trigger=1),
        state_root,
        ckpt,
    )
    q2.awaitTermination()

    from cdc_practice_spark.streaming.pipeline import load_bucketed_state

    state = load_bucketed_state(spark, state_root)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return state.select(
        "original_id",
        F.col("original_id").alias("user_id"),
        "value",
        "event_type",
        "props_k",
        us("original_registered_at").alias("original_registered_at_us"),
        us("last_updated_at").alias("last_updated_at_us"),
    )


ORACLES["streaming_killresume_replay"] = ORACLES["cdc_current_snapshot"]


def split_documents_into_files(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> None:
    """Split the documents fixture into n single-file chunks in doc_id
    order with monotone mtimes (deterministic stream arrival order)."""
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = raw.agg(F.max("doc_id")).head()[0] + 1
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = raw.filter(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
        ).coalesce(1)
        part_dir = os.path.join(out_dir, f"_part{i}")
        chunk.write.mode("overwrite").parquet(part_dir)
        src = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
        os.rename(
            os.path.join(part_dir, src), os.path.join(out_dir, f"chunk-{i:03d}.parquet")
        )
        shutil.rmtree(part_dir)
        time.sleep(0.05)


@register(
    "streaming_dedup_fingerprints",
    oracle="""
SELECT DISTINCT md5(array_to_string(list_sort(list_distinct(
         string_split_regex(lower(trim(text)), '\\s+'))), ' ')) AS fingerprint
FROM documents
""",
)
def streaming_dedup_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus dedup: documents arrive as 4 micro-batches and
    ``dropDuplicates`` on the content fingerprint holds seen-fingerprint
    state across batches — each fingerprint passes the stream exactly
    once no matter how many batches repeat it.  The emitted SET of
    fingerprints is deterministic (which duplicate doc carries it is
    not — state-store partial order — so the query projects the
    fingerprint set; representative choice is the BATCH dedup path's
    job, dedup_exact_clusters).  At scale this is the dedup-at-ingest
    tier: state is one row per unique fingerprint, partitioned by the
    state key."""
    from cdc_practice_spark.functions.text import fingerprint_sorted_tokens

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="stream_dedup_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src_dir)
    split_documents_into_files(spark, sf_dir, src_dir, n_files=4)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("fingerprint", fingerprint_sorted_tokens(F.col("text")))
        .dropDuplicates(["fingerprint"])
        .select("fingerprint")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # no .distinct() here: the RAW sink must already be unique — a
    # fingerprint emitted twice (state failure) breaks the oracle's
    # row-count match, so exactly-once emission is part of the check.
    return spark.read.parquet(out_dir).select("fingerprint")


@register(
    "streaming_interval_join_attribution",
    oracle="""
SELECT p.event_id AS purchase_id,
       v.event_id AS view_id,
       p.user_id,
       epoch_us(p.ts) AS purchase_ts_us,
       epoch_us(v.ts) AS view_ts_us
FROM events p
JOIN events v
  ON p.event_type = 'purchase' AND v.event_type = 'view'
 AND p.user_id = v.user_id
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL 7 DAY
""",
)
def streaming_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join: purchases and views arrive as two
    streams (4 micro-batches each over the same chunked source) and
    join on user within a 7-day attribution window.  Spark buffers both
    sides in watermark-bounded state and emits each qualifying pair
    exactly once — the canonical event-correlation shape (ad
    attribution, fraud windows) that no batch twin replaces at 100 TB
    because neither side ever exists in full.

    Determinism: the watermark lag exceeds the fixture's whole time
    span, so no event is ever dropped as late and the emitted pair SET
    equals the batch interval join (the oracle).  A deployment sets the
    lag to its real out-of-orderness bound — state then stays
    O(window × arrival rate) per user; the join itself shuffles both
    streams on user_id once."""
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="stream_ssj_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    os.makedirs(src_dir)
    split_events_into_files(spark, sf_dir, src_dir, n_files=4)
    from cdc_practice_spark.streaming.pipeline import read_events_stream

    base = read_events_stream(spark, src_dir, max_files_per_trigger=1)
    views = (
        base.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").cast("timestamp").alias("v_ts"),
        )
        .withWatermark("v_ts", "3650 days")
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").cast("timestamp").alias("p_ts"),
        )
        .withWatermark("p_ts", "3650 days")
    )
    joined = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    ).select(
        "purchase_id",
        "view_id",
        "user_id",
        F.unix_micros(F.col("p_ts")).alias("purchase_ts_us"),
        F.unix_micros(F.col("v_ts")).alias("view_ts_us"),
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


@register("streaming_maintained_mv_replay", oracle=None)
def streaming_maintained_mv_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained-aggregate sink (streaming/pipeline.py::
    stream_maintained_mv) replayed over 3 micro-batches: per-epoch
    retract/insert delta maintenance over the bucketed snapshot must
    land on the same per-group aggregate the batch pipeline computes —
    same oracle as cdc_incremental_mv (assigned below)."""
    from cdc_practice_spark.streaming.pipeline import (
        load_mv,
        read_events_stream,
        stream_maintained_mv,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="mv_replay_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    split_events_into_files(spark, sf_dir, src_dir, n_files=3)
    q = stream_maintained_mv(
        spark,
        read_events_stream(spark, src_dir, max_files_per_trigger=1),
        state_root=os.path.join(work, "state"),
        mv_root=os.path.join(work, "mv"),
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    q.awaitTermination()
    mv = load_mv(spark, os.path.join(work, "mv"))
    return mv.select(
        "event_type",
        "n_rows",
        F.round(
            F.col("sum_cents").cast("decimal(38,0)")
            / F.lit(100).cast("decimal(19,0)"),
            2,
        )
        .cast("double")
        .alias("sum_value"),
    )


ORACLES["streaming_maintained_mv_replay"] = ORACLES["cdc_incremental_mv"]


@register("streaming_distinct_mv_replay", oracle=None)
def streaming_distinct_mv_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained COUNT(DISTINCT) sink (streaming/pipeline.py::
    stream_maintained_distinct_mv) replayed over 3 micro-batches:
    per-epoch support-table zero-crossing maintenance over the bucketed
    snapshot must land on the same per-group exact distinct count the
    batch pipeline computes — same oracle as cdc_incremental_distinct_mv
    (assigned below)."""
    from cdc_practice_spark.streaming.pipeline import (
        load_distinct_mv,
        read_events_stream,
        stream_maintained_distinct_mv,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="dmv_replay_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    split_events_into_files(spark, sf_dir, src_dir, n_files=3)
    q = stream_maintained_distinct_mv(
        spark,
        read_events_stream(spark, src_dir, max_files_per_trigger=1),
        state_root=os.path.join(work, "state"),
        sup_root=os.path.join(work, "sup"),
        mv_root=os.path.join(work, "mv"),
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    q.awaitTermination()
    return load_distinct_mv(spark, os.path.join(work, "mv")).select(
        "event_type", "n_rows", "n_distinct"
    )


ORACLES["streaming_distinct_mv_replay"] = ORACLES["cdc_incremental_distinct_mv"]


@register("streaming_topk_mv_replay", oracle=None)
def streaming_topk_mv_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained TOP-K sink (streaming/pipeline.py::
    stream_maintained_topk_mv) replayed over 3 micro-batches: per-epoch
    prefix-merge / endangered-group re-derive over the bucketed
    snapshot must land on the same per-group top-3 the batch pipeline
    computes — same oracle as cdc_incremental_topk_mv (assigned
    below)."""
    from cdc_practice_spark.streaming.pipeline import (
        load_topk_mv,
        read_events_stream,
        stream_maintained_topk_mv,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="tkmv_replay_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    split_events_into_files(spark, sf_dir, src_dir, n_files=3)
    q = stream_maintained_topk_mv(
        spark,
        read_events_stream(spark, src_dir, max_files_per_trigger=1),
        state_root=os.path.join(work, "state"),
        mv_root=os.path.join(work, "mv"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        k=3,
    )
    q.awaitTermination()
    mv = load_topk_mv(spark, os.path.join(work, "mv"))
    ex = mv.select("event_type", F.posexplode("topk").alias("pos", "e"))
    return ex.select(
        "event_type",
        (F.col("pos") + 1).cast("long").alias("rnk"),
        F.round(
            (-F.col("e.nc")).cast("decimal(38,0)") / F.lit(100).cast("decimal(19,0)"),
            2,
        )
        .cast("double")
        .alias("value"),
        F.col("e.id").alias("original_id"),
    )


ORACLES["streaming_topk_mv_replay"] = ORACLES["cdc_incremental_topk_mv"]


@register("streaming_scd2_replay", oracle=None)
def streaming_scd2_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The append-only streaming SCD2 sink (streaming/scd2_sink.py)
    replayed over 3 micro-batches: close-and-append + last-copy-wins
    read must equal the batch type-2 builder — same oracle as
    cdc_scd2_dimension (assigned below)."""
    from cdc_practice_spark.streaming.scd2_sink import (
        read_scd2,
        stream_scd2_append,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="scd2_replay_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    split_events_into_files(spark, sf_dir, src_dir, n_files=3)
    q = stream_scd2_append(
        spark,
        read_events_stream(spark, src_dir, max_files_per_trigger=1),
        out_root=os.path.join(work, "dim"),
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    q.awaitTermination()
    dim = read_scd2(spark, os.path.join(work, "dim"))
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return dim.select(
        "original_id",
        "value",
        "event_type",
        us("valid_from").alias("valid_from_us"),
        us("valid_to").alias("valid_to_us"),
        "is_current",
        "version_offset",
    )


ORACLES["streaming_scd2_replay"] = ORACLES["cdc_scd2_dimension"]


def _time_travel_oracle() -> str:
    """cdc_current_snapshot's oracle restricted to the FIRST micro-batch's
    event_id prefix — split_events_into_files chunks by event_id range
    with step = ceil(n / n_files), so 'state AS OF epoch 0' is exactly
    the current state over event_id < step."""
    from cdc_practice_spark.queries.cdc_queries import FEED_CTE

    prefix_feed = FEED_CTE.replace(
        "FROM events",
        "FROM events WHERE event_id < (SELECT step FROM _step)",
    )
    return f"""
WITH _step AS (
  SELECT CAST(ceil(count(*) / 3.0) AS BIGINT) AS step FROM events
),
{prefix_feed},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
)
SELECT original_id,
       original_id AS user_id,
       value,
       event_type,
       props_k,
       epoch_us(original_registered_at) AS original_registered_at_us,
       epoch_us(registered_at) AS last_updated_at_us
FROM ranked
WHERE rn = 1 AND __deleted = 'false'
"""


@register("streaming_state_time_travel", oracle=None)
def streaming_state_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the bucketed streaming state, under the oracle
    gate (previously pytest-only): replay 3 micro-batches, then read the
    snapshot AS OF the FIRST epoch via its retained manifest — no byte
    copied, old bucket dirs are immutable.  The oracle recomputes the
    current state over the first chunk's event_id prefix (the file split
    is a deterministic event_id range), so a manifest pointing at a
    post-epoch bucket hash-fails."""
    from cdc_practice_spark.streaming.pipeline import (
        list_state_versions,
        load_bucketed_state_at,
        read_events_stream,
        stream_current_upsert_bucketed,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="timetravel_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    split_events_into_files(spark, sf_dir, src_dir, n_files=3)
    state_root = os.path.join(work, "state")
    q = stream_current_upsert_bucketed(
        spark,
        read_events_stream(spark, src_dir, max_files_per_trigger=1),
        state_root=state_root,
        checkpoint_dir=os.path.join(work, "ckpt"),
        n_buckets=8,
    )
    q.awaitTermination()
    first = list_state_versions(state_root)[0]
    state = load_bucketed_state_at(spark, state_root, first)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return state.select(
        "original_id",
        F.col("original_id").alias("user_id"),
        "value",
        "event_type",
        "props_k",
        us("original_registered_at").alias("original_registered_at_us"),
        us("last_updated_at").alias("last_updated_at_us"),
    )


ORACLES["streaming_state_time_travel"] = _time_travel_oracle()


@register(
    "streaming_heavy_hitters",
    oracle="""
WITH t AS (SELECT count(*) AS n FROM events WHERE event_type IS NOT NULL)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS exact_count,
       TRUE AS in_summary
FROM events, t
WHERE event_type IS NOT NULL
GROUP BY event_type, t.n
HAVING count(*) * 10 > t.n
ORDER BY event_type
""",
)
def streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained Misra-Gries summary under the oracle gate: the events
    fixture streams through ``stream_heavy_hitters_mv`` in 3
    micro-batches (per-batch ≤ k-counter summaries merged by the
    PODS-2012 rule — streaming/pipeline.py), then the query emits the
    exact heavy hitters (count·(k+1) > n, both engines agree on the set)
    with the summary-membership DECISION per item.  k=9 (threshold
    n/10): the fixture's 5 near-uniform event types (~n/5 each) are ALL
    exact heavy hitters at every SF, so the result is NONEMPTY and the
    boolean is load-bearing — r6's k=3 (n/4) matched zero rows and the
    hash compared two empty frames.  The MG guarantee is closed under
    merging, so it must hold across ANY micro-batch split; a summary
    that evicted a guaranteed-heavy item flips the boolean and fails the
    hash.  State stays ≤ k rows for an unbounded stream — the
    constant-memory streaming upgrade of exact top-frequency (which
    would shuffle every distinct key per trigger)."""
    from cdc_practice_spark.streaming.pipeline import (
        load_heavy_hitters_mv,
        stream_heavy_hitters_mv,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="hh_q_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)
    q = stream_heavy_hitters_mv(
        spark,
        read_events_stream(spark, src),
        mv_root=os.path.join(work, "mv"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        col="event_type",
        k=9,
    )
    q.awaitTermination()
    counters, n = load_heavy_hitters_mv(spark, os.path.join(work, "mv"))
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
        .filter(F.col("exact_count") * 10 > F.lit(n))
        .select(
            "event_type",
            "exact_count",
            F.col("event_type").isin(list(counters)).alias("in_summary"),
        )
        .orderBy("event_type")
    )


def _split_docs_batch_into_files(
    spark: SparkSession, batch: DataFrame, out_dir: str, n_files: int = 3
) -> None:
    """Write the arriving-batch documents as n id-ordered single-file
    parquet chunks (chunk i holds the i-th doc_id-range slice), so the
    file-source stream replays them in ascending-id micro-batches."""
    lo, hi = batch.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    if lo is None:
        raise ValueError(
            "_split_docs_batch_into_files: the batch selection is empty — "
            "nothing to stream (check the batch modulus against the fixture)"
        )
    step = (int(hi) - int(lo)) // n_files + 1
    for i in range(n_files):
        chunk = batch.filter(
            (F.col("doc_id") >= int(lo) + i * step)
            & (F.col("doc_id") < int(lo) + (i + 1) * step)
        ).coalesce(1)
        part_dir = os.path.join(out_dir, f"_part{i}")
        chunk.write.mode("overwrite").parquet(part_dir)
        src = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
        os.rename(
            os.path.join(part_dir, src),
            os.path.join(out_dir, f"chunk-{i:03d}.parquet"),
        )
        shutil.rmtree(part_dir)
        # distinct mtimes: the file source breaks ties by modification
        # time, and two chunks written in the same filesystem tick could
        # replay out of id order — which would break the stream==batch
        # dedup/pack equivalence silently (split_events_into_files has
        # the same guard)
        time.sleep(0.05)


def _incr_oracle_for_stream() -> str:
    from cdc_practice_spark.queries.pipeline_queries import _e2e_incr_oracle

    return _e2e_incr_oracle()


def _corpus_ingest_store(spark: SparkSession, sf_dir: str) -> str:
    """Run the streaming corpus ingest once per corpus and return the
    finished store root — shared (memoized) by the disposition and
    funnel queries so checking both costs ONE stream run."""
    from cdc_practice_spark.operators.corpus import (
        corpus_features,
        freeze_corpus_stats,
    )
    from cdc_practice_spark.plans.cache import tracked_persist
    from cdc_practice_spark.plans.hints import _STATS_CACHE
    from cdc_practice_spark.queries.pipeline_queries import _INCR_BATCH_MOD
    from cdc_practice_spark.streaming.corpus import (
        seed_ingest_index,
        stream_corpus_ingest,
    )

    cache_key = ("corpus_ingest_store", sf_dir)
    if cache_key in _STATS_CACHE:
        return _STATS_CACHE[cache_key]
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="corpus_ingest_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % _INCR_BATCH_MOD == 3
    _split_docs_batch_into_files(spark, docs.filter(is_batch), src)

    feats_c = tracked_persist(corpus_features(docs.filter(~is_batch)))
    # the frozen benchmark-gram blocklist (r8: the 8-gram rule) — the
    # benchmark is doc_id % 97 over the FULL fixture, so its grams come
    # from a JVM pass over the raw docs (the production shape: the eval
    # set is separate from the standing corpus' feature store)
    from cdc_practice_spark.functions import text as T
    from cdc_practice_spark.operators import dedup as D
    from cdc_practice_spark.operators.corpus import DECON_GRAM_K

    blocklist = [
        int(r["g"])
        for r in docs.filter(F.col("doc_id") % 97 == 0)
        .select(T.tokens(F.col("text")).alias("_toks"))
        .select(
            F.explode(
                D.shingles_from_tokens(F.col("_toks"), k=DECON_GRAM_K)
            ).alias("s")
        )
        .select(D.token_hash60(F.col("s")).alias("g"))
        .distinct()
        .collect()
    ]
    stats = freeze_corpus_stats(feats_c, blocklist)
    store = os.path.join(work, "store")
    seed_ingest_index(spark, feats_c, store, stats.q25)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_corpus_ingest(
        spark, stream, stats, store, os.path.join(work, "ckpt")
    )
    q.awaitTermination()
    _STATS_CACHE[cache_key] = store
    return store


@register("streaming_corpus_ingest", oracle=_incr_oracle_for_stream())
def streaming_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline as a STREAM (streaming/corpus.py), under
    the SAME full-hash oracle as the batch incremental query: the
    arriving batch (doc_id % 7 == 3) replays as 3 id-ordered
    micro-batches through ``stream_corpus_ingest`` — frozen corpus
    stats, persistent LSH index accreting each epoch's quality
    survivors, per-source pack state carried across epochs — and the
    union of the per-epoch disposition deltas must be row-identical to
    running the whole batch at once (``corpus_e2e_incremental``'s
    oracle).  That identity is the operator's correctness contract:
    chunking must not change ANY curation decision, because the index
    grows by exactly the docs the single-batch rule would have compared
    against (id-ordered chunks ⇒ 'already indexed' ≡ 'smaller id') and
    greedy packing continues from the carried per-source fill state."""
    from cdc_practice_spark.streaming.corpus import load_ingest_dispositions

    store = _corpus_ingest_store(spark, sf_dir)
    return load_ingest_dispositions(spark, store).orderBy("doc_id")


@register(
    "streaming_corpus_funnel",
    oracle="SELECT disposition AS stage, CAST(count(*) AS BIGINT) AS n\n"
    "FROM (" + _incr_oracle_for_stream() + ")\n"
    "GROUP BY disposition ORDER BY stage",
)
def streaming_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming sink's per-epoch funnel deltas (r8 — the
    observability table an ingest operator watches), summed over epochs
    and hash-checked against the BATCH disposition histogram the DuckDB
    oracle recomputes: per-epoch emission must lose or double-count
    nothing relative to running the whole batch at once.  Per-epoch
    granularity itself (≥2 distinct epochs; sums match per stage) is
    pinned in tests/test_streaming_corpus.py."""
    from cdc_practice_spark.streaming.corpus import load_ingest_funnel

    store = _corpus_ingest_store(spark, sf_dir)
    return (
        load_ingest_funnel(spark, store)
        .groupBy("stage")
        .agg(F.sum("n").cast("long").alias("n"))
        .orderBy("stage")
    )


def _shard_export_oracle(docs_rel: str = "documents",
                         prefix_cte: str = "") -> str:
    """Batch identity for the STREAMING shard export: recompute the
    whole curated corpus (the incremental chain through ``packed``),
    shard it, tokenize kept docs under the hash60 cold-start id scheme,
    and emit the same (source, shard_id, n_seqs, n_docs, n_tokens,
    digest) rows the per-epoch delivery loop accreted.
    ``docs_rel``/``prefix_cte`` swap the corpus relation — the
    extract-to-shards oracle points BOTH the curation chain and the
    token stream at the extracted-pages CTE."""
    from cdc_practice_spark.queries.dedup_queries import _HASH
    from cdc_practice_spark.queries.pipeline_queries import (
        _SHARD_MOD,
        _e2e_incr_chain,
    )
    from cdc_practice_spark.streaming.shard_export import _SHARD_SEQS_STREAM

    return (
        _e2e_incr_chain(docs_rel, prefix_cte)
        + f""",
sx_kept AS MATERIALIZED (
  SELECT source, doc_id, n_tokens, bin_id,
         CAST(bin_id // {_SHARD_SEQS_STREAM} AS BIGINT) AS shard_id
  FROM packed
),
sx_words AS MATERIALIZED (
  SELECT k.source, k.shard_id, k.doc_id, CAST(i AS BIGINT) AS wp,
         k.lst[i] AS w
  FROM (SELECT s.*, string_split_regex(lower(trim(d.text)), '\\s+') AS lst
        FROM sx_kept s JOIN {docs_rel} d USING (doc_id)) k,
       unnest(range(1, len(k.lst) + 1)) AS g(i)
  WHERE k.lst[i] <> ''
),
sx_stream AS (
  SELECT source, shard_id, {_HASH.format(x='w')} AS tok_id,
         row_number() OVER (PARTITION BY source, shard_id
                            ORDER BY doc_id, wp) AS pos
  FROM sx_words
),
sx_digests AS (
  SELECT source, shard_id,
         CAST(sum((tok_id * pos) % {_SHARD_MOD}) AS BIGINT)
           % {_SHARD_MOD} AS digest
  FROM sx_stream GROUP BY source, shard_id
)
SELECT k.source, k.shard_id,
       CAST(count(DISTINCT k.bin_id) AS BIGINT) AS n_seqs,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(k.n_tokens) AS BIGINT) AS n_tokens,
       coalesce(any_value(d.digest), 0) AS digest
FROM sx_kept k LEFT JOIN sx_digests d
  ON k.source = d.source AND k.shard_id = d.shard_id
GROUP BY k.source, k.shard_id
ORDER BY k.source, k.shard_id
"""
    )


@register("streaming_shard_export", oracle=_shard_export_oracle())
def streaming_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous training-data delivery (r12 — VERDICT r11 missing
    #5): replay the finished ingest store's commit history epoch by
    epoch through ``export_ingest_shards`` — each call ships exactly
    the shards that epoch SEALED (append-only by the greedy-packing
    seal argument, streaming/shard_export.py) — then ``finalize`` the
    per-source tails at end-of-feed.  The accreted ledger must be
    row-identical to a one-shot batch export of the same curated
    corpus, which is what the DuckDB oracle recomputes from scratch:
    per-epoch chunking must change no shard boundary, no token
    position, no digest.  Kill-resume and the committed-shard
    byte-immutability are pinned in tests/test_streaming_corpus.py."""
    from cdc_practice_spark.operators.shards import read_export_manifest_df
    from cdc_practice_spark.plans.hints import _STATS_CACHE
    from cdc_practice_spark.queries.pipeline_queries import _INCR_BATCH_MOD
    from cdc_practice_spark.streaming.corpus import _read_manifest
    from cdc_practice_spark.streaming.shard_export import (
        _SHARD_SEQS_STREAM,
        export_ingest_shards,
    )

    key = ("streaming_shard_export", sf_dir)
    if key not in _STATS_CACHE:
        store = _corpus_ingest_store(spark, sf_dir)
        out = os.path.join(
            tempfile.mkdtemp(prefix="shard_stream_", dir=TMP_ROOT), "shards"
        )
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % _INCR_BATCH_MOD == 3
        )
        for e in _read_manifest(store):  # the per-epoch delivery loop
            export_ingest_shards(
                spark, store, docs, out,
                seqs_per_shard=_SHARD_SEQS_STREAM, at_epoch=e,
            )
        export_ingest_shards(
            spark, store, docs, out,
            seqs_per_shard=_SHARD_SEQS_STREAM, finalize=True,
        )
        _STATS_CACHE[key] = out
    return read_export_manifest_df(spark, _STATS_CACHE[key]).orderBy(
        "source", "shard_id"
    )


# ---------------------------------------------------------------------------
# Retroactive decontamination over the INGEST STORE (r9 — VERDICT r8 asks
# #1 and #4): a new eval suite ships AFTER the stream admitted documents.
# The audit answers from the store's persisted per-epoch state alone (no
# stream replay, no raw-corpus re-read); the purge APPLIES the audit,
# un-admitting the flagged docs at O(purge) cost.
# ---------------------------------------------------------------------------

# doc_id % 17 == 2 plays the post-admission eval suite (v2).  Chosen so
# the flagged-admitted set is nonempty but proper at all 3 SFs
# (3/27, 2/24, 9/216 kept docs flagged at sf0.001/0.01/0.1).
_RETRO_STREAM_MOD, _RETRO_STREAM_REM = 17, 2


def _new_benchmark_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 8-gram hashes of the post-admission eval suite — computed
    from the raw fixture (the eval set is external to the store), same
    JVM shingle→hash pass as the frozen blocklist."""
    from cdc_practice_spark.functions import text as T
    from cdc_practice_spark.operators import dedup as D
    from cdc_practice_spark.operators.corpus import DECON_GRAM_K

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % _RETRO_STREAM_MOD == _RETRO_STREAM_REM)
        .select(T.tokens(F.col("text")).alias("_toks"))
        .select(
            F.explode(
                D.shingles_from_tokens(F.col("_toks"), k=DECON_GRAM_K)
            ).alias("s")
        )
        .select(D.token_hash60(F.col("s")).alias("g"))
        .distinct()
    )


def _retro_stream_oracle_ctes() -> str:
    from cdc_practice_spark.queries.pipeline_queries import _e2e_incr_chain

    return (
        _e2e_incr_chain()
        + f""", bench2 AS MATERIALIZED (
  SELECT DISTINCT unnest(gs) AS g FROM g8
  WHERE doc_id % {_RETRO_STREAM_MOD} = {_RETRO_STREAM_REM}
),
retro AS MATERIALIZED (
  SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_shared_v2
  FROM (SELECT doc_id, unnest(gs) AS g FROM g8 JOIN b5 USING (doc_id)) cg
  JOIN bench2 USING (g)
  GROUP BY cg.doc_id
)
"""
    )


@register(
    "streaming_corpus_retro_audit",
    oracle=_retro_stream_oracle_ctes()
    + """
SELECT b5.doc_id, b5.source, r.n_shared_v2
FROM retro r JOIN b5 USING (doc_id)
ORDER BY b5.doc_id
""",
)
def streaming_corpus_retro_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retroactive-decontamination audit answered from the ingest
    store's PERSISTED state (r9 — the streaming twin of
    corpus_decontaminate_retroactive): which docs the stream admitted
    share any 8-gram with a benchmark that shipped after admission, with
    the shared-gram count as evidence.  Reads only the per-epoch
    g8/disposition deltas — no stream replay, no raw-corpus re-scan; the
    new benchmark's distinct grams broadcast, admitted grams explode
    map-side, only hits shuffle.  The DuckDB oracle recomputes the whole
    ingest from scratch, so a store that lost or double-counted an
    admitted doc's grams hash-fails."""
    from cdc_practice_spark.streaming.corpus import load_admitted_grams

    store = _corpus_ingest_store(spark, sf_dir)
    g8 = load_admitted_grams(spark, store)
    bench2 = _new_benchmark_grams(spark, sf_dir)
    hits = (
        g8.select("doc_id", F.explode("g8").alias("g"))
        .join(F.broadcast(bench2), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_v2"))
    )
    from cdc_practice_spark.streaming.corpus import load_ingest_dispositions

    kept = load_ingest_dispositions(spark, store).filter(
        F.col("disposition") == "kept"
    )
    return (
        hits.join(kept.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "n_shared_v2")
        .orderBy("doc_id")
    )


def _purged_ingest_store(spark: SparkSession, sf_dir: str) -> str:
    """Clone the finished ingest store, audit it against the v2
    benchmark, and APPLY the purge — memoized so the disposition query
    costs one clone+purge per corpus."""
    import shutil

    from cdc_practice_spark.plans.hints import _STATS_CACHE
    from cdc_practice_spark.streaming.corpus import (
        load_admitted_grams,
        purge_ingest_docs,
    )

    key = ("corpus_purge_store", sf_dir)
    if key in _STATS_CACHE:
        return _STATS_CACHE[key]
    src_store = _corpus_ingest_store(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="corpus_purge_", dir=TMP_ROOT)
    store = os.path.join(work, "store")
    shutil.copytree(src_store, store)
    bench2 = _new_benchmark_grams(spark, sf_dir)
    purge_ids = (
        load_admitted_grams(spark, store)
        .select("doc_id", F.explode("g8").alias("g"))
        .join(F.broadcast(bench2), "g")
        .select("doc_id")
        .distinct()
    )
    purge_ingest_docs(spark, store, purge_ids)
    _STATS_CACHE[key] = store
    return store


@register(
    "corpus_purge_apply",
    oracle=_retro_stream_oracle_ctes()
    + f""",
b6 AS MATERIALIZED (
  SELECT * FROM b5 WHERE doc_id NOT IN (SELECT doc_id FROM retro)
),
toks3 AS MATERIALIZED (
  SELECT source, doc_id, n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn3
  FROM b6
),
packed2 AS (
  SELECT source, doc_id, n_tokens, rn3,
         CAST(0 AS BIGINT) AS bin_id, n_tokens AS bin_fill
  FROM toks3 WHERE rn3 = 1
  UNION ALL
  SELECT t.source, t.doc_id, t.n_tokens, t.rn3,
         CASE WHEN p.bin_fill + t.n_tokens > {{cap}}
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.bin_fill + t.n_tokens > {{cap}}
              THEN t.n_tokens ELSE p.bin_fill + t.n_tokens END
  FROM toks3 t JOIN packed2 p ON t.source = p.source AND t.rn3 = p.rn3 + 1
)
SELECT f.doc_id, f.source, f.n_tokens,
       CASE WHEN r.doc_id IS NOT NULL THEN 'purged_contaminated'
            WHEN b1.doc_id IS NULL THEN 'dropped_lang'
            WHEN b2.doc_id IS NULL THEN 'dropped_quality'
            WHEN b3.doc_id IS NULL THEN 'dropped_dup'
            WHEN b4.doc_id IS NULL THEN 'dropped_contaminated'
            WHEN b5.doc_id IS NULL THEN 'dropped_mix'
            ELSE 'kept' END AS disposition,
       p2.bin_id, p2.bin_fill
FROM feat f
LEFT JOIN b1 USING (doc_id)
LEFT JOIN b2 USING (doc_id)
LEFT JOIN b3 USING (doc_id)
LEFT JOIN b4 USING (doc_id)
LEFT JOIN b5 USING (doc_id)
LEFT JOIN retro r USING (doc_id)
LEFT JOIN packed2 p2 USING (doc_id)
WHERE f.is_batch
ORDER BY f.doc_id
""".replace("{cap}", "256"),
)
def corpus_purge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the retroactive audit to the maintained ingest store (r9 —
    closes the loop corpus_decontaminate_retroactive opened): the flagged
    admitted docs are un-admitted in place — index and gram rows deleted,
    dispositions flipped to 'purged_contaminated', ONLY the affected
    sources' bins repacked (streaming/corpus.py::purge_ingest_docs) —
    and the query returns the store's post-purge disposition table.  The
    DuckDB oracle recomputes the entire ingest from scratch WITHOUT ever
    admitting the flagged docs, so the full-hash match proves the O(purge)
    in-place maintenance is byte-equivalent to the never-admitted rebuild
    (bin boundaries included).  The content-overlap sibling of GDPR key
    erasure over the same store discipline."""
    from cdc_practice_spark.streaming.corpus import load_ingest_dispositions

    store = _purged_ingest_store(spark, sf_dir)
    return load_ingest_dispositions(spark, store).orderBy("doc_id")


def _time_travel_corpus_oracle() -> str:
    from cdc_practice_spark.queries.pipeline_queries import (
        _INCR_BATCH_MOD,
        _e2e_incr_chain,
    )

    # chunk 1 of _split_docs_batch_into_files: [lo, lo + (hi-lo)//3 + 1)
    # over the arriving batch — deterministic from the fixture
    return (
        _e2e_incr_chain()
        + f""", bounds AS (
  SELECT min(doc_id) AS lo, max(doc_id) AS hi
  FROM documents WHERE doc_id % {_INCR_BATCH_MOD} = 3
)
SELECT f.doc_id, f.source, f.n_tokens,
       CASE WHEN b1.doc_id IS NULL THEN 'dropped_lang'
            WHEN b2.doc_id IS NULL THEN 'dropped_quality'
            WHEN b3.doc_id IS NULL THEN 'dropped_dup'
            WHEN b4.doc_id IS NULL THEN 'dropped_contaminated'
            WHEN b5.doc_id IS NULL THEN 'dropped_mix'
            ELSE 'kept' END AS disposition,
       p.bin_id, p.bin_fill
FROM feat f
LEFT JOIN b1 USING (doc_id)
LEFT JOIN b2 USING (doc_id)
LEFT JOIN b3 USING (doc_id)
LEFT JOIN b4 USING (doc_id)
LEFT JOIN b5 USING (doc_id)
LEFT JOIN packed p USING (doc_id)
WHERE f.is_batch
  AND f.doc_id < (SELECT lo + (hi - lo) // 3 + 1 FROM bounds)
ORDER BY f.doc_id
"""
    )


@register("streaming_corpus_time_travel", oracle=_time_travel_corpus_oracle())
def streaming_corpus_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the ingest store's audit log (r9): the
    disposition table AS OF the FIRST committed epoch, served from the
    store's persisted state (streaming/corpus.py::
    load_ingest_dispositions_at) — the corpus-store sibling of
    streaming_state_time_travel.  The oracle recomputes the whole
    incremental pipeline restricted to the first micro-batch's
    deterministic doc_id range: because chunks arrive in id order and
    every curation decision is prefix-stable, the as-of view must equal
    what the store actually contained at that epoch's commit —
    hash-checked at 3 SFs.  The view survives full-store compaction
    (the folded base persists per-row true epochs; pinned in
    tests/test_streaming_corpus.py)."""
    from cdc_practice_spark.streaming.corpus import (
        _read_manifest,
        load_ingest_dispositions_at,
    )

    store = _corpus_ingest_store(spark, sf_dir)
    first = min(e for e in _read_manifest(store) if e >= 0)
    return load_ingest_dispositions_at(spark, store, first).orderBy("doc_id")


def _txn_gated_state(spark: SparkSession, sf_dir: str) -> str:
    """Run the txn-gated replay once per corpus and return the finished
    state root — shared (memoized) by the snapshot and open-buffer
    queries so checking both costs ONE stream run."""
    from cdc_practice_spark.plans.hints import _STATS_CACHE
    from cdc_practice_spark.streaming.pipeline import (
        stream_current_upsert_txn_gated,
    )

    cache_key = ("txn_gated_state", sf_dir)
    if cache_key in _STATS_CACHE:
        return _STATS_CACHE[cache_key]
    events = load_table(spark, sf_dir, "events")
    max_off = events.agg(F.max("event_id").alias("m")).head().m
    w = int(max_off * 0.8) + 2
    declared = events.select(F.col("event_id").alias("kafka_offset"))

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="txn_gated_replay_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    split_events_into_files(spark, sf_dir, src_dir, n_files=4, max_event_id=w)
    q = stream_current_upsert_txn_gated(
        spark,
        read_events_stream(spark, src_dir, max_files_per_trigger=1),
        state_root=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        declared_offsets=declared,
    )
    q.awaitTermination()
    _STATS_CACHE[cache_key] = os.path.join(work, "state")
    return _STATS_CACHE[cache_key]


@register("streaming_txn_gated_replay", oracle=None)
def streaming_txn_gated_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of cdc_txn_boundary_apply: the feed (truncated at
    w = 80% + 2, genuinely cutting one transaction mid-way) replays as 4 micro-batches
    through the txn-GATED bucketed upsert — trigger boundaries land
    inside transactions, the gate buffers those events across epochs and
    releases whole transactions in commit order, and the cut txn's
    events stay pending forever.  Final state must equal the batch gate
    exactly (oracle assigned below = cdc_txn_boundary_apply's)."""
    from cdc_practice_spark.streaming.pipeline import load_bucketed_state

    state = load_bucketed_state(spark, _txn_gated_state(spark, sf_dir))
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return state.select(
        "original_id",
        F.col("original_id").alias("user_id"),
        "value",
        "event_type",
        "props_k",
        us("original_registered_at").alias("original_registered_at_us"),
        us("last_updated_at").alias("last_updated_at_us"),
    )


# the gated stream must land on the exact batch-gated snapshot
# (cdc_queries is imported at module top, so the oracle is registered)
ORACLES["streaming_txn_gated_replay"] = ORACLES["cdc_txn_boundary_apply"]


@register(
    "streaming_txn_open_buffer",
    oracle="""
WITH bounds AS (
  SELECT CAST(floor(max(event_id) * 0.8) AS BIGINT) + 2 AS w FROM events
),
declared AS (
  SELECT event_id // 5 AS txn, count(*) AS c FROM events GROUP BY 1
),
observed AS (
  SELECT event_id // 5 AS txn, count(*) AS c
  FROM events, bounds WHERE event_id <= w GROUP BY 1
),
frontier AS (
  SELECT min(d.txn) AS m
  FROM declared d LEFT JOIN observed o USING (txn)
  WHERE COALESCE(o.c, 0) < d.c
)
SELECT e.event_id AS kafka_offset,
       e.user_id AS original_id,
       e.value,
       e.event_type,
       e.event_id // 5 AS txn
FROM events e, bounds, frontier
WHERE e.event_id <= w AND e.event_id // 5 >= frontier.m
""",
)
def streaming_txn_open_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OBSERVABILITY surface of the streaming transaction gate: the
    open-transaction buffer after the gated replay finishes — exactly
    the captured rows of transactions at or past the release frontier
    (here: the transaction the capture cut tore).  Oracle recomputes
    the buffer from first principles (frontier = min txn with
    observed < declared under the commit-order prefix rule), so a gate
    that leaks, drops, or double-buffers rows hash-fails.  Shares the
    memoized stream run with streaming_txn_gated_replay — checking
    both costs one replay."""
    from cdc_practice_spark.streaming.pipeline import load_pending_txn_buffer

    pending = load_pending_txn_buffer(spark, _txn_gated_state(spark, sf_dir))
    return pending.select(
        "kafka_offset",
        "original_id",
        "value",
        "event_type",
        F.expr("kafka_offset div 5").alias("txn"),
    )


@register("streaming_snapshot_handoff", oracle=None)
def streaming_snapshot_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING half of the bootstrap handoff (cdc/handoff.py is the
    batch half): the bucketed state is SEEDED from a snapshot taken at
    S = 60% of the feed, then the stream consumes only a tail re-read
    from G = 50% — 3 micro-batches whose first overlaps the snapshot
    (the overlap must discard statelessly) — and the final state must
    equal the one-pass batch snapshot over the COMPLETE feed exactly
    (oracle = cdc_current_snapshot's, assigned below).  History before
    S is never streamed: bootstrap cost is O(state + tail)."""
    from cdc_practice_spark.cdc import build_current
    from cdc_practice_spark.queries.cdc_queries import _feed
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        stream_current_upsert_bootstrapped,
    )

    events = load_table(spark, sf_dir, "events")
    max_off = events.agg(F.max("event_id").alias("m")).head().m
    s_off, g_off = int(max_off * 0.6), int(max_off * 0.5)
    snap = build_current(
        _feed(spark, sf_dir).filter(F.col("kafka_offset") <= s_off)
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="stream_handoff_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    split_events_into_files(
        spark, sf_dir, src_dir, n_files=3, min_event_id=g_off + 1
    )
    q = stream_current_upsert_bootstrapped(
        spark,
        read_events_stream(spark, src_dir, max_files_per_trigger=1),
        state_root=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        snapshot=snap,
        snapshot_offset=s_off,
    )
    q.awaitTermination()
    state = load_bucketed_state(spark, os.path.join(work, "state"))
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return state.select(
        "original_id",
        F.col("original_id").alias("user_id"),
        "value",
        "event_type",
        "props_k",
        us("original_registered_at").alias("original_registered_at_us"),
        us("last_updated_at").alias("last_updated_at_us"),
    )


ORACLES["streaming_snapshot_handoff"] = ORACLES["cdc_current_snapshot"]


# ---------------------------------------------------------------------------
# Streaming schema evolution (r10 — VERDICT r9 ask #2): a widening DDL
# lands MID-STREAM and the bucketed upsert state widens in place between
# epochs — no restart, no replay, no state rewrite.
# ---------------------------------------------------------------------------


def _widen_wire(spark: SparkSession, sf_dir: str):
    """The mixed-vintage wire topic of cdc_schema_evolution_widen —
    ``amount_cents`` is INT before the mid-feed ALTER (offset T) and
    overflows into BIGINT territory after it — as (topic, partition,
    offset, value-JSON) rows, plus T.  Byte-identical construction to
    the batch query so the streaming result shares its ground truth."""
    from cdc_practice_spark.queries.cdc_queries import _events_max_offset

    ev = load_table(spark, sf_dir, "events")
    t = _events_max_offset(spark, sf_dir) // 2
    wire = ev.select(
        F.lit("dbserver1.bankdb.bank_accounts").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.to_json(
            F.struct(
                F.col("user_id").alias("id"),
                F.col("user_id").alias("user_id"),
                F.col("value").cast("string").alias("account"),
                F.col("ts").cast("string").alias("registered_at"),
                F.when(F.col("event_type") == "error", "true")
                .otherwise("false")
                .alias("__deleted"),
                (
                    F.round(F.col("value") * 100, 0).cast("long")
                    + F.when(F.col("event_id") > t, F.lit(5000000000))
                    .otherwise(F.lit(0))
                ).alias("amount_cents"),
            )
        ).alias("value"),
    )
    return wire, int(t)


def _split_frame_into_files(
    spark: SparkSession,
    df: DataFrame,
    order_col: str,
    out_dir: str,
    n_files: int = 3,
) -> None:
    """Write ``df`` as n single-file parquet chunks ordered by
    ``order_col`` ranges with monotone mtimes (the arrival-order
    contract every file-source replay relies on; last chunk open-ended,
    written counts asserted against the frame's)."""
    lo, hi = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).collect()[0]
    if hi is None:  # min/max of an empty frame aggregate to NULL —
        # fail loudly here instead of int(None)'s opaque TypeError
        raise ValueError("_split_frame_into_files: empty input frame")
    step = (int(hi) - int(lo)) // n_files + 1
    n = df.count()
    n_written = 0
    for i in range(n_files):
        chunk = df.filter(F.col(order_col) >= int(lo) + i * step)
        if i < n_files - 1:
            chunk = chunk.filter(F.col(order_col) < int(lo) + (i + 1) * step)
        _write_wire_chunk(spark, chunk, out_dir, i)
        n_written += spark.read.parquet(
            os.path.join(out_dir, f"chunk-{i:03d}.parquet")
        ).count()
    assert n_written == n, (
        f"_split_frame_into_files: chunks hold {n_written} of {n} rows"
    )


def _split_wire_into_files(
    spark: SparkSession, wire: DataFrame, out_dir: str, n_files: int = 3
) -> None:
    _split_frame_into_files(spark, wire, "offset", out_dir, n_files)


WIRE_FILE_SCHEMA = "topic string, partition int, offset long, value string"


def evolving_widen_setup(spark: SparkSession, sf_dir: str):
    """(base_schema, ddl_chain, normalize, payload_cols) for the widen
    scenario — shared by the registered query and the kill-resume test."""
    from pyspark.sql.types import IntegerType, LongType, StructField

    from cdc_practice_spark.schemas import (
        CHANGE_EVENT_SCHEMA,
        evolve_schema,
        widen_column,
    )

    _, t = _widen_wire(spark, sf_dir)
    base = evolve_schema(
        CHANGE_EVENT_SCHEMA, [StructField("amount_cents", IntegerType())]
    )
    ddl_chain = [
        (t + 1, lambda s: widen_column(s, "amount_cents", LongType()))
    ]

    def normalize(parsed: DataFrame) -> DataFrame:
        return parsed.select(
            "kafka_offset",
            F.col("id").alias("original_id"),
            F.col("account").cast("double").alias("value"),
            F.to_timestamp("registered_at")
            .cast("timestamp_ntz")
            .alias("registered_at"),
            "__deleted",
            "amount_cents",
        )

    return base, ddl_chain, normalize, ["value", "amount_cents"]


def evolved_state_schema():
    """The POST-DDL state StructType — the read schema that upcasts
    pre-DDL int32 bucket files in place."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    return StructType(
        [
            StructField("original_id", LongType()),
            StructField("value", DoubleType()),
            StructField("amount_cents", LongType()),
            StructField("original_registered_at", TimestampNTZType()),
            StructField("last_updated_at", TimestampNTZType()),
            StructField("last_offset", LongType()),
        ]
    )


_EVOLVE_ORACLE = """
WITH t AS (SELECT max(event_id) // 2 AS t FROM events),
feed AS (
  SELECT event_id AS kafka_offset,
         user_id AS original_id,
         value,
         ts AS registered_at,
         CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END
           AS __deleted,
         CAST(round(value * 100, 0) AS BIGINT)
           + CASE WHEN event_id > (SELECT t FROM t)
                  THEN 5000000000 ELSE 0 END AS amount_cents
  FROM events
),
typed AS (
  SELECT *,
         CASE WHEN __deleted = 'true' THEN 'DELETE'
              WHEN lag(__deleted) OVER w IS NULL
                OR lag(__deleted) OVER w = 'true' THEN 'INSERT'
              ELSE 'UPDATE' END AS change_type
  FROM feed
  WINDOW w AS (PARTITION BY original_id ORDER BY kafka_offset)
),
carried AS (
  SELECT *,
         last_value(CASE WHEN change_type = 'INSERT'
                         THEN registered_at END IGNORE NULLS)
           OVER (PARTITION BY original_id ORDER BY kafka_offset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS original_registered_at
  FROM typed
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
)
SELECT original_id,
       original_id AS user_id,
       value,
       amount_cents,
       epoch_us(original_registered_at) AS original_registered_at_us,
       epoch_us(registered_at) AS last_updated_at_us
FROM ranked
WHERE rn = 1 AND __deleted = 'false'
"""


@register("streaming_schema_evolution", oracle=_EVOLVE_ORACLE)
def streaming_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-stream widening DDL applied by the RUNNING stream (r10 —
    VERDICT r9 ask #2): the raw wire replays as 3 micro-batches through
    ``stream_current_upsert_evolving``; ``amount_cents`` is INT for the
    topic prefix and the recorded ALTER (offset T, mid-chunk-1 — so one
    epoch parses BOTH vintages) widens it to BIGINT.  The per-epoch
    parse schema resolves from the DDL chain, and the bucketed state
    widens IN PLACE between epochs via the parquet widening read —
    committed pre-DDL bucket files are never rewritten, exactly a
    lakehouse metadata-only type change.  The final state must
    full-hash equal the batch widened snapshot recomputed by DuckDB
    straight from ``events`` — a sink that kept the narrow type nulls
    every post-DDL amount (from_json overflow), loses the pre-DDL
    vintage, or breaks the registered_at carry across the boundary
    hash-fails.  Kill-resume ACROSS the DDL boundary is pinned in
    tests/test_schema_evolution.py."""
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        stream_current_upsert_evolving,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="evolve_stream_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    wire, _t = _widen_wire(spark, sf_dir)
    _split_wire_into_files(spark, wire, src_dir, n_files=3)
    base, ddl_chain, normalize, payload = evolving_widen_setup(spark, sf_dir)
    stream = (
        spark.readStream.schema(WIRE_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_current_upsert_evolving(
        spark,
        stream,
        state_root=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        base_schema=base,
        ddl_chain=ddl_chain,
        normalize=normalize,
        payload_cols=payload,
        n_buckets=8,
    )
    q.awaitTermination()
    state = load_bucketed_state(
        spark, os.path.join(work, "state"), read_schema=evolved_state_schema()
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return state.select(
        "original_id",
        F.col("original_id").alias("user_id"),
        "value",
        "amount_cents",
        us("original_registered_at").alias("original_registered_at_us"),
        us("last_updated_at").alias("last_updated_at_us"),
    )


# ---------------------------------------------------------------------------
# Transaction gate × partitioned topics, STREAMING (r10 — VERDICT r9 ask
# #3): the commit-order count-complete gate over a 4-partition feed with
# partition-local offsets and carried txn ids.
# ---------------------------------------------------------------------------

MP_FEED_FILE_SCHEMA = (
    "kafka_topic string, kafka_partition int, kafka_offset long, "
    "original_id long, event_type string, value double, "
    "registered_at timestamp_ntz, __deleted string, props_k int, "
    "txn long, _arrival long"
)


def _multipartition_gated_state(spark: SparkSession, sf_dir: str) -> str:
    """Run the multipartition txn-gated replay once per corpus and
    return the finished state root (memoized)."""
    from pyspark.sql import Window

    from cdc_practice_spark.plans.hints import _STATS_CACHE
    from cdc_practice_spark.queries.cdc_queries import _TXN_SIZE, _feed
    from cdc_practice_spark.streaming.pipeline import stream_txn_gated_feed

    cache_key = ("mp_txn_gated_state", sf_dir)
    if cache_key in _STATS_CACHE:
        return _STATS_CACHE[cache_key]
    events = load_table(spark, sf_dir, "events")
    max_off = events.agg(F.max("event_id").alias("m")).head().m
    w = int(max_off * 0.8) + 2
    # Debezium's transaction topic: per-txn declared event counts (the
    # END records), over the FULL feed — commit ids are global even
    # when the data topic is partitioned.  _TXN_SIZE is the oracle's
    # constant (this query hash-compares against cdc_txn_boundary_apply)
    declared = events.groupBy(
        F.expr(f"event_id div {_TXN_SIZE}").alias("txn")
    ).agg(F.count(F.lit(1)).alias("declared_c"))

    # the wire truth of a keyed 4-partition topic: each key's events in
    # ONE partition, offsets partition-local and dense, txn id carried
    # per event (cdc_multipartition_snapshot's re-shard + the capture
    # cut at w on ARRIVAL order)
    feed = (
        _feed(spark, sf_dir)
        .withColumn("txn", F.expr(f"kafka_offset div {_TXN_SIZE}"))
        .withColumn("_arrival", F.col("kafka_offset"))
        .filter(F.col("kafka_offset") <= w)
    )
    part = F.pmod(F.xxhash64(F.col("original_id")), F.lit(4)).cast("int")
    wpart = Window.partitionBy("_kpart").orderBy("_arrival")
    mp = (
        feed.withColumn("_kpart", part)
        .withColumn("_loc", (F.row_number().over(wpart) - 1).cast("long"))
        .select(
            "kafka_topic",
            F.col("_kpart").alias("kafka_partition"),
            F.col("_loc").alias("kafka_offset"),
            "original_id",
            "event_type",
            "value",
            "registered_at",
            "__deleted",
            "props_k",
            "txn",
            "_arrival",
        )
    )
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="mp_txn_gated_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    _split_frame_into_files(spark, mp, "_arrival", src_dir, n_files=4)
    stream = (
        spark.readStream.schema(MP_FEED_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_txn_gated_feed(
        spark,
        stream,
        state_root=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        declared_txn_counts=declared,
        txn_col="txn",
    )
    q.awaitTermination()
    _STATS_CACHE[cache_key] = os.path.join(work, "state")
    return _STATS_CACHE[cache_key]


@register("streaming_txn_gated_multipartition", oracle=None)
def streaming_txn_gated_multipartition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The streaming transaction gate composed with PARTITION-LOCAL
    coordinates (r10 — VERDICT r9 ask #3): the capture-cut feed is
    re-sharded into 4 key-hashed partitions with partition-local dense
    offsets (the wire truth of a keyed Debezium topic — no global
    offset exists), each event carries its transaction id, and the
    4-micro-batch replay gates on per-txn COUNT-completeness plus
    commit-order release (stream_txn_gated_feed).  Trigger boundaries
    cut inside transactions AND partitions interleave inside every
    chunk, so the gate must buffer partial txns across epochs without
    any offset-prefix crutch.  Final state must equal the batch gate
    over the single-partition feed exactly — full-hash identity with
    cdc_txn_boundary_apply's oracle (assigned below)."""
    from cdc_practice_spark.streaming.pipeline import load_bucketed_state

    state = load_bucketed_state(
        spark, _multipartition_gated_state(spark, sf_dir)
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return state.select(
        "original_id",
        F.col("original_id").alias("user_id"),
        "value",
        "event_type",
        "props_k",
        us("original_registered_at").alias("original_registered_at_us"),
        us("last_updated_at").alias("last_updated_at_us"),
    )


ORACLES["streaming_txn_gated_multipartition"] = ORACLES["cdc_txn_boundary_apply"]


# ---------------------------------------------------------------------------
# Triage→purge composition (r10 — VERDICT r9 ask #6): the multi-signal
# contamination report drives the retroactive purge of the ingest store,
# exactly like the 8-gram retro audit does.
# ---------------------------------------------------------------------------

# The triage surface flags for REVIEW/PURGE at a more conservative
# semantic threshold than the hard decontamination tau (0.35): paraphrase
# contamination near the boundary is exactly what a multi-signal triage
# exists to catch.  0.30 keeps the flagged∩kept set nonempty AND proper
# at all 3 SFs (6/1/31 of 27/24/216 kept docs).
_REPORT_PURGE_TAU = 0.30


def _report_flagged_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed flag set: any of the three contamination signals
    (exact fingerprint, shared 8-gram, embedding cosine >= the triage
    tau) against the doc_id % 97 benchmark — corpus_contamination_report's
    rules on the shared Arrow feature pass, with the semantic rule at
    the triage threshold."""
    from cdc_practice_spark.operators import similarity as S
    from cdc_practice_spark.operators.corpus import corpus_features
    from cdc_practice_spark.plans.cache import tracked_persist
    from cdc_practice_spark.session import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 97 == 0
    feats = tracked_persist(
        corpus_features(docs).select("doc_id", is_bench.alias("_b"), "fp", "g8")
    )
    f_hit = (
        feats.filter(~F.col("_b"))
        .join(
            F.broadcast(feats.filter(F.col("_b")).select("fp").distinct()),
            "fp",
            "left_semi",
        )
        .select("doc_id")
    )
    bench_g = (
        feats.filter(F.col("_b")).select(F.explode("g8").alias("g")).distinct()
    )
    g_hit = (
        feats.filter(~F.col("_b"))
        .select("doc_id", F.explode("g8").alias("g"))
        .join(F.broadcast(bench_g), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    emb = _lt(spark, sf_dir, "embeddings")
    bench_v = (
        emb.filter(F.col("vec_id") % 97 == 0)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    s_hit = (
        S.batch_topk_mapinpandas(
            emb.filter(F.col("vec_id") % 97 != 0),
            [list(r.embedding) for r in bench_v],
        )
        .filter(F.round(F.col("best_cosine"), 6) >= F.lit(_REPORT_PURGE_TAU))
        .select(F.col("vec_id").alias("doc_id"))
    )
    return f_hit.unionByName(g_hit).unionByName(s_hit).distinct()


def _report_purged_store(spark: SparkSession, sf_dir: str) -> str:
    """Clone the finished ingest store, run the multi-signal report, and
    APPLY its flags as a purge — memoized per corpus."""
    import shutil

    from cdc_practice_spark.plans.hints import _STATS_CACHE
    from cdc_practice_spark.streaming.corpus import purge_ingest_docs

    key = ("corpus_report_purge_store", sf_dir)
    if key in _STATS_CACHE:
        return _STATS_CACHE[key]
    src_store = _corpus_ingest_store(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="report_purge_", dir=TMP_ROOT)
    store = os.path.join(work, "store")
    shutil.copytree(src_store, store)
    purge_ingest_docs(spark, store, _report_flagged_ids(spark, sf_dir))
    _STATS_CACHE[key] = store
    return store


def _report_purge_oracle() -> str:
    from cdc_practice_spark.queries.pipeline_queries import _e2e_incr_chain
    from cdc_practice_spark.queries.similarity_queries import _COS_RAW

    return (
        _e2e_incr_chain()
        + f""", bl_fp AS (SELECT DISTINCT fp FROM feat WHERE doc_id % 97 = 0),
f_hit AS (
  SELECT doc_id FROM feat
  WHERE doc_id % 97 <> 0 AND fp IN (SELECT fp FROM bl_fp)
),
bench_v AS (
  SELECT vec_id AS bench_id, embedding AS bv
  FROM embeddings WHERE vec_id % 97 = 0
),
s_hit AS (
  SELECT vec_id AS doc_id FROM (
    SELECT e.vec_id,
           max({_COS_RAW.format(a='e.embedding', b='b.bv')}) AS mc
    FROM embeddings e, bench_v b
    WHERE e.vec_id % 97 <> 0
    GROUP BY 1
  ) WHERE round(mc, 6) >= {_REPORT_PURGE_TAU}
),
flagged AS (
  -- explicit DISTINCT over UNION ALL: inside this WITH RECURSIVE
  -- chain DuckDB did NOT dedup the bare chained UNION, so a doc
  -- flagged by two rules (first seen at sf0.1: fp + semantic) joined
  -- b5 twice and duplicated its disposition row
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id FROM f_hit
    UNION ALL SELECT doc_id FROM contaminated WHERE doc_id % 97 <> 0
    UNION ALL SELECT doc_id FROM s_hit
  )
),
flag_kept AS MATERIALIZED (
  SELECT b5.doc_id FROM flagged JOIN b5 USING (doc_id)
),
b6 AS MATERIALIZED (
  SELECT * FROM b5 WHERE doc_id NOT IN (SELECT doc_id FROM flag_kept)
),
toks3 AS MATERIALIZED (
  SELECT source, doc_id, n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn3
  FROM b6
),
packed2 AS (
  SELECT source, doc_id, n_tokens, rn3,
         CAST(0 AS BIGINT) AS bin_id, n_tokens AS bin_fill
  FROM toks3 WHERE rn3 = 1
  UNION ALL
  SELECT t.source, t.doc_id, t.n_tokens, t.rn3,
         CASE WHEN p.bin_fill + t.n_tokens > 256
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.bin_fill + t.n_tokens > 256
              THEN t.n_tokens ELSE p.bin_fill + t.n_tokens END
  FROM toks3 t JOIN packed2 p ON t.source = p.source AND t.rn3 = p.rn3 + 1
)
SELECT f.doc_id, f.source, f.n_tokens,
       CASE WHEN r.doc_id IS NOT NULL THEN 'purged_contaminated'
            WHEN b1.doc_id IS NULL THEN 'dropped_lang'
            WHEN b2.doc_id IS NULL THEN 'dropped_quality'
            WHEN b3.doc_id IS NULL THEN 'dropped_dup'
            WHEN b4.doc_id IS NULL THEN 'dropped_contaminated'
            WHEN b5.doc_id IS NULL THEN 'dropped_mix'
            ELSE 'kept' END AS disposition,
       p2.bin_id, p2.bin_fill
FROM feat f
LEFT JOIN b1 USING (doc_id)
LEFT JOIN b2 USING (doc_id)
LEFT JOIN b3 USING (doc_id)
LEFT JOIN b4 USING (doc_id)
LEFT JOIN b5 USING (doc_id)
LEFT JOIN flag_kept r USING (doc_id)
LEFT JOIN packed2 p2 USING (doc_id)
WHERE f.is_batch
ORDER BY f.doc_id
"""
    )


@register("corpus_purge_from_report", oracle=_report_purge_oracle())
def corpus_purge_from_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The triage→purge loop CLOSED (r10 — VERDICT r9 ask #6): the
    multi-signal contamination report's flags feed
    ``purge_ingest_docs`` as ONE composed surface, exactly like the
    retroactive 8-gram list does in corpus_purge_apply — flagged
    admitted docs are un-admitted in place (index + gram rows deleted,
    dispositions flipped, only affected sources repacked) and the query
    returns the store's post-purge disposition table.  The DuckDB
    oracle recomputes the entire ingest WITHOUT ever admitting the
    flagged docs, so the full-hash match proves the composition is
    byte-equivalent to the never-admitted rebuild.

    What the composition buys over the store's own ingest-time 8-gram
    rule: the exact-fingerprint signal catches benchmark copies TOO
    SHORT to carry an 8-gram (4/0/19 kept docs at the 3 SFs — real
    misses of the ingest gate), and the triage-tau semantic signal
    catches paraphrases no lexical rule sees (2/1/14).  The purge
    itself is O(purge + affected-source rows) — never a store
    rebuild."""
    from cdc_practice_spark.streaming.corpus import load_ingest_dispositions

    store = _report_purged_store(spark, sf_dir)
    return load_ingest_dispositions(spark, store).orderBy("doc_id")


def _add_wire(spark: SparkSession, sf_dir: str):
    """The mixed-vintage wire of cdc_schema_evolution (ADD direction):
    ``account_type`` exists only after the mid-feed ALTER at offset T
    (to_json drops nulls, so pre-DDL events simply lack the field)."""
    from cdc_practice_spark.queries.cdc_queries import _events_max_offset

    ev = load_table(spark, sf_dir, "events")
    t = _events_max_offset(spark, sf_dir) // 2
    wire = ev.select(
        F.lit("dbserver1.bankdb.bank_accounts").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.to_json(
            F.struct(
                F.col("user_id").alias("id"),
                F.col("user_id").alias("user_id"),
                F.col("value").cast("string").alias("account"),
                F.col("ts").cast("string").alias("registered_at"),
                F.when(F.col("event_type") == "error", "true")
                .otherwise("false")
                .alias("__deleted"),
                F.when(
                    F.col("event_id") > t,
                    F.when(F.col("user_id") % 2 == 0, "checking").otherwise(
                        "savings"
                    ),
                ).alias("account_type"),
            )
        ).alias("value"),
    )
    return wire, int(t)


@register(
    "streaming_schema_evolution_add",
    oracle="""
WITH t AS (SELECT max(event_id) // 2 AS t FROM events),
feed AS (
  SELECT event_id AS kafka_offset,
         user_id AS original_id,
         value,
         ts AS registered_at,
         CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END
           AS __deleted,
         CASE WHEN event_id > (SELECT t FROM t)
              THEN CASE WHEN user_id % 2 = 0 THEN 'checking'
                        ELSE 'savings' END
         END AS account_type
  FROM events
),
typed AS (
  SELECT *,
         CASE WHEN __deleted = 'true' THEN 'DELETE'
              WHEN lag(__deleted) OVER w IS NULL
                OR lag(__deleted) OVER w = 'true' THEN 'INSERT'
              ELSE 'UPDATE' END AS change_type
  FROM feed
  WINDOW w AS (PARTITION BY original_id ORDER BY kafka_offset)
),
carried AS (
  SELECT *,
         last_value(CASE WHEN change_type = 'INSERT'
                         THEN registered_at END IGNORE NULLS)
           OVER (PARTITION BY original_id ORDER BY kafka_offset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS original_registered_at
  FROM typed
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
)
SELECT original_id,
       original_id AS user_id,
       value,
       account_type,
       epoch_us(original_registered_at) AS original_registered_at_us,
       epoch_us(registered_at) AS last_updated_at_us
FROM ranked
WHERE rn = 1 AND __deleted = 'false'
""",
)
def streaming_schema_evolution_add(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mid-stream ADD-column DDL applied by the running stream (the
    other direction VERDICT r9 ask #2 named beside widen): the wire
    gains ``account_type`` at offset T; epochs before the DDL parse and
    merge WITHOUT the column (state buckets lack it entirely), the
    first epoch at or past T resolves the evolved schema and the
    bucketed state gains the column in place — pre-DDL bucket files
    null-fill it through the explicit read schema, nothing is
    rewritten, and a key never updated after the DDL reports NULL
    (exactly the batch cdc_schema_evolution semantics, now under
    micro-batch boundaries).  Full-hash oracle vs the batch snapshot
    with the typed column recomputed straight from ``events``."""
    from pyspark.sql.types import StringType, StructField

    from cdc_practice_spark.schemas import CHANGE_EVENT_SCHEMA, evolve_schema
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        stream_current_upsert_evolving,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="evolve_add_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    wire, t = _add_wire(spark, sf_dir)
    _split_wire_into_files(spark, wire, src_dir, n_files=3)
    ddl_chain = [
        (
            t + 1,
            lambda s: evolve_schema(
                s, [StructField("account_type", StringType())]
            ),
        )
    ]

    def normalize(parsed: DataFrame) -> DataFrame:
        cols = [
            F.col("kafka_offset"),
            F.col("id").alias("original_id"),
            F.col("account").cast("double").alias("value"),
            F.to_timestamp("registered_at")
            .cast("timestamp_ntz")
            .alias("registered_at"),
            F.col("__deleted"),
        ]
        if "account_type" in parsed.columns:
            cols.append(F.col("account_type"))
        # pre-DDL epochs: the column does not exist yet — the STATE
        # gains it only once the DDL lands (the sink's effective-payload
        # rule; earlier bucket files null-fill through the widened read)
        return parsed.select(*cols)

    stream = (
        spark.readStream.schema(WIRE_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_current_upsert_evolving(
        spark,
        stream,
        state_root=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        base_schema=CHANGE_EVENT_SCHEMA,
        ddl_chain=ddl_chain,
        normalize=normalize,
        payload_cols=["value", "account_type"],
        n_buckets=8,
    )
    q.awaitTermination()
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructType,
        TimestampNTZType,
    )

    read_schema = StructType(
        [
            StructField("original_id", LongType()),
            StructField("value", DoubleType()),
            StructField("account_type", StringType()),
            StructField("original_registered_at", TimestampNTZType()),
            StructField("last_updated_at", TimestampNTZType()),
            StructField("last_offset", LongType()),
        ]
    )
    state = load_bucketed_state(
        spark, os.path.join(work, "state"), read_schema=read_schema
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return state.select(
        "original_id",
        F.col("original_id").alias("user_id"),
        "value",
        "account_type",
        us("original_registered_at").alias("original_registered_at_us"),
        us("last_updated_at").alias("last_updated_at_us"),
    )


@register(
    "streaming_schema_evolution_rename",
    oracle="""
WITH t AS (SELECT max(event_id) // 2 AS t FROM events),
feed AS (
  SELECT event_id AS kafka_offset,
         user_id AS original_id,
         value,
         ts AS registered_at,
         CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END
           AS __deleted
  FROM events
),
typed AS (
  SELECT *,
         CASE WHEN __deleted = 'true' THEN 'DELETE'
              WHEN lag(__deleted) OVER w IS NULL
                OR lag(__deleted) OVER w = 'true' THEN 'INSERT'
              ELSE 'UPDATE' END AS change_type
  FROM feed
  WINDOW w AS (PARTITION BY original_id ORDER BY kafka_offset)
),
carried AS (
  SELECT *,
         last_value(CASE WHEN change_type = 'INSERT'
                         THEN registered_at END IGNORE NULLS)
           OVER (PARTITION BY original_id ORDER BY kafka_offset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS original_registered_at
  FROM typed
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
)
SELECT original_id,
       original_id AS user_id,
       value AS balance,
       kafka_offset > (SELECT t FROM t) AS from_renamed,
       epoch_us(original_registered_at) AS original_registered_at_us,
       epoch_us(registered_at) AS last_updated_at_us
FROM ranked
WHERE rn = 1 AND __deleted = 'false'
""",
)
def streaming_schema_evolution_rename(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mid-stream RENAME DDL applied by the running stream (the third
    direction, after widen and add): the wire writes ``account`` before
    offset T and ``balance`` after; the recorded DDL swaps the parse
    schema to rename_columns' dual-field form BETWEEN epochs, the
    normalizer unifies with coalesce(new, old) per the schema's own
    rename metadata, and the merged state is VALUE-CONTINUOUS per key
    across the boundary — a key written in both vintages keeps one
    unbroken balance history, and ``from_renamed`` records which
    vintage the key's LAST event arrived in (pre-DDL bucket files
    null-fill the flag through the widened read; the reader defaults it
    to false).  Full-hash oracle vs the batch snapshot recomputed from
    ``events``."""
    from cdc_practice_spark.schemas import CHANGE_EVENT_SCHEMA, rename_columns
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        stream_current_upsert_evolving,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="evolve_rename_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    from cdc_practice_spark.queries.cdc_queries import _events_max_offset

    ev = load_table(spark, sf_dir, "events")
    t = _events_max_offset(spark, sf_dir) // 2
    wire = ev.select(
        F.lit("dbserver1.bankdb.bank_accounts").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.to_json(
            F.struct(
                F.col("user_id").alias("id"),
                F.col("user_id").alias("user_id"),
                # the RENAME: pre-T events write `account`, post-T
                # events write `balance` — never both
                F.when(F.col("event_id") <= t, F.col("value").cast("string"))
                .alias("account"),
                F.when(F.col("event_id") > t, F.col("value").cast("string"))
                .alias("balance"),
                F.col("ts").cast("string").alias("registered_at"),
                F.when(F.col("event_type") == "error", "true")
                .otherwise("false")
                .alias("__deleted"),
            )
        ).alias("value"),
    )
    _split_wire_into_files(spark, wire, src_dir, n_files=3)
    ddl_chain = [
        (int(t) + 1, lambda s: rename_columns(s, {"account": "balance"}))
    ]

    def normalize(parsed: DataFrame) -> DataFrame:
        pairs = dict()
        # reader-side unification straight from the epoch schema's
        # rename metadata — pre-DDL epochs have no pairs and read the
        # old name directly
        # (parsed carries the epoch's parse schema)
        for f in parsed.schema.fields:
            if f.metadata and "renamed_from" in f.metadata:
                pairs[f.name] = f.metadata["renamed_from"]
        if pairs:
            ((new, old),) = pairs.items()
            balance = F.coalesce(F.col(new), F.col(old))
            from_renamed = F.col(new).isNotNull()
        else:
            balance = F.col("account")
            from_renamed = F.lit(False)
        return parsed.select(
            "kafka_offset",
            F.col("id").alias("original_id"),
            balance.cast("double").alias("balance"),
            F.to_timestamp("registered_at")
            .cast("timestamp_ntz")
            .alias("registered_at"),
            "__deleted",
            from_renamed.alias("from_renamed"),
        )

    stream = (
        spark.readStream.schema(WIRE_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_current_upsert_evolving(
        spark,
        stream,
        state_root=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        base_schema=CHANGE_EVENT_SCHEMA,
        ddl_chain=ddl_chain,
        normalize=normalize,
        payload_cols=["balance", "from_renamed"],
        n_buckets=8,
    )
    q.awaitTermination()
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    read_schema = StructType(
        [
            StructField("original_id", LongType()),
            StructField("balance", DoubleType()),
            StructField("from_renamed", BooleanType()),
            StructField("original_registered_at", TimestampNTZType()),
            StructField("last_updated_at", TimestampNTZType()),
            StructField("last_offset", LongType()),
        ]
    )
    state = load_bucketed_state(
        spark, os.path.join(work, "state"), read_schema=read_schema
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return state.select(
        "original_id",
        F.col("original_id").alias("user_id"),
        "balance",
        F.coalesce("from_renamed", F.lit(False)).alias("from_renamed"),
        us("original_registered_at").alias("original_registered_at_us"),
        us("last_updated_at").alias("last_updated_at_us"),
    )


@register(
    "streaming_schema_evolution_drop",
    oracle="""
WITH t AS (SELECT max(event_id) // 2 AS t FROM events),
feed AS (
  SELECT event_id AS kafka_offset,
         user_id AS original_id,
         CASE WHEN event_id <= (SELECT t FROM t) THEN value END AS v,
         ts AS registered_at,
         CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END
           AS __deleted
  FROM events
),
typed AS (
  SELECT *,
         CASE WHEN __deleted = 'true' THEN 'DELETE'
              WHEN lag(__deleted) OVER w IS NULL
                OR lag(__deleted) OVER w = 'true' THEN 'INSERT'
              ELSE 'UPDATE' END AS change_type
  FROM feed
  WINDOW w AS (PARTITION BY original_id ORDER BY kafka_offset)
),
seg AS (
  SELECT original_id,
         max(kafka_offset) AS last_offset,
         max_by(registered_at, kafka_offset) AS last_ts,
         max_by(__deleted, kafka_offset) AS last_deleted,
         max(CASE WHEN change_type = 'INSERT' THEN kafka_offset END) AS li
  FROM typed GROUP BY original_id
),
cv AS (
  SELECT s.original_id, max_by(t2.v, t2.kafka_offset) AS value_carried
  FROM seg s JOIN typed t2
    ON t2.original_id = s.original_id
   AND t2.v IS NOT NULL AND t2.kafka_offset >= s.li
  GROUP BY s.original_id
),
ins AS (
  SELECT s.original_id, t3.registered_at AS ins_ts
  FROM seg s JOIN typed t3
    ON t3.original_id = s.original_id AND t3.kafka_offset = s.li
)
SELECT s.original_id,
       s.original_id AS user_id,
       cv.value_carried,
       s.last_offset,
       epoch_us(ins.ins_ts) AS original_registered_at_us,
       epoch_us(s.last_ts) AS last_updated_at_us
FROM seg s
LEFT JOIN cv USING (original_id)
JOIN ins USING (original_id)
WHERE s.last_deleted = 'false'
""",
)
def streaming_schema_evolution_drop(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mid-stream DROP DDL applied by the running stream — the FOURTH
    direction, completing add/drop/rename/widen under micro-batch
    boundaries: the wire omits ``account`` after offset T (the upstream
    DROP), the engine RETIRES the column (schemas.retire_columns — the
    read schema keeps it, post-DDL events null-fill), and the bucketed
    state CARRIES the retired value forward per live row via
    merge_batch's carry rule: last non-null value at or after the key's
    last INSERT, falling back to the state's carried value when a batch
    contributes nothing.  The carry deliberately resets at re-insert (a
    re-inserted row has no memory of its deleted predecessor — the
    reference's row lifetime; the batch history query
    cdc_schema_evolution_drop keeps the non-resetting HISTORY carry,
    which a snapshot state cannot chunk-invariantly maintain).  The
    oracle recomputes exactly that invariant from ``events``, so any
    chunking dependence in the carry hash-fails across the 3-epoch
    replay."""
    from cdc_practice_spark.schemas import CHANGE_EVENT_SCHEMA, retire_columns
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        stream_current_upsert_evolving,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="evolve_drop_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    from cdc_practice_spark.queries.cdc_queries import _events_max_offset

    ev = load_table(spark, sf_dir, "events")
    t = _events_max_offset(spark, sf_dir) // 2
    wire = ev.select(
        F.lit("dbserver1.bankdb.bank_accounts").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.to_json(
            F.struct(
                F.col("user_id").alias("id"),
                F.col("user_id").alias("user_id"),
                # the DROP: post-T events omit `account` on the wire
                F.when(F.col("event_id") <= t, F.col("value").cast("string"))
                .alias("account"),
                F.col("ts").cast("string").alias("registered_at"),
                F.when(F.col("event_type") == "error", "true")
                .otherwise("false")
                .alias("__deleted"),
            )
        ).alias("value"),
    )
    _split_wire_into_files(spark, wire, src_dir, n_files=3)
    # retirement is READ-SCHEMA metadata from day one: the one schema
    # parses both vintages; there is no parse-side DDL to sequence
    schema = retire_columns(CHANGE_EVENT_SCHEMA, ["account"])

    def normalize(parsed: DataFrame) -> DataFrame:
        return parsed.select(
            "kafka_offset",
            F.col("id").alias("original_id"),
            F.col("account").cast("double").alias("value_carried"),
            F.to_timestamp("registered_at")
            .cast("timestamp_ntz")
            .alias("registered_at"),
            "__deleted",
        )

    stream = (
        spark.readStream.schema(WIRE_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_current_upsert_evolving(
        spark,
        stream,
        state_root=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        base_schema=schema,
        ddl_chain=[],
        normalize=normalize,
        payload_cols=["value_carried"],
        n_buckets=8,
        carry_cols=("value_carried",),
    )
    q.awaitTermination()
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    read_schema = StructType(
        [
            StructField("original_id", LongType()),
            StructField("value_carried", DoubleType()),
            StructField("original_registered_at", TimestampNTZType()),
            StructField("last_updated_at", TimestampNTZType()),
            StructField("last_offset", LongType()),
        ]
    )
    state = load_bucketed_state(
        spark, os.path.join(work, "state"), read_schema=read_schema
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return state.select(
        "original_id",
        F.col("original_id").alias("user_id"),
        "value_carried",
        "last_offset",
        us("original_registered_at").alias("original_registered_at_us"),
        us("last_updated_at").alias("last_updated_at_us"),
    )


# ---------------------------------------------------------------------------
# Streaming DDL × transaction gate COMPOSED (r11 — VERDICT r10 ask #6):
# a widening DDL that lands mid-transaction takes effect only with the
# transaction's RELEASE (schema resolved by released frontier, never by
# batch max offset).
# ---------------------------------------------------------------------------


def _write_wire_chunk(spark: SparkSession, df: DataFrame, out_dir: str, idx: int) -> None:
    """One single-file wire chunk with monotone mtime (the arrival-order
    contract _split_frame_into_files establishes, for a CUSTOM cut)."""
    part = os.path.join(out_dir, f"_part{idx}")
    df.coalesce(1).write.mode("overwrite").parquet(part)
    src = next(f for f in os.listdir(part) if f.endswith(".parquet"))
    os.rename(
        os.path.join(part, src),
        os.path.join(out_dir, f"chunk-{idx:03d}.parquet"),
    )
    shutil.rmtree(part)
    time.sleep(0.05)


@register("streaming_txn_gated_evolving", oracle=None)
def streaming_txn_gated_evolving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DDL×gate composition end-to-end on the fixture wire (r11 —
    VERDICT r10 ask #6; sink: streaming/pipeline.py::
    stream_txn_gated_evolving): the widen-scenario wire replays in two
    chunks CUT MID-TRANSACTION — the first chunk ends one event short
    of completing the transaction containing the ALTER's effective
    offset, so epoch 0 must hold that whole transaction and keep
    parsing under the narrow pre-DDL schema.  Whenever the fixture
    geometry allows (the ALTER is not its transaction's last event —
    true unless t+1 ≡ last-of-txn at that SF), chunk 1's raw max offset
    is already PAST the ALTER, so batch-max schema resolution would
    have widened early — the exact bug this composition closes; the
    sharp case is additionally pinned unconditionally on a synthetic
    wire in tests/test_schema_evolution.py.  When the second chunk
    completes the transaction, the DDL takes effect with its release
    and the state widens in place.

    The final state must full-hash equal the batch widened snapshot
    (the streaming_schema_evolution oracle, shared): every transaction
    is declared complete by end of feed, so the gate drains fully and
    the composed sink converges to the plain evolving sink's answer —
    while never having exposed a torn transaction or a premature
    schema.  The DDL-splits-a-txn holdback itself (mid-run narrow
    physical types, pending buffer contents) is pinned in
    tests/test_schema_evolution.py."""
    from cdc_practice_spark.streaming.pipeline import (
        load_bucketed_state,
        stream_txn_gated_evolving,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="gated_evolve_", dir=TMP_ROOT)
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    wire, t = _widen_wire(spark, sf_dir)
    base, ddl_chain, normalize, payload = evolving_widen_setup(spark, sf_dir)
    txn_size = 5
    # cut one event short of completing the ALTER's transaction: its
    # whole txn (and everything after) holds until chunk 2
    txn0 = (t + 1) // txn_size
    in_txn0 = [
        r.offset
        for r in wire.filter(
            F.expr(f"offset div {txn_size}") == txn0
        ).select("offset").collect()
    ]  # ≤ txn_size rows — index-sized
    # always exclude txn0's last event from chunk 1 so the txn is held
    # (a cut AT the last event would complete it and hold nothing)
    cut = max(in_txn0) - 1
    _write_wire_chunk(spark, wire.filter(F.col("offset") <= cut), src_dir, 0)
    _write_wire_chunk(spark, wire.filter(F.col("offset") > cut), src_dir, 1)

    ev = load_table(spark, sf_dir, "events")
    declared = ev.select(F.col("event_id").alias("kafka_offset"))
    stream = (
        spark.readStream.schema(WIRE_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_txn_gated_evolving(
        spark,
        stream,
        state_root=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        base_schema=base,
        ddl_chain=ddl_chain,
        normalize=normalize,
        payload_cols=payload,
        declared_offsets=declared,
        txn_size=txn_size,
        n_buckets=8,
    )
    q.awaitTermination()
    state = load_bucketed_state(
        spark, os.path.join(work, "state"), read_schema=evolved_state_schema()
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return state.select(
        "original_id",
        F.col("original_id").alias("user_id"),
        "value",
        "amount_cents",
        us("original_registered_at").alias("original_registered_at_us"),
        us("last_updated_at").alias("last_updated_at_us"),
    )


ORACLES["streaming_txn_gated_evolving"] = _EVOLVE_ORACLE


def _extract_ingest_oracle() -> str:
    """The incremental curation chain computed over EXTRACTED text: the
    exdocs CTE applies the field-derived extraction expectation
    (pipeline_queries._EXTRACT_BODY_SQL) to every document, and the
    whole disposition recomputation — lang, quality quantile, near-dup
    index, 8-gram blocklist, mixture, packing — runs against it."""
    from cdc_practice_spark.queries.pipeline_queries import (
        _EXTRACT_BODY_SQL,
        _e2e_incr_oracle,
    )

    prefix = (
        "exdocs AS MATERIALIZED (\n"
        f"  SELECT doc_id, source, {_EXTRACT_BODY_SQL} AS text\n"
        "  FROM documents\n"
        "),\n"
    )
    return _e2e_incr_oracle(docs_rel="exdocs", prefix_cte=prefix)


def _extracted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents fixture as EXTRACTED text — what every stage of
    the extract-composed pipeline (calibration, blocklist, ingest,
    shard tokenization) sees."""
    from cdc_practice_spark.operators.extraction import (
        html_to_text,
        synth_html_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn(
        "text",
        html_to_text(
            synth_html_expr(F.col("doc_id"), F.col("source"), F.col("text"))
        ),
    )


def _extract_ingest_store(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus) the streaming ingest store whose feed is
    RAW synthesized pages with extraction running in-stream — shared by
    the disposition query and the extract-to-shards delivery query."""
    from cdc_practice_spark.functions import text as T
    from cdc_practice_spark.operators import dedup as D
    from cdc_practice_spark.operators.corpus import (
        DECON_GRAM_K,
        corpus_features,
        freeze_corpus_stats,
    )
    from cdc_practice_spark.operators.extraction import (
        html_to_text,
        synth_html_expr,
    )
    from cdc_practice_spark.plans.cache import tracked_persist
    from cdc_practice_spark.plans.hints import _STATS_CACHE
    from cdc_practice_spark.queries.pipeline_queries import _INCR_BATCH_MOD
    from cdc_practice_spark.streaming.corpus import (
        seed_ingest_index,
        stream_corpus_ingest,
    )

    key = ("extract_ingest_store", sf_dir)
    if key in _STATS_CACHE:
        return _STATS_CACHE[key]
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="extract_ingest_", dir=TMP_ROOT)
    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % _INCR_BATCH_MOD == 3
    # extracted view of the WHOLE corpus — what every calibration
    # and the blocklist see (the production posture: no stage ever
    # reads raw markup except the extractor itself)
    extracted = _extracted_docs(spark, sf_dir)
    src = os.path.join(work, "src")
    os.makedirs(src)
    # the stream ships RAW PAGES; extraction happens in-stream
    pages = docs.filter(is_batch).withColumn(
        "text",
        synth_html_expr(F.col("doc_id"), F.col("source"), F.col("text")),
    )
    _split_docs_batch_into_files(spark, pages, src)

    feats_c = tracked_persist(corpus_features(extracted.filter(~is_batch)))
    blocklist = [
        int(r["g"])
        for r in extracted.filter(F.col("doc_id") % 97 == 0)
        .select(T.tokens(F.col("text")).alias("_toks"))
        .select(
            F.explode(
                D.shingles_from_tokens(F.col("_toks"), k=DECON_GRAM_K)
            ).alias("s")
        )
        .select(D.token_hash60(F.col("s")).alias("g"))
        .distinct()
        .collect()
    ]
    stats = freeze_corpus_stats(feats_c, blocklist)
    store = os.path.join(work, "store")
    seed_ingest_index(spark, feats_c, store, stats.q25)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("text", html_to_text(F.col("text")))
    )
    q = stream_corpus_ingest(
        spark, stream, stats, store, os.path.join(work, "ckpt")
    )
    q.awaitTermination()
    _STATS_CACHE[key] = store
    return store


@register("streaming_extract_ingest", oracle=_extract_ingest_oracle())
def streaming_extract_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's FIRST stage composed with the streaming sink
    (r12): raw crawled pages — the deterministic synthetic HTML fixture
    — arrive as the stream, structural extraction
    (operators/extraction.py::html_to_text) runs as a codegen
    projection ON THE STREAM before the curation sink, and the
    maintained store's dispositions must match the batch chain computed
    over extracted text from scratch (full-hash oracle).  The standing
    corpus' frozen stats (quality quantile, mixture rates, blocklist
    grams) are likewise calibrated on EXTRACTED text, as a production
    ingest would be: extraction changes quality scores (the markup h1
    payload carries real punctuation), token counts, shingles, and
    8-grams, so this is a genuinely different curation trajectory from
    streaming_corpus_ingest — not the same rows re-keyed.

    At 100 TB: extraction adds zero shuffles and zero Python — the
    strip chain fuses into the stream's existing per-batch feature
    projection (one pass over arriving pages)."""
    from cdc_practice_spark.streaming.corpus import load_ingest_dispositions

    store = _extract_ingest_store(spark, sf_dir)
    return load_ingest_dispositions(spark, store).orderBy("doc_id")


def _extract_shards_oracle() -> str:
    from cdc_practice_spark.queries.pipeline_queries import _EXTRACT_BODY_SQL

    prefix = (
        "exdocs AS MATERIALIZED (\n"
        f"  SELECT doc_id, source, {_EXTRACT_BODY_SQL} AS text\n"
        "  FROM documents\n"
        "),\n"
    )
    return _shard_export_oracle(docs_rel="exdocs", prefix_cte=prefix)


@register("streaming_extract_to_shards", oracle=_extract_shards_oracle())
def streaming_extract_to_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-data pipeline as one continuous flow (r12
    capstone): raw crawled pages stream IN, training shards stream OUT.
    Composes the round's three new streaming pieces end-to-end — raw
    pages → in-stream extraction → curation sink (maintained store) →
    per-epoch sealed-shard delivery (streaming/shard_export.py, one
    export call per committed epoch + the finalize flush), over the
    extract-calibrated frozen stats.  The DuckDB oracle recomputes
    EVERYTHING from scratch — extraction, lang/quality/near-dup/
    decontamination/mixture, greedy packing, shard assignment, and the
    order-sensitive position-weighted token digests — so one wrong
    strip rule, curation decision, bin boundary, or token position
    anywhere in the composed flow flips a shard digest.

    Scale posture: each stage has already argued its 100 TB shape
    individually (SCALE.md); the composition adds NO new shuffle —
    extraction fuses into the sink's feature pass, and delivery is
    epoch-sized by the sealing argument."""
    from cdc_practice_spark.operators.shards import read_export_manifest_df
    from cdc_practice_spark.plans.hints import _STATS_CACHE
    from cdc_practice_spark.queries.pipeline_queries import _INCR_BATCH_MOD
    from cdc_practice_spark.streaming.corpus import _read_manifest
    from cdc_practice_spark.streaming.shard_export import (
        _SHARD_SEQS_STREAM,
        export_ingest_shards,
    )

    key = ("extract_shards_out", sf_dir)
    if key not in _STATS_CACHE:
        store = _extract_ingest_store(spark, sf_dir)
        out = os.path.join(
            tempfile.mkdtemp(prefix="extract_shards_", dir=TMP_ROOT), "shards"
        )
        # delivery tokenizes the EXTRACTED text — the same text the
        # store's n_tokens were computed over (raw markup never reaches
        # a shard)
        docs = _extracted_docs(spark, sf_dir).filter(
            F.col("doc_id") % _INCR_BATCH_MOD == 3
        )
        for epoch in _read_manifest(store):
            export_ingest_shards(
                spark, store, docs, out,
                seqs_per_shard=_SHARD_SEQS_STREAM, at_epoch=epoch,
            )
        export_ingest_shards(
            spark, store, docs, out,
            seqs_per_shard=_SHARD_SEQS_STREAM, finalize=True,
        )
        _STATS_CACHE[key] = out
    return read_export_manifest_df(spark, _STATS_CACHE[key]).orderBy(
        "source", "shard_id"
    )
