"""Incremental snapshot upsert — the streaming twin of cdc/snapshot.py.

The reference applies changes row-at-a-time: existence probe → INSERT or
UPDATE, DELETE on delete-events (simple_kafka_etl.py:108,128-138,159-163).
Spark-first, the same contract becomes a per-micro-batch MERGE:

  new_state = latest-per-key(batch) ⟕ existing_state
    - keys only in existing       → carried over unchanged
    - keys in batch, last event live   → upserted (registered_at carried
      from the batch's last INSERT, else from existing state —
      the immutability rule of simple_kafka_etl.py:133)
    - keys in batch, last event delete → dropped

Set-oriented: one window over the batch (tiny), one join against state
keyed by original_id.  At 100 TB state lives in a key-partitioned table
(Delta/Iceberg MERGE or partition-overwrite); here state is parquet and
each epoch writes a new version directory (atomic swap by pointer) —
same plan shape, lakehouse-grade when swapped to a table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# The mutable payload the events-fixture feed carries; sinks applying an
# EVOLVED wire schema (streaming DDL — stream_current_upsert_evolving)
# pass their own payload column list instead.
DEFAULT_PAYLOAD = ["value", "event_type", "props_k"]
STATE_META = ["original_registered_at", "last_updated_at", "last_offset"]

STATE_COLUMNS = ["original_id", *DEFAULT_PAYLOAD, *STATE_META]


def state_columns(payload_cols: "list[str] | None" = None) -> list[str]:
    p = DEFAULT_PAYLOAD if payload_cols is None else list(payload_cols)
    return ["original_id", *p, *STATE_META]


def state_schema_for(batch_feed: DataFrame, payload_cols: list[str]):
    """The snapshot-state StructType implied by a feed batch's payload
    types — the READ schema an evolving sink loads its buckets with:
    after a widening DDL the batch's payload types are the wide ones,
    and parquet's widening read upcasts pre-DDL bucket files in place
    (int32 file → bigint column; a column added by DDL null-fills)."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    by_name = {f.name: f for f in batch_feed.schema.fields}
    fields = [StructField("original_id", LongType())]
    fields += [StructField(c, by_name[c].dataType) for c in payload_cols]
    fields += [
        StructField("original_registered_at", TimestampNTZType()),
        StructField("last_updated_at", TimestampNTZType()),
        StructField("last_offset", LongType()),
    ]
    return StructType(fields)


def empty_state(spark, payload_schema: "str | None" = None) -> DataFrame:
    p = payload_schema or "value double, event_type string, props_k int"
    return spark.createDataFrame(
        [],
        f"original_id long, {p}, "
        "original_registered_at timestamp_ntz, last_updated_at timestamp_ntz, "
        "last_offset long",
    )


def updated_tombstones(
    existing_tombs: "DataFrame | None", batch_feed: DataFrame
) -> DataFrame:
    """The per-key DELETE frontier after a batch: max kafka_offset of
    any delete event ever applied, per key — what extends the
    stale-redelivery guard across deletes (r10 ADVICE: a DELETEd key
    has no live state row, so ``merge_batch``'s live-row frontier
    alone lets a partial redelivery of the key's old INSERT resurrect
    it).  Append-only and monotone (groupBy max), so replays are
    no-ops; a later re-INSERT leaves the tombstone in place — stale
    but harmless, the guard takes the GREATEST of both frontiers.
    Index-sized: one row per ever-deleted key, bucket-pruned alongside
    state."""
    batch_dels = (
        batch_feed.filter(F.col("__deleted") == "true")
        .groupBy("original_id")
        .agg(F.max("kafka_offset").alias("last_offset"))
    )
    if existing_tombs is None:
        return batch_dels
    return (
        existing_tombs.select("original_id", "last_offset")
        .unionByName(batch_dels)
        .groupBy("original_id")
        .agg(F.max("last_offset").alias("last_offset"))
    )


def merge_batch(
    existing: DataFrame,
    batch_feed: DataFrame,
    payload_cols: "list[str] | None" = None,
    carry_cols: "tuple[str, ...]" = (),
    tombstones: "DataFrame | None" = None,
) -> DataFrame:
    """One MERGE step: apply a micro-batch of normalized change events
    (cdc/feed.py shape) to the existing snapshot state.

    Stale-redelivery guard (r10 — r9 ADVICE): a coordinate redelivery
    that slips past the upstream dedup and arrives in a LATER epoch
    (after its transaction was released / its offset applied) must not
    regress a key to an older value.  A key's applied frontier is its
    ``last_offset`` in state, and source offsets are monotone per key,
    so any batch event with ``kafka_offset <= last_offset`` is by
    definition already reflected — it is dropped before the merge,
    which also makes whole-epoch replays a structural no-op (the
    filtered batch is empty, so new_state == existing).

    ``tombstones`` (r11 — r10 ADVICE) extends the frontier across
    DELETEs: a deleted key has no live state row, so without it a
    partial redelivery carrying the key's old INSERT but not its later
    DELETE would resurrect the key.  Pass the persisted
    (original_id, last_offset) delete frontier (``updated_tombstones``)
    and the guard takes the greatest of both frontiers — one more
    same-keyed left join, no new shuffle class.  Callers that omit it
    (handoff/full-rewrite tiers) keep the live-key-only guard and rely
    on upstream coordinate dedup for deleted-key redelivery."""
    w = Window.partitionBy("original_id").orderBy("kafka_offset")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    ex = existing.select(
        F.col("original_id").alias("ex_id"),
        F.col("original_registered_at").alias("ex_registered_at"),
        F.col("last_offset").alias("ex_last_offset"),
        *[F.col(c).alias(f"ex_{c}") for c in carry_cols],
    )

    b = batch_feed.join(ex, batch_feed["original_id"] == ex["ex_id"], "left")
    if tombstones is not None:
        tb = tombstones.select(
            F.col("original_id").alias("tb_id"),
            F.col("last_offset").alias("tb_last_offset"),
        )
        b = b.join(tb, b["original_id"] == tb["tb_id"], "left")
        frontier = F.greatest(
            F.col("ex_last_offset"), F.col("tb_last_offset")
        )
    else:
        frontier = F.col("ex_last_offset")
    b = b.filter(frontier.isNull() | (F.col("kafka_offset") > frontier))
    if tombstones is not None:
        b = b.drop("tb_id", "tb_last_offset")

    # change_type inside the batch: the first batch event's "previous
    # state" is the existing snapshot (the reference's existence probe,
    # simple_kafka_etl.py:128-131); later events see their batch
    # predecessor via lag().
    prev = F.lag("__deleted").over(w)
    prev_deleted = F.coalesce(
        prev, F.when(F.col("ex_id").isNull(), F.lit("true")).otherwise(F.lit("false"))
    )
    b = b.withColumn(
        "change_type",
        F.when(F.col("__deleted") == "true", F.lit("DELETE"))
        .when(prev_deleted == "true", F.lit("INSERT"))
        .otherwise(F.lit("UPDATE")),
    )
    # registered_at carry: last in-batch INSERT, else the existing
    # state's value (immutable across UPDATEs — simple_kafka_etl.py:133).
    carry = F.last(
        F.when(F.col("change_type") == "INSERT", F.col("registered_at")),
        ignorenulls=True,
    ).over(w_all)
    b = b.withColumn(
        "original_registered_at", F.coalesce(carry, F.col("ex_registered_at"))
    )

    # CARRY columns (streaming DROP-direction schema evolution): a
    # retired column's value persists across events that no longer
    # carry it — per live-row lineage: the carry RESETS at each INSERT
    # (a re-inserted row has no memory of its deleted predecessor's
    # attributes, matching the reference's row lifetime) and otherwise
    # takes the last non-null value, falling back to the state's
    # carried value when the batch contributes nothing.  Implemented as
    # one more expression over the SAME w_all window (no new exchange):
    # INSERT rows emit value-or-RESET-sentinel so nulls before the
    # insert can't leak through ignorenulls; the sentinel decodes back
    # to null.  String transport is lossless for the double payloads
    # the wire itself stringifies.  This per-batch rule is chunking-
    # invariant: state always equals "last non-null value at or after
    # the key's last INSERT" (the streaming_schema_evolution_drop
    # oracle recomputes exactly that).
    _RESET = "\x00reset"
    for c in carry_cols:
        cs = F.col(c).cast("string")
        expr = F.when(
            F.col("change_type") == "INSERT", F.coalesce(cs, F.lit(_RESET))
        ).otherwise(cs)
        carried = F.coalesce(
            F.last(expr, ignorenulls=True).over(w_all),
            F.col(f"ex_{c}").cast("string"),
        )
        b = b.withColumn(
            c,
            F.when(carried == _RESET, F.lit(None))
            .otherwise(carried)
            .cast(batch_feed.schema[c].dataType),
        )

    # b's join+window chain is consumed TWICE below (batch_state and the
    # untouched anti-join's key set) — persist so one epoch executes it
    # once (released by the sink's tracked scope / the materializer)
    from cdc_practice_spark.plans.cache import tracked_persist

    b = tracked_persist(b)
    rn = F.row_number().over(
        Window.partitionBy("original_id").orderBy(F.col("kafka_offset").desc())
    )
    pcols = DEFAULT_PAYLOAD if payload_cols is None else list(payload_cols)
    batch_state = (
        b.withColumn("rn", rn)
        .filter((F.col("rn") == 1) & (F.col("__deleted") == "false"))
        .select(
            "original_id",
            *pcols,
            "original_registered_at",
            F.col("registered_at").alias("last_updated_at"),
            F.col("kafka_offset").alias("last_offset"),
        )
    )

    # anti-join on the POST-guard keys: a key whose batch rows were all
    # stale redeliveries contributes no batch_state row and must stay in
    # untouched (keying on the raw batch would silently drop it)
    untouched = existing.join(
        b.select("original_id").distinct(), "original_id", "left_anti"
    )
    return untouched.select(*state_columns(pcols)).unionByName(batch_state)
