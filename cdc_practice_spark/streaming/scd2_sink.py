"""Streaming SCD2 sink — append-only type-2 dimension maintenance.

The batch builder (cdc/scd2.py) derives the whole dimension from the
full feed; a stream cannot re-window history per micro-batch.  The
lakehouse-shaped answer is close-and-append: each epoch writes ONLY

  - the versions its batch OPENS (one ``build_scd2`` over the batch —
    within-batch successors close within-batch versions), and
  - a CLOSED COPY of each previously-open version whose key appears in
    the batch (valid_to = the key's first in-batch event time — any
    event type closes, deletes just open nothing after).

so per-epoch write volume is O(batch), never O(dimension).  A version
row is uniquely keyed by ``version_offset`` (the feed offset that opened
it); a later epoch may supersede a row only by closing it, so the read
path is last-copy-wins: ``row_number() over (partition by version_offset
order by epoch desc) = 1``.  Lazy compaction (rewrite the log keeping
only rn=1 rows) restores read cost whenever the tail of closed copies
grows — the standard merge-on-read / compact-on-schedule trade.

Equivalence with the batch builder over any batch split is asserted in
tests/test_streaming.py::test_stream_scd2_append_equals_batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_practice_spark.cdc.feed import change_feed_from_events
from cdc_practice_spark.cdc.scd2 import build_scd2

_SCHEMA = (
    "original_id long, value double, event_type string, "
    "valid_from timestamp_ntz, valid_to timestamp_ntz, is_current boolean, "
    "version_offset long, _epoch long"
)


def read_scd2(spark: SparkSession, out_root: str) -> DataFrame:
    """Current dimension view: last copy per version wins."""
    if not os.path.isdir(out_root) or not any(
        n.startswith("e") for n in os.listdir(out_root)
    ):
        return spark.createDataFrame([], _SCHEMA).drop("_epoch")
    log = spark.read.parquet(os.path.join(out_root, "e*"))
    w = Window.partitionBy("version_offset").orderBy(F.col("_epoch").desc())
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_epoch")
    )


def compact_scd2(spark: SparkSession, out_root: str, epoch: int) -> None:
    """Merge-on-read → copy-on-write: rewrite the log as one epoch
    directory holding only the winning copies.  ``epoch`` must exceed
    every existing epoch.  Run with no writer active.

    Crash-safe ordering: write tmp → PUBLISH (rename to e{epoch}) →
    delete superseded dirs.  A crash before the publish leaves the old
    log intact (the ``_compact_*`` tmp is invisible to readers); a crash
    after it leaves old + new coexisting, which last-copy-wins reads
    resolve to the new epoch — deleting old dirs FIRST would make the
    window between delete and rename a data-loss hole."""
    existing = [
        n for n in os.listdir(out_root) if n.startswith("e") and n[1:].isdigit()
    ]
    if any(int(n[1:]) >= epoch for n in existing):
        raise ValueError(f"compact epoch {epoch} must exceed existing {existing}")
    winners = read_scd2(spark, out_root).withColumn("_epoch", F.lit(epoch))
    tmp = os.path.join(out_root, f"_compact_e{epoch}")
    winners.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, os.path.join(out_root, f"e{epoch}"))  # publish
    import shutil

    for name in existing:
        shutil.rmtree(os.path.join(out_root, name))


def stream_scd2_append(
    spark: SparkSession,
    events_stream: DataFrame,
    out_root: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """foreachBatch SCD2 sink.  Epoch replay is idempotent: the same
    epoch rewrites the same ``e{epoch}`` directory, and closed copies are
    derived from STRICTLY OLDER epochs (the read below filters
    ``_epoch < epoch``), so a replayed epoch sees the same inputs."""
    os.makedirs(out_root, exist_ok=True)
    feed = change_feed_from_events(events_stream)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        opened = build_scd2(batch_df).withColumn("_epoch", F.lit(epoch_id))
        # first in-batch event per key (ANY type) closes the key's
        # previously-open version
        firsts = (
            batch_df.groupBy("original_id")
            .agg(F.min_by("registered_at", "kafka_offset").alias("_close_ts"))
        )
        # enumerate strictly-older epoch dirs BY PATH (not an e* glob +
        # _epoch filter): on replay the glob would include this epoch's
        # own output dir — a read-own-overwrite conflict
        older = [
            os.path.join(out_root, n)
            for n in sorted(os.listdir(out_root))
            if n.startswith("e") and n[1:].isdigit() and int(n[1:]) < epoch_id
        ]
        prior = spark.createDataFrame([], _SCHEMA)
        if older:
            log = spark.read.parquet(*older)
            w = Window.partitionBy("version_offset").orderBy(
                F.col("_epoch").desc()
            )
            prior = (
                log.withColumn("_rn", F.row_number().over(w))
                .filter((F.col("_rn") == 1) & F.col("is_current"))
                .drop("_rn")
            )
        closed = (
            prior.join(firsts, on="original_id")
            .select(
                "original_id",
                "value",
                "event_type",
                "valid_from",
                F.col("_close_ts").alias("valid_to"),
                F.lit(False).alias("is_current"),
                "version_offset",
                F.lit(epoch_id).alias("_epoch"),
            )
        )
        out = os.path.join(out_root, f"e{epoch_id}")
        opened.unionByName(closed).write.mode("overwrite").parquet(out)

    return (
        feed.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
