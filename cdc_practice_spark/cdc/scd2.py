"""SCD type-2 temporal dimension over the change feed + point-in-time join.

The reference maintains only the SCD-1 pair (current snapshot +
append-only audit log, simple_kafka_etl.py:97-175).  A warehouse consuming
the same feed almost always also needs the type-2 view — one row per
VERSION of a key with a [valid_from, valid_to) interval — because that is
what "join facts to the dimension value AS OF the fact's own time"
requires.  This module derives it from the identical normalized feed, so
it composes with every existing cdc_* operator.

Semantics (standard SCD2 over a change log):
  - every LIVE event (``__deleted = 'false'``) OPENS a version at its
    ``registered_at``;
  - the NEXT event for the key — live or delete — CLOSES it
    (``valid_to`` = that event's ``registered_at``; exclusive bound);
  - a version with no successor is current (``valid_to`` NULL,
    ``is_current`` true);
  - deletes open nothing: between a DELETE and the key's next INSERT the
    key has no valid version (a point-in-time probe in that gap misses).

Spark-first: one ``lead()`` window over the same (key, offset) sort the
history/current builders already use — Catalyst reuses the single
exchange, so adding the type-2 view to a pipeline that already builds
history costs no extra shuffle.

Point-in-time join: equi-join on the key plus the half-open interval
predicate.  The KEY equality is what drives the physical plan (hash
partition both sides on the key → sort-merge join); the interval check is
a residual filter inside the join, NOT a range-only join — so there is no
O(facts × versions) blowup and the plan survives 100 TB: each executor
matches its key range locally, and versions-per-key is workload-bounded.
Intervals of one key never overlap (adjacent half-open bounds by
construction), so each probe matches AT MOST one version — the join
cannot amplify rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCD2_COLUMNS = [
    "original_id",
    "value",
    "event_type",
    "valid_from",
    "valid_to",
    "is_current",
    "version_offset",
]


def build_scd2(feed: DataFrame, key: str = "original_id", order: str = "kafka_offset") -> DataFrame:
    """Type-2 dimension: one row per live version with [valid_from, valid_to).

    ``lead(registered_at)`` over (key, offset) gives each event the
    timestamp of its successor; live rows become versions closed by that
    successor.  Delete rows are consumed only for the bound they provide
    to their predecessor — they emit no version themselves.
    """
    w = Window.partitionBy(key).orderBy(order)
    return (
        feed.withColumn("_next_ts", F.lead("registered_at").over(w))
        .filter(F.col("__deleted") == "false")
        .select(
            F.col(key),
            F.col("value"),
            F.col("event_type"),
            F.col("registered_at").alias("valid_from"),
            F.col("_next_ts").alias("valid_to"),
            F.col("_next_ts").isNull().alias("is_current"),
            F.col(order).alias("version_offset"),
        )
    )


def asof_join_scd2(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    fact_ts: str,
    dim_key: str = "original_id",
    how: str = "left",
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version whose
    half-open validity interval contains the fact's timestamp.

    The equi-condition on the key keeps this a hash-partitioned
    sort-merge join; ``valid_from <= ts < valid_to`` is a residual
    predicate evaluated inside each key group.  At most one version can
    match per fact (intervals per key are disjoint), so the output has
    exactly one row per fact row under ``how='left'``.
    """
    cond = (
        (facts[fact_key] == dim[dim_key])
        & (dim["valid_from"] <= facts[fact_ts])
        & (dim["valid_to"].isNull() | (facts[fact_ts] < dim["valid_to"]))
    )
    return facts.join(dim, cond, how)
