"""CDC core: change-feed normalization → history / current-snapshot / stats.

Reproduces the semantics of the reference DAG
``airflow-dags/simple_kafka_etl.py`` (the hand-rolled per-row apply loop)
as set-oriented, shuffle-minimal DataFrame pipelines.  See SURVEY.md §2.5
for the contract.
"""

from cdc_practice_spark.cdc.handoff import snapshot_handoff_current
from cdc_practice_spark.cdc.feed import (
    change_feed,
    change_feed_from_events,
    filter_complete_txns,
)
from cdc_practice_spark.cdc.history import build_history
from cdc_practice_spark.cdc.snapshot import build_current
from cdc_practice_spark.cdc.stats import build_user_stats

__all__ = [
    "change_feed",
    "change_feed_from_events",
    "filter_complete_txns",
    "snapshot_handoff_current",
    "build_history",
    "build_current",
    "build_user_stats",
]
