"""Query registry — single source of truth for the driver contract.

``register(name, oracle=...)`` decorates a ``(spark, sf_dir) -> DataFrame``
callable and records its DuckDB oracle SQL (or None for ops that aren't
SQL-expressible — the driver then records a weaker rows-only check).

Conventions that keep the hash-compare honest (see __spark_entry__.py
docstring in the repo root):
  - every computed column is aliased IDENTICALLY in Spark and SQL;
  - event-time timestamps are emitted as epoch-microsecond BIGINTs
    (``unix_micros`` / ``epoch_us``) — type- and timezone-proof;
  - double aggregates over many rows go through exact DECIMAL(18,2)
    sums, then ROUND + CAST to DOUBLE, so value hashes don't wobble with
    summation order;
  - DuckDB's HUGEINT sums are cast back to BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Queries whose PLAN or FEED SEMANTICS changed this round (r6 ADVICE #5:
# a changed query must appear in the round's driver verification sample
# even if the LRU rotation would push it back).  Reset each round after
# the driver records the new CORRECTNESS file.
#
# r9: reset at round start (the four r8 pins earned their CORRECTNESS_r08
# rows).  Repopulated below as r9 semantic changes land.
#
# CHANGED_ROUND states which round the pins belong to; once the driver
# has written CORRECTNESS_r{CHANGED_ROUND}.json with a green row for
# every pinned name, the pins are SPENT and a test
# (tests/test_registry.py::test_changed_this_round_pins_not_spent)
# fails until the tuple is reset — so the reset stops being a
# recurring verdict chore (r8 VERDICT wrong #1).
# r11: reset at round start (the eleven r10 pins earned their
# CORRECTNESS_r10 rows), then repopulated as r11 changes landed:
# the bucketed MERGE tier gained the persisted tombstone frontier
# (deleted-key redelivery guard — r10 ADVICE), re-routing every query
# on that tier; the IVF/ANN stats sidecars moved to pointer-swap
# atomic publication; new surfaces are pinned until their first
# driver row.
CHANGED_ROUND: int = 11
CHANGED_THIS_ROUND: tuple[str, ...] = (
    # bucketed-tier tombstone frontier (merge plan + store layout)
    "streaming_replay_current_bucketed",
    "streaming_killresume_replay",
    "streaming_state_time_travel",
    # pointer-swap stats sidecars + persisted centroids
    "streaming_ann_ingest",
    "streaming_ivf_ingest",
    "ann_ivf_drift",
    # broadcast hint added to the trained-weight scoring join
    "quality_classifier_train",
    # new r11 surfaces
    "quality_classifier_score_trained",
    "ann_ivf_drift_rebuild",
    "ann_ivf_pq_recall",
    # shared ADC/rerank refactor re-planned the PQ path
    "ann_pq_recall",
    "corpus_tokenize_pack_shard",
    # gate factored into _gate_epoch (shared with the DDL composition)
    "streaming_txn_gated_replay",
    "streaming_txn_gated_multipartition",
    "streaming_txn_gated_evolving",
    "corpus_shard_export_roundtrip",
    "streaming_ivf_pq_serve",
)


def _rotate_lru() -> None:
    """Deterministic driver-check round-robin (VERDICT r4 ask #1).

    The driver's correctness gate checks a bounded prefix of the
    registry (every recorded round checked exactly the first 50
    registrations), so registration order decides which queries can
    ever earn a CORRECTNESS row.  Reorder by *least-recently
    driver-checked*: sort key is (last round the name appeared in a
    committed CORRECTNESS_r{N}.json, registration index).  Queries
    never checked sort first (last_round=0); after the driver writes
    r{N}, those names move to the back automatically.  This is a pure
    function of committed artifacts, with ONE explicit override:
    ``CHANGED_THIS_ROUND`` pins queries whose semantics changed this
    round to the front (they need a fresh driver row regardless of when
    they were last checked — r6 ADVICE #5).  tools/check_oracle.py
    always verifies ALL queries locally regardless of order.
    """
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
            rows = json.load(open(path))
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name in rows:
            last_round[name] = max(last_round.get(name, 0), rnd)

    reg_index = {n: i for i, n in enumerate(QUERIES)}
    pinned = {n: i for i, n in enumerate(CHANGED_THIS_ROUND)}
    order = sorted(
        QUERIES,
        key=lambda n: (
            0 if n in pinned else 1,
            pinned.get(n, 0),
            last_round.get(n, 0),
            reg_index[n],
        ),
    )
    for d in (QUERIES, ORACLES):
        items = [(n, d[n]) for n in order if n in d]
        d.clear()
        d.update(items)


def load_all() -> None:
    """Import every query module so their registrations run."""
    import cdc_practice_spark.queries.analytics  # noqa: F401
    import cdc_practice_spark.queries.aggregates_queries  # noqa: F401
    import cdc_practice_spark.queries.analytics_ext  # noqa: F401
    import cdc_practice_spark.queries.cdc_queries  # noqa: F401
    import cdc_practice_spark.queries.dedup_queries  # noqa: F401
    import cdc_practice_spark.queries.events_queries  # noqa: F401
    import cdc_practice_spark.queries.graph_queries  # noqa: F401
    import cdc_practice_spark.queries.layout_queries  # noqa: F401
    import cdc_practice_spark.queries.multimodal_queries  # noqa: F401
    import cdc_practice_spark.queries.pipeline_queries  # noqa: F401
    import cdc_practice_spark.queries.similarity_queries  # noqa: F401
    import cdc_practice_spark.queries.sql_surface  # noqa: F401
    import cdc_practice_spark.queries.text_queries  # noqa: F401
    import cdc_practice_spark.queries.timeseries_queries  # noqa: F401
    import cdc_practice_spark.queries.relational_more  # noqa: F401
    import cdc_practice_spark.queries.tpch_more  # noqa: F401
    import cdc_practice_spark.queries.tpch_full  # noqa: F401
    import cdc_practice_spark.queries.udf_queries  # noqa: F401
    import cdc_practice_spark.queries.streaming_queries  # noqa: F401

    _rotate_lru()
