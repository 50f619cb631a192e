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
# CHANGED_ROUND states which round the pins belong to.  Pins SPEND
# THEMSELVES (r12 — r11 VERDICT ask #1): once the driver has written
# CORRECTNESS_r{CHANGED_ROUND}.json with a green row for a pinned name,
# ``active_pins()`` drops it automatically — no manual tuple reset, so
# the repo can never be red at judge time merely because a finished
# round's artifact landed (the r9–r11 designed-red process bug).  The
# tuple stays as the authored record of WHAT changed; the genuine
# forgot-at-round-start signal remains
# tests/test_registry.py::test_changed_round_not_stale (CHANGED_ROUND
# older than a committed CORRECTNESS round).
# r12: reset at round start (all seventeen r11 pins earned their
# CORRECTNESS_r11 rows); repopulated as r12 changes land.
CHANGED_ROUND: int = 12
CHANGED_THIS_ROUND: tuple[str, ...] = (
    # new r12 surfaces: raw-document extraction (markup→text)
    "corpus_extract_html",
    "corpus_boilerplate_lines",
    "corpus_extract_then_quality",
    # batched multi-query ANN serving
    "ann_batch_serve",
    # streaming shard delivery (per-epoch sealed-shard export)
    "streaming_shard_export",
    # corpus-wide kNN graph (exact + IVF-PQ sublinear tier)
    "ann_knn_graph",
    "ann_knn_graph_ivf",
    # graph served off the maintained store (batch-from-store serving)
    "ann_knn_graph_from_store",
    # extraction composed with the streaming curation sink
    "streaming_extract_ingest",
    # corpus-wide hard-negative mining (label-excluded graph)
    "ann_hard_negatives_graph",
    # capstone: raw pages in, training shards out
    "streaming_extract_to_shards",
)


def _spent_pins() -> set[str]:
    """Pins that already earned a green row in this round's committed
    CORRECTNESS artifact — no longer in need of a driver slot."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(root, f"CORRECTNESS_r{CHANGED_ROUND:02d}.json")
    if not os.path.exists(path):
        return set()
    try:
        rows = json.load(open(path))
    except (OSError, json.JSONDecodeError):
        return set()
    return {
        n
        for n in CHANGED_THIS_ROUND
        if n in rows
        and bool(rows[n].get("rows_match"))
        and rows[n].get("err") is None
    }


def active_pins() -> tuple[str, ...]:
    """The pins still owed a driver row this round (authored minus
    auto-spent) — what ``_rotate_lru`` front-loads."""
    spent = _spent_pins()
    return tuple(n for n in CHANGED_THIS_ROUND if n not in spent)


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
    pinned = {n: i for i, n in enumerate(active_pins())}
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
