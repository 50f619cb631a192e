"""Size-driven join-strategy hints.

``F.broadcast`` on a side whose size Catalyst mis-estimates is a scale
trap: the hint that wins at sf0.1 OOMs the driver at 100 TB.  Static
file-size stats can't see filter selectivity, and AQE can only demote a
join it planned as a shuffle — a *bad static broadcast* never reaches the
shuffle stage AQE re-plans.  So the gate here is the same signal AQE
uses, collected explicitly: a runtime row count of the candidate side.

The count is a map-only job (column-pruned to the join/filter columns,
filters pushed to the scan) — one cheap extra pass, paid once, that
decides between "broadcast (measured win at small N)" and "fall back to
the shuffle join AQE can then optimize".  At 100 TB the count comes back
large and the hint is simply never applied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~1M rows of a pruned projection is well under executor/driver broadcast
# budgets (tens of MB); above it, prefer the shuffle join + AQE.
DEFAULT_BROADCAST_MAX_ROWS = 1_000_000


_STATS_CACHE: dict[object, int] = {}


def cached_count(df: DataFrame, cache_key: object | None = None) -> int:
    """Runtime row count, memoized under ``cache_key`` — the table-stats
    cache a catalog with ANALYZE stats provides (without a key the count
    re-runs per invocation).  Shared by every size-driven decision:
    broadcast gating, Bloom-filter sizing."""
    if cache_key is not None and cache_key in _STATS_CACHE:
        return _STATS_CACHE[cache_key]
    n = df.count()
    if cache_key is not None:
        _STATS_CACHE[cache_key] = n
    return n


def broadcast_if_small(
    df: DataFrame,
    max_rows: int = DEFAULT_BROADCAST_MAX_ROWS,
    cache_key: object | None = None,
) -> DataFrame:
    """Apply ``F.broadcast(df)`` only when a runtime count says the side
    actually fits: rows <= max_rows.  Returns df unhinted otherwise, so
    Catalyst/AQE pick the join strategy from their own estimates."""
    if cached_count(df, cache_key) <= max_rows:
        return F.broadcast(df)
    return df


def spread_for_python(df: DataFrame) -> DataFrame:
    """Round-robin repartition a COARSE input before an expensive
    Arrow/Python map stage (mapInPandas/applyInPandas).

    Parquet splits at row-group granularity: a single-row-group file
    scans as ONE task no matter how small ``maxPartitionBytes`` is, so a
    downstream Python map stage runs single-threaded.  When the input has
    fewer partitions than the cluster's parallelism, one narrow exchange
    unlocks full-width Python execution (measured 0.9 → 0.65 s on the
    sf0.1 minhash fold).  At scale inputs arrive with plenty of
    partitions and this is a no-op — the plan gains no exchange.

    Call this on the SOURCE DataFrame (e.g. the memoized ``load_table``
    scan) and project afterwards: the partition probe materializes the
    plan's RDD lineage (~0.1 s) but caches on the DataFrame object, so
    probing the session-scoped scan pays once per session, while probing
    a fresh projection would pay per call.  Column pruning pushes a
    subsequent select through the repartition, so the exchange carries
    only the columns the map stage needs."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df
