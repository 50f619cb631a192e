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


def broadcast_if_small(
    df: DataFrame,
    max_rows: int = DEFAULT_BROADCAST_MAX_ROWS,
    cache_key: object | None = None,
) -> DataFrame:
    """Apply ``F.broadcast(df)`` only when a runtime count says the side
    actually fits: rows <= max_rows.  Returns df unhinted otherwise, so
    Catalyst/AQE pick the join strategy from their own estimates.

    ``cache_key``: memoize the count under this key (a table-stats cache
    — exactly what a catalog with ANALYZE stats provides; without it the
    count re-runs per invocation)."""
    if cache_key is not None and cache_key in _STATS_CACHE:
        n = _STATS_CACHE[cache_key]
    else:
        n = df.count()
        if cache_key is not None:
            _STATS_CACHE[cache_key] = n
    if n <= max_rows:
        return F.broadcast(df)
    return df
