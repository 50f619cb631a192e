"""Skew-handling join: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions.  Salting is the
explicit fallback for the pathological case AQE can't fix: ONE key so
hot that even a split partition is dominated by it (the classic
power-law user in a 100 TB event log).  Measured on a 40%-hot key
(tools/ab_skew.py, 8M rows, broadcast disabled): salted_join 1.52× over
plain SMJ and 1.19× over AQE skew-split; numbers + operating rules in
SCALE.md §Skew A/B.

``salted_join(facts, dim, key, salt)``:
  - fact side: add a uniform random-ish salt in [0, salt) derived
    deterministically from a row-unique column (no rand() — keeps the
    operator replayable/retry-safe, which matters because Spark may
    recompute partitions on failure);
  - dim side: explode each row into all `salt` replicas;
  - join on (key, salt) — the hot key now spreads over `salt` reducers.

Cost model: replicates the smaller side ×salt, so use it for fact⋈dim
joins where dim is modest but too big (or too skew-correlated) to
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    fact_salt_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join facts⋈dim on ``key`` with ``salt``-way key spreading.

    ``fact_salt_col``: a row-unique fact column to derive the salt from
    (deterministic).  Defaults to a hash of all fact columns."""
    salt_src = (
        F.col(fact_salt_col)
        if fact_salt_col
        else F.xxhash64(*[F.col(c) for c in facts.columns])
    )
    f = facts.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(salt)))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = f.join(d, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def salted_agg_sum_count(
    df: DataFrame,
    key: str,
    value_units: "F.Column",
    salt: int = 32,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-level skew-proof aggregation: SUM + COUNT of ``value_units``
    (int64 fixed-point) per ``key``, spread over ``salt`` sub-keys.

    When to use — measured (tools/ab_skew.py, 40%-hot key, 8M rows):
    plain groupBy+sum is 4× FASTER than this (map-side combine already
    absorbs the hot key), so reach for the two-level salt only when the
    partial can't combine (collect_list, exact percentile,
    countDistinct) or as the decimal-combine overflow hatch described
    below — not for ordinary combinable aggregates.

    Level 1 groups by (key, salt) — the hot key's rows split across
    `salt` reducers, each emitting one partial.  Level 2 combines the
    ≤`salt` partials per key — a shuffle of key-cardinality×salt tiny
    rows.  Long sums stay exact; this is also the overflow escape hatch
    documented in functions/money.py (partials convert to decimal before
    the final combine if per-group int64 headroom is in question).

    The salt derives from a row-unique column (md5, not rand()) so
    recomputed partitions salt identically — retry-safe."""
    src = F.col(salt_source) if salt_source else F.concat_ws("\x00", *df.columns)
    salt_col = (
        F.conv(F.substring(F.md5(src.cast("string")), 1, 15), 16, 10)
        .cast("bigint") % salt
    )
    partials = (
        df.withColumn("_salt", salt_col)
        .groupBy(key, "_salt")
        .agg(
            F.sum(value_units).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return (
        partials.groupBy(key)
        .agg(
            F.sum("_psum").alias("units_sum"),
            F.sum("_pcnt").alias("n_rows"),
        )
    )
