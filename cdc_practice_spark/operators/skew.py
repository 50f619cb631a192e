"""Skew-handling join: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions.  Salting is the
explicit fallback for the pathological case AQE can't fix: ONE key so
hot that even a split partition is dominated by it (the classic
power-law user in a 100 TB event log).

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
