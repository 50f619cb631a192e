"""Bounded-memory frequency sketches — the heavy-hitters tier.

Exact top-frequency over 100 TB needs a full groupBy shuffle of every
distinct key; a Misra-Gries summary answers "which items exceed n/(k+1)
of the stream?" with O(k) memory per partition and an O(partitions · k)
merge — the same constant-memory story as HLL for distinct counts
(aggregates_queries.py) and PQ for vectors (quantization.py).

Algorithm (Misra & Gries 1982; merge rule from Agarwal et al.,
"Mergeable Summaries", PODS 2012): keep ≤ k weighted counters; to add a
batch, combine exact batch counts into the counters, then subtract the
(k+1)-largest weight from every counter and drop non-positives.  The
guarantee that survives any merge tree: each kept weight underestimates
the true frequency by at most (n - sum_of_kept_weights)... bounded by
n/(k+1), so EVERY item with true frequency > n/(k+1) is present in the
final summary.  That guarantee — not the noisy weights — is what the
oracle-gated query asserts.

Spark-first shape: one mapInPandas pass builds a ≤ k-row summary per
partition (per Arrow batch: a vectorized value_counts, then the
decrement rule — no Python row loop), one tiny groupBy-sum merges
them (≤ partitions·k rows in flight), and the final decrement runs on
the collected candidate list — index-sized, O(partitions·k), the same
class of driver work as collecting k-means centroids."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_combine(counters: dict, batch_counts: dict, k: int) -> dict:
    """Merge exact counts into an MG summary of capacity k."""
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > k:
        cut = sorted(counters.values(), reverse=True)[k]  # (k+1)-largest
        counters = {i: w - cut for i, w in counters.items() if w > cut}
    return counters


def mg_summary(df: DataFrame, col: str, k: int = 8) -> tuple[dict, int]:
    """One-pass MG summary of a DataFrame: returns (counters, n) where
    ``counters`` maps ≤ k items to their (under-estimating) weights and
    ``n`` counts non-null rows.  The weighted form is what the streaming
    maintained-sketch sink merges across micro-batches (the PODS-2012
    merge rule is closed over these summaries); batch callers that only
    need the candidate set use ``misra_gries_candidates`` below."""

    def partition_summary(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()  # exact per-batch, vectorized; nulls drop
            counters = _mg_combine(counters, vc.to_dict(), k)
        yield pd.DataFrame(
            {
                "item": pd.Series(list(counters), dtype="object").astype(str),
                "weight": pd.Series(list(counters.values()), dtype="int64"),
            }
        )

    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        partition_summary, schema="item string, weight long"
    )
    # one tiny shuffle: ≤ partitions·k rows, map-side combined
    rows = summaries.groupBy("item").agg(F.sum("weight").alias("weight")).collect()
    counters = {r.item: int(r.weight) for r in rows}  # index-sized collect
    if len(counters) > k:
        cut = sorted(counters.values(), reverse=True)[k]
        counters = {i: w - cut for i, w in counters.items() if w > cut}
    n = df.filter(F.col(col).isNotNull()).count()
    return counters, n


def misra_gries_candidates(
    df: DataFrame, col: str, k: int = 8
) -> tuple[list, int]:
    """Returns (candidate items, total row count n).  The candidate list
    has ≤ k entries and is GUARANTEED to contain every item whose true
    frequency exceeds n / (k+1)."""
    counters, n = mg_summary(df, col, k)
    return sorted(counters), n


# ---------------------------------------------------------------------------
# Count-Min sketch — point-frequency estimates in O(d·w) memory.
#
# Misra-Gries answers "which items are heavy"; Count-Min answers "how
# often does THIS item occur" for any item, with est >= true (never
# under) and est <= true + e/w·n with prob 1-(1/2)^d.  The whole sketch
# is d·w counters (e.g. 4×256 longs = 8 KB for any input size) — built
# here as ONE exploded aggregation, no Python, no driver collect: the
# sketch stays a (seed, bucket, c) DataFrame small enough to broadcast
# into the estimate join.
#
# Hash: md5-derived (the repo's cross-engine-portable hash family) so
# the DuckDB oracle reproduces the sketch bit-for-bit; a production
# deployment swaps in xxhash64 (same shape, one function call) — the
# guarantee depends only on pairwise independence, not the hash family.
# ---------------------------------------------------------------------------


def _cm_bucket(col: Column, seed: int, width: int) -> Column:
    """Portable bucket hash — mirrored verbatim in oracle SQL."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(col.cast("string"), F.lit(f":cm{seed}"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return (h % width).cast("int")


def count_min_build(df: DataFrame, col: str, depth: int = 4, width: int = 256) -> DataFrame:
    """The sketch as a (seed, bucket, c) DataFrame (≤ depth·width rows)."""
    c = F.col(col)
    rows = df.filter(c.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _cm_bucket(c, s, width).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("sb")
    )
    return rows.groupBy(F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("c")
    )


def count_min_estimate(
    sketch: DataFrame, probes: DataFrame, probe_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point estimates: min over the d rows' bucket counters.  The
    sketch side broadcasts (d·w rows); probes keep their partitioning."""
    p = probes.select(F.col(probe_col)).distinct()
    pb = p.select(
        probe_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _cm_bucket(F.col(probe_col), s, width).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("sb"),
    ).select(probe_col, F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
    joined = pb.join(F.broadcast(sketch), on=["seed", "bucket"], how="left")
    return joined.groupBy(probe_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_freq")
    )
