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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_combine(counters: dict, batch_counts: dict, k: int) -> dict:
    """Merge exact counts into an MG summary of capacity k."""
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > k:
        cut = sorted(counters.values(), reverse=True)[k]  # (k+1)-largest
        counters = {i: w - cut for i, w in counters.items() if w > cut}
    return counters


def misra_gries_candidates(
    df: DataFrame, col: str, k: int = 8
) -> tuple[list, int]:
    """Returns (candidate items, total row count n).  The candidate list
    has ≤ k entries and is GUARANTEED to contain every item whose true
    frequency exceeds n / (k+1)."""

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
    return sorted(counters), n
