"""Hand-built runtime Bloom filter — semi-join reduction for shuffle joins.

The scale problem: a selective dim-side predicate (``customer WHERE
segment = 'X'``) should shrink the FACT side *before* the join shuffle,
but when the filtered dim is too large to broadcast, Spark's sort-merge
join ships every fact row.  The standard fix (what Spark's own
``spark.sql.optimizer.runtime.bloomFilter`` injects when it applies) is:
build a Bloom filter over the dim join keys, apply it as a fact-side
filter ahead of the exchange, and let the real join absorb the false
positives.  The result set is EXACT — Bloom filters have no false
negatives, and every false positive fails the actual join condition.

This module builds that filter with nothing but public DataFrame API:

  build (``build_bloom_row``): k bit positions per dim key via
    ``pmod(xxhash64(key, seed_i), m)``, folded into an m-bit bitmap by
    one ``bit_or`` aggregation (map-side combined; the exchange carries
    ≤ m/64 rows per task), then densified JVM-side into ONE row holding
    an ``array<bigint>`` column.  Nothing is collected to the driver.
  probe (``bloom_reduce_join``): the one-row bitmap broadcast-joins onto
    the fact (a 1-row broadcast — the cheapest join Spark has), and the
    membership predicate — ``getbit(element_at(words, pos/64 + 1),
    pos % 64)`` ANDed over seeds — filters above the fact scan.  All
    JVM, no Python, no shuffle added.

Why a 1-row DataFrame instead of a literal array (the obvious first
cut): ``F.lit(words)`` becomes a CreateArray with n_bits/64 literal
children; past a few thousand elements the generated method exceeds
JVM codegen limits and Spark silently falls back to INTERPRETED
evaluation, which re-walks every literal child PER ROW — measured 11.5 s
vs 0.9 s for the plain join it was meant to beat (tools/ab_bloom.py).
As a joined column the bitmap is one buffer reference per row batch.

Sizing: ``bits_per_key`` defaults to 16 (k=5 → p_fp ≈ 0.1%), mirroring
the Bloom sidecar lesson in operators/layout.py — the filter must scale
with dim CONTENTS, not be a fixed constant.  Past ``max_bits`` the fpp
degrades gracefully (never the result); at dim sizes where even a capped
Bloom stops filtering, a plain shuffle join was the right plan anyway.

Type contract: build and probe hash the raw key column, so both sides
must share a type — guaranteed for any equi-join this is reducing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORDS_COL = "__bloom_words"


def _bit_position(key: Column, seed: int, n_bits: int) -> Column:
    """Seed ``seed``'s bit position for ``key`` — the ONE definition both
    build and probe use, so the two sides can never disagree."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))


def _size_bits(n_items: int, bits_per_key: int, max_bits: int) -> int:
    n_bits = max(64, min(max_bits, bits_per_key * max(1, n_items)))
    return ((n_bits + 63) // 64) * 64  # whole words


def build_bloom_row(
    dim: DataFrame,
    dim_col: str,
    n_items: int | None = None,
    bits_per_key: int = 16,
    k: int = 5,
    max_bits: int = 1 << 22,
    cache_key: object | None = None,
) -> tuple[DataFrame, int]:
    """Aggregate the dim keys into a 1-row DataFrame holding the dense
    Bloom bitmap as an ``array<bigint>`` column ``__bloom_words``.

    Cost: one count job for sizing (skipped when ``n_items`` is passed;
    memoized under ``cache_key`` via the shared table-stats cache —
    Spark's own runtime filter sizes from plan stats the same way) + one
    bit_or aggregation whose final densify runs on ≤ n_bits/64 rows.
    The bitmap never touches the driver.
    """
    if n_items is None:
        from cdc_practice_spark.plans.hints import cached_count

        n_items = cached_count(dim.select(dim_col), cache_key)
    n_bits = _size_bits(n_items, bits_per_key, max_bits)
    n_words = n_bits // 64
    key = F.col("__key")
    per_seed = [
        F.struct(
            (_bit_position(key, s, n_bits) / 64).cast("int").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pmod(xxhash64(__key, {s}), {n_bits}) % 64 AS INT))"
            ).alias("mask"),
        )
        for s in range(k)
    ]
    sparse = (
        dim.select(F.col(dim_col).alias("__key"))
        .filter(key.isNotNull())
        .select(F.explode(F.array(*per_seed)).alias("pb"))
        .groupBy(F.col("pb.word_idx").alias("word_idx"))
        .agg(F.bit_or(F.col("pb.mask")).alias("word"))
    )
    # densify via a full slot range + ordered collect — NOT element_at
    # over a map (ArrayBasedMapData lookup is a linear scan; n_words
    # lookups × n_words entries was an O(words²) single-row stage,
    # measured 16 s at 12.5k words)
    slots = dim.sparkSession.range(n_words).select(
        F.col("id").cast("int").alias("word_idx")
    )
    words_row = (
        slots.join(sparse, on="word_idx", how="left")
        .select("word_idx", F.coalesce("word", F.lit(0)).alias("word"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(word_idx, word))), "
                "s -> s.word)"
            ).alias(_WORDS_COL)
        )
    )
    return words_row, n_bits


def might_contain(
    col: Column | str, words: Column | str, n_bits: int, k: int = 5
) -> Column:
    """Codegen'd Bloom membership predicate; ``words`` is the bitmap
    ``array<bigint>`` COLUMN (attach via the 1-row broadcast join —
    see bloom_reduce_join).  NULL keys: xxhash64 skips null inputs, so
    the probe evaluates on the seed alone — the row may pass or fail
    the filter, and the real join eliminates it either way (NULL never
    equi-joins) — correct for the inner/semi joins this reduces."""
    key = F.col(col) if isinstance(col, str) else col
    arr = F.col(words) if isinstance(words, str) else words
    pred: Column | None = None
    for seed in range(k):
        pos = _bit_position(key, seed, n_bits)
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = F.getbit(word, (pos % 64).cast("int")) == 1
        pred = bit if pred is None else (pred & bit)
    assert pred is not None
    return pred


def bloom_reduce_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_col: str,
    dim_col: str,
    how: str = "inner",
    bits_per_key: int = 16,
    k: int = 5,
    max_bits: int = 1 << 22,
    n_items: int | None = None,
    cache_key: object | None = None,
) -> DataFrame:
    """Join with the fact side pre-reduced by a Bloom filter on dim keys.

    Row-for-row identical to ``fact.join(dim, fact_col == dim_col, how)``
    (no false negatives; the join removes false positives) — only the
    fact rows reaching the join exchange change.

    Only inner/semi joins are reducible: an outer join must KEEP
    non-matching fact rows, so pre-filtering the fact side would change
    its result — rejected loudly rather than silently wrong.
    """
    if how.replace("_", "").lower() not in ("inner", "semi", "leftsemi", "cross"):
        raise ValueError(
            f"bloom_reduce_join cannot reduce a {how!r} join: outer joins "
            "must keep non-matching fact rows"
        )
    words_row, n_bits = build_bloom_row(
        dim,
        dim_col,
        n_items=n_items,
        bits_per_key=bits_per_key,
        k=k,
        max_bits=max_bits,
        cache_key=cache_key,
    )
    reduced = (
        fact.join(F.broadcast(words_row))  # 1-row broadcast: bitmap as a column
        .filter(might_contain(fact_col, _WORDS_COL, n_bits, k=k))
        .drop(_WORDS_COL)
    )
    return reduced.join(dim, reduced[fact_col] == dim[dim_col], how)
