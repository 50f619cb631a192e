"""Deduplication operators for training-data pipelines.

Four tiers, in increasing fuzziness:
  1. exact           — hash-groupBy on a canonical fingerprint
  2. MinHash + LSH   — shingle → minhash signature → band → bucket join,
                       then true-Jaccard verification on candidates only
  3. SimHash         — 16-bit sign-hash, near-dups via pigeonhole band join
  4. n-gram Jaccard  — exact pairwise similarity (verification tier /
                       small blocked subsets only)

Scale design (the whole point):
  - Pairwise similarity over N docs is O(N²) — never run it raw at 100 TB.
    MinHash-LSH reduces it to O(N·bands) + per-bucket joins; SimHash to
    O(N) + equality joins on bands.  The exact-Jaccard verify runs ONLY
    on LSH candidates (tiny).
  - All hashes are md5-derived and all arithmetic is int64 mod 1e9+7, so
    every stage is (a) safe under Spark 4's ANSI overflow checking and
    (b) bit-identical in the DuckDB oracle.
  - Everything is built-in JVM expressions (split/transform/aggregate/
    explode/groupBy) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_practice_spark.plans.cache import tracked_persist

MOD = 1_000_000_007
NUM_PERM = 16
BANDS = 4
ROWS_PER_BAND = NUM_PERM // BANDS
SHINGLE_K = 3  # 3-word shingles


def _perm_params(i: int) -> tuple[int, int]:
    """Deterministic MinHash permutation params (a, b) for permutation i.
    Fixed linear recurrences (Knuth multiplicative constants) — no RNG,
    so the DuckDB oracle embeds the identical constants."""
    a = (2654435761 * (i + 1) + 1) % MOD
    b = (40503 * (i + 7) + 12345) % MOD
    return a, b


def token_hash(col: Column) -> Column:
    """Shared engine/oracle string→int64 hash: first 15 hex digits of md5
    (60 bits, always < 2^60) reduced mod 1e9+7 so products with
    permutation multipliers stay < 1e18 (int64-safe)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint") % MOD


def shingles_from_tokens(toks: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-word shingles over a MATERIALIZED token-array column.
    Documents shorter than k tokens contribute their full token string as
    a single shingle (so they still participate).

    The column requirement is a performance contract: higher-order
    functions don't common-subexpression-eliminate, so passing the
    split() expression directly would re-tokenize the text for every
    element access (3 per shingle position — measured ~10× on the
    corpus bench)."""
    kgrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        # try_element_at: out-of-bounds (docs shorter than k tokens) gives
        # NULL, which concat_ws skips — same as the oracle's toks[i] —
        # instead of an ANSI INVALID_ARRAY_INDEX error.
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, i + F.lit(j)) for j in range(k)]
        ),
    )
    return F.array_distinct(kgrams)


def with_shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = SHINGLE_K
) -> DataFrame:
    """(doc_id, sh, hs): tokenize → shingle → hash as three projection
    stages so each subexpression is evaluated exactly once per row."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .select("doc_id", shingles_from_tokens(F.col("_toks"), k).alias("sh"))
        .withColumn("hs", F.transform("sh", token_hash))
    )


def shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Single-column convenience form (tests / one-off).  Prefer
    with_shingle_hashes for datasets — see shingles_from_tokens."""
    return shingles_from_tokens(F.split(F.lower(F.trim(text)), "\\s+"), k)


def minhash_signature(shingle_hashes: Column) -> list[Column]:
    """NUM_PERM minhash values: min over shingles of (a_i*h + b_i) mod P."""
    def perm(a, b):
        # closure factory (default-arg lambdas break PySpark lambda
        # introspection — defaults get passed Columns)
        return lambda h: (h * a + b) % MOD

    sig = []
    for i in range(NUM_PERM):
        a, b = _perm_params(i)
        sig.append(
            F.array_min(F.transform(shingle_hashes, perm(a, b))).alias(f"mh{i}")
        )
    return sig


def with_minhash_arrow(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SHINGLE_K,
    passthrough: list[str] | None = None,
    gram_k: int | None = None,
) -> DataFrame:
    """(doc_id, hs, mh0..mh{NUM_PERM-1}) in ONE Arrow-batched pass —
    tokenize, shingle, md5-hash, and fold all NUM_PERM permutations in
    numpy per batch.  Replaces the JVM pipeline's per-shingle md5 `conv`
    plus NUM_PERM interpreted higher-order passes over the hash arrays
    with C md5 (hashlib — byte-identical to Spark/DuckDB md5) and one
    vectorized (|hs| × NUM_PERM) matrix fold.  Pure per-doc map: no
    shuffle, embarrassingly parallel at any scale.

    ``gram_k`` (r8): when set, the SAME tokenization additionally emits
    a ``g8`` column — the FULL 60-bit md5 hashes (no modulus: the
    decontamination semi join wants negligible collision odds, and no
    permutation products follow) of the doc's distinct gram_k-grams —
    so the composed pipeline's 8-gram decontamination stage rides this
    one pass instead of re-reading the corpus.

    Parity contract (asserted vs the JVM path in tests/test_dedup.py):
      - tokenizer replicates split(lower(trim(text)), '\\s+') exactly —
        trim strips 0x20 only, ASCII-only \\s, empty fields kept;
      - shingling replicates sequence/try_element_at/concat_ws — for
        docs shorter than k tokens the single position joins what
        exists; dict.fromkeys == array_distinct (first-occurrence);
      - hash = int(md5_hex[:15], 16) % MOD, products < 1e18 (int64-safe);
      - g8 hash = int(md5_hex[:15], 16) — the token_hash60 pair.
    """
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    reserved = {"doc_id", "hs", "g8"} | {f"mh{j}" for j in range(NUM_PERM)}
    bad = [c for c in (passthrough or []) if c in reserved]
    if bad:
        raise ValueError(
            f"with_minhash_arrow: passthrough column(s) {bad} collide with "
            f"the generated output columns (doc_id, hs, g8, mh0..mh{NUM_PERM - 1})"
        )

    _ws = re.compile(r"\s+", re.ASCII)
    A = np.array([_perm_params(i)[0] for i in range(NUM_PERM)], dtype=np.int64)
    B = np.array([_perm_params(i)[1] for i in range(NUM_PERM)], dtype=np.int64)

    def _batches(it):
        from hashlib import md5

        for pdf in it:
            n_rows = len(pdf)
            hs_out = []
            g8_out = []
            sig = np.empty((n_rows, NUM_PERM), dtype=np.int64)
            for i, txt in enumerate(pdf["_text"].values):
                toks = _ws.split(txt.strip(" ").lower())
                upper = max(len(toks) - (k - 1), 1)
                sh = dict.fromkeys(
                    " ".join(toks[p : p + k]) for p in range(upper)
                )
                # first 15 hex chars == first 60 bits: read 8 raw digest
                # bytes and drop the low nibble (skips hex-string parse)
                hs = np.fromiter(
                    (
                        (int.from_bytes(md5(s.encode()).digest()[:8], "big") >> 4)
                        % MOD
                        for s in sh
                    ),
                    dtype=np.int64,
                    count=len(sh),
                )
                hs_out.append(hs)
                sig[i] = ((hs[:, None] * A[None, :] + B[None, :]) % MOD).min(
                    axis=0
                )
                if gram_k is not None:
                    gupper = max(len(toks) - (gram_k - 1), 1)
                    g = dict.fromkeys(
                        " ".join(toks[p : p + gram_k]) for p in range(gupper)
                    )
                    g8_out.append(
                        np.fromiter(
                            (
                                int.from_bytes(md5(s.encode()).digest()[:8], "big")
                                >> 4
                                for s in g
                            ),
                            dtype=np.int64,
                            count=len(g),
                        )
                    )
            out = {"doc_id": pdf["doc_id"].values, "hs": hs_out}
            for j in range(NUM_PERM):
                out[f"mh{j}"] = sig[:, j]
            if gram_k is not None:
                out["g8"] = g8_out
            for c in passthrough or []:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    pt_fields = []
    if passthrough:
        # passthrough columns ride the Arrow batch unchanged (the
        # composed-pipeline base computes its scalar features JVM-side,
        # then carries them THROUGH the signature pass — one corpus scan)
        by_name = {f.name: f for f in docs.schema.fields}
        pt_fields = [
            StructField(c, by_name[c].dataType, by_name[c].nullable)
            for c in passthrough
        ]
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("hs", ArrayType(LongType()))]
        + [StructField(f"mh{j}", LongType()) for j in range(NUM_PERM)]
        + ([StructField("g8", ArrayType(LongType()))] if gram_k is not None else [])
        + pt_fields
    )
    from cdc_practice_spark.plans.hints import spread_for_python

    return (
        spread_for_python(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_text"),
            *(passthrough or []),
        )
        .mapInPandas(_batches, schema)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact-Jaccard verify.

    Pipeline: shingle → hash → 16-perm signature → 4 bands of 4 →
    explode to (band_idx, band_key) → self-join per bucket (doc_a <
    doc_b) → distinct candidates → verify true shingle-Jaccard ≥
    threshold.  The self-join shuffles on the band key whose cardinality
    grows with N, keeping buckets small; the O(N²) explosion never
    happens.  Returns (doc_a, doc_b, jaccard)."""
    # ONE Arrow pass computes hash sets AND all NUM_PERM signature mins
    # (with_minhash_arrow; JVM twin kept as the parity reference —
    # measured ~2× on the corpus bench).  Persist it: the banding
    # self-join and the Jaccard verify would otherwise RE-DERIVE the
    # whole md5/shingle subtree on every branch (Spark duplicates
    # self-join subtrees) — measured 10× before persisting.  Only int64
    # hash arrays are carried (not shingle strings): smaller state, and
    # array_intersect on longs beats string comparison; Jaccard over
    # 60-bit hashes equals string Jaccard up to negligible collisions
    # (and the oracle intersects the same hash lists, so parity is exact).
    base = tracked_persist(with_minhash_arrow(docs, id_col, text_col))
    hs = base.select("doc_id", "hs")

    sig = base

    band_keys = F.array(
        *[
            F.concat_ws(
                "-",
                *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
            )
            for b in range(BANDS)
        ]
    )
    # bands carry ONLY (doc_id, band) — candidate pairs join back to the
    # persisted hash sets for the verify, so the ×BANDS explode never
    # replicates the arrays.
    banded = tracked_persist(
        sig.select(
            "doc_id", F.posexplode(band_keys).alias("band_idx", "band_key")
        )
    )  # id+key rows only — cheap, and spares the self-join a second
    # full signature computation

    candidates = (
        banded.alias("a")
        .join(banded.alias("b"), ["band_idx", "band_key"])
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )

    paired = candidates.join(
        hs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")), "doc_a"
    ).join(
        hs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")), "doc_b"
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
    union = (F.size("hs_a") + F.size("hs_b")).cast("double") - inter
    return (
        paired.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


SIMHASH_BITS = 60  # md5's first 15 hex chars = 60 independent bits
SIM_BANDS = 4
SIM_BAND_WIDTH = SIMHASH_BITS // SIM_BANDS  # 15-bit bands


def token_hash60(col: Column) -> Column:
    """Full 60-bit md5-derived hash (no modulus — SimHash needs every
    bit position independent)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def simhash60_from_hashes(hashes: Column) -> Column:
    """60-bit SimHash fold over a MATERIALIZED array-of-hashes column.
    Callers must project the md5 hash array into a real column first —
    passing the hashing expression directly would re-evaluate the md5
    transform once per bit (60× per row; measured 10×+ on the bench)."""

    def bit_sum(j):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = None
    for j in range(SIMHASH_BITS):
        contrib = F.aggregate(hashes, F.lit(0), bit_sum(j))
        bit = F.when(contrib > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        out = bit if out is None else out + bit
    return out


def with_simhash60(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) — Arrow-batched numpy fold (with_simhash60_arrow),
    bit-identical to the JVM reference below and ~3× faster (measured
    0.7 s vs 2.3 s on 5000 sf0.1 docs), with NO shuffle: simhash is a
    pure per-doc map, so mapInPandas keeps it embarrassingly parallel
    at any scale."""
    return with_simhash60_arrow(docs, id_col, text_col)


def with_simhash60_arrow(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash via mapInPandas: md5 per token (hashlib — identical bytes
    to Spark/DuckDB md5), bit matrix folded in numpy per Arrow batch.

    The tokenizer replicates Spark's split(lower(trim(text)), '\\s+')
    EXACTLY: trim strips 0x20 only, \\s is ASCII-only (Java regex
    default — NOT python's unicode \\s), and re.split keeps the
    leading/trailing empty fields Java's limit=-1 split keeps (so
    'a\\t' tokenizes to ['a',''] in both engines).  Parity is asserted
    against the JVM path in tests/test_dedup.py on adversarial
    whitespace."""
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    _ws = re.compile(r"\s+", re.ASCII)

    def _simhash_batches(it):
        from hashlib import md5

        shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
        for pdf in it:
            out = np.zeros(len(pdf), dtype=np.int64)
            for i, txt in enumerate(pdf["_text"].values):
                toks = _ws.split(txt.strip(" ").lower())
                # first 60 md5 bits via raw digest bytes (== hexdigest[:15])
                hs = np.fromiter(
                    (
                        int.from_bytes(md5(t.encode()).digest()[:8], "big") >> 4
                        for t in toks
                    ),
                    dtype=np.int64,
                    count=len(toks),
                )
                bits = (hs[:, None] >> shifts) & 1
                contrib = (2 * bits - 1).sum(axis=0)
                out[i] = ((contrib > 0).astype(np.int64) << shifts).sum()
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("simhash", LongType())]
    )
    from cdc_practice_spark.plans.hints import spread_for_python

    return (
        spread_for_python(docs)
        .select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
        .mapInPandas(_simhash_batches, schema)
    )


def with_simhash60_sql(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """JVM reference path: tokens explode to rows, 60 conditional SUMs
    run in one codegen'd hash aggregation, then one projection folds the
    sign bits back into the 60-bit value.

    Measured ~4× faster than the array-lambda fold (higher-order
    functions run interpreted per element; HashAggregate is vectorized
    and map-side-combinable).  Note split('') == [''] so every doc emits
    ≥1 token — explode never drops rows."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    ex = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
        .select("doc_id", F.explode("_t").alias("_tok"))
        .select("doc_id", token_hash60(F.col("_tok")).alias("_h"))
    )
    aggs = [
        F.sum(
            F.when(F.shiftright("_h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{j}")
        for j in range(SIMHASH_BITS)
    ]
    g = ex.groupBy("doc_id").agg(*aggs)
    simhash = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"_b{j}") > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        simhash = bit if simhash is None else simhash + bit
    return g.select("doc_id", simhash.alias("simhash"))


def simhash60(text: Column) -> Column:
    """Single-column convenience form (tests / one-off use).  Prefer
    with_simhash60 for datasets — this form re-evaluates the md5
    transform per bit because the hash array isn't materialized."""
    toks = F.split(F.lower(F.trim(text)), "\\s+")
    return simhash60_from_hashes(F.transform(toks, token_hash60))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Pigeonhole banding over 4 bands of 15 bits: any pair within hamming
    distance 3 has at least one band with zero differing bits, so a
    single equality self-join on exploded (band_idx, band_val) is EXACT
    for max_hamming <= 3 (recall documented above that radius).
    Equality joins scale — no O(N^2) pair explosion.  Signatures are
    persisted so the self-join doesn't re-derive the md5 fold per side."""
    s = tracked_persist(with_simhash60(docs, id_col, text_col))
    mask = (1 << SIM_BAND_WIDTH) - 1
    bands = F.array(
        *[
            F.shiftright(F.col("simhash"), b * SIM_BAND_WIDTH).bitwiseAND(F.lit(mask))
            for b in range(SIM_BANDS)
        ]
    )
    banded = s.select(
        "doc_id", "simhash", F.posexplode(bands).alias("band_idx", "band_val")
    )
    l = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sim_a"),
        "band_idx",
        "band_val",
    )
    r = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
        "band_idx",
        "band_val",
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        l.join(r, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        # hamming BEFORE the pair-dedup shuffle: bit_count is one codegen'd
        # instruction, so verifying candidates first means only true
        # near-dup pairs (tiny) reach the dropDuplicates exchange, not
        # every band collision (huge under skewed bands).
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def exact_dedup_clusters(
    docs: DataFrame, id_col: str = "doc_id", fingerprint: Column | None = None
) -> DataFrame:
    """Exact dedup: group by fingerprint, keep the min-id representative.
    Plain hash aggregation — map-side combine, one shuffle on the
    fingerprint, linear at any scale."""
    from cdc_practice_spark.functions.text import fingerprint_sorted_tokens

    fp = fingerprint if fingerprint is not None else fingerprint_sorted_tokens(F.col("text"))
    return (
        docs.withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("representative_id"),
        )
    )


def band_keys_array() -> Column:
    """The BANDS concat-ws'd band keys from mh0..mh{NUM_PERM-1} columns
    (shared by the batch LSH self-join and the incremental index)."""
    return F.array(
        *[
            F.concat_ws(
                "-",
                *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
            )
            for b in range(BANDS)
        ]
    )


def minhash_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """The persistent LSH index of a corpus: ``(bands, sigs)`` where
    bands = (doc_id, bk) and sigs = (doc_id, hs).

    ``bk`` folds the band index into the band key ("<idx>-<mins>") so
    the candidate join has ONE equality key — which is also the bucket
    key: a deployment stores the bands table bucketed by bk, making the
    index side of every later incremental join exchange-free (asserted
    in tests/test_dedup.py).  Building the index is one linear Arrow
    pass over the corpus; both tables grow append-only as batches are
    admitted."""
    base = tracked_persist(with_minhash_arrow(docs, id_col, text_col))
    bands = base.select("doc_id", F.explode(banded_keys_array()).alias("bk"))
    return bands, base.select("doc_id", "hs")


def banded_keys_array() -> Column:
    """band_keys_array with the band index folded into each key —
    "<band_idx>-<m0>-<m1>-..." — so one string column identifies the
    (band, bucket) pair."""
    return F.array(
        *[
            F.concat_ws(
                "-",
                F.lit(str(b)),
                *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
            )
            for b in range(BANDS)
        ]
    )


def incremental_dedup(
    new_docs: DataFrame,
    index_bands: DataFrame,
    index_sigs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dedup a NEW batch against an existing corpus index at O(batch)
    cost — the operation a 100 TB ingest pipeline actually runs (a full
    corpus re-dedup per arriving batch would be quadratic over time).

    Semantics (deterministic): a new document is a duplicate iff its
    verified Jaccard ≥ threshold against ANY document with a smaller
    doc_id — indexed corpus docs or earlier docs in the same batch.
    Output: (doc_id, is_dup, dup_of = smallest matching id, n_dup_matches)
    for every new doc.

    Scale shape: the new batch's bands equality-join the indexed bands
    (shuffle sized by the BATCH, pruned by band_key; with the index
    bucketed by band_key the corpus side doesn't even reshuffle);
    signature verify touches only candidates; the corpus is never
    rescanned or re-hashed."""
    nb = tracked_persist(with_minhash_arrow(new_docs, id_col, text_col))
    new_bands = tracked_persist(
        nb.select("doc_id", F.explode(banded_keys_array()).alias("bk"))
    )
    # candidate partners: anything sharing a band bucket with a SMALLER
    # id — covers both the indexed corpus and earlier same-batch docs.
    all_bands = index_bands.unionByName(new_bands)
    cands = (
        new_bands.alias("n")
        .join(all_bands.alias("o"), ["bk"])
        .select(F.col("n.doc_id").alias("new_id"), F.col("o.doc_id").alias("other_id"))
        .filter(F.col("other_id") < F.col("new_id"))
        .dropDuplicates(["new_id", "other_id"])
    )
    all_sigs = index_sigs.unionByName(nb.select("doc_id", "hs"))
    paired = cands.join(
        nb.select(F.col("doc_id").alias("new_id"), F.col("hs").alias("hs_n")), "new_id"
    ).join(
        all_sigs.select(F.col("doc_id").alias("other_id"), F.col("hs").alias("hs_o")),
        "other_id",
    )
    inter = F.size(F.array_intersect("hs_n", "hs_o")).cast("double")
    union = (F.size("hs_n") + F.size("hs_o")).cast("double") - inter
    matches = (
        paired.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .groupBy("new_id")
        .agg(
            F.min("other_id").alias("dup_of"),
            F.count(F.lit(1)).alias("n_dup_matches"),
        )
    )
    return (
        new_docs.select(F.col(id_col).alias("doc_id"))
        .join(matches, F.col("doc_id") == matches["new_id"], "left")
        .select(
            "doc_id",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
            F.coalesce("n_dup_matches", F.lit(0)).alias("n_dup_matches"),
        )
    )


def duplicate_span_stats(
    docs: DataFrame,
    n: int = 8,
    hashed: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT-substring duplication stats: for each document, how many of
    its n-token spans also occur in ANOTHER document (the signal behind
    exact-substring training-data dedup à la Lee et al. 2022, "Dedupli-
    cating Training Data Makes Language Models Better" — there via a
    distributed suffix array; here via the equivalent fixed-length span
    join, the shape that maps onto a groupBy engine).

    Pipeline (all JVM-side): tokenize → one explode to (doc, span) →
    pre-aggregate per (doc, span) [map-side combined, kills within-doc
    repeats early] → span-level doc-count → semi-join back → per-doc
    totals.  Within-doc repetition does NOT count (that's the separate
    dup_token_fraction signal); only spans shared ACROSS documents do.

    ``hashed=True`` (production): spans travel as xxhash64 fingerprints
    — 8 bytes each instead of the string, which is what the shuffle
    must carry at 100 TB (collision odds over even 10^12 distinct
    spans stay ~ 3·10^-2 per full corpus under 64-bit hashing, and a
    collision only inflates one doc's count by one).  ``hashed=False``
    keeps raw strings so a SQL twin in another engine (different hash
    functions) can replicate byte-for-byte — the oracle-gate mode.

    Returns (doc_id, n_spans, n_dup_spans) for every input document."""
    from cdc_practice_spark.functions.text import tokens

    w = tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), w.alias("w"))
    totals = base.select(
        "doc_id", F.greatest(F.size("w") - (n - 1), F.lit(0)).alias("n_spans")
    )
    gram = F.concat_ws(" ", F.slice(F.col("w"), F.col("i"), n))
    spans = (
        base.filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("w") - (n - 1))).alias("i"),
            "w",
        )
        .select("doc_id", (F.xxhash64(gram) if hashed else gram).alias("gram"))
    )
    per_doc_gram = spans.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("npos")
    )
    shared = (
        per_doc_gram.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("gram")
    )
    dup = (
        per_doc_gram.join(shared, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.sum("npos").alias("n_dup_spans"))
    )
    return (
        totals.join(dup, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_spans").cast("long").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        )
    )


def prefix_filtered_jaccard_join(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering — the SSJoin/
    PPJoin family (Chaudhuri-Ganti-Kaushik ICDE'06; Xiao et al. WWW'08):
    every pair of documents whose shingle-hash-set Jaccard ≥ threshold,
    with NO false negatives (unlike minhash/simhash, which trade recall
    for speed) and NO O(N²) comparison (unlike the brute-force verify
    tier).

    The lossless pruning fact: order each set by a global total order
    and keep only its PREFIX of length |s| − ⌈τ·|s|⌉ + 1; any pair with
    J ≥ τ must share at least one prefix element (dropping more than
    the prefix from either set leaves < τ-overlap possible).  So
    candidates = pairs sharing ≥1 prefix token — generated by ONE
    explode + equi-join on the token, never a cartesian — then exact
    Jaccard verifies just those.  A length filter rides the join
    (τ·max(|a|,|b|) ≤ min — necessary for J ≥ τ), pruning cross-size
    pairs before the exchange.

    This implementation orders by hash value (deterministic, zero extra
    passes); production index builds order by ascending corpus frequency
    — rarest-first prefixes collide least — at the cost of one df
    aggregation, the same posting-frequency pass the BM25 index makes.
    100 TB shape: the explode emits ≤ prefix-len rows/doc partitioned by
    token (the natural skew guard: a token's bucket is its posting
    list), the verify join is candidate-sized, and both are standard
    shuffles — no pairwise scan anywhere."""
    sets = with_shingle_hashes(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", F.array_sort(F.array_distinct("hs")).alias("s")
    )
    n = F.size("s")
    plen = n - F.ceil(n.cast("double") * F.lit(threshold)).cast("int") + 1
    pref = sets.select(
        "doc_id",
        n.alias("n"),
        F.explode(F.slice("s", F.lit(1), plen)).alias("tok"),
    )
    a = pref.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "tok"
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "tok"
    )
    cands = (
        a.join(b, "tok")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (
                F.greatest("na", "nb").cast("double") * F.lit(threshold)
                <= F.least("na", "nb").cast("double")
            )
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = (F.size("sa") + F.size("sb")).cast("double") - inter
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )
