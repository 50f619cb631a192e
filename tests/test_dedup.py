"""Dedup operator semantics on hand-crafted corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "dog lazy the over jumps fox brown quick the"),  # shuffled 1
        (5, "completely different text about spark engines and shuffles"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_catches_shuffled(docs):
    clusters = D.exact_dedup_clusters(docs).collect()
    by_rep = {r.representative_id: r.n_docs for r in clusters}
    # 1, 2 and 4 share a token set → one cluster of 3
    assert by_rep[1] == 3
    assert by_rep[3] == 1
    assert by_rep[5] == 1


def test_minhash_finds_near_dups(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical shingles
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert all(5 not in p for p in pairs)  # unrelated doc never pairs


def test_minhash_jaccard_exact_value(docs):
    # doc1 vs doc3: 7 shingles each, 6 shared (only the final
    # 'the lazy dog/cat' shingle differs) → J = 6/8
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.minhash_lsh_pairs(docs, threshold=0.1).collect()
    }
    assert pairs[(1, 3)] == 0.75


def test_simhash_identical_docs_equal(docs):
    s = {
        r.doc_id: r.simhash
        for r in docs.select(
            "doc_id", D.simhash60(F.col("text")).alias("simhash")
        ).collect()
    }
    assert s[1] == s[2]
    assert 0 <= s[1] < (1 << 60)
    # near-dup docs land close in hamming space, unrelated docs far
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(s[1], s[3]) < ham(s[1], s[5])


def test_simhash_pairs_hamming(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in D.simhash_pairs(docs, max_hamming=60).collect()
    }
    assert pairs[(1, 2)] == 0


def test_shingles_shorter_than_k(spark):
    """Docs with < k tokens fall back to one whole-text shingle instead
    of erroring (ANSI out-of-bounds)."""
    df = spark.createDataFrame([(1, "only two")], "doc_id long, text string")
    sh = df.select(D.shingles(F.col("text")).alias("sh")).head().sh
    assert sh == ["only two"]


def test_simhash_arrow_matches_jvm_on_adversarial_whitespace(spark):
    """The Arrow fast path must replicate split(lower(trim(text)),'\\s+')
    bit-for-bit — including Java's ASCII-only \\s, trim-strips-spaces-
    only, and kept trailing empty fields."""
    rows = [
        (1, "The quick brown fox"),
        (2, ""),                      # split('') == ['']
        (3, "   leading and trailing   "),
        (4, "tab\tseparated\ttokens"),
        (5, "trailing newline\n"),    # trim keeps \n → trailing '' token
        (6, "nbsp joined"),      # unicode space: NOT a separator in Java \s
        (7, "UPPER Case MiXeD"),
        (8, "multi   \t \n  space"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    jvm = {r.doc_id: r.simhash for r in D.with_simhash60_sql(docs).collect()}
    arw = {r.doc_id: r.simhash for r in D.with_simhash60_arrow(docs).collect()}
    assert arw == jvm


def test_minhash_arrow_matches_jvm_on_adversarial_whitespace(spark):
    """with_minhash_arrow (one-pass hashlib/numpy fold) must reproduce
    the JVM pipeline exactly: same tokenizer quirks as simhash above,
    plus shingle fallback for short docs, array_distinct ordering, and
    the mod-P permutation mins."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, ""),
        (3, "   leading and trailing   "),
        (4, "tab\tseparated\ttokens and more words here"),
        (5, "trailing newline\n"),
        (6, "nbsp joined"),
        (7, "only two"),
        (8, "repeat repeat repeat repeat repeat"),  # distinct shingles collapse
        (9, "multi   \t \n  space separated words"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    jvm_hs = D.with_shingle_hashes(docs).select("doc_id", "hs")
    jvm_sig = {
        r.doc_id: tuple(r[f"mh{j}"] for j in range(D.NUM_PERM))
        for r in jvm_hs.select(
            "doc_id", *D.minhash_signature(F.col("hs"))
        ).collect()
    }
    arw = D.with_minhash_arrow(docs).collect()
    arw_sig = {r.doc_id: tuple(r[f"mh{j}"] for j in range(D.NUM_PERM)) for r in arw}
    assert arw_sig == jvm_sig
    jvm_hs_map = {r.doc_id: list(r.hs) for r in jvm_hs.collect()}
    arw_hs_map = {r.doc_id: list(r.hs) for r in arw}
    assert arw_hs_map == jvm_hs_map


def test_minhash_arrow_g8_matches_jvm(spark):
    """The kernel's 8-gram hash column (gram_k=8, r8 decontamination)
    must equal the JVM pair transform(shingles_from_tokens(toks, 8),
    token_hash60) — the expression the frozen-blocklist builder and the
    DuckDB oracle's _g8_sql mirror — on the same adversarial texts."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today again"),
        (2, ""),
        (3, "short doc"),  # < 8 tokens → one full-string gram
        (4, "tab\tseparated\ttokens and more words here to cross eight"),
        (5, "a b c d e f g h a b c d e f g h"),  # repeated grams collapse
        (6, "multi   \t \n  space separated words one two three four five"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    toks = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    jvm = {
        r.doc_id: list(r.g8)
        for r in docs.select("doc_id", toks.alias("_toks"))
        .select(
            "doc_id",
            F.transform(
                D.shingles_from_tokens(F.col("_toks"), k=8), D.token_hash60
            ).alias("g8"),
        )
        .collect()
    }
    arw = {
        r.doc_id: list(r.g8)
        for r in D.with_minhash_arrow(docs, gram_k=8).collect()
    }
    assert arw == jvm


def test_minhash_arrow_rejects_reserved_passthrough(spark):
    """A passthrough column colliding with a generated output column
    must raise instead of silently overwriting it (r7 ADVICE)."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "some text", "x")], ["doc_id", "text", "hs"]
    )
    with pytest.raises(ValueError, match="passthrough"):
        D.with_minhash_arrow(docs, passthrough=["hs"])


def test_incremental_dedup_matches_full_pairs(spark, sf_dir):
    """Incremental verdicts must agree with the full-corpus pair list:
    a batch doc is a duplicate iff the full LSH pair set links it to any
    smaller-id doc."""
    from pyspark.sql import functions as F

    from cdc_practice_spark.operators import dedup as D
    from cdc_practice_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    cut_val = docs.agg(F.floor((F.max("doc_id") + 1) * 0.8).cast("long")).head()[0]
    corpus = docs.filter(F.col("doc_id") < cut_val)
    batch = docs.filter(F.col("doc_id") >= cut_val)
    bands, sigs = D.minhash_index(corpus)
    got = {
        r.doc_id: (r.is_dup, r.dup_of)
        for r in D.incremental_dedup(batch, bands, sigs, threshold=0.8).collect()
    }
    full_pairs = D.minhash_lsh_pairs(docs, threshold=0.8).collect()
    partners = {}
    for r in full_pairs:
        partners.setdefault(r.doc_b, set()).add(r.doc_a)  # doc_a < doc_b
    assert set(got) == {r.doc_id for r in batch.select("doc_id").collect()}
    for doc_id, (is_dup, dup_of) in got.items():
        smaller = partners.get(doc_id, set())
        assert is_dup == bool(smaller)
        assert dup_of == (min(smaller) if smaller else None)


def test_incremental_dedup_bucketed_index_no_corpus_exchange(spark, sf_dir, tmp_path):
    """The deployment claim in incremental_dedup's docstring: with the
    band index stored bucketed by band_key, the candidate join reads the
    corpus-side buckets in place — only the (small) batch side
    exchanges."""
    from pyspark.sql import functions as F

    from cdc_practice_spark.operators import dedup as D
    from cdc_practice_spark.session import load_table
    from cdc_practice_spark.sources.bucketed import (
        bucketed_join_ready,
        write_bucketed,
    )

    import uuid

    bucketed_join_ready(spark)
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    bands, _sigs = D.minhash_index(corpus)
    table = f"idx_bands_{uuid.uuid4().hex[:8]}"
    write_bucketed(bands, table, "bk", n_buckets=8)
    index_bands = spark.table(table)

    from cdc_practice_spark.plans.explain import physical_tree, plan_string

    nb = D.with_minhash_arrow(batch)
    new_bands = nb.select("doc_id", F.explode(D.banded_keys_array()).alias("bk"))
    joined = new_bands.join(index_bands, ["bk"])
    # disable broadcast: the point is co-location, not a broadcast (at
    # 100 TB the index side never broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert "Bucketed: true" in plan_string(joined, "formatted")
        # no exchange above the bucketed index scan: every Exchange in
        # the tree sits on the batch side (before the scan appears)
        tree = physical_tree(joined)
        scan_part = tree[tree.index(table):]
        assert "Exchange" not in scan_part, scan_part[:2000]
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_duplicate_span_stats_hashed_equals_string_mode(spark, sf_dir):
    """xxhash64 fingerprint mode must produce identical per-doc counts
    to raw-string mode (no collisions at fixture scale) — the guarantee
    that lets production shuffle 8-byte hashes instead of strings."""
    from cdc_practice_spark.operators.dedup import duplicate_span_stats
    from cdc_practice_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, duplicate_span_stats(docs, n=8, hashed=True).collect()))
    b = sorted(map(tuple, duplicate_span_stats(docs, n=8, hashed=False).collect()))
    assert a == b


def test_duplicate_span_stats_semantics(spark):
    """Hand-built corpus: shared span counted per occurrence, within-doc
    repetition alone NOT counted, short docs have zero spans."""
    from cdc_practice_spark.operators.dedup import duplicate_span_stats

    shared = "a b c d e f g h"           # 8 tokens, one span
    docs = spark.createDataFrame(
        [
            (1, shared + " x y z"),       # spans: 4; span@1 shared with doc 2
            (2, "p q " + shared),         # spans: 3; span@3 shared with doc 1
            (3, "r r r r r r r r r r"),   # within-doc repeats only
            (4, "too short"),             # < 8 tokens → 0 spans
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.n_spans, r.n_dup_spans)
            for r in duplicate_span_stats(docs, n=8).collect()}
    assert rows[1] == (4, 1)
    assert rows[2] == (3, 1)
    assert rows[3] == (3, 0)  # 'r r ... r' spans identical WITHIN doc only
    assert rows[4] == (0, 0)


def test_prefix_filtered_jaccard_exact_vs_bruteforce(docs):
    """The lossless-pruning claim: prefix filtering must return EXACTLY
    the brute-force threshold-join result — no missed pair (broken
    prefix length), no extra pair (broken verify)."""
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.prefix_filtered_jaccard_join(docs, threshold=0.5).collect()
    }
    sets = {
        r.doc_id: set(r.hs)
        for r in D.with_shingle_hashes(docs).collect()
    }
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
            if j >= 0.5:
                want[(a, b)] = j
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 1.0


def test_prefix_filtered_jaccard_no_cartesian(docs):
    """Candidates come from an equi-join on prefix tokens; a cartesian
    here would mean the lossless filter degenerated to all-pairs."""
    plan = D.prefix_filtered_jaccard_join(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
