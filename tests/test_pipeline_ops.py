"""Unit tests for the tier-2 training-pipeline operators (packing,
bigram LM, int8 quantization, semantic dedup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.operators.packing import pack_greedy
from cdc_practice_spark.session import load_table


def test_pack_greedy_semantics(spark):
    rows = [
        # group g: 100+100 fit (200<=256), +100 overflows -> new bin
        ("g", 0, 100), ("g", 1, 100), ("g", 2, 100),
        # oversize doc gets its own bin, then packing continues
        ("g", 3, 400), ("g", 4, 50),
        # second group independent
        ("h", 0, 256), ("h", 1, 1),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = {
        (r.source, r.doc_id): (r.bin_id, r.bin_fill)
        for r in pack_greedy(df, capacity=256).collect()
    }
    assert out[("g", 0)] == (0, 100)
    assert out[("g", 1)] == (0, 200)
    assert out[("g", 2)] == (1, 100)   # 200+100 > 256 -> new bin
    assert out[("g", 3)] == (2, 400)   # oversize alone
    assert out[("g", 4)] == (3, 50)    # 400 full -> next bin
    assert out[("h", 0)] == (0, 256)   # exact fit
    assert out[("h", 1)] == (1, 1)     # 256+1 > 256 -> new bin


def test_pack_greedy_never_splits_and_respects_capacity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_greedy(docs, capacity=256)
    # every doc appears exactly once
    assert packed.count() == docs.count()
    # no bin exceeds capacity unless it holds a single oversize doc
    bins = (
        packed.groupBy("source", "bin_id")
        .agg(F.sum("n_tokens").alias("total"), F.count("*").alias("n"))
        .filter((F.col("total") > 256) & (F.col("n") > 1))
    )
    assert bins.count() == 0


def test_threshold_pairs_match_expr_variant(spark, sf_dir):
    from cdc_practice_spark.functions.vectors import dot, norm
    from cdc_practice_spark.operators.similarity import threshold_similar_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r.id_a, r.id_b, r.cosine)
        for r in threshold_similar_pairs(emb, threshold=0.3).collect()
    }
    # independent pure-expression recompute of the blocked pairs
    base = emb.select(
        F.col("vec_id").alias("vid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        F.col("label").alias("cell"),
    ).withColumn("nrm", norm(F.col("v")))
    a = base.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), "cell",
    )
    b = base.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "cell",
    )
    allp = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
        .collect()
    )
    want = {(r.id_a, r.id_b, r.cosine) for r in allp}
    assert got == want


def test_bigram_probs_sum_to_one(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bg = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(split(text, ' ')) - 2), "
                "i -> struct(split(text, ' ')[i] AS w1, "
                "split(text, ' ')[i + 1] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c2 = bg.groupBy("w1", "w2").count().withColumnRenamed("count", "n2")
    c1 = bg.groupBy("w1").count().withColumnRenamed("count", "n1")
    sums = (
        c2.join(c1, "w1")
        .groupBy("w1")
        .agg(F.sum(F.col("n2") / F.col("n1")).alias("s"))
        .collect()
    )
    assert sums and all(abs(r.s - 1.0) < 1e-9 for r in sums)


def test_quantization_bounds(spark, sf_dir):
    from cdc_practice_spark.queries.pipeline_queries import embedding_quantize_int8

    out = embedding_quantize_int8(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.q_l1 <= 127 * 64
        assert abs(r.q_sum) <= r.q_l1
        # reconstruction error bounded by half a quantization step
        assert r.max_abs_err <= r.scale_r6 / 2 + 1e-6


def test_semantic_dedup_keep_is_consistent(spark, sf_dir):
    from cdc_practice_spark.queries.pipeline_queries import semantic_dedup_keep

    rows = semantic_dedup_keep(spark, sf_dir).collect()
    by_id = {r.vec_id: r for r in rows}
    reps = {r.cluster_rep for r in rows}
    for r in rows:
        assert r.cluster_rep <= r.vec_id
        assert r.is_kept == (r.vec_id == r.cluster_rep)
    # every cluster representative keeps itself
    for rep in reps:
        assert by_id[rep].is_kept


def test_pack_greedy_matches_python_model_on_random_feeds(spark):
    """Property: pack_greedy equals the sequential first-fit model for
    arbitrary group/size interleavings (oversize docs, exact fits,
    singleton groups)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    feeds = st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=1, max_value=300),
        ),
        min_size=1,
        max_size=40,
    )

    @given(feeds)
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(rows):
        data = [(g, i, n) for i, (g, n) in enumerate(rows)]
        df = spark.createDataFrame(data, "source string, doc_id long, n_tokens long")
        got = {
            (r.source, r.doc_id): (r.bin_id, r.bin_fill)
            for r in pack_greedy(df, capacity=256).collect()
        }
        want = {}
        state: dict = {}
        for g, i, n in sorted(data, key=lambda t: (t[0], t[1])):
            bin_id, fill = state.get(g, (0, 0))
            if fill > 0 and fill + n > 256:
                bin_id, fill = bin_id + 1, 0
            fill += n
            state[g] = (bin_id, fill)
            want[(g, i)] = (bin_id, fill)
        assert got == want

    check()


def test_shard_export_idempotent_and_crash_repair(spark, sf_dir):
    """r11 exporter contract: fresh export writes file-per-shard + the
    manifest; re-run is a no-op (shard files byte-untouched); a crash
    BEFORE the manifest commit (simulated by deleting the manifest)
    leaves a state the next run repairs to reader-verified integrity;
    every shard is exactly one data file."""
    import glob
    import os
    import tempfile

    from cdc_practice_spark.operators.shards import (
        export_token_shards,
        verify_token_shards,
    )
    from cdc_practice_spark.queries.pipeline_queries import (
        _tokenized_shard_frames,
    )
    from cdc_practice_spark.queries.streaming_queries import TMP_ROOT

    os.makedirs(TMP_ROOT, exist_ok=True)
    out = os.path.join(
        tempfile.mkdtemp(prefix="shard_exp_t_", dir=TMP_ROOT), "shards"
    )
    stream, sharded = _tokenized_shard_frames(spark, sf_dir)
    res = export_token_shards(spark, stream, sharded, out)
    assert res["written"] and res["n_shards"] > 0
    ver = verify_token_shards(spark, out)
    rows = ver.collect()
    assert len(rows) == res["n_shards"]
    assert all(r.files_match for r in rows)
    # file-per-shard: each shard dir holds exactly one parquet file
    shard_dirs = glob.glob(os.path.join(out, "source=*", "shard_id=*"))
    assert len(shard_dirs) == res["n_shards"]
    for d in shard_dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d
    # no-op re-run: mtimes untouched
    mtimes = {p: os.path.getmtime(p) for d in shard_dirs
              for p in glob.glob(os.path.join(d, "*.parquet"))}
    assert export_token_shards(spark, stream, sharded, out) == {
        "written": False, "n_shards": 0,
    }
    assert mtimes == {p: os.path.getmtime(p) for p in mtimes}
    # crash window: manifest missing (export died pre-commit) → the
    # next run rewrites and re-commits; reader verifies green again
    os.unlink(os.path.join(out, "_EXPORT_MANIFEST"))
    res2 = export_token_shards(spark, stream, sharded, out)
    assert res2["written"] and res2["n_shards"] == res["n_shards"]
    assert all(r.files_match for r in verify_token_shards(spark, out).collect())


def test_shard_verify_flags_file_only_shard(spark, sf_dir):
    """review r11: shard data on disk the manifest never committed must
    surface as a files_match=false row, not be silently ignored."""
    import glob
    import os
    import shutil
    import tempfile

    from cdc_practice_spark.operators.shards import (
        export_token_shards,
        verify_token_shards,
    )
    from cdc_practice_spark.queries.pipeline_queries import (
        _tokenized_shard_frames,
    )
    from cdc_practice_spark.queries.streaming_queries import TMP_ROOT

    os.makedirs(TMP_ROOT, exist_ok=True)
    out = os.path.join(
        tempfile.mkdtemp(prefix="shard_rogue_t_", dir=TMP_ROOT), "shards"
    )
    stream, sharded = _tokenized_shard_frames(spark, sf_dir)
    export_token_shards(spark, stream, sharded, out)
    # plant a rogue shard: copy an existing one to an uncommitted id
    some = sorted(glob.glob(os.path.join(out, "source=*", "shard_id=*")))[0]
    rogue = os.path.join(os.path.dirname(some), "shard_id=9999")
    shutil.copytree(some, rogue)
    rows = verify_token_shards(spark, out).collect()
    bad = [r for r in rows if not r.files_match]
    assert len(bad) == 1 and bad[0].shard_id == 9999
    assert bad[0].n_tokens is None  # no manifest row for it
    good = [r for r in rows if r.files_match]
    assert len(good) == len(rows) - 1 and good  # the rest still verify


def test_shard_capacity_sizes_manifest_not_corpus(spark, sf_dir):
    """r12 (VERDICT r11 wrong #2): shard capacity is a sized parameter —
    manifest cardinality is decided by seqs_per_shard policy, NOT by
    corpus size.  4× the capacity over the same corpus must shrink the
    per-source shard count ~4× (ceil'd), and the derivation helper
    floors at the production bound so the test-scaled constant can't
    leak into a corpus-scale export."""
    import math

    from cdc_practice_spark.queries.pipeline_queries import (
        _SHARD_SEQS,
        SHARD_SEQS_PROD_FLOOR,
        _tokenized_shard_frames,
        shard_seqs_for,
    )

    def shards_per_source(seqs_per_shard):
        _, sharded = _tokenized_shard_frames(
            spark, sf_dir, seqs_per_shard=seqs_per_shard
        )
        return {
            r.source: (r.n_shards, r.n_bins)
            for r in sharded.groupBy("source")
            .agg(
                F.countDistinct("shard_id").alias("n_shards"),
                F.countDistinct("bin_id").alias("n_bins"),
            )
            .collect()
        }

    small = shards_per_source(_SHARD_SEQS)
    big = shards_per_source(4 * _SHARD_SEQS)
    assert small.keys() == big.keys()
    for src in small:
        n_small, n_bins = small[src]
        n_big, _ = big[src]
        # exact: shard_id = bin_id // seqs_per_shard over dense bin ids
        assert n_small == math.ceil(n_bins / _SHARD_SEQS)
        assert n_big == math.ceil(n_bins / (4 * _SHARD_SEQS))
    # the sizing helper: GB-scale target dominates, floor guards small
    assert shard_seqs_for(1 << 30, tokens_per_seq=8192) == (1 << 30) // (8192 * 4)
    assert shard_seqs_for(1 << 20, tokens_per_seq=8192) == SHARD_SEQS_PROD_FLOOR
    assert SHARD_SEQS_PROD_FLOOR > 100 * _SHARD_SEQS  # test constant can't leak


def test_shard_manifest_spill_roundtrip(spark, sf_dir):
    """r12: above the spill bound the manifest rows are written by Spark
    (never collected) and the committed JSON is a pointer record.  The
    spilled form must verify green, stay a no-op on re-run, present the
    same rows through read_export_manifest_df as the inline form, and
    keep the JSON replace as the one commit point."""
    import os
    import tempfile

    from cdc_practice_spark.operators.shards import (
        export_token_shards,
        read_export_manifest,
        read_export_manifest_df,
        verify_token_shards,
    )
    from cdc_practice_spark.queries.pipeline_queries import (
        _tokenized_shard_frames,
    )
    from cdc_practice_spark.queries.streaming_queries import TMP_ROOT

    os.makedirs(TMP_ROOT, exist_ok=True)
    base = tempfile.mkdtemp(prefix="shard_spill_t_", dir=TMP_ROOT)
    inline_out = os.path.join(base, "inline")
    spill_out = os.path.join(base, "spill")
    stream, sharded = _tokenized_shard_frames(spark, sf_dir)
    res_i = export_token_shards(spark, stream, sharded, inline_out)
    # force the spill path: every real export exceeds bound 0
    res_s = export_token_shards(
        spark, stream, sharded, spill_out, manifest_spill_rows=0
    )
    assert res_s == res_i and res_s["n_shards"] > 0
    man = read_export_manifest(spill_out)
    assert isinstance(man, dict) and man["format"] == "parquet"
    assert man["n_shards"] == res_s["n_shards"]
    assert os.path.isdir(os.path.join(spill_out, man["rows_dir"]))
    assert isinstance(read_export_manifest(inline_out), list)
    # both forms agree row-for-row through the DataFrame reader
    cols = ["source", "shard_id", "n_seqs", "n_docs", "n_tokens", "digest"]
    df_i = read_export_manifest_df(spark, inline_out).orderBy(*cols[:2])
    df_s = read_export_manifest_df(spark, spill_out).orderBy(*cols[:2])
    assert [tuple(r) for r in df_i.select(cols).collect()] == [
        tuple(r) for r in df_s.select(cols).collect()
    ]
    # reader-side integrity green on the spilled form (also proves the
    # _-prefixed rows dir is invisible to the data scan)
    ver = verify_token_shards(spark, spill_out).collect()
    assert len(ver) == res_s["n_shards"] and all(r.files_match for r in ver)
    # pointer manifest still gates re-runs
    assert export_token_shards(
        spark, stream, sharded, spill_out, manifest_spill_rows=0
    ) == {"written": False, "n_shards": 0}
