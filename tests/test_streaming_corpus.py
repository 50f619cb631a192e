"""Streaming corpus ingest (streaming/corpus.py): stream/batch identity,
crash-replay exactly-once, and cross-batch pack-state continuation."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from cdc_practice_spark.queries.streaming_queries import TMP_ROOT


def _run_ingest(spark, sf_dir, work, n_files=3):
    from cdc_practice_spark.functions import text as T
    from cdc_practice_spark.operators.corpus import (
        corpus_features,
        freeze_corpus_stats,
    )
    from cdc_practice_spark.plans.cache import tracked_persist
    from cdc_practice_spark.queries.pipeline_queries import _INCR_BATCH_MOD
    from cdc_practice_spark.queries.streaming_queries import (
        _split_docs_batch_into_files,
    )
    from cdc_practice_spark.session import load_table
    from cdc_practice_spark.streaming.corpus import (
        seed_ingest_index,
        stream_corpus_ingest,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % _INCR_BATCH_MOD == 3
    src = os.path.join(work, "src")
    if not os.path.isdir(src):
        os.makedirs(src)
        _split_docs_batch_into_files(spark, docs.filter(is_batch), src, n_files)
    store = os.path.join(work, "store")
    if not os.path.isdir(store):
        from cdc_practice_spark.operators import dedup as D
        from cdc_practice_spark.operators.corpus import DECON_GRAM_K

        feats_c = tracked_persist(corpus_features(docs.filter(~is_batch)))
        blocklist = [
            int(r["g"])
            for r in docs.filter(F.col("doc_id") % 97 == 0)
            .select(T.tokens(F.col("text")).alias("_toks"))
            .select(
                F.explode(
                    D.shingles_from_tokens(F.col("_toks"), k=DECON_GRAM_K)
                ).alias("s")
            )
            .select(D.token_hash60(F.col("s")).alias("g"))
            .distinct()
            .collect()
        ]
        stats = freeze_corpus_stats(feats_c, blocklist)
        seed_ingest_index(spark, feats_c, store, stats.q25)
        import json

        with open(os.path.join(work, "stats.json"), "w") as fh:
            json.dump(
                {
                    "q25": stats.q25,
                    "rates": stats.rates,
                    "blocklist": list(stats.blocklist_grams),
                },
                fh,
            )
    import json

    from cdc_practice_spark.operators.corpus import FrozenCorpusStats

    with open(os.path.join(work, "stats.json")) as fh:
        d = json.load(fh)
    stats = FrozenCorpusStats(
        q25=d["q25"],
        rates=d["rates"],
        blocklist_grams=tuple(d["blocklist"]),
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_corpus_ingest(
        spark, stream, stats, store, os.path.join(work, "ckpt")
    )
    q.awaitTermination()
    return store


def test_stream_equals_batch_incremental(spark, sf_dir):
    """The union of per-epoch disposition deltas must be ROW-IDENTICAL
    to running the whole batch at once (corpus_e2e_incremental): id-
    ordered chunking changes no curation decision and no bin boundary."""
    from cdc_practice_spark.queries.pipeline_queries import (
        corpus_e2e_incremental,
    )
    from cdc_practice_spark.streaming.corpus import load_ingest_dispositions

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="corpus_stream_", dir=TMP_ROOT)
    store = _run_ingest(spark, sf_dir, work)
    streamed = {
        tuple(r) for r in load_ingest_dispositions(spark, store).collect()
    }
    batch = {tuple(r) for r in corpus_e2e_incremental(spark, sf_dir).collect()}
    assert streamed == batch


def test_ingest_kill_resume_exactly_once(spark, sf_dir):
    """Forge the crash-replay hazard (delete the last stream commit,
    restart): the re-applied epoch must read PRE-epoch index/pack state
    and overwrite its own deltas — final dispositions byte-identical,
    one row per batch doc, no epoch applied twice."""
    from cdc_practice_spark.streaming.corpus import (
        _read_manifest,
        load_ingest_dispositions,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="corpus_kill_", dir=TMP_ROOT)
    store = _run_ingest(spark, sf_dir, work)
    before = sorted(
        tuple(r) for r in load_ingest_dispositions(spark, store).collect()
    )
    commits = sorted(
        c
        for c in os.listdir(os.path.join(work, "ckpt", "commits"))
        if not c.startswith(".")
    )
    os.remove(os.path.join(work, "ckpt", "commits", commits[-1]))
    crc = os.path.join(work, "ckpt", "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    store2 = _run_ingest(spark, sf_dir, work)
    after = sorted(
        tuple(r) for r in load_ingest_dispositions(spark, store2).collect()
    )
    assert after == before
    epochs = _read_manifest(store2)
    assert len(epochs) == len(set(epochs)), "an epoch committed twice"
    ids = [t[0] for t in after]
    assert len(ids) == len(set(ids)), "a doc landed in two deltas"


def test_pack_greedy_init_state_continues_bins(spark):
    """pack_greedy(init=...) over id-ordered chunks must equal one
    whole-run packing — the invariant the streaming sink's carried
    per-source state relies on."""
    from cdc_practice_spark.operators.packing import pack_greedy

    rows = [("s", i, 90 + (i % 3) * 40) for i in range(20)] + [
        ("t", i, 200) for i in range(7)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    whole = {
        (r.source, r.doc_id): (r.bin_id, r.bin_fill)
        for r in pack_greedy(df, 256).collect()
    }
    first = pack_greedy(df.filter(F.col("doc_id") < 10), 256).collect()
    state = {}
    for r in sorted(first, key=lambda r: (r.source, r.doc_id)):
        state[r.source] = (r.bin_id, r.bin_fill)
    second = pack_greedy(
        df.filter(F.col("doc_id") >= 10), 256, init=state
    ).collect()
    chunked = {
        (r.source, r.doc_id): (r.bin_id, r.bin_fill) for r in first + second
    }
    assert chunked == whole


def test_compact_ingest_index_preserves_index_and_resumability(spark, sf_dir):
    """Compaction folds all index deltas into one base dir: the loaded
    index must be row-identical before/after, the folded delta dirs must
    be GONE (a later load would double-count them), and dispositions
    stay intact."""
    from cdc_practice_spark.streaming.corpus import (
        _read_manifest,
        compact_ingest_index,
        load_ingest_dispositions,
        load_ingest_index,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="corpus_compact_", dir=TMP_ROOT)
    store = _run_ingest(spark, sf_dir, work)
    before_idx = sorted(
        (r.doc_id, tuple(r.hs)) for r in load_ingest_index(spark, store).collect()
    )
    before_disp = sorted(
        tuple(r) for r in load_ingest_dispositions(spark, store).collect()
    )
    n_dirs_before = len(
        [d for d in os.listdir(store) if d.startswith("idx_delta_v")]
    )
    assert n_dirs_before >= 4  # seed + 3 epochs
    n = compact_ingest_index(spark, store)
    assert n == len(before_idx)
    after_idx = sorted(
        (r.doc_id, tuple(r.hs)) for r in load_ingest_index(spark, store).collect()
    )
    assert after_idx == before_idx
    n_dirs_after = len(
        [d for d in os.listdir(store) if d.startswith("idx_delta_v")]
    )
    assert n_dirs_after == 1
    after_disp = sorted(
        tuple(r) for r in load_ingest_dispositions(spark, store).collect()
    )
    assert after_disp == before_disp
    assert -2 in _read_manifest(store)
    # compacting twice is a no-op on content
    n2 = compact_ingest_index(spark, store)
    assert n2 == n

def test_wiped_checkpoint_same_path_fresh_run(spark, sf_dir):
    """r8 (VERDICT r7 wrong #3 + ADVICE medium): wiping the checkpoint
    and restarting at the SAME path against the SAME store must behave
    as a brand-new run — a fresh run token (no stale pre-epoch pin
    reuse) and store epochs offset past the committed ones (no in-place
    overwrite of committed deltas).  Every re-delivered doc must come
    back dropped (its first copy is in the index) — zero double-
    admissions — and run 1's committed dispositions survive untouched."""
    import shutil

    from cdc_practice_spark.streaming.corpus import (
        _read_manifest,
        load_ingest_dispositions,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="corpus_wipe_", dir=TMP_ROOT)
    store = _run_ingest(spark, sf_dir, work)
    before = sorted(
        tuple(r) for r in load_ingest_dispositions(spark, store).collect()
    )
    epochs_before = _read_manifest(store)
    shutil.rmtree(os.path.join(work, "ckpt"))  # the wiped-and-reused path
    store2 = _run_ingest(spark, sf_dir, work)
    after = load_ingest_dispositions(spark, store2).collect()
    after_t = sorted(tuple(r) for r in after)
    # run 1's rows are intact (no delta dir was overwritten in place)
    assert set(before) <= set(after_t)
    # every batch doc has exactly two rows now — one per run
    from collections import Counter

    assert all(c == 2 for c in Counter(t[0] for t in after_t).values())
    # no double-admission: the re-delivered copies never re-enter the
    # kept set (each matches its own first copy in the index)
    kept_after = [t for t in after_t if t[3] == "kept"]
    kept_before = [t for t in before if t[3] == "kept"]
    assert kept_after == kept_before
    # and the new run's epochs extended the manifest, no collisions
    epochs_after = _read_manifest(store2)
    assert len(epochs_after) == len(set(epochs_after))
    assert set(epochs_before) < set(epochs_after)


def test_streaming_funnel_sums_to_batch(spark, sf_dir):
    """r8 (VERDICT r7 ask #8): the per-epoch funnel deltas summed over
    epochs must equal the batch pipeline's disposition histogram — an
    ingest operator can watch quality drift per epoch without replaying
    dispositions."""
    from collections import Counter

    from cdc_practice_spark.queries.pipeline_queries import (
        corpus_e2e_incremental,
    )
    from cdc_practice_spark.streaming.corpus import load_ingest_funnel

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="corpus_funnel_", dir=TMP_ROOT)
    store = _run_ingest(spark, sf_dir, work)
    funnel = load_ingest_funnel(spark, store).collect()
    assert len({r["epoch"] for r in funnel}) >= 2, "per-epoch granularity"
    summed = Counter()
    for r in funnel:
        summed[r["stage"]] += r["n"]
    batch = Counter(
        r["disposition"]
        for r in corpus_e2e_incremental(spark, sf_dir).collect()
    )
    assert summed == batch


# ---------------------------------------------------------------------------
# Retroactive purge (r9): un-admit flagged docs from the maintained store.
# Synthetic harness — full control over dedup interactions so the
# never-admitted-rebuild identity is exact by construction (no purged doc
# is a near-dup partner of any other doc).
# ---------------------------------------------------------------------------


def _purge_harness_docs(spark, exclude_batch_ids=(), batch_lo=100, batch_hi=116):
    """20 corpus docs (ids 0..19) + 16 batch docs (default ids 100..115),
    all English, all textually unique (no near-dups anywhere)."""
    rows = []
    for i in list(range(20)) + [b for b in range(batch_lo, batch_hi)
                                if b not in exclude_batch_ids]:
        words = " ".join(f"w{i}x{j}" for j in range(10))
        rows.append((i, f"s{i % 2}", f"the {words} and item {i} of note"))
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def _run_purge_ingest(
    spark, work, exclude_batch_ids=(), capacity=40, batch_lo=100,
    batch_hi=116, run="",
):
    """Seed from the synthetic corpus, stream the batch docs as 2
    id-ordered chunks, return the store root.  ``run`` names the
    src/checkpoint pair so a SECOND stream run can continue the same
    store (the continuation-after-purge test)."""
    import json

    from cdc_practice_spark.operators.corpus import (
        FrozenCorpusStats,
        corpus_features,
        freeze_corpus_stats,
    )
    from cdc_practice_spark.plans.cache import tracked_persist
    from cdc_practice_spark.streaming.corpus import (
        seed_ingest_index,
        stream_corpus_ingest,
    )

    docs = _purge_harness_docs(spark, exclude_batch_ids, batch_lo, batch_hi)
    corpus, batch = docs.filter("doc_id < 100"), docs.filter("doc_id >= 100")
    src = os.path.join(work, f"src{run}")
    os.makedirs(src, exist_ok=True)
    mid = (batch_lo + batch_hi) // 2
    for k, (lo, hi) in enumerate([(batch_lo, mid), (mid, batch_hi)]):
        chunk = batch.filter(f"doc_id >= {lo} and doc_id < {hi}").coalesce(1)
        part = os.path.join(src, f"_part{k}")
        chunk.write.mode("overwrite").parquet(part)
        nm = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        os.rename(os.path.join(part, nm), os.path.join(src, f"c{k}.parquet"))
        import shutil as _sh
        import time as _t

        _sh.rmtree(part)
        _t.sleep(0.05)
    stats_p = os.path.join(work, "stats.json")
    if not os.path.exists(stats_p):
        feats_c = tracked_persist(corpus_features(corpus))
        st = freeze_corpus_stats(feats_c, [])
        with open(stats_p, "w") as fh:
            json.dump({"q25": st.q25, "rates": st.rates}, fh)
        store = os.path.join(work, "store")
        seed_ingest_index(spark, feats_c, store, st.q25)
    with open(stats_p) as fh:
        d = json.load(fh)
    stats = FrozenCorpusStats(
        q25=d["q25"], rates=d["rates"], blocklist_grams=()
    )
    store = os.path.join(work, "store")
    q = stream_corpus_ingest(
        spark,
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        stats,
        store,
        os.path.join(work, f"ckpt{run}"),
        capacity=capacity,
    )
    q.awaitTermination()
    return store


def _store_contents(spark, store):
    from cdc_practice_spark.streaming.corpus import (
        load_admitted_grams,
        load_ingest_dispositions,
        load_ingest_index,
    )

    disp = sorted(
        tuple(r) for r in load_ingest_dispositions(spark, store).collect()
    )
    idx = sorted(
        (r.doc_id, tuple(r.hs))
        for r in load_ingest_index(spark, store).collect()
    )
    g8 = sorted(
        (r.doc_id, tuple(r.g8))
        for r in load_admitted_grams(spark, store).collect()
    )
    return disp, idx, g8


def test_purge_equals_never_admitted_rebuild(spark):
    """purge_ingest_docs: post-purge store state must equal a
    from-scratch run that never admitted the purged docs — index rows,
    admitted grams, kept dispositions WITH bin assignments, and the
    carried pack state; purged docs keep their audit row flipped to
    'purged_contaminated'; delta dirs with no changed row stay
    byte-untouched."""
    from cdc_practice_spark.streaming.corpus import (
        PURGED_DISPOSITION,
        purge_ingest_docs,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="purge_id_", dir=TMP_ROOT)
    store = _run_purge_ingest(spark, work)
    disp0, idx0, g80 = _store_contents(spark, store)
    # purge two kept docs from the SECOND chunk (ids >= 108) so every
    # epoch-0 dir is provably untouched
    kept2 = [t[0] for t in disp0 if t[3] == "kept" and t[0] >= 108]
    assert len(kept2) >= 2, "harness must keep >=2 docs in chunk 2"
    purge = kept2[:2]
    epoch0_files = {}
    for d in os.listdir(store):
        if d.endswith("_v0") and not d.startswith("_INGEST"):
            p = os.path.join(store, d)
            for f in os.listdir(p):
                epoch0_files[os.path.join(p, f)] = os.path.getmtime(
                    os.path.join(p, f)
                )
    assert epoch0_files, "expected epoch-0 delta dirs"

    n = purge_ingest_docs(
        spark,
        store,
        spark.createDataFrame([(i,) for i in purge], "doc_id long"),
        capacity=40,
    )
    assert n == 2

    # untouched dirs byte-identical (same files, same mtimes)
    for path, mt in epoch0_files.items():
        assert os.path.getmtime(path) == mt, f"epoch-0 file rewritten: {path}"

    disp1, idx1, g81 = _store_contents(spark, store)
    # rebuild that never saw the purged docs
    work2 = tempfile.mkdtemp(prefix="purge_rb_", dir=TMP_ROOT)
    store2 = _run_purge_ingest(spark, work2, exclude_batch_ids=tuple(purge))
    disp2, idx2, g82 = _store_contents(spark, store2)

    assert idx1 == idx2
    assert g81 == g82
    purged_rows = [t for t in disp1 if t[0] in purge]
    assert [
        (t[3], t[4], t[5]) for t in purged_rows
    ] == [(PURGED_DISPOSITION, None, None)] * 2
    assert [t for t in disp1 if t[0] not in purge] == disp2
    # carried pack state equal → a resumed stream continues identically
    from cdc_practice_spark.streaming.corpus import _PACK_SCHEMA, _read_manifest

    def last_state(st):
        eps = [
            e
            for e in _read_manifest(st)
            if os.path.isdir(os.path.join(st, f"pack_state_v{e}"))
        ]
        return sorted(
            tuple(r)
            for r in spark.read.schema(_PACK_SCHEMA)
            .parquet(os.path.join(st, f"pack_state_v{eps[-1]}"))
            .collect()
        )

    assert last_state(store) == last_state(store2)
    # idempotent: the same purge again is a no-op
    assert (
        purge_ingest_docs(
            spark,
            store,
            spark.createDataFrame([(i,) for i in purge], "doc_id long"),
            capacity=40,
        )
        == 0
    )
    assert _store_contents(spark, store)[0] == disp1


def test_purge_heal_crash_windows(spark):
    """_heal_purge_asides: every crash window of the stage-rename-swap
    rolls back or completes on the next load — a reader never sees a
    missing or doubled delta dir."""
    import shutil

    from cdc_practice_spark.streaming.corpus import (
        _heal_purge_asides,
        load_ingest_dispositions,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="purge_heal_", dir=TMP_ROOT)
    store = _run_purge_ingest(spark, work)
    disp0 = sorted(
        tuple(r) for r in load_ingest_dispositions(spark, store).collect()
    )
    live = os.path.join(store, "disp_delta_v1")

    # window 1: crash after staging, before any rename — stale .purging
    shutil.copytree(live, live + ".purging")
    _heal_purge_asides(store)
    assert not os.path.isdir(live + ".purging")

    # window 2: crash between rename-aside and rename-in — live missing
    shutil.copytree(live, live + ".purging")
    os.rename(live, live + ".purged.old")
    got = sorted(
        tuple(r) for r in load_ingest_dispositions(spark, store).collect()
    )
    assert got == disp0  # loader healed: rolled back, nothing lost
    assert os.path.isdir(live)
    assert not os.path.isdir(live + ".purged.old")

    # window 3: crash after rename-in, before aside cleanup
    shutil.copytree(live, live + ".purged.old")
    got = sorted(
        tuple(r) for r in load_ingest_dispositions(spark, store).collect()
    )
    assert got == disp0
    assert not os.path.isdir(live + ".purged.old")


def test_ingest_writer_lease_excludes_concurrent_runs(spark, tmp_path):
    """r9 (r8 ADVICE): the store's single-writer assumption is enforced —
    a live concurrent writer is refused; a crashed process or a finished
    availableNow run is stolen from."""
    import json

    import pytest

    from cdc_practice_spark.streaming.corpus import (
        _acquire_writer_lease,
        _lease_path,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    lease = _lease_path(store)

    # dead pid → stale → steal
    with open(lease, "w") as fh:
        json.dump({"token": "aaaa", "pid": 2**22 + 12345, "query_id": "x"}, fh)
    _acquire_writer_lease(spark, store, "bbbb")
    assert json.load(open(lease))["token"] == "bbbb"

    # same token → resume allowed, lease untouched
    _acquire_writer_lease(spark, store, "bbbb")

    # our pid, query no longer active (finished availableNow run) → steal
    with open(lease, "w") as fh:
        json.dump(
            {"token": "cccc", "pid": os.getpid(), "query_id": "not-active"},
            fh,
        )
    _acquire_writer_lease(spark, store, "dddd")
    assert json.load(open(lease))["token"] == "dddd"

    # our pid, query STILL ACTIVE → refused
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.format("noop")
        .start()
    )
    try:
        with open(lease, "w") as fh:
            json.dump(
                {"token": "eeee", "pid": os.getpid(), "query_id": str(q.id)},
                fh,
            )
        with pytest.raises(RuntimeError, match="active run"):
            _acquire_writer_lease(spark, store, "ffff")
        # our pid, lease holder still starting (query_id None) → refused
        with open(lease, "w") as fh:
            json.dump(
                {"token": "gggg", "pid": os.getpid(), "query_id": None}, fh
            )
        with pytest.raises(RuntimeError, match="active run"):
            _acquire_writer_lease(spark, store, "hhhh")
    finally:
        q.stop()


def test_purge_then_continue_stream_identity(spark):
    """The operational loop end-to-end: ingest → purge → a LATER batch
    arrives and the stream continues.  The resumed run must pack from
    the post-purge fill state (the rewritten pack_state_v* dirs), so the
    final store equals a from-scratch history in which the purged docs
    were never admitted — including the second batch's bin boundaries.
    Also exercises the writer-lease takeover from a finished run."""
    from cdc_practice_spark.streaming.corpus import purge_ingest_docs

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="purge_cont_", dir=TMP_ROOT)
    store = _run_purge_ingest(spark, work)
    disp0, _, _ = _store_contents(spark, store)
    kept = [t[0] for t in disp0 if t[3] == "kept"]
    assert len(kept) >= 2
    purge = kept[:2]
    purge_ingest_docs(
        spark,
        store,
        spark.createDataFrame([(i,) for i in purge], "doc_id long"),
        capacity=40,
    )
    # the later batch continues the SAME store through a new stream run
    store = _run_purge_ingest(
        spark, work, batch_lo=200, batch_hi=216, run="2"
    )
    disp1, idx1, g81 = _store_contents(spark, store)

    # from-scratch history that never admitted the purged docs
    work2 = tempfile.mkdtemp(prefix="purge_cont_rb_", dir=TMP_ROOT)
    _run_purge_ingest(spark, work2, exclude_batch_ids=tuple(purge))
    store2 = _run_purge_ingest(
        spark, work2, batch_lo=200, batch_hi=216, run="2"
    )
    disp2, idx2, g82 = _store_contents(spark, store2)

    assert idx1 == idx2
    assert g81 == g82
    assert [t for t in disp1 if t[0] not in purge] == disp2


def test_purge_crash_between_phases_resumes_from_journal(spark, monkeypatch):
    """A purge that crashes AFTER flipping dispositions but BEFORE the
    index/gram deletion must complete on the next call via the persisted
    journal — the partial state can never become permanent."""
    import shutil

    import cdc_practice_spark.streaming.corpus as C

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="purge_jrnl_", dir=TMP_ROOT)
    store = _run_purge_ingest(spark, work)
    disp0, _, _ = _store_contents(spark, store)
    purge = [t[0] for t in disp0 if t[3] == "kept"][:2]
    pdf = spark.createDataFrame([(i,) for i in purge], "doc_id long")

    # the expected end state: a clone purged WITHOUT a crash
    ref_store = os.path.join(work, "ref_store")
    shutil.copytree(store, ref_store)
    C.purge_ingest_docs(spark, ref_store, pdf, capacity=40)
    ref = _store_contents(spark, ref_store)

    orig_swap = C._swap_store_dir

    def boom(root, name, df):
        if name.startswith("idx_delta"):
            raise RuntimeError("injected crash: before index deletion")
        return orig_swap(root, name, df)

    monkeypatch.setattr(C, "_swap_store_dir", boom)
    try:
        C.purge_ingest_docs(spark, store, pdf, capacity=40)
        raise AssertionError("injected crash did not fire")
    except RuntimeError as e:
        assert "injected crash" in str(e)
    monkeypatch.setattr(C, "_swap_store_dir", orig_swap)
    assert os.path.isdir(os.path.join(store, "_purge_journal"))

    # resume with an EMPTY purge list — the journal alone must finish it
    n = C.purge_ingest_docs(
        spark,
        store,
        spark.createDataFrame([], "doc_id long"),
        capacity=40,
    )
    assert n == 0  # the flips already happened in the crashed attempt
    assert not os.path.isdir(os.path.join(store, "_purge_journal"))
    assert _store_contents(spark, store) == ref


def _funnel_rows(spark, store):
    from cdc_practice_spark.streaming.corpus import load_ingest_funnel

    return sorted(tuple(r) for r in load_ingest_funnel(spark, store).collect())


def _last_pack_state(spark, store):
    from cdc_practice_spark.streaming.corpus import _PACK_SCHEMA, _read_manifest

    eps = [
        e
        for e in _read_manifest(store)
        if os.path.isdir(os.path.join(store, f"pack_state_v{e}"))
    ]
    return sorted(
        tuple(r)
        for r in spark.read.schema(_PACK_SCHEMA)
        .parquet(os.path.join(store, f"pack_state_v{eps[-1]}"))
        .collect()
    )


def test_compact_ingest_store_folds_everything_and_stream_continues(spark):
    """compact_ingest_store (r9): every loader's output is identical
    before/after the full fold, per-epoch funnel attribution survives,
    the per-epoch dirs are gone, and a LATER stream run continues
    packing from the folded pack state exactly like an uncompacted
    twin."""
    from cdc_practice_spark.streaming.corpus import compact_ingest_store

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="fullcomp_", dir=TMP_ROOT)
    work_twin = tempfile.mkdtemp(prefix="fullcomp_twin_", dir=TMP_ROOT)
    store = _run_purge_ingest(spark, work)
    _run_purge_ingest(spark, work_twin)  # uncompacted control
    before = _store_contents(spark, store)
    before_funnel = _funnel_rows(spark, store)
    before_pack = _last_pack_state(spark, store)

    counts = compact_ingest_store(spark, store)
    assert counts["disp_delta"] == len(before[0])
    assert _store_contents(spark, store) == before
    assert _funnel_rows(spark, store) == before_funnel
    assert _last_pack_state(spark, store) == before_pack
    for prefix in ("idx_delta", "disp_delta", "g8_delta", "pack_state"):
        dirs = [
            d
            for d in os.listdir(store)
            if d.startswith(prefix) and not d.startswith("_")
        ]
        assert dirs == [f"{prefix}_v-2"], f"{prefix}: {dirs}"

    # a later batch continues the compacted store and must match the
    # uncompacted twin's continuation row-for-row
    store = _run_purge_ingest(spark, work, batch_lo=200, batch_hi=216, run="2")
    twin = _run_purge_ingest(
        spark, work_twin, batch_lo=200, batch_hi=216, run="2"
    )
    assert _store_contents(spark, store) == _store_contents(spark, twin)
    assert _funnel_rows(spark, store) == _funnel_rows(spark, twin)
    assert _last_pack_state(spark, store) == _last_pack_state(spark, twin)

    # idempotent: folding again changes nothing
    compact_ingest_store(spark, store)
    assert _store_contents(spark, store) == _store_contents(spark, twin)

    # funnel retention policy
    n_funnel = len(
        [d for d in os.listdir(store) if d.startswith("funnel_delta_v")]
    )
    assert n_funnel >= 4  # 2 epochs per run x 2 runs
    compact_ingest_store(spark, store, funnel_keep_epochs=1)
    assert (
        len([d for d in os.listdir(store) if d.startswith("funnel_delta_v")])
        == 1
    )


def test_purge_after_full_compaction_keeps_epoch_attribution(spark):
    """Purging a FULLY-compacted store must produce exactly the state of
    purging the uncompacted twin — dispositions, index, grams, AND the
    per-epoch funnel rows (the folded disp base persists each row's true
    epoch, so the funnel recompute never loses attribution)."""
    from cdc_practice_spark.streaming.corpus import (
        compact_ingest_store,
        purge_ingest_docs,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="purgecomp_", dir=TMP_ROOT)
    work_twin = tempfile.mkdtemp(prefix="purgecomp_twin_", dir=TMP_ROOT)
    store = _run_purge_ingest(spark, work)
    twin = _run_purge_ingest(spark, work_twin)
    disp0, _, _ = _store_contents(spark, store)
    purge = [t[0] for t in disp0 if t[3] == "kept"][:2]
    pdf_rows = [(i,) for i in purge]

    compact_ingest_store(spark, store)
    n1 = purge_ingest_docs(
        spark, store, spark.createDataFrame(pdf_rows, "doc_id long"),
        capacity=40,
    )
    n2 = purge_ingest_docs(
        spark, twin, spark.createDataFrame(pdf_rows, "doc_id long"),
        capacity=40,
    )
    assert n1 == n2 == 2
    assert _store_contents(spark, store) == _store_contents(spark, twin)
    assert _funnel_rows(spark, store) == _funnel_rows(spark, twin)
    assert _last_pack_state(spark, store) == _last_pack_state(spark, twin)


def test_compact_crash_windows_never_lose_or_double(spark, monkeypatch):
    """The generation protocol's two crash windows: (a) crash BEFORE the
    manifest swap → readers stay on the old, complete view and a re-run
    GCs the orphaned staged bases; (b) crash AFTER the swap, before
    cleanup → readers are on the new complete view with no double
    counting, and the next maintenance entry GCs the old dirs."""
    import cdc_practice_spark.streaming.corpus as C

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="compcrash_", dir=TMP_ROOT)
    store = _run_purge_ingest(spark, work)
    before = _store_contents(spark, store)
    before_funnel = _funnel_rows(spark, store)

    # (a) crash before the commit point: fail the manifest swap itself
    orig_swap_manifest = C._swap_manifest

    def boom(*a, **k):
        raise RuntimeError("injected crash: before manifest swap")

    monkeypatch.setattr(C, "_swap_manifest", boom)
    try:
        C.compact_ingest_store(spark, store)
        raise AssertionError("injected crash did not fire")
    except RuntimeError as e:
        assert "injected crash" in str(e)
    monkeypatch.setattr(C, "_swap_manifest", orig_swap_manifest)
    # staged orphan generation exists, readers unaffected
    assert any(d.endswith("_v-2") for d in os.listdir(store))
    assert _store_contents(spark, store) == before
    assert _funnel_rows(spark, store) == before_funnel

    # re-run completes (GCs the orphan, stages a fresh generation)
    counts = C.compact_ingest_store(spark, store)
    assert counts["disp_delta"] == len(before[0])
    assert _store_contents(spark, store) == before
    assert _funnel_rows(spark, store) == before_funnel

    # (b) crash after the commit point: fail the first cleanup rmtree
    work2 = tempfile.mkdtemp(prefix="compcrash2_", dir=TMP_ROOT)
    store2 = _run_purge_ingest(spark, work2)
    before2 = _store_contents(spark, store2)
    import shutil as _sh

    orig_rmtree = _sh.rmtree
    fired = {"n": 0}

    def boom_rm(path, *a, **k):
        if "_delta_v" in str(path) or "pack_state_v" in str(path):
            fired["n"] += 1
            raise RuntimeError("injected crash: after manifest swap")
        return orig_rmtree(path, *a, **k)

    monkeypatch.setattr(C.shutil if hasattr(C, "shutil") else _sh, "rmtree", boom_rm)
    try:
        C.compact_ingest_store(spark, store2)
        raise AssertionError("injected crash did not fire")
    except RuntimeError as e:
        assert "injected crash" in str(e)
    monkeypatch.setattr(_sh, "rmtree", orig_rmtree)
    assert fired["n"] == 1
    # committed: readers are on the new base, no double counting even
    # though old per-epoch dirs still exist on disk
    assert _store_contents(spark, store2) == before2
    # next maintenance entry garbage-collects the old generation
    C.compact_ingest_store(spark, store2)
    assert _store_contents(spark, store2) == before2
    leftovers = [
        d
        for d in os.listdir(store2)
        if d.startswith(("idx_delta_v", "disp_delta_v", "g8_delta_v"))
        and not d.endswith("_v-3")
    ]
    assert leftovers == [], leftovers


def test_time_travel_survives_compaction_and_latest_equals_full(spark):
    """load_ingest_dispositions_at (r9): the as-of view must be
    identical before and after a FULL-STORE fold (the folded base keeps
    per-row true epochs), and as-of the latest epoch equals the full
    table."""
    from cdc_practice_spark.streaming.corpus import (
        _read_manifest,
        compact_ingest_store,
        load_ingest_dispositions,
        load_ingest_dispositions_at,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="tt_corpus_", dir=TMP_ROOT)
    store = _run_purge_ingest(spark, work)
    real = sorted(e for e in _read_manifest(store) if e >= 0)
    assert len(real) >= 2
    asof_first = sorted(
        tuple(r)
        for r in load_ingest_dispositions_at(spark, store, real[0]).collect()
    )
    full = sorted(
        tuple(r) for r in load_ingest_dispositions(spark, store).collect()
    )
    asof_last = sorted(
        tuple(r)
        for r in load_ingest_dispositions_at(spark, store, real[-1]).collect()
    )
    assert asof_last == full
    assert set(asof_first) < set(full)
    # chunk 1 is the ids < chunk 2's range — prefix by construction
    assert max(t[0] for t in asof_first) < min(
        t[0] for t in set(full) - set(asof_first)
    )

    compact_ingest_store(spark, store)
    assert (
        sorted(
            tuple(r)
            for r in load_ingest_dispositions_at(
                spark, store, real[0]
            ).collect()
        )
        == asof_first
    )
    assert (
        sorted(
            tuple(r)
            for r in load_ingest_dispositions_at(
                spark, store, real[-1]
            ).collect()
        )
        == full
    )


def test_abandoned_checkpoint_cannot_overwrite_later_runs(spark):
    """r9: a checkpoint paused before the store moved on (another run
    committed epochs past its frozen offset record) must FAIL FAST on
    resume instead of silently overwriting the later run's committed
    epochs — the manifest's per-epoch owner tokens catch the collision.
    Legitimate crash replays (same token) are untouched (covered by
    test_ingest_kill_resume_exactly_once)."""
    import pytest
    from pyspark.sql.streaming import StreamingQueryException

    from cdc_practice_spark.streaming.corpus import (
        load_ingest_dispositions,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="abandoned_", dir=TMP_ROOT)
    # run A consumes chunks c0,c1 (checkpoint "") and pauses
    store = _run_purge_ingest(spark, work)
    # run B (fresh checkpoint "2") extends the SAME store
    _run_purge_ingest(spark, work, batch_lo=200, batch_hi=216, run="2")
    after_b = sorted(
        tuple(r) for r in load_ingest_dispositions(spark, store).collect()
    )

    # new chunks arrive in run A's source dir; resuming A's checkpoint
    # would allocate store epochs B already committed
    import shutil as _sh

    docs = _purge_harness_docs(spark, batch_lo=300, batch_hi=316)
    batch = docs.filter("doc_id >= 300").coalesce(1)
    part = os.path.join(work, "_part_new")
    batch.write.mode("overwrite").parquet(part)
    nm = next(f for f in os.listdir(part) if f.endswith(".parquet"))
    os.rename(os.path.join(part, nm), os.path.join(work, "src", "c9.parquet"))
    _sh.rmtree(part)

    with pytest.raises(StreamingQueryException, match="another run"):
        _run_purge_ingest(spark, work)  # resumes checkpoint ""

    # the store is untouched — B's committed epochs survive
    assert (
        sorted(
            tuple(r)
            for r in load_ingest_dispositions(spark, store).collect()
        )
        == after_b
    )


def _shard_mtimes(out):
    import glob

    return {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, "source=*", "shard_id=*", "*.parquet"))
    }


def test_shard_export_incremental_append_only(spark):
    """r12 streaming shard delivery: the per-epoch loop ships only
    newly SEALED shards; committed shard files are byte-untouched by
    every later export (the append-only seal argument); replays are
    no-ops; the finalized per-epoch ledger is row-identical to a
    one-shot export of the finished store; the written files verify.
    Uses the purge-harness corpus (capacity 40, 2 chunks) so shards
    SEAL mid-feed — the real fixture's per-source bins stay open until
    end-of-feed at sf0.001."""
    from cdc_practice_spark.operators.shards import verify_token_shards
    from cdc_practice_spark.streaming.corpus import _read_manifest
    from cdc_practice_spark.streaming.shard_export import (
        export_ingest_shards,
        read_export_ledger,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="shard_sx_", dir=TMP_ROOT)
    store = _run_purge_ingest(spark, work)
    docs = _purge_harness_docs(spark).filter("doc_id >= 100")
    out = os.path.join(work, "shards")
    epochs = _read_manifest(store)
    assert len(epochs) >= 2
    seen = 0
    frozen: dict[str, float] = {}
    for e in epochs:
        res = export_ingest_shards(
            spark, store, docs, out, seqs_per_shard=1, at_epoch=e
        )
        # files committed by EARLIER epochs were not rewritten
        cur = _shard_mtimes(out)
        assert all(cur[p] == t for p, t in frozen.items())
        frozen = cur
        seen += res["written"]
        assert len(read_export_ledger(out)["shards"]) == seen
        # same-epoch replay (kill-resume of the delivery loop): no-op
        assert export_ingest_shards(
            spark, store, docs, out, seqs_per_shard=1, at_epoch=e
        ) == {"written": 0, "finalized": False}
    assert seen > 0, "no shard sealed mid-feed — fixture too small"
    res = export_ingest_shards(
        spark, store, docs, out, seqs_per_shard=1, finalize=True
    )
    assert res["finalized"] and res["written"] > 0  # the tail flush
    ver = verify_token_shards(spark, out).collect()
    assert ver and all(r.files_match for r in ver)
    # batch identity: one-shot export of the finished store, fresh dir
    out1 = os.path.join(work, "shards_oneshot")
    export_ingest_shards(
        spark, store, docs, out1, seqs_per_shard=1, finalize=True
    )
    assert (
        read_export_ledger(out)["shards"] == read_export_ledger(out1)["shards"]
    )
    # post-finalize: re-finalize and plain export are both no-ops
    assert export_ingest_shards(
        spark, store, docs, out, seqs_per_shard=1, finalize=True
    ) == {"written": 0, "finalized": True}


def test_shard_export_kill_resume_and_guards(spark):
    """Crash between the data write and the ledger commit: the replay
    rewrites the same partitions and commits — final state identical to
    the no-crash run.  Guards: a finalized export refuses a store that
    advanced; a purge that rewrites admission history trips the drift
    guard instead of serving a stale ledger."""
    import shutil

    import pytest

    from cdc_practice_spark.streaming.corpus import _read_manifest
    from cdc_practice_spark.streaming.shard_export import (
        export_ingest_shards,
        read_export_ledger,
    )

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="shard_sxk_", dir=TMP_ROOT)
    store = _run_purge_ingest(spark, work)
    docs = _purge_harness_docs(spark).filter("doc_id >= 100")
    epochs = _read_manifest(store)
    out = os.path.join(work, "shards")
    # crash at the last epoch (shards have sealed by then): data dirs
    # land, ledger does not
    with pytest.raises(RuntimeError, match="injected crash"):
        export_ingest_shards(
            spark, store, docs, out, seqs_per_shard=1, at_epoch=epochs[-1],
            _fail_before_commit=True,
        )
    assert read_export_ledger(out)["shards"] == []  # nothing committed
    assert _shard_mtimes(out)  # ...but orphan shard dirs exist
    # resume: same call, no injection — rewrites the orphans and commits
    export_ingest_shards(
        spark, store, docs, out, seqs_per_shard=1, at_epoch=epochs[-1]
    )
    assert read_export_ledger(out)["shards"]
    export_ingest_shards(spark, store, docs, out, seqs_per_shard=1,
                         finalize=True)
    out2 = os.path.join(work, "shards_clean")
    export_ingest_shards(spark, store, docs, out2, seqs_per_shard=1,
                         finalize=True)
    assert (
        read_export_ledger(out)["shards"] == read_export_ledger(out2)["shards"]
    )
    # finalize guard: finalized at a PREFIX of the store history, then
    # the store "advances" (full frontier) -> refuse
    out3 = os.path.join(work, "shards_prefix")
    export_ingest_shards(
        spark, store, docs, out3, seqs_per_shard=1, at_epoch=epochs[0],
        finalize=True,
    )
    with pytest.raises(RuntimeError, match="finalized"):
        export_ingest_shards(spark, store, docs, out3, seqs_per_shard=1)
    # drift guard: purge an exported doc from a COPY of the store
    from cdc_practice_spark.streaming.corpus import (
        load_ingest_dispositions,
        purge_ingest_docs,
    )

    store2 = os.path.join(work, "store_purged")
    shutil.copytree(store, store2)
    victim = (
        load_ingest_dispositions(spark, store2)
        .filter(F.col("disposition") == "kept")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(1)
    )
    purge_ingest_docs(spark, store2, victim)
    with pytest.raises(RuntimeError, match="purge"):
        export_ingest_shards(spark, store2, docs, out2, seqs_per_shard=1)
