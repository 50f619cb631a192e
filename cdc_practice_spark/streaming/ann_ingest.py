"""Streaming ANN ingest — the vector-store sibling of the corpus
ingest sink (r10 — VERDICT r9 ask #4): embeddings ARRIVE as a stream in
production (new documents are embedded as they are crawled), so the
RP-LSH signature store must accrete per micro-batch instead of being
rebuilt per batch job.

Store layout mirrors the corpus ingest store's LSM discipline, and the
lifecycle helpers ARE the corpus store's (streaming/corpus.py — run
token, writer lease, epoch-offset mapping, pre-epoch pins, manifest
with owners/hwm: all root-generic, shared rather than re-derived):

  - ``sig_delta_v{k}`` — the epoch's (vec_id, table, sig) signature
    rows, one Arrow GEMM over just the batch (the corpus is never
    re-signed — operators/similarity.py::rp_lsh_signatures);
  - replay dedup by the (id, table) anti-join against the pre-epoch
    store (the rp_lsh_ingest ``dedup_replays`` rule): a redelivered
    batch is skipped, a half-written prior delivery is repaired;
  - per-epoch overwrite-idempotent delta dirs + atomic manifest swap +
    pre-epoch pins ⇒ kill-resume exactly-once (pinned in
    tests/test_similarity.py);
  - ``compact_ann_ingest_store`` folds committed deltas into one base
    generation (staged at a fresh negative id, ONE manifest-swap commit
    point) — the same crash protocol as the corpus store's fold; for a
    query-serving deployment the folded base is what you'd re-bucket
    into the (table, sig)-partitioned store compact_ann_store maintains.

Because a vector's signature depends only on the frozen planes, the
accreted store is row-identical to a from-scratch rebuild over every
arrived vector — the invariant the ``streaming_ann_ingest`` oracle
checks at 3 SFs (served top-k identical to the rebuild's).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_practice_spark.operators.similarity import rp_lsh_signatures
from cdc_practice_spark.streaming.corpus import (
    _acquire_writer_lease,
    _epoch_offset,
    _load_union,
    _pre_epoch_epochs,
    _read_manifest_full,
    _record_lease_query,
    _run_token,
    _swap_manifest,
)
from cdc_practice_spark.streaming.pipeline import _scoped

_SIG_SCHEMA = "vec_id long, table int, sig long"


def _sig_epochs(root: str) -> list[int]:
    return _read_manifest_full(root)["epochs"]


def seed_ann_ingest(
    spark: SparkSession,
    corpus_vectors: DataFrame,
    planes,
    store_root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Write the standing corpus' signatures as the store's epoch -1
    delta — the state an ANN ingest service starts from.  No-op when
    the store already has a manifest (a resumed service must never
    re-seed over progressed state)."""
    os.makedirs(store_root, exist_ok=True)
    if _sig_epochs(store_root):
        return
    rp_lsh_signatures(corpus_vectors, planes, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(os.path.join(store_root, "sig_delta_v-1"))
    _swap_manifest(store_root, [-1])


def load_ann_ingest_sigs(spark: SparkSession, store_root: str) -> DataFrame:
    """The accreted (vec_id, table, sig) signature store — the index
    rp_lsh_topk_from_index serves queries from."""
    return _load_union(
        spark, store_root, "sig_delta", _sig_epochs(store_root), _SIG_SCHEMA
    )


def stream_ann_ingest(
    spark: SparkSession,
    vec_stream: DataFrame,
    planes,
    store_root: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> StreamingQuery:
    """foreachBatch sink accreting arriving embeddings into the
    signature store at O(batch) per epoch (see module docstring)."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        token = _run_token(checkpoint_dir)
        store_epoch = epoch_id + _epoch_offset(store_root, token, epoch_id)
        owner = _read_manifest_full(store_root)["owners"].get(str(store_epoch))
        if owner is not None and owner != token:
            raise RuntimeError(
                f"stream_ann_ingest: store epoch {store_epoch} was committed "
                f"by another run ({owner}) — this checkpoint is stale; start "
                f"a fresh one"
            )
        pre_epochs = _pre_epoch_epochs(store_root, token, store_epoch)
        idx = _load_union(
            spark, store_root, "sig_delta", pre_epochs, _SIG_SCHEMA
        )
        from cdc_practice_spark.plans.cache import tracked_persist

        # persisted: the batch GEMM feeds both the conflict guard and
        # the delta write (released per epoch by the _scoped wrapper)
        new_sigs = tracked_persist(
            rp_lsh_signatures(batch_df, planes, id_col, vec_col)
        )
        # replay dedup on the (id, table) PAIR vs the PRE-epoch store
        # (rp_lsh_ingest's dedup_replays rule): a batch redelivered by an
        # at-least-once bus — or re-arriving through a wiped checkpoint —
        # must not duplicate its rows; a crashed half-delivery is
        # repaired (only the missing table rows pass the anti-join).
        present = (
            idx.join(
                F.broadcast(batch_df.select(id_col).distinct()),
                id_col,
                "left_semi",
            )
            .select(id_col, "table", "sig")
            .distinct()
        )
        # contract guard (review r10): the replay dedup assumes ids are
        # APPEND-ONLY — a re-arriving id is a byte-identical redelivery.
        # A re-EMBEDDED vector (same id, new embedding) would be
        # silently dropped here and the store would keep the old
        # vector's signatures, breaking store==rebuild with no error —
        # so a present (id, table) whose stored sig disagrees with the
        # re-arrival's raises instead.  One batch-bounded broadcast
        # join; updates belong to the erase-then-ingest path
        # (rp_lsh_erase + a fresh batch).
        conflicts = new_sigs.alias("n").join(
            F.broadcast(present).alias("p"),
            (F.col(f"n.{id_col}") == F.col(f"p.{id_col}"))
            & (F.col("n.table") == F.col("p.table"))
            & (F.col("n.sig") != F.col("p.sig")),
        )
        n_conflict = conflicts.count()
        if n_conflict:
            raise ValueError(
                f"stream_ann_ingest: {n_conflict} signature rows of "
                f"re-arriving ids disagree with the store — a vector was "
                f"re-embedded under an existing id; erase it first "
                f"(rp_lsh_erase), then ingest the new embedding"
            )
        new_sigs = new_sigs.join(
            F.broadcast(present.select(id_col, "table")),
            [id_col, "table"],
            "left_anti",
        )
        new_sigs.write.mode("overwrite").parquet(
            os.path.join(store_root, f"sig_delta_v{store_epoch}")
        )
        if store_epoch not in pre_epochs:
            cur = _read_manifest_full(store_root)
            _swap_manifest(
                store_root,
                pre_epochs + [store_epoch],
                owners={**cur["owners"], str(store_epoch): token},
            )

    token = _run_token(checkpoint_dir)
    _acquire_writer_lease(spark, store_root, token)
    q = (
        vec_stream.writeStream.foreachBatch(_scoped(apply_batch))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _record_lease_query(store_root, token, str(q.id))
    return q


_ASSIGN_SCHEMA = "vec_id long, cell int, dist2 double"


def seed_ivf_ingest(
    spark: SparkSession,
    corpus_vectors: DataFrame,
    centroids,
    store_root: str,
    codebook=None,
) -> None:
    """Seed the IVF ingest store with the standing corpus' assignments
    under the TRAINED (frozen) centroids, epoch -1, plus the build-time
    stats sidecar.  No-op when already seeded.

    Both stats sidecars (current + the build-time baseline) are written
    BEFORE the manifest swap — the manifest stays the ONE commit point
    (r10 ADVICE medium): a crash anywhere pre-swap leaves no manifest,
    so re-seed runs from scratch; post-swap the store is complete."""
    from cdc_practice_spark.operators.similarity import (
        ivf_assign,
        ivf_cell_stats,
        swap_stats_sidecar,
    )

    os.makedirs(store_root, exist_ok=True)
    if _sig_epochs(store_root):
        return
    assign_dir = os.path.join(store_root, "assign_v-1")
    ivf_assign(corpus_vectors, centroids).write.mode("overwrite").parquet(
        assign_dir
    )
    if codebook is not None:
        _write_codes_delta(
            spark,
            store_root,
            corpus_vectors,
            spark.read.schema(_ASSIGN_SCHEMA).parquet(assign_dir),
            codebook,
            -1,
        )
    # stats straight off the staged dir (the manifest — and hence
    # load_ivf_ingest_assignments — doesn't reference it yet)
    stats = ivf_cell_stats(
        spark.read.schema(_ASSIGN_SCHEMA).parquet(assign_dir)
    )
    swap_stats_sidecar(store_root, stats, "_cell_stats")
    # the BUILD-time stats snapshot — the drift report's baseline,
    # never touched by later epochs
    swap_stats_sidecar(store_root, stats, "_cell_stats_build")
    # the frozen trained parameters, keyed to generation -1 and
    # selected by the manifest swap below, so the store is
    # self-describing and the pairing is atomic
    write_centroids(store_root, centroids, generation=-1)
    _swap_manifest(store_root, [-1])


def _refresh_ivf_stats(spark: SparkSession, store_root: str) -> None:
    from cdc_practice_spark.operators.similarity import (
        ivf_cell_stats,
        swap_stats_sidecar,
    )

    swap_stats_sidecar(
        store_root,
        ivf_cell_stats(load_ivf_ingest_assignments(spark, store_root)),
        "_cell_stats",
    )


def load_ivf_ingest_assignments(
    spark: SparkSession, store_root: str
) -> DataFrame:
    return _load_union(
        spark, store_root, "assign", _sig_epochs(store_root), _ASSIGN_SCHEMA
    )


_CODES_SCHEMA = "vec_id long, cell int, codes array<int>, norm double"


def _store_has_codes(store_root: str, epochs: list[int]) -> bool:
    """Whether the store carries the PQ codes tier: the BASE generation
    (min committed epoch — written by seed or rebuild) has a codes
    delta iff the store was built with a codebook."""
    if not epochs:
        return False
    return os.path.isdir(os.path.join(store_root, f"codes_v{min(epochs)}"))


def _check_codes_contract(
    store_root: str, epochs: list[int], codebook, op: str
) -> None:
    """The codes tier is a STORE-LEVEL invariant, not a per-call option
    (review r11): an epoch appended without codes to a codes-bearing
    store would be permanently invisible to the ADC shortlist (served
    IVF-PQ silently omits its vectors), and codes appended to a
    codes-less store would serve a corpus-less partial tier.  Both
    contract violations raise loudly, mirroring the re-embedded-id
    guard."""
    has = _store_has_codes(store_root, epochs)
    if has and codebook is None:
        raise ValueError(
            f"{op}: store {store_root!r} carries a PQ codes tier — pass "
            f"the codebook, or every id this epoch adds will be "
            f"invisible to served IVF-PQ queries"
        )
    if codebook is not None and epochs and not has:
        raise ValueError(
            f"{op}: store {store_root!r} has no codes tier (seeded "
            f"without a codebook) — re-seed with the codebook; appending "
            f"codes now would serve a partial tier missing the corpus"
        )


def _write_codes_delta(
    spark: SparkSession,
    store_root: str,
    vectors: DataFrame,
    assigned: DataFrame,
    codebook,
    epoch: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One epoch's PQ codes, cell-attached from the epoch's assignment
    rows (so codes and assignments cover the identical id set) — one
    codegen encode projection over just the batch, committed by the
    same manifest swap as the assignment delta."""
    from cdc_practice_spark.operators.quantization import pq_encode

    codes = pq_encode(
        vectors.select(F.col(id_col), F.col(vec_col)), codebook, id_col, vec_col
    ).join(assigned.select(id_col, "cell"), id_col)
    codes.select(id_col, "cell", "codes", "norm").write.mode(
        "overwrite"
    ).parquet(os.path.join(store_root, f"codes_v{epoch}"))


def load_ivf_ingest_codes(spark: SparkSession, store_root: str) -> DataFrame:
    """The accreted PQ codes table (written when the ingest sink was
    given a codebook) — the compressed ranking tier IVF-PQ serves from."""
    return _load_union(
        spark, store_root, "codes", _sig_epochs(store_root), _CODES_SCHEMA
    )


def ivf_pq_topk_from_store(
    spark: SparkSession,
    store_root: str,
    embeddings: DataFrame,
    codebook,
    query_vec: list,
    k: int = 10,
    nprobe: int = 3,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve IVF-PQ straight off the STREAMING-MAINTAINED store (r11):
    probe order comes from the store's FROZEN persisted centroids
    (driver-side cosine over k rows — no data scan, unlike the
    centroid-aggregate probe), candidate ranking from the accreted
    codes deltas, cell membership from the accreted assignments, and
    only the shortlist touches ``embeddings`` (the full vectors, which
    the store deliberately does not hold — they live in the corpus
    table / cold storage).  At 100 TB: the probe is cell pruning on
    the (cell-partitionable) codes store, the served query never scans
    vectors outside the shortlist, and everything the query needs
    beyond the corpus itself was maintained incrementally at ingest."""
    from cdc_practice_spark.operators.quantization import (
        _exact_rerank,
        adc_shortlist,
    )

    best_cells = probe_cells(load_centroids(store_root), query_vec, nprobe)
    probed_codes = load_ivf_ingest_codes(spark, store_root).filter(
        F.col("cell").isin(best_cells)
    )
    short = adc_shortlist(probed_codes, codebook, query_vec, shortlist, id_col)
    assign = load_ivf_ingest_assignments(spark, store_root).filter(
        F.col("cell").isin(best_cells)
    )
    probed_vecs = embeddings.join(assign.select(id_col), id_col, "left_semi")
    return _exact_rerank(probed_vecs, short, query_vec, k, id_col, vec_col)


def ivf_ingest_drift(spark: SparkSession, store_root: str) -> DataFrame:
    """The drift report straight off the store's PERSISTED sidecars:
    build-time baseline vs current — no assignment rescan, no vectors
    touched (what a monitoring scrape runs between epochs)."""
    from cdc_practice_spark.operators.similarity import (
        ivf_drift_report,
        read_stats_sidecar,
    )

    build = read_stats_sidecar(spark, store_root, "_cell_stats_build")
    now = read_stats_sidecar(spark, store_root, "_cell_stats")
    return ivf_drift_report(build, now)


def stream_ivf_ingest(
    spark: SparkSession,
    vec_stream: DataFrame,
    centroids,
    store_root: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook=None,
) -> StreamingQuery:
    """IVF twin of ``stream_ann_ingest`` (r10 — composes VERDICT r9 asks
    #4 and #5): arriving embeddings are assigned under the FROZEN
    trained centroids per micro-batch (one codegen'd projection — the
    corpus is never re-assigned) and accrete as per-epoch ``assign``
    deltas under the shared store-lifecycle kit; the per-cell stats
    sidecar is refreshed AT INGEST (recomputed from the committed dirs —
    idempotent under replay), so the drift alarm that triggers the
    re-cluster job reads persisted metadata the moment an epoch lands.
    Same append-only contract as the signature sink: a re-arriving id
    whose assignment disagrees with the store (a re-embedded vector)
    raises — updates go through erase-then-ingest."""
    from cdc_practice_spark.operators.similarity import ivf_assign
    from cdc_practice_spark.plans.cache import tracked_persist

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        token = _run_token(checkpoint_dir)
        store_epoch = epoch_id + _epoch_offset(store_root, token, epoch_id)
        owner = _read_manifest_full(store_root)["owners"].get(str(store_epoch))
        if owner is not None and owner != token:
            raise RuntimeError(
                f"stream_ivf_ingest: store epoch {store_epoch} was committed "
                f"by another run ({owner}) — this checkpoint is stale"
            )
        pre_epochs = _pre_epoch_epochs(store_root, token, store_epoch)
        _check_codes_contract(
            store_root, pre_epochs, codebook, "stream_ivf_ingest"
        )
        idx = _load_union(
            spark, store_root, "assign", pre_epochs, _ASSIGN_SCHEMA
        )
        new_rows = tracked_persist(
            ivf_assign(
                batch_df.select(F.col(id_col), F.col(vec_col)),
                centroids,
                id_col,
                vec_col,
            )
        )
        present = idx.join(
            F.broadcast(new_rows.select(id_col).distinct()), id_col, "left_semi"
        ).select(id_col, "cell", "dist2")
        n_conflict = new_rows.alias("n").join(
            F.broadcast(present).alias("p"),
            (F.col(f"n.{id_col}") == F.col(f"p.{id_col}"))
            & (
                (F.col("n.cell") != F.col("p.cell"))
                | (F.col("n.dist2") != F.col("p.dist2"))
            ),
        ).count()
        if n_conflict:
            raise ValueError(
                f"stream_ivf_ingest: {n_conflict} re-arriving ids disagree "
                f"with the stored assignment — a vector was re-embedded; "
                f"erase it first, then ingest the new embedding"
            )
        new_rows = new_rows.join(
            F.broadcast(present.select(id_col)), id_col, "left_anti"
        )
        new_rows.write.mode("overwrite").parquet(
            os.path.join(store_root, f"assign_v{store_epoch}")
        )
        if not pre_epochs:
            # unseeded root (r11 ADVICE low): this first commit IS the
            # store's base generation, so the frozen centroids persist
            # here — otherwise a store created solely by the stream
            # passes every contract check but load_centroids (and hence
            # ivf_pq_topk_from_store) fails on a missing parameters file
            write_centroids(store_root, centroids, generation=store_epoch)
        if codebook is not None:
            # the IVF-PQ serving tier maintained AT INGEST: the epoch's
            # codes delta covers exactly the assignment delta's ids and
            # commits under the same manifest swap below
            _write_codes_delta(
                spark,
                store_root,
                batch_df.join(
                    F.broadcast(new_rows.select(id_col)), id_col, "left_semi"
                ),
                new_rows,
                codebook,
                store_epoch,
                id_col,
                vec_col,
            )
        if store_epoch not in pre_epochs:
            cur = _read_manifest_full(store_root)
            _swap_manifest(
                store_root,
                pre_epochs + [store_epoch],
                owners={**cur["owners"], str(store_epoch): token},
            )
        # stats sidecar LAST, after the manifest commit: recomputed from
        # committed dirs, so a crash between commit and refresh leaves a
        # stale-but-consistent sidecar the next epoch (or a manual
        # refresh) repairs — never a torn one
        _refresh_ivf_stats(spark, store_root)

    token = _run_token(checkpoint_dir)
    _acquire_writer_lease(spark, store_root, token)
    q = (
        vec_stream.writeStream.foreachBatch(_scoped(apply_batch))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _record_lease_query(store_root, token, str(q.id))
    return q


def append_ivf_ingest_batch(
    spark: SparkSession,
    store_root: str,
    batch_df: DataFrame,
    centroids,
    epoch: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook=None,
) -> None:
    """One batch-mode epoch append — stream_ivf_ingest's apply_batch
    without the checkpoint/lease machinery (maintenance jobs and tests
    that already hold the store exclusively): assign under the frozen
    centroids, commit the delta through the manifest, refresh the stats
    sidecar; with ``codebook``, the epoch's PQ codes delta too.  Same
    overwrite-idempotent layout AND the same append-only contract as
    the streaming twin (r11 ADVICE medium): ids already in the store
    are dropped (a redelivered batch is a no-op, a half-delivery is
    repaired), and a re-arriving id whose assignment DISAGREES with the
    store raises — without the guard a duplicate batch would write the
    same ids into a second delta, double-counting ivf_cell_stats
    (skewing the drift alarm) and letting served top-k emit duplicate
    ids.  Only with both guards do batch and streaming epochs
    interleave freely."""
    from cdc_practice_spark.operators.similarity import ivf_assign
    from cdc_practice_spark.plans.cache import tracked_persist

    epochs = _sig_epochs(store_root)
    _check_codes_contract(
        store_root, epochs, codebook, "append_ivf_ingest_batch"
    )
    pre_epochs = [e for e in epochs if e != epoch]
    idx = _load_union(spark, store_root, "assign", pre_epochs, _ASSIGN_SCHEMA)
    new_rows = tracked_persist(
        ivf_assign(
            batch_df.select(F.col(id_col), F.col(vec_col)),
            centroids,
            id_col,
            vec_col,
        )
    )
    present = idx.join(
        F.broadcast(new_rows.select(id_col).distinct()), id_col, "left_semi"
    ).select(id_col, "cell", "dist2")
    n_conflict = new_rows.alias("n").join(
        F.broadcast(present).alias("p"),
        (F.col(f"n.{id_col}") == F.col(f"p.{id_col}"))
        & (
            (F.col("n.cell") != F.col("p.cell"))
            | (F.col("n.dist2") != F.col("p.dist2"))
        ),
    ).count()
    if n_conflict:
        raise ValueError(
            f"append_ivf_ingest_batch: {n_conflict} re-arriving ids disagree "
            f"with the stored assignment — a vector was re-embedded; erase "
            f"it first, then ingest the new embedding"
        )
    new_rows = new_rows.join(
        F.broadcast(present.select(id_col)), id_col, "left_anti"
    )
    assign_dir = os.path.join(store_root, f"assign_v{epoch}")
    new_rows.write.mode("overwrite").parquet(assign_dir)
    if codebook is not None:
        _write_codes_delta(
            spark,
            store_root,
            batch_df.join(
                F.broadcast(new_rows.select(id_col)), id_col, "left_semi"
            ),
            spark.read.schema(_ASSIGN_SCHEMA).parquet(assign_dir),
            codebook,
            epoch,
            id_col,
            vec_col,
        )
    if epoch not in epochs:
        _swap_manifest(store_root, epochs + [epoch])
    _refresh_ivf_stats(spark, store_root)


def _centroids_path(store_root: str, generation: int) -> str:
    return os.path.join(store_root, f"_centroids.v{generation}.json")


def write_centroids(store_root: str, centroids, generation: int) -> None:
    """Persist the frozen k×dim centroid matrix KEYED TO its base
    generation (driver-sized by definition).  The live matrix is
    selected by the MANIFEST (min committed epoch = the base
    generation), so a store swap commits assignments and centroids in
    the same atomic os.replace — a crash can never leave a committed
    store paired with the wrong parameters (review r11)."""
    import json as _json

    path = _centroids_path(store_root, generation)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        _json.dump([[float(x) for x in c] for c in centroids], fh)
    os.replace(tmp, path)


def load_centroids(store_root: str):
    """The live frozen centroids: resolved through the manifest's base
    generation, never a bare filename — see write_centroids.  Stores
    written before the generation-keyed layout fall back to the legacy
    bare ``_centroids.json`` (the sidecar kit's migration convention)."""
    import json as _json

    epochs = _sig_epochs(store_root)
    if not epochs:
        raise ValueError(
            f"load_centroids: store {store_root!r} has no committed epochs "
            f"— seed it (seed_ivf_ingest) or ingest at least one batch "
            f"before serving"
        )
    gen = min(epochs)
    path = _centroids_path(store_root, gen)
    if not os.path.exists(path):
        legacy = os.path.join(store_root, "_centroids.json")
        if os.path.exists(legacy):
            path = legacy
        else:
            raise FileNotFoundError(
                f"load_centroids: store {store_root!r} has committed epochs "
                f"but no persisted centroids at generation {gen} — the "
                f"store predates the centroid persistence contract; re-seed "
                f"or write_centroids() the trained parameters"
            )
    with open(path) as fh:
        return _json.load(fh)


def probe_cells(centroids, query_vec, nprobe: int) -> list[int]:
    """THE deterministic frozen-parameter probe order: round-6 cosine
    of the query against each stored centroid, ranked desc with a
    cell-id tiebreak — driver-side over k rows, shared by the serving
    path and any consistency check (a drifted copy of this ranking
    would silently compare different probe orders — review r11)."""
    import math

    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    sims = []
    for cell, c in enumerate(centroids):
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        dot = sum(float(a) * float(b) for a, b in zip(query_vec, c))
        sims.append((round(dot / (cn * qn), 6), cell))
    return [
        cell for _s, cell in sorted(sims, key=lambda t: (-t[0], t[1]))[:nprobe]
    ]


def ivf_drift_maintenance(
    spark: SparkSession,
    store_root: str,
    vectors: DataFrame,
    run_root: str,
    k: int = 8,
    n_iter: int = 2,
    retries: int = 0,
    retry_delay_s: float = 0.0,
    codebook=None,
) -> dict:
    """The alarm→action loop-closer (r11 — VERDICT r10 ask #3,
    mirroring r10's report→purge): read the PERSISTED drift report off
    the store's sidecars, and IFF an alarm boolean is set, run the
    re-cluster as an orchestrated maintenance job —

      1. exclusive job lock + ledger row via the orchestration kernel
         (orchestration.py: max_active_runs=1, bounded retry, JSONL
         run ledger — the Airflow-contract twin);
      2. the store's writer lease (no concurrent ingest during swap);
      3. ``ivf_rebuild`` over ``vectors`` (the current corpus: standing
         + everything ingested) — re-fit + full re-assign, the rare
         batch job the frozen-centroid discipline defers to;
      4. store swap: rebuilt assignments staged at a fresh negative
         generation no manifest references, then the atomic manifest
         swap (THE commit point), then both stats sidecars (current +
         build baseline — the rebuild's own stats become the new
         baseline, so the alarm clears) and the new frozen centroids.

    Crash protocol (tightened after review r11): the new centroids are
    keyed to the staged generation and SELECTED BY the manifest swap
    itself, so a committed store can never pair with the wrong
    parameters.  The stats sidecars land after the commit, current
    first, the alarm-clearing baseline LAST — every crash window
    either leaves the old store intact (pre-swap: the alarm still
    fires, the idempotent rebuild re-runs at the same generation id),
    or a fully consistent new store whose stats are merely stale:
    stale CURRENT stats reproduce exactly the pre-rebuild comparison
    that fired the alarm (deterministic re-fire → repair), and a stale
    BASELINE alone is conservative (drift measured against the older
    build fires earlier, never later).

    No alarm → NO-OP: the decision is still ledgered (a monitoring
    audit trail needs the "checked, clean" rows too) and the store is
    untouched.  Returns {"alarm", "rebuilt", "run_id"}."""
    import uuid as _uuid

    from cdc_practice_spark.operators.similarity import (
        ivf_cell_stats,
        ivf_rebuild,
        swap_stats_sidecar,
    )
    from cdc_practice_spark.orchestration import JobSpec, run
    from cdc_practice_spark.streaming.corpus import _lease_path

    rep = ivf_ingest_drift(spark, store_root).head()
    alarm = bool(rep.share_drift or rep.dist_drift)
    job = JobSpec(
        name="ivf_drift_rebuild",
        run_root=run_root,
        retries=retries,
        retry_delay_s=retry_delay_s,
        tags=("maintenance", "ivf", os.path.basename(store_root)),
    )
    if not alarm:
        rec = run(job, lambda: "no-drift no-op")
        return {"alarm": False, "rebuilt": False, "run_id": rec["run_id"]}

    def _rebuild_and_swap() -> str:
        token = f"maint-{_uuid.uuid4().hex[:12]}"
        _acquire_writer_lease(spark, store_root, token)
        try:
            man = _read_manifest_full(store_root)
            _check_codes_contract(
                store_root, man["epochs"], codebook, "ivf_drift_maintenance"
            )
            cents, assigns = ivf_rebuild(vectors, k=k, n_iter=n_iter)
            b = min([-1] + man["epochs"]) - 1
            out = os.path.join(store_root, f"assign_v{b}")
            assigns.write.mode("overwrite").parquet(out)
            # centroids staged at the new generation BEFORE the swap —
            # invisible until the manifest selects generation b
            write_centroids(store_root, cents, generation=b)
            if codebook is not None:
                # codes-bearing store: re-attach the rebuilt cells (the
                # PQ codes themselves depend only on vector+codebook,
                # but the delta must cover generation b's id set under
                # its cells); staged pre-swap like the assignments
                _write_codes_delta(
                    spark,
                    store_root,
                    vectors,
                    spark.read.schema(_ASSIGN_SCHEMA).parquet(out),
                    codebook,
                    b,
                )
            hwm = max(
                man["hwm"],
                max([e for e in man["epochs"] if e >= 0], default=-1),
            )
            _swap_manifest(store_root, [b], hwm=hwm, owners={})  # commit
            stats = ivf_cell_stats(
                spark.read.schema(_ASSIGN_SCHEMA).parquet(out)
            )
            swap_stats_sidecar(store_root, stats, "_cell_stats")
            # baseline LAST: this is the alarm-clearing step, so every
            # earlier crash leaves the alarm deterministically re-firing
            swap_stats_sidecar(store_root, stats, "_cell_stats_build")
            for e in man["epochs"]:
                if e != b:
                    old = os.path.join(store_root, f"assign_v{e}")
                    if os.path.isdir(old):
                        shutil.rmtree(old)
                    old_c = _centroids_path(store_root, e)
                    if os.path.exists(old_c):
                        os.unlink(old_c)
                    if codebook is not None:
                        # only a codes-writing rebuild supersedes codes
                        # dirs (the contract guard above already rejects
                        # a codebook-less rebuild of a codes store)
                        old_codes = os.path.join(store_root, f"codes_v{e}")
                        if os.path.isdir(old_codes):
                            shutil.rmtree(old_codes)
            return f"rebuilt at generation {b}"
        finally:
            # batch job, not a streaming query — release explicitly so
            # a later ingest stream can re-acquire without a steal
            try:
                os.unlink(_lease_path(store_root))
            except FileNotFoundError:
                pass

    rec = run(job, _rebuild_and_swap)
    return {"alarm": True, "rebuilt": True, "run_id": rec["run_id"]}


def compact_ann_ingest_store(spark: SparkSession, store_root: str) -> int:
    """Fold every committed signature delta into one base generation —
    bounds the store's read amplification (one delta dir per micro-batch
    forever otherwise).  Staged at a fresh negative generation id no
    manifest references; the atomic manifest swap is the one commit
    point; old dirs deleted after it (crash anywhere leaves readers on a
    complete view — the corpus fold's protocol).  Quiescent store only.
    Returns the folded row count."""
    man = _read_manifest_full(store_root)
    epochs = man["epochs"]
    b = min([-1] + epochs) - 1
    out = os.path.join(store_root, f"sig_delta_v{b}")
    _load_union(spark, store_root, "sig_delta", epochs, _SIG_SCHEMA).write.mode(
        "overwrite"
    ).parquet(out)
    n = int(spark.read.schema(_SIG_SCHEMA).parquet(out).count())
    hwm = max(man["hwm"], max([e for e in epochs if e >= 0], default=-1))
    _swap_manifest(store_root, [b], hwm=hwm, owners={})
    for e in epochs:
        if e != b:
            folded = os.path.join(store_root, f"sig_delta_v{e}")
            if os.path.isdir(folded):
                shutil.rmtree(folded)
    return n


def ivf_pq_topk_batch_from_store(
    spark: SparkSession,
    store_root: str,
    embeddings: DataFrame,
    codebook,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Batched serving off the STREAMING-MAINTAINED store (r12 — the
    set-oriented twin of ivf_pq_topk_from_store): probe order from the
    persisted frozen centroids (as literals in the query plan — the
    probe_cells ranking as an expression), candidate ranking from the
    accreted codes deltas scanned ONCE for all queries, exact rerank
    only over shortlist ids.  N queries cost one codes scan + one
    shortlist-sized vector join instead of N driver round-trips."""
    from cdc_practice_spark.operators.quantization import ivf_pq_topk_batch

    cents = load_centroids(store_root)
    return ivf_pq_topk_batch(
        embeddings,
        codebook,
        queries,
        list(enumerate(cents)),
        k=k,
        nprobe=nprobe,
        shortlist=shortlist,
        id_col=id_col,
        vec_col=vec_col,
        cell_col="cell",
        codes=load_ivf_ingest_codes(spark, store_root),
        qid_col=qid_col,
        qvec_col=qvec_col,
    )


def ivf_pq_topk_batch_from_store(
    spark: SparkSession,
    store_root: str,
    embeddings: DataFrame,
    codebook,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Batched multi-query IVF-PQ serving off the MAINTAINED store
    (r12) — the batch twin of ``ivf_pq_topk_from_store``: queries come
    as a DataFrame, the FROZEN persisted centroids enter the plan as
    literals (the same round-6/cell-tiebreak ranking rule
    ``probe_cells`` applies driver-side, so batch probe order ==
    single-query probe order), and ADC ranks all queries off ONE scan
    of the accreted codes deltas; only per-query shortlists touch the
    full vectors, which the store deliberately does not hold.  This is
    what store-backed kNN-graph builds, hard-negative mining, and
    retrieval eval run — N queries, one codes scan, no driver loop."""
    from cdc_practice_spark.operators.quantization import ivf_pq_topk_batch

    epochs = _sig_epochs(store_root)
    if not _store_has_codes(store_root, epochs):
        raise ValueError(
            f"ivf_pq_topk_batch_from_store: store {store_root!r} has no "
            f"codes tier (seeded without a codebook) — batch ADC serving "
            f"needs the compressed codes; re-seed with the codebook"
        )
    cents = [
        (i, [float(x) for x in v])
        for i, v in enumerate(load_centroids(store_root))
    ]
    return ivf_pq_topk_batch(
        embeddings,
        codebook,
        queries,
        cents,
        k=k,
        nprobe=nprobe,
        shortlist=shortlist,
        id_col=id_col,
        vec_col=vec_col,
        cell_col="cell",
        codes=load_ivf_ingest_codes(spark, store_root),
        qid_col=qid_col,
        qvec_col=qvec_col,
    )


def knn_graph_from_store(
    spark: SparkSession,
    store_root: str,
    embeddings: DataFrame,
    codebook,
    k: int = 5,
    nprobe: int = 3,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus-wide kNN graph SERVED OFF THE MAINTAINED STORE (r12):
    every id the store has assigned plays a query (vectors joined from
    the corpus table — the store holds index artifacts, not data),
    fetched at k+1 through the batch serving path and trimmed by the
    shared edge rule, so the whole graph costs one scan of the accreted
    codes plus the shortlist reranks.  The store keeps the graph
    CURRENT for free: each ingest epoch's vectors appear as both nodes
    and candidates on the next build, with no index reconstruction."""
    from cdc_practice_spark.functions.vectors import to_double
    from cdc_practice_spark.operators.quantization import (
        graph_edges_from_hits,
    )

    ids = load_ivf_ingest_assignments(spark, store_root).select(id_col)
    queries = embeddings.join(ids, id_col, "left_semi").select(
        F.col(id_col).alias("_gq"),
        to_double(F.col(vec_col)).alias("_gv"),
    )
    hits = ivf_pq_topk_batch_from_store(
        spark,
        store_root,
        embeddings,
        codebook,
        queries,
        k=k + 1,  # self drops without losing degree
        nprobe=nprobe,
        shortlist=shortlist,
        id_col=id_col,
        vec_col=vec_col,
        qid_col="_gq",
        qvec_col="_gv",
    )
    return graph_edges_from_hits(hits, k, qid_col="_gq", id_col=id_col)
