"""Tracked persist — bounded cache lifetime for operator-internal caches.

Several operators persist an intermediate on purpose (self-join subtrees
don't common-subexpression-eliminate in Spark — measured 10× on the LSH
path), but a building block that returns a *lazy* DataFrame can't
unpersist before its caller materializes.  Left alone, repeated
invocations (bench.py's min-of-3 loop, a long-lived service session)
accumulate cached blocks until eviction pressure.

Contract: operators register every internal ``persist()`` here via
``tracked_persist``; whoever MATERIALIZES the result calls
``release_tracked()`` afterwards.  bench.py, tools/check_oracle.py and
the test session fixture do.  ``unpersist`` on an already-released
DataFrame is a no-op, so double-release is safe.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_TRACKED_FREES: list[Callable[[], None]] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist(df) and remember it for the next release_tracked()."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def _checkpoint_freer(ck: DataFrame) -> Callable[[], None]:
    """Zero-arg callable that unpersists a localCheckpoint's cached RDD
    blocks NOW instead of waiting for driver GC + ContextCleaner (an
    iterative loop otherwise accumulates one block set per round).  The
    handle is the LogicalRDD the checkpointed frame analyzes to; on
    Spark Connect (no JVM handles) the free degrades to the GC path."""

    def free() -> None:
        try:
            ck._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass

    return free


def truncated_checkpoint(
    df: DataFrame, free_list: list[Callable[[], None]] | None = None
) -> DataFrame:
    """localCheckpoint WITHOUT origin-stats propagation — for iterative
    algorithms that checkpoint every round.

    ``localCheckpoint`` truncates the logical plan but PRESERVES the
    child plan's estimated statistics (``LogicalRDD.originStats``).  In
    a loop whose round references the previous frame k times, the
    size-in-bytes estimate is raised to the k-th power per round —
    after ~10 rounds the BigInt estimate has millions of digits and
    Catalyst's stats visitor burns whole minutes multiplying them
    (observed: 0.4 s rounds degrading to 200+ s).  Re-wrapping the
    materialized RDD in a fresh DataFrame resets the leaf to
    ``defaultSizeInBytes``, keeping every round's planning cost
    constant.

    ``free_list``: when given, a zero-arg freer for THIS checkpoint's
    cached blocks is appended — call it once no frame derived from the
    returned DataFrame is needed (an iterative loop frees round i-1
    after round i materializes).  Without a list the freer lands in the
    module tracker drained by ``release_tracked``.

    Falls back to the plain checkpoint when the JVM handles aren't
    reachable (Spark Connect) — correctness is unaffected either way."""
    ck = df.localCheckpoint()
    (free_list if free_list is not None else _TRACKED_FREES).append(
        _checkpoint_freer(ck)
    )
    try:
        spark = df.sparkSession
        jdf = spark._jsparkSession.createDataFrame(ck._jdf.javaRDD(), ck._jdf.schema())
        return DataFrame(jdf, spark)
    except Exception:
        return ck


def track_free(fn: Callable[[], None]) -> None:
    """Register a deferred block-freer with the module tracker — for a
    checkpoint whose frame escapes to the caller (freed at the next
    release_tracked, after the caller materializes)."""
    _TRACKED_FREES.append(fn)


class tracked_scope:
    """Context manager releasing ONLY the persists/freers registered
    inside the ``with`` block — the per-micro-batch cache lifetime a
    ``foreachBatch`` sink needs.  The sink both materializes (writes) and
    outlives its delta computation, so the module-wide contract ("whoever
    materializes releases") would otherwise leak one cache set per
    trigger into ``_TRACKED`` until the stream ends.  Entries are drained
    LIFO down to the entry-time watermark, so persists registered by the
    surrounding session (bench loop, test fixture) are untouched.

    Single-writer assumption: scopes are per stream-execution thread; two
    concurrent streams interleaving registrations could release each
    other's caches early — a recompute, never a correctness issue
    (unpersist of an in-use frame only drops cached blocks)."""

    def __init__(self, blocking: bool = False) -> None:
        self._blocking = blocking

    def __enter__(self) -> "tracked_scope":
        self._n0 = len(_TRACKED)
        self._m0 = len(_TRACKED_FREES)
        return self

    def __exit__(self, *exc: object) -> None:
        while len(_TRACKED) > self._n0:
            df = _TRACKED.pop()
            try:
                df.unpersist(self._blocking)
            except Exception:
                pass  # session already stopped — nothing to release
        while len(_TRACKED_FREES) > self._m0:
            _TRACKED_FREES.pop()()


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked DataFrame; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    while _TRACKED_FREES:
        _TRACKED_FREES.pop()()
        n += 1
    return n
