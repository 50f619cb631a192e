"""Incremental materialized-view maintenance over the change feed.

The reference recomputes its read-side aggregates from scratch on every
query (simple_kafka_etl.py keeps only the raw current/history tables); a
warehouse ingesting 100 TB of history cannot.  The standard fix — what
DBSP/Materialize-style IVM and every lakehouse MERGE-into-summary job do
— is delta maintenance: given a materialized aggregate of the CURRENT
state as of offset T and a batch of change events after T, produce the
updated aggregate by applying per-group retractions and insertions,
touching only

  O(|delta|)            window over the batch (latest event per touched key)
  O(|touched keys|)     point reads of the stored snapshot (semi join —
                        bucket/Bloom-prunable, never a full scan)
  O(|touched groups|)   the final combine against the stored MV

— never the full history and never the untouched keys.

Delta algebra for a current-state aggregate ``GROUP BY g: count, sum(v)``:
a key's contribution moves from its OLD current row (retract: −1, −v_old)
to its NEW current row (insert: +1, +v_new); keys whose last delta event
is a delete insert nothing; keys first seen in the delta retract nothing.
Applying the signed per-group sums to the stored MV gives exactly the
from-scratch aggregate — asserted for arbitrary split points in
tests/test_cdc_incremental.py.

Money stays exact: contributions are int64 cents (functions/money.py), so
retract/insert sums are penny-exact and order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_practice_spark.functions import money as M


def current_mv(
    current: DataFrame, group_col: str, value_col: str = "value"
) -> DataFrame:
    """Materialize the aggregate this module maintains: per-group row
    count and exact-cents value sum over a current snapshot."""
    return current.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(M.fixed(value_col)).alias("sum_cents"),
    )


def delta_apply_mv(
    base_current: DataFrame,
    base_mv: DataFrame,
    delta_feed: DataFrame,
    group_col: str,
    value_col: str = "value",
    key: str = "original_id",
    order: str = "kafka_offset",
) -> DataFrame:
    """Maintain ``base_mv`` (= current_mv of the state at T) through a
    batch of post-T change events.  Returns the same schema as
    ``current_mv`` and the same ROWS as recomputing from scratch.

    Plan shape: one window over the delta batch (latest event per key),
    one key-equality semi join against the stored snapshot restricted to
    touched keys, one signed aggregation, one outer combine with the MV
    (group-key cardinality — tiny).  Nothing scans the base feed.
    """
    # latest post-T event per touched key decides the key's NEW state
    w = Window.partitionBy(key)
    latest = (
        delta_feed.withColumn("_mx", F.max(order).over(w))
        .filter(F.col(order) == F.col("_mx"))
        .select(
            F.col(key),
            F.col(group_col),
            F.col(value_col),
            (F.col("__deleted") == "false").alias("_live"),
        )
    )
    touched = latest.select(key).distinct()
    # retract the touched keys' OLD contributions (keys absent from the
    # snapshot — first seen in the delta — retract nothing: inner join)
    old = base_current.join(touched, on=key, how="left_semi").select(
        F.col(group_col).alias("g"),
        F.lit(-1).cast("long").alias("dn"),
        (-M.fixed(value_col)).alias("dc"),
    )
    # insert the NEW contributions of keys whose final delta event is live
    new = latest.filter(F.col("_live")).select(
        F.col(group_col).alias("g"),
        F.lit(1).cast("long").alias("dn"),
        M.fixed(value_col).alias("dc"),
    )
    changes = (
        old.unionByName(new)
        .groupBy("g")
        .agg(F.sum("dn").alias("dn"), F.sum("dc").alias("dc"))
    )
    combined = (
        base_mv.join(changes, base_mv[group_col] == changes["g"], "full_outer")
        .select(
            F.coalesce(base_mv[group_col], changes["g"]).alias(group_col),
            (
                F.coalesce(base_mv["n_rows"], F.lit(0))
                + F.coalesce(changes["dn"], F.lit(0))
            ).alias("n_rows"),
            (
                F.coalesce(base_mv["sum_cents"], F.lit(0))
                + F.coalesce(changes["dc"], F.lit(0))
            ).alias("sum_cents"),
        )
        .filter(F.col("n_rows") > 0)
    )
    return combined


# ---------------------------------------------------------------------------
# Incremental JOIN view maintenance — the bilinear delta rule.
#
# The aggregate MV above is linear (deltas add).  A JOIN view
# V = A ⋈ B is BILINEAR: given signed deltas ΔA, ΔB (retract old row,
# insert new row, weight ±1),
#
#     ΔV = ΔA ⋈ B_old  +  A_old ⋈ ΔB  +  ΔA ⋈ ΔB
#
# (the DBSP / differential-dataflow product rule; the cross term is what
# naive "join the changes to the other side's NEW state" silently
# double-counts).  Each term joins a DELTA against a bounded side, so
# per-batch cost is O(|ΔA|·matchB + |ΔB|·matchA + |ΔA⋈ΔB|) — never a
# recompute of A ⋈ B.  The maintained view is a multiset: rows carry a
# count, retractions subtract, and rows at count 0 vanish; equality
# with from-scratch recomputation at every split point is asserted in
# tests/test_cdc_incremental.py.
# ---------------------------------------------------------------------------


def signed_delta_current(
    base_current: DataFrame,
    delta_feed: DataFrame,
    cols: list[str],
    key: str = "original_id",
    order: str = "kafka_offset",
) -> DataFrame:
    """Signed delta of a CURRENT-state table under a change batch:
    -1 for the touched keys' old rows (if present), +1 for their new
    live rows.  Output: ``cols`` + ``w`` (±1)."""
    w = Window.partitionBy(key)
    latest = (
        delta_feed.withColumn("_mx", F.max(order).over(w))
        .filter(F.col(order) == F.col("_mx"))
    )
    touched = latest.select(key).distinct()
    retract = (
        base_current.join(touched, on=key, how="left_semi")
        .select(*cols, F.lit(-1).alias("w"))
    )
    insert = (
        latest.filter(F.col("__deleted") == "false")
        .select(*cols, F.lit(1).alias("w"))
    )
    return retract.unionByName(insert)


def delta_apply_join_view(
    view: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    da: DataFrame,
    db: DataFrame,
    on: str,
) -> DataFrame:
    """Maintain the multiset join view V = A ⋈ B (equi-join on ``on``)
    through signed deltas of both sides.

    ``view`` rows: joined columns + ``cnt``; ``a_old``/``b_old`` the
    pre-batch states (each with weight 1 implied); ``da``/``db`` signed
    deltas (… + ``w``).  Returns the new view (rows with cnt > 0).
    """
    a1 = a_old.withColumn("w", F.lit(1))
    b1 = b_old.withColumn("w", F.lit(1))

    def term(left: DataFrame, right: DataFrame) -> DataFrame:
        lw = left.withColumnRenamed("w", "_wl")
        rw = right.withColumnRenamed("w", "_wr")
        return lw.join(rw, on=on).select(
            *[c for c in lw.columns if c != "_wl"],
            *[c for c in rw.columns if c not in ("_wr", on)],
            (F.col("_wl") * F.col("_wr")).alias("dw"),
        )

    delta_v = (
        term(da, b1)
        .unionByName(term(a1, db))
        .unionByName(term(da, db))
    )
    group_cols = [c for c in delta_v.columns if c != "dw"]
    delta_agg = delta_v.groupBy(*group_cols).agg(F.sum("dw").alias("dw"))
    merged = (
        view.join(delta_agg, on=group_cols, how="full_outer")
        .select(
            *group_cols,
            (
                F.coalesce(F.col("cnt"), F.lit(0))
                + F.coalesce(F.col("dw"), F.lit(0))
            ).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    return merged


# ---------------------------------------------------------------------------
# Incremental MIN/MAX maintenance — the NON-invertible aggregate case.
#
# count/sum are linear: a retraction is just a signed add, so the MV
# never looks at the base state (delta_apply_mv above).  MIN/MAX are
# not invertible: deleting the current minimum of a group says nothing
# about the new minimum — it must be RE-DERIVED from the group's
# remaining rows.  The standard fix (Materialize's MIN/MAX reduction,
# lakehouse summary-table MERGE jobs) is to split groups per batch:
#
#   safe groups       no retraction touched a stored extreme →
#                     new_min = least(stored, inserted), O(delta) math
#   endangered groups a retracted value ties the stored min or max →
#                     rescan JUST those groups in the post-batch state
#
# Per-batch cost: O(|delta|) + O(Σ size of endangered groups) — and a
# retraction only endangers a group when it removes the extreme itself,
# so the rescan set is workload-small.  The rescan is a group-key semi
# join (partition/bucket-prunable on a grouped layout), never a full
# scan.  Equality with from-scratch recomputation at every split point
# is asserted in tests/test_cdc_incremental.py.
# ---------------------------------------------------------------------------


def minmax_mv(
    current: DataFrame, group_col: str, value_col: str = "value"
) -> DataFrame:
    """The maintained aggregate: per-group count + exact-cents MIN/MAX."""
    return current.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(M.fixed(value_col)).alias("min_cents"),
        F.max(M.fixed(value_col)).alias("max_cents"),
    )


def delta_apply_minmax_mv(
    base_current: DataFrame,
    base_mv: DataFrame,
    delta_feed: DataFrame,
    group_col: str,
    value_col: str = "value",
    key: str = "original_id",
    order: str = "kafka_offset",
) -> DataFrame:
    """Maintain ``base_mv`` (= minmax_mv of the state at T) through a
    batch of post-T change events; returns the same rows as recomputing
    minmax_mv from scratch on the post-batch state."""
    w = Window.partitionBy(key)
    latest = (
        delta_feed.withColumn("_mx", F.max(order).over(w))
        .filter(F.col(order) == F.col("_mx"))
        .select(
            F.col(key),
            F.col(group_col),
            F.col(value_col),
            (F.col("__deleted") == "false").alias("_live"),
        )
    )
    touched = latest.select(key).distinct()
    old = base_current.join(touched, on=key, how="left_semi").select(
        F.col(group_col).alias("g"), M.fixed(value_col).alias("c"), F.lit(-1).alias("w")
    )
    new = latest.filter(F.col("_live")).select(
        F.col(group_col).alias("g"), M.fixed(value_col).alias("c"), F.lit(1).alias("w")
    )
    ins = F.when(F.col("w") == 1, F.col("c"))
    ret = F.when(F.col("w") == -1, F.col("c"))
    stats = (
        old.unionByName(new)
        .groupBy("g")
        .agg(
            F.sum("w").alias("dn"),
            F.min(ins).alias("ins_min"),
            F.max(ins).alias("ins_max"),
            F.min(ret).alias("ret_min"),
            F.max(ret).alias("ret_max"),
        )
    )
    mv = base_mv.select(
        F.col(group_col).alias("mg"), "n_rows", "min_cents", "max_cents"
    )
    merged = mv.join(stats, mv["mg"] == stats["g"], "full_outer").select(
        F.coalesce(F.col("mg"), F.col("g")).alias(group_col),
        (F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias(
            "n_new"
        ),
        "min_cents",
        "max_cents",
        "ins_min",
        "ins_max",
        "ret_min",
        "ret_max",
    )
    # a retraction endangers a group only when it ties the stored extreme
    # (<=/>= rather than == costs nothing and tolerates duplicates)
    endangered_cond = (
        F.col("ret_min").isNotNull()
        & (
            (F.col("ret_min") <= F.col("min_cents"))
            | (F.col("ret_max") >= F.col("max_cents"))
        )
    )
    safe = merged.filter(~F.coalesce(endangered_cond, F.lit(False))).select(
        group_col,
        F.col("n_new").alias("n_rows"),
        F.least("min_cents", "ins_min").alias("min_cents"),
        F.greatest("max_cents", "ins_max").alias("max_cents"),
    )
    endangered = merged.filter(F.coalesce(endangered_cond, F.lit(False))).select(
        F.col(group_col).alias("eg")
    )
    # rescan ONLY the endangered groups' post-batch rows: group-semi join
    # FIRST (partition-prunable on a grouped layout), then drop the
    # touched keys' old rows, then add their new live rows
    survivors = (
        base_current.join(endangered, base_current[group_col] == endangered["eg"], "left_semi")
        .join(touched, on=key, how="left_anti")
        .select(F.col(group_col), M.fixed(value_col).alias("c"))
    )
    newly = (
        latest.filter(F.col("_live"))
        .join(endangered, latest[group_col] == endangered["eg"], "left_semi")
        .select(F.col(group_col), M.fixed(value_col).alias("c"))
    )
    rederived = (
        survivors.unionByName(newly)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
    )
    return safe.unionByName(rederived).filter(F.col("n_rows") > 0)
