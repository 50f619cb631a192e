"""Incremental MV maintenance (cdc/incremental.py): delta application must
equal from-scratch recomputation at EVERY split point — including the
degenerate ones (everything in the base, everything in the delta).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.cdc import build_current, change_feed_from_events
from cdc_practice_spark.cdc.incremental import current_mv, delta_apply_mv
from cdc_practice_spark.session import load_table


def _mv_rows(df):
    return sorted(
        (r.event_type, r.n_rows, r.sum_cents)
        for r in df.select("event_type", "n_rows", "sum_cents").collect()
    )


@pytest.fixture(scope="module")
def feed(spark, sf_dir):
    f = change_feed_from_events(load_table(spark, sf_dir, "events"))
    f.persist()
    yield f
    f.unpersist()


def test_delta_apply_equals_scratch_at_any_split(feed):
    scratch = _mv_rows(current_mv(build_current(feed), "event_type"))
    max_off = feed.agg(F.max("kafka_offset")).collect()[0][0]
    for t in (-1, max_off // 3, max_off // 2, max_off):
        base_feed = feed.filter(F.col("kafka_offset") <= t)
        delta_feed = feed.filter(F.col("kafka_offset") > t)
        base_current = build_current(base_feed)
        maintained = delta_apply_mv(
            base_current,
            current_mv(base_current, "event_type"),
            delta_feed,
            "event_type",
        )
        assert _mv_rows(maintained) == scratch, f"split {t} diverged"


def test_onepass_fused_equals_scratch_and_separate_frames(feed):
    """The fused single-aggregation form (delta_apply_mv_onepass) must
    return exactly the separate-frames result — which itself equals
    from-scratch — at every split point, including both degenerate
    ends (all-base and all-delta)."""
    from cdc_practice_spark.cdc.incremental import delta_apply_mv_onepass

    scratch = _mv_rows(current_mv(build_current(feed), "event_type"))
    max_off = feed.agg(F.max("kafka_offset")).collect()[0][0]
    for t in (-1, max_off // 3, max_off // 2, max_off):
        fused = delta_apply_mv_onepass(feed, t, "event_type")
        assert _mv_rows(fused) == scratch, f"split {t} diverged"


def test_delta_retracts_and_groups_vanish(spark):
    """A key whose delta moves it across groups retracts from the old
    group; a group whose only key is deleted disappears (n_rows=0
    filtered)."""
    from datetime import datetime

    rows = [
        (0, datetime(2024, 1, 1, 0), 1, "signup", 10.0, "{}"),
        (1, datetime(2024, 1, 1, 1), 2, "click", 5.0, "{}"),
        # delta: key 1 moves signup→click with a new value; key 2 deleted
        (2, datetime(2024, 1, 1, 2), 1, "click", 7.0, "{}"),
        (3, datetime(2024, 1, 1, 3), 2, "error", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    feed = change_feed_from_events(df)
    base_feed = feed.filter(F.col("kafka_offset") <= 1)
    base_current = build_current(base_feed)
    maintained = delta_apply_mv(
        base_current,
        current_mv(base_current, "event_type"),
        feed.filter(F.col("kafka_offset") > 1),
        "event_type",
    )
    # signup group vanished (its only key moved); click holds key 1 only
    assert _mv_rows(maintained) == [("click", 1, 700)]


def test_multi_batch_chaining(feed):
    """Composability — the streaming shape: apply delta batches one at a
    time, each against the PREVIOUS maintained state (MV(T1) ⊕ Δ2 ⊕ Δ3 =
    scratch(T3)).  Requires maintaining the snapshot alongside the MV,
    exactly what the bucketed upsert sink stores."""
    scratch = _mv_rows(current_mv(build_current(feed), "event_type"))
    max_off = feed.agg(F.max("kafka_offset")).collect()[0][0]
    cuts = [max_off // 4, max_off // 2, (3 * max_off) // 4, max_off]
    prev = -1
    state_feed = feed.filter(F.col("kafka_offset") <= prev)
    mv = current_mv(build_current(state_feed), "event_type")
    for t in cuts:
        delta = feed.filter(
            (F.col("kafka_offset") > prev) & (F.col("kafka_offset") <= t)
        )
        mv = delta_apply_mv(build_current(state_feed), mv, delta, "event_type")
        state_feed = feed.filter(F.col("kafka_offset") <= t)
        prev = t
    assert _mv_rows(mv) == scratch


def test_join_view_delta_equals_scratch_at_any_split(spark, sf_dir):
    """Bilinear join-view maintenance: ΔA⋈B + A⋈ΔB + ΔA⋈ΔB applied to
    the materialized view equals the from-scratch A_final ⋈ B_final at
    every split point (missing cross term or unretracted rows diverge)."""
    from cdc_practice_spark.cdc.incremental import (
        delta_apply_join_view,
        signed_delta_current,
    )
    from cdc_practice_spark.queries.registry import QUERIES, load_all

    load_all()
    scratch = None
    max_off = (
        change_feed_from_events(load_table(spark, sf_dir, "events"))
        .agg(F.max("kafka_offset"))
        .collect()[0][0]
    )
    # drive through the registered query for the half split, and the raw
    # operators for the degenerate splits
    from cdc_practice_spark.cdc import build_current

    feed = change_feed_from_events(load_table(spark, sf_dir, "events"))

    def val(c):
        return F.round(F.col(c).cast("decimal(12,2)"), 2).cast("double")

    def a_state(f):
        return build_current(f).select(
            F.col("original_id").alias("_k"),
            (F.col("original_id") % 20).alias("bucket"),
            F.col("original_id").alias("user_id"),
            val("value").alias("value_a"),
        )

    feed_b = feed.filter(F.col("event_type") == "purchase").select(
        "kafka_offset",
        (F.col("original_id") % 20).alias("bucket"),
        val("value").alias("value_b"),
        "__deleted",
    )

    def b_state(fb):
        from pyspark.sql import Window

        w = Window.partitionBy("bucket")
        return (
            fb.withColumn("_mx", F.max("kafka_offset").over(w))
            .filter(F.col("kafka_offset") == F.col("_mx"))
            .select("bucket", "value_b")
        )

    def snap(df):
        return sorted(
            (r.bucket, r.user_id, r.value_a, r.value_b, r.cnt)
            for r in df.collect()
        )

    a_fin = a_state(feed).drop("_k")
    b_fin = b_state(feed_b)
    scratch = snap(
        a_fin.join(b_fin, on="bucket")
        .groupBy("bucket", "user_id", "value_a", "value_b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    for t in (-1, max_off // 3, max_off):
        a_old = a_state(feed.filter(F.col("kafka_offset") <= t))
        b_old = b_state(feed_b.filter(F.col("kafka_offset") <= t))
        view_old = (
            a_old.drop("_k")
            .join(b_old, on="bucket")
            .groupBy("bucket", "user_id", "value_a", "value_b")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        da = signed_delta_current(
            a_old,
            feed.filter(F.col("kafka_offset") > t)
            .withColumnRenamed("original_id", "_k")
            .withColumn("bucket", F.col("_k") % 20)
            .withColumn("user_id", F.col("_k"))
            .withColumn("value_a", val("value")),
            cols=["bucket", "user_id", "value_a"],
            key="_k",
        )
        db = signed_delta_current(
            b_old.withColumn("_k", F.col("bucket")),
            feed_b.filter(F.col("kafka_offset") > t).withColumn(
                "_k", F.col("bucket")
            ),
            cols=["bucket", "value_b"],
            key="_k",
        )
        maintained = delta_apply_join_view(
            view_old, a_old.drop("_k"), b_old, da, db, on="bucket"
        )
        assert snap(maintained) == scratch, f"split {t} diverged"


# ---- TOP-K (prefix) maintenance ---------------------------------------------


def _tk_rows(df):
    return sorted(
        (r.event_type, r.n_rows, tuple((e.nc, e.id) for e in r.topk))
        for r in df.select("event_type", "n_rows", "topk").collect()
    )


def test_topk_delta_apply_equals_scratch_at_any_split(feed):
    from cdc_practice_spark.cdc.incremental import delta_apply_topk_mv, topk_mv

    k = 3
    scratch = _tk_rows(topk_mv(build_current(feed), "event_type", k))
    max_off = feed.agg(F.max("kafka_offset")).collect()[0][0]
    for t in (-1, max_off // 3, max_off // 2, max_off):
        base_feed = feed.filter(F.col("kafka_offset") <= t)
        delta_feed = feed.filter(F.col("kafka_offset") > t)
        base_current = build_current(base_feed)
        maintained = delta_apply_topk_mv(
            base_current,
            topk_mv(base_current, "event_type", k),
            delta_feed,
            "event_type",
            k,
        )
        assert _tk_rows(maintained) == scratch, f"split {t} diverged"
        # the r13 gated form the streaming sink runs: endangered groups
        # collected eagerly, the rescan source passed as a lazy thunk and
        # pruned to the endangered IN-list — rows must be identical
        gated = delta_apply_topk_mv(
            base_current,
            topk_mv(base_current, "event_type", k),
            delta_feed,
            "event_type",
            k,
            full_current=lambda: base_current,
            eager_endangered_gate=True,
        )
        assert _tk_rows(gated) == scratch, f"split {t} gated form diverged"


def test_topk_retracting_a_prefix_member_rederives(spark):
    """Deleting the #2 value must pull the hidden #4 row into the
    prefix — the case the O(k+delta) merge cannot express."""
    from datetime import datetime

    from cdc_practice_spark.cdc.incremental import delta_apply_topk_mv, topk_mv

    rows = [
        (0, datetime(2024, 1, 1, 0), 1, "click", 40.0, "{}"),
        (1, datetime(2024, 1, 1, 1), 2, "click", 30.0, "{}"),
        (2, datetime(2024, 1, 1, 2), 3, "click", 20.0, "{}"),
        (3, datetime(2024, 1, 1, 3), 4, "click", 10.0, "{}"),
        # delta: key 2 (the 30.0 #2) deleted → hidden 10.0 must surface
        (4, datetime(2024, 1, 1, 4), 2, "error", 30.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    feed = change_feed_from_events(df)
    base_feed = feed.filter(F.col("kafka_offset") <= 3)
    base_current = build_current(base_feed)
    maintained = delta_apply_topk_mv(
        base_current,
        topk_mv(base_current, "event_type", 3),
        feed.filter(F.col("kafka_offset") > 3),
        "event_type",
        3,
    )
    assert _tk_rows(maintained) == [
        ("click", 3, ((-4000, 1), (-2000, 3), (-1000, 4)))
    ]


def test_topk_insert_only_stays_on_merge_path(spark):
    """Inserts above, inside, and below the prefix merge exactly —
    including pushing the old kth out while hidden rows stay hidden."""
    from datetime import datetime

    from cdc_practice_spark.cdc.incremental import delta_apply_topk_mv, topk_mv

    rows = [
        (0, datetime(2024, 1, 1, 0), 1, "click", 40.0, "{}"),
        (1, datetime(2024, 1, 1, 1), 2, "click", 30.0, "{}"),
        (2, datetime(2024, 1, 1, 2), 3, "click", 20.0, "{}"),
        (3, datetime(2024, 1, 1, 3), 4, "click", 10.0, "{}"),
        # delta: 35.0 lands at #2, pushing 20.0 out of the top-3
        (4, datetime(2024, 1, 1, 4), 5, "click", 35.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    feed = change_feed_from_events(df)
    base_feed = feed.filter(F.col("kafka_offset") <= 3)
    base_current = build_current(base_feed)
    maintained = delta_apply_topk_mv(
        base_current,
        topk_mv(base_current, "event_type", 3),
        feed.filter(F.col("kafka_offset") > 3),
        "event_type",
        3,
    )
    assert _tk_rows(maintained) == [
        ("click", 5, ((-4000, 1), (-3500, 5), (-3000, 2)))
    ]


# ---- MIN/MAX (non-invertible) maintenance ----------------------------------

from cdc_practice_spark.cdc.incremental import (  # noqa: E402
    delta_apply_minmax_mv,
    minmax_mv,
)


def _mm_rows(df):
    return sorted(
        (r.event_type, r.n_rows, r.min_cents, r.max_cents)
        for r in df.select("event_type", "n_rows", "min_cents", "max_cents").collect()
    )


def test_minmax_delta_apply_equals_scratch_at_any_split(feed):
    scratch = _mm_rows(minmax_mv(build_current(feed), "event_type"))
    max_off = feed.agg(F.max("kafka_offset")).collect()[0][0]
    for t in (-1, max_off // 3, max_off // 2, max_off):
        base_feed = feed.filter(F.col("kafka_offset") <= t)
        delta_feed = feed.filter(F.col("kafka_offset") > t)
        base_current = build_current(base_feed)
        maintained = delta_apply_minmax_mv(
            base_current,
            minmax_mv(base_current, "event_type"),
            delta_feed,
            "event_type",
        )
        assert _mm_rows(maintained) == scratch, f"split {t} diverged"


def test_minmax_retracting_the_extreme_rederives(spark):
    """Deleting the key that holds a group's minimum forces the rescan
    path: the maintained min must climb to the surviving value — the
    case sum/count algebra cannot express."""
    from datetime import datetime

    rows = [
        (0, datetime(2024, 1, 1, 0), 1, "click", 5.0, "{}"),
        (1, datetime(2024, 1, 1, 1), 2, "click", 10.0, "{}"),
        (2, datetime(2024, 1, 1, 2), 3, "click", 20.0, "{}"),
        # delta: key 1 (the 5.0 minimum) is deleted; key 4 inserts 15.0
        (3, datetime(2024, 1, 1, 3), 1, "error", 5.0, "{}"),
        (4, datetime(2024, 1, 1, 4), 4, "click", 15.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    feed = change_feed_from_events(df)
    base_feed = feed.filter(F.col("kafka_offset") <= 2)
    base_current = build_current(base_feed)
    maintained = delta_apply_minmax_mv(
        base_current,
        minmax_mv(base_current, "event_type"),
        feed.filter(F.col("kafka_offset") > 2),
        "event_type",
    )
    assert _mm_rows(maintained) == [("click", 3, 1000, 2000)]


def test_minmax_safe_groups_skip_the_rescan(spark):
    """An insert strictly inside the stored [min, max] and a retraction
    of a non-extreme value keep the group on the O(delta) safe path —
    and the result is still exact."""
    from datetime import datetime

    rows = [
        (0, datetime(2024, 1, 1, 0), 1, "click", 5.0, "{}"),
        (1, datetime(2024, 1, 1, 1), 2, "click", 10.0, "{}"),
        (2, datetime(2024, 1, 1, 2), 3, "click", 20.0, "{}"),
        # delta: key 2 (non-extreme 10.0) updates to 12.0 — still interior
        (3, datetime(2024, 1, 1, 3), 2, "click", 12.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    feed = change_feed_from_events(df)
    base_feed = feed.filter(F.col("kafka_offset") <= 2)
    base_current = build_current(base_feed)
    maintained = delta_apply_minmax_mv(
        base_current,
        minmax_mv(base_current, "event_type"),
        feed.filter(F.col("kafka_offset") > 2),
        "event_type",
    )
    assert _mm_rows(maintained) == [("click", 3, 500, 2000)]


def test_minmax_multi_batch_chaining(feed):
    """Composability for the non-invertible tier: MV(T1) ⊕ Δ2 ⊕ Δ3 =
    scratch(T3), each batch applied against the PREVIOUS maintained
    state — including endangered-group rescans mid-chain."""
    scratch = _mm_rows(minmax_mv(build_current(feed), "event_type"))
    max_off = feed.agg(F.max("kafka_offset")).collect()[0][0]
    cuts = [max_off // 4, max_off // 2, (3 * max_off) // 4, max_off]
    prev = -1
    state_feed = feed.filter(F.col("kafka_offset") <= prev)
    mv = minmax_mv(build_current(state_feed), "event_type")
    for t in cuts:
        delta = feed.filter(
            (F.col("kafka_offset") > prev) & (F.col("kafka_offset") <= t)
        )
        mv = delta_apply_minmax_mv(build_current(state_feed), mv, delta, "event_type")
        state_feed = feed.filter(F.col("kafka_offset") <= t)
        prev = t
    assert _mm_rows(mv) == scratch


# ---- COUNT(DISTINCT) maintenance (support-counted) ----

from cdc_practice_spark.cdc.incremental import (  # noqa: E402
    delta_apply_distinct_mv,
    delta_apply_support_mv,
    distinct_mv,
    support_mv,
)


def _dc_rows(df):
    return sorted(
        (r.event_type, r.n_rows, r.n_distinct)
        for r in df.select("event_type", "n_rows", "n_distinct").collect()
    )


def test_distinct_delta_apply_equals_scratch_at_any_split(feed):
    scratch = _dc_rows(distinct_mv(build_current(feed), "event_type", "props_k"))
    max_off = feed.agg(F.max("kafka_offset")).collect()[0][0]
    for t in (-1, max_off // 3, max_off // 2, max_off):
        base_feed = feed.filter(F.col("kafka_offset") <= t)
        delta_feed = feed.filter(F.col("kafka_offset") > t)
        base_current = build_current(base_feed)
        maintained = delta_apply_distinct_mv(
            base_current,
            support_mv(base_current, "event_type", "props_k"),
            distinct_mv(base_current, "event_type", "props_k"),
            delta_feed,
            "event_type",
            "props_k",
        )
        assert _dc_rows(maintained) == scratch, f"split {t} diverged"


def test_fused_distinct_support_pair_equals_standalone(feed):
    """The r13 fused (mv, support) maintenance step the streaming sink
    runs must emit row-identical outputs to the two standalone delta
    functions it replaced."""
    from cdc_practice_spark.cdc.incremental import (
        delta_apply_distinct_support_pair,
        delta_apply_support_mv,
    )

    max_off = feed.agg(F.max("kafka_offset")).collect()[0][0]
    for t in (-1, max_off // 3, max_off // 2, max_off):
        base_feed = feed.filter(F.col("kafka_offset") <= t)
        delta_feed = feed.filter(F.col("kafka_offset") > t)
        base_current = build_current(base_feed)
        base_sup = support_mv(base_current, "event_type", "props_k")
        base_mv = distinct_mv(base_current, "event_type", "props_k")
        fused_mv, fused_sup = delta_apply_distinct_support_pair(
            base_current, base_sup, base_mv, delta_feed, "event_type", "props_k"
        )
        want_mv = delta_apply_distinct_mv(
            base_current, base_sup, base_mv, delta_feed, "event_type", "props_k"
        )
        want_sup = delta_apply_support_mv(
            base_current, base_sup, delta_feed, "event_type", "props_k"
        )
        assert _dc_rows(fused_mv) == _dc_rows(want_mv), f"split {t} mv diverged"
        assert sorted(map(tuple, fused_sup.collect())) == sorted(
            map(tuple, want_sup.collect())
        ), f"split {t} support diverged"


def test_distinct_zero_crossings_and_nulls(spark):
    """The value-level cases signed MV arithmetic cannot express:
    retracting the LAST copy of a value kills it (died), re-inserting a
    value that still has other holders must NOT double-count, and NULL
    values count toward n_rows but never toward n_distinct."""
    from datetime import datetime

    rows = [
        # base: k=1 held by keys 1 and 2; k=2 held only by key 3;
        # key 4 has NULL props_k
        (0, datetime(2024, 1, 1, 0), 1, "click", 5.0, '{"k": 1}'),
        (1, datetime(2024, 1, 1, 1), 2, "click", 6.0, '{"k": 1}'),
        (2, datetime(2024, 1, 1, 2), 3, "click", 7.0, '{"k": 2}'),
        (3, datetime(2024, 1, 1, 3), 4, "click", 8.0, "{}"),
        # delta: key 3 deleted (last copy of k=2 dies); key 1 moves to
        # k=3 (k=3 born; k=1 survives via key 2)
        (4, datetime(2024, 1, 1, 4), 3, "error", 7.0, '{"k": 2}'),
        (5, datetime(2024, 1, 1, 5), 1, "click", 5.5, '{"k": 3}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    feed = change_feed_from_events(df)
    base_feed = feed.filter(F.col("kafka_offset") <= 3)
    base_current = build_current(base_feed)
    maintained = delta_apply_distinct_mv(
        base_current,
        support_mv(base_current, "event_type", "props_k"),
        distinct_mv(base_current, "event_type", "props_k"),
        feed.filter(F.col("kafka_offset") > 3),
        "event_type",
        "props_k",
    )
    # live rows: keys 1 (k=3), 2 (k=1), 4 (NULL) → n_rows 3, distinct {1,3}
    assert _dc_rows(maintained) == [("click", 3, 2)]


def test_distinct_multi_batch_chaining_with_maintained_support(feed):
    """The support table itself is maintained batch-over-batch (never
    rebuilt from state), and the MV chained on top still equals
    from-scratch at the end — the production refresh loop."""
    scratch = _dc_rows(distinct_mv(build_current(feed), "event_type", "props_k"))
    max_off = feed.agg(F.max("kafka_offset")).collect()[0][0]
    cuts = [max_off // 4, max_off // 2, (3 * max_off) // 4, max_off]
    prev = -1
    state_feed = feed.filter(F.col("kafka_offset") <= prev)
    cur = build_current(state_feed)
    mv = distinct_mv(cur, "event_type", "props_k")
    sup = support_mv(cur, "event_type", "props_k")
    for t in cuts:
        delta = feed.filter(
            (F.col("kafka_offset") > prev) & (F.col("kafka_offset") <= t)
        )
        cur = build_current(state_feed)
        mv = delta_apply_distinct_mv(
            cur, sup, mv, delta, "event_type", "props_k"
        )
        sup = delta_apply_support_mv(cur, sup, delta, "event_type", "props_k")
        state_feed = feed.filter(F.col("kafka_offset") <= t)
        prev = t
    assert _dc_rows(mv) == scratch
    # the maintained support must equal the from-scratch support too
    scratch_sup = sorted(
        map(tuple, support_mv(build_current(feed), "event_type", "props_k").collect())
    )
    assert sorted(map(tuple, sup.collect())) == scratch_sup


def test_topk_onepass_equals_scratch_at_any_split(feed):
    """The fused one-feed top-k form must equal from-scratch topk_mv at
    every split point, including both degenerate ends."""
    from cdc_practice_spark.cdc.incremental import (
        delta_apply_topk_mv_onepass,
        topk_mv,
    )

    scratch = _tk_rows(topk_mv(build_current(feed), "event_type", 3))
    max_off = feed.agg(F.max("kafka_offset")).collect()[0][0]
    for t in (-1, max_off // 3, max_off // 2, max_off):
        fused = delta_apply_topk_mv_onepass(feed, t, "event_type", 3)
        assert _tk_rows(fused) == scratch, f"split {t} diverged"


def test_onepass_duplicate_invariance_justifies_nodedup_feed(spark, sf_dir):
    """The coord_dedup=False contract (cdc/feed.py): because both
    one-pass forms touch the feed first through idempotent per-key
    aggregates (max_by/max over the unique coordinate order), injected
    byte-identical redeliveries must leave their outputs unchanged —
    this is what lets the registered MV queries skip the P3 window."""
    from cdc_practice_spark.cdc.incremental import (
        delta_apply_mv_onepass,
        delta_apply_topk_mv_onepass,
    )

    events = load_table(spark, sf_dir, "events")
    clean = change_feed_from_events(events, coord_dedup=False)
    # redeliver ~every 7th event verbatim (same coordinates, same body)
    dup = clean.filter(F.col("kafka_offset") % 7 == 0)
    noisy = clean.unionByName(dup)
    t = clean.agg(F.max("kafka_offset")).collect()[0][0] // 2
    assert _mv_rows(delta_apply_mv_onepass(noisy, t, "event_type")) == _mv_rows(
        delta_apply_mv_onepass(clean, t, "event_type")
    )
    assert _tk_rows(
        delta_apply_topk_mv_onepass(noisy, t, "event_type", 3)
    ) == _tk_rows(delta_apply_topk_mv_onepass(clean, t, "event_type", 3))
